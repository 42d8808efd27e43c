package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class IndexedLayoutSpec extends SparkTestBase {

  test("writeIndexed: partition pruning kicks in on the partition column") {
    import spark.implicits._
    val rows = (1 to 2000).map(i => (i.toLong, s"sig$i", Seq("A", "B", "C", "D")(i % 4)))
      .toDF("block_slot", "signature", "transaction_type")
    val path = Files.createTempDirectory("graft-indexed").toString + "/transactions"
    Load.writeIndexed(rows, path, Seq("transaction_type"), Seq("block_slot", "signature"))

    // one directory per partition value
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("transaction_type=A", "transaction_type=B",
      "transaction_type=C", "transaction_type=D"))

    val q = spark.read.parquet(path).filter(col("transaction_type") === "B")
    assert(q.count() == 500L)
    val plan = q.queryExecution.executedPlan.toString
    // the filter is satisfied by pruning partitions, not scanning + filtering
    assert(plan.contains("PartitionFilters") && plan.contains("transaction_type"),
      s"no partition pruning in plan:\n$plan")
  }

  test("dot_product registered as SQL function (extensions path)") {
    graft.GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .head.getDouble(0)
    assert(got == 32.0)
  }

  test("text SQL surface registered via extensions (lang_id, simhash64, ...)") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT lang_id('the quick brown fox and the lazy dog') AS lang,
        |       token_count('a b c') AS n,
        |       hamming64(simhash64('aa bb cc dd'), simhash64('aa bb cc dd')) AS h_same,
        |       hamming64(simhash64('aa bb cc dd'), simhash64('xx yy zz ww')) AS h_diff,
        |       text_fingerprint('abc') = text_fingerprint('abc') AS fp_eq
        |""".stripMargin).head
    assert(r.getString(0) == "en")
    assert(r.getLong(1) == 3L)
    assert(r.getInt(2) == 0)
    assert(r.getInt(3) > 0)
    assert(r.getBoolean(4))
  }

  test("cosine_sim and minhash_sig registered via extensions") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT cosine_sim(array(1.0D, 0.0D), array(2.0D, 0.0D)) AS c,
        |       minhash_sig(array('aa bb', 'bb cc'), 4) AS sig
        |""".stripMargin).head
    assert(r.getDouble(0) == 1.0)
    assert(r.getSeq[Long](1).length == 4)
    // a non-literal k is a registration-time contract violation
    val e = intercept[Exception](
      spark.sql("SELECT minhash_sig(array('x'), CAST(rand() * 4 AS INT))").collect())
    assert(String.valueOf(e.getMessage).toLowerCase.contains("literal") ||
      String.valueOf(e.getMessage).toLowerCase.contains("int"))
  }
}
