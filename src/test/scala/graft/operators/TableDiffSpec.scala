package graft.operators

import graft.SparkTestBase

class TableDiffSpec extends SparkTestBase {
  import spark.implicits._

  private def old = Seq(
    (1L, Some(10.0), "a"),
    (2L, Some(20.0), "b"),
    (3L, None, "c"), // null payload value: must NOT read as changed
    (4L, Some(40.0), "d")).toDF("k", "v", "tag")

  private def cur = Seq(
    (1L, Some(10.0), "a"), // unchanged -> dropped from output
    (2L, Some(21.0), "B"), // two columns changed
    (3L, None, "c"), // unchanged, null-safely
    (5L, Some(50.0), "e")) // added; 4 removed
    .toDF("k", "v", "tag")

  test("diff classifies added/removed/changed and names the columns") {
    val got = TableDiff.diff(old, cur, Seq("k"))
      .select("k", "diff_status", "changed_columns")
      .as[(Long, String, String)].collect().toSet
    assert(got == Set(
      (2L, "changed", "v,tag"),
      (4L, "removed", ""),
      (5L, "added", "")))
  }

  test("hashDiff classification matches diff exactly") {
    val detail = TableDiff.diff(old, cur, Seq("k"))
      .select("k", "diff_status").as[(Long, String)].collect().toSet
    val hashed = TableDiff.hashDiff(old, cur, Seq("k"))
      .select("k", "diff_status").as[(Long, String)].collect().toSet
    assert(hashed == detail)
  }

  test("hashDiff moves a fraction of diff's shuffle bytes on a wide table") {
    import org.apache.spark.sql.functions._
    // 20k rows x 8 fat string columns: the detail diff shuffles full row
    // structs; the hash form ships (key, 8-byte hash). Local wall-clock
    // cannot show this (memory shuffles are ~free); bytes can.
    val wide = spark.range(20000).select(
      col("id") +: (0 until 8).map(i =>
        concat_ws("-", lit(s"wide_payload_column_$i"), col("id")).as(s"c$i")): _*)
    val changed = wide.withColumn("c0",
      when(col("id") % 1000 === 0, lit("CHANGED")).otherwise(col("c0")))
    val (_, detailBytes) = graft.TestMetrics.shuffleWritten(spark) {
      TableDiff.diff(wide, changed, Seq("id")).count()
    }
    val (_, hashBytes) = graft.TestMetrics.shuffleWritten(spark) {
      TableDiff.hashDiff(wide, changed, Seq("id")).count()
    }
    assert(detailBytes > 0 && hashBytes > 0)
    assert(hashBytes < detailBytes / 3,
      s"hash form must ship far fewer bytes: $hashBytes vs $detailBytes")
  }

  test("identical tables diff to nothing; schema mismatch is rejected") {
    assert(TableDiff.diff(old, old, Seq("k")).count() == 0L)
    assert(TableDiff.hashDiff(old, old, Seq("k")).count() == 0L)
    intercept[IllegalArgumentException] {
      TableDiff.diff(old, old.withColumnRenamed("tag", "t2"), Seq("k"))
    }
  }
}
