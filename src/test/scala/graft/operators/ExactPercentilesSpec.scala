package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ExactPercentilesSpec extends SparkTestBase {

  private def native(df: org.apache.spark.sql.DataFrame) = df
    .groupBy("g")
    .agg(
      count(lit(1)).as("n"),
      percentile(col("v"), lit(0.5)).as("p50"),
      percentile(col("v"), lit(0.9)).as("p90"),
      percentile(col("v"), lit(0.99)).as("p99"))

  private def rows(df: org.apache.spark.sql.DataFrame) = df
    .select("g", "n", "p50", "p90", "p99")
    .collect()
    .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    .sortBy(_._1).toSeq

  test("bit-identical to the native percentile aggregate, ties and integral positions included") {
    import spark.implicits._
    // Deterministic pseudo-values with heavy ties (v = k*k % 97) and one
    // group sized so (n-1)*0.5 is integral (the lo == hi edge).
    val df = (0 until 403).map { k =>
      (s"g${k % 3}", (k * k % 97).toDouble + (k % 7) * 0.25)
    }.toDF("g", "v")
    val got = ExactPercentiles.perGroup(df, "g", "v",
      Seq(("p50", 0.5), ("p90", 0.9), ("p99", 0.99)), bucketWidth = 8.0)
    assert(rows(got) == rows(native(df)))
  }

  test("a null GROUP key flows through to one output row like the native aggregate") {
    import spark.implicits._
    val df = ((0 until 60).map(k => (Option(s"g${k % 2}"), (k % 11).toDouble)) ++
      (0 until 30).map(k => (Option.empty[String], (k % 7).toDouble + 0.5)))
      .toDF("g", "v")
    val got = ExactPercentiles.perGroup(df, "g", "v",
      Seq(("p50", 0.5), ("p90", 0.9), ("p99", 0.99)), bucketWidth = 3.0)
    assert(got.count() == 3) // g0, g1, and the null group
    val key = (r: org.apache.spark.sql.Row) =>
      (Option(r.getString(0)), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    val gotRows = got.select("g", "n", "p50", "p90", "p99").collect().map(key).sortBy(_._1)
    val natRows = native(df).select("g", "n", "p50", "p90", "p99").collect().map(key).sortBy(_._1)
    assert(gotRows.toSeq == natRows.toSeq)
  }

  test("repartition-stable and null values excluded like the native aggregate") {
    import spark.implicits._
    val df = ((0 until 100).map(k => ("a", Some((k % 13).toDouble))) :+ (("a", None)))
      .toDF("g", "v")
    val got = ExactPercentiles.perGroup(df, "g", "v", Seq(("p50", 0.5)), 4.0)
    val again = ExactPercentiles.perGroup(df.repartition(7), "g", "v", Seq(("p50", 0.5)), 4.0)
    assert(got.collect().toSeq == again.collect().toSeq)
    assert(got.select("n").head.getLong(0) == 100L) // null dropped
    assert(rows(got.withColumn("p90", col("p50")).withColumn("p99", col("p50"))) ==
      rows(native(df.filter(col("v").isNotNull))
        .withColumn("p90", col("p50")).withColumn("p99", col("p50"))))
  }
}
