package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** HLL sketch accuracy/merge pins for the t13 rows-only entry (sketch
  * internals are engine-specific, so no SQL oracle can exist).
  */
class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  test("hll estimate lands within 5% of a 20k-distinct truth") {
    val df = (0 until 60000).map(i => i % 20000).toDF("v")
    val est = df.agg(hll_sketch_estimate(hll_sketch_agg(col("v"), lit(12))))
      .head.getLong(0)
    assert(math.abs(est - 20000.0) / 20000.0 < 0.05, s"estimate $est")
  }

  test("partial sketches union to the whole (mergeable one-row state)") {
    val df = (0 until 10000).toDF("v")
    val whole = df.agg(hll_sketch_estimate(hll_sketch_agg(col("v"), lit(12))))
      .head.getLong(0)
    val merged = df
      .withColumn("part", col("v") % 4)
      .groupBy("part").agg(hll_sketch_agg(col("v"), lit(12)).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .head.getLong(0)
    assert(merged == whole,
      s"union-of-parts ($merged) must equal single-pass ($whole) at the same lgK")
  }
}
