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

  test("quantile sketch honors the rank-error contract vs exact percentiles (t29)") {
    // 10k values with a heavy tail; accuracy 10000 => rank error <= n/1e4 = 1.
    val df = (1 to 10000).map(i => math.pow(i.toDouble / 100, 2)).toDF("v")
    val row = df.agg(
      percentile(col("v"), lit(0.45)).as("p45"),
      percentile(col("v"), lit(0.55)).as("p55"),
      approx_percentile(col("v"), lit(0.5), lit(10000)).as("p50s"),
      percentile(col("v"), lit(0.93)).as("p93"),
      percentile(col("v"), lit(0.97)).as("p97"),
      approx_percentile(col("v"), lit(0.95), lit(10000)).as("p95s"))
      .head
    assert(row.getDouble(2) >= row.getDouble(0) && row.getDouble(2) <= row.getDouble(1),
      s"approx p50 ${row.getDouble(2)} outside exact [p45, p55]")
    assert(row.getDouble(5) >= row.getDouble(3) && row.getDouble(5) <= row.getDouble(4),
      s"approx p95 ${row.getDouble(5)} outside exact [p93, p97]")
    // NOT layout-stable: merging partial summaries compresses even at
    // accuracy 10000 (measured: 2500.0 single-partition vs 2499.0001 at
    // 13 partitions) — the sketch's contract is the rank-error BAND, so
    // that band is what any layout must honor. This is exactly why t29 is
    // rows-only: value-hashing a sketch output would flake on layout.
    val b = df.repartition(13)
      .agg(approx_percentile(col("v"), lit(0.5), lit(10000))).head.getDouble(0)
    assert(b >= row.getDouble(0) && b <= row.getDouble(1),
      s"repartitioned approx p50 $b outside exact [p45, p55]")
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
