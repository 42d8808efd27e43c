package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Coalesce half-open intervals `[start, end)` per key into maximal
  * disjoint spans — the missing third sibling of the interval family
  * ([[RangeJoin]] matches intervals, [[AsOfJoin]] aligns points to them;
  * this one NORMALIZES them): overlapping spans merge, and with
  * `mergeTouching` (default) exactly-adjacent spans (`next.start ==
  * prev.end`) merge too, which is what token-span excision and
  * availability-window rollups want.
  *
  * The algorithm is the classic islands scan expressed as two window
  * functions: a running `max(end)` over earlier rows marks each interval
  * that starts beyond everything seen so far as an island head, and the
  * running count of heads is the island id — one shuffle on the keys,
  * then a plain rollup per island. Parallelism is per KEY (each key's
  * intervals sort within one task): bounded by per-entity interval
  * counts (a document's spans, a user's sessions), the same contract as
  * every per-entity window here — never a global sort.
  */
object IntervalMerge {

  def merge(
      df: DataFrame,
      keys: Seq[String],
      startCol: String,
      endCol: String,
      mergeTouching: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "interval merge needs at least one key column")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(startCol, endCol)
    val prevMax = max(col(endCol)).over(w.rowsBetween(Window.unboundedPreceding, -1))
    // Half-open semantics: [0,5) and [5,8) touch; merge them only when
    // asked. A null prevMax (first interval of a key) always heads an
    // island.
    val headCond =
      if (mergeTouching) col(startCol) > prevMax else col(startCol) >= prevMax
    df.withColumn("__head", when(coalesce(headCond, lit(true)), 1L).otherwise(0L))
      .withColumn("__island",
        sum(col("__head")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(keys.map(col) :+ col("__island"): _*)
      .agg(
        min(col(startCol)).as("span_start"),
        max(col(endCol)).as("span_end"),
        count(lit(1)).as("n_merged"))
      .drop("__island")
  }
}
