package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The shared core of the two-phase global cumsum/numbering pattern
  * (c11): every user — global positions, token-budget trims, curriculum
  * cuts, q37/q53/q59's rank and cumsum rewrites, distributed exact
  * percentiles — range-buckets its keyed input on a monotone function of
  * the sort key, then needs each bucket's EXCLUSIVE prefix total to turn
  * per-bucket running windows into exact global ones. This builds that
  * offsets table once, instead of the same six lines hand-rolled per
  * site.
  */
object TwoPhase {

  /** Per-bucket totals with exclusive prefix offsets:
    * (partitionCols..., bucketCol, __bt, __off) — `__bt` is `perBucket`
    * aggregated within the bucket (callers that don't reuse it just drop
    * it), `__off` the sum of all EARLIER buckets' `__bt` (0 for the
    * first). The prefix window runs over BUCKET-COUNT rows — never the
    * data — and is partition-less only when `partitionCols` is empty;
    * keep the bucket column named `__b` (the repo-wide convention
    * PlanAuditSpec's global-window gate recognizes). Join the result back
    * `broadcast` on (partitionCols, bucketCol) and add a per-bucket
    * running window for the exact global cumsum/rank.
    */
  def offsets(
      keyed: DataFrame,
      bucketCol: String,
      perBucket: Column,
      partitionCols: Seq[String] = Nil): DataFrame = {
    val offW = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(bucketCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    keyed
      .groupBy((partitionCols :+ bucketCol).map(col): _*)
      .agg(perBucket.as("__bt"))
      .withColumn("__off", coalesce(sum(col("__bt")).over(offW), lit(0)))
  }
}
