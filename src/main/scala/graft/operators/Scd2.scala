package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history builder: collapse an ordered
  * change log into validity intervals — for each key, consecutive runs of
  * the same attribute value become one row with `valid_from` (first
  * occurrence), `valid_to` (start of the NEXT run, null while current),
  * the run's event count, and an `is_current` flag. The standard
  * warehouse-history shape built from an append-only log.
  *
  * Shape at scale: two windows and one aggregation, all partitioned by the
  * business key — no global window ever sees more than one key's history,
  * so a 100 TB log with bounded per-key cardinality parallelizes freely
  * (a pathological single hot key would need the q29d-style time-bucket
  * treatment; keys here are users/entities with human-scale histories).
  *
  * Determinism: the order within a key is (`tsCol`, `tieCol`) where
  * `tieCol` is unique (an event id), so run boundaries — and therefore
  * every output value — are partition-invariant. Change detection uses
  * null-safe equality: a null attribute value forms runs like any other
  * value instead of fusing with its neighbors.
  */
object Scd2 {

  def history(
      log: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      attrCol: String): DataFrame = {
    val byTime = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val runs = log
      .withColumn("__chg",
        when(lag(col(attrCol), 1).over(byTime) <=> col(attrCol), lit(0L)).otherwise(lit(1L)))
      .withColumn("version", sum(col("__chg")).over(byTime))
    val segs = runs
      .groupBy(col(keyCol), col("version"))
      .agg(
        first(col(attrCol)).as(attrCol),
        min(col(tsCol)).as("valid_from"),
        max(col(tsCol)).as("last_seen"),
        count(lit(1)).as("n_events"))
    // Tie-break by version: a key can have two runs sharing valid_from when
    // a run boundary falls on equal timestamps (ordered by tieCol upstream).
    // version is monotone in the true (ts, tieCol) order, so (valid_from,
    // version) makes lead() — and therefore valid_to/is_current —
    // partition-invariant even on tied starts.
    val byStart = Window.partitionBy(keyCol).orderBy(col("valid_from"), col("version"))
    segs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byStart))
      .withColumn("is_current", col("valid_to").isNull)
      .select(keyCol, "version", attrCol, "valid_from", "valid_to", "last_seen",
        "n_events", "is_current")
  }
}
