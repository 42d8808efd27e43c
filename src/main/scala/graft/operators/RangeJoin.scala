package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval containment join: pair every point row (ts) with every interval
  * row whose [start, end) contains it, optionally also matching equi-keys.
  *
  * Spark plans a raw `points.join(intervals, start <= ts && ts < end)` as a
  * BroadcastNestedLoopJoin (or worse, a cartesian product) — O(points ×
  * intervals) comparisons, the classic scale-killer for time-window
  * enrichment. This operator turns it into an equi-join: each interval is
  * exploded to the coarse buckets of width `bucketWidth` it overlaps, each
  * point belongs to exactly ONE bucket, and the join runs on
  * (keys..., bucket) with the exact containment predicate as a cheap
  * post-filter. Because a point has a single bucket, no result row can be
  * produced twice — no dedup pass needed.
  *
  * Cost model: interval replication = ceil(length / bucketWidth) + 1 copies,
  * so pick `bucketWidth` near the typical interval length — replication
  * stays O(1) and every bucket's population is bounded by the data's
  * time-locality, not the corpus size. At 100 TB the bucket column doubles
  * as a partition key so both sides co-locate.
  */
object RangeJoin {

  /** All columns from both inputs survive (equi-keys once). Point/interval
    * column names must not collide otherwise.
    */
  def bucketed(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long,
      keys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val overlap = points.columns.toSet
      .intersect(intervals.columns.toSet)
      .diff(keys.toSet)
    require(overlap.isEmpty, s"ambiguous non-key columns on both sides: $overlap")
    val p = points.withColumn("__bucket", floor(col(pointCol) / bucketWidth))
    // end is exclusive: an interval touching a bucket boundary exactly at
    // `end` contributes nothing there, hence the -1 before the floor div.
    val iv = intervals
      .withColumn(
        "__bucket",
        explode(sequence(
          floor(col(startCol) / bucketWidth),
          floor((col(endCol) - 1) / bucketWidth))))
    p.join(iv, keys :+ "__bucket")
      .filter(col(startCol) <= col(pointCol) && col(pointCol) < col(endCol))
      .drop("__bucket")
  }
}
