package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

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

  /** Both operators work in INTEGER time units (epoch micros, slots, …):
    * the `(end - 1) / bucketWidth` explode bound and the
    * `greatest(starts) / bucketWidth` ownership filter are exact only for
    * integral bounds — with doubles, a start in (end-1, end) can land in a
    * bucket neither side exploded to and silently drop an overlapping
    * pair. Enforced at the schema level; scale fractional time first.
    */
  private def requireIntegral(df: DataFrame, cols: String*): Unit =
    cols.foreach { c =>
      df.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType => ()
        case other => throw new IllegalArgumentException(
          s"range-join column '$c' must be integral (integer time units), got $other")
      }
    }

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
    requireIntegral(points, pointCol)
    requireIntegral(intervals, startCol, endCol)
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

  /** Interval-interval overlap join: pair every left interval
    * [leftStart, leftEnd) with every right interval [rightStart, rightEnd)
    * it overlaps (half-open semantics: touching endpoints do NOT overlap),
    * optionally also matching equi-keys — "which maintenance windows
    * intersected which outages".
    *
    * Same equi-join trick as [[bucketed]], with BOTH sides exploded to
    * their covered buckets. Because two overlapping intervals can now
    * share several buckets, each candidate pair would surface once per
    * shared bucket — instead of a dedup shuffle, OWNERSHIP makes emission
    * unique for free: a pair is kept only in the bucket containing
    * `greatest(leftStart, rightStart)`. That instant lies inside both
    * intervals whenever they overlap (each side's start is <= it, and it
    * is < both ends), so exactly one of the shared buckets owns the pair.
    *
    * Cost model matches [[bucketed]] with replication on both sides:
    * ceil(length / bucketWidth) + 1 copies each — pick `bucketWidth` near
    * the typical interval length. At 100 TB the bucket column co-partitions
    * both sides; no row ever meets a row from a distant time range.
    */
  def overlap(
      left: DataFrame,
      right: DataFrame,
      leftStart: String,
      leftEnd: String,
      rightStart: String,
      rightEnd: String,
      bucketWidth: Long,
      keys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    requireIntegral(left, leftStart, leftEnd)
    requireIntegral(right, rightStart, rightEnd)
    val collisions = left.columns.toSet
      .intersect(right.columns.toSet)
      .diff(keys.toSet)
    require(collisions.isEmpty, s"ambiguous non-key columns on both sides: $collisions")
    // Empty intervals ([s, s) and worse) are dropped up front: they
    // overlap nothing by definition, but the pairwise predicate alone
    // would not reject them (rStart < lStart < rEnd passes), and
    // `sequence` silently counts DOWN for an inverted range.
    def explodeBuckets(df: DataFrame, s: String, e: String): DataFrame =
      df.filter(col(e) > col(s))
        .withColumn(
          "__bucket",
          explode(sequence(
            floor(col(s) / bucketWidth),
            floor((col(e) - 1) / bucketWidth))))
    val l = explodeBuckets(left, leftStart, leftEnd)
    val r = explodeBuckets(right, rightStart, rightEnd)
    l.join(r, keys :+ "__bucket")
      .filter(col(leftStart) < col(rightEnd) && col(rightStart) < col(leftEnd))
      .filter(col("__bucket") ===
        floor(greatest(col(leftStart), col(rightStart)) / bucketWidth))
      .drop("__bucket")
  }
}
