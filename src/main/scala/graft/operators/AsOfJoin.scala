package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType, TimestampType}

/** As-of join: for every left row (key, ts) attach the nearest right row
  * with the same key at-or-before it (backward — "state at event time":
  * latest account snapshot before a transaction) or at-or-after it
  * (forward — "next observation": first fill after an order). Spark has no
  * ASOF JOIN operator (DuckDB does; the oracles use it), so this is the
  * Spark-first construction:
  *
  * union both sides tagged with a side bit, shuffle ONCE on the key, sort
  * each partition by (ts, side) — ts descending for forward — and carry
  * the most recent right-side ROW (one struct of all its values + its
  * timestamp) across rows with `last(..., ignoreNulls = true)` over
  * UNBOUNDED PRECEDING..CURRENT. Left rows then read the nearest right
  * row's struct at their position; right rows are filtered back out.
  *
  * Why this shape at 100 TB: a naive `left.join(right, key && r.ts <=
  * l.ts)` explodes to every (left, right-predecessor) pair before a window
  * prunes it — quadratic per key. The union-scan form shuffles each row
  * exactly once, never materializes a pair, and the per-partition sort is
  * exactly what a sort-merge join would have paid anyway. Tie semantics: a
  * right row at ts == left.ts IS visible in both directions (>= / <=
  * match), because the sort orders the right side bit before the left at
  * equal timestamps.
  *
  * `tolerance` (max staleness): a match farther than `tolerance` time
  * units from the left row nulls out instead — and because the as-of match
  * is by definition the NEAREST right row, no farther candidate could have
  * qualified, so a post-filter on the matched row is exact. Units are
  * microseconds when the ts columns are timestamps, else the ts column's
  * own units.
  *
  * `timeBucket` is the hot-key hardening: `Window.partitionBy(keys)` alone
  * serializes each key's full history into one task — correct and
  * single-shuffle, but one pathological key (a bot user with a billion
  * events) becomes a straggler at 100x. With a bucket width set, rows
  * partition by (key, floor(ts / width)) so a hot key's history splits
  * across tasks; each bucket resolves locally and then fills from a
  * per-(key, bucket) carry table (the last right row of every bucket,
  * cumulatively carried in bucket order — a second, tiny window whose row
  * count per key is its BUCKET count, bounded by timespan / width, not its
  * event count). Same results as the unbucketed form (q29's oracle pins
  * it); costs one extra small shuffle + join, so reach for it when key
  * skew is real, not by default.
  *
  * The right side must be unique per (key, rightTs) — with duplicates,
  * "the" as-of row is ambiguous in any engine (DuckDB picks one
  * arbitrarily); callers pre-aggregate. Enforced here only by contract,
  * not a scan, to keep the operator single-pass; [[requireRightUnique]]
  * is the debug-mode scan for suspicious inputs.
  */
object AsOfJoin {

  /** Debug guard for the uniqueness contract: one aggregation pass over
    * the right side; throws with up to five offending (key, ts) groups if
    * any (key, rightTs) occurs more than once. Run it when wiring a new
    * right source, not per query — the production operator stays
    * single-pass by design.
    */
  def requireRightUnique(right: DataFrame, keys: Seq[String], rightTs: String): Unit = {
    val offending = right
      .groupBy((keys :+ rightTs).map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1)
      .take(5)
    if (offending.nonEmpty)
      throw new IllegalStateException(
        "as-of right side violates the (key, ts) uniqueness contract; " +
          s"offending groups (first ${offending.length}): " +
          offending.map(_.toString).mkString(", "))
  }

  /** Nearest right row at-or-before each left row. `valueCols` are the
    * right-side columns carried onto each left row (null when no right row
    * qualifies).
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String],
      tolerance: Option[Long] = None,
      timeBucket: Option[Long] = None): DataFrame =
    asofJoin(left, right, keys, leftTs, rightTs, valueCols,
      forward = false, tolerance, timeBucket)

  /** Nearest right row at-or-after each left row (reverse time order,
    * otherwise identical machinery).
    */
  def forward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String],
      tolerance: Option[Long] = None,
      timeBucket: Option[Long] = None): DataFrame =
    asofJoin(left, right, keys, leftTs, rightTs, valueCols,
      forward = true, tolerance, timeBucket)

  private def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String],
      forward: Boolean,
      tolerance: Option[Long],
      timeBucket: Option[Long]): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equi-key")
    tolerance.foreach(t => require(t >= 0, s"tolerance must be >= 0, got $t"))
    timeBucket.foreach(b => require(b > 0, s"timeBucket must be > 0, got $b"))
    val leftCols = left.columns.toSeq

    // Timestamps order identically as their microsecond epoch, and a
    // numeric __tsn is what bucketing and tolerance arithmetic need.
    // Fractional time columns (double/decimal) are rejected outright: the
    // long cast truncates, so 5.9 would become visible to a backward join
    // at 5.5 — a silent semantics change rather than a precision loss.
    def num(df: DataFrame, c: String): Column = {
      val dt: DataType = df.schema(c).dataType
      dt match {
        case TimestampType => unix_micros(col(c))
        case ByteType | ShortType | IntegerType | LongType => col(c).cast("long")
        case other => throw new IllegalArgumentException(
          s"as-of ts column '$c' must be timestamp or integral, got $other; " +
            "scale fractional time to integer units (e.g. epoch micros) first")
      }
    }
    // Right rows get side 0 so that at equal timestamps the right row
    // sorts before the left and is visible to it (>= / <= tie semantics).
    val taggedRight = right.select(
      keys.map(col) ++
        Seq(num(right, rightTs).as("__tsn"), lit(0).as("__side")) ++
        valueCols.map(c => col(c).as(s"__v_$c")): _*)
    val taggedLeft = left.select(
      leftCols.map(col) ++ Seq(num(left, leftTs).as("__tsn"), lit(1).as("__side")): _*)
    // The matched right row travels as ONE struct (its values + its __tsn
    // for the tolerance check): a single ignoreNulls carry of the whole
    // row, so a null inside a right value column stays that row's null
    // instead of falling through to an older row.
    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)
      .withColumn("__vs",
        when(col("__side") === 0,
          struct(valueCols.map(c => col(s"__v_$c").as(c)) :+ col("__tsn").as("__rts"): _*)))
    val tsOrd = if (forward) col("__tsn").desc else col("__tsn").asc

    val carried = timeBucket match {
      case None =>
        val w = Window
          .partitionBy(keys.map(col): _*)
          .orderBy(tsOrd, col("__side").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        unioned.withColumn("__asof", last(col("__vs"), ignoreNulls = true).over(w))
      case Some(width) =>
        val bucketed = unioned.withColumn("__bkt", floor(col("__tsn") / width))
        val bucketCols = (keys :+ "__bkt").map(col)
        // Pass 1: resolve within each (key, bucket) slice — bounded task.
        val w1 = Window
          .partitionBy(bucketCols: _*)
          .orderBy(tsOrd, col("__side").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // Persisted: the resolved slices feed the final fill join AND both
        // carry-table inputs below — without this the union-scan (both
        // base-table scans + the bucket window) ran three times (guide
        // §2.4 — q29d scanned events 5x).
        val inBucket = graft.util.CacheScope.persist(
          bucketed.withColumn("__in", last(col("__vs"), ignoreNulls = true).over(w1)))
        // Pass 2: each bucket's terminal right row (last in scan order =
        // max ts backward / min ts forward), cumulatively carried across
        // STRICTLY EARLIER buckets per key. One row per touched (key,
        // bucket) — the window that replaces "one task per key's history".
        val terminal =
          if (forward) min_by(col("__vs"), col("__tsn")) else max_by(col("__vs"), col("__tsn"))
        val summaries = inBucket.filter(col("__side") === 0)
          .groupBy(bucketCols: _*).agg(terminal.as("__s"))
        val allBuckets = inBucket.select(bucketCols: _*).distinct()
        val w2 = Window
          .partitionBy(keys.map(col): _*)
          .orderBy(if (forward) col("__bkt").desc else col("__bkt").asc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val carryTable = allBuckets
          .join(summaries, keys :+ "__bkt", "left_outer")
          .withColumn("__prev", last(col("__s"), ignoreNulls = true).over(w2))
          .select(bucketCols :+ col("__prev"): _*)
        inBucket
          .join(carryTable, keys :+ "__bkt")
          .withColumn("__asof", coalesce(col("__in"), col("__prev")))
    }

    val withinTolerance = tolerance.fold(lit(true)) { t =>
      val staleness =
        if (forward) col("__asof.__rts") - col("__tsn")
        else col("__tsn") - col("__asof.__rts")
      staleness <= t
    }
    carried
      .filter(col("__side") === 1)
      .withColumn("__hit", when(withinTolerance, col("__asof")))
      .select(leftCols.map(col) ++ valueCols.map(c => col(s"__hit.$c").as(c)): _*)
  }
}
