package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality gate — the dbt-tests/Deequ-style checks a
  * pipeline runs before publishing a table: not-null, uniqueness, value
  * range, pattern match. Returns one row per rule with its violation
  * count (0 = pass), so the caller alerts/aborts on any nonzero without
  * re-scanning.
  *
  * Shape at scale: every ROW-LOCAL rule (null/range/pattern) is a
  * conditional sum in ONE shared pass over the table — adding a rule
  * adds a counter, never a scan. Each uniqueness rule is its own
  * key-grouped aggregate (that shuffle is the price of a distributed
  * uniqueness proof; AQE splits skewed keys); its violation count is the
  * number of EXCESS rows (rows beyond the first per duplicated key), so
  * a clean table reports 0 and each dropped-on-dedup row counts once.
  * Null semantics: `notNull` counts nulls; `inRange`/`matches` skip
  * nulls (compose with `notNull` when null itself is a violation) — the
  * three-valued-logic trap spelled out instead of inherited.
  */
object Expectations {

  final case class NotNull(column: String) {
    def name = s"not_null($column)"
  }
  final case class InRange(column: String, lo: Double, hi: Double) {
    def name = s"in_range($column, $lo, $hi)"
  }
  final case class Matches(column: String, pattern: String) {
    def name = s"matches($column)"
  }
  final case class Unique(columns: Seq[String]) {
    def name = s"unique(${columns.mkString(", ")})"
  }

  def check(
      df: DataFrame,
      notNull: Seq[NotNull] = Nil,
      inRange: Seq[InRange] = Nil,
      matches: Seq[Matches] = Nil,
      unique: Seq[Unique] = Nil): DataFrame = {
    require(notNull.nonEmpty || inRange.nonEmpty || matches.nonEmpty || unique.nonEmpty,
      "at least one expectation is required")
    val rowLocal: Seq[(String, org.apache.spark.sql.Column)] =
      notNull.map(r => r.name -> col(r.column).isNull) ++
        inRange.map(r => r.name ->
          (col(r.column).isNotNull &&
            (col(r.column) < r.lo || col(r.column) > r.hi))) ++
        matches.map(r => r.name ->
          (col(r.column).isNotNull && !col(r.column).rlike(r.pattern)))
    val localCounts: Seq[DataFrame] =
      if (rowLocal.isEmpty) Nil
      else {
        val counters = rowLocal.zipWithIndex.map { case ((_, cond), i) =>
          sum(when(cond, 1L).otherwise(0L)).as(s"c$i")
        }
        val agg = df.agg(counters.head, counters.tail: _*)
        Seq(agg.select(
          explode(array(rowLocal.zipWithIndex.map { case ((n, _), i) =>
            struct(lit(n).as("rule"), coalesce(col(s"c$i"), lit(0L)).as("n_violations"))
          }: _*)).as("r"))
          .select(col("r.rule"), col("r.n_violations")))
      }
    val uniqueCounts: Seq[DataFrame] = unique.map { r =>
      df.groupBy(r.columns.map(col): _*)
        .agg(count(lit(1)).as("__n"))
        .filter(col("__n") > 1)
        .agg(coalesce(sum(col("__n") - 1), lit(0L)).as("n_violations"))
        .select(lit(r.name).as("rule"), col("n_violations"))
    }
    (localCounts ++ uniqueCounts).reduce(_ unionAll _)
  }
}
