package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass dataset profiler: per-column row counts, null counts, distinct
  * counts and min/max — the "what did I just ingest" report every pipeline
  * runs before trusting a new drop.
  *
  * Shape at scale: ONE aggregate over the table computes every column's
  * stats (the multi-distinct plan is Spark's Expand — one scan, rows
  * multiplied by the number of distinct aggregates, all map-side combined),
  * then the single result row unpivots via `inline` into one row per
  * column. No per-column rescans, no driver loop. At extreme widths swap
  * `count_distinct` for `approx_count_distinct` — the plan collapses from
  * Expand to a plain single-pass aggregate; the exact form here is the
  * oracle-checkable one.
  *
  * Output typing: numeric (and timestamp, via epoch micros) columns report
  * min/max in `min_num`/`max_num` (DOUBLE); string columns in
  * `min_str`/`max_str`. Min/max of stored values involve no arithmetic, so
  * cross-engine comparison is exact; epoch micros < 2^53 convert to double
  * losslessly. Rendering doubles into strings (one shared min/max column)
  * would instead tie the result to each engine's float-formatting rules.
  */
object Profile {

  sealed trait Kind
  case object Num extends Kind
  case object Str extends Kind
  case object Ts extends Kind

  final case class ColSpec(name: String, kind: Kind)

  def profile(df: DataFrame, specs: Seq[ColSpec]): DataFrame = {
    def minMax(s: ColSpec): (Column, Column) = s.kind match {
      case Num => (min(col(s.name)).cast("double"), max(col(s.name)).cast("double"))
      // Parquet NTZ timestamps → epoch micros via an explicit cast; the
      // session is pinned UTC so the NTZ→instant reading is stable.
      case Ts  => (min(unix_micros(col(s.name).cast("timestamp"))).cast("double"),
                   max(unix_micros(col(s.name).cast("timestamp"))).cast("double"))
      case Str => (lit(null).cast("double"), lit(null).cast("double"))
    }
    val aggs = specs.flatMap { s =>
      val (mn, mx) = minMax(s)
      Seq(
        count(col(s.name)).as(s"__n_${s.name}"),
        count(lit(1)).as(s"__rows_${s.name}"),
        count_distinct(col(s.name)).as(s"__nd_${s.name}"),
        mn.as(s"__mn_${s.name}"),
        mx.as(s"__mx_${s.name}"),
        (if (s.kind == Str) min(col(s.name)) else lit(null).cast("string")).as(s"__mns_${s.name}"),
        (if (s.kind == Str) max(col(s.name)) else lit(null).cast("string")).as(s"__mxs_${s.name}"))
    }
    val rows = specs.map { s =>
      struct(
        lit(s.name).as("col_name"),
        col(s"__n_${s.name}").as("n"),
        (col(s"__rows_${s.name}") - col(s"__n_${s.name}")).as("n_null"),
        col(s"__nd_${s.name}").as("n_distinct"),
        col(s"__mn_${s.name}").as("min_num"),
        col(s"__mx_${s.name}").as("max_num"),
        col(s"__mns_${s.name}").as("min_str"),
        col(s"__mxs_${s.name}").as("max_str"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(inline(array(rows: _*)))
  }
}
