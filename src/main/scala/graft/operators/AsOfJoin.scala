package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row (key, ts) attach the most recent
  * right row with the same key and right.ts <= left.ts — the canonical
  * "state at event time" lookup (latest account snapshot before a
  * transaction, latest click before a purchase). Spark has no ASOF JOIN
  * operator (DuckDB does; the oracle uses it), so this is the Spark-first
  * construction:
  *
  * union both sides tagged with a side bit, shuffle ONCE on the key, sort
  * each partition by (ts, side), and carry the right side's values forward
  * with `last(..., ignoreNulls = true)` over rows UNBOUNDED PRECEDING..CURRENT.
  * Left rows then read the latest right values at their position; right rows
  * are filtered back out.
  *
  * Why this shape at 100 TB: a naive `left.join(right, key && r.ts <= l.ts)`
  * explodes to every (left, right-predecessor) pair before a window prunes
  * it — quadratic per key. The union-scan form shuffles each row exactly
  * once, never materializes a pair, and the per-partition sort is exactly
  * what a sort-merge join would have paid anyway. Tie semantics: a right row
  * at ts == left.ts IS visible (>= match), because the sort orders the right
  * side bit before the left at equal timestamps.
  *
  * The right side must be unique per (key, rightTs) — with duplicates,
  * "the" as-of row is ambiguous in any engine (DuckDB picks one
  * arbitrarily); callers pre-aggregate. Enforced here only by contract, not
  * a scan, to keep the operator single-pass.
  */
object AsOfJoin {

  /** @param valueCols right-side columns to carry onto each left row
    *                   (null when no right row precedes the left row).
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equi-key")
    val leftCols = left.columns.toSeq
    // Right rows first (side 0) so an equal-timestamp right row is visible
    // to the left row (backward >= semantics).
    val taggedRight = right.selectExpr(
      (keys :+ s"$rightTs AS __ts") ++ valueCols.map(c => s"$c AS __v_$c") :+ "0 AS __side": _*)
    val taggedLeft = left.select(
      leftCols.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__side")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__v_$c")): _*)
    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"__asof_$c", last(col(s"__v_$c"), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ valueCols.map(c => col(s"__asof_$c").as(c)): _*)
  }
}
