package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout: interleave the bits of two non-negative
  * integer keys so that rows close in BOTH dimensions land close in one
  * linear order. Sorting a table by the z-value before a partitioned /
  * bucketed parquet write gives every file a tight min/max envelope in
  * BOTH columns at once — so a scan filtered on either key (or a box on
  * both) prunes most files from the footer stats alone, where a
  * single-column sort only ever prunes its leading column. This is the
  * standard multi-dimensional clustering recipe (the published Delta/
  * Iceberg OPTIMIZE ZORDER approach) expressed as plain columns.
  *
  * Everything here is deterministic integer bit arithmetic (no sampling,
  * no range estimation), so the layout is reproducible across reruns and
  * engines — shard boundaries are fixed slices of the z-domain, not
  * sampled range bounds, and the oracle can recompute every value.
  */
object ZOrder {

  /** Morton code of two non-negative ints using their low `bits` bits:
    * x's bit i lands at even position 2i, y's at odd 2i+1. Values must
    * fit in `bits` bits (require-checked per row would cost a branch;
    * instead out-of-range high bits are simply ignored — document and
    * pre-scale keys, e.g. `key % (1 << bits)` or a dictionary id).
    * A pure fold of shift/and/or terms: one codegen'd projection, no UDF.
    */
  def zvalue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in 1..31, got $bits")
    val xs = x.cast("long")
    val ys = y.cast("long")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(xs, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(ys, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_.bitwiseOR(_))
  }

  /** The layout operator: z-value each row and assign it the contiguous
    * z-range shard that owns it (shard = zval scaled into nShards equal
    * slices of the 4^bits z-domain — FIXED boundaries, not sampled ones,
    * so assignment is deterministic at any parallelism). The returned
    * frame is range-partitioned and sorted by zval; write it
    * `.partitionBy("zshard")` when files must BE the fixed slices
    * (deterministic layout), or rely on the range partitioning alone for
    * size-balanced files (its bounds are SAMPLED — balanced, not
    * reproducible) — either way row order is zval and every file gets a
    * tight two-dimensional min/max envelope.
    */
  def layout(
      df: DataFrame,
      xCol: String,
      yCol: String,
      nShards: Int,
      bits: Int = 16): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val zDomain = 1L << (2 * bits)
    val out = df.withColumn("zval", zvalue(col(xCol), col(yCol), bits))
      // zval * nShards can overflow a long at bits=31; go through double —
      // exact while zval * nShards < 2^53 (always true for bits <= 25 and
      // any sane shard count). Above that, double rounding of zval near
      // 2^(2·bits) can round UP to zDomain and produce shard == nShards;
      // the least() clamp pins those boundary rows into the last shard
      // instead of an out-of-range one.
      .withColumn("zshard",
        least(lit(nShards - 1),
          floor(col("zval").cast("double") * nShards / zDomain.toDouble).cast("int")))
    out.repartitionByRange(nShards, col("zval")).sortWithinPartitions("zval")
  }

  /** The DuckDB mirror of [[zvalue]] — the same 2·bits shift/mask/or
    * terms as SQL text, so oracles recompute z-values exactly.
    */
  def zvalueSql(xExpr: String, yExpr: String, bits: Int = 16): String =
    (0 until bits).flatMap { i =>
      Seq(
        s"(((CAST($xExpr AS BIGINT) >> $i) & 1) << ${2 * i})",
        s"(((CAST($yExpr AS BIGINT) >> $i) & 1) << ${2 * i + 1})")
    }.mkString("(", " | ", ")")
}
