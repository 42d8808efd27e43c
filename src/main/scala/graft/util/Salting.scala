package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-salting for skewed shuffles (the hand-rolled complement to AQE's
  * skew-join splitting, for when a single key is hot enough that even a
  * split partition stalls — viral documents, the System program id, a
  * celebrity account).
  *
  * `saltedJoin` spreads each hot left-side key across `numSalts` shuffle
  * partitions and replicates the matching right-side rows once per salt, so
  * the join result is *identical* to the unsalted equi-join while no single
  * task owns a whole hot key. Use when the right side is too big to
  * broadcast but small enough to replicate `numSalts`x.
  *
  * Only LEFT-PRESERVING join types are supported: the right side is
  * replicated `numSalts` times, so any type that emits unmatched RIGHT rows
  * (right/full outer) would emit them once per salt — not the unsalted
  * result. Enforced by `require`.
  */
object Salting {

  // Normalized (lowercase, underscores stripped) left-preserving types.
  private val LeftPreserving =
    Set("inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti", "cross")

  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      numSalts: Int,
      joinType: String = "inner"): DataFrame = {
    require(numSalts > 0)
    require(
      LeftPreserving.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin replicates the right side $numSalts times; join type '$joinType' " +
        "would duplicate unmatched right rows — use a left-preserving type " +
        "(inner/left/left_semi/left_anti) or salt the other side.")
    // Any per-row spread works — the salt only picks a shuffle partition;
    // correctness never depends on its value. Hashing the row's partition id
    // + a cheap disambiguator keeps it allocation-free and codegen-friendly.
    val salted = left.withColumn(
      "__salt", pmod(xxhash64(spark_partition_id(), monotonically_increasing_id()), lit(numSalts)))
    val replicated = right.withColumn(
      "__salt", explode(typedLit((0 until numSalts).toArray)))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
