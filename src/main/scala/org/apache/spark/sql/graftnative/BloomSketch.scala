package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter build + probe over 64-bit hashes, wrapping the Catalyst
  * expressions behind Spark's own runtime join filters
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — see
  * spark/sql/catalyst/.../aggregate/BloomFilterAggregate.scala and the
  * `InjectRuntimeFilter` rule that plants them around shuffle joins).
  *
  * Why expose them directly: a semi-join build side that is too big to
  * broadcast AS ROWS usually still fits as a SKETCH. The aggregate's
  * partial buffers are plain bitmaps merged by OR, so building the filter
  * over N hashes is one corpus pass with a one-row (binary) result — no
  * shuffle of the build side at all — and the probe is a map-side
  * `might_contain` against the serialized bytes carried as a literal.
  * False positives only (never false negatives): a bloom prefilter keeps
  * every true match, so an exact confirmation join downstream sees a tiny
  * candidate set and the composition is result-identical to the plain
  * join.
  *
  * Lives under `org.apache.spark.sql` because both expressions are
  * `private[sql]`-adjacent internals (same placement rationale as
  * [[TopK]] / [[DotProduct]]).
  */
object BloomSketch {

  /** Aggregate column: serialized bloom filter (binary) over `hash`
    * (must be LongType — feed it `xxhash64(...)`). Sizing follows the
    * standard formulas; keep `numBits` under Spark's 67,108,864-bit
    * runtime-filter default cap for config-independence.
    */
  def bloomAgg(hash: Column, expectedItems: Long, numBits: Long): Column =
    ColumnBridge.column(
      new BloomFilterAggregate(
        ColumnBridge.expression(hash),
        Literal(expectedItems),
        Literal(numBits)).toAggregateExpression())

  /** Probe: true if `hash` might be in the sketch (exact for members;
    * false positives at the built fpp for non-members). The sketch bytes
    * ride along as a foldable binary literal, so the filter evaluates
    * map-side with zero shuffle.
    */
  def mightContain(sketchBytes: Array[Byte], hash: Column): Column =
    ColumnBridge.column(
      BloomFilterMightContain(
        Literal(sketchBytes, BinaryType),
        ColumnBridge.expression(hash)))
}
