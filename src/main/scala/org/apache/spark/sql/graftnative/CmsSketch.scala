package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{count_min_sketch, lit}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min-sketch build + probe: the frequency analogue of
  * [[BloomSketch]]. The build is Spark's own `count_min_sketch` aggregate
  * (partial buffers are counter matrices merged by elementwise add — a
  * one-row binary result, no build-side shuffle); the probe deserializes
  * the sketch ONCE per executor and estimates a hash's frequency map-side.
  *
  * The load-bearing property is one-sided error: a count-min estimate is
  * ALWAYS >= the true count (hash collisions only ever add). So
  * `estimate(h) >= T` keeps every truly-frequent item — a heavy-hitter
  * prefilter with no false negatives — and an exact count of the
  * survivors downstream removes every false positive, making the
  * composition result-identical to the exact groupBy while only
  * candidate rows (instead of the entire long tail of near-unique items)
  * ever reach a shuffle.
  *
  * Lives under `org.apache.spark.sql` for the same bridge-visibility
  * reason as [[BloomSketch]] / [[TopK]] / [[DotProduct]].
  */
object CmsSketch {

  /** Aggregate column: serialized count-min sketch (binary) over `hash`
    * (LongType — feed it `xxhash64(...)`). `eps` is the relative
    * overestimate bound (width = ceil(2/eps) counters), `confidence` the
    * probability the bound holds (depth = ceil(ln(1/(1-confidence)))
    * rows); both trade sketch bytes against candidate volume, never
    * correctness of the prefilter-plus-confirm composition.
    */
  def cmsAgg(hash: Column, eps: Double, confidence: Double, seed: Int): Column = {
    require(eps > 0 && eps < 1, s"eps must be in (0,1), got $eps")
    require(confidence > 0 && confidence < 1,
      s"confidence must be in (0,1), got $confidence")
    count_min_sketch(hash, lit(eps), lit(confidence), lit(seed))
  }

  /** Probe: estimated frequency of `hash` in the sketch (always >= the
    * true count). The sketch bytes ride in the expression; each executor
    * deserializes once (transient lazy) and every row is a depth-many
    * array lookup — map-side, zero shuffle.
    */
  def estimate(sketchBytes: Array[Byte], hash: Column): Column =
    ColumnBridge.column(CmsEstimate(sketchBytes, ColumnBridge.expression(hash)))
}

/** Scalar probe for a serialized [[CountMinSketch]]: `estimateCount` of a
  * long hash. The sketch is a constructor value (not a child expression)
  * so the tree stays unary and the bytes deserialize once per JVM via the
  * transient lazy, not per row.
  */
case class CmsEstimate(sketchBytes: Array[Byte], child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = LongType

  @transient private lazy val cms: CountMinSketch =
    CountMinSketch.readFrom(sketchBytes)

  override def nullSafeEval(v: Any): Any =
    cms.estimateCount(v.asInstanceOf[java.lang.Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cms", cms, classOf[CountMinSketch].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $ref.estimateCount(java.lang.Long.valueOf($v));")
  }

  override protected def withNewChildInternal(newChild: Expression): CmsEstimate =
    copy(child = newChild)
}
