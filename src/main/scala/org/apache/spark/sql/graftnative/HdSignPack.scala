package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Fused Walsh–Hadamard decorrelation + sign packing for the sign-band
  * ANN family: per input vector x, computes y = H·D·x (the fixed
  * transform of [[graft.similarity.Similarity.hdDecorrelate]] — H_ij =
  * (-1)^popcount(i&j), D_jj = (-1)^popcount(j·2654435769)) and returns
  * the packed sign words (bit i of word w set iff y[w·32+i] > 0), as
  * dim/32 longs.
  *
  * Why native: the HOF formulation (transform ∘ aggregate ∘ zip_with) is
  * interpreted AND re-evaluates the whole O(dim²) rotation per
  * downstream reference (two sign words × 32 slice elements referenced
  * the rotated array — measured ~6 s of pure lambda evaluation on the
  * 2 000-vector sf0.1 fixture, e21 2.0 → 8.9 s). Here the rotation is
  * one tight double loop per row inside whole-stage codegen; the
  * coefficient matrix is precomputed once per expression instance.
  * Summation order is j = 0..dim-1 sequential with ±1 coefficient
  * multiplies (exact sign flips) — bit-identical to the HOF form and to
  * DuckDB's list_dot_product mirror (SimilaritySpec pins the
  * differential; the e21/e22/e23/d17 oracles pin it cross-engine).
  *
  * A vector whose length differs from `dim` fails loudly
  * (IllegalArgumentException) — the signPack contract: silently
  * truncating or zero-padding sign bits is the worst failure mode.
  */
case class HdSignPack(child: Expression, dim: Int)
  extends UnaryExpression with ImplicitCastInputTypes {

  require(dim > 0 && (dim & (dim - 1)) == 0,
    s"HdSignPack needs a power-of-two dim, got $dim")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val packer = new HdSignPacker(dim)

  override def nullSafeEval(input: Any): Any =
    packer.pack(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hdSignPacker", packer,
      classOf[HdSignPacker].getName)
    defineCodeGen(ctx, ev, c => s"$ref.pack($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): HdSignPack =
    copy(child = newChild)
}

object HdSignPack {
  def apply(vec: Column, dim: Int): Column =
    ColumnBridge.column(HdSignPack(ColumnBridge.expression(vec), dim))
}

/** The rotation/packing engine behind [[HdSignPack]]. */
final class HdSignPacker(dim: Int) extends Serializable {

  // coef(i)(j) = H_ij * D_jj ∈ {-1.0, 1.0}
  private[this] val coef: Array[Array[Double]] = Array.tabulate(dim, dim) {
    (i, j) =>
      val h = 1 - 2 * (java.lang.Long.bitCount(i.toLong & j.toLong) & 1)
      val d = 1 - 2 * (java.lang.Long.bitCount(j.toLong * 2654435769L) & 1)
      (h * d).toDouble
  }

  def pack(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    require(n == dim, s"HdSignPack: dim=$dim but vector length $n")
    val v = new Array[Double](dim)
    var j = 0
    while (j < dim) { v(j) = arr.getDouble(j); j += 1 }
    val nWords = (dim + 31) / 32
    val words = new Array[Any](nWords)
    var w = 0
    while (w < nWords) { words(w) = 0L; w += 1 }
    var i = 0
    while (i < dim) {
      val c = coef(i)
      var s = 0.0
      var k = 0
      while (k < dim) { s += v(k) * c(k); k += 1 }
      if (s > 0.0) {
        val wi = i >> 5
        words(wi) = words(wi).asInstanceOf[Long] | (1L << (i & 31))
      }
      i += 1
    }
    new GenericArrayData(words)
  }
}
