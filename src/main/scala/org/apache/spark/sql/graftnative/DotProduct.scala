package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native codegen dot product over two numeric arrays.
  *
  * Why a custom Catalyst `Expression`: Spark's higher-order functions
  * (`zip_with` + `aggregate`) cannot participate in whole-stage codegen —
  * each per-element lambda call goes through interpreted evaluation with
  * boxing, and the ANN pair joins evaluate this in their innermost loop
  * (millions of candidate pairs x vector dim). `doGenCode` below emits a
  * tight primitive loop instead; `eval` provides the interpreted fallback.
  *
  * Semantics match `aggregate(zip_with(cast(a as array<double>), cast(b as
  * array<double>), (x,y) -> x*y), 0d, (acc,v) -> acc+v)` exactly: elements
  * widen to double individually and accumulate left-to-right, so results are
  * bit-identical to the HOF form (and to DuckDB's list_dot_product order) —
  * the e1 oracle hash-compares on this. Vector elements are assumed
  * non-null (embedding columns); a null array yields null, and so does a
  * length mismatch (zip_with null-pads the shorter side and the null
  * propagates through the sum — the HOF form returns null, so this must).
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)),
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))

  override def dataType: DataType = DoubleType

  // Nullable regardless of children: mismatched lengths yield null.
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val xv = CodeGenerator.getValue(a, elemType(left), i)
      val yv = CodeGenerator.getValue(b, elemType(right), i)
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $sum += ((double)($xv)) * ((double)($yv));
         |  }
         |  ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-level entry point. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
