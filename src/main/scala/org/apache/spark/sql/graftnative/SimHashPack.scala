package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native packed 64-bit SimHash over a token array: bit b of the result is
  * set when STRICTLY more than half the tokens have bit b set in their
  * xxhash64 (single-argument form: seed 42) — Charikar's sign-of-sums with
  * ±1 votes.
  *
  * Why a custom Catalyst `Expression` (the [[MinHashSig]] precedent): the
  * row-local HOF form runs 64 interpreted `filter` passes over the hash
  * array per document, and the distributed explode/agg form pays a
  * corpus-sized 65-aggregate shuffle per build. This loop reads each token
  * once — one string hash, then 64 primitive bit-votes — and packs the
  * majority bits with no shuffle and no intermediate arrays.
  *
  * Bit-identical to both prior forms (DedupSpec + TextFunctionsSpec pin
  * it; the d3 simhash golden rides on it): votes count DUPLICATE tokens
  * (the explode form's semantics), a null element votes with hash 42
  * (hash-of-null contract), and an empty array packs to 0L (no majority
  * anywhere — unreachable via tokens(), which never yields an empty
  * split).
  */
case class SimHashPack(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val e = arr.getUTF8String(i)
      val h = if (e == null) 42L else XXH64.hashUTF8String(e, 42L)
      var b = 0
      while (b < 64) {
        votes(b) += ((h >>> b) & 1L).toInt
        b += 1
      }
      i += 1
    }
    var packed = 0L
    var b = 0
    while (b < 64) {
      if (2L * votes(b) > n) packed |= (1L << b)
      b += 1
    }
    packed
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val e = ctx.freshName("e")
      val h = ctx.freshName("h")
      val votes = ctx.freshName("votes")
      val packed = ctx.freshName("packed")
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      s"""
         |int $n = $a.numElements();
         |int[] $votes = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  UTF8String $e = $a.getUTF8String($i);
         |  long $h = ($e == null) ? 42L : $xxh.hashUTF8String($e, 42L);
         |  for (int $b = 0; $b < 64; $b++) {
         |    $votes[$b] += (int) (($h >>> $b) & 1L);
         |  }
         |}
         |long $packed = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if (2L * $votes[$b] > $n) $packed |= (1L << $b);
         |}
         |${ev.value} = $packed;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashPack =
    copy(child = newChild)
}

object SimHashPack {
  /** Column-level entry point. */
  def apply(tokens: Column): Column =
    ColumnBridge.column(SimHashPack(ColumnBridge.expression(tokens)))
}
