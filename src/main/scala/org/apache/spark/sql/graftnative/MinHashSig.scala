package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native one-pass MinHash signature over a string array: element s of the
  * result is min over the array of xxhash64(elem, seed = s), for seeds
  * 0..k-1.
  *
  * Why a custom Catalyst `Expression` (the [[DotProduct]] precedent): the
  * HOF form
  * `transform(typedLit(0 until k), s => array_min(transform(shingles, sh =>
  * xxhash64(sh, s))))` evaluates k × n interpreted lambda calls with
  * boxing AND materializes k intermediate hash arrays per row — and the
  * signature step runs once per corpus document in every MinHash dedup
  * path (d2/d5/d12/d13, the streaming near-dup frontier). The loop below
  * reads each element once and maintains the k running minima in a
  * primitive long[] — no allocation beyond the result. Because the
  * two-argument xxhash64 FOLDS (string first, then the seed index), the
  * string is hashed ONCE per element here and only the cheap hashInt fold
  * runs k times — the HOF form re-hashes every string's bytes k times.
  *
  * Bit-identical to the HOF form by construction. `xxhash64(sh, s)` is the
  * TWO-ARGUMENT hash — Spark folds its children left to right from the
  * fixed seed 42: `h = hashUTF8String(sh, 42); h = hashInt(s, h)` (a null
  * child leaves the running hash untouched — Spark's hash-of-null
  * contract). The per-(element, seed) value below is exactly that fold,
  * via the same catalyst `XXH64` statics the built-in emits. An EMPTY
  * array yields k null elements (`array_min` of an empty array is null).
  * TextFunctionsSpec pins the equivalence element-by-element, and the d3
  * minhash goldens ride on it.
  */
case class MinHashSig(child: Expression, k: Int, rehash: Boolean = false)
  extends UnaryExpression with ExpectsInputTypes {

  require(k > 0, s"k must be positive, got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](k))
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val e = arr.getUTF8String(i)
      var base = if (e == null) 42L else XXH64.hashUTF8String(e, 42L)
      if (rehash) base = XXH64.hashLong(base, 42L)
      var s = 0
      while (s < k) {
        val h = XXH64.hashInt(s, base)
        if (h < mins(s)) mins(s) = h
        s += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val e = ctx.freshName("e")
      val h = ctx.freshName("h")
      val base = ctx.freshName("base")
      val mins = ctx.freshName("mins")
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[$k]);
         |} else {
         |  long[] $mins = new long[$k];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    UTF8String $e = $a.getUTF8String($i);
         |    long $base = ($e == null) ? 42L : $xxh.hashUTF8String($e, 42L);
         |    ${if (rehash) s"$base = $xxh.hashLong($base, 42L);" else ""}
         |    for (int $s = 0; $s < $k; $s++) {
         |      long $h = $xxh.hashInt($s, $base);
         |      if ($h < $mins[$s]) $mins[$s] = $h;
         |    }
         |  }
         |  ${ev.value} =
         |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Column-level entry point. `rehash = true` selects the double-hash
    * family `min_s xxhash64(xxhash64(sh), s)` — bit-identical to
    * [[graft.dedup.Dedup.minhashSignatures]]'s historical explode/agg
    * form (hash the string once to a long, then fold the seed), which is
    * what the d2 golden and every stored frontier signature pin. The
    * default (false) is the direct `xxhash64(sh, s)` family of
    * [[graft.text.TextFunctions.minhashSignature]].
    */
  def apply(shingles: Column, k: Int): Column = apply(shingles, k, rehash = false)

  def apply(shingles: Column, k: Int, rehash: Boolean): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingles), k, rehash))
}
