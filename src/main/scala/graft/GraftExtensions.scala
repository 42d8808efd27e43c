package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.graftnative.DotProduct

import graft.text.TextFunctions

/** SparkSessionExtensions entry point — the deployment hook for this
  * library's SQL surface on a cluster:
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * makes the functions below available to plain SQL everywhere (Catalyst
  * expressions, not UDFs — they stay inside whole-stage codegen).
  * [[GraftExtensions.register]] does the same for a live session.
  *
  *   dot_product(arr, arr)   native codegen dot product (ANN hot loop)
  *   cosine_sim(arr, arr)    cosine similarity (dot / norm product)
  *   lang_id(text)           stopword-argmax language guess
  *   token_count(text)       whitespace token count
  *   simhash64(text)         64-bit packed simhash
  *   hamming64(a, b)         popcount(a XOR b) for packed simhashes
  *   text_fingerprint(text)  64-bit document content hash
  *   minhash_sig(shingles, k)  k-long MinHash signature (row-local native)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def dotProductBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2, s"dot_product expects 2 arguments, got ${args.length}")
    DotProduct(args.head, args(1))
  }

  /** Adapt a Column-level function to a SQL FunctionRegistry builder. */
  private def columnFn(name: String, arity: Int)(f: Seq[Column] => Column)
      : Seq[Expression] => Expression =
    args => {
      require(args.length == arity, s"$name expects $arity arguments, got ${args.length}")
      ColumnBridge.resolvedExpression(f(args.map(ColumnBridge.column)))
    }

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "dot_product" -> dotProductBuilder,
    "lang_id" -> columnFn("lang_id", 1)(a => TextFunctions.langId(a.head)),
    "token_count" -> columnFn("token_count", 1)(a => TextFunctions.nTokens(a.head)),
    "simhash64" -> columnFn("simhash64", 1)(a => TextFunctions.simhashBitVector(a.head)),
    "hamming64" -> columnFn("hamming64", 2)(a => TextFunctions.hamming(a.head, a(1))),
    "text_fingerprint" -> columnFn("text_fingerprint", 1)(a => TextFunctions.fingerprint(a.head)),
    "cosine_sim" -> columnFn("cosine_sim", 2)(a =>
      graft.similarity.Similarity.cosine(a.head, a(1))),
    // k must be a foldable int literal — it sizes the signature buffer.
    "minhash_sig" -> { args =>
      require(args.length == 2, s"minhash_sig expects 2 arguments, got ${args.length}")
      val k = args(1) match {
        case e if e.foldable && e.dataType == org.apache.spark.sql.types.IntegerType =>
          e.eval().asInstanceOf[Int]
        case other =>
          throw new IllegalArgumentException(
            s"minhash_sig k must be an INT literal, got $other")
      }
      org.apache.spark.sql.graftnative.MinHashSig(args.head, k)
    })

  private[graft] val descriptors
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    builders.map { case (name, b) =>
      (FunctionIdentifier(name), new ExpressionInfo("graft.GraftExtensions", name), b)
    }

  /** Register the SQL functions into a live session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      ColumnBridge.registerTempFunction(spark, name, b)
    }
}
