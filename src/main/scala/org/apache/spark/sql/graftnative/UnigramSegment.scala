package org.apache.spark.sql.graftnative

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi segmentation for ONE word under a unigram language model
  * (Kudo, "Subword Regularization", ACL 2018 — the SentencePiece unigram
  * algorithm's inference step): the piece vocabulary with integer-micro
  * log-costs is baked into the expression, and each word is segmented by
  * the exact-integer DP
  *
  *   best[j] = min over pieces p ending at j of best[j - |p|] ⊕ p
  *
  * minimizing (total_cost, n_pieces, piece-sequence) lexicographically —
  * costs are BIGINT micros of the decimal(12,6)-grid ln (the t20
  * contract), so the DP is pure integer arithmetic and the tie-break
  * total, which is what lets the same segmentation be reproduced
  * pass-for-pass by an unrolled relaxation in DuckDB SQL (the t43/t44
  * oracles). Piece-sequence order uses UTF-8 BYTE comparison — Spark's
  * UTF8String and DuckDB's default binary collation, NOT Java's UTF-16
  * compareTo, which disagrees above the BMP.
  *
  * A word containing a character absent from the vocabulary has no
  * segmentation; the deterministic fallback emits the word's code points
  * as singleton tokens (the <unk>-free analog of SentencePiece's byte
  * fallback). The oracled queries never hit it — learn always seeds every
  * corpus character — so the SQL mirror covers only the reachable path;
  * UnigramSpec pins the fallback Spark-side.
  *
  * Same plan shape as [[BpeSegment]]: one codegen projection regardless
  * of vocabulary size, O(|word| · maxPieceLen) hash probes per row.
  */
case class UnigramSegment(child: Expression, pieces: Seq[String], costs: Seq[Long])
  extends UnaryExpression with ExpectsInputTypes {

  require(pieces.length == costs.length,
    s"vocab halves differ: ${pieces.length} vs ${costs.length}")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = StringType

  @transient private lazy val segmenter =
    new UnigramViterbi(pieces.toArray, costs.toArray)

  override def nullSafeEval(input: Any): Any =
    segmenter.segment(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramSegmenter", segmenter,
      classOf[UnigramViterbi].getName)
    defineCodeGen(ctx, ev, c => s"$ref.segment($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramSegment =
    copy(child = newChild)
}

object UnigramSegment {
  /** `word` segmented under the (piece, cost_micro) vocabulary as a
    * space-joined piece string.
    */
  def apply(word: Column, vocab: Seq[(String, Long)]): Column =
    ColumnBridge.column(
      UnigramSegment(ColumnBridge.expression(word),
        vocab.map(_._1), vocab.map(_._2)))
}

/** The DP engine behind [[UnigramSegment]], shared across rows via a
  * codegen reference object.
  */
final class UnigramViterbi(pieces: Array[String], costs: Array[Long])
  extends Serializable {

  // piece -> cost lookup; also the max piece length bounds the DP's
  // inner scan.
  @transient private lazy val lookup: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    var i = 0
    while (i < pieces.length) {
      // duplicate pieces keep the LOWEST cost (deterministic; learn
      // never emits duplicates)
      val prev = m.get(pieces(i))
      if (prev == null || costs(i) < prev.longValue) m.put(pieces(i), costs(i))
      i += 1
    }
    m
  }
  @transient private lazy val maxLen: Int =
    if (pieces.isEmpty) 0 else pieces.map(_.length).max

  /** UTF-8 byte order on strings — Spark UTF8String / DuckDB binary
    * collation semantics.
    */
  private def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(StandardCharsets.UTF_8)
    val y = b.getBytes(StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    x.length - y.length
  }

  /** (cost, np, path) lexicographic: negative if a < b. Paths compared
    * piece-wise in UTF-8 byte order; equal piece counts make the
    * sequence comparison total.
    */
  private def better(
      costA: Long, npA: Int, pathA: List[String],
      costB: Long, npB: Int, pathB: List[String]): Boolean = {
    if (costA != costB) return costA < costB
    if (npA != npB) return npA < npB
    var a = pathA
    var b = pathB
    while (a.nonEmpty && b.nonEmpty) {
      val d = utf8Compare(a.head, b.head)
      if (d != 0) return d < 0
      a = a.tail
      b = b.tail
    }
    a.isEmpty && b.nonEmpty
  }

  def segment(word: UTF8String): UTF8String =
    UTF8String.fromString(segmentJava(word.toString))

  def segmentJava(word: String): String = {
    if (word.isEmpty) return ""
    val n = word.length
    val cost = new Array[Long](n + 1)
    val np = new Array[Int](n + 1)
    // path stored REVERSED (head = last piece) so extension is O(1);
    // comparisons rebuild forward order lazily via toReversed lists.
    val path = new Array[List[String]](n + 1)
    val reach = new Array[Boolean](n + 1)
    reach(0) = true
    path(0) = Nil
    var j = 1
    while (j <= n) {
      var bestSet = false
      val from = math.max(0, j - maxLen)
      var i = from
      while (i < j) {
        if (reach(i)) {
          val cand = word.substring(i, j)
          val c = lookup.get(cand)
          if (c != null) {
            val cc = cost(i) + c.longValue
            val cnp = np(i) + 1
            val cpath = cand :: path(i)
            if (!bestSet ||
              better(cc, cnp, cpath.reverse, cost(j), np(j), path(j).reverse)) {
              cost(j) = cc; np(j) = cnp; path(j) = cpath; bestSet = true
            }
          }
        }
        i += 1
      }
      reach(j) = bestSet
      j += 1
    }
    if (!reach(n)) {
      // deterministic code-point fallback (unreachable: unseen character)
      val sb = new java.lang.StringBuilder(n * 2)
      var ci = 0
      while (ci < n) {
        val cp = word.codePointAt(ci)
        if (ci > 0) sb.append(' ')
        sb.appendCodePoint(cp)
        ci += Character.charCount(cp)
      }
      return sb.toString
    }
    val sb = new java.lang.StringBuilder(n * 2)
    var first = true
    path(n).reverse.foreach { p =>
      if (!first) sb.append(' ')
      sb.append(p)
      first = false
    }
    sb.toString
  }
}
