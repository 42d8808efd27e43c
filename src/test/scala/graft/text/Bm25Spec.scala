package graft.text

import graft.SparkTestBase

class Bm25Spec extends SparkTestBase {
  import spark.implicits._

  // 4 docs, hand-sized: "apple" is rare (df=1), "the" is everywhere (df=4).
  private def docs = Seq(
    (1L, "the apple tree"),
    (2L, "the quick fox"),
    (3L, "the lazy dog the end"),
    (4L, "the fox and the dog"))
    .toDF("doc_id", "text")

  private def queries = Seq((1L, "apple"), (2L, "the fox")).toDF("query_id", "query_text")

  /** The operator's exact fixed-point arithmetic, restated independently. */
  private def fp6(tf: Long, df: Long, dl: Long, n: Long, l: Long): Long = {
    val num = (2 * n - 2 * df + 1).toDouble * 22 * tf * l
    val den = (2 * df + 1).toDouble * (10 * l * tf + 3 * l + 9 * dl * n)
    math.floor(num / den * 1e6).toLong
  }

  test("rare term ranks its one document; score matches the closed form") {
    val got = Bm25.search(docs, queries, k = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val q1 = got.filter(_._1 == 1L)
    assert(q1.length == 1 && q1.head._3 == 1L)
    // corpus: N=4, L=3+3+5+5=16; apple: tf=1, df=1, dl=3
    assert(q1.head._4 == fp6(tf = 1, df = 1, dl = 3, n = 4, l = 16))
  }

  test("multi-term query sums per-term scores; both-term docs beat one-term docs") {
    val got = Bm25.search(docs, queries, k = 4).collect()
      .filter(_.getLong(0) == 2L)
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // docs 2 and 4 contain 'fox' + 'the'; docs 1,3 only 'the'
    assert(got.take(2).map(_._2).toSet == Set(2L, 4L))
    val the = Map(1L -> (1L, 3L), 2L -> (1L, 3L), 3L -> (2L, 5L), 4L -> (2L, 5L))
    val expected = the.map { case (id, (tf, dl)) =>
      val fox = if (id == 2L) fp6(1, 2, 3, 4, 16) else if (id == 4L) fp6(1, 2, 5, 4, 16) else 0L
      id -> (fp6(tf, 4, dl, 4, 16) + fox)
    }
    got.foreach { case (_, id, s) => assert(s == expected(id), s"doc $id") }
    // ranks follow score desc, then doc_id
    assert(got.map(_._1).toSeq == (1L to 4L))
  }

  test("query terms absent from the corpus contribute nothing (and don't crash)") {
    val q = Seq((9L, "zzz apple")).toDF("query_id", "query_text")
    val got = Bm25.search(docs, q, k = 4).collect()
    assert(got.length == 1 && got.head.getLong(2) == 1L)
  }

  test("phrase rescoring lifts an exact-phrase doc over higher-BM25 term-bag docs") {
    // doc 5 contains the exact phrase once; doc 6 repeats the terms as a
    // bag (higher BM25 tf) but never consecutively.
    val d = docs.unionByName(Seq(
      (5L, "a b the quick fox c d"),
      (6L, "quick quick fox fox the the end"))
      .toDF("doc_id", "text"))
    val q = Seq((1L, "the quick fox")).toDF("query_id", "query_text")
    // doc -> rank maps (note doc 2 of the base fixture is literally the
    // phrase "the quick fox", so it carries the bonus too and stays first)
    val base = Bm25.search(d, q, k = 6).collect()
      .map(r => r.getLong(2) -> r.getLong(1)).toMap
    val resc = Bm25.searchRescored(d, q, k = 6, candidateFactor = 1).collect()
      .map(r => r.getLong(2) -> r.getLong(1)).toMap
    assert(base(6L) < base(5L), s"bag doc should out-BM25 the phrase doc, got $base")
    assert(resc(5L) < resc(6L), s"phrase doc should outrank the bag doc rescored, got $resc")
    assert(resc(2L) == 1L, s"the exact-phrase-only doc keeps rank 1, got $resc")
    // non-phrase docs keep their BM25 score (bonus is additive-only)
    intercept[IllegalArgumentException](
      Bm25.searchRescored(d, q, k = 6, candidateFactor = 0))
  }

  test("ranking is repartition-stable (fixed-point sums)") {
    def run(d: org.apache.spark.sql.DataFrame) =
      Bm25.search(d, queries, k = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted.toSeq
    assert(run(docs) == run(docs.repartition(7)))
  }
}
