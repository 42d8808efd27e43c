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

  // (title, body) fixture for the BM25F contracts — bodies include an
  // empty one so the concatenation round-trip's [''] token is exercised.
  private def fieldedDocs = Seq(
    (1L, "the apple tree", "a ripe apple fell from the tree"),
    (2L, "the quick fox", ""),
    (3L, "the lazy dog", "the end of the lazy dog"),
    (4L, "fox and dog", "the fox chases the dog"))
    .toDF("doc_id", "title", "body")

  test("BM25F: equal weights equal plain search on the concatenation") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val fielded = Bm25.searchFielded(fieldedDocs, queries, k = 4,
      fields = Seq("title" -> 1L, "body" -> 1L)).orderBy("query_id", "rk")
    val concat = Bm25.search(
      fieldedDocs.selectExpr("doc_id", "concat(title, ' ', body) AS text"),
      queries, k = 4).orderBy("query_id", "rk")
    assert(rows(fielded) == rows(concat))
  }

  test("BM25F: weight 0 on a field equals ignoring that field") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val zeroBody = Bm25.searchFielded(fieldedDocs, queries, k = 4,
      fields = Seq("title" -> 1L, "body" -> 0L)).orderBy("query_id", "rk")
    val titleOnly = Bm25.search(
      fieldedDocs.selectExpr("doc_id", "title AS text"),
      queries, k = 4).orderBy("query_id", "rk")
    assert(rows(zeroBody) == rows(titleOnly))
  }

  test("BM25F: a title hit outranks the same hit in the body under weight") {
    // 'apple' appears once in doc 5's TITLE and once in doc 6's BODY;
    // everything else about the two docs is identical, so with title
    // weight 3 the title hit must rank first (and the weighted score must
    // match the closed form on weighted tf/dl).
    val d2 = Seq(
      (5L, "apple pie recipe", "flour butter sugar salt"),
      (6L, "plain pie recipe", "flour apple sugar salt"))
      .toDF("doc_id", "title", "body")
    val q = Seq((1L, "apple")).toDF("query_id", "query_text")
    val got = Bm25.searchFielded(d2, q, k = 2,
      fields = Seq("title" -> 3L, "body" -> 1L)).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.head._2 == 5L, s"title hit must rank first, got ${got.toSeq}")
    // weighted quantities: doc5 wtf=3, wdl=3*3+4=13; doc6 wtf=1, wdl=3*3+4=13;
    // N=2, WL=26; df=2 (both docs match 'apple')
    assert(got.head._3 == fp6(tf = 3, df = 2, dl = 13, n = 2, l = 26))
    assert(got(1)._3 == fp6(tf = 1, df = 2, dl = 13, n = 2, l = 26))
  }

  test("BM25F dlWeighted: modes coincide under uniform weights, diverge under boost") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    // All weights 1: weighted and unweighted length spaces are the same
    // space, so the flag must not change a single row.
    val w1 = Bm25.searchFielded(fieldedDocs, queries, k = 4,
      fields = Seq("title" -> 1L, "body" -> 1L), dlWeighted = true)
      .orderBy("query_id", "rk")
    val u1 = Bm25.searchFielded(fieldedDocs, queries, k = 4,
      fields = Seq("title" -> 1L, "body" -> 1L), dlWeighted = false)
      .orderBy("query_id", "rk")
    assert(rows(w1) == rows(u1))
    // Non-uniform weights AND unequal doc lengths: dl moves from
    // Σ w_f·len_f to Σ len_f, the dl/avgdl ratios shift (equal-length
    // docs would make both modes coincide — dl=avgdl is scale-invariant),
    // and the closed form tracks each mode exactly.
    val d2 = Seq(
      (5L, "apple pie recipe", "flour butter"),
      (6L, "plain pie recipe", "flour apple sugar salt butter oil"))
      .toDF("doc_id", "title", "body")
    val q = Seq((1L, "apple")).toDF("query_id", "query_text")
    val unw = Bm25.searchFielded(d2, q, k = 2,
      fields = Seq("title" -> 3L, "body" -> 1L), dlWeighted = false).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // unweighted lengths: dl5=3+2=5, dl6=3+6=9, N=2, L=14; tf stays weighted
    assert(unw.head._2 == 5L)
    assert(unw.head._3 == fp6(tf = 3, df = 2, dl = 5, n = 2, l = 14))
    assert(unw(1)._3 == fp6(tf = 1, df = 2, dl = 9, n = 2, l = 14))
    // and the two modes really differ on this fixture
    val wtd = Bm25.searchFielded(d2, q, k = 2,
      fields = Seq("title" -> 3L, "body" -> 1L), dlWeighted = true).collect()
      .map(r => r.getLong(3))
    // weighted lengths: dl5=9+2=11, dl6=9+6=15, L=26
    assert(wtd.toSeq == Seq(
      fp6(tf = 3, df = 2, dl = 11, n = 2, l = 26),
      fp6(tf = 1, df = 2, dl = 15, n = 2, l = 26)))
    assert(wtd.toSeq != unw.map(_._3).toSeq)
  }

  test("ranking is repartition-stable (fixed-point sums)") {
    def run(d: org.apache.spark.sql.DataFrame) =
      Bm25.search(d, queries, k = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted.toSeq
    assert(run(docs) == run(docs.repartition(7)))
  }

  test("RBP eval: dyadic weights and gains match the hand-derived ranking") {
    // Query "the fox": q2's ranking over the 4-doc corpus is whatever
    // search (independently pinned above) returns; RBP re-derives the
    // expected numerator from that observed ranking plus hand-known
    // gains: gain(doc) = |{the, fox} ∩ doc terms| -> d1:1 d2:2 d3:1 d4:2.
    val gain = Map(1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 2L)
    val q = Seq((2L, "the fox")).toDF("query_id", "query_text")
    val ranked = Bm25.search(docs, q, k = 4).collect()
      .map(r => (r.getLong(1), r.getLong(2))) // (rk, doc_id)
    assert(ranked.length == 4)
    val expNum = ranked.map { case (rk, id) => gain(id) * (1L << (4 - rk)) }.sum
    val expGain = ranked.map { case (_, id) => gain(id) }.sum
    // Schema is the path-invariant hi/lo pair (r17 ADVICE #3): on the
    // in-grid Long path hi is 0 and lo carries the whole total.
    val row = Bm25.rbpEval(docs, q, k = 4, maxGain = 2).collect().head
    assert(row.getLong(0) == 1L)
    assert(row.getLong(1) == 0L, s"in-grid hi must be 0: $row")
    assert(row.getLong(2) == expNum, s"rbp_num_lo ${row.getLong(2)} want $expNum")
    assert(row.getLong(3) == expGain)
    assert(row.getDouble(4) == expNum.toDouble / (2L << 4))
    assert(row.getDouble(5) == expGain.toDouble / 8)
    // An unanswerable query contributes zeros but still counts.
    val q2 = Seq((2L, "the fox"), (9L, "zzz qqq")).toDF("query_id", "query_text")
    val row2 = Bm25.rbpEval(docs, q2, k = 4, maxGain = 2).collect().head
    assert(row2.getLong(0) == 2L && row2.getLong(2) == expNum &&
      row2.getDouble(4) == expNum.toDouble / (2 * (2L << 4)))
  }

  test("RBP gain saturates at maxGain - rbp_p50 cannot exceed 1") {
    // A query with 3 distinct terms against maxGain = 2: a doc matching
    // all 3 must count gain 2, not 3, or the declared normalizer lies.
    val corpus = Seq((1L, "the quick fox")).toDF("doc_id", "text")
    val q = Seq((1L, "the quick fox")).toDF("query_id", "query_text")
    val row = Bm25.rbpEval(corpus, q, k = 4, maxGain = 2).collect().head
    assert(row.getLong(3) == 2L, s"gain_total clamps: $row")
    assert(row.getDouble(4) <= 1.0, s"rbp_p50 bounded: $row")
  }

  test("past the BIGINT grid, RBP auto-switches to DECIMAL(38,0) accumulation, exactly") {
    // r14 ADVICE computed the worst case in BigInt and refused past
    // 2^63; r16 completes the pattern (t49d's): the over-grid cases now
    // RUN, accumulating the sums on the decimal grid. r17 (verdict #1):
    // the over-grid OUTPUT rides the 64-bit hash grid — the exact total
    // comes back as the divmod-2^62 BIGINT pair rbp_num_hi/rbp_num_lo
    // (total = hi·2^62 + lo), hand-exact here. (The guard's own 2^125
    // refusal — the bound where hi itself would leave a BIGINT — needs
    // n_q*maxGain >= 2^63 at k = 62, unreachable for any constructible
    // query table, so it stays a formal backstop.)
    def total(r: org.apache.spark.sql.Row): BigInt =
      (BigInt(r.getLong(1)) << 62) + r.getLong(2)
    val corpus = Seq((1L, "the quick fox")).toDF("doc_id", "text")
    val q = Seq((1L, "the quick fox")).toDF("query_id", "query_text")
    // maxGain=2 at k=62 (1*2*2^62 = 2^63 just over the Long grid): the
    // one ranked doc carries clamped gain 2 at rank 1 -> num = 2*2^61 =
    // 2^62 -> (hi, lo) = (1, 0), p50 = 2^62 / (2*2^62) = exactly 0.5.
    val row = Bm25.rbpEval(corpus, q, k = 62, maxGain = 2).collect().head
    assert(row.getLong(0) == 1L)
    assert(row.getLong(1) == 1L && row.getLong(2) == 0L, s"hi/lo: $row")
    assert(row.getDouble(4) == 0.5, s"rbp_p50: $row")
    // ADVICE's many-queries case (k=50, maxGain=3, 3000 queries): total
    // = 3000 * 3*2^49 = 9000*2^49 -> hi = 9000 >> 13 = 1, lo = 808*2^49;
    // p50 = 0.5 again - the decimal sum is exact, no float accumulation
    // across the 3000 per-query rows, and hi/lo reassemble it exactly.
    val manyQ = (0L until 3000L).map(i => (i, "the quick fox"))
      .toDF("query_id", "query_text")
    val row2 = Bm25.rbpEval(corpus, manyQ, k = 50, maxGain = 3).collect().head
    assert(row2.getLong(0) == 3000L)
    assert(row2.getLong(1) == 1L && row2.getLong(2) == 808L * (1L << 49),
      s"hi/lo: $row2")
    assert(total(row2) == BigInt(9000) * (BigInt(1) << 49), s"total: $row2")
    assert(row2.getDouble(4) == 0.5, s"rbp_p50: $row2")
    // r16 ADVICE #1's overflow window: maxGain=4 at k=62 puts a SINGLE
    // per-rank term gain*w = 4*2^61 = 2^63 past a Long — the leaves must
    // be decimal BEFORE the multiply (the knNumDen rule) or the plan
    // throws mid-flight under ANSI. total = 2^63 -> (hi, lo) = (2, 0).
    val q4 = Seq((1L, "the quick fox jumps")).toDF("query_id", "query_text")
    val c4 = Seq((1L, "the quick fox jumps")).toDF("doc_id", "text")
    val row3 = Bm25.rbpEval(c4, q4, k = 62, maxGain = 4).collect().head
    assert(row3.getLong(1) == 2L && row3.getLong(2) == 0L, s"hi/lo: $row3")
    assert(row3.getDouble(4) == 0.5, s"rbp_p50: $row3")
    // The Long-grid edge still takes the cheap Long accumulation path:
    // maxGain=2 at k=61 -> worst 2^62 fits a Long; the OUTPUT schema is
    // the same hi/lo pair (r17 ADVICE #3) — total 2^61 < 2^62 so
    // (hi, lo) = (0, 2^61), bit-divmodded without touching a double.
    val rowE = Bm25.rbpEval(corpus, q, k = 61, maxGain = 2).collect().head
    assert(rowE.getLong(1) == 0L && rowE.getLong(2) == (1L << 61),
      s"long-path hi/lo: $rowE")
  }

  test("PRF pulls in a document that shares no term with the original query") {
    // "apple" retrieves only doc 1; doc 1's terms include "tree";
    // doc 5 speaks ONLY of trees — invisible to pass 1, found by pass 2.
    val corpus = docs.unionByName(Seq((5L, "tree tree grove")).toDF("doc_id", "text"))
    val q = Seq((1L, "apple")).toDF("query_id", "query_text")
    val plain = Bm25.search(corpus, q, k = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(!plain.contains(5L), "sanity: pass 1 cannot see doc 5")
    val prf = Bm25.searchPrf(corpus, q, k = 5, fbDocs = 1, fbTerms = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(prf.contains(5L),
      s"expansion from doc 1 must retrieve the tree-only doc: $prf")
  }

  test("PRF with fbTerms=0 degenerates to plain search") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sorted.toSeq
    assert(rows(Bm25.searchPrf(docs, queries, k = 4, fbTerms = 0)) ==
      rows(Bm25.search(docs, queries, k = 4)))
  }

  test("PRF expansion excludes original query terms and is deterministic") {
    // feedback doc for "apple" is doc 1 ("the apple tree"): candidates
    // are {the, tree} — both df-checked, tf=1 each within the doc, so the
    // tie breaks (df ASC) toward the rarer "tree" at fbTerms=1; "apple"
    // itself must never expand.
    val q = Seq((1L, "apple")).toDF("query_id", "query_text")
    def run() = Bm25.searchPrf(docs, q, k = 4, fbDocs = 1, fbTerms = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(run() == run())
    // with "tree" expanded, doc 1 keeps rank 1 (apple + tree) and the
    // ranking includes no "the"-driven inflation of docs 2-4: their
    // scores stay 0 because neither "apple" nor "tree" occurs there.
    val got = Bm25.searchPrf(docs, q, k = 4, fbDocs = 1, fbTerms = 1)
      .collect()
    assert(got.head.getLong(2) == 1L, s"doc 1 must stay on top: ${got.toSeq}")
    assert(got.length == 1,
      s"only doc 1 scores — 'the' must NOT have been expanded: ${got.toSeq}")
  }
}
