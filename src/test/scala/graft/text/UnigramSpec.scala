package graft.text

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftnative.UnigramViterbi

import graft.SparkTestBase

class UnigramSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  /** All tilings of `word` from `vocab` (piece -> cost), scored
    * (cost, np, pieces) — the exponential reference the DP must match.
    */
  private def bruteBest(
      word: String, vocab: Map[String, Long]): Option[(Long, Int, List[String])] = {
    def tilings(s: String): Seq[List[String]] =
      if (s.isEmpty) Seq(Nil)
      else (1 to s.length).flatMap { l =>
        val p = s.substring(0, l)
        if (vocab.contains(p)) tilings(s.substring(l)).map(p :: _) else Nil
      }
    val all = tilings(word)
    if (all.isEmpty) None
    else {
      implicit val ord: Ordering[(Long, Int, List[String])] =
        Ordering.by { case (c, n, p) =>
          // UTF-8 byte order per piece = plain compare for ASCII fixtures
          (c, n, p.mkString(""))
        }
      Some(all.map(p => (p.map(vocab).sum, p.length, p)).min)
    }
  }

  test("Viterbi DP equals exponential brute force for every corpus word under the learned vocab") {
    val learned = Unigram.learn(docs)
      .collect().map(r => (r.getString(0), r.getLong(2))).toList
    val vocab = learned.toMap
    val seg = new UnigramViterbi(
      learned.map(_._1).toArray, learned.map(_._2).toArray)
    val words = Unigram.wordFreqs(docs).select("word").collect().map(_.getString(0))
    assert(words.nonEmpty)
    words.foreach { w =>
      val got = seg.segmentJava(w)
      val want = bruteBest(w, vocab).get._3.mkString(" ")
      assert(got == want, s"word '$w': DP '$got' != brute '$want'")
    }
  }

  test("tie-breaks: equal cost prefers fewer pieces, then the UTF-8-lex piece sequence") {
    val fewer = new UnigramViterbi(Array("ab", "a", "b"), Array(10L, 5L, 5L))
    assert(fewer.segmentJava("ab") == "ab") // 10 == 5+5, np 1 < 2
    val lex = new UnigramViterbi(Array("ab", "c", "a", "bc"), Array(5L, 5L, 5L, 5L))
    assert(lex.segmentJava("abc") == "a bc") // both np=2 cost=10; (a,bc) < (ab,c)
  }

  test("a word with an unseen character falls back to code points") {
    val seg = new UnigramViterbi(Array("a"), Array(1L))
    assert(seg.segmentJava("az") == "a z")
    assert(seg.segmentJava("") == "")
  }

  test("learn keeps every corpus character (coverage floor) and respects the vocab cap") {
    val out = Unigram.learn(docs, finalVocab = 16).collect()
    val pieces = out.map(_.getString(0)).toSet
    val chars = Unigram.wordFreqs(docs)
      .select(explode(split(col("word"), "")).as("c"))
      .filter(length(col("c")) > 0).distinct()
      .collect().map(_.getString(0)).toSet
    assert(chars.subsetOf(pieces), s"missing chars: ${chars.diff(pieces)}")
    assert(out.count(_.getString(0).length > 1) <= 16)
    // costs are the final normalization: monotone in count (higher count
    // never costs more) and strictly positive for non-total pieces
    val byCnt = out.map(r => (r.getLong(1), r.getLong(2)))
    byCnt.sliding(2).foreach {
      case Array((c1, k1), (c2, k2)) if c1 >= c2 => assert(k1 <= k2)
      case _ =>
    }
  }

  test("applyUnigram: null/empty docs yield ('', 0) and word order is preserved") {
    import spark.implicits._
    val d = Seq((1L, "ab ab ba"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val vocab = Seq(("ab", 1L), ("a", 5L), ("b", 5L))
    val r = Unigram.applyUnigram(d, vocab)
      .orderBy("doc_id").collect()
    assert(r(0).getLong(1) == 4L && r(0).getString(2) == "ab ab b a")
    assert(r(1).getLong(1) == 0L && r(1).getString(2) == "")
    assert(r(2).getLong(1) == 0L && r(2).getString(2) == "")
  }

  test("learn is repartition-stable") {
    val a = Unigram.learn(docs).collect().toSeq
    val b = Unigram.learn(docs.repartition(7)).collect().toSeq
    assert(a == b)
  }

  test("vocab artifacts are self-validating: a mutated corpus fails the fingerprint guard, the original round-trips") {
    import spark.implicits._
    // r14 verdict #2: the oracle catches a stale artifact (its SQL
    // re-derives the learn chain), but a production-style apply job had
    // no guard — readVocabArtifact must refuse a corpus that is not the
    // one the vocab was learned on.
    val corpus = (0L until 30L)
      .map(i => (i, s"ab${i % 5} ba${(i * 3) % 7} cc"))
      .toDF("doc_id", "text")
    val path = java.nio.file.Files
      .createTempDirectory("graft_vocab_guard_spec").toString
    Unigram.writeVocabArtifact(Unigram.learn(corpus), corpus, path)
    // same corpus, any partitioning: round-trips and applies
    val vocab = Unigram.collectVocab(
      Unigram.readVocabArtifact(spark, corpus.repartition(7), path))
    assert(vocab.nonEmpty)
    assert(Unigram.applyUnigram(corpus, vocab).count() == 30L)
    // one doc dropped / one doc added / one id rewritten / one text
    // mutated under a STABLE id (r15 ADVICE: the case the id-only hash
    // could not see): all stale
    for (mutated <- Seq(
        corpus.filter(col("doc_id") =!= 3L),
        corpus.unionByName(Seq((999L, "zz")).toDF("doc_id", "text")),
        corpus.withColumn("doc_id",
          when(col("doc_id") === 3L, 1003L).otherwise(col("doc_id"))),
        corpus.withColumn("text",
          when(col("doc_id") === 3L, lit("zz zz")).otherwise(col("text"))))) {
      val ex = intercept[IllegalArgumentException] {
        Unigram.readVocabArtifact(spark, mutated, path)
      }
      assert(ex.getMessage.contains("stale"), ex.getMessage)
    }
  }

  test("snapshot-guarded vocab store serves without a corpus scan and refuses a changed directory") {
    import spark.implicits._
    // The catalog-snapshot serving shape (r17, the KN-store pattern):
    // the guard fingerprints the corpus directory's file listing.
    val corpus = (0L until 30L)
      .map(i => (i, s"ab${i % 5} ba${(i * 3) % 7} cc"))
      .toDF("doc_id", "text")
    val base = java.nio.file.Files
      .createTempDirectory("graft_vocab_snap_spec").toString
    val corpusDir = s"$base/corpus"
    corpus.write.mode("overwrite").parquet(corpusDir)
    val corpusDf = spark.read.parquet(corpusDir)
    val path = s"$base/artifact"
    Unigram.writeVocabArtifactSnapshot(Unigram.learn(corpusDf), corpusDir, path)
    val vocab = Unigram.collectVocab(
      Unigram.readVocabArtifactSnapshot(spark, corpusDir, path))
    assert(vocab.nonEmpty)
    assert(Unigram.applyUnigram(corpusDf, vocab).count() == 30L)
    // any change to the corpus directory's file set -> loud
    corpus.limit(29).write.mode("overwrite").parquet(corpusDir)
    val ex = intercept[IllegalArgumentException] {
      Unigram.readVocabArtifactSnapshot(spark, corpusDir, path)
    }
    assert(ex.getMessage.contains("stale") &&
      ex.getMessage.contains("snapshot"), ex.getMessage)
  }

  test("requireRelaxBound fires loudly past the oracle's relaxation budget, is a no-op under it") {
    import spark.implicits._
    // A 17-char word needs up to 17 pieces; the 16-round Bellman-Ford
    // mirror would silently drop it from `fin` — the guard makes that
    // an error with a message instead (r13 ADVICE).
    val bad = Seq((1L, "short " + "x" * 17)).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      Unigram.requireRelaxBound(bad, 16)
    }
    assert(ex.getMessage.contains("relaxRounds"))
    val ok = Seq((1L, "alpha beta"), (2L, null)).toDF("doc_id", "text")
    assert(Unigram.requireRelaxBound(ok, 16).count() == 2)
  }

  test("coverageReportBySource: rolls up to the corpus gauge, isolates an " +
    "OOV-drifting source, keeps words-free sources") {
    import spark.implicits._
    val vocab = Seq(("a", 10L), ("b", 10L), ("ab", 15L))
    val batch = Seq(
      (1L, "clean", "ab ab a"),   // covered: ab=1 piece x2, a=1 piece
      (2L, "clean", "b ab"),
      (3L, "drift", "ab zq"),     // zq: chars outside vocab -> OOV
      (4L, "drift", "zq zq"),
      (5L, "empty", null.asInstanceOf[String])
    ).toDF("doc_id", "source", "text")
    val by = Unigram.coverageReportBySource(batch, vocab).collect()
    assert(by.map(_.getString(0)).toSeq == Seq("clean", "drift"),
      "null-text-only source has no non-empty doc -> no row; others sorted")
    val m = by.map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(6)))).toMap
    // clean: 2 docs, 5 words all covered, pieces ab|ab|a|b|ab = 5
    assert(m("clean") == ((2L, 5L, 5L, 0L, 5L)))
    // drift: 2 docs, 4 words, 1 covered (ab -> 1 piece), 3 OOV
    assert(m("drift") == ((2L, 4L, 1L, 3L, 1L)))
    assert(by.find(_.getString(0) == "drift").get.getDouble(5) == 0.75)
    // the per-source rows roll up EXACTLY to the corpus gauge
    val corpus = Unigram.coverageReport(batch, vocab).collect()(0)
    assert(by.map(_.getLong(1)).sum == corpus.getLong(0))  // n_docs
    assert(by.map(_.getLong(2)).sum == corpus.getLong(1))  // n_words
    assert(by.map(_.getLong(3)).sum == corpus.getLong(2))  // covered
    assert(by.map(_.getLong(4)).sum == corpus.getLong(3))  // oov
    assert(by.map(_.getLong(6)).sum == corpus.getLong(5))  // pieces
  }
}
