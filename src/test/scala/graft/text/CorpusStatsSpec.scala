package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class CorpusStatsSpec extends SparkTestBase {
  import spark.implicits._

  test("zipfFit recovers slope ~ -1 on a constructed Zipfian corpus") {
    // term r appears floor(600/r) times -> ln f = ln 600 - ln r (+floor)
    val docs = (1 to 50).map { r =>
      (r.toLong, Seq.fill(600 / r)(f"w$r%03d").mkString(" "))
    }.toDF("doc_id", "text")
    val fit = CorpusStats.zipfFit(docs, topN = 50).orderBy("rank").collect()
    assert(fit.length == 50)
    val slope = fit.head.getDouble(3)
    assert(slope > -1.15 && slope < -0.85, s"slope $slope not ~ -1")
    // slope/intercept are constants across rows; rank 1 is the top term
    assert(fit.forall(_.getDouble(3) == slope))
    assert(fit.head.getString(1) == "w001" && fit.head.getLong(2) == 600L)
    // ranks descend in frequency with the term tiebreak
    val freqs = fit.map(_.getLong(2)).toSeq
    assert(freqs == freqs.sortBy(-_))
  }

  test("zipfFit: topN bounds the output; ties at the cut break by term") {
    val docs = Seq((1L, "b b a a c c d")).toDF("doc_id", "text")
    val fit = CorpusStats.zipfFit(docs, topN = 2).orderBy("rank")
      .select("rank", "term", "freq").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    // a,b,c all have freq 2 -> term order decides; d (freq 1) never ranks
    assert(fit == Seq((1L, "a", 2L), (2L, "b", 2L)))
  }

  test("heapsCurve: one new term per doc gives a linear curve; totals add up") {
    val docs = (0L until 100L).map { i =>
      // doc i introduces term t<i> and repeats term t0 (never new after doc 0)
      (i, s"t$i t0 t0")
    }.toDF("doc_id", "text")
    val got = CorpusStats.heapsCurve(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.map(_._1) == (1L to 10L))
    assert(got.map(_._2).forall(_ == 10L), s"each decile adds 10 terms: $got")
    assert(got.map(_._3) == (1 to 10).map(_ * 10L))
  }

  test("heapsCurve: front-loaded vocabulary flattens after the first decile") {
    val docs = (0L until 50L).map { i =>
      (i, if (i == 0) (1 to 20).map(j => s"v$j").mkString(" ") else "v1 v2")
    }.toDF("doc_id", "text")
    val got = CorpusStats.heapsCurve(docs).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(got.head == ((20L, 20L)))
    assert(got.tail.forall(_._1 == 0L), s"no new terms after doc 0: $got")
    assert(got.map(_._2).distinct == Seq(20L))
  }

  test("sourceDivergence: a drifted source spikes; matching sources sit near zero") {
    // src0/src1 share one uniform vocabulary; src2 speaks a disjoint one
    val docs = (0L until 300L).map { i =>
      val src = s"src${i % 3}"
      val text =
        if (i % 3 == 2) (0 to 9).map(j => s"alien${(i + j) % 20}").mkString(" ")
        else (0 to 9).map(j => s"common${(i * 7 + j) % 20}").mkString(" ")
      (i, src, text)
    }.toDF("doc_id", "source", "text")
    val kl = CorpusStats.sourceDivergence(docs)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // Gibbs: KL >= 0 up to the 1e-6 decimal grid
    kl.values.foreach(v => assert(v >= -1e-4, s"negative KL: $kl"))
    assert(kl("src2") > kl("src0") + 0.1 && kl("src2") > kl("src1") + 0.1,
      s"drifted source must dominate: $kl")
    // one-third of the pool diverging costs the matching sources a bit of
    // KL too (the PAIR drifts from the pooled mixture) but far less
    assert(kl("src0") < 0.6 * kl("src2"), s"got $kl")
  }

  test("sourceDivergence is exactly repartition-stable (decimal sums)") {
    val docs = (0L until 200L).map(i =>
      (i, s"s${i % 4}", (0 to (i % 11).toInt).map(j => s"w${(i + j * 5) % 40}").mkString(" ")))
      .toDF("doc_id", "source", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      CorpusStats.sourceDivergence(d)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(run(docs) == run(docs.repartition(13)))
  }

  test("goodTuring: hand-computed N1/N2 grid; saturated vocab nulls c*") {
    // src A: "a a b c"  -> counts a:2 b:1 c:1 -> N=4 V=3 N1=2 N2=1
    // src B: "b d"      -> counts b:1 d:1     -> N=2 V=2 N1=2 N2=0
    // pooled: a:2 b:2 c:1 d:1 -> N=6 V=4 N1=2 N2=2
    val docs = Seq((1L, "A", "a a b c"), (2L, "B", "b d"))
      .toDF("doc_id", "source", "text")
    val got = CorpusStats.goodTuring(docs).collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getDouble(6), r.getDouble(7)))).toMap
    assert(got("A") == ((4L, 3L, 2L, 1L, 0.5, 2.0 / 3)))
    assert(got("B") == ((2L, 2L, 2L, 0L, 1.0, 1.0)))
    assert(got("__all") == ((6L, 4L, 2L, 2L, 2.0 / 6, 0.5)))
    // c* = 2*N2/N1
    val cs = CorpusStats.goodTuring(docs).collect()
      .map(r => r.getString(1) -> Option(r.get(8)).map(_.asInstanceOf[Double])).toMap
    assert(cs("A") == Some(1.0) && cs("B") == Some(0.0) && cs("__all") == Some(2.0))
    // saturated corpus: every type seen twice -> N1 = 0 -> unseen mass 0, c* NULL
    val sat = Seq((1L, "A", "x y x y")).toDF("doc_id", "source", "text")
    val satRows = CorpusStats.goodTuring(sat).collect()
    satRows.foreach { r =>
      assert(r.getLong(4) == 0L && r.getDouble(6) == 0.0 && r.isNullAt(8))
    }
  }

  test("goodTuring: pooled row is NOT a rollup of per-source levels") {
    // "q" appears once in EACH source: per-source singleton twice over, but a
    // GLOBAL doubleton - the pooled row must count it in N2, not N1.
    val docs = Seq((1L, "A", "q"), (2L, "B", "q")).toDF("doc_id", "source", "text")
    val got = CorpusStats.goodTuring(docs).collect()
      .map(r => r.getString(1) -> ((r.getLong(4), r.getLong(5)))).toMap
    assert(got("A") == ((1L, 0L)) && got("B") == ((1L, 0L)))
    assert(got("__all") == ((0L, 1L)), s"global doubleton: $got")
  }

  test("goodTuring: higher orders see tail a saturated unigram level cannot") {
    // every unigram appears 4 times (saturated) but the four permutations
    // make every trigram a singleton - live tail at order 3 only
    val docs = Seq("p q r s", "q p s r", "r s p q", "s r q p").zipWithIndex
      .map { case (t, i) => (i.toLong, "S", t) }.toDF("doc_id", "source", "text")
    val got = CorpusStats.goodTuring(docs, grams = Seq(1, 3)).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(6)).toMap
    assert(got((1L, "__all")) == 0.0, s"unigram level saturated: $got")
    assert(got((3L, "__all")) > 0.0, s"trigram tail must be live: $got")
    // docs shorter than the order contribute no n-grams (no empty terms)
    val short = Seq((1L, "A", "one two")).toDF("doc_id", "source", "text")
    assert(CorpusStats.goodTuring(short, grams = Seq(3)).collect()
      .forall(_.getLong(2) == 0L) ||
      CorpusStats.goodTuring(short, grams = Seq(3)).collect().isEmpty)
  }

  test("goodTuring is repartition-stable") {
    val docs = (0L until 120L).map(i =>
      (i, s"s${i % 3}", (0 to (i % 9).toInt).map(j => s"w${(i * 3 + j) % 50}").mkString(" ")))
      .toDF("doc_id", "source", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      CorpusStats.goodTuring(d, grams = Seq(1, 2)).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSeq
    assert(run(docs) == run(docs.repartition(11)))
  }

  test("both diagnostics are repartition-stable") {
    val docs = (0L until 200L).map(i =>
      (i, (0 to (i % 17).toInt).map(j => s"w${(i + j * 7) % 60}").mkString(" ")))
      .toDF("doc_id", "text")
    def zf(d: org.apache.spark.sql.DataFrame) =
      CorpusStats.zipfFit(d, topN = 30).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
        .sortBy(_._1).toSeq
    def hc(d: org.apache.spark.sql.DataFrame) =
      CorpusStats.heapsCurve(d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(zf(docs) == zf(docs.repartition(7)))
    assert(hc(docs) == hc(docs.repartition(7)))
  }
}
