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
