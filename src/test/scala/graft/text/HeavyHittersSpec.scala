package graft.text

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftnative.CmsSketch

import graft.SparkTestBase

class HeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus = Seq(
    1L -> "the cat sat on the mat and the cat ran",
    2L -> "the cat sat on a log while the dog ran",
    3L -> "a completely different sentence with unique words only").toDF("doc_id", "text")

  private def exactCounts = corpus
    .select(explode(TextFunctions.shingles(col("text"), 2)).as("gram"))
    .groupBy("gram").agg(count(lit(1)).as("freq"))

  test("count-min estimates never undercount (one-sided error)") {
    val grams = corpus.select(explode(TextFunctions.shingles(col("text"), 2)).as("gram"))
    // Deliberately tiny sketch (eps=0.5 -> 4 counters) to force collisions.
    val sketch = grams
      .agg(CmsSketch.cmsAgg(xxhash64(col("gram")), eps = 0.5, confidence = 0.9, seed = 7))
      .head.getAs[Array[Byte]](0)
    val bad = grams.groupBy("gram").agg(count(lit(1)).as("true_freq"))
      .withColumn("est", CmsSketch.estimate(sketch, xxhash64(col("gram"))))
      .filter(col("est") < col("true_freq"))
    assert(bad.count() == 0L)
  }

  test("heavy hitters equal the exact count even with a collision-heavy sketch") {
    for (eps <- Seq(1e-4, 0.5)) {
      val got = HeavyHitters.ngrams(corpus, n = 2, minCount = 2L, eps = eps)
        .as[(String, Long)].collect().toSet
      val want = exactCounts.filter(col("freq") >= 2)
        .as[(String, Long)].collect().toSet
      assert(got == want, s"eps=$eps")
      assert(want.contains("the cat" -> 3L))
    }
  }

  test("vocab ranks by (freq desc, token), ids contiguous, ties lexicographic") {
    val v = HeavyHitters.vocab(corpus, size = 5)
      .as[(Long, String, Long)].collect().toSeq
    assert(v.map(_._1) == Seq(0L, 1L, 2L, 3L, 4L))
    assert(v.head._2 == "the" && v.head._3 == 5L) // most frequent token
    // Non-increasing frequencies; lexicographic within equal counts.
    assert(v.sliding(2).forall { case Seq(a, b) =>
      a._3 > b._3 || (a._3 == b._3 && a._2 < b._2); case _ => true })
    // size above the vocabulary returns everything, still contiguous.
    val all = HeavyHitters.vocab(corpus, size = 10000).collect()
    assert(all.map(_.getLong(0)).toSeq == (0L until all.length))
  }

  test("the CMS prefilter cuts shuffle records vs the direct count on a Zipf corpus") {
    // 20k docs, two unique bigrams each + 3 hot ones corpus-wide: the
    // direct groupBy must shuffle every distinct gram (~40k records); the
    // prefiltered path shuffles only hot-gram partials (~3 per map task)
    // plus the one-row sketch. This pins the operator's actual lever —
    // shuffle VOLUME — which wall-clock on a local memory shuffle cannot.
    val docs = spark.range(20000).select(
      col("id").as("doc_id"),
      concat_ws(" ",
        concat(lit("u"), col("id") * 2), concat(lit("u"), col("id") * 2 + 1),
        lit("hot alpha hot beta")).as("text"))
    def shuffleRecords(f: => Unit): Long =
      graft.TestMetrics.shuffleWritten(spark)(f)._1
    val direct = shuffleRecords {
      docs.select(explode(TextFunctions.shingles(col("text"), 2)).as("gram"))
        .groupBy("gram").agg(count(lit(1)).as("freq"))
        .filter(col("freq") >= 20000).count()
    }
    val cms = shuffleRecords {
      HeavyHitters.ngrams(docs, n = 2, minCount = 20000L).count()
    }
    assert(direct > 20000L, s"direct path should shuffle the long tail, got $direct")
    assert(cms < direct / 50, s"CMS path must shuffle far fewer records: $cms vs $direct")
  }

  test("stripTopTokens removes exactly the top-k tokens, order preserved") {
    // Top-2 by (freq desc, token): "the" (5), "cat" (3).
    val got = HeavyHitters.stripTopTokens(corpus, k = 2)
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "sat on mat and ran")
    assert(got(2L) == "sat on a log while dog ran")
    assert(got(3L) == "a completely different sentence with unique words only")
    // k covering the whole vocabulary scrubs every doc to ''.
    val all = HeavyHitters.stripTopTokens(corpus, k = 10000)
      .as[(Long, String)].collect().toMap
    assert(all.values.toSet == Set(""))
  }

  test("tokenIds maps through the vocab in order, unk for OOV") {
    // vocab k=2 = {the: 0, cat: 1}; everything else -1, positions kept.
    val got = HeavyHitters.tokenIds(corpus, vocabSize = 2)
      .as[(Long, Seq[Long])].collect().toMap
    assert(got(1L) == Seq(0L, 1L, -1L, -1L, 0L, -1L, -1L, 0L, 1L, -1L))
    assert(got(3L).forall(_ == -1L)) // fully OOV doc
    assert(got(3L).length == 8)
  }

  test("minCount=1 returns every distinct gram; empty corpus returns nothing") {
    val all = HeavyHitters.ngrams(corpus, n = 2, minCount = 1L)
    assert(all.count() == exactCounts.count())
    val empty = corpus.filter(lit(false))
    assert(HeavyHitters.ngrams(empty, n = 2, minCount = 1L).count() == 0L)
  }
}
