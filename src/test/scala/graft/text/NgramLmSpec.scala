package graft.text

import graft.SparkTestBase

class NgramLmSpec extends SparkTestBase {
  import spark.implicits._

  // The decimal(20,6) rounding the operator applies to each ln(integer).
  private def r6(x: Double): BigDecimal =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)

  test("hand-computed add-one bigram cross-entropy, exact to the decimal contract") {
    // train "a b a b c": c12 = {(a,b):2, (b,a):1, (b,c):1}; c1 = {a:2, b:2}; V=2
    val train = Seq((100L, "a b a b c")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b c"), // (a,b): ln3-ln4; (b,c): ln2-ln4
      (2L, "z z"),   // unseen bigram AND unseen prefix: ln1 - ln(0+2)
      (3L, "a"))     // too short: no bigrams
      .toDF("doc_id", "text")
    val got = NgramLm.crossEntropy(docs, train, maxCrossEntropy = 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) Double.NaN else r.getDouble(3),
          r.getBoolean(4))).toMap

    val ce1 = -((r6(math.log(3)) - r6(math.log(4))) +
      (r6(math.log(2)) - r6(math.log(4)))).toDouble / 2
    val ce2 = -(r6(math.log(1)) - r6(math.log(2))).toDouble / 1
    assert(got(1L) == ((2L, 0L, ce1, true)), s"got ${got(1L)} want ce=$ce1")
    assert(got(2L) == ((1L, 1L, ce2, false)))
    assert(got(3L)._1 == 0L && got(3L)._3.isNaN && !got(3L)._4)
  }

  test("a document the model has seen scores lower entropy than gibberish") {
    val train = (0L until 50L).map(i => (i, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "zx qv wk jj pq mm")).toDF("doc_id", "text")
    val ce = NgramLm.crossEntropy(docs, train, maxCrossEntropy = 100.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(ce(1L) < ce(2L), s"in-domain ${ce(1L)} should beat gibberish ${ce(2L)}")
  }

  test("cross-entropy is repartition-stable (decimal sums, no float accumulation)") {
    val docs = (0L until 200L)
      .map(i => (i, s"w${i % 7} w${(i * 3) % 7} w${(i * 5) % 7} w${i % 11}"))
      .toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      NgramLm.crossEntropy(d, d, maxCrossEntropy = 5.0)
        .collect().map(r => (r.getLong(0), r.getDouble(3))).sorted.toSeq
    assert(run(docs) == run(docs.repartition(13)))
  }
}
