package graft.queries

import graft.SparkTestBase

/** Pins e13's two faces: the registered session entry runs the six
  * one-pass legs (trainedLegs = false) — LSH, multiprobe, sample-IVF,
  * and the three exact-mirrorable compression indexes (SQ8, Hamming+
  * rerank, Matryoshka+rerank) — while the full nine-leg eval, including
  * the Lloyd-trained IVF and the composed IVF-PQ+refine index a
  * deployment would ship, stays the function's DEFAULT. This spec keeps
  * the trained legs from rotting now that the per-round bench no longer
  * executes them.
  */
class AnnRecallEvalSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("full eval carries the trained legs; the session face is its one-pass subset") {
    val full = TrainingData.annRecallEval(spark, dir).collect()
    graft.util.CacheScope.releaseAll()
    val cheap = TrainingData.annRecallEval(spark, dir, trainedLegs = false).collect()
    graft.util.CacheScope.releaseAll()
    val fullMethods = full.map(_.getString(0)).toSeq
    val cheapMethods = cheap.map(_.getString(0)).toSeq
    assert(fullMethods == Seq("1_lsh", "2_lsh_multiprobe", "3_ivf",
      "4_sq8", "5_hamming_refined", "6_matryoshka",
      "7_pq_flat", "8_ivf_trained", "9_ivfpq_refined"))
    assert(cheapMethods == fullMethods.take(6),
      "session face must be exactly the one-pass legs, in order")
    // Every leg reports a valid recall fraction over all 10 eval queries.
    full.foreach { r =>
      assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0,
        s"${r.getString(0)}: mean_recall out of range")
      assert(r.getLong(3) == 10L, s"${r.getString(0)}: n_queries")
    }
    // SQ8 is near-exact by construction (8-bit quantization of every
    // dimension, exact rerank-free scoring): its recall must dominate
    // the bucketed LSH leg on any corpus.
    val byMethod = full.map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(byMethod("4_sq8") >= byMethod("1_lsh"),
      s"sq8 must not lose to single-bucket LSH: $byMethod")
    // The shared one-pass legs are computed by the SAME code in both
    // faces — identical rows, not merely identical names.
    assert(cheap.map(_.toString).toSeq == full.take(6).map(_.toString).toSeq)
  }

  test("e13b: every declared ANN recall contract holds (r18 verdict #5)") {
    // The oracle gate asserts these at sf0.01/sf0.1; this pins the third
    // scale so a contract can't silently depend on corpus size.
    val rows = graft.SparkEntry.queries("e13b_ann_recall_contract")(spark, dir)
      .collect()
    graft.util.CacheScope.releaseAll()
    assert(rows.map(_.getString(0)).toSeq == Seq(
      "ivf_exhaustive_recall_is_1", "multiprobe_covers_lsh",
      "sq8_dominates_lsh", "sq8_recall_ge_0.80"))
    rows.foreach { r =>
      assert(r.getBoolean(3), s"contract violated: ${r.getString(0)}")
      assert(r.getLong(1) == 10L && r.getLong(2) == 5L)
    }
  }
}
