package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class DedupEvalSpec extends SparkTestBase {

  private lazy val docs = {
    import spark.implicits._
    // 8 base docs + exact copies of two of them: exact copies MUST be
    // caught by every screen (identical shingles ⇒ identical signatures
    // ⇒ identical band keys).
    val base = (0 until 8).map(k =>
      (k.toLong, (0 until 12).map(j => s"w${(k * 5 + j * 3) % 17}").mkString(" ")))
    (base ++ Seq((100L, base(2)._2), (101L, base(5)._2)))
      .toDF("doc_id", "text")
  }

  test("exact duplicates are recalled by every screen and counts are consistent") {
    import spark.implicits._
    val dupEmbBase = (0 until 40).map { k =>
      val v = Array.tabulate(64)(j => (((k * 31 + j * 17) % 13) - 6).toFloat)
      (k.toLong, v)
    }.toDF("vec_id", "embedding")
    val dupEmb = dupEmbBase.unionByName(
      dupEmbBase.filter(col("vec_id") % 8 === 0)
        .select((-col("vec_id") - 1).as("vec_id"),
          transform(col("embedding"), x => x * lit(2.0f)).as("embedding")))
    val r = DedupEval.screenQuality(docs, dupEmb)
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3),
          Option(x.get(4)).map(_.asInstanceOf[Double]),
          Option(x.get(5)).map(_.asInstanceOf[Double]))).toMap
    assert(r.keySet == Set(
      "minhash_lsh_md5", "simhash_md5", "simhash64_md5",
      "sign_band", "sign_band_16"))
    r.values.foreach { case (t, c, h, rec, prec) =>
      assert(h <= t && h <= c, "hits bounded by truth and candidates")
      rec.foreach(v => assert(v >= 0.0 && v <= 1.0))
      prec.foreach(v => assert(v >= 0.0 && v <= 1.0))
    }
    // The two planted exact-copy text pairs are in truth AND recalled by
    // both text screens (identical inputs ⇒ identical keys in any
    // deterministic screen).
    val (tt, _, th, tRec, _) = r("minhash_lsh_md5")
    assert(tt >= 2 && th >= 2 && tRec.get > 0.0)
    val (_, _, sh2, _, _) = r("simhash_md5")
    assert(sh2 >= 2)
    val (_, c64, h64, _, p64) = r("simhash64_md5")
    assert(h64 >= 2) // exact copies share every block of the 64-bit key
    // the wider key is the PRECISION fix the 16-bit row argues for
    assert(c64 <= r("simhash_md5")._2, "64-bit candidates never exceed 16-bit")
    // Scaled copies have cosine exactly 1.0 and share every sign band:
    // the deployed screen recalls ALL of them.
    val (et, _, eh, eRec, _) = r("sign_band")
    assert(et >= 5 && eh == et && eRec.contains(1.0))
    // Scaled copies share every band at ANY width, so the 16-bit screen
    // recalls all of them too — with no MORE candidates than 8-bit
    // (agreement on a 16-bit band implies agreement on both its 8-bit
    // halves, so the 16-bit candidate set is a subset when uncapped and
    // stays <= under the same cap on this fixture).
    val (et16, ec16, eh16, eRec16, _) = r("sign_band_16")
    assert(et16 == et && eh16 == et16 && eRec16.contains(1.0))
    assert(ec16 <= r("sign_band")._2, "16-bit candidates never exceed 8-bit here")
  }

  test("simhashSweep: post-filter candidates are monotone in the budget and " +
    "exact copies are recalled at every budget") {
    val r = DedupEval.simhashSweep(docs)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r.keySet == Set("simhash64_h1", "simhash64_h3", "simhash64_h7"))
    // one truth for all rows
    assert(r.values.map(_._1).toSet.size == 1)
    // monotone: hamming <= h1 <= h2 pairs always survive the h2 blocking
    // (pigeonhole: fewer differing bits than blocks), so cand/hit sets
    // only grow with the budget
    val Seq(h1, h3, h7) =
      Seq("simhash64_h1", "simhash64_h3", "simhash64_h7").map(r)
    assert(h1._2 <= h3._2 && h3._2 <= h7._2, s"candidates monotone: $r")
    assert(h1._3 <= h3._3 && h3._3 <= h7._3, s"hits monotone: $r")
    // exact copies (hamming 0) are caught at EVERY budget
    assert(h1._3 >= 2, s"exact copies at h=1: $r")
    r.values.foreach { case (t, c, h) => assert(h <= t && h <= c) }
    // an indivisible budget fails loudly, not silently
    val ex = intercept[IllegalArgumentException] {
      DedupEval.simhashSweep(docs, hammingGrid = Seq(2)).collect()
    }
    assert(ex.getMessage.contains("not divisible"))
  }

  test("minhashGrid: the k=8 slice is a seed-prefix of the k=16 table and " +
    "exact copies are recalled at every configuration") {
    val r = DedupEval.minhashGrid(docs)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r.keySet == Set("minhash_k8_b2", "minhash_k8_b4", "minhash_k8_b8"))
    assert(r.values.map(_._1).toSet.size == 1, "one truth for all rows")
    // exact copies share every signature element at any k -> recalled
    // by every configuration
    r.values.foreach { case (t, c, h) =>
      assert(h >= 2, s"exact copies recalled: $r")
      assert(h <= t && h <= c)
    }
    // more bands at the same k -> shorter band keys -> candidates can
    // only grow (a b2 collision needs 4 agreeing elements, which
    // implies both its b4 halves collide)
    assert(r("minhash_k8_b2")._2 <= r("minhash_k8_b4")._2)
    assert(r("minhash_k8_b4")._2 <= r("minhash_k8_b8")._2)
    // invalid config (bands must divide k) fails loudly
    val ex = intercept[IllegalArgumentException] {
      DedupEval.minhashGrid(docs, configs = Seq((8, 3))).collect()
    }
    assert(ex.getMessage.contains("bands"))
  }

  test("signBandCapSweep: candidates are monotone in the cap and the " +
    "uncapped row recalls every scaled twin") {
    import spark.implicits._
    val base = (0 until 60).map { k =>
      val v = Array.tabulate(64)(j => (((k * 29 + j * 13) % 11) - 5).toFloat)
      (k.toLong, v)
    }.toDF("vec_id", "embedding")
    val emb = base.unionByName(
      base.filter(col("vec_id") % 6 === 0)
        .select((-col("vec_id") - 1).as("vec_id"),
          transform(col("embedding"), x => x * lit(3.0f)).as("embedding")))
    val r = DedupEval.signBandCapSweep(emb)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r.keySet == Set("sign_band_cap4", "sign_band_cap8",
      "sign_band_cap64", "sign_band_uncapped"))
    assert(r.values.map(_._1).toSet.size == 1, "one truth for all rows")
    // drop path: a larger cap excludes fewer buckets -> candidate
    // superset -> counts monotone in the cap, uncapped the ceiling
    val Seq(c4, c8, c64, cu) = Seq("sign_band_cap4", "sign_band_cap8",
      "sign_band_cap64", "sign_band_uncapped").map(r)
    assert(c4._2 <= c8._2 && c8._2 <= c64._2 && c64._2 <= cu._2,
      s"candidates monotone in cap: $r")
    assert(c4._3 <= c8._3 && c8._3 <= c64._3 && c64._3 <= cu._3,
      s"hits monotone in cap: $r")
    // scaled twins (cosine exactly 1.0) share every band -> the
    // uncapped screen recalls all of the truth
    assert(cu._3 == cu._1, s"uncapped recalls every twin: $r")
    r.values.foreach { case (t, c, h) => assert(h <= t && h <= c) }
  }

  test("the eval-size contract is ENFORCED: oversized input fails loudly, the md5 sample degrades deterministically") {
    import spark.implicits._
    val emb = (0 until 40).map { k =>
      (k.toLong, Array.tabulate(64)(j => (((k * 31 + j * 17) % 13) - 6).toFloat))
    }.toDF("vec_id", "embedding")
    // 10 docs > maxEvalRows = 4 and no sample opt-in: loud failure, not
    // a silent N² (r13 verdict #1 — the missing guard, now code).
    val ex = intercept[IllegalArgumentException] {
      DedupEval.screenQuality(docs, emb, maxEvalRows = 4L)
    }
    assert(ex.getMessage.contains("maxEvalRows"))
    // With the opt-in the harness degrades to the c1-pattern md5
    // per-million sample: deterministic (same rows every run, any
    // partitioning) and still a valid 5-screen report.
    val s1 = DedupEval.screenQuality(
      docs, emb, maxEvalRows = 4L, sampleOverMax = true).collect()
    val s2 = DedupEval.screenQuality(
      docs.repartition(7), emb.repartition(5),
      maxEvalRows = 4L, sampleOverMax = true).collect()
    assert(s1.map(_.toString).sorted.sameElements(s2.map(_.toString).sorted))
    assert(s1.length == 5)
  }

  test("the SAMPLE path is itself bounded: n > maxEvalRows·10⁶ fails loudly (r14 ADVICE — the keep-fraction floor regime)") {
    // At per-million granularity keep = max(1, maxEvalRows·10⁶ ⌊/⌋ n)
    // floors at 1 bucket once n > 10⁶·maxEvalRows, where the kept count
    // becomes the unbounded ~n/10⁶ — the guard must fire BEFORE any
    // quadratic stage, on the count alone (so this test is cheap: the
    // 10⁶+1-row input is only ever counted, never shingled).
    val big = spark.range(1000001L)
      .select(col("id").as("doc_id"), lit("a b c d e").as("text"))
    val emb = spark.range(2L).select(col("id").as("vec_id"),
      array((0 until 64).map(j => lit(j.toFloat)): _*).as("embedding"))
    val ex = intercept[IllegalArgumentException] {
      DedupEval.screenQuality(big, emb,
        maxEvalRows = 1L, sampleOverMax = true)
    }
    assert(ex.getMessage.contains("pre-thin"), ex.getMessage)
  }

  test("exact-Jaccard truth is threshold-complete (pairs above 0.5 share a shingle)") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c d e f"), (2L, "a b c d e g"), // high overlap
      (3L, "x y z q r s")).toDF("doc_id", "text")
    val t = DedupEval.exactJaccardTruth(d, 3, 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(t == Set((1L, 2L)))
  }
}
