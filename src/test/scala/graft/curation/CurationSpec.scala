package graft.curation

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class CurationSpec extends SparkTestBase {

  test("hashSample is deterministic, partition-independent, and ~proportional") {
    import spark.implicits._
    val ids = (0L until 2000L).toDF("id")
    val once = Curation.hashSample(ids, "id", 10, "salt").as[Long].collect().sorted.toSeq
    val again = Curation.hashSample(ids.repartition(7), "id", 10, "salt")
      .as[Long].collect().sorted.toSeq
    assert(once == again)
    // md5 buckets are uniform: 10% +- a generous band
    assert(once.size > 120 && once.size < 280, s"got ${once.size} of 2000")
    // a different salt decorrelates the sample
    val other = Curation.hashSample(ids, "id", 10, "other").as[Long].collect().toSet
    assert(other != once.toSet)
  }

  test("sampleRepresentativeness: pooled row sums the per-source levels and " +
    "the integer deviation is exact") {
    import spark.implicits._
    val docs = (0L until 900L).map(i => (i, s"s${i % 3}")).toDF("doc_id", "source")
    val rows = Curation.sampleRepresentativeness(docs, keepPct = 10, salt = "s1")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(rows.keySet == Set("__all", "s0", "s1", "s2"))
    val per = Seq("s0", "s1", "s2").map(rows)
    assert(per.map(_._1).sum == rows("__all")._1 &&
      per.map(_._2).sum == rows("__all")._2, "pooled = sum of levels")
    rows.foreach { case (src, (nc, ns, rate, excess)) =>
      assert(rate == ns.toDouble / nc, s"$src rate")
      assert(excess == 100L * ns - 10L * nc, s"$src exact integer deviation")
      // the md5 sampler is ~proportional on every source
      assert(rate > 0.04 && rate < 0.16, s"$src rate $rate far from nominal 0.10")
    }
    // the flagged set IS hashSample's (same bucket, same salt)
    val sampled = Curation.hashSample(docs, "doc_id", 10, "s1").count()
    assert(rows("__all")._2 == sampled)
  }

  test("mixtureSample honors 0% (drop) and 100% (keep-all) endpoints") {
    import spark.implicits._
    val df = (0L until 300L).map(i => (i, s"src${i % 3}")).toDF("id", "src")
    val out = Curation.mixtureSample(df, "src", "id",
      Map("src0" -> 0.0, "src1" -> 1.0, "src2" -> 0.5), "m")
    val bySrc = out.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(!bySrc.contains("src0"))
    assert(bySrc("src1") == 100L)
    assert(bySrc.getOrElse("src2", 0L) > 20L && bySrc("src2") < 80L)
    // sources missing from the rates map are dropped, not kept
    val unmapped = Curation.mixtureSample(df, "src", "id", Map("src1" -> 1.0), "m")
    assert(unmapped.select("src").distinct().as[String].collect().toSeq == Seq("src1"))
  }

  test("packSequences lays out each shard contiguously from offset 0") {
    import spark.implicits._
    val docs = Seq(
      // shard a: 100 + 30 + 90 tokens, seqLen 64
      (1L, "a", 100L), (2L, "a", 30L), (3L, "a", 90L),
      // shard b packs independently
      (10L, "b", 64L), (11L, "b", 1L))
      .toDF("id", "shard", "n")
    val out = Curation.packSequences(docs, "shard", "id", "n", seqLen = 64)
      .select("id", "start_tok", "first_seq", "tok_offset", "end_seq")
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 0L, 0L, 0L, 1L)))    // spans seqs 0..1
    assert(out(2L) == ((2L, 100L, 1L, 36L, 2L))) // starts mid-seq 1, ends in 2
    assert(out(3L) == ((3L, 130L, 2L, 2L, 3L)))
    assert(out(10L) == ((10L, 0L, 0L, 0L, 0L)))  // exactly one full seq
    assert(out(11L) == ((11L, 64L, 1L, 0L, 1L))) // next doc starts seq 1 cleanly
  }

  test("decontaminate flags exactly the docs sharing an n-gram with the eval set") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "one two three four five"),
      (3L, "x y alpha beta gamma z"), // shares the eval 3-gram mid-document
      (4L, "short doc"))              // too short to shingle at n=3
      .toDF("doc_id", "text")
    val eval = Seq((100L, "alpha beta gamma")).toDF("doc_id", "text")
    val out = Curation.decontaminate(corpus, eval, n = 3)
      .select("doc_id", "contaminated")
      .as[(Long, Boolean)].collect().toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> true, 4L -> false))
  }

  test("repetitionSignals matches hand-computed bigram stats") {
    import spark.implicits._
    // "a b a b c": bigrams = [a b, b a, a b, b c] -> 4 total, 3 distinct,
    // top count 2
    val df = Seq((1L, "a b a b c"), (2L, "w x y z")).toDF("doc_id", "text")
    val out = Curation.repetitionSignals(df)
      .select("doc_id", "n_grams", "n_distinct_grams", "top_gram_count",
        "dup_gram_frac", "top_gram_frac")
      .as[(Long, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 4L, 3L, 2L, 0.25, 0.5)))
    assert(out(2L) == ((2L, 3L, 3L, 1L, 0.0, 1.0 / 3.0)))
  }

  test("packedSequences slices cover each doc exactly, half-open per sequence") {
    import spark.implicits._
    // seqLen 10; shard A: docs of 4, 10, 9 tokens -> boundaries at 4, 14, 23.
    val docs = Seq(
      ("A", 1L, 4L), ("A", 2L, 10L), ("A", 3L, 9L),
      ("B", 7L, 25L), // spans three sequences on its own
      ("B", 8L, 0L)) // zero tokens: no slice
      .toDF("shard", "doc_id", "n")
    val out = Curation.packedSequences(docs, "shard", "doc_id", "n", seqLen = 10)
      .select("shard", "doc_id", "seq_id", "tok_start", "tok_end")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2, t._3)).toSeq
    assert(out == Seq(
      ("A", 1L, 0L, 0L, 4L),
      ("A", 2L, 0L, 4L, 10L), ("A", 2L, 1L, 0L, 4L),
      ("A", 3L, 1L, 4L, 10L), ("A", 3L, 2L, 0L, 3L),
      ("B", 7L, 0L, 0L, 10L), ("B", 7L, 1L, 0L, 10L), ("B", 7L, 2L, 0L, 5L)))
    // Every doc's slices sum back to its token count.
    val sums = out.groupBy(t => (t._1, t._2))
      .view.mapValues(_.map(s => s._5 - s._4).sum).toMap
    assert(sums == Map(("A", 1L) -> 4L, ("A", 2L) -> 10L, ("A", 3L) -> 9L, ("B", 7L) -> 25L))
  }

  test("decontaminate shuffle fallback matches the broadcast path") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "epsilon zeta eta theta"),
      (3L, "beta gamma delta iota"),
      (4L, "totally unrelated words here"))
      .toDF("doc_id", "text")
    val eval = Seq((100L, "beta gamma delta")).toDF("doc_id", "text")
    def run(bc: Boolean): Seq[(Long, Boolean)] =
      Curation.decontaminate(corpus, eval, n = 3, broadcastEval = bc)
        .select("doc_id", "contaminated").orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    val broadcastPath = run(true)
    assert(broadcastPath == Seq(1L -> true, 2L -> false, 3L -> true, 4L -> false))
    assert(run(false) == broadcastPath)
    // The bloom-prefilter path is result-identical by construction (no
    // false negatives + exact confirm join) — even at an absurd fpp,
    // where nearly everything survives the prefilter.
    for (fpp <- Seq(0.01, 0.5)) {
      val bloom = Curation.decontaminateBloom(corpus, eval, n = 3, fpp = fpp)
        .select("doc_id", "contaminated").orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSeq
      assert(bloom == broadcastPath, s"fpp=$fpp")
    }
  }

  test("decontaminateBloom: empty eval side contaminates nothing") {
    import spark.implicits._
    val corpus = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val eval = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = Curation.decontaminateBloom(corpus, eval, n = 3)
      .select("doc_id", "contaminated")
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    assert(out == Seq(1L -> false))
  }

  test("bloom sketch: members always hit, non-members mostly miss at the built fpp") {
    import spark.implicits._
    import org.apache.spark.sql.graftnative.BloomSketch
    val members = (0L until 1000L).toDF("h")
    val sketch = members
      .agg(BloomSketch.bloomAgg(col("h"), 1000L, 16384L).as("bf"))
      .head.getAs[Array[Byte]](0)
    // No false negatives — the property decontaminateBloom's correctness
    // rests on.
    assert(members.filter(BloomSketch.mightContain(sketch, col("h"))).count() == 1000L)
    // False positives bounded: 16384 bits for 1000 items ⇒ fpp ≈ 0.5%;
    // allow a generous 5% band.
    val fp = (100000L until 110000L).toDF("h")
      .filter(BloomSketch.mightContain(sketch, col("h"))).count()
    assert(fp < 500L, s"false-positive count $fp of 10000")
  }

  test("stratifiedSample takes exact quotas per group, deterministically") {
    import spark.implicits._
    val docs = (1L to 100L).map(i => (s"g${i % 3}", i)).toDF("grp", "doc_id")
    val out = Curation.stratifiedSample(docs, "grp", "doc_id", nPerGroup = 4, salt = "s")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // Exact quota per group, ranks 1..4, stable across reruns.
    assert(out.groupBy(_._1).view.mapValues(_.length).toMap ==
      Map("g0" -> 4, "g1" -> 4, "g2" -> 4))
    assert(out.groupBy(_._1).values.forall(_.map(_._3).sorted.toSeq == Seq(1L, 2L, 3L, 4L)))
    val rerun = Curation.stratifiedSample(docs.repartition(7), "grp", "doc_id", 4, "s")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.sorted.toSeq == rerun.sorted.toSeq)
    // A group smaller than the quota yields all its members.
    val small = Seq(("g9", 1L), ("g9", 2L)).toDF("grp", "doc_id")
    assert(Curation.stratifiedSample(small, "grp", "doc_id", 5, "s").count() == 2)
  }

  test("sampler audits: stratified deviation is identically zero; weighted deviation matches the brute-force draw") {
    import spark.implicits._
    // Stratified: the quota is exact by construction, so the audit's
    // deviation column is an implementation invariant — zero for full
    // groups AND for a group smaller than its quota.
    val docs = ((1L to 100L).map(i => (s"g${i % 3}", i)) ++ Seq(("g9", 990L)))
      .toDF("grp", "doc_id")
    val strat = Curation.stratifiedSampleAudit(docs, "grp", "doc_id",
      nPerGroup = 4, salt = "s").collect()
    assert(strat.length == 4)
    strat.foreach { r =>
      assert(r.getString(0) == "stratified")
      assert(r.getLong(6) == 0L, s"stratified deviation must be 0: $r")
      assert(r.getLong(3) == math.min(r.getLong(2), 4L), s"quota: $r")
    }
    // Weighted: recompute the per-source draw by brute force on the
    // same 1/10000 grid and check n_sample, expected_grid, deviation.
    val wrows = (1L to 200L).map(i => (s"s${i % 2}", i, (i % 10) / 10.0))
    val wdocs = wrows.toDF("src", "doc_id", "w")
    val got = Curation.weightedSampleAudit(
      wdocs, "doc_id", "w", "src", salt = "ws")
      .collect().map(r => r.getString(1) ->
        ((r.getLong(2), r.getLong(3), r.getLong(5), r.getLong(6)))).toMap
    val kept = Curation.weightedSample(wdocs, "doc_id", "w", "ws")
      .groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expGrid = wrows.map { case (s, _, w) =>
      s -> math.floor(w * 10000).toLong }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    for (s <- Seq("s0", "s1")) {
      val (n, ns, eg, dev) = got(s)
      assert(n == 100L)
      assert(ns == kept.getOrElse(s, 0L), s"$s n_sample")
      assert(eg == expGrid(s), s"$s expected_grid")
      assert(dev == 10000L * ns - eg, s"$s deviation")
    }
    // Mixture: per-source constant rates -> expected = n*thr exactly,
    // including the 0% (expected 0, n_sample must be 0) endpoint.
    val mdocs = (1L to 300L).map(i => (s"m${i % 3}", i)).toDF("src", "doc_id")
    val mrates = Map("m0" -> 0.0, "m1" -> 0.5, "m2" -> 1.0)
    val maud = Curation.mixtureSampleAudit(
      mdocs, "src", "doc_id", mrates, salt = "mx")
      .collect().map(r => r.getString(1) ->
        ((r.getLong(2), r.getLong(3), r.getLong(5), r.getLong(6)))).toMap
    val mkept = Curation.mixtureSample(mdocs, "src", "doc_id", mrates, "mx")
      .groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(maud("m0") == ((100L, 0L, 0L, 0L)), s"zero-rate source: ${maud("m0")}")
    assert(maud("m2") == ((100L, 100L, 1000000L, 0L)),
      s"keep-all source is deviation-free by construction: ${maud("m2")}")
    val (n1, ns1, eg1, dev1) = maud("m1")
    assert(n1 == 100L && eg1 == 500000L)
    assert(ns1 == mkept.getOrElse("m1", 0L) && dev1 == 10000L * ns1 - eg1)
  }

  test("tfidf top terms rank rare terms above common ones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat"),
      (2L, "the dog sat"),
      (3L, "the bird flew"))
      .toDF("doc_id", "text")
    val out = graft.text.TfIdf.topTerms(docs, k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2)).toSeq
    // Unique terms (df=1, score 3.0) outrank "sat" (df=2, 1.5) and "the"
    // (df=3, 1.0); ties among uniques break alphabetically.
    assert(out == Seq(
      (1L, 1L, "cat", 1L, 1L), (1L, 2L, "sat", 1L, 2L),
      (2L, 1L, "dog", 1L, 1L), (2L, 2L, "sat", 1L, 2L),
      (3L, 1L, "bird", 1L, 1L), (3L, 2L, "flew", 1L, 1L)))
  }

  test("mixtureSampleEpochs repeats whole epochs and keeps the fractional set coordinated") {
    import spark.implicits._
    val df = (0L until 400L).map(i => (i, s"src${i % 4}")).toDF("id", "src")
    val rates = Map("src0" -> 0.0, "src1" -> 1.0, "src2" -> 2.0, "src3" -> 2.5)
    val out = Curation.mixtureSampleEpochs(df, "src", "id", rates, "e")
      .select("id", "src", "epoch").as[(Long, String, Long)].collect().toSeq
    val bySrc = out.groupBy(_._2).view.mapValues(_.size).toMap
    assert(!bySrc.contains("src0"))
    assert(bySrc("src1") == 100) // exactly once, epoch 0
    assert(out.filter(_._2 == "src1").forall(_._3 == 0L))
    assert(bySrc("src2") == 200) // exactly twice, epochs 0 and 1
    assert(bySrc("src3") > 220 && bySrc("src3") < 280, s"src3: ${bySrc("src3")}")
    // per-id epochs are contiguous 0..reps-1
    val byId = out.groupBy(t => (t._1, t._2)).values
    assert(byId.forall(rows => rows.map(_._3).sorted == (0L until rows.size.toLong)))
    // rate 2.5's fractional third copy is EXACTLY rate 0.5's keep set
    val frac = Curation.mixtureSample(
      df.filter($"src" === "src3"), "src", "id", Map("src3" -> 0.5), "e")
      .select("id").as[Long].collect().toSet
    val third = out.filter(t => t._2 == "src3" && t._3 == 2L).map(_._1).toSet
    assert(third == frac)
  }

  test("deterministicShuffle orders reproducibly with contiguous shards") {
    import spark.implicits._
    val df = (0L until 1000L).toDF("id")
    val a = Curation.deterministicShuffle(df, "id", "s", 4)
      .select("id", "shuffle_key", "shard")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val b = Curation.deterministicShuffle(df.repartition(13), "id", "s", 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(a.sortBy(_._2).toSeq == b.sortBy(_._2).toSeq)
    // shards slice the key order contiguously: max key of shard i < min of i+1
    val byShard = a.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    assert(byShard.keySet == Set(0, 1, 2, 3))
    for (i <- 0 until 3)
      assert(byShard(i).max < byShard(i + 1).min)
    // ~uniform occupancy (md5 top bits are uniform)
    assert(byShard.values.forall(ks => ks.size > 150 && ks.size < 350))
  }

  test("contaminatedSpans reports the exact overlapping window positions, both paths") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b c d e f g h"), // eval 3-gram "c d e" at pos 2
      (2L, "x y z c d e x y"), // same 3-gram at pos 3
      (3L, "p q r s t u v w")) // clean
      .toDF("doc_id", "text")
    val eval = Seq("c d e q q q").toDF("text")
    for (bc <- Seq(true, false)) {
      val got = Curation.contaminatedSpans(corpus, eval, n = 3, broadcastEval = bc)
        .as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 2L), (2L, 3L)), s"broadcastEval=$bc")
    }
  }

  test("tokenBudgetTrim equals the single-window form and is repartition-stable") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = (0L until 400L).map(i => (i, s"src${i % 3}", 10L + i % 7))
      .toDF("id", "src", "n_toks")
    val got = Curation.tokenBudgetTrim(df, "src", "id", "n_toks", budget = 500L, salt = "b")
      .select("src", "id", "cum_tokens").as[(String, Long, Long)].collect().toSet
    // Naive single-window reference: one cumsum per source over the same order.
    val w = Window.partitionBy("src")
      .orderBy(md5(concat(lit("b"), col("id").cast("string"))))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = df.withColumn("cum_tokens", sum("n_toks").over(w))
      .filter(col("cum_tokens") <= 500L)
      .select("src", "id", "cum_tokens").as[(String, Long, Long)].collect().toSet
    assert(got == ref)
    assert(got.nonEmpty && got.size < 400)
    val again = Curation
      .tokenBudgetTrim(df.repartition(13), "src", "id", "n_toks", 500L, "b")
      .select("src", "id", "cum_tokens").as[(String, Long, Long)].collect().toSet
    assert(again == got)
    // Zero budget keeps nothing; huge budget keeps everything.
    assert(Curation.tokenBudgetTrim(df, "src", "id", "n_toks", 0L, "b").count() == 0L)
    assert(Curation.tokenBudgetTrim(df, "src", "id", "n_toks", 1L << 40, "b").count() == 400L)
  }

  test("packingStats: exact fills pay zero padding, partial tails are counted") {
    import spark.implicits._
    val df = Seq(
      ("a", 100L), ("a", 100L), // total 200 = 2 exact seqs of 100
      ("b", 150L), ("b", 60L)) // total 210 -> 3 seqs, 90 pad
      .toDF("shard", "nt")
    val got = Curation.packingStats(df, "shard", "nt", seqLen = 100)
      .select("shard", "n_docs", "total_tokens", "n_seqs", "pad_tokens", "pad_frac")
      .as[(String, Long, Long, Long, Long, Double)].collect()
      .map { case (sh, a, b, c, d, e) => sh -> ((a, b, c, d, e)) }.toMap
    assert(got("a") == (2L, 200L, 2L, 0L, 0.0))
    assert(got("b") == (2L, 210L, 3L, 90L, 0.3))
  }

  test("per-source token budgets: zero drops, absent drops, each source its own cap") {
    import spark.implicits._
    val df = (0L until 300L).map(i => (i, s"src${i % 3}", 10L)).toDF("id", "src", "nt")
    val out = Curation.tokenBudgetTrim(df, "src", "id", "nt",
      budgets = Map("src0" -> 0L, "src1" -> 200L), salt = "b")
    val bySrc = out.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(!bySrc.contains("src0")) // explicit zero budget
    assert(!bySrc.contains("src2")) // absent from the map
    assert(bySrc("src1") == 20L) // 200 tokens / 10 per doc
    // The kept set is the same deterministic prefix the flat form keeps.
    val flat = Curation.tokenBudgetTrim(
      df.filter(col("src") === "src1"), "src", "id", "nt", budget = 200L, salt = "b")
      .select("id").as[Long].collect().toSet
    assert(out.filter(col("src") === "src1").select("id").as[Long].collect().toSet == flat)
  }

  test("globalPositions equals the single-window row_number, contiguous 0..N-1") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = (0L until 3000L).toDF("id")
    val got = Curation.globalPositions(df, "id", "gp")
      .select("id", "pos").as[(Long, Long)].collect().toSet
    val ref = df
      .withColumn("pos",
        row_number().over(
          Window.orderBy(md5(concat(lit("gp"), col("id").cast("string"))))).cast("long") - 1)
      .select("id", "pos").as[(Long, Long)].collect().toSet
    assert(got == ref)
    assert(got.map(_._2) == (0L until 3000L).toSet) // contiguous, no gaps
    val again = Curation.globalPositions(df.repartition(17), "id", "gp")
      .select("id", "pos").as[(Long, Long)].collect().toSet
    assert(again == got)
  }

  test("qualityFloor drops below-quantile rows per source, not globally") {
    import spark.implicits._
    // src0 scores 0..99, src1 scores 1000..1099: a global p25 would keep all
    // of src1 and cut only src0; the per-source floor cuts ~25% of EACH.
    val df = (0 until 200).map { i =>
      val src = s"src${i % 2}"
      val score = (i / 2) + (if (i % 2 == 1) 1000 else 0)
      (i.toLong, src, score.toDouble)
    }.toDF("id", "src", "score")
    val out = Curation.qualityFloor(df, "src", "score", 0.25)
    val by = out.groupBy("src").agg(count(lit(1)), min("score"))
      .as[(String, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // percentile(0.25) over 0..99 = 24.75 -> keeps scores >= 24.75 (75 rows)
    assert(by("src0") == (75L, 25.0))
    assert(by("src1") == (75L, 1025.0))
    // Every kept row carries its source's threshold.
    val thr = out.select("src", "source_threshold").distinct()
      .as[(String, Double)].collect().toMap
    assert(thr == Map("src0" -> 24.75, "src1" -> 1024.75))
  }

  test("winsorize clips to each source's own band, keeps every row") {
    import spark.implicits._
    // src0: 0..99 (band [p10,p90] = [9.9, 89.1]); src1 shifted +1000.
    val df = (0 until 200).map { i =>
      (i.toLong, s"src${i % 2}", (i / 2 + (if (i % 2 == 1) 1000 else 0)).toDouble)
    }.toDF("id", "src", "v")
    val out = Curation.winsorize(df, "src", "v", lo = 0.10, hi = 0.90)
    assert(out.count() == 200L) // nothing dropped
    val src0 = out.filter(col("src") === "src0")
      .select("v", "v_clipped").as[(Double, Double)].collect().toMap
    assert(math.abs(src0(0.0) - 9.9) < 1e-9) // tails pinned to band
    assert(math.abs(src0(99.0) - 89.1) < 1e-9)
    assert(src0(50.0) == 50.0) // interior untouched
    val src1Min = out.filter(col("src") === "src1").agg(min("v_clipped"))
      .head.getDouble(0)
    assert(math.abs(src1Min - 1009.9) < 1e-9) // per-source band, not global
  }

  test("scrubPii masks emails, IPs, and phones without touching clean text") {
    import spark.implicits._
    val df = Seq(
      "reach me at jane.doe+spam@mail.example.org thanks",
      "server 192.168.0.1 and backup 10.0.255.254 up",
      "call 555-0199 or 555 0123 today",
      "v1.2.3 released, sum=123.45, no pii here")
      .toDF("t")
    val out = df.select(Curation.scrubPii(col("t")).as("s")).as[String].collect().toSeq
    assert(out == Seq(
      "reach me at <EMAIL> thanks",
      "server <IP> and backup <IP> up",
      "call <PHONE> or <PHONE> today",
      "v1.2.3 released, sum=123.45, no pii here"))
  }

  test("histogramQuantileFloor drops exactly the buckets whose cumulative mass is <= q") {
    import spark.implicits._
    // src A: 10 docs with values 0..9, width 2 -> buckets 0..4, 2 docs each.
    // q=1/5: bucket 0 has cum 2 <= 10*1/5=2 -> dropped; bucket 1 cum 4 > 2 kept.
    val docs = (0L until 10L).map(v => ("A", v, v)).toDF("src", "id", "v")
    val kept = Curation.histogramQuantileFloor(docs, "src", "v", 1L, 5L, 2L)
      .select("v").as[Long].collect().sorted.toSeq
    assert(kept == (2L until 10L).toSeq)
  }

  test("histogramQuantileFloor cuts per source independently and is repartition-stable") {
    import spark.implicits._
    val docs = ((0L until 10L).map(v => ("A", v, v)) ++
      (0L until 10L).map(v => ("B", v, v + 100L))).toDF("src", "id", "v")
    def run(df: org.apache.spark.sql.DataFrame) =
      Curation.histogramQuantileFloor(df, "src", "v", 1L, 5L, 2L)
        .select("src", "v").as[(String, Long)].collect().sorted.toSeq
    val out = run(docs)
    assert(out.filter(_._1 == "A").map(_._2) == (2L until 10L).toSeq)
    assert(out.filter(_._1 == "B").map(_._2) == (102L until 110L).toSeq)
    assert(run(docs.repartition(7)) == out)
  }

  test("histogramQuantileFloor endpoints: q=0 keeps everything, q=1 keeps the top bucket") {
    import spark.implicits._
    val docs = (0L until 10L).map(v => ("A", v, v)).toDF("src", "id", "v")
    assert(Curation.histogramQuantileFloor(docs, "src", "v", 0L, 1L, 2L).count() == 10L)
    // q=1: the rule keeps buckets with cum > n and even the last bucket
    // only reaches cum == n, so no cut row exists and the source drops
    // entirely — "floor at the 100th percentile" correctly keeps nothing.
    assert(Curation.histogramQuantileFloor(docs, "src", "v", 1L, 1L, 2L).count() == 0L)
  }

  test("temperatureMixture boosts small sources toward parity, clamps at 1, stays deterministic") {
    import spark.implicits._
    // 400 big + 25 small: proportional sampling would keep 16x more big
    // docs per small doc; sqrt shares boost the small source's RATE 4x.
    val docs = ((0L until 400L).map(i => (i, "big")) ++
      (1000L until 1025L).map(i => (i, "small"))).toDF("id", "src")
    val out = Curation.temperatureMixture(docs, "src", "id", targetDocs = 200L, salt = "t")
    val thr = out.select("src", "thr").distinct().as[(String, Long)].collect().toMap
    // shares: w_big=20, w_small=5 of 25 -> rate_big = (.8*200)/400 = .4,
    // rate_small = (.2*200)/25 = 1.6 -> clamped to 1.0
    assert(thr("big") == 4000L && thr("small") == 10000L, s"got $thr")
    assert(out.filter(col("src") === "small").count() == 25L) // rate 1: all kept
    val again = Curation.temperatureMixture(docs.repartition(7), "src", "id",
      targetDocs = 200L, salt = "t").select("id").as[Long].collect().sorted.toSeq
    assert(again == out.select("id").as[Long].collect().sorted.toSeq)
  }

  test("temperatureMixture derives rates from the data, sub-proportionally") {
    import spark.implicits._
    val base = (0L until 100L).map(i => (i, "a")) ++ (500L until 600L).map(i => (i, "b"))
    val grown = base ++ (2000L until 2300L).map(i => (i, "b"))
    def thrOf(rows: Seq[(Long, String)], src: String): Long =
      Curation.temperatureMixture(rows.toDF("id", "src"), "src", "id", 100L, "t")
        .filter(col("src") === src).select("thr").distinct().as[Long].collect().head
    // base: equal sources, rate .5 each. b grown 4x: sqrt shares make b's
    // rate fall 3x (not 4x — temperature flattens) and dilute a to 1/3.
    assert(thrOf(base, "a") == 5000L && thrOf(base, "b") == 5000L)
    assert(thrOf(grown, "a") == 3333L && thrOf(grown, "b") == 1666L)
  }

  test("dsirImportance: target-like docs score positive, alien docs negative") {
    import spark.implicits._
    // Target vocabulary {alpha beta gamma}; background adds an alien
    // vocabulary {zork quux blarg}. Counts must be large relative to the
    // add-one smoothing mass (B=64 pseudo-counts) or the ratio washes
    // out — 10 docs x 15 tokens per vocabulary gives ln-ratios ~+-0.5+
    // per token, far clear of zero.
    val docs = ((1L to 10L).map(i => (i, Seq.fill(5)("alpha beta gamma").mkString(" "))) ++
      (11L to 20L).map(i => (i, Seq.fill(5)("zork quux blarg").mkString(" "))) ++
      Seq((21L, null.asInstanceOf[String]))).toDF("doc_id", "text")
    val target = docs.filter(col("doc_id") <= 10)
    val rep = Curation.dsirImportance(docs, target, buckets = 64, salt = "t")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]), r.getBoolean(3)))).toMap
    assert(rep.size == 21, "one row per input doc")
    (1L to 10L).foreach { id =>
      assert(rep(id)._2.exists(_ > 0) && rep(id)._3, s"target-like $id: ${rep(id)}")
    }
    (11L to 20L).foreach { id =>
      assert(rep(id)._2.exists(_ < 0) && !rep(id)._3, s"alien $id: ${rep(id)}")
    }
    assert(rep(21L) == ((0L, None, false)), s"null text: ${rep(21L)}")
  }

  test("dsirImportance is repartition-stable (exact decimal accumulation)") {
    import spark.implicits._
    val docs = (0L until 200L).map(i =>
      (i, Seq.tabulate(20)(j => s"w${(i * 7 + j * 3) % 40}").mkString(" ")))
      .toDF("doc_id", "text")
    val target = docs.filter(col("doc_id") % 5 === 0)
    def run(d: org.apache.spark.sql.DataFrame) =
      Curation.dsirImportance(d, target, buckets = 32, salt = "s")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(run(docs) == run(docs.repartition(13)),
      "per-doc sums must not depend on partial-aggregation order")
  }

  test("waterfill: caps at availability, redistributes slack, respects weights") {
    import spark.implicits._
    // tiny source saturates at 100; its unused share flows to the others
    val src = Seq(("a", 100L, 1L), ("b", 100000L, 1L), ("c", 100000L, 2L))
      .toDF("source", "avail", "w")
    val budget = Seq(40000L).toDF("budget")
    val got = Curation.waterfillAllocation(src, budget, rounds = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(3), r.getBoolean(4))).toMap
    assert(got("a") == ((100L, true)), s"tiny source saturates: $got")
    // round 1: shares 10000/10000/20000 -> a grants 100; 9900 slack
    // redistributes 1:2 across b and c in round 2
    assert(got("b")._1 == 10000L + 9900 / 3, s"got $got")
    assert(got("c")._1 == 20000L + (9900 * 2) / 3, s"got $got")
    val total = got.values.map(_._1).sum
    assert(total <= 40000L, s"never over budget: $total")
    assert(40000L - total <= 3, "leftover is only integer-floor dust")
  }

  test("waterfill: allocation is monotone in rounds and never exceeds avail") {
    import spark.implicits._
    val src = (0 until 8).map(i => (s"s$i", (i + 1) * 50L, 1L))
      .toDF("source", "avail", "w")
    val budget = Seq(2000L).toDF("budget")
    def alloc(r: Int) = Curation.waterfillAllocation(src, budget, rounds = r)
      .collect().map(x => x.getString(0) -> x.getLong(3)).toMap
    val r1 = alloc(1); val r3 = alloc(3); val r6 = alloc(6)
    r1.foreach { case (s, a) => assert(a <= r3(s) && r3(s) <= r6(s)) }
    val avail = src.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    r6.foreach { case (s, a) => assert(a <= avail(s)) }
    // budget exceeds total availability (1800): everything saturates
    assert(r6.values.sum == 1800L, s"got $r6")
  }

  test("curriculumPhases: bucketed cumsum equals the single sorted prefix sum") {
    import spark.implicits._
    // scores spread across several floor(4*score) buckets; varying lengths
    val docs = (0L until 120L).map(i =>
      (i, 1.0 + (i * 37 % 100) / 25.0, 5L + i % 13)).toDF("doc_id", "score", "n_toks")
    val got = Curation.curriculumPhases(docs, "score", "n_toks")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    // reference: plain Scala sort by (score, id) + running sum + thirds
    val sorted = docs.collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .sortBy(t => (t._2, t._1))
    val total = sorted.map(_._3).sum
    var cum = 0L
    val expect = sorted.map { case (id, sc, n) =>
      val before = cum; cum += n
      val phase = 1L + (if (before * 3 >= total) 1L else 0L) +
        (if (before * 3 >= total * 2) 1L else 0L)
      (id, sc, n, cum, phase)
    }.sortBy(_._1).toSeq
    assert(got == expect)
  }

  test("curriculumPhases: token budgets per phase are balanced within one max-doc") {
    import spark.implicits._
    val docs = (0L until 300L).map(i =>
      (i, (i * 13 % 50) / 10.0, 1L + i % 20)).toDF("doc_id", "score", "n_toks")
    val byPhase = Curation.curriculumPhases(docs, "score", "n_toks")
      .groupBy("phase").agg(sum("n_toks").as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = byPhase.values.sum
    val maxDoc = 20L
    assert(byPhase.keySet == Set(1L, 2L, 3L))
    byPhase.foreach { case (p, t) =>
      assert(math.abs(t - total / 3.0) <= maxDoc,
        s"phase $p holds $t of $total tokens (want ~${total / 3})")
    }
  }

  test("curriculumPhases: repartition-stable; phases=1 keeps everything in phase 1") {
    import spark.implicits._
    val docs = (0L until 80L).map(i =>
      (i, (i % 7).toDouble, 3L + i % 5)).toDF("doc_id", "score", "n_toks")
    def run(d: org.apache.spark.sql.DataFrame) =
      Curation.curriculumPhases(d, "score", "n_toks")
        .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    assert(run(docs) == run(docs.repartition(11)))
    val single = Curation.curriculumPhases(docs, "score", "n_toks", phases = 1)
      .select("phase").distinct().as[Long].collect().toSeq
    assert(single == Seq(1L))
  }

  test("madOutliers: hand-computed median/MAD, only the spike flagged") {
    import spark.implicits._
    // src a: values 10,10,10,10,1000 -> med 10, adevs (0,0,0,0,990),
    // MAD 0 -> any deviation > 0 is an outlier (the degenerate-MAD
    // contract: a constant source flags EVERY deviant row).
    // src b: 1..5 -> med 3, adevs (2,1,0,1,2), MAD 1 -> |x-3| > 3 never
    // fires (max adev 2) -> no outliers.
    val df = (Seq.fill(4)(10L) :+ 1000L).zipWithIndex.map { case (v, i) => ("a", i.toLong, v) }
      .++((1L to 5L).zipWithIndex.map { case (v, i) => ("b", 10L + i, v) })
      .toDF("source", "id", "v")
    val got = Curation.madOutliers(df, "source", "v")
      .select("id", "is_outlier")
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    assert(got(4L))                       // the 1000 spike
    assert((0L to 3L).forall(!got(_)))    // constant rows: adev 0, not > 0
    assert((10L to 14L).forall(!got(_)))  // src b: nothing beyond 3*MAD
    graft.util.CacheScope.releaseAll()
  }
}
