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

  test("hand-computed Kneser-Ney: num/den rationals exact to the decimal contract") {
    // train "a b a b c": big = {(a,b):2, (b,a):1, (b,c):1}
    //   uni:  a -> (c1=2, fert=1), b -> (c1=2, fert=2)
    //   cont: a -> 1, b -> 1, c -> 1;   T = 3
    val train = Seq((100L, "a b a b c")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b c"), // (a,b): num=max(8-3,0)*3+3*1*1=18, den=4*2*3=24
                     // (b,c): num=max(4-3,0)*3+3*2*1=9,  den=24
      (2L, "z z"),   // unseen prefix, cont(z)=0: num=1, den=4*3=12
      (3L, "c a"),   // unseen prefix c, cont(a)=1: num=4, den=12
      (4L, "a z"))   // SEEN prefix, unseen continuation: the floor num=1, den=24
      .toDF("doc_id", "text")
    val got = NgramLm.knCrossEntropy(docs, train, maxCrossEntropy = 1.0)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) Double.NaN else r.getDouble(4), r.getBoolean(5))))
      .toMap

    def ce(pairs: (Int, Int)*): Double =
      -pairs.map { case (n, d) => r6(math.log(n)) - r6(math.log(d)) }
        .sum.toDouble / pairs.size
    // CE(doc1) = [ln(24/18) + ln(24/9)]/2 ~ 0.634 <= 1.0 -> keep
    assert(got(1L) == ((2L, 0L, 0L, ce((18, 24), (9, 24)), true)), s"got ${got(1L)}")
    assert(got(2L) == ((1L, 1L, 1L, ce((1, 12)), false)))
    assert(got(3L) == ((1L, 1L, 1L, ce((4, 12)), false)))
    assert(got(4L) == ((1L, 1L, 0L, ce((1, 24)), false)))
  }

  test("Kneser-Ney probabilities sum to 1 over the continuation vocab (no floor hit)") {
    // For seen prefix v: sum_w P(w|v) = 1 exactly in rationals; through
    // exp(-CE) on the decimal grid the sum lands within 1e-4 of 1.
    val train = Seq((100L, "a b a b c")).toDF("doc_id", "text")
    val probe = Seq((1L, "a a"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val p = NgramLm.knCrossEntropy(probe, train, maxCrossEntropy = 100.0)
      .collect().map(r => math.exp(-r.getDouble(4))).sum
    assert(math.abs(p - 1.0) < 1e-4, s"sum_w P(w|a) = $p")
  }

  test("KN flags token-order scrambling on a corpus with sequential structure") {
    // The property the soup-fixture gate face can't show (its bigram
    // space is saturated both ways — measured +0.04 nats, recorded in
    // the t49 comment): on structured text, reversal breaks bigrams.
    val train = (0L until 50L)
      .map(i => (i, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "dog lazy the over jumps fox brown quick the")).toDF("doc_id", "text")
    val ce = NgramLm.knCrossEntropy(docs, train, maxCrossEntropy = 100.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(ce(2L) > ce(1L) + 1.0,
      s"reversed ${ce(2L)} should far exceed in-order ${ce(1L)}")
  }

  test("KN cross-entropy is repartition-stable") {
    val docs = (0L until 200L)
      .map(i => (i, s"w${i % 7} w${(i * 3) % 7} w${(i * 5) % 7} w${i % 11}"))
      .toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      NgramLm.knCrossEntropy(d, d, maxCrossEntropy = 5.0)
        .collect().map(r => (r.getLong(0), r.getDouble(4))).sorted.toSeq
    assert(run(docs) == run(docs.repartition(13)))
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

  test("screenCompare: both screens separate a planted-OOV cohort; pooled CE " +
    "matches the per-doc contract") {
    import org.apache.spark.sql.functions.{col, lit, when}
    val natural = (0L until 40L)
      .map(i => (i, s"w${i % 5} w${(i * 3) % 5} w${(i * 7) % 5} w${i % 5}"))
    val planted = (0L until 4L).map(i => (-i - 1, s"zq$i xk$i vv$i uu$i"))
    val docs = (natural ++ planted).toDF("doc_id", "text")
    val train = natural.toDF("doc_id", "text")
    def compare(aCe: Double, kCe: Double) = NgramLm.screenCompare(
      docs, train,
      cohort = when(col("doc_id") < 0, lit("planted")).otherwise(lit("natural")),
      addOneMaxCe = aCe, knMaxCe = kCe)
      .collect()
    val probe = compare(99.0, 99.0)
    assert(probe.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("addone", "natural"), ("addone", "planted"),
        ("kn", "natural"), ("kn", "planted")))
    val ce = probe.map(r => (r.getString(0), r.getString(1)) -> r.getDouble(7)).toMap
    assert(ce(("addone", "planted")) > ce(("addone", "natural")))
    assert(ce(("kn", "planted")) > ce(("kn", "natural")))
    // band each screen at its measured cohort midpoint: every fully-OOV
    // planted doc lands on the unseen floor (identical per-doc CE), so
    // the midpoint rejects all 4 and keeps the natural cohort's pooled
    // mass on the keep side
    val rows = compare(
      (ce(("addone", "natural")) + ce(("addone", "planted"))) / 2,
      (ce(("kn", "natural")) + ce(("kn", "planted"))) / 2)
    rows.filter(_.getString(1) == "planted").foreach { r =>
      assert(r.getLong(4) == 4L, s"planted rejects: $r")
      assert(r.getLong(5) == r.getLong(6), s"all planted bigrams unseen: $r")
    }
    // pooled CE == -sum(per-doc slp)/sum(n_bigrams): recompute from the
    // per-doc faces on the natural cohort (weighted pooling, NOT a mean
    // of per-doc CEs)
    val perDoc = NgramLm.crossEntropy(docs, train, maxCrossEntropy = 2.5)
      .filter(col("doc_id") >= 0).collect()
    val pooled = perDoc.map(r => r.getDouble(3) * r.getLong(1)).sum /
      perDoc.map(_.getLong(1)).sum
    assert(math.abs(ce(("addone", "natural")) - pooled) < 1e-9)
  }

  test("hand-computed trigram Kneser-Ney: three backoff tiers exact to the decimal contract") {
    // train "a b a b c": tri = {(a,b,a):1, (b,a,b):1, (a,b,c):1}
    //   pre: (a,b)->(c2=2,f3=2), (b,a)->(1,1)
    //   mid2: (b,a):1, (a,b):1, (b,c):1; mid1: b->(nvdd=2,f2=2), a->(1,1)
    //   bigram types: cont(a)=cont(b)=cont(c)=1, T=3
    val train = Seq((100L, "a b a b c")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b c"), // seen prefix: num=4*1*2*3 + 3*2*(3+6)=78, den=16*2*2*3=192
      (2L, "z z z"), // unseen middle: cont(z)=0 -> floor num=1, den=4*3=12
      (3L, "c a b"), // unseen prefix, seen middle a: num=3+3=6, den=4*1*3=12
      (4L, "a b"),   // too short: no trigrams
      (5L, "a b z")) // seen prefix, unseen continuation+cont: floor 1/192
      .toDF("doc_id", "text")
    val got = NgramLm.kn3CrossEntropy(docs, train, maxCrossEntropy = 1.0)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) Double.NaN else r.getDouble(5), r.getBoolean(6))))
      .toMap
    def ce(pairs: (Int, Int)*): Double =
      -pairs.map { case (n, d) => r6(math.log(n)) - r6(math.log(d)) }
        .sum.toDouble / pairs.size
    assert(got(1L) == ((1L, 0L, 0L, 0L, ce((78, 192)), true)), s"got ${got(1L)}")
    assert(got(2L) == ((1L, 1L, 1L, 1L, ce((1, 12)), false)))
    // CE = ln2 ~ 0.693 <= 1.0 -> keep (the backoff estimate is good here)
    assert(got(3L) == ((1L, 1L, 1L, 0L, ce((6, 12)), true)))
    assert(got(4L)._1 == 0L && got(4L)._5.isNaN && !got(4L)._6)
    assert(got(5L) == ((1L, 1L, 0L, 0L, ce((1, 192)), false)))
  }

  test("trigram KN probabilities sum to 1 over the continuation vocab for a seen context") {
    // Rationals: P(a|ab)=78/192, P(b|ab)=36/192, P(c|ab)=78/192 -> sum 1.
    val train = Seq((100L, "a b a b c")).toDF("doc_id", "text")
    val probe = Seq((1L, "a b a"), (2L, "a b b"), (3L, "a b c"))
      .toDF("doc_id", "text")
    val p = NgramLm.kn3CrossEntropy(probe, train, maxCrossEntropy = 100.0)
      .collect().map(r => math.exp(-r.getDouble(5))).sum
    assert(math.abs(p - 1.0) < 1e-4, s"sum_w P(w|ab) = $p")
  }

  test("trigram over-grid models auto-select the DECIMAL(38,0) path and score exactly") {
    // r15 verdict #1: past the Long grid the engine used to refuse with
    // a mitigation that existed only in the error message — now it
    // switches the num/den leaves to DECIMAL(38,0) and scores. The
    // KenLM-scale counts here make 16*c2*nvdd*T ~ 2^68.
    val huge = NgramLm.Kn3Model(
      tri = Seq(("a", "b", "c", 1L << 58)).toDF("w1", "w2", "w3", "c3"),
      pre = Seq(("a", "b", 1L << 58, 1L)).toDF("w1", "w2", "c2", "f3"),
      mid2 = Seq(("b", "c", 1L)).toDF("w2", "w3", "n3w"),
      mid1 = Seq(("b", 1L, 1L)).toDF("w2", "nvdd", "f2"),
      cont = Seq(("c", 1L)).toDF("w3", "cont"),
      tt = Seq(Tuple1(100L)).toDF("t"))
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    // num = 400*(4*2^58-3) + 3*(100+3) = 461168601842738789509,
    // den = 16*2^58*100   = 461168601842738790400: both ln values land
    // on the same decimal(20,6) point -> CE exactly 0, no ANSI overflow.
    val r = NgramLm.kn3Score(docs, huge, maxCrossEntropy = 1.0).collect()
    assert(r.length == 1 && r.head.getDouble(5) == 0.0 &&
      r.head.getBoolean(6), r.mkString(","))

    // Differential: a model pushed over the Long grid by a row the docs
    // never touch must score IDENTICALLY to its in-grid twin — the two
    // paths share one formula.
    val train = (0L until 40L)
      .map(i => (i, s"w${i % 5} w${(i * 3) % 5} w${(i * 7) % 5} w${(i * 2) % 5}"))
      .toDF("doc_id", "text")
    val probe = Seq((1L, "w0 w1 w2 w3"), (2L, "w4 w4 zz")).toDF("doc_id", "text")
    val base = NgramLm.kn3Model(train)
    val direct = NgramLm.kn3Score(probe, base, 4.0)
      .collect().map(_.toString).sorted.toSeq
    val over = base.copy(pre = base.pre.unionByName(
      Seq(("zzq", "zzq", 1L << 60, 1L)).toDF("w1", "w2", "c2", "f3")))
    val dec = NgramLm.kn3Score(probe, over, 4.0)
      .collect().map(_.toString).sorted.toSeq
    assert(dec == direct)
  }

  test("bigram over-grid models auto-select DECIMAL(38,0); past 10^38 the refusal is loud") {
    // r14 verdict #1 established the grid as a model property; r15
    // verdict #1 completes it: past 2^63 the engine switches to the
    // decimal grid instead of refusing (c1 = 2^61, T = 100 ->
    // 4*c1*T ~ 2^69 — over-Long, well inside 38 digits).
    val huge = NgramLm.KnModel(
      big = Seq(("a", "b", 1L << 61)).toDF("w1", "w2", "c12"),
      uni = Seq(("a", 1L << 61, 1L)).toDF("w1", "c1", "fert"),
      cont = Seq(("b", 1L)).toDF("w2", "cont"),
      tt = Seq(Tuple1(100L)).toDF("t"))
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    // num = (4*2^61-3)*100 + 3 = 922337203685477580503,
    // den = 4*2^61*100     = 922337203685477580800 -> CE exactly 0.
    val r = NgramLm.knScore(docs, huge, maxCrossEntropy = 1.0).collect()
    assert(r.length == 1 && r.head.getDouble(4) == 0.0 &&
      r.head.getBoolean(5), r.mkString(","))

    // Differential vs the in-grid twin (huge row never joined).
    val train = (0L until 40L)
      .map(i => (i, s"w${i % 5} w${(i * 3) % 5} w${(i * 7) % 5}"))
      .toDF("doc_id", "text")
    val probe = Seq((1L, "w0 w1 w2"), (2L, "w4 zz")).toDF("doc_id", "text")
    val base = NgramLm.knModel(train)
    val direct = NgramLm.knScore(probe, base, 4.0)
      .collect().map(_.toString).sorted.toSeq
    val over = base.copy(uni = base.uni.unionByName(
      Seq(("zzhuge", 1L << 61, 1L)).toDF("w1", "c1", "fert")))
    val dec = NgramLm.knScore(probe, over, 4.0)
      .collect().map(_.toString).sorted.toSeq
    assert(dec == direct)

    // The boundary itself still takes the cheap Long path: num bound =
    // 4*c1*T + 3*fert*cont = 2^63-4 + 3 <= Long.MaxValue.
    val atEdge = NgramLm.KnModel(
      big = Seq(("a", "b", (Long.MaxValue - 3L) / 4L)).toDF("w1", "w2", "c12"),
      uni = Seq(("a", (Long.MaxValue - 3L) / 4L, 1L)).toDF("w1", "c1", "fert"),
      cont = Seq(("b", 1L)).toDF("w2", "cont"),
      tt = Seq(Tuple1(1L)).toDF("t"))
    NgramLm.knScore(docs, atEdge, maxCrossEntropy = 1.0).collect()

    // Past even DECIMAL(38,0) (4*c1*T with two near-2^63 factors ->
    // 3.24e38 >= 10^38): loud refusal naming the shard/rescale way out.
    val astronomical = NgramLm.KnModel(
      big = Seq(("a", "b", 1L)).toDF("w1", "w2", "c12"),
      uni = Seq(("a", 9000000000000000000L, 1L)).toDF("w1", "c1", "fert"),
      cont = Seq(("b", 1L)).toDF("w2", "cont"),
      tt = Seq(Tuple1(9000000000000000000L)).toDF("t"))
    val ex = intercept[IllegalArgumentException] {
      NgramLm.knScore(docs, astronomical, maxCrossEntropy = 1.0)
    }
    assert(ex.getMessage.contains("DECIMAL(38,0)"), ex.getMessage)
  }

  test("KN model store round-trips bit-for-bit and refuses a stale train corpus") {
    import org.apache.spark.sql.functions.col
    val train = (0L until 40L)
      .map(i => (i, s"w${i % 5} w${(i * 3) % 5} w${(i * 7) % 5}"))
      .toDF("doc_id", "text")
    val docs = Seq((1L, "w0 w1 w2"), (2L, "zz qq")).toDF("doc_id", "text")
    val direct = NgramLm.knScore(docs, NgramLm.knModel(train), 4.0)
      .collect().map(_.toString).sorted.toSeq
    val p = java.nio.file.Files
      .createTempDirectory("graft_kn_store_spec").toString
    NgramLm.writeKnModel(NgramLm.knModel(train), train, p)
    val served = NgramLm.knScore(docs,
        NgramLm.readKnModel(spark, train.repartition(7), p), 4.0)
      .collect().map(_.toString).sorted.toSeq
    assert(served == direct)
    val ex = intercept[IllegalArgumentException] {
      NgramLm.readKnModel(spark, train.filter(col("doc_id") =!= 3L), p)
    }
    assert(ex.getMessage.contains("stale"), ex.getMessage)
    // text mutated under stable ids (r15 ADVICE): also stale
    val ex2 = intercept[IllegalArgumentException] {
      NgramLm.readKnModel(spark, train.withColumn("text",
        org.apache.spark.sql.functions.upper(col("text"))), p)
    }
    assert(ex2.getMessage.contains("stale"), ex2.getMessage)
  }

  test("trigram KN model store round-trips bit-for-bit and refuses a stale train corpus") {
    import org.apache.spark.sql.functions.col
    // writeKnModel's order-3 sibling (r17): six tables + fingerprint.
    val train = (0L until 40L)
      .map(i => (i, s"w${i % 5} w${(i * 3) % 5} w${(i * 7) % 5} w${i % 4}"))
      .toDF("doc_id", "text")
    val docs = Seq((1L, "w0 w1 w2 w3"), (2L, "zz qq yy")).toDF("doc_id", "text")
    val direct = NgramLm.kn3Score(docs, NgramLm.kn3Model(train), 6.0)
      .collect().map(_.toString).sorted.toSeq
    val p = java.nio.file.Files
      .createTempDirectory("graft_kn3_store_spec").toString
    NgramLm.writeKn3Model(NgramLm.kn3Model(train), train, p)
    val served = NgramLm.kn3Score(docs,
        NgramLm.readKn3Model(spark, train.repartition(7), p), 6.0)
      .collect().map(_.toString).sorted.toSeq
    assert(served == direct)
    val ex = intercept[IllegalArgumentException] {
      NgramLm.readKn3Model(spark, train.filter(col("doc_id") =!= 3L), p)
    }
    assert(ex.getMessage.contains("stale"), ex.getMessage)
    // the snapshot-guarded twin serves identically off a path-backed train
    val trainDir = p + "_train"
    train.write.mode("overwrite").parquet(trainDir)
    val p2 = p + "_snap"
    val trainDf = spark.read.parquet(trainDir)
    NgramLm.writeKn3ModelSnapshot(NgramLm.kn3Model(trainDf), trainDir, p2)
    val servedSnap = NgramLm.kn3Score(docs,
        NgramLm.readKn3ModelSnapshot(spark, trainDir, p2), 6.0)
      .collect().map(_.toString).sorted.toSeq
    assert(servedSnap == direct)
  }

  test("snapshot-guarded KN store serves without a corpus scan and refuses a changed directory") {
    // The catalog-snapshot serving shape (r17): the guard fingerprints
    // the train directory's file listing, so the serve path NEVER reads
    // corpus rows - proven by scoring after the listing check against a
    // model whose train parquet is present but whose rows are never
    // touched (no df of the corpus is even constructed on the read side).
    val train = (0L until 40L)
      .map(i => (i, s"w${i % 5} w${(i * 3) % 5} w${(i * 7) % 5}"))
      .toDF("doc_id", "text")
    val docs = Seq((1L, "w0 w1 w2"), (2L, "zz qq")).toDF("doc_id", "text")
    val base = java.nio.file.Files
      .createTempDirectory("graft_kn_snap_spec").toString
    val trainDir = s"$base/train"
    train.write.mode("overwrite").parquet(trainDir)
    val trainDf = spark.read.parquet(trainDir)
    val direct = NgramLm.knScore(docs, NgramLm.knModel(trainDf), 4.0)
      .collect().map(_.toString).sorted.toSeq
    val p = s"$base/model"
    NgramLm.writeKnModelSnapshot(NgramLm.knModel(trainDf), trainDir, p)
    val served = NgramLm.knScore(docs,
        NgramLm.readKnModelSnapshot(spark, trainDir, p), 4.0)
      .collect().map(_.toString).sorted.toSeq
    assert(served == direct)
    // any change to the train directory's file set -> loud
    train.limit(39).write.mode("overwrite").parquet(trainDir)
    val ex = intercept[IllegalArgumentException] {
      NgramLm.readKnModelSnapshot(spark, trainDir, p)
    }
    assert(ex.getMessage.contains("stale") &&
      ex.getMessage.contains("snapshot"), ex.getMessage)
  }

  test("entropy of a perfectly-predicted doc is +0.0, never -0.0 (sign-bit pin)") {
    // Train "a a": big={(a,a):1}; uni: a->(c1=1,fert=1); cont: a->1; T=1.
    // Scoring "a a": num = max(4*1-3,0)*1 + 3*1*1 = 4 = den -> logp =
    // lnDec(4) - lnDec(4) = exact decimal zero, so the naive -sum/n is
    // IEEE -0.0 — the one bit pattern two engines can hash apart while
    // both print "0.0" (r16 verdict #2, observed live in t53d's driver
    // dump). The ceNorm `+ 0.0` must land it on +0.0.
    val train = Seq((100L, "a a")).toDF("doc_id", "text")
    val docs = Seq((1L, "a a")).toDF("doc_id", "text")
    val ce = NgramLm.knCrossEntropy(docs, train, maxCrossEntropy = 1.0)
      .collect().head.getDouble(4)
    assert(ce == 0.0 && java.lang.Double.doubleToRawLongBits(ce) == 0L,
      s"kn ce must be +0.0, got raw bits ${java.lang.Double.doubleToRawLongBits(ce)}")
    // Same at order 3: train/docs "a a a" — every tier's num equals den
    // (num = 4*1*1*1 + 3*1*(1*1 + 3*1*1) = 16 = den).
    val train3 = Seq((100L, "a a a")).toDF("doc_id", "text")
    val docs3 = Seq((1L, "a a a")).toDF("doc_id", "text")
    val ce3 = NgramLm.kn3CrossEntropy(docs3, train3, maxCrossEntropy = 1.0)
      .collect().head.getDouble(5)
    assert(ce3 == 0.0 && java.lang.Double.doubleToRawLongBits(ce3) == 0L,
      s"kn3 ce must be +0.0, got raw bits ${java.lang.Double.doubleToRawLongBits(ce3)}")
  }

  test("screenCompare is repartition-stable") {
    import org.apache.spark.sql.functions.{col, lit, when}
    val docs = (0L until 150L)
      .map(i => (i, s"w${i % 7} w${(i * 3) % 7} w${(i * 5) % 7} w${i % 11}"))
      .toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      NgramLm.screenCompare(d, d,
        cohort = when(col("doc_id") % 2 === 0, lit("even")).otherwise(lit("odd")),
        addOneMaxCe = 5.0, knMaxCe = 5.0)
        .collect().map(_.toSeq).toSeq
    assert(run(docs) == run(docs.repartition(13)))
  }

  test("the shared two-order gram stream changes no numbers (r16 refactor pin)") {
    import org.apache.spark.sql.functions.{col, lit, when}
    // screenCompare3 derives ALL gram streams (both corpora, both
    // orders) from one explode each; screenCompare and kn3CrossEntropy
    // run the independent per-order explodes. Their numbers must agree
    // exactly - the projection/filter derivation is row-for-row the old
    // streams, including the docs-with-exactly-2-tokens edge (bigrams
    // but no trigrams) and the too-short tail.
    val docs = (0L until 120L)
      .map(i => (i, i % 10 match {
        case 0 => s"w${i % 7}"                               // too short
        case 1 => s"w${i % 7} w${(i * 3) % 7}"               // bigram only
        case _ => s"w${i % 7} w${(i * 3) % 7} w${(i * 5) % 7} w${i % 11}"
      }))
      .toDF("doc_id", "text")
    val cohort =
      when(col("doc_id") % 2 === 0, lit("even")).otherwise(lit("odd"))
    val three = NgramLm.screenCompare3(docs, docs, cohort,
        addOneMaxCe = 5.0, knMaxCe = 5.0, kn3MaxCe = 5.0)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.toSeq).toMap
    val two = NgramLm.screenCompare(docs, docs, cohort,
        addOneMaxCe = 5.0, knMaxCe = 5.0)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.toSeq).toMap
    assert(three.size == 6 && two.size == 4)
    two.foreach { case (k, v) => assert(three(k) == v, s"row $k diverged") }
    // the kn3 rows equal an independent kn3CrossEntropy pooled by hand
    val perDoc = NgramLm.kn3CrossEntropy(docs, docs, 5.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(6)))
    val evenTri = perDoc.filter(_._1 % 2 == 0).map(_._2).sum
    assert(three(("kn3", "even"))(5) == evenTri,
      s"kn3/even n_trigrams: ${three(("kn3", "even"))(5)} vs $evenTri")
    val evenRejects = perDoc.filter(t => t._1 % 2 == 0 && !t._3).length.toLong
    assert(three(("kn3", "even"))(4) == evenRejects)
  }
}
