package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")

  /** docs + near-dup copies (drop last 3 words) of every 20th doc. */
  private lazy val corpus = {
    val t = split(col("text"), " ")
    docs.unionByName(
      docs.filter(col("doc_id") % 20 === 0 && size(t) > 3)
        .withColumn("text", concat_ws(" ", slice(t, lit(1), size(t) - 3)))
        .withColumn("doc_id", col("doc_id") + 1000000L))
  }

  test("exact dedup collapses injected copies to the min id") {
    val withCopies = docs.unionByName(
      docs.filter(col("doc_id") % 10 === 0).withColumn("doc_id", col("doc_id") + 1000000L))
    val out = Dedup.exact(withCopies)
    assert(out.count() == docs.count()) // one survivor per distinct text
    val survivors = out.filter(col("n_copies") === 2)
    assert(survivors.count() == docs.filter(col("doc_id") % 10 === 0).count())
    assert(survivors.filter(col("doc_id") >= 1000000L).count() == 0) // min id wins
  }

  test("minhash LSH finds every injected near-dup pair") {
    val pairs = Dedup.minhashLshPairs(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val injected = docs.filter(col("doc_id") % 20 === 0 && size(split(col("text"), " ")) > 3)
      .select("doc_id").collect().map(_.getLong(0))
      .map(id => (id, id + 1000000L)).toSet
    assert(injected.subsetOf(pairs), s"missing ${injected -- pairs}")
  }

  test("minhash estimates track exact jaccard on candidate pairs") {
    val est = Dedup.minhashLshPairs(corpus, minEstJaccard = 0.0)
      .withColumnRenamed("est_jaccard", "est")
    val exact = Dedup.jaccardShinglePairs(corpus, threshold = 0.0)
    val joined = est.join(exact, Seq("id_a", "id_b"))
      .select(abs(col("est") - col("jaccard")).as("err"))
      .agg(max("err")).head.getDouble(0)
    assert(joined < 0.35, s"max |est-exact| = $joined") // 32 hashes -> coarse but bounded
  }

  test("simhash blocked join finds EVERY pair within the hamming budget") {
    import graft.text.TextFunctions
    val maxH = 6
    val blocked = Dedup.simhashPairs(corpus, maxHamming = maxH).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force ground truth: all-pairs hamming over the same corpus
    val sh = corpus.select(
      col("doc_id").as("id"),
      TextFunctions.simhashBitVector(col("text")).as("bits"))
    val truth = sh.as("x").join(sh.as("y"), col("x.id") < col("y.id"))
      .withColumn("hamming", TextFunctions.hamming(col("x.bits"), col("y.bits")))
      .filter(col("hamming") <= maxH)
      .select(col("x.id"), col("y.id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // pigeonhole blocking (maxH+1 segments) guarantees 100% recall
    assert(truth == blocked, s"missing ${truth -- blocked}, extra ${blocked -- truth}")
    assert(truth.nonEmpty) // injected near-dups make this non-vacuous
  }

  test("exact jaccard pairs: injected copies of long docs score >= 0.9") {
    // dropping 3 of w words keeps (w-5)/(w-2) of the 3-shingles: >=0.9 needs w>=35
    val injectedScores = Dedup.jaccardShinglePairs(corpus, threshold = 0.5)
      .filter(col("id_b") === col("id_a") + 1000000L)
    assert(injectedScores.count() > 0)
    assert(injectedScores.filter(col("n_a") >= 40).count() > 0)
    assert(injectedScores.filter(col("n_a") >= 40)
      .agg(min("jaccard")).head.getDouble(0) > 0.9)
  }

  test("incrementalExact: drops history dups, elects min-id within batch") {
    import spark.implicits._
    val history = Seq(
      10L -> "already ingested text",
      11L -> "another known document").toDF("doc_id", "text")
    val batch = Seq(
      20L -> "already ingested text", // exact history dup -> dropped
      21L -> "genuinely new content", // new, unique -> survives
      22L -> "repeated inside batch", // new, duplicated in-batch
      23L -> "repeated inside batch", // -> min id 22 survives, copies=2
      24L -> "another known document" // history dup -> dropped
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalExact(batch, history)
      .select("doc_id", "n_batch_copies").as[(Long, Long)].collect().toSet
    assert(got == Set(21L -> 1L, 22L -> 2L))
    // Equivalent to: rows exact() over history++batch admits with a batch id.
    val unioned = Dedup.exact(history.unionByName(batch))
      .filter(col("doc_id") >= 20L)
      .select("doc_id", "n_copies").as[(Long, Long)].collect().toSet
    assert(unioned.map(_._1) == got.map(_._1))
  }

  test("incrementalExact: null-text rows excluded on both sides (NOT IN parity)") {
    import spark.implicits._
    // A null batch md5 would survive the left_anti (null equals nothing)
    // while SQL NOT IN drops it - the contract is: null text never plays.
    val history = Seq(
      Some(10L) -> Some("known"),
      Some(11L) -> Option.empty[String]).map { case (a, b) => (a.get, b.orNull) }
      .toDF("doc_id", "text")
    val batch = Seq(
      (20L, "known"),
      (21L, null.asInstanceOf[String]),
      (22L, "fresh")).toDF("doc_id", "text")
    val got = Dedup.incrementalExact(batch, history)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(22L))
  }

  test("jaccard maxDocFreq cap: high cap is exact, low cap only prunes") {
    def pairs(cap: Option[Int]) =
      Dedup.jaccardShinglePairs(corpus, threshold = 0.5, maxDocFreq = cap)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(None)
    assert(pairs(Some(1000000)) == exact) // cap above any real df: no change
    val capped = pairs(Some(2))
    assert(capped.subsetOf(exact)) // the cap can only drop candidate evidence
  }

  test("incrementalNearDup flags batch docs near history, reports the rest with 0 candidates") {
    import spark.implicits._
    val history = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta"), // near-dup of 1 (+1 token)
      (11L, "totally different words entirely here now"), // fresh
      (12L, "xx yy")) // too short to shingle: reported, 0 candidates
      .toDF("doc_id", "text")
    val got = Dedup.incrementalNearDup(batch, history, threshold = 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) -1.0 else r.getDouble(2), r.getBoolean(3))).toMap
    assert(got.keySet == Set(10L, 11L, 12L))
    assert(got(10L)._1 == 1L && got(10L)._3, s"expected 10 flagged: ${got(10L)}")
    // 4 common shingles of doc 1's 4, batch side has 5 -> J = 4/5
    assert(got(10L)._2 == 4.0 / 5.0)
    assert(got(11L) == ((0L, -1.0, false)))
    assert(got(12L) == ((0L, -1.0, false)))
  }

  test("ngramNovelty: verbatim re-ingest scores 0, fresh text 1, a remix in between") {
    import spark.implicits._
    val history = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"),  // verbatim: novelty 0
      (11L, "one two three four five six"),           // fresh: novelty 1
      (12L, "alpha beta gamma one two three"),        // remix: 2 of 4 grams seen
      (13L, "xx yy"))                                  // too short: 0/0, null frac
      .toDF("doc_id", "text")
    val got = Dedup.ngramNovelty(batch, history)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) -1.0 else r.getDouble(3))).toMap
    assert(got(10L) == ((4L, 0L, 0.0)))
    assert(got(11L) == ((4L, 4L, 1.0)))
    // grams: (alpha beta gamma) seen, (beta gamma one), (gamma one two),
    // (one two three) novel -> 3 of 4 novel
    assert(got(12L) == ((4L, 3L, 0.75)))
    assert(got(13L) == ((0L, 0L, -1.0)))
  }

  test("incrementalNearDup df cap prunes candidates but never invents them; null text excluded") {
    import spark.implicits._
    val history = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d e"),
      (3L, "a b c d e"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "a b c d e f"),
      (11L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val exact = Dedup.incrementalNearDup(batch, history, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(exact == Map(10L -> 3L)) // null rows on BOTH sides excluded
    // every history shingle has df=3 > cap=2: all candidates pruned
    val capped = Dedup.incrementalNearDup(batch, history,
      threshold = 0.5, maxDocFreq = Some(2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3))).toSet
    assert(capped == Set((10L, 0L, false)))
  }

  test("containment catches a full excerpt that Jaccard misses") {
    import spark.implicits._
    // doc 2 = a 6-token excerpt of the 20-token doc 1 -> 4 shingles,
    // all contained; doc 3 unrelated.
    val long = (1 to 20).map(i => s"w$i").mkString(" ")
    val excerpt = (5 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, long), (2L, excerpt), (3L, "x y z q r s"))
      .toDF("doc_id", "text")
    val cont = Dedup.containmentShinglePairs(docs, threshold = 0.9)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6)))
    assert(cont.toSeq == Seq((1L, 2L, 4L, 18L, 4L, 4.0 / 18, 1.0)),
      s"got ${cont.toSeq}")
    // symmetric Jaccard on the same pair: 4/18 -- far under 0.5
    val jac = Dedup.jaccardShinglePairs(docs, threshold = 0.5).count()
    assert(jac == 0L, "Jaccard at the standard threshold must miss the excerpt")
  }

  test("containment pairs respect the df cap and are repartition-stable") {
    import spark.implicits._
    val base = (0L until 40L).map(i =>
      (i, (0 to 8).map(j => s"t${(i * 3 + j) % 50}").mkString(" ")))
    val docs = (base ++ Seq((100L, base(4)._2.split(" ").take(5).mkString(" "))))
      .toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      Dedup.containmentShinglePairs(d, threshold = 0.8, maxDocFreq = Some(10))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(5), r.getDouble(6)))
        .sortBy(t => (t._1, t._2)).toSeq
    assert(run(docs) == run(docs.repartition(7)))
    assert(run(docs).exists { case (a, b, _, cb) => a == 4L && b == 100L && cb == 1.0 })
  }
}
