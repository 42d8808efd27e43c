package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase

/** Dedup-at-ingest (the streaming face of d9): only first-seen texts land,
  * cross-batch and within-batch; replays rewrite, never double.
  */
class CorpusIngestSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-$name").toString

  test("streamed batches land only first-seen texts, min-id within a batch") {
    val hist = tmp("ingest-hist")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = CorpusIngest.start(
      mem.toDF.toDF("doc_id", "text"), hist, tmp("ingest-ckpt"))
    mem.addData((1L, "alpha"), (2L, "beta"), (3L, "alpha"))
    q.processAllAvailable()
    mem.addData((10L, "beta"), (11L, "gamma"), (12L, "gamma"))
    q.processAllAvailable()
    q.stop()
    val landed = CorpusIngest.readHistory(spark, hist)
      .select("doc_id", "text").as[(Long, String)].collect().sorted.toSeq
    // batch 1: alpha elects id 1 (3 dropped), beta lands; batch 2: beta is
    // history-dup, gamma elects 11.
    assert(landed == Seq((1L, "alpha"), (2L, "beta"), (11L, "gamma")))
  }

  test("replaying a micro-batch overwrites its directory instead of doubling it") {
    val hist = tmp("ingest-replay")
    val b0 = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    CorpusIngest.ingestBatch(b0, hist, batchId = 0L)
    CorpusIngest.ingestBatch(b0, hist, batchId = 0L) // checkpoint replay
    val landed = CorpusIngest.readHistory(spark, hist)
    assert(landed.count() == 2)
    // and a LATER batch replay is idempotent too, with history present
    val b1 = Seq((5L, "beta"), (6L, "delta")).toDF("doc_id", "text")
    CorpusIngest.ingestBatch(b1, hist, batchId = 1L)
    CorpusIngest.ingestBatch(b1, hist, batchId = 1L)
    val all = CorpusIngest.readHistory(spark, hist)
      .select("text").as[String].collect().sorted.toSeq
    assert(all == Seq("alpha", "beta", "delta"))
  }

  test("indexed frontier: deltas track landed survivors and replay is idempotent") {
    val hist = tmp("ingest-idx-hist")
    val idx = tmp("ingest-idx")
    val b0 = Seq((1L, "a b a"), (2L, "b c"), (3L, "a b a")).toDF("doc_id", "text")
    CorpusIngest.ingestBatchIndexed(b0, hist, idx, batchId = 0L)
    // doc 3 is a within-batch dup of doc 1: its text must not be indexed
    val after0 = CorpusIngest.readIndex(spark, idx).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getSeq[Long](3).toList)).toMap
    assert(after0 == Map(
      "a" -> ((1L, 2L, List(1L))),
      "b" -> ((2L, 2L, List(1L, 2L))),
      "c" -> ((1L, 1L, List(2L)))))
    // batch 1: one history-dup (dropped from corpus AND index), one new doc
    val b1 = Seq((7L, "b c"), (8L, "c d")).toDF("doc_id", "text")
    CorpusIngest.ingestBatchIndexed(b1, hist, idx, batchId = 1L)
    CorpusIngest.ingestBatchIndexed(b1, hist, idx, batchId = 1L) // replay
    val after1 = CorpusIngest.readIndex(spark, idx).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getSeq[Long](3).toList)).toMap
    assert(after1 == Map(
      "a" -> ((1L, 2L, List(1L))),
      "b" -> ((2L, 2L, List(1L, 2L))),
      "c" -> ((2L, 2L, List(2L, 8L))),
      "d" -> ((1L, 1L, List(8L)))),
      s"replay must not double df/cf, got $after1")
    // the merged index equals a from-scratch build over the landed corpus
    val rebuilt = graft.text.InvertedIndex
      .build(CorpusIngest.readHistory(spark, hist)).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getSeq[Long](3).toList)).toMap
    assert(rebuilt == after1)
  }

  test("indexed frontier compaction: covering rule, crash tolerance, replay") {
    def canon(idx: String) = CorpusIngest.readIndex(spark, idx).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getSeq[Long](3).toList)).toMap
    val hist = tmp("ingest-cmp-hist")
    val idx = tmp("ingest-cmp-idx")
    val batches = Seq(
      Seq((1L, "a b a"), (2L, "b c")),
      Seq((7L, "c d")),
      Seq((8L, "d e")),
      Seq((9L, "e f a")))
    // threshold 3: compaction fires while processing batch 2 (live dirs
    // 0,1,2) and again at batch 3 (compact-2, 2, 3).
    batches.zipWithIndex.foreach { case (rows, i) =>
      CorpusIngest.ingestBatchIndexed(
        rows.toDF("doc_id", "text"), hist, idx, batchId = i.toLong,
        compactThreshold = 3)
    }
    val expect = canon(idx)
    val rebuilt = graft.text.InvertedIndex
      .build(CorpusIngest.readHistory(spark, hist)).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getSeq[Long](3).toList)).toMap
    assert(expect == rebuilt, "compacted read must equal a from-scratch build")
    // a compact dir exists and covered plain dirs are gone
    val dirs = new java.io.File(idx).listFiles().map(_.getName).toSet
    assert(dirs.exists(_.startsWith("batch=compact-")), s"dirs=$dirs")
    // crash tolerance: re-running compaction for the newest batch is an
    // idempotent rewrite; a stale COVERED dir left un-GC'd is ignored by
    // the covering rule, not double-counted.
    CorpusIngest.compactIndexDeltas(spark, idx, batchId = 3L)
    assert(canon(idx) == expect)
    val landed = Seq((1L, "a b a")).toDF("doc_id", "text")
    CorpusIngest.ingestBatchIndexed(landed, hist, idx, batchId = 0L) // stale dir reappears
    // batch=0 is plain but COVERED (0 < newest compact id): ignored
    assert(canon(idx) == expect,
      "a resurrected covered dir must not double-count postings")
    // replay of the NEWEST batch (the only one foreachBatch re-delivers)
    CorpusIngest.ingestBatchIndexed(
      batches(3).toDF("doc_id", "text"), hist, idx, batchId = 3L,
      compactThreshold = 3)
    assert(canon(idx) == expect)
  }

  test("near-dup frontier: an edited re-crawl is screened out by the stored signatures") {
    val hist = tmp("ingest-nd")
    val long = (1 to 40).map(i => s"w$i").mkString(" ")
    CorpusIngest.ingestBatchNearDup(
      Seq((1L, long), (2L, "totally different content " + (1 to 40).map(i => s"x$i").mkString(" ")))
        .toDF("doc_id", "text"), hist, batchId = 0L)
    // batch 1: an exact dup of 1, a near-dup of 1 (one token edited), fresh
    CorpusIngest.ingestBatchNearDup(
      Seq(
        (10L, long),
        (11L, long.replace("w20", "EDITED")),
        (12L, "fresh " + (1 to 40).map(i => s"y$i").mkString(" ")))
        .toDF("doc_id", "text"), hist, batchId = 1L)
    val landed = CorpusIngest.readNearDupHistory(spark, hist)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(landed == Seq(1L, 2L, 12L),
      s"exact dup 10 and near-dup 11 must be screened, got $landed")
  }

  test("near-dup frontier replay is idempotent and the first batch lands whole") {
    val hist = tmp("ingest-nd-replay")
    val b0 = Seq(
      (1L, (1 to 30).map(i => s"a$i").mkString(" ")),
      (2L, (1 to 30).map(i => s"b$i").mkString(" "))).toDF("doc_id", "text")
    CorpusIngest.ingestBatchNearDup(b0, hist, batchId = 0L)
    CorpusIngest.ingestBatchNearDup(b0, hist, batchId = 0L) // replay
    val landed = CorpusIngest.readNearDupHistory(spark, hist)
    assert(landed.count() == 2)
    assert(landed.filter(landed("sig").isNotNull).count() == 2, "signatures stored")
  }

  test("near-dup frontier signature build is the row-local native expression, shuffle-free") {
    // ingestBatchNearDup's stored signatures come from
    // Dedup.minhashSignatures (same k/shingleN defaults) — pin that the
    // plan it executes per micro-batch is the native MinHashSig
    // projection with NO Exchange anywhere before it: the corpus-sized
    // explode+groupBy form this replaced would shuffle every shingle of
    // every batch, per batch.
    // range-backed, not Seq.toDF: ConvertToLocalRelation would eagerly
    // evaluate a local frame's projection into a LocalTableScan and leave
    // nothing to assert on.
    val batch = spark.range(2).selectExpr(
      "id AS doc_id", "concat('w ', repeat('tok ', 39), id) AS text")
    val plan = graft.dedup.Dedup.minhashSignatures(batch, k = 32, shingleN = 3)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("minhashsig"),
      s"signature build no longer uses the native expression:\n$plan")
    assert(!plan.contains("Exchange"),
      s"signature build must be shuffle-free:\n$plan")
  }

  test("embedding frontier: cosine near-dups screened, exact within-batch collapse, replay") {
    val hist = tmp("ingest-emb")
    val planes = graft.similarity.Similarity.randomPlanes(3, 4)
    def ingest(rows: Seq[(Long, Seq[Float])], id: Long): Unit =
      CorpusIngest.ingestBatchEmbDedup(
        rows.toDF("vec_id", "embedding"), hist, batchId = id,
        planes = planes, minCosine = 0.95)
    val v1 = Seq(1.0f, 2.0f, 3.0f, 4.0f)
    val v2 = Seq(-4.0f, 3.0f, -2.0f, 1.0f) // cos(v1,v2)=0: orthogonal
    // batch 0: ids 1 and 3 are IDENTICAL vectors (exact collapse to min
    // id); id 2 is distinct.
    ingest(Seq((1L, v1), (3L, v1), (2L, v2)), 0L)
    val landed0 = CorpusIngest.readEmbHistory(spark, hist)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(landed0 == Seq(1L, 2L))
    // batch 1: id 10 is a SCALED copy of v1 (cosine exactly 1.0, same
    // sign-bit bucket) -> screened by history; id 11 is new.
    val v1scaled = v1.map(_ * 2.5f)
    val v3 = Seq(4.0f, -3.0f, 2.0f, -1.0f)
    ingest(Seq((10L, v1scaled), (11L, v3)), 1L)
    ingest(Seq((10L, v1scaled), (11L, v3)), 1L) // replay: overwrite, not double
    val landed1 = CorpusIngest.readEmbHistory(spark, hist)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(landed1 == Seq(1L, 2L, 11L),
      s"scaled copy must be screened, new vector lands once, got $landed1")
    // stored geometry is reused: history rows carry nrm + bucket
    val row = CorpusIngest.readEmbHistory(spark, hist)
      .filter($"vec_id" === 1L).head
    assert(math.abs(row.getDouble(2) - math.sqrt(1 + 4 + 9 + 16)) < 1e-9)
  }

  test("embedding frontier batch face: the ingest drop set IS embScreenReport's verdict (e14 contract)") {
    val hist = tmp("ingest-emb-face")
    val planes = graft.similarity.Similarity.randomPlanes(3, 4)
    val v1 = Seq(1.0f, 2.0f, 3.0f, 4.0f)
    val v2 = Seq(-4.0f, 3.0f, -2.0f, 1.0f)
    CorpusIngest.ingestBatchEmbDedup(
      Seq((1L, v1), (2L, v2)).toDF("vec_id", "embedding"), hist, batchId = 0L,
      planes = planes, minCosine = 0.95)
    // batch 1: a scaled copy (cosine exactly 1.0), an orthogonal fresh
    // vector, and a ZERO vector (undefined cosine -> never a near-dup by
    // convention: 0 candidates, lands).
    val batch = Seq(
      (10L, v1.map(_ * 2.0f)),
      (11L, Seq(4.0f, -3.0f, 2.0f, -1.0f)),
      (12L, Seq(0.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    // The batch face scored directly against the STORED history — the
    // exact function the streaming ingest derives its drop set from
    // (e14's oracle pins the same code over the sf tables).
    val report = CorpusIngest.embScreenReport(
      CorpusIngest.annotateEmb(batch, planes),
      CorpusIngest.readEmbHistory(spark, hist), planes, minCosine = 0.95)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    assert(report.keySet == Set(10L, 11L, 12L), "every batch vector reports")
    assert(report(10L)._2, "scaled copy verdict: is_dup")
    assert(!report(11L)._2, "orthogonal vector verdict: lands")
    assert(report(12L) == (0L, false), "zero-norm: no candidates, lands")
    // ...and the streaming ingest of the same batch agrees verdict-for-
    // verdict with the report.
    CorpusIngest.ingestBatchEmbDedup(batch, hist, batchId = 1L,
      planes = planes, minCosine = 0.95)
    val landed = CorpusIngest.readEmbHistory(spark, hist)
      .filter($"vec_id" >= 10L).select("vec_id").as[Long].collect().sorted.toSeq
    assert(landed == Seq(11L, 12L),
      s"ingest must land exactly the report's non-dups, got $landed")
  }

  test("history scan for dedup prunes to the hash column (store-the-hash contract)") {
    val hist = tmp("ingest-prune")
    CorpusIngest.ingestBatch(
      Seq((1L, "alpha")).toDF("doc_id", "text"), hist, batchId = 0L)
    val history = CorpusIngest.readHistory(spark, hist)
    val plan = graft.dedup.Dedup.incrementalExactAgainstHashes(
      Seq((2L, "beta")).toDF("doc_id", "text"), history.select("text_hash"))
      .queryExecution.executedPlan.toString
    // the history-side parquet scan must read ONLY text_hash (d9's "store
    // the hash at ingest" note made physical by CorpusIngest)
    val historyScans = plan.split("\n").filter(l =>
      l.contains("Scan parquet") || (l.contains("FileScan") && l.contains("batch=")))
    assert(historyScans.nonEmpty, s"no parquet scan found:\n$plan")
    assert(historyScans.exists(l => l.contains("text_hash") && !l.contains("text:")),
      s"history scan not pruned to text_hash:\n${historyScans.mkString("\n")}")
  }

  test("dsir gate: only target-like docs land, scores match the batch face, replay idempotent") {
    import graft.curation.Curation
    val trainPool = ((1L to 10L).map(i => (i, Seq.fill(5)("alpha beta gamma").mkString(" "))) ++
      (11L to 20L).map(i => (i, Seq.fill(5)("zork quux blarg").mkString(" "))))
      .toDF("doc_id", "text")
    val lambdas = Curation
      .dsirLambdas(trainPool, trainPool.filter($"doc_id" <= 10), buckets = 64, salt = "g")
      .cache() // the static model: trained once, reused per batch
    val hist = tmp("dsir-hist")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = CorpusIngest.startDsirGate(
      mem.toDF.toDF("doc_id", "text"), lambdas, hist, tmp("dsir-ckpt"),
      buckets = 64, salt = "g")
    mem.addData((100L, "alpha beta gamma alpha beta gamma"), (101L, "zork quux blarg zork"))
    q.processAllAvailable()
    mem.addData((102L, "beta gamma beta gamma"), (103L, "quux quux blarg"))
    q.processAllAvailable()
    q.stop()
    val landed = CorpusIngest.readDsirGated(spark, hist)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(landed == Seq(100L, 102L), s"only target-like docs land: $landed")
    // the gate's scores ARE dsirScoreWith's (c23's oracled code path)
    val batchFace = Curation.dsirScoreWith(
      Seq((100L, "alpha beta gamma alpha beta gamma"),
        (101L, "zork quux blarg zork")).toDF("doc_id", "text"),
      lambdas, buckets = 64, salt = "g")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val gateScores = CorpusIngest.readDsirGated(spark, hist)
      .filter($"doc_id" === 100L).select("log_w").as[Double].head()
    assert(gateScores == batchFace(100L), "gate score == batch-face score, bit-exact")
    assert(batchFace(101L) < 0, "the screened doc scored negative")
    // replay: re-running batch 0 rewrites its dir with identical content
    CorpusIngest.ingestBatchDsirGate(
      Seq((100L, "alpha beta gamma alpha beta gamma"),
        (101L, "zork quux blarg zork")).toDF("doc_id", "text"),
      lambdas, hist, batchId = 0L, buckets = 64, salt = "g")
    val after = CorpusIngest.readDsirGated(spark, hist)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(after == Seq(100L, 102L), s"replay must not double or drop: $after")
    lambdas.unpersist()
  }

  test("drift monitor (ST10): matching batches sit low, an alien batch spikes; scores match the batch face") {
    import graft.text.CorpusStats
    val reference = (1L to 40L)
      .map(i => (i, (0 to 9).map(j => s"ref${(i + j) % 25}").mkString(" ")))
      .toDF("doc_id", "text")
    val profile = CorpusStats.bucketProfile(reference, buckets = 64, salt = "dm")
      .cache() // the frozen model: trained once, reused per batch
    val metrics = tmp("drift-metrics")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = CorpusIngest.startDriftMonitor(
      mem.toDF.toDF("doc_id", "text"), profile, metrics, tmp("drift-ckpt"),
      buckets = 64, salt = "dm")
    val likeBatch = (100L to 119L)
      .map(i => (i, (0 to 9).map(j => s"ref${(i + j) % 25}").mkString(" ")))
    val alienBatch = (200L to 219L)
      .map(i => (i, (0 to 9).map(j => s"alien${(i + j) % 25}").mkString(" ")))
    mem.addData(likeBatch: _*)
    q.processAllAvailable()
    mem.addData(alienBatch: _*)
    q.processAllAvailable()
    q.stop()
    val kls = CorpusIngest.readDriftMetrics(spark, metrics)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(kls.keySet == Set(0L, 1L), s"one metrics row per batch: $kls")
    assert(kls(0L)._1 == 200L && kls(1L)._1 == 200L, s"token counts: $kls")
    assert(kls(1L)._2 > kls(0L)._2 + 1.0,
      s"the alien batch must spike the gauge: $kls")
    // the monitor's number IS klDrift's (gate == batch face, bit-exact)
    val direct = CorpusStats.klDrift(likeBatch.toDF("doc_id", "text"),
      profile, buckets = 64, salt = "dm").head().getDouble(1)
    assert(kls(0L)._2 == direct, "monitor kl == batch-face kl, bit-exact")
    // replay: re-running batch 0 rewrites its dir, never doubles
    CorpusIngest.ingestBatchDriftMonitor(likeBatch.toDF("doc_id", "text"),
      profile, metrics, batchId = 0L, buckets = 64, salt = "dm")
    assert(CorpusIngest.readDriftMetrics(spark, metrics).count() == 2L)
    profile.unpersist()
  }

  test("klDrift is exactly repartition-stable and finite on empty input") {
    import graft.text.CorpusStats
    val reference = (1L to 30L)
      .map(i => (i, (0 to 7).map(j => s"w${(i * 3 + j) % 20}").mkString(" ")))
      .toDF("doc_id", "text")
    val profile = CorpusStats.bucketProfile(reference, buckets = 32, salt = "kd")
    val batch = (50L to 79L)
      .map(i => (i, (0 to 5).map(j => s"w${(i + j) % 26}").mkString(" ")))
      .toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      CorpusStats.klDrift(d, profile, buckets = 32, salt = "kd")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(run(batch) == run(batch.repartition(7)))
    // Gibbs up to the decimal grid
    assert(run(batch).head._2 >= -1e-4)
    // an empty batch is pure smoothing mass: finite, well-defined
    val empty = run(batch.filter($"doc_id" < 0))
    assert(empty.head._1 == 0L && !empty.head._2.isNaN && !empty.head._2.isInfinite)
  }

  test("coverage monitor (ST11): clean batches gauge 0 OOV, a shifted batch spikes; rows match the batch face") {
    import graft.text.Unigram
    val reference = (1L to 40L)
      .map(i => (i, (0 to 9).map(j => s"ref${(i + j) % 25}").mkString(" ")))
      .toDF("doc_id", "text")
    val vocab = Unigram.collectVocab(
      Unigram.learn(reference).select("piece", "cnt", "cost_micro"))
    val metrics = tmp("cov-metrics")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = CorpusIngest.startCoverageMonitor(
      mem.toDF.toDF("doc_id", "text"), vocab, metrics, tmp("cov-ckpt"))
    val likeBatch = (100L to 109L)
      .map(i => (i, (0 to 9).map(j => s"ref${(i + j) % 25}").mkString(" ")))
    // chars x/z/9 appear in "ref.." digits? 'ref19' has 9 -> 9 IS in the
    // reference alphabet; use chars genuinely outside it: 'zx' words
    val shiftedBatch = (200L to 209L)
      .map(i => (i, "ref1 ref2 zxq" + i))
    mem.addData(likeBatch: _*)
    q.processAllAvailable()
    mem.addData(shiftedBatch: _*)
    q.processAllAvailable()
    q.stop()
    val rows = CorpusIngest.readCoverageMetrics(spark, metrics)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4), r.getDouble(5))).toMap
    assert(rows.keySet == Set(0L, 1L), s"one metrics row per batch: $rows")
    assert(rows(0L)._3 == 0L && rows(0L)._4 == 0.0, s"clean batch has no OOV: $rows")
    assert(rows(1L)._3 == 10L && rows(1L)._4 > 0.3, s"the shifted batch must spike: $rows")
    // the monitor's row IS coverageReport's (gauge == batch face, bit-exact)
    val direct = Unigram.coverageReport(shiftedBatch.toDF("doc_id", "text"), vocab)
      .select("n_docs", "n_words", "n_oov_words", "oov_rate").head()
    assert((rows(1L)._1, rows(1L)._2, rows(1L)._3, rows(1L)._4) ==
      (direct.getLong(0), direct.getLong(1), direct.getLong(2), direct.getDouble(3)))
    // replay: re-running batch 1 rewrites its dir, never doubles
    CorpusIngest.ingestBatchCoverageMonitor(
      shiftedBatch.toDF("doc_id", "text"), vocab, metrics, batchId = 1L)
    assert(CorpusIngest.readCoverageMetrics(spark, metrics).count() == 2L)
  }

  test("KN perplexity monitor (ST12): in-domain batches keep, a gibberish batch spikes; rows match the batch face") {
    import graft.text.NgramLm
    val reference = (1L to 50L)
      .map(i => (i, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val model = NgramLm.knModel(reference)
    val metrics = tmp("kn-metrics")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = CorpusIngest.startKnMonitor(
      mem.toDF.toDF("doc_id", "text"), model, maxCrossEntropy = 2.0,
      metrics, tmp("kn-ckpt"))
    val inDomain = (100L to 104L).map(i => (i, "the quick brown fox jumps"))
    val gibberish = (200L to 204L).map(i => (i, "eht kciuq nworb xof spmuj"))
    mem.addData(inDomain: _*)
    q.processAllAvailable()
    mem.addData(gibberish: _*)
    q.processAllAvailable()
    q.stop()
    val rows = CorpusIngest.readKnMetrics(spark, metrics)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5), r.getDouble(6))))
      .toMap
    assert(rows.keySet == Set(0L, 1L), s"one metrics row per batch: $rows")
    assert(rows(0L)._3 == 0L, s"in-domain batch fully keeps: $rows")
    assert(rows(1L)._3 == 5L && rows(1L)._4 > 0L && rows(1L)._5 > rows(0L)._5 + 2.0,
      s"gibberish batch must reject and spike CE: $rows")
    // the monitor's row IS knScreenReport's (gauge == batch face, bit-exact)
    val direct = NgramLm.knScreenReport(
      gibberish.toDF("doc_id", "text"), model, maxCrossEntropy = 2.0).head()
    assert((rows(1L)._1, rows(1L)._2, rows(1L)._3, rows(1L)._4, rows(1L)._5) ==
      (direct.getLong(0), direct.getLong(1), direct.getLong(2),
        direct.getLong(4), direct.getDouble(5)))
    // replay: re-running batch 1 rewrites its dir, never doubles
    CorpusIngest.ingestBatchKnMonitor(
      gibberish.toDF("doc_id", "text"), model, 2.0, metrics, batchId = 1L)
    assert(CorpusIngest.readKnMetrics(spark, metrics).count() == 2L)
    // an EMPTY micro-batch must not crash the monitor under ANSI: the
    // NULL decimal slp-sum short-circuits the pooled division before
    // the zero-divisor check, so the row reports NULL CE and 0 counts
    CorpusIngest.ingestBatchKnMonitor(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), model, 2.0,
      metrics, batchId = 2L)
    val emptyRow = CorpusIngest.readKnMetrics(spark, metrics)
      .filter(org.apache.spark.sql.functions.col("batch_id") === 2L).head()
    assert(emptyRow.getLong(1) == 0L && emptyRow.getLong(4) == 0L &&
      emptyRow.isNullAt(6), s"empty batch: $emptyRow")
  }
}
