package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.dedup.Dedup

/** Dedup-at-ingest for a streaming document feed — the streaming face of
  * [[graft.dedup.Dedup.incrementalExact]] (d9): each micro-batch is
  * deduplicated against everything already landed AND within itself, and
  * only first-seen texts append to the corpus. The crawl-frontier shape:
  * history only ever grows by survivors, so the anti-join side stays
  * duplicate-free by construction.
  *
  * Exactly-once: each batch lands in its own `batch=<id>` directory with
  * OVERWRITE semantics, so a replayed micro-batch (checkpoint recovery)
  * rewrites the same files instead of doubling them — the same
  * directory-granular idempotence contract as [[graft.etl.Load]]'s
  * partition swap. History reads glob every batch directory; dedup prunes
  * the scan to the hash column (store-the-hash-at-ingest, the d9 scale
  * note, made physical here).
  */
object CorpusIngest {

  private def historySchema = "doc_id LONG, text STRING, text_hash STRING"

  /** Landed batch directories other than `batchId`'s own, via the Hadoop
    * FileSystem API so an HDFS/S3 historyDir lists correctly —
    * `java.io.File` would return null there and silently treat a full
    * history as empty, re-landing every duplicate.
    */
  private def priorBatchDirs(
      spark: SparkSession, historyDir: String, batchId: Long): Seq[String] = {
    val path = new org.apache.hadoop.fs.Path(historyDir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch=")
        && st.getPath.getName != s"batch=$batchId")
      .map(_.getPath.toString)
  }

  def readHistory(spark: SparkSession, historyDir: String): DataFrame =
    spark.read.schema(historySchema).parquet(historyDir + "/batch=*")

  /** One micro-batch: survivors (first-seen hashes, min-id within batch)
    * land under `historyDir/batch=<batchId>`. Exposed for direct testing
    * of the replay contract; [[start]] wires it to foreachBatch.
    */
  def ingestBatch(batch: DataFrame, historyDir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    // History = every landed batch EXCEPT this one: on checkpoint replay
    // the re-delivered batch's own previous output is already on disk,
    // and screening against it would dedup the whole batch away — the
    // overwrite would then ERASE the landed data instead of rewriting it
    // (the replay-vs-self trap; CorpusIngestSpec pins it). An empty
    // corpus reads as an empty frame (a batch=* glob would refuse the
    // bare path).
    val priorDirs = priorBatchDirs(spark, historyDir, batchId)
    val history =
      if (priorDirs.nonEmpty)
        spark.read.schema(historySchema).parquet(priorDirs: _*)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(historySchema))
    val survivors = Dedup.incrementalExactAgainstHashes(
      batch, history.select("text_hash"))
      .select(col("doc_id"), col("text_hash"))
    // Re-attach text for the landed corpus: join back on the elected id
    // (hash-keyed join would resend every batch copy's text).
    survivors
      .join(batch.select(col("doc_id"), col("text")), Seq("doc_id"))
      .select("doc_id", "text", "text_hash")
      .write.mode("overwrite")
      .parquet(s"$historyDir/batch=$batchId")
  }

  def start(docs: DataFrame, historyDir: String, checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, historyDir, batchId)
      }
      .start()

  // -------------------------------------------------------------------
  // Incremental inverted-index maintenance (t27 composed with the
  // frontier): each landed batch also writes its DELTA index — term →
  // (df, cf, postings) over the batch's SURVIVORS only — under
  // `indexDir/batch=<id>`, and the queryable corpus index is the
  // per-term merge of the deltas. The frontier's first-seen guarantee is
  // exactly [[graft.text.InvertedIndex.mergeDeltas]]'s disjointness
  // precondition, so df/cf add and postings concatenate with no dedup;
  // landed TEXT is tokenized once, in the batch that introduced it —
  // maintenance cost is delta-sized, never a corpus rebuild. Replay
  // (checkpoint recovery) rewrites both `batch=<id>` directories with
  // identical content — the same directory-granular idempotence as the
  // corpus landing itself (CorpusIngestSpec pins it).

  private def indexDeltaSchema =
    "term STRING, df BIGINT, cf BIGINT, postings ARRAY<BIGINT>"

  /** One micro-batch of the indexed frontier: land survivors, then write
    * their delta index. The delta is built from the LANDED parquet (not
    * the in-memory survivor frame) so index content is exactly what the
    * corpus holds even across a replay that re-elects within-batch ids.
    *
    * `compactThreshold` > 0 turns on LSM compaction: when the number of
    * live delta directories this batch must merge at read time reaches
    * the threshold, everything STRICTLY PRIOR to this batch is collapsed
    * into one `batch=compact-<batchId>` directory. Strictly-prior batches
    * are committed and never re-delivered (foreachBatch replays only the
    * last uncommitted batch), so compaction never races a replay; this
    * batch's own delta stays a plain directory so its replay-overwrite
    * contract is untouched.
    */
  def ingestBatchIndexed(
      batch: DataFrame, historyDir: String, indexDir: String, batchId: Long,
      compactThreshold: Int = 0): Unit = {
    ingestBatch(batch, historyDir, batchId)
    val spark = batch.sparkSession
    val landed = spark.read
      .schema(historySchema).parquet(s"$historyDir/batch=$batchId")
    graft.text.InvertedIndex.buildDelta(landed)
      .write.mode("overwrite")
      .parquet(s"$indexDir/batch=$batchId")
    if (compactThreshold > 0 &&
      liveIndexDirs(spark, indexDir).length >= compactThreshold)
      compactIndexDeltas(spark, indexDir, batchId)
  }

  /** The live delta directories under the covering rule: the newest
    * `batch=compact-<C>` covers every PLAIN `batch=<k>` with k < C (and
    * every older compact dir), so a reader merges compact-C plus the
    * plain dirs with k >= C. Stale covered dirs — left behind only if a
    * crash interrupted compaction's GC — are thereby IGNORED, never
    * double-counted: correctness comes from this rule, deletion is just
    * space reclamation.
    */
  private def liveIndexDirs(spark: SparkSession, indexDir: String): Seq[String] = {
    val path = new org.apache.hadoop.fs.Path(indexDir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(path)) return Seq.empty
    val dirs = fs.listStatus(path).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
      .map(_.getPath)
    val compacts = dirs
      .flatMap(p => p.getName.stripPrefix("batch=") match {
        case s if s.startsWith("compact-") => Some(s.stripPrefix("compact-").toLong -> p)
        case _ => None
      })
    val newestCompact = compacts.sortBy(-_._1).headOption
    val floor = newestCompact.map(_._1).getOrElse(Long.MinValue)
    val plains = dirs
      .flatMap(p => p.getName.stripPrefix("batch=") match {
        case s if s.forall(_.isDigit) && s.nonEmpty => Some(s.toLong -> p)
        case _ => None
      })
      .filter(_._1 >= floor)
    (newestCompact.toSeq ++ plains).map(_._2.toString)
  }

  /** Collapse every delta strictly prior to `batchId` (under the covering
    * rule) into `batch=compact-<batchId>`, then GC the sources. The write
    * is an idempotent overwrite and the read rule ignores covered dirs,
    * so a crash at ANY point (before the write, between write and GC,
    * mid-GC) leaves a correct index; re-running just rewrites the same
    * directory. [[graft.text.InvertedIndex.compactDeltas]] is associative,
    * so folding an older compact dir into a newer one is exact.
    */
  def compactIndexDeltas(spark: SparkSession, indexDir: String, batchId: Long): Unit = {
    // Only STRICTLY-PRIOR deltas are valid sources: a plain dir with
    // k >= batchId (this batch's own replay-overwrite target, or — if a
    // caller passes a stale batchId — a newer committed batch) must stay
    // live, because the covering rule keeps every plain dir with
    // k >= batchId visible and folding one in would double-count its
    // postings. A compact-C dir covers batches < C, so it is prior
    // whenever C <= batchId.
    val sources = liveIndexDirs(spark, indexDir)
      .filter { d =>
        val name = new org.apache.hadoop.fs.Path(d).getName.stripPrefix("batch=")
        if (name.startsWith("compact-")) name.stripPrefix("compact-").toLong <= batchId
        else name.toLong < batchId
      }
    if (sources.isEmpty) return
    // Re-compaction after a completed compact+GC leaves exactly one live
    // source: this batch's own compact dir. Everything < batchId is
    // already covered by it, so rewriting would be a value-level no-op —
    // and a READ-THEN-OVERWRITE of the same path, the classic file-sink
    // data-loss footgun on filesystems where overwrite deletes the input
    // before the job reads it. Return instead.
    if (sources.map(_.stripSuffix("/"))
      .forall(_.endsWith(s"batch=compact-$batchId"))) return
    graft.text.InvertedIndex.compactDeltas(
      spark.read.schema(indexDeltaSchema).parquet(sources: _*))
      .write.mode("overwrite")
      .parquet(s"$indexDir/batch=compact-$batchId")
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    sources.foreach { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      if (p.getName != s"batch=compact-$batchId") fs.delete(p, true)
    }
  }

  /** The assembled corpus index over every live delta: term → (df, cf,
    * sorted postings, gaps). Scan reads only delta columns — no text.
    */
  def readIndex(spark: SparkSession, indexDir: String): DataFrame = {
    val dirs = liveIndexDirs(spark, indexDir)
    graft.text.InvertedIndex.mergeDeltas(
      if (dirs.nonEmpty)
        spark.read.schema(indexDeltaSchema).parquet(dirs: _*)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(indexDeltaSchema)))
  }

  def startIndexed(
      docs: DataFrame, historyDir: String, indexDir: String,
      checkpointDir: String, compactThreshold: Int = 0): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatchIndexed(batch, historyDir, indexDir, batchId, compactThreshold)
      }
      .start()

  // -------------------------------------------------------------------
  // Fuzzy frontier: the exact-hash gate above misses the one-token-edited
  // re-crawl. This mode stores each landed document's MinHash SIGNATURE
  // alongside its hash, and screens every new batch by LSH banding
  // against the stored signatures — the incremental form of d2's
  // candidate generation, with the corpus-side signature work paid ONCE
  // at ingest instead of per screening run. History text is never read:
  // the scan prunes to (text_hash, sig).

  private def nearDupSchema =
    "doc_id LONG, text STRING, text_hash STRING, sig ARRAY<LONG>"

  def readNearDupHistory(spark: SparkSession, historyDir: String): DataFrame =
    spark.read.schema(nearDupSchema).parquet(historyDir + "/batch=*")

  private def priorBatches(
      spark: SparkSession, historyDir: String, batchId: Long,
      schema: String): Option[DataFrame] = {
    val dirs = priorBatchDirs(spark, historyDir, batchId)
    if (dirs.isEmpty) None
    else Some(spark.read.schema(schema).parquet(dirs: _*))
  }

  /** One micro-batch of the near-dup frontier: a batch document lands iff
    * (a) its exact hash is unseen, (b) no LSH band collision with a
    * stored signature estimates Jaccard >= `minEstJaccard`, and (c) it is
    * the min-id of its exact hash within the batch. Within-batch NEAR
    * dups both land (the next batch will screen against them) — the
    * standard frontier compromise that keeps each batch one pass.
    */
  def ingestBatchNearDup(
      batch: DataFrame, historyDir: String, batchId: Long,
      k: Int = 32, bands: Int = 8, shingleN: Int = 3,
      minEstJaccard: Double = 0.7): Unit = {
    import graft.text.TextFunctions
    val spark = batch.sparkSession
    val history = priorBatches(spark, historyDir, batchId, nearDupSchema)
    val sigs = graft.util.CacheScope.persist(
      Dedup.minhashSignatures(batch, k, shingleN))
    val exactSurvivors = history match {
      case None => Dedup.incrementalExactAgainstHashes(
        batch, spark.emptyDataFrame.select(lit("").as("text_hash")).limit(0))
      case Some(h) => Dedup.incrementalExactAgainstHashes(batch, h.select("text_hash"))
    }
    val nearDropped = history match {
      case None => spark.range(0).select(col("id").as("doc_id"))
      case Some(h) =>
        val bBands = sigs.select(col("id"),
          posexplode(TextFunctions.minhashBands(col("sig"), k, bands))
            .as(Seq("band", "band_hash")))
        val hSigs = h.select(col("doc_id").as("hid"), col("sig").as("hsig"))
        val hBands = hSigs.select(col("hid"),
          posexplode(TextFunctions.minhashBands(col("hsig"), k, bands))
            .as(Seq("band", "band_hash")))
        bBands.join(hBands, Seq("band", "band_hash"))
          .select("id", "hid").distinct()
          .join(sigs, Seq("id"))
          .join(hSigs, Seq("hid"))
          .filter(TextFunctions.minhashJaccardEstimate(
            col("sig"), col("hsig"), k) >= minEstJaccard)
          .select(col("id").as("doc_id")).distinct()
    }
    try exactSurvivors
      .select(col("doc_id"), col("text_hash"))
      .join(nearDropped, Seq("doc_id"), "left_anti")
      .join(batch.select(col("doc_id"), col("text")), Seq("doc_id"))
      .join(sigs.select(col("id").as("doc_id"), col("sig")), Seq("doc_id"), "left")
      .select("doc_id", "text", "text_hash", "sig")
      .write.mode("overwrite")
      .parquet(s"$historyDir/batch=$batchId")
    // A long-running stream is one unit of work per batch: release THIS
    // batch's signature persist (and only it — a global releaseAll would
    // unpersist a concurrent caller's frames mid-flight).
    finally graft.util.CacheScope.release(sigs)
  }

  def startNearDup(
      docs: DataFrame, historyDir: String, checkpointDir: String,
      minEstJaccard: Double = 0.7): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatchNearDup(batch, historyDir, batchId,
          minEstJaccard = minEstJaccard)
      }
      .start()

  // -------------------------------------------------------------------
  // Embedding frontier (streaming SemDeDup): the third screen of the
  // family — exact hash (d9's face), MinHash lexical (d2's face), and now
  // COSINE similarity in embedding space (e11's face). A new vector lands
  // iff no stored vector in its LSH bucket neighborhood scores
  // cosine >= minCosine. The stored history carries each vector's norm
  // and sign-bit bucket, so — like the near-dup frontier's signatures —
  // the corpus-side geometry is paid ONCE at ingest: screening a batch
  // joins it against (bucket, embedding, nrm), never recomputing history
  // norms or buckets. The batch side probes its own bucket plus every
  // 1-bit flip (the lshTopKMultiProbe recall lever — boundary-straddling
  // near-dups land in a neighboring bucket); the history side stays one
  // bucket per stored vector, so the join is bucket-local and the probe
  // fan-out multiplies only the (small) incoming batch.
  //
  // Within-batch semantics mirror ingestBatchNearDup: EXACT duplicates
  // (identical vectors, via xxhash64 of the array — the md5-of-text
  // convention in embedding space) collapse to the min id; within-batch
  // NEAR duplicates both land and the next batch screens against them —
  // the one-pass frontier compromise.

  private def embSchema =
    "vec_id LONG, embedding ARRAY<FLOAT>, nrm DOUBLE, bucket INT"

  def readEmbHistory(spark: SparkSession, historyDir: String): DataFrame =
    spark.read.schema(embSchema).parquet(historyDir + "/batch=*")

  /** Raw vectors → the stored-history shape (vec_id, embedding, nrm,
    * bucket): the geometry paid once at ingest.
    */
  def annotateEmb(
      df: DataFrame, planes: Seq[Seq[Double]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import graft.similarity.Similarity
    df.select(
      col(idCol).as("vec_id"),
      col(vecCol).as("embedding"),
      Similarity.norm(col(vecCol)).as("nrm"),
      Similarity.lshBucket(col(vecCol), planes).as("bucket"))
  }

  /** The batch face of the embedding cosine screen (e14's oracle surface,
    * d12's report shape in embedding space): for EVERY batch vector, the
    * count of bucket-local history candidates it was scored against, the
    * best cosine among them (null when none), and the screen verdict.
    * Both inputs are in [[annotateEmb]]'s shape; [[ingestBatchEmbDedup]]
    * derives its drop set from this exact function, so the streaming
    * frontier and the batch query can never diverge.
    *
    * Zero-norm vectors are NEVER near-duplicates by convention: the
    * cosine is undefined (0/0 = NaN, which would fail >= minCosine,
    * silently landing every zero vector while screening none), so both
    * sides drop them before the join — a zero-norm batch vector reports
    * n_candidates = 0. Bit-identical zeros still collapse via the
    * ingest's exact-hash step.
    */
  def embScreenReport(
      b: DataFrame, history: DataFrame,
      planes: Seq[Seq[Double]], minCosine: Double): DataFrame = {
    import graft.similarity.Similarity
    val probes = b.filter(col("nrm") > 0)
      .select(col("vec_id"), col("embedding"), col("nrm"),
        explode(array((col("bucket") +: planes.indices.map(i =>
          col("bucket").bitwiseXOR(lit(1 << i)))): _*)).as("bucket"))
    // Each stored vector lives in exactly one bucket and the probe list
    // (own bucket + distinct 1-bit flips) never repeats a bucket, so a
    // (batch, history) pair matches at most once — the count needs no
    // dedup. NaN cosines are impossible past the nrm > 0 filters.
    val cand = history.filter(col("nrm") > 0)
      .select(col("embedding").as("h_vec"), col("nrm").as("h_nrm"), col("bucket"))
      .join(probes, Seq("bucket"))
      .select(col("vec_id"),
        (Similarity.dot(col("embedding"), col("h_vec"))
          / (col("nrm") * col("h_nrm"))).as("cosine"))
    val agg = cand.groupBy("vec_id").agg(
      count(lit(1)).as("n_candidates"), max(col("cosine")).as("best_cosine"))
    b.select("vec_id").join(agg, Seq("vec_id"), "left_outer")
      .select(col("vec_id"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        col("best_cosine"),
        coalesce(col("best_cosine") >= minCosine, lit(false)).as("is_dup"))
  }

  def ingestBatchEmbDedup(
      batch: DataFrame, historyDir: String, batchId: Long,
      planes: Seq[Seq[Double]], minCosine: Double = 0.95,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    require(minCosine > 0.0, s"minCosine must be > 0 (cosine screen), got $minCosine")
    val spark = batch.sparkSession
    val b = graft.util.CacheScope.persist(
      annotateEmb(batch, planes, idCol, vecCol))
    val history = priorBatches(spark, historyDir, batchId, embSchema)
    val dropped = history match {
      case None => spark.range(0).select(col("id").as("vec_id"))
      case Some(h) =>
        embScreenReport(b, h, planes, minCosine)
          .filter(col("is_dup")).select("vec_id")
    }
    try b.join(dropped, Seq("vec_id"), "left_anti")
      .groupBy(xxhash64(col("embedding")).as("__h"))
      .agg(min_by(
        struct(col("vec_id"), col("embedding"), col("nrm"), col("bucket")),
        col("vec_id")).as("r"))
      .select(col("r.vec_id").as("vec_id"), col("r.embedding").as("embedding"),
        col("r.nrm").as("nrm"), col("r.bucket").as("bucket"))
      .write.mode("overwrite")
      .parquet(s"$historyDir/batch=$batchId")
    finally graft.util.CacheScope.release(b)
  }

  def startEmbDedup(
      vecs: DataFrame, historyDir: String, checkpointDir: String,
      planes: Seq[Seq[Double]], minCosine: Double = 0.95): StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatchEmbDedup(batch, historyDir, batchId, planes, minCosine)
      }
      .start()

  // -------------------------------------------------------------------
  // DSIR gate at ingest — the quality-screen sibling of the dedup
  // frontiers: a PRE-TRAINED lambda table (the B-row model
  // Curation.dsirLambdas builds offline from a target domain + reference
  // pool) scores every incoming document map-side, and only docs with
  // log_w >= minLogW land. Unlike the dedup screens the state is STATIC —
  // no growing history to probe, so each micro-batch costs one broadcast
  // equi-join on the bucket id, nothing else. Scoring is
  // Curation.dsirScoreWith — the same code the oracled batch face (c23)
  // runs, so the gate's semantics sit under the DuckDB oracle by
  // construction.

  /** One micro-batch through the DSIR gate: docs scoring >= `minLogW`
    * under `lambdas` land at `historyDir/batch=<batchId>` with their
    * score attached. Replay-idempotent: the dir overwrite depends only on
    * the batch content and the (static) model.
    */
  def ingestBatchDsirGate(
      batch: DataFrame, lambdas: DataFrame, historyDir: String, batchId: Long,
      buckets: Int, salt: String, minLogW: Double = 0.0): Unit = {
    val kept = graft.curation.Curation
      .dsirScoreWith(batch, lambdas, buckets, salt)
      .filter(col("log_w") >= minLogW)
      .select(col("doc_id"), col("log_w"))
    batch.select("doc_id", "text")
      .join(kept, Seq("doc_id"))
      .write.mode("overwrite")
      .parquet(s"$historyDir/batch=$batchId")
  }

  def startDsirGate(
      docs: DataFrame, lambdas: DataFrame, historyDir: String,
      checkpointDir: String, buckets: Int, salt: String,
      minLogW: Double = 0.0): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatchDsirGate(batch, lambdas, historyDir, batchId,
          buckets, salt, minLogW)
      }
      .start()

  def readDsirGated(spark: SparkSession, historyDir: String): DataFrame =
    spark.read.schema("doc_id LONG, text STRING, log_w DOUBLE")
      .parquet(historyDir + "/batch=*")

  // -------------------------------------------------------------------
  // ST10 — streaming distribution-drift monitor: every micro-batch's
  // bucketed KL divergence against a FROZEN reference profile
  // ([[graft.text.CorpusStats.bucketProfile]], trained once offline) is
  // appended to a metrics table — the alarm that catches a crawl gone
  // templated/broken while it is still one batch old. State is STATIC
  // (the B-row profile broadcast); per batch the only corpus-sized work
  // is one token explode. The batch face IS
  // [[graft.text.CorpusStats.klDrift]], so the monitor and any oracled
  // batch analysis can never diverge.

  /** One micro-batch through the drift monitor: (batch_id, n_tokens, kl)
    * written to `metricsDir/batch=<batchId>`. Replay-idempotent: the dir
    * overwrite depends only on the batch content and the frozen profile.
    */
  def ingestBatchDriftMonitor(
      batch: DataFrame, refProfile: DataFrame, metricsDir: String,
      batchId: Long, buckets: Int, salt: String): Unit =
    graft.text.CorpusStats.klDrift(batch, refProfile, buckets, salt)
      .withColumn("batch_id", lit(batchId))
      .select("batch_id", "n_tokens", "kl")
      .write.mode("overwrite")
      .parquet(s"$metricsDir/batch=$batchId")

  def startDriftMonitor(
      docs: DataFrame, refProfile: DataFrame, metricsDir: String,
      checkpointDir: String, buckets: Int, salt: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatchDriftMonitor(batch, refProfile, metricsDir, batchId,
          buckets, salt)
      }
      .start()

  def readDriftMetrics(spark: SparkSession, metricsDir: String): DataFrame =
    spark.read.schema("batch_id LONG, n_tokens LONG, kl DOUBLE")
      .parquet(metricsDir + "/batch=*")

  // -------------------------------------------------------------------
  // ST11 — streaming tokenizer-coverage monitor: every micro-batch's
  // OOV rate and compression under a FROZEN unigram vocabulary
  // ([[graft.text.Unigram.learn]], trained once offline) — the alarm
  // that catches a domain/language shift or an encoding regression
  // while it is one batch old (the OOV words are exactly what the
  // serving tokenizer would byte-fallback or drop). State is STATIC
  // (the vocab literal baked into the native DP expression); per batch
  // the only corpus-sized work is the word count. The batch face IS
  // [[graft.text.Unigram.coverageReport]] (t46's full-oracle surface),
  // so the gauge and the batch analysis can never diverge.

  /** One micro-batch through the coverage monitor: the coverageReport
    * row + batch_id written to `metricsDir/batch=<batchId>`.
    * Replay-idempotent (content-determined overwrite).
    */
  def ingestBatchCoverageMonitor(
      batch: DataFrame, vocab: Seq[(String, Long)], metricsDir: String,
      batchId: Long): Unit =
    graft.text.Unigram.coverageReport(batch, vocab)
      .withColumn("batch_id", lit(batchId))
      .select("batch_id", "n_docs", "n_words", "n_covered_words",
        "n_oov_words", "oov_rate", "covered_pieces", "pieces_per_covered_word")
      .write.mode("overwrite")
      .parquet(s"$metricsDir/batch=$batchId")

  def startCoverageMonitor(
      docs: DataFrame, vocab: Seq[(String, Long)], metricsDir: String,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatchCoverageMonitor(batch, vocab, metricsDir, batchId)
      }
      .start()

  def readCoverageMetrics(spark: SparkSession, metricsDir: String): DataFrame =
    spark.read.schema("batch_id LONG, n_docs LONG, n_words LONG, " +
        "n_covered_words LONG, n_oov_words LONG, oov_rate DOUBLE, " +
        "covered_pieces LONG, pieces_per_covered_word DOUBLE")
      .parquet(metricsDir + "/batch=*")

  // -------------------------------------------------------------------
  // ST12 — streaming perplexity monitor: every micro-batch's one-row
  // Kneser–Ney screen report under a FROZEN model
  // ([[graft.text.NgramLm.knModel]], trained once offline on the
  // trusted slice) — the alarm that catches a crawl drifting into
  // gibberish/boilerplate/wrong-language while it is one batch old,
  // with the model-based CE the heuristic screens (length, stopwords,
  // entropy) cannot see. State is STATIC (three narrow count tables +
  // the one-row T total); per batch the corpus-sized work is one
  // bigram explode + equi-joins. The batch face IS
  // [[graft.text.NgramLm.knScreenReport]] (t49b's full-oracle
  // surface), so the gauge and the batch analysis can never diverge.

  /** One micro-batch through the perplexity monitor: the knScreenReport
    * row + batch_id written to `metricsDir/batch=<batchId>`.
    * Replay-idempotent (content-determined overwrite).
    */
  def ingestBatchKnMonitor(
      batch: DataFrame, model: graft.text.NgramLm.KnModel,
      maxCrossEntropy: Double, metricsDir: String, batchId: Long): Unit =
    graft.text.NgramLm.knScreenReport(batch, model, maxCrossEntropy)
      .withColumn("batch_id", lit(batchId))
      .select("batch_id", "n_docs", "n_scored", "n_rejected",
        "n_bigrams", "n_unseen", "corpus_cross_entropy")
      .write.mode("overwrite")
      .parquet(s"$metricsDir/batch=$batchId")

  def startKnMonitor(
      docs: DataFrame, model: graft.text.NgramLm.KnModel,
      maxCrossEntropy: Double, metricsDir: String,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatchKnMonitor(batch, model, maxCrossEntropy, metricsDir, batchId)
      }
      .start()

  def readKnMetrics(spark: SparkSession, metricsDir: String): DataFrame =
    spark.read.schema("batch_id LONG, n_docs LONG, n_scored LONG, " +
        "n_rejected LONG, n_bigrams LONG, n_unseen LONG, " +
        "corpus_cross_entropy DOUBLE")
      .parquet(metricsDir + "/batch=*")
}
