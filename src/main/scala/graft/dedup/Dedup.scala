package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Deduplication strategies for training-data pipelines, ordered by cost:
  *
  *  - [[exact]] — hash-groupBy, one shuffle on the text hash; the 100 TB
  *    workhorse (group on md5, not the text itself, so shuffle rows are
  *    small).
  *  - [[minhashLshPairs]] — near-dup candidates via MinHash banding; cost is
  *    one shuffle on (band, hash) + a bucket-local self-join. Never compares
  *    all pairs.
  *  - [[simhashPairs]] — 64-bit SimHash with a prefix-blocking join; hamming
  *    distance within blocks only.
  *  - [[jaccardShinglePairs]] — exact shingle-set Jaccard via an inverted-
  *    index join; quadratic in per-shingle document frequency, so use on
  *    samples/verification, not the full corpus.
  */
object Dedup {

  /** Exact dedup: one survivor (min id) per identical text.
    *
    * Grouping on md5(text) keeps shuffle rows small; the tradeoff is that
    * an md5 COLLISION (never observed by chance at any realistic corpus
    * size, but constructible adversarially — md5 is cryptographically
    * broken) would merge two distinct documents. If the corpus is
    * attacker-supplied and that matters, group on (xxhash64(text),
    * md5(text)) or a 128/256-bit hash instead; parity with the reference
    * needs only the md5 behavior.
    */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol), md5(col(textCol)).as("text_hash"))
      .groupBy("text_hash")
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .select(idCol, "text_hash", "n_copies")

  /** Incremental exact dedup — the daily-crawl shape: a new BATCH arrives
    * and must be deduplicated both against the already-ingested HISTORY
    * and within itself, without ever rescanning history text. Survivors
    * are batch documents whose text hash has no history occurrence, one
    * per hash (min id), i.e. exactly the rows [[exact]] over
    * history-union-batch would newly admit.
    *
    * Shape at scale: both sides reduce to (id, md5) projections before
    * anything shuffles — history text is never read past its hash column
    * (store the hash at ingest and the scan prunes to one column), batch
    * text never shuffles at all. The anti-join and the min-id election
    * both key on the hash, so AQE plans them off the same statistics; no
    * broadcast assumption on either side (history is the BIG side here —
    * the opposite regime from a dimension join).
    *
    * Null contract: null-text rows are unhashable and EXCLUDED from both
    * sides up front. Without the filter, a null batch md5 survives the
    * left_anti (null never equals a history hash) while SQL `NOT IN`
    * semantics drop it — the d9 oracle and this operator would silently
    * disagree the day a crawl ships null bodies. Empty text is a real
    * hashable value and dedups normally.
    */
  def incrementalExact(
      batch: DataFrame,
      history: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    incrementalExactAgainstHashes(
      batch,
      history.filter(col(textCol).isNotNull)
        .select(md5(col(textCol)).as("text_hash")),
      idCol, textCol)

  /** [[incrementalExact]] with the history side ALREADY reduced to its
    * `text_hash` column — the landed-corpus regime where the hash was
    * stored at ingest ([[graft.streaming.CorpusIngest]]), so the history
    * scan never touches text at all (column pruning reaches the parquet
    * reader; CorpusIngestSpec pins the plan).
    */
  def incrementalExactAgainstHashes(
      batch: DataFrame,
      historyHashes: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val batchHashed = batch
      .filter(col(textCol).isNotNull)
      .select(col(idCol), md5(col(textCol)).as("text_hash"))
    batchHashed
      .join(historyHashes.select("text_hash").distinct(), Seq("text_hash"), "left_anti")
      .groupBy("text_hash")
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_batch_copies"))
      .select(idCol, "text_hash", "n_batch_copies")
  }

  /** Incremental NEAR-dup screening — [[incrementalExact]]'s fuzzy sibling,
    * the other half of the daily-crawl shape: every batch document scored
    * against the already-ingested history by exact shingle-set Jaccard,
    * reporting its candidate count, best match score, and a drop flag.
    * Batch docs sharing no shingle with history come through with zero
    * candidates (never silently vanish — this is a REPORT over the whole
    * batch, the caller drops `is_dup`).
    *
    * Shape at scale: both sides reduce to (id, shingle) inverted indexes
    * before the join — the candidate join is batch-index x history-index
    * on the shingle key, never batch x history. `maxDocFreq` caps the
    * HISTORY side's document frequency (boilerplate shingles that would
    * make join buckets quadratic are dropped from the probe index, as in
    * [[jaccardShinglePairs]]); at real scale the history index and sizes
    * are precomputed at ingest and only the batch side is built fresh.
    * Reported jaccard under a cap is a lower bound of the exact value.
    *
    * Determinism: every jaccard is ONE IEEE division of exact integers,
    * and `max` over them is order-invariant, so the report is
    * partition-stable and oracle-checkable. Null-text rows are excluded
    * from both sides up front ([[incrementalExact]]'s null contract).
    */
  def incrementalNearDup(
      batch: DataFrame,
      history: DataFrame,
      shingleN: Int = 3,
      threshold: Double = 0.5,
      maxDocFreq: Option[Int] = None,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // Too-short filter on the TOKEN count, before shingling: size(toks) >=
    // n iff the doc has shingles, and a shingle-array emptiness filter
    // would rebuild the whole array per row under predicate pushdown (the
    // minhashSignatures lesson).
    def index(docs: DataFrame): DataFrame = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= shingleN)
      .select(col("id"),
        array_distinct(TextFunctions.shinglesFromTokens(col("toks"), shingleN)).as("shingles"))
    val bsh = graft.util.CacheScope.persist(index(batch))
    val hsh = graft.util.CacheScope.persist(index(history))
    val bSizes = bsh.select(col("id"), size(col("shingles")).cast("long").as("n_b"))
    val hSizes = hsh.select(col("id").as("hid"), size(col("shingles")).cast("long").as("n_h"))
    val bInv = bsh.select(col("id"), explode(col("shingles")).as("shingle"))
    val hInvAll = hsh.select(col("id").as("hid"), explode(col("shingles")).as("shingle"))
    val hInv = maxDocFreq.fold(hInvAll) { cap =>
      val keep = hInvAll.groupBy("shingle").agg(count(lit(1)).as("__df"))
        .filter(col("__df") <= cap).select("shingle")
      hInvAll.join(keep, "shingle")
    }
    val best = bInv.join(hInv, Seq("shingle"))
      .groupBy("id", "hid")
      .agg(count(lit(1)).as("n_common"))
      .join(bSizes, "id")
      .join(hSizes, "hid")
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("n_b") + col("n_h") - col("n_common")))
      .groupBy("id")
      .agg(count(lit(1)).as("n_candidates"), max(col("jaccard")).as("best_jaccard"))
    batch
      .filter(col(textCol).isNotNull)
      .select(col(idCol))
      .join(best, col(idCol) === best("id"), "left")
      .select(
        col(idCol),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        col("best_jaccard"),
        coalesce(col("best_jaccard") >= threshold, lit(false)).as("is_dup"))
  }

  /** N-gram novelty scoring — the third face of the incremental family
    * (exact: [[incrementalExact]], fuzzy: [[incrementalNearDup]]): per
    * batch document, what FRACTION of its shingles has never been seen in
    * history. Near-dups score near 0, fresh prose near 1, remixes in
    * between — the data-valuation signal for "is this crawl worth
    * ingesting" and novelty-weighted sampling.
    *
    * Shape at scale: history reduces to its DISTINCT shingle set once
    * (store it at ingest like the hashes and this is a pure join); the
    * batch index left-joins it and one map-side-combined rollup emits
    * (id, n_grams, n_novel). One IEEE division per doc at the end. Docs
    * too short to shingle report 0/0 with a null fraction (nothing to
    * judge); null-text rows are excluded per the family's contract.
    */
  def ngramNovelty(
      batch: DataFrame,
      history: DataFrame,
      shingleN: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    def shingled(docs: DataFrame): DataFrame = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("toks"))
      .select(col("id"),
        explode(array_distinct(TextFunctions.shinglesFromTokens(col("toks"), shingleN)))
          .as("shingle"))
    val seen = shingled(history).select("shingle").distinct()
      .withColumn("__seen", lit(true))
    val scored = shingled(batch)
      .join(seen, Seq("shingle"), "left")
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("__seen").isNull, 1L).otherwise(0L)).as("n_novel"))
    batch
      .filter(col(textCol).isNotNull)
      .select(col(idCol))
      .join(scored, col(idCol) === scored("id"), "left")
      .select(
        col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        (col("n_novel").cast("double") / col("n_grams")).as("novelty_frac"))
  }

  /** MinHash signatures, computed ROW-LOCALLY by the native codegen
    * [[org.apache.spark.sql.graftnative.MinHashSig]] (rehash family):
    * one pass over each document's shingles maintaining the k running
    * minima in a primitive array — NO explode and NO shuffle, where the
    * historical explode + groupBy form paid a corpus-sized aggregation
    * shuffle per signature build (its values are preserved bit-for-bit:
    * hash the shingle string once to a long, then fold each seed with the
    * cheap fixed-width hash — the d2 golden and every stored frontier
    * signature pin this family, and DedupSpec pins the
    * estimate-vs-exact-Jaccard property). The interpreted nested
    * `transform(seeds, s -> array_min(transform(shingles, ...)))` HOF form
    * this replaces at the plan level measured 100× slower at sf0.1 —
    * codegen is what makes the row-local shape viable.
    * Docs with no shingles (shorter than n words) drop out, matching the
    * reference semantics of "too short to fingerprint". (array_distinct
    * is gone: duplicate shingles cannot change a min.)
    */
  def minhashSignatures(
      docs: DataFrame, k: Int = 32, shingleN: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      // Stage the token array as a REAL column before shingling: the
      // shingle expression references its input per slice, and a raw
      // split(text) there re-runs the split once per shingle per row
      // (the shinglesFromTokens contract). The too-short filter tests the
      // TOKEN count, not the shingle array — size(toks) >= n iff the doc
      // has shingles, and predicate pushdown substitutes the filtered
      // alias into the predicate, so a shingle-array filter would rebuild
      // the whole array per row just to test emptiness.
      .select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= shingleN)
      .select(
        col("id"),
        TextFunctions.shinglesFromTokens(col("__toks"), shingleN).as("__sh"))
      .select(col("id"),
        org.apache.spark.sql.graftnative.MinHashSig(col("__sh"), k, rehash = true)
          .as("sig"))

  /** MinHash+LSH near-duplicate candidate pairs with estimated Jaccard.
    * k = signature length, bands = LSH bands (rows per band = k/bands).
    * Candidate ids are deduped across bands *before* signatures are joined
    * back, so the wide sig arrays never ride through the bucket join.
    */
  def minhashLshPairs(
      docs: DataFrame, k: Int = 32, bands: Int = 8, shingleN: Int = 3,
      minEstJaccard: Double = 0.5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // The sig table feeds three consumers (banding + both pair-side
    // rejoins); without persistence each broadcast build side recomputes
    // the whole shingle->hash->aggregate pipeline (ReusedExchange never
    // fires on BroadcastExchange subtrees), measured ~4x the sig cost per
    // query. Sigs are (id, k longs) — tiny next to the corpus — so
    // MEMORY_AND_DISK is safe; Spark evicts LRU in long sessions.
    val sigs = graft.util.CacheScope.persist(
      minhashSignatures(docs, k, shingleN, idCol, textCol))
    val banded = sigs.select(
      col("id"),
      posexplode(TextFunctions.minhashBands(col("sig"), k, bands)).as(Seq("band", "band_hash")))
    // Self-join via alias, renaming AFTER: both sides are the identical
    // subplan, so the bucket shuffle is planned once and the second side
    // becomes a ReusedExchange — at corpus scale that halves the banding
    // shuffle (a per-side rename before the join would instead plan two
    // distinct exchanges over the same data).
    val candidates = banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.band_hash") === col("y.band_hash") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    candidates
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        TextFunctions.minhashJaccardEstimate(col("sig_a"), col("sig_b"), k).as("est_jaccard"))
      .filter(col("est_jaccard") >= minEstJaccard)
  }

  /** SimHash near-duplicate pairs: pigeonhole-blocked hamming join. The 64
    * bits split into `maxHamming + 1` segments; any pair within the budget
    * agrees exactly on >=1 segment, so the per-(segment, key) self-join has
    * guaranteed recall while never comparing all pairs. Candidates that
    * collide on several segments are deduped after the hamming filter.
    */
  /** Packed SimHash per document, ROW-LOCAL via the native codegen
    * [[org.apache.spark.sql.graftnative.SimHashPack]] (the
    * [[minhashSignatures]] move): the historical explode + 65-aggregate
    * groupBy shuffle per build is gone from the plan, and the values are
    * preserved bit-for-bit — one xxhash64 vote per TOKEN OCCURRENCE
    * (duplicates count), majority strictly over half — as the d3 golden
    * and DedupSpec's cross-check against the HOF form pin. Null-text docs
    * drop out (the explode form emitted no rows for them).
    */
  def simhashBitVectors(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .filter(col(textCol).isNotNull)
      .select(
        col(idCol).as("id"),
        org.apache.spark.sql.graftnative.SimHashPack(
          TextFunctions.tokens(col(textCol))).as("bits"))

  def simhashPairs(
      docs: DataFrame, maxHamming: Int = 6,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val nBlocks = maxHamming + 1
    // Same reuse rationale as minhashLshPairs: one 8-byte vector per doc,
    // three consumers.
    val sh = graft.util.CacheScope.persist(
      simhashBitVectors(docs, idCol, textCol))
    // Persisted: the blocked-key table is BOTH legs of the candidate
    // self-join — without it the block-key explode over the cached
    // vectors runs once per leg (guide §2.4; the DedupEval screens
    // persist their blocked keys for the same reason). nBlocks·N rows.
    val blocked = graft.util.CacheScope.persist(sh.select(
      col("id"),
      posexplode(TextFunctions.simhashBlockKeys(col("bits"), nBlocks)).as(Seq("blk", "blk_key"))))
    // Same exchange-reuse shape as minhashLshPairs: alias self-join first,
    // rename after, so the block shuffle is planned once.
    val candidates = blocked.as("x")
      .join(blocked.as("y"),
        col("x.blk") === col("y.blk") && col("x.blk_key") === col("y.blk_key") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    candidates
      .join(sh.select(col("id").as("id_a"), col("bits").as("bits_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("bits").as("bits_b")), "id_b")
      .withColumn("hamming", TextFunctions.hamming(col("bits_a"), col("bits_b")).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Winnowing (rolling-hash) fingerprints per document, with each layer —
    * tokens, shingles, k-gram hashes — materialized as a column so the
    * window-min step reads bound arrays instead of re-deriving the whole
    * chain per window (the expression-inline form is O(windows x build) per
    * row; this is O(windows x w)).
    */
  def winnowingFingerprints(
      docs: DataFrame, k: Int = 5, w: Int = 4,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("toks"))
      .select(col("id"), TextFunctions.shinglesFromTokens(col("toks"), k).as("sh"))
      .select(col("id"), transform(col("sh"), x => xxhash64(x)).as("hashes"))
      .select(col("id"), TextFunctions.winnowFromHashes(col("hashes"), w).as("fps"))

  /** Exact n-gram (shingle) Jaccard pairs >= threshold, via inverted index:
    * explode distinct shingles -> self-join on shingle -> count intersections
    * -> Jaccard from |A|,|B|,|A∩B|.
    *
    * `maxDocFreq` is the scale knob: the self-join is quadratic in each
    * shingle's document frequency, so at corpus scale ultra-common shingles
    * (boilerplate, stopword runs) dominate cost while contributing almost no
    * discrimination. Capping df bounds every join bucket at maxDocFreq² —
    * the standard inverted-index skew guard. None (default) keeps the exact
    * oracle-checkable semantics.
    *
    * Duplicate-heavy corpora are the remaining quadratic face (every copy
    * pair shares EVERY shingle, and copies inflate df without tripping a
    * per-copy cap): run [[exact]] dedup first and feed this the survivors —
    * the pipeline order the ScaleProbe numbers assume.
    */
  def jaccardShinglePairs(
      docs: DataFrame, shingleN: Int = 3, threshold: Double = 0.5,
      maxDocFreq: Option[Int] = None,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    shinglePairCounts(docs, shingleN, maxDocFreq, idCol, textCol)
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("n_a") + col("n_b") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "n_common", "n_a", "n_b", "jaccard")

  /** Exact shingle CONTAINMENT pairs (Broder 1997): directional
    * |A∩B|/|A| and |A∩B|/|B|, kept where either direction reaches the
    * threshold — the "document A is a quote/excerpt/subset of B" detector
    * Jaccard structurally misses: a 15-token excerpt of a 200-token doc
    * has containment 1.0 but Jaccard ~0.07, far below any sane dedup
    * threshold. Same inverted-index core and df-cap scale knob as
    * [[jaccardShinglePairs]].
    */
  def containmentShinglePairs(
      docs: DataFrame, shingleN: Int = 3, threshold: Double = 0.9,
      maxDocFreq: Option[Int] = None,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val ca = col("n_common").cast("double") / col("n_a")
    val cb = col("n_common").cast("double") / col("n_b")
    shinglePairCounts(docs, shingleN, maxDocFreq, idCol, textCol)
      .withColumn("cont_a_in_b", ca)
      .withColumn("cont_b_in_a", cb)
      .filter(greatest(col("cont_a_in_b"), col("cont_b_in_a")) >= threshold)
      .select("id_a", "id_b", "n_common", "n_a", "n_b",
        "cont_a_in_b", "cont_b_in_a")
  }

  /** The shared inverted-index core of [[jaccardShinglePairs]] /
    * [[containmentShinglePairs]]: (id_a, id_b, n_common, n_a, n_b) for
    * every pair sharing at least one (df-surviving) distinct shingle.
    */
  private def shinglePairCounts(
      docs: DataFrame, shingleN: Int, maxDocFreq: Option[Int],
      idCol: String, textCol: String): DataFrame = {
    // Persisted for the same broadcast-recompute reason as minhashLshPairs:
    // the index feeds the self-join's both sides, the df cap, and the
    // per-doc sizes — without it the shingle pipeline re-runs per consumer.
    // Token-count too-short filter before shingling — a shingle-array
    // emptiness filter would rebuild the array per row under predicate
    // pushdown (the minhashSignatures lesson).
    val sh = graft.util.CacheScope.persist(docs
      .select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= shingleN)
      .select(
        col("id"),
        array_distinct(TextFunctions.shinglesFromTokens(col("toks"), shingleN)).as("shingles")))
    val sizes = sh.select(col("id"), size(col("shingles")).cast("long").as("n_sh"))
    val invAll = graft.util.CacheScope.persist(
      sh.select(col("id"), explode(col("shingles")).as("shingle")))
    val inv = maxDocFreq.fold(invAll) { cap =>
      // Persist the SURVIVOR shingle set (vocabulary-sized), not the
      // capped index (corpus-sized): both self-join legs re-derive
      // inv = invAll ⋈ keep from cache, but without this the df
      // aggregation over the whole index ran once PER LEG (guide §2.4 —
      // d5's plan dup).
      val keep = graft.util.CacheScope.persist(
        invAll.groupBy("shingle").agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= cap).select("shingle"))
      invAll.join(keep, "shingle")
    }
    val common = inv.as("x").join(inv.as("y"), Seq("shingle"))
      .filter(col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
  }
}
