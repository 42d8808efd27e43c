package graft.curation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextFunctions
import graft.util.CacheScope.CheckpointOps

/** Corpus-curation operators a training-data pipeline runs between raw
  * ingestion and tokenization: deterministic sampling (plain + per-source
  * mixture weighting), sequence packing (concat-and-chunk layout), eval-set
  * decontamination, and repetition signals. All pure DataFrame declarations —
  * Catalyst sees every filter and the parquet scan prunes accordingly.
  *
  * Determinism is the design center: every sampling decision is a hash of
  * the row's identity, never `rand()`. At 100 TB a sample must be stable
  * across reruns, retries, and repartitioning — a task that retries with
  * `rand()` silently changes the corpus; a hash never does. It also gives
  * free coordinated sampling: the same (id, salt) keeps or drops a row in
  * every derived dataset.
  */
object Curation {

  /** Deterministic bucket in [0, buckets): an md5-derived integer of the
    * salted id. md5 (not xxhash64) so the DuckDB oracle can compute the
    * identical value; 8 hex chars = 32 bits of hash, far more than any
    * realistic bucket count needs. The tiny modulo bias (2^32 % buckets
    * residue) shifts bucket probabilities by < 1e-7 — irrelevant for
    * sampling; use a power-of-two bucket count if exactness ever matters.
    */
  def hashBucket(id: Column, buckets: Int, salt: String): Column = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    conv(substring(md5(concat(lit(salt), id.cast("string"))), 1, 8), 16, 10)
      .cast("long") % buckets
  }

  /** Keep ~keepPct% of rows, decided per-row by [[hashBucket]]. */
  def hashSample(df: DataFrame, idCol: String, keepPct: Int, salt: String): DataFrame = {
    require(keepPct >= 0 && keepPct <= 100, s"keepPct out of range: $keepPct")
    df.filter(hashBucket(col(idCol), 100, salt) < keepPct)
  }

  /** Representativeness eval of the [[hashSample]] screen — the
    * sampling family's measurement face: per-source corpus count vs
    * in-sample count, plus the pooled `__all` row, so "is the
    * deterministic md5 sample source-unbiased?" is a read-off instead
    * of an assumption. `excess_per_100` is the EXACT integer deviation
    * 100·n_sample − keepPct·n_corpus (positive = that source is
    * oversampled relative to the nominal rate — zero would be a
    * perfectly proportional draw); `sample_rate` is the one IEEE
    * division. A source whose ids correlate with the hash would show
    * here before it silently skewed every downstream mixture.
    *
    * Shape at scale: one map-side-combined count rollup per level over
    * a boolean projection — corpus-linear, no joins, no windows.
    */
  def sampleRepresentativeness(
      df: DataFrame, keepPct: Int, salt: String,
      idCol: String = "doc_id", sourceCol: String = "source"): DataFrame = {
    require(keepPct >= 0 && keepPct <= 100, s"keepPct out of range: $keepPct")
    val flagged = df.select(col(sourceCol).as("source"),
      when(hashBucket(col(idCol), 100, salt) < keepPct, 1L).otherwise(0L)
        .as("__in"))
    val per = flagged.groupBy("source")
      .agg(count(lit(1)).as("n_corpus"), sum(col("__in")).as("n_sample"))
    val pooled = flagged
      .agg(count(lit(1)).as("n_corpus"), sum(col("__in")).as("n_sample"))
      .select(lit("__all").as("source"), col("n_corpus"), col("n_sample"))
    per.unionByName(pooled)
      .select(
        col("source"), col("n_corpus"), col("n_sample"),
        (col("n_sample").cast("double") / col("n_corpus")).as("sample_rate"),
        (lit(100L) * col("n_sample") - lit(keepPct.toLong) * col("n_corpus"))
          .as("excess_per_100"))
      .orderBy("source")
  }

  /** [[sampleRepresentativeness]]'s exact-deviation audit extended to
    * the QUOTA sampler (r14 verdict #6 — closes the sampling family
    * symmetrically): per group, the corpus count, the count actually
    * emitted by [[stratifiedSample]] under the same (nPerGroup, salt),
    * and the deviation from the quota min(n_corpus, nPerGroup). The
    * quota is exact BY CONSTRUCTION, so this audit proves the
    * IMPLEMENTATION (a nonzero deviation is a bug — a dropped group, a
    * heap that kept the wrong count), not the estimator; `grid` = 1
    * aligns the schema with [[weightedSampleAudit]] so one face unions
    * both. Shape: two small per-group rollups broadcast-joined — the
    * sampler's own cost dominates.
    */
  def stratifiedSampleAudit(
      df: DataFrame, groupCol: String, idCol: String, nPerGroup: Int,
      salt: String): DataFrame = {
    val sizes = df.groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n_corpus"))
    val sampled = stratifiedSample(df, groupCol, idCol, nPerGroup, salt)
      .groupBy(col(groupCol).as("grp")).agg(count(lit(1)).as("n_sample"))
    val quota = least(col("n_corpus"), lit(nPerGroup.toLong))
    sizes.join(sampled, Seq("grp"), "left")
      .select(
        lit("stratified").as("sampler"), col("grp"),
        col("n_corpus"),
        coalesce(col("n_sample"), lit(0L)).as("n_sample"),
        lit(1L).as("grid"),
        quota.as("expected_grid"),
        (coalesce(col("n_sample"), lit(0L)) - quota).as("deviation"))
  }

  /** The same audit for the per-row WEIGHTED sampler: per source, the
    * corpus count, [[weightedSample]]'s kept count under the same
    * (weightCol, salt), and the EXACT integer deviation on the
    * sampler's own 1/10000 grid — deviation = 10000·n_sample −
    * Σ floor(w·10000) (zero = the hash draw hit every source's nominal
    * expectation exactly; the magnitude is hash luck, surfaced before
    * it skews a downstream mixture — c29's reading, at grid 10⁴).
    * One scan, one rollup; the keep decision replicates
    * [[weightedSample]] term for term.
    */
  def weightedSampleAudit(
      df: DataFrame, idCol: String, weightCol: String, sourceCol: String,
      salt: String): DataFrame = {
    val thr = floor(
      least(lit(1.0), greatest(lit(0.0), col(weightCol))) * 10000).cast("int")
    val flagged = df.select(
      col(sourceCol).as("grp"), thr.as("__thr"),
      when(hashBucket(col(idCol), 10000, salt) < thr, 1L).otherwise(0L)
        .as("__in"))
    flagged.groupBy("grp")
      .agg(
        count(lit(1)).as("n_corpus"),
        sum(col("__in")).as("n_sample"),
        sum(col("__thr").cast("long")).as("expected_grid"))
      .select(
        lit("weighted").as("sampler"), col("grp"), col("n_corpus"),
        col("n_sample"), lit(10000L).as("grid"), col("expected_grid"),
        (lit(10000L) * col("n_sample") - col("expected_grid"))
          .as("deviation"))
  }

  /** The same audit for the per-source MIXTURE sampler: expected =
    * n_corpus·thr(source) on the 1/10000 grid (the rate is constant
    * within a source, so the expectation is exact arithmetic), and the
    * deviation is again pure hash luck. With [[stratifiedSampleAudit]]
    * and [[weightedSampleAudit]] this closes the audit over every
    * sampler in the family (c1's flat rate is c29's own face).
    */
  def mixtureSampleAudit(
      df: DataFrame, sourceCol: String, idCol: String,
      rates: Map[String, Double], salt: String): DataFrame = {
    require(rates.values.forall(r => r >= 0.0 && r <= 1.0), "rates must be in [0,1]")
    val thresholds: Map[String, Int] = rates.map { case (k, v) => k -> (v * 10000).toInt }
    val thr = coalesce(
      element_at(typedLit(thresholds), col(sourceCol)), lit(0))
    df.select(col(sourceCol).as("grp"), thr.as("__thr"),
        when(hashBucket(col(idCol), 10000, salt) < thr, 1L).otherwise(0L)
          .as("__in"))
      .groupBy("grp")
      .agg(
        count(lit(1)).as("n_corpus"),
        sum(col("__in")).as("n_sample"),
        sum(col("__thr").cast("long")).as("expected_grid"))
      .select(
        lit("mixture").as("sampler"), col("grp"), col("n_corpus"),
        col("n_sample"), lit(10000L).as("grid"), col("expected_grid"),
        (lit(10000L) * col("n_sample") - col("expected_grid"))
          .as("deviation"))
  }

  /** Mixture weighting: down-sample each source to its configured rate
    * (0.0..1.0 fraction kept), the "20% web, 40% code, …" recipe step.
    * Rates resolve through a map literal — a broadcast-free constant in the
    * plan — and the keep decision is the same deterministic hash as
    * [[hashSample]] at 1/10000 resolution. Sources absent from `rates` are
    * dropped (rate 0). Rates are truncated to the 1/10000 grid at
    * construction so engines compare integers, never floats.
    */
  def mixtureSample(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      rates: Map[String, Double],
      salt: String): DataFrame = {
    require(rates.values.forall(r => r >= 0.0 && r <= 1.0), "rates must be in [0,1]")
    val thresholds: Map[String, Int] = rates.map { case (k, v) => k -> (v * 10000).toInt }
    val thr = coalesce(
      element_at(typedLit(thresholds), col(sourceCol)), lit(0))
    df.filter(hashBucket(col(idCol), 10000, salt) < thr)
  }

  /** PER-ROW weighted sampling: each row kept with probability equal to
    * its own weight column (clamped to [0,1]) — the importance-sampling
    * step that keeps high-quality documents preferentially while staying
    * rerun/retry/partition deterministic. The weight resolves to the same
    * 1/10000 integer grid as [[mixtureSample]] (floor is IEEE-exact on
    * both engines), compared against the salted md5 bucket of the id —
    * one scan, no shuffle, and a row's fate never depends on any other
    * row.
    */
  def weightedSample(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      salt: String): DataFrame = {
    val thr = floor(
      least(lit(1.0), greatest(lit(0.0), col(weightCol))) * 10000).cast("int")
    df.filter(hashBucket(col(idCol), 10000, salt) < thr)
  }

  /** Token-budget mixture with EPOCHS: [[mixtureSample]] generalized to
    * rates above 1.0 — the "up-weight high-quality sources" recipe step,
    * where a source sampled at 2.3 epochs emits each row 2 times plus a
    * deterministic 30% chance of a third. Every row comes back with an
    * `epoch` column (0..reps-1) so downstream packing/shuffling can keep
    * the repeats apart; rate <= 1.0 degenerates to [[mixtureSample]] with
    * epoch 0. Same md5 grid as every sampler here: rerun/retry/partition
    * stable, and the fractional keep set at rate 2.3 is EXACTLY the keep
    * set of rate 0.3 — coordinated across recipe revisions.
    *
    * Scale shape: one scan, a generator explode bounded by ceil(rate) per
    * row, no shuffle at all — the explode multiplies rows in place and the
    * downstream writer's partitioning deals with volume.
    */
  def mixtureSampleEpochs(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      rates: Map[String, Double],
      salt: String): DataFrame = {
    require(rates.values.forall(_ >= 0.0), "rates must be >= 0")
    // One integer per source on the 1/10000 grid: whole epochs = tot/10000,
    // fractional keep threshold = tot%10000 — engines compare integers.
    val totals: Map[String, Int] = rates.map { case (k, v) => k -> (v * 10000).toInt }
    val tot = coalesce(element_at(typedLit(totals), col(sourceCol)), lit(0))
    val reps = (floor(tot / 10000) +
      when(hashBucket(col(idCol), 10000, salt) < tot % 10000, 1L).otherwise(0L))
      .cast("long")
    df.withColumn("__reps", reps)
      .filter(col("__reps") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("__reps") - 1)))
      .drop("__reps")
  }

  /** Deterministic global training-order shuffle: every row keyed by
    * `shuffle_key` = md5(salt || id) — a uniform, reproducible total order
    * with no `rand()` anywhere — and assigned the output shard owning its
    * key range (`shard` = the key's first 32 bits scaled to nShards, so
    * shards are CONTIGUOUS slices of the global order: reading shard files
    * in index order replays the exact shuffled sequence). The returned
    * frame is range-partitioned and sorted by the key, i.e. ready for a
    * partitioned write; re-running at any parallelism reproduces the same
    * order and the same shard assignment.
    */
  def deterministicShuffle(
      df: DataFrame,
      idCol: String,
      salt: String,
      nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val keyed = df.withColumn("shuffle_key",
      md5(concat(lit(salt), col(idCol).cast("string"))))
    // first 8 hex chars = top 32 bits; v * nShards / 2^32 is exact in a
    // double (numerator < 2^53), so floor is the true range index.
    val v = conv(substring(col("shuffle_key"), 1, 8), 16, 10).cast("long")
    keyed
      .withColumn("shard", floor(v * nShards / lit(4294967296L)).cast("int"))
      .repartitionByRange(nShards, col("shuffle_key"))
      .sortWithinPartitions("shuffle_key")
  }

  /** Concat-and-chunk sequence packing — the standard LLM pre-training
    * layout: documents within a shard are concatenated in a deterministic
    * order and the token stream is cut every `seqLen` tokens. This computes
    * each document's placement (global start offset, first/last sequence
    * index, offset within the first sequence) as one window cumsum per
    * shard — no driver loop, no state.
    *
    * Parallelism = number of shards: the window partitions by `shardCol`,
    * so shards pack independently exactly like per-worker packing in a
    * streaming tokenizer. Shard by file/source/bucket at 100 TB — never
    * pack a whole corpus as one global window (one partition would own
    * every row).
    */
  def packSequences(
      df: DataFrame,
      shardCol: String,
      orderCol: String,
      nTokensCol: String,
      seqLen: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val w = Window.partitionBy(shardCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("start_tok", coalesce(sum(col(nTokensCol)).over(w), lit(0L)))
      .withColumn("first_seq", floor(col("start_tok") / seqLen))
      .withColumn("tok_offset", col("start_tok") % seqLen)
      .withColumn("end_seq",
        floor((col("start_tok") + col(nTokensCol) - 1) / seqLen))
  }

  /** Stratified sampling with EXACT per-group quotas: the `nPerGroup`
    * documents of each group with the smallest md5-of-salted-id — the
    * "exactly 1,000 docs per source for the eval slice" step, where
    * [[mixtureSample]]'s proportional keep is not enough. Deterministic
    * like every sampler here (rerun/retry/partition-stable), and the same
    * (salt, id) ordering ranks consistently across derived datasets.
    *
    * Shape at scale: a bounded-heap top-k AGGREGATE per group (the ANN
    * top-k expression), not a `row_number` window — the window form
    * funnels each group's full membership into one task, while the heap
    * caps shuffle traffic at nPerGroup rows per mapper per group. Returns
    * (group, id, rk) with rk = 1..nPerGroup in hash order; callers join
    * back by id for full rows.
    */
  def stratifiedSample(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      nPerGroup: Int,
      salt: String): DataFrame = {
    require(nPerGroup > 0, s"nPerGroup must be positive, got $nPerGroup")
    val item = struct(
      md5(concat(lit(salt), col(idCol).cast("string"))).as("h"),
      col(idCol).as("id"))
    df.select(col(groupCol), item.as("__item"))
      .groupBy(groupCol)
      .agg(org.apache.spark.sql.graftnative.TopK
        .collectTopK(col("__item"), nPerGroup, reverse = true).as("__top"))
      .select(col(groupCol), posexplode(array_sort(col("__top"))).as(Seq("__pos", "__it")))
      .select(
        col(groupCol),
        col("__it.id").as(idCol),
        (col("__pos") + 1).cast("long").as("rk"))
  }

  /** Packing-efficiency report: per shard, how many sequences the
    * concat-and-chunk layout emits and how much of the final sequence is
    * padding — the "what does this seqLen cost me" number a training
    * pipeline tunes against. Pure per-shard aggregate arithmetic (no
    * window, no placement pass): n_seqs = ceil(total/seqLen), padding =
    * n_seqs·seqLen − total; empty shards never appear (no rows).
    */
  def packingStats(
      df: DataFrame,
      shardCol: String,
      nTokensCol: String,
      seqLen: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    df.groupBy(shardCol)
      .agg(count(lit(1)).as("n_docs"), sum(col(nTokensCol)).as("total_tokens"))
      .withColumn("n_seqs", ceil(col("total_tokens").cast("double") / seqLen).cast("long"))
      .withColumn("pad_tokens", col("n_seqs") * seqLen - col("total_tokens"))
      .withColumn("pad_frac",
        col("pad_tokens").cast("double") / (col("n_seqs") * seqLen))
  }

  /** The tokenizer-facing form of [[packSequences]]: one row per
    * (sequence, document) slice — `seq_id` (per shard), with
    * `[tok_start, tok_end)` the half-open token range the document
    * occupies inside that sequence. A document spanning sequences emits
    * one row per covered sequence: offset..seqLen in its first, 0..seqLen
    * in full middle sequences, 0..remainder in its last. Zero-token
    * documents occupy no slice and are dropped.
    *
    * Shape at scale: the placement cumsum (one window per shard) followed
    * by a generator explode — output rows ≈ docs + total_tokens/seqLen,
    * each derived locally from its placement row. No extra shuffle beyond
    * [[packSequences]]'s.
    */
  def packedSequences(
      df: DataFrame,
      shardCol: String,
      orderCol: String,
      nTokensCol: String,
      seqLen: Int): DataFrame =
    packSequences(df, shardCol, orderCol, nTokensCol, seqLen)
      .filter(col(nTokensCol) > 0)
      .withColumn("seq_id", explode(sequence(col("first_seq"), col("end_seq"))))
      .withColumn("tok_start",
        when(col("seq_id") === col("first_seq"), col("tok_offset")).otherwise(lit(0L)))
      .withColumn("tok_end",
        when(col("seq_id") === col("end_seq"),
          (col("start_tok") + col(nTokensCol) - 1) % seqLen + 1)
          .otherwise(lit(seqLen.toLong)))

  /** Benchmark decontamination: flag every corpus document sharing at least
    * one n-token shingle with the eval set. With `broadcastEval = true`
    * (the default, right whenever the eval side is an actual benchmark —
    * thousands of docs, not billions) the distinct eval shingles broadcast
    * and the corpus is touched in a single scan + broadcast-semi-join.
    *
    * `broadcastEval = false` is the scale guard for an eval side too big
    * to broadcast (e.g. decontaminating against another corpus): both
    * sides reduce to `xxhash64(shingle)` and meet in a shuffled LEFT SEMI
    * join — corpus document TEXT still never shuffles, only (id, 8-byte
    * hash) pairs do. A 64-bit hash collision could flag a clean document
    * (conservative direction, ~n_corpus·n_eval/2^64 expected — negligible
    * below trillions of distinct shingles); the broadcast path compares
    * exact strings and has no such caveat.
    */
  def decontaminate(
      corpus: DataFrame,
      eval: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 8,
      broadcastEval: Boolean = true): DataFrame = {
    def shingleRows(df: DataFrame, cols: Column*): DataFrame =
      df.select(cols :+ TextFunctions.tokens(col(textCol)).as("__toks"): _*)
        .select(cols :+ explode(array_distinct(
          TextFunctions.shinglesFromTokens(col("__toks"), n))).as("shingle"): _*)
    val hits =
      if (broadcastEval) {
        val evalShingles = shingleRows(eval).distinct()
        shingleRows(corpus, col(idCol))
          .join(broadcast(evalShingles), "shingle")
      } else {
        val evalHashes = shingleRows(eval)
          .select(xxhash64(col("shingle")).as("__h")).distinct()
        shingleRows(corpus, col(idCol))
          .select(col(idCol), xxhash64(col("shingle")).as("__h"))
          .join(evalHashes, Seq("__h"), "left_semi")
      }
    val contaminated = hits.select(idCol).distinct().withColumn("__hit", lit(true))
    corpus
      .join(contaminated, Seq(idCol), "left_outer")
      .withColumn("contaminated", coalesce(col("__hit"), lit(false)))
      .drop("__hit")
  }

  /** [[decontaminate]] for eval sides too big to broadcast as rows but
    * fine as a SKETCH — the regime between c4's broadcast (eval = a real
    * benchmark, thousands of docs) and c4b's full shuffled semi-join
    * (eval = another corpus): build a bloom filter over the distinct eval
    * shingle hashes, prefilter the corpus's (id, hash) pairs MAP-SIDE
    * against the sketch bytes, and exact-confirm only the survivors with
    * the c4b semi-join. Bloom filters have no false negatives, so the
    * prefilter keeps every true hit and the confirmation join removes
    * every false positive — the result is identical to [[decontaminate]]
    * (broadcastEval = false) by construction, which is why the driver
    * gate runs it against c4's exact oracle.
    *
    * Shape at scale: the build's partial buffers are bitmaps merged by
    * OR — a one-row binary result, no build-side row broadcast; the probe
    * is a codegen'd predicate against a literal, so the dominant cost
    * (scanning 100 TB of corpus shingles) stays an exchange-free map
    * stage and only the ~fpp-sized candidate set pays the confirm
    * shuffle. `fpp` trades sketch bytes against candidate volume, never
    * correctness.
    */
  def decontaminateBloom(
      corpus: DataFrame,
      eval: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 8,
      expectedItems: Long = 1L << 20,
      fpp: Double = 0.01): DataFrame = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1,
      s"need expectedItems > 0 and fpp in (0,1), got $expectedItems / $fpp")
    def hashRows(df: DataFrame, cols: Column*): DataFrame =
      df.select(cols :+ TextFunctions.tokens(col(textCol)).as("__toks"): _*)
        .select(cols :+ explode(array_distinct(
          TextFunctions.shinglesFromTokens(col("__toks"), n))).as("shingle"): _*)
        .select(cols :+ xxhash64(col("shingle")).as("__h"): _*)
    // Distinct hash set persisted: it feeds BOTH the sketch build and the
    // confirmation semi-join (broadcast/agg build sides never reuse
    // exchanges — the measured ~4x recompute elsewhere in this repo).
    val evalHashes = graft.util.CacheScope.persist(hashRows(eval).distinct())
    // Standard sizing: bits = -n ln(p) / ln(2)^2, kept under Spark's
    // 67,108,864-bit runtime-filter cap so no config override is needed.
    val numBits = math.min(
      math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong,
      1L << 26)
    val sketch = evalHashes
      .agg(org.apache.spark.sql.graftnative.BloomSketch
        .bloomAgg(col("__h"), expectedItems, numBits).as("__bf"))
      .head.getAs[Array[Byte]](0)
    // Empty eval side: the aggregate yields NULL — nothing can be
    // contaminated.
    if (sketch == null)
      return corpus.withColumn("contaminated", lit(false))
    val candidates = hashRows(corpus, col(idCol))
      .filter(org.apache.spark.sql.graftnative.BloomSketch
        .mightContain(sketch, col("__h")))
    val contaminated = candidates
      .join(evalHashes, Seq("__h"), "left_semi")
      .select(idCol).distinct().withColumn("__hit", lit(true))
    corpus
      .join(contaminated, Seq(idCol), "left_outer")
      .withColumn("contaminated", coalesce(col("__hit"), lit(false)))
      .drop("__hit")
  }

  /** Span-granular decontamination: instead of [[decontaminate]]'s per-doc
    * flag, report WHICH token spans overlap the eval set — one row
    * (doc_id, pos) per contaminated n-token shingle, pos = the shingle's
    * 0-based token offset — so callers can excise `[pos, pos+n)` windows
    * rather than drop whole documents (dropping loses the clean majority
    * of a long doc that merely quotes one benchmark question).
    *
    * Both [[decontaminate]] paths exist here with the same tradeoff:
    * broadcast exact-string match for real benchmark-sized eval sets, the
    * hashed shuffled semi-join for corpus-sized ones. Only (id, pos,
    * 8-byte hash) rows ever shuffle — never text.
    */
  def contaminatedSpans(
      corpus: DataFrame,
      eval: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 8,
      broadcastEval: Boolean = true): DataFrame = {
    val posShingles = corpus
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(col(idCol),
        posexplode(TextFunctions.shinglesFromTokens(col("__toks"), n))
          .as(Seq("pos", "shingle")))
      .select(col(idCol), col("pos").cast("long").as("pos"), col("shingle"))
    val evalShingles = eval
      .select(TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(explode(array_distinct(
        TextFunctions.shinglesFromTokens(col("__toks"), n))).as("shingle"))
    if (broadcastEval)
      posShingles
        .join(broadcast(evalShingles.distinct()), Seq("shingle"), "left_semi")
        .select(idCol, "pos")
    else
      posShingles
        .select(col(idCol), col("pos"), xxhash64(col("shingle")).as("__h"))
        .join(evalShingles.select(xxhash64(col("shingle")).as("__h")).distinct(),
          Seq("__h"), "left_semi")
        .select(idCol, "pos")
  }

  /** Token-budget trimming: keep each source's documents in deterministic
    * md5(salt||id) order until the source's token budget is spent — the
    * "cap web at 300B tokens" recipe step, the budget-shaped dual of
    * [[mixtureSample]]'s rate. A document is kept iff the running token
    * total up to AND INCLUDING it fits the budget (greedy prefix of the
    * hash order); reruns, retries, and repartitioning keep the identical
    * prefix.
    *
    * Shape at scale — the naive form is a window over `partition by
    * source order by hash`, which funnels each source's entire membership
    * through ONE task. Instead the order key's own first byte splits each
    * source into 256 ranges (the bucket is a PREFIX of the order key, so
    * ordering by (bucket, hash) IS ordering by hash): per-(source, bucket)
    * token totals roll up in one small aggregate, their running offsets
    * are a window over at most 256 rows per source, and each bucket then
    * cumsums its own members independently with its offset added —
    * per-task work is 1/256 of a source, and the result is exactly the
    * single-window answer.
    */
  def tokenBudgetTrim(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      nTokensCol: String,
      budget: Long,
      salt: String): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    tokenBudgetTrimWith(df, sourceCol, idCol, nTokensCol, lit(budget), salt)
  }

  /** [[tokenBudgetTrim]] with PER-SOURCE budgets — the real recipe shape
    * ("300B web, 50B code, 5B books"). Budgets resolve through a map
    * literal exactly like [[mixtureSample]]'s rates; sources absent from
    * the map keep nothing (budget 0).
    */
  def tokenBudgetTrim(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      nTokensCol: String,
      budgets: Map[String, Long],
      salt: String): DataFrame = {
    require(budgets.values.forall(_ >= 0), "budgets must be >= 0")
    val budget = coalesce(element_at(typedLit(budgets), col(sourceCol)), lit(0L))
    tokenBudgetTrimWith(df, sourceCol, idCol, nTokensCol, budget, salt)
  }

  private def tokenBudgetTrimWith(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      nTokensCol: String,
      budget: Column,
      salt: String): DataFrame = {
    // Persisted (the madOutliers pattern): the keyed frame feeds BOTH the
    // bucket-offset aggregate and the join-back — un-persisted, the
    // caller's whole upstream lineage ran twice (guide §2.4).
    val keyed = graft.util.CacheScope.persist(df
      .withColumn("order_key", md5(concat(lit(salt), col(idCol).cast("string"))))
      .withColumn("__b", conv(substring(col("order_key"), 1, 2), 16, 10).cast("int")))
    val offsets = graft.operators.TwoPhase
      .offsets(keyed, "__b", sum(col(nTokensCol)), partitionCols = Seq(sourceCol))
      .drop("__bt")
    val cumW = Window.partitionBy(col(sourceCol), col("__b")).orderBy("order_key")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    keyed
      .join(broadcast(offsets), Seq(sourceCol, "__b"))
      .withColumn("cum_tokens", col("__off") + sum(col(nTokensCol)).over(cumW))
      .filter(col("cum_tokens") <= budget)
      .drop("__b", "__off")
  }

  /** Contiguous global positions 0..N-1 in deterministic md5(salt||id)
    * order — the scalable replacement for the three broken ways to number
    * a corpus: `monotonically_increasing_id` (non-contiguous),
    * `zipWithIndex` (an RDD round-trip that drops the columnar plan), and
    * `row_number` over a global window (every row through ONE task). Same
    * trick as [[tokenBudgetTrim]]: the order key's first byte is its own
    * range index, so 256 per-bucket counts roll up in one small
    * aggregate, bucket offsets are a window over at most 256 rows, and
    * each bucket numbers its members independently — identical to the
    * global-window answer, at 1/256 the per-task funnel.
    */
  def globalPositions(df: DataFrame, idCol: String, salt: String): DataFrame = {
    // Persisted: consumed by the offsets aggregate AND the join-back
    // (see tokenBudgetTrimWith).
    val keyed = graft.util.CacheScope.persist(df
      .withColumn("order_key", md5(concat(lit(salt), col(idCol).cast("string"))))
      .withColumn("__b", conv(substring(col("order_key"), 1, 2), 16, 10).cast("int")))
    val offsets = graft.operators.TwoPhase.offsets(keyed, "__b", count(lit(1)))
      .drop("__bt")
    val rnW = Window.partitionBy(col("__b")).orderBy("order_key")
    keyed
      .join(broadcast(offsets), Seq("__b"))
      .withColumn("pos", col("__off") + row_number().over(rnW) - 1)
      .drop("__b", "__off")
  }

  /** Per-source quality floor: keep documents whose score reaches their
    * source's q-quantile — "drop the worst quartile of every source",
    * which a single global cutoff gets wrong when sources have different
    * score distributions (a global floor empties the noisiest source and
    * keeps junk from the cleanest). Thresholds are one tiny aggregate
    * (one row per source) broadcast back over the corpus scan; the filter
    * is map-side. Interpolated `percentile` keeps the threshold exactly
    * mirrorable (the q26 pattern).
    */
  def qualityFloor(
      df: DataFrame,
      sourceCol: String,
      scoreCol: String,
      q: Double): DataFrame = {
    require(q >= 0.0 && q <= 1.0, s"quantile out of range: $q")
    // Persisted (the madOutliers pattern): df feeds the threshold
    // aggregate AND the join-back — one upstream pass, not two.
    val base = graft.util.CacheScope.persist(df)
    val thresholds = base
      .groupBy(sourceCol)
      .agg(percentile(col(scoreCol), lit(q)).as("source_threshold"))
    base.join(broadcast(thresholds), Seq(sourceCol))
      .filter(col(scoreCol) >= col("source_threshold"))
  }

  /** Per-source winsorization: clip a numeric column to its source's
    * [lo, hi] quantile band — the outlier-taming sibling of
    * [[qualityFloor]] (a floor DROPS rows; winsorizing KEEPS them with
    * the tail values pinned to the band edge, the standard treatment for
    * heavy-tailed features like document length before they feed a
    * scorer). Same shape: one tiny per-source aggregate broadcast back
    * over the scan, then a map-side greatest/least — no second pass, no
    * shuffle of the data itself.
    *
    * Null values: `greatest`/`least` IGNORE nulls (both engines), so a
    * null value would silently clip to the band's upper edge — filter or
    * impute nulls first; similarly [[qualityFloor]]'s `>=` drops
    * null-scored rows (three-valued logic), which is usually wanted but
    * worth knowing.
    */
  def winsorize(
      df: DataFrame,
      sourceCol: String,
      valueCol: String,
      lo: Double,
      hi: Double): DataFrame = {
    require(lo >= 0.0 && hi <= 1.0 && lo < hi, s"need 0 <= lo < hi <= 1, got [$lo, $hi]")
    // Persisted: bands aggregate + join-back read the same frame twice.
    val base = graft.util.CacheScope.persist(df)
    val bands = base.groupBy(sourceCol).agg(
      percentile(col(valueCol), lit(lo)).as("band_lo"),
      percentile(col(valueCol), lit(hi)).as("band_hi"))
    base.join(broadcast(bands), Seq(sourceCol))
      .withColumn(s"${valueCol}_clipped",
        greatest(col("band_lo"), least(col("band_hi"), col(valueCol))))
  }

  /** Per-source MAD (median-absolute-deviation) outlier flag: a row is an
    * outlier when |x − median_s| > k·MAD_s — the robust tail test
    * (Hampel-style) beside [[winsorize]]'s clipping: winsorize PINS
    * values, this LABELS them, and median/MAD stay meaningful under
    * exactly the heavy-tailed length/score distributions that break
    * mean±k·stddev z-scores. Two tiny per-source aggregates broadcast
    * back over one cached scan (the qualityFloor shape — map-side flag,
    * no data shuffle); interpolated `percentile` mirrors quantile_cont
    * exactly and deviations are integer-minus-exact-half doubles, so the
    * flag is engine-exact. Adds (med, mad, adev, is_outlier).
    */
  def madOutliers(
      df: DataFrame,
      sourceCol: String,
      valueCol: String,
      k: Double = 3.0): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val base = graft.util.CacheScope.persist(df)
    // Persisted: `dev` below has two consumers (the MAD aggregate and the
    // final join), so without this the per-source median aggregate over
    // the whole cached input ran once per consumer (guide §2.4 — c27's
    // plan dup). |sources| rows.
    val med = graft.util.CacheScope.persist(base.groupBy(sourceCol)
      .agg(percentile(col(valueCol), lit(0.5)).as("med")))
    val dev = base.join(broadcast(med), Seq(sourceCol))
      .withColumn("adev", abs(col(valueCol) - col("med")))
    val mad = dev.groupBy(sourceCol)
      .agg(percentile(col("adev"), lit(0.5)).as("mad"))
    dev.join(broadcast(mad), Seq(sourceCol))
      .withColumn("is_outlier", col("adev") > lit(k) * col("mad"))
  }

  /** Temperature-weighted mixture (the multilingual/multi-source
    * up-sampling rule of mT5/XLM-R): sampling shares proportional to
    * n_source^alpha at alpha = 1/2, so small sources are boosted toward —
    * never past — parity with large ones, DERIVED FROM THE DATA rather
    * than hand-tuned like [[mixtureSample]]'s rate map. Each source's
    * per-row keep rate is share * targetDocs / n_source, clamped to 1,
    * quantized to the same integer 1/10000 grid every sampler here uses,
    * decided by the same md5 bucket — rerun/retry/partition stable, and
    * coordinated with every other md5(salt||id) decision.
    *
    * alpha is FIXED at 1/2: sqrt is the one power IEEE guarantees
    * correctly rounded in both engines, so the whole rate computation is
    * engine-exact (per-source sqrt rounded to the decimal grid, summed
    * exactly, then one identical float expression tree per source);
    * a general alpha would ride on `pow`, whose cross-engine rounding is
    * exactly the drift the TF-IDF/NgramLm notes avoid.
    *
    * Shape at scale: one count aggregate (tiny), a one-row total, the
    * per-source threshold table broadcast back over the scan — the data
    * itself never shuffles.
    *
    * Null sources: a null `sourceCol` forms its own count group but the
    * threshold join back is INNER on the source, so null-source rows drop
    * from the sample (same contract as [[qualityFloor]]'s three-valued
    * `>=`) — route unlabeled rows to a default source first if they
    * should participate.
    */
  def temperatureMixture(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      targetDocs: Long,
      salt: String): DataFrame = {
    require(targetDocs >= 0, s"targetDocs must be >= 0, got $targetDocs")
    val stats = df.groupBy(sourceCol).agg(count(lit(1)).as("n_source"))
      .withColumn("__w", round(sqrt(col("n_source")), 6).cast("decimal(20,6)"))
    val tot = stats.agg(sum(col("__w")).as("__tw"))
    val thresholds = stats.crossJoin(broadcast(tot))
      .withColumn("__share", col("__w").cast("double") / col("__tw").cast("double"))
      .withColumn("thr", least(lit(10000L),
        floor(col("__share") * targetDocs.toDouble * 10000.0 / col("n_source"))
          .cast("long")))
      .select(col(sourceCol), col("n_source"), col("thr"))
    df.join(broadcast(thresholds), Seq(sourceCol))
      .filter(hashBucket(col(idCol), 10000, salt) < col("thr"))
  }

  /** The 100 TB sibling of [[qualityFloor]]: a per-source quantile floor
    * computed from a VALUE-DOMAIN HISTOGRAM instead of an exact
    * `percentile` aggregate. `percentile` buffers and sorts every group's
    * values inside one aggregation buffer — fine at per-source millions,
    * the wrong shape at per-source billions. Here the corpus reduces to a
    * (source, bucket, count) table first (map-side combined, bounded by
    * sources x buckets, NOT by rows), the cumulative scan runs over that
    * tiny table, and the cut broadcasts back over the scan.
    *
    * The cut rule is pure INTEGER arithmetic, so both engines agree
    * bit-for-bit: drop bucket b iff the cumulative count through b is
    * still <= qNum/qDen of the source total (`cum * qDen <= n * qNum`);
    * the kept region starts at the first bucket whose cumulative count
    * crosses the quantile. The floor is bucket-granular — that coarseness
    * (vs the exact [[qualityFloor]]) is the price of never sorting values,
    * and `bucketWidth` is the knob that buys it back. Null sources drop
    * at the inner cut join ([[temperatureMixture]]'s null contract).
    */
  def histogramQuantileFloor(
      df: DataFrame,
      sourceCol: String,
      valueCol: String,
      qNum: Long,
      qDen: Long,
      bucketWidth: Long): DataFrame = {
    require(qDen > 0 && qNum >= 0 && qNum <= qDen, s"need 0 <= qNum/qDen <= 1, got $qNum/$qDen")
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    def bucketOf(c: Column): Column = floor(c / lit(bucketWidth.toDouble)).cast("long")
    val hist = df
      .groupBy(col(sourceCol), bucketOf(col(valueCol)).as("__bucket"))
      .agg(count(lit(1)).as("__n"))
    val byBucket = Window.partitionBy(sourceCol).orderBy("__bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bySource = Window.partitionBy(sourceCol)
    val cuts = hist
      .withColumn("__cum", sum(col("__n")).over(byBucket))
      .withColumn("n_source", sum(col("__n")).over(bySource))
      .filter(col("__cum") * qDen > col("n_source") * qNum)
      .groupBy(sourceCol)
      .agg(min(col("__bucket")).as("cut_bucket"), first(col("n_source")).as("n_source"))
    df.join(broadcast(cuts), Seq(sourceCol))
      .filter(bucketOf(col(valueCol)) >= col("cut_bucket"))
  }

  /** Gopher-style repetition signals per document over word n-grams:
    * total/distinct n-gram counts, duplicate fraction (1 - distinct/total)
    * and top-gram fraction (most frequent n-gram's share). High values flag
    * boilerplate and degenerate repetition.
    *
    * Shape at scale: explode + two map-side-combined aggregations — rows
    * crossing the shuffle are (id, gram) pre-counts, not text, and the
    * per-doc rollup is linear. The tempting all-array form
    * (`array_max(transform(distinct, g -> count(...)))`) is O(len²) per doc
    * in an interpreted lambda — the exact staging pitfall measured 100x
    * slower elsewhere in this repo.
    */
  def repetitionSignals(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 2): DataFrame = {
    val grams = df
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(col(idCol),
        explode(TextFunctions.shinglesFromTokens(col("__toks"), n)).as("gram"))
    grams
      .groupBy(col(idCol), col("gram"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col(idCol))
      .agg(
        sum(col("__n")).as("n_grams"),
        count(lit(1)).as("n_distinct_grams"),
        max(col("__n")).as("top_gram_count"))
      .withColumn("dup_gram_frac",
        lit(1.0) - col("n_distinct_grams").cast("double") / col("n_grams"))
      .withColumn("top_gram_frac",
        col("top_gram_count").cast("double") / col("n_grams"))
  }

  // -------------------------------------------------------------------
  // DSIR — Data Selection via Importance Resampling (Xie et al. 2023):
  // weight every document by how much more likely its hashed-n-gram bag
  // is under a TARGET domain's unigram bucket distribution than under the
  // raw corpus's. The published recipe for "select pretraining data that
  // looks like Wikipedia/books" at 100 TB without a learned classifier:
  // two count tables and a join, nothing model-shaped.
  //
  // log w(doc) = sum_b c_b(doc) * (ln p_target(b) - ln p_raw(b)), with
  // add-one smoothing over B buckets. Hashing is the same md5 integer
  // grid as every sampling op ([[hashBucket]]); logs are only ever taken
  // of INTEGER counts and immediately rounded onto a decimal(20,6) grid
  // ([[graft.text.NgramLm]]'s determinism contract), so the per-doc sum
  // is exact-decimal arithmetic — partial-aggregation order cannot move
  // it, and the DuckDB oracle reproduces it bit-for-bit.
  //
  // Shape at scale: one explode + groupBy per count table (map-side
  // combined; only (bucket, count) rows shuffle — B rows total), the
  // lambda table is B rows broadcast back onto the per-doc bucket counts,
  // and the doc rollup is linear. The target corpus is typically tiny
  // (a curated domain) — its pass is negligible next to the raw scan.

  private def dsirBucketed(
      d: DataFrame, buckets: Int, salt: String,
      idCol: String, textCol: String): DataFrame = d
    .filter(col(textCol).isNotNull)
    .select(col(idCol).as("id"),
      explode(TextFunctions.tokens(col(textCol))).as("term"))
    .select(col("id"), hashBucket(col("term"), buckets, salt).as("b"))

  /** The TRAIN face: the B-row lambda table (b, lam) with
    * lam(b) = [ln(ct+1) - ln(Nt+B)] - [ln(cq+1) - ln(Nq+B)] — target
    * counts vs `reference` (the raw-pool distribution q). Every ln is
    * grid-rounded, every subtraction exact decimal. This table IS the
    * model: store it once and scoring any future crawl (or micro-batch —
    * [[graft.streaming.CorpusIngest.ingestBatchDsirGate]]) is one
    * map-side pass, the train-once/score-cheap shape of NgramLm.
    */
  def dsirLambdas(
      reference: DataFrame,
      target: DataFrame,
      buckets: Int,
      salt: String,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    def lnDec(x: Column): Column = log(x).cast("decimal(20,6)")
    val tgtTok = dsirBucketed(target, buckets, salt, idCol, textCol)
    val refTok = dsirBucketed(reference, buckets, salt, idCol, textCol)
    val ct = graft.util.CacheScope.persist(tgtTok.groupBy("b").agg(count(lit(1)).as("ct")))
    val cq = graft.util.CacheScope.persist(refTok.groupBy("b").agg(count(lit(1)).as("cq")))
    // N = Σ bucket counts — a B-row aggregate over the tables just built,
    // NOT a second corpus-sized tokenize+explode pass per side.
    val nt = ct.agg(coalesce(sum(col("ct")), lit(0L)).as("nt"))
    val nq = cq.agg(coalesce(sum(col("cq")), lit(0L)).as("nq"))
    // Full outer: a bucket seen only in the target still gets a row — it
    // can't appear in a reference doc, but the symmetric form keeps the
    // table total either way (and scoring joins tolerate missing rows).
    ct.join(cq, Seq("b"), "full")
      .crossJoin(broadcast(nt)).crossJoin(broadcast(nq))
      .select(col("b"),
        (lnDec(coalesce(col("ct"), lit(0L)) + 1) - lnDec(col("nt") + buckets)
          - lnDec(coalesce(col("cq"), lit(0L)) + 1) + lnDec(col("nq") + buckets))
          .as("lam"))
  }

  /** The SCORE face: weight `docs` under a stored lambda table.
    * (idCol, n_tokens, log_w, selected = log_w > 0). Null-text documents
    * emit n_tokens=0, null log_w, selected=false. Buckets absent from the
    * lambda table contribute nothing (left join + zero fill) — they carry
    * no evidence either way.
    */
  def dsirScoreWith(
      docs: DataFrame,
      lambdas: DataFrame,
      buckets: Int,
      salt: String,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val perDoc = dsirBucketed(docs, buckets, salt, idCol, textCol)
      .groupBy("id", "b").agg(count(lit(1)).as("c"))
      .join(broadcast(lambdas), Seq("b"), "left")
      .groupBy("id")
      .agg(sum(col("c")).as("n_tokens"),
        sum(col("c") * coalesce(col("lam"),
          lit(java.math.BigDecimal.ZERO).cast("decimal(20,6)")))
          .cast("double").as("log_w"))
    docs.select(col(idCol).as("id")).distinct()
      .join(perDoc, Seq("id"), "left")
      .select(
        col("id").as(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("log_w"),
        coalesce(col("log_w") > 0.0, lit(false)).as("selected"))
  }

  /** Per-document DSIR importance weight of `docs` against `target`, with
    * `docs` itself as the reference (raw-pool) distribution — the batch
    * face: [[dsirLambdas]] ∘ [[dsirScoreWith]], so the oracled query and
    * the streaming gate score with the SAME code.
    */
  def dsirImportance(
      docs: DataFrame,
      target: DataFrame,
      buckets: Int,
      salt: String,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    dsirScoreWith(docs,
      dsirLambdas(docs, target, buckets, salt, idCol, textCol),
      buckets, salt, idCol, textCol)

  /** Curriculum phases: order the corpus easy→hard by `scoreCol` and cut
    * it into `phases` contiguous spans of EQUAL TOKEN BUDGET — phase 1 of
    * a curriculum is "the first 1/N of the tokens the model will see",
    * not the first 1/N of the documents (doc-count phases skew when easy
    * docs are short). Output: (idCol, scoreCol, tokensCol, cum_tokens,
    * phase).
    *
    * The cumulative token sum is the c11 two-phase shape: range-bucket on
    * floor(bucketScale·score) — any monotone function of the sort key
    * preserves the global order across buckets — then a per-bucket
    * running window plus a tiny broadcast per-bucket offset table. Never
    * one global single-partition window: at 100 TB the per-bucket windows
    * parallelize across executors and only the B-row offset table is
    * serial. The phase test is pure integer compares (N·tokens_before vs
    * k·total) — no division, so any SQL mirror agrees exactly.
    *
    * Callers must drop null/NaN scores first (they would sort to one end
    * and silently absorb budget).
    */
  def curriculumPhases(
      df: DataFrame,
      scoreCol: String,
      tokensCol: String,
      idCol: String = "doc_id",
      phases: Int = 3,
      bucketScale: Double = 4.0): DataFrame = {
    require(phases >= 1, s"phases must be >= 1, got $phases")
    require(bucketScale > 0, s"bucketScale must be positive, got $bucketScale")
    // base feeds three consumers (offsets rollup, total agg, the phased
    // join) — persist or the caller's upstream scoring pipeline (c24: the
    // whole bigram LM pass) re-executes per consumer.
    val base = graft.util.CacheScope.persist(
      df.select(col(idCol), col(scoreCol), col(tokensCol))
        .withColumn("__b", floor(col(scoreCol) * bucketScale).cast("long")))
    val offsets = graft.operators.TwoPhase.offsets(base, "__b", sum(col(tokensCol)))
      .drop("__bt")
    val runW = Window.partitionBy("__b").orderBy(col(scoreCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val total = base.agg(sum(col(tokensCol)).cast("long").as("__total"))
    val phased = base.join(broadcast(offsets), Seq("__b"))
      .withColumn("cum_tokens",
        (col("__off") + sum(col(tokensCol)).over(runW)).cast("long"))
      .crossJoin(broadcast(total))
    val before = (col("cum_tokens") - col(tokensCol)) * phases
    val phase = (1 until phases).foldLeft(lit(1L)) { (acc, p) =>
      acc + when(before >= col("__total") * p, 1L).otherwise(0L)
    }
    phased
      .withColumn("phase", phase)
      .select(col(idCol), col(scoreCol), col(tokensCol),
        col("cum_tokens"), col("phase"))
  }

  /** Water-filling mixture allocation: split a token `budget` across
    * sources proportionally to weight, capped by each source's
    * availability, redistributing freed budget to unsaturated sources
    * round by round — the PLANNING face of the mixture samplers (before
    * c2/c9 execute a mix, someone must decide how many tokens each
    * source can actually contribute when targets exceed availability).
    *
    * Per round: share_i = (remaining · w_i) div Σ_{unsat} w_j (integer
    * floor — both engines agree exactly; at most Σw leftover tokens per
    * round stay pending), grant_i = min(share_i, remaining capacity).
    * Grants are monotone and remaining is non-increasing, so a fixed
    * `rounds` unroll is exact (the g4/g6 pinned-round pattern a SQL
    * mirror can reproduce); 3 rounds settle typical skews. All math is
    * integer — hash-exact by construction. Everything is plan-side (the
    * one-row remaining/weight-sum tables are broadcast, never collected).
    *
    * Each round's `granted` feeds BOTH the next remaining-budget aggregate
    * and the next state — left as lineage the unexecuted plan tree doubles
    * per round (~2^rounds analysis cost for a caller passing a large
    * `rounds`), so the round result is `scopedCheckpoint`ed like the
    * KCore/BPE-learn loops (|sources| rows per round — trivial to
    * materialize) and the previous round's blocks are released once the
    * new round is pinned.
    */
  def waterfillAllocation(
      sources: DataFrame,
      budget: DataFrame,
      rounds: Int = 3,
      sourceCol: String = "source",
      availCol: String = "avail",
      weightCol: String = "w"): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var cur = sources.select(col(sourceCol).as("source"),
        col(availCol).cast("long").as("avail"),
        col(weightCol).cast("long").as("w"))
      .withColumn("alloc", lit(0L))
    var rem = budget.select(col("budget").cast("long").as("__r"))
    var prevCp: Option[DataFrame] = None
    (1 to rounds).foreach { _ =>
      val wsum = cur.filter(col("alloc") < col("avail"))
        .agg(coalesce(sum(col("w")), lit(0L)).as("__ws"))
      val granted = cur
        .crossJoin(broadcast(rem)).crossJoin(broadcast(wsum))
        .withColumn("__need", col("avail") - col("alloc"))
        .withColumn("__grant",
          least(
            when(col("__need") > 0 && col("__ws") > 0,
              expr("__r * w div __ws")).otherwise(lit(0L)),
            col("__need")))
        .scopedCheckpoint()
      prevCp.foreach(graft.util.CacheScope.releaseCheckpoint)
      prevCp = Some(granted)
      rem = granted.agg(
        (min(col("__r")) - coalesce(sum(col("__grant")), lit(0L))).as("__r"))
      cur = granted.select(col("source"), col("avail"), col("w"),
        (col("alloc") + col("__grant")).as("alloc"))
    }
    cur
      .withColumn("saturated", col("alloc") === col("avail"))
      .select("source", "avail", "w", "alloc", "saturated")
  }

  // -------------------------------------------------------------------
  // PII scrubbing: ASCII-only patterns chosen to mean the same thing in
  // Java regex (Spark) and RE2 (DuckDB oracle). Order matters: emails are
  // scrubbed first (their local parts may contain phone-shaped digit runs),
  // then IPs (dot-separated digit runs), then bare phone numbers.
  val emailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipPattern: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val phonePattern: String = "\\b\\d{3}[- ]\\d{4}\\b"

  /** Mask emails, IPv4 addresses, and US-style short phone numbers. Pure
    * codegen'd regexp_replace chain — one projection over the corpus scan.
    */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPattern, "<EMAIL>"),
        ipPattern, "<IP>"),
      phonePattern, "<PHONE>")
}
