package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.CacheScope.CheckpointOps

/** Unigram-LM subword tokenizer (Kudo, "Subword Regularization: Improving
  * Neural Network Translation Models with Multiple Subword Candidates",
  * ACL 2018 — the SentencePiece unigram algorithm), the other major
  * subword scheme beside BPE (`Bpe.scala`): instead of replaying learned
  * merges, pieces carry unigram log-probabilities and a word's
  * segmentation is the Viterbi argmax over all piece tilings.
  *
  * This is the HARD-EM (Viterbi-EM) variant: the E-step segments each
  * word with the current piece costs and counts pieces from the single
  * best tiling; the M-step re-estimates costs from those counts. The
  * full algorithm's forward-backward E-step sums over all tilings —
  * hard-EM is its standard deterministic specialization, chosen here
  * because the argmax path (unlike posterior expectations) rides the
  * exact-integer cost grid end to end and therefore sits under the full
  * DuckDB oracle, which soft-EM's float posteriors cannot.
  *
  * EXACTNESS CONTRACT (what makes t43/t44 fully oracleable): piece costs
  * are BIGINT "micros" of the decimal(12,6)-grid ln — cost(p) =
  * micros(ln Σcounts) − micros(ln count(p)), ln only ever of an INTEGER
  * (the t20 contract) — so Viterbi totals are exact integer sums, the
  * (cost, n_pieces, piece-sequence) tie-break is total, and DuckDB
  * reproduces every segmentation with an unrolled relaxation using
  * binary string collation (= Spark's UTF-8 order).
  *
  * SCALE SHAPE (same as the BPE family): everything word-local runs over
  * the DISTINCT-word table weighted by occurrence count — Zipf makes
  * that orders of magnitude smaller than the corpus. Segmentation is one
  * codegen projection per round ([[org.apache.spark.sql.graftnative.UnigramSegment]]
  * bakes the vocabulary in — constant plan depth at any vocab size, the
  * BpeSegment lesson); per-round vocab collects are bounded by
  * seedVocab + |alphabet| rows. Documents are assembled by joining
  * occurrences back to per-word segmentations (the tokenizer-cache
  * join). At 100 TB the only corpus-sized passes are the initial word
  * count and the final assembly join.
  */
object Unigram {

  /** LOUD guard for the DuckDB mirror's relaxation bound (r13 ADVICE):
    * the oracle unrolls each Viterbi as `relaxRounds` Bellman-Ford
    * relaxations, so a word whose optimal tiling needs more pieces than
    * rounds (at worst a word LONGER than `relaxRounds` characters, when
    * all-singles is optimal) would be silently absent from the mirror's
    * `fin` CTE while the native DP segments it — a hash divergence with
    * no error. Every oracled unigram face (t43–t46, t44b) passes its
    * corpus through this BEFORE registering the plan, so fixture drift
    * breaks the gate here, with a message, not as a mystery mismatch.
    * (The mirror additionally self-guards: the `w` CTE raises a DuckDB
    * error() on any over-length word.) One bounded aggregate over the
    * distinct-word table; returns `docs` for chaining.
    */
  def requireRelaxBound(
      docs: DataFrame, relaxRounds: Int = 16,
      textCol: String = "text"): DataFrame = {
    // Persisted under the CacheScope contract: every caller immediately
    // feeds the same docs into learn()/coverage, whose first step is this
    // exact wordFreqs plan — the CacheManager plan-match turns the guard's
    // corpus pass and the learner's into ONE (guide §2.4); the table is
    // distinct-word-sized, never corpus-sized.
    val m = graft.util.CacheScope.persist(wordFreqs(docs, textCol))
      .agg(max(length(col("word"))).as("m")).head()
    val maxLen = if (m.isNullAt(0)) 0 else m.getInt(0)
    require(maxLen <= relaxRounds,
      s"unigram oracle bound: relaxRounds=$relaxRounds < max word length " +
        s"$maxLen — the DuckDB mirror's Bellman-Ford chain cannot reach " +
        "an optimal tiling with more pieces than rounds; raise relaxRounds " +
        "in both engines")
    docs
  }

  /** (word, freq) over non-empty whitespace tokens. */
  def wordFreqs(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .filter(col(textCol).isNotNull && length(col(textCol)) > 0)
      .select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Seed candidate counts: every substring of length 1..maxPieceLen of
    * every word, occurrences (overlapping included) weighted by word
    * frequency — the flat-count stand-in for SentencePiece's
    * suffix-array seeding. One explode over the distinct-word table.
    */
  def seedCounts(words: DataFrame, maxPieceLen: Int): DataFrame =
    words
      .select(col("freq"), explode(flatten(
        transform(sequence(lit(0), length(col("word")) - 1), i =>
          transform(
            sequence(lit(1), least(lit(maxPieceLen), length(col("word")) - i)),
            l => col("word").substr(i + 1, l))))).as("piece"))
      .groupBy("piece").agg(sum(col("freq")).as("cnt"))

  /** Integer-micro costs for a (piece, cnt) table: cost = micros(lnDec
    * total) − micros(lnDec cnt), both lns of integers rounded ONCE onto
    * the decimal(12,6) grid then scaled exactly (the product is
    * integral, so the BIGINT cast cannot round).
    */
  def withCosts(counts: DataFrame): DataFrame = {
    val lnMicros = (x: Column) =>
      (log(x).cast("decimal(12,6)") * 1000000).cast("long")
    // Persisted: the candidate table feeds both the total aggregate and
    // the cost projection — without this pruneTop's union (window + semi
    // join + distinct) re-ran per consumer (guide §2.4 — t43's plan
    // dup). Vocabulary-sized.
    val c = graft.util.CacheScope.persist(counts)
    val total = c.agg(sum(col("cnt")).cast("long").as("__t"))
    c.crossJoin(broadcast(total))
      .withColumn("cost_micro", lnMicros(col("__t")) - lnMicros(col("cnt")))
      .drop("__t")
  }

  /** Distinct words segmented under a collected (piece, cost_micro)
    * vocabulary: (word, word_uni) with pieces space-joined — ONE codegen
    * projection regardless of vocabulary size.
    */
  def segmentWordsLocal(words: DataFrame, vocab: Seq[(String, Long)]): DataFrame =
    words.select("word").distinct()
      .withColumn("word_uni",
        org.apache.spark.sql.graftnative.UnigramSegment(col("word"), vocab))

  /** Learn the piece vocabulary: seed → `emRounds` hard-EM rounds →
    * prune to `finalVocab` (single characters always kept — coverage).
    * Returns (piece, cnt, cost_micro) under the FINAL normalization,
    * ordered (cnt desc, piece).
    */
  def learn(
      docs: DataFrame,
      emRounds: Int = 2,
      maxPieceLen: Int = 6,
      seedVocab: Int = 256,
      finalVocab: Int = 128,
      textCol: String = "text"): DataFrame = {
    require(emRounds >= 1, s"emRounds must be >= 1, got $emRounds")
    val spark = docs.sparkSession
    val words = wordFreqs(docs, textCol).scopedCheckpoint()
    // All corpus characters — the coverage floor every round preserves.
    val chars = words
      .select(explode(split(col("word"), "")).as("piece"))
      .filter(length(col("piece")) > 0).distinct()
      .scopedCheckpoint()
    val seed = seedCounts(words, maxPieceLen)
    var counts = pruneTop(seed, chars, seedVocab).scopedCheckpoint()
    (1 to emRounds).foreach { _ =>
      val vocab = collectVocab(counts)
      val seg = segmentWordsLocal(words, vocab)
      val used = seg
        .join(words, "word")
        .select(col("freq"), explode(split(col("word_uni"), " ")).as("piece"))
        .groupBy("piece").agg(sum(col("freq")).as("cnt"))
      counts = floorChars(used, chars).scopedCheckpoint()
    }
    withCosts(pruneTop(counts, chars, finalVocab))
      .orderBy(col("cnt").desc, col("piece"))
  }

  /** Segment a corpus under a learned vocabulary: (idCol, n_pieces,
    * uni_text) — every document as its space-joined piece sequence (''
    * and 0 for null/empty docs, the applyBpe contract). One Viterbi pass
    * per DISTINCT word, one assembly join.
    */
  def applyUnigram(
      docs: DataFrame, vocab: Seq[(String, Long)],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // Persisted: occurrences feed BOTH the distinct-word segmentation and
    // the assembly join — one corpus tokenize instead of two (guide §2.4;
    // t44/t44b's plan dup; same fix as Bpe.applyBpe).
    val occ = graft.util.CacheScope.persist(docs
      .filter(col(textCol).isNotNull && length(col(textCol)) > 0)
      .select(col(idCol).as("id"),
        posexplode(TextFunctions.tokens(col(textCol))).as(Seq("widx", "word")))
      .filter(length(col("word")) > 0))
    val wordUni = segmentWordsLocal(occ.select("word"), vocab)
    val perDoc = occ.join(wordUni, "word")
      .groupBy(col("id").as(idCol))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("widx"), col("word_uni")))),
          x => x.getField("word_uni")), " ").as("uni_text"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("uni_text"), lit("")).as("uni_text"))
      .withColumn("n_pieces",
        when(col("uni_text") === "", 0L)
          .otherwise(size(split(col("uni_text"), " ")).cast("long")))
      .select(idCol, "n_pieces", "uni_text")
  }

  /** Occurrence-weighted coverage report of a corpus under a FROZEN
    * vocabulary — the serving-time gauge a tokenizer ships with: how
    * many token occurrences are fully segmentable (every character
    * known; the coverage floor makes that equivalent to Viterbi
    * reachability) vs OOV, and the pieces/word compression on the
    * covered part. ONE row: (n_docs, n_words, n_covered_words,
    * n_oov_words, oov_rate, covered_pieces, pieces_per_covered_word).
    * Per batch the only corpus-sized work is the word count; the
    * segmentation runs once per DISTINCT word (native DP) and the
    * vocab-char set rides as a literal. The ST11 streaming monitor's
    * batch face — and t46's full-oracle surface (an absent word in the
    * mirror's relaxation IS the OOV bit, so both engines agree without
    * any fallback-marker plumbing).
    */
  def coverageReport(
      docs: DataFrame, vocab: Seq[(String, Long)],
      textCol: String = "text"): DataFrame = {
    val vocabChars = vocab.map(_._1).filter(_.length == 1).sorted.toArray
    // Persisted: the word-frequency table feeds both the distinct-word
    // segmentation and the coverage join — one corpus tokenize instead
    // of two (guide §2.4; t46's plan dup). Vocabulary-sized.
    val words = graft.util.CacheScope.persist(wordFreqs(docs, textCol))
    val seg = segmentWordsLocal(words, vocab)
      .withColumn("covered",
        size(array_except(array_distinct(split(col("word"), "")),
          typedLit(vocabChars))) === 0)
      .withColumn("n_pieces",
        size(split(col("word_uni"), " ")).cast("long"))
    val nDocs = docs
      .filter(col(textCol).isNotNull && length(col(textCol)) > 0)
      .agg(count(lit(1)).as("n_docs"))
    words.join(seg, "word")
      .agg(
        sum(col("freq")).as("n_words"),
        sum(when(col("covered"), col("freq")).otherwise(0L)).as("n_covered_words"),
        sum(when(!col("covered"), col("freq")).otherwise(0L)).as("n_oov_words"),
        sum(when(col("covered"), col("freq") * col("n_pieces")).otherwise(0L))
          .as("covered_pieces"))
      .crossJoin(nDocs)
      .select(
        col("n_docs"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_covered_words"), lit(0L)).as("n_covered_words"),
        coalesce(col("n_oov_words"), lit(0L)).as("n_oov_words"),
        when(coalesce(col("n_words"), lit(0L)) > 0,
          col("n_oov_words").cast("double") / col("n_words")).as("oov_rate"),
        coalesce(col("covered_pieces"), lit(0L)).as("covered_pieces"),
        when(coalesce(col("n_covered_words"), lit(0L)) > 0,
          col("covered_pieces").cast("double") / col("n_covered_words"))
          .as("pieces_per_covered_word"))
  }

  /** [[coverageReport]] grouped per source — the "which source blows the
    * token budget" table: per-source OOV rate (is one feed drifting out
    * of the vocabulary's alphabet?) and pieces/covered-word fertility
    * (which source costs the most tokens per word at training time).
    * One row per source that has at least one non-empty document, same
    * columns as the corpus gauge plus the leading `source`.
    *
    * Shape at scale: identical to [[coverageReport]] — the segmentation
    * still runs once per corpus-DISTINCT word (the per-source rollup
    * joins word-level verdicts back, it does not re-segment per source),
    * plus one (source, word) map-side-combined count. Sources with
    * words-free text keep a row via the left join from the doc-count
    * side, zero-coalesced like the corpus face.
    */
  def coverageReportBySource(
      docs: DataFrame, vocab: Seq[(String, Long)],
      textCol: String = "text",
      sourceCol: String = "source"): DataFrame = {
    val vocabChars = vocab.map(_._1).filter(_.length == 1).sorted.toArray
    // Persisted: (source, word) counts feed both the distinct-word
    // segmentation and the per-source rollup join (guide §2.4 — same
    // shape as coverageReport). Vocabulary-sized per source.
    val srcWords = graft.util.CacheScope.persist(docs
      .filter(col(textCol).isNotNull && length(col(textCol)) > 0)
      .select(col(sourceCol).as("source"),
        explode(TextFunctions.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("source", "word").agg(count(lit(1)).as("freq")))
    val seg = segmentWordsLocal(srcWords, vocab)
      .withColumn("covered",
        size(array_except(array_distinct(split(col("word"), "")),
          typedLit(vocabChars))) === 0)
      .withColumn("n_pieces",
        size(split(col("word_uni"), " ")).cast("long"))
    val nDocs = docs
      .filter(col(textCol).isNotNull && length(col(textCol)) > 0)
      .groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"))
    val stats = srcWords.join(seg, "word")
      .groupBy("source")
      .agg(
        sum(col("freq")).as("n_words"),
        sum(when(col("covered"), col("freq")).otherwise(0L)).as("n_covered_words"),
        sum(when(!col("covered"), col("freq")).otherwise(0L)).as("n_oov_words"),
        sum(when(col("covered"), col("freq") * col("n_pieces")).otherwise(0L))
          .as("covered_pieces"))
    nDocs.join(stats, Seq("source"), "left")
      .select(
        col("source"),
        col("n_docs"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_covered_words"), lit(0L)).as("n_covered_words"),
        coalesce(col("n_oov_words"), lit(0L)).as("n_oov_words"),
        when(coalesce(col("n_words"), lit(0L)) > 0,
          col("n_oov_words").cast("double") / col("n_words")).as("oov_rate"),
        coalesce(col("covered_pieces"), lit(0L)).as("covered_pieces"),
        when(coalesce(col("n_covered_words"), lit(0L)) > 0,
          col("covered_pieces").cast("double") / col("n_covered_words"))
          .as("pieces_per_covered_word"))
      .orderBy("source")
  }

  /** Learn then apply in one call — the t44 shape. */
  def learnApply(
      docs: DataFrame,
      emRounds: Int = 2,
      maxPieceLen: Int = 6,
      seedVocab: Int = 256,
      finalVocab: Int = 128,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val vocab = collectVocab(
      learn(docs, emRounds, maxPieceLen, seedVocab, finalVocab, textCol)
        .select("piece", "cnt", "cost_micro"))
    applyUnigram(docs, vocab, idCol, textCol)
  }

  /** Top-`v` pieces by (cnt desc, piece asc) UNION all single characters
    * (with their own counts) — the pruning rule of both the seed and the
    * final vocabulary.
    */
  private def pruneTop(counts: DataFrame, chars: DataFrame, v: Int): DataFrame = {
    // Persisted: the candidate table feeds the ranking window AND the
    // char-floor union branch — one seed/E-step pass, not two. The table
    // is vocabulary-sized by construction.
    val c = graft.util.CacheScope.persist(counts)
    val ranked = c
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("piece"))))
    // The global row_number window runs over the candidate-piece table
    // (≤ distinct substrings of the DISTINCT-word table, itself pruned
    // to seedVocab from round one) — vocabulary-sized, never the corpus.
    ranked.filter(col("__rn") <= v).select("piece", "cnt")
      .unionByName(
        c.join(chars, Seq("piece"), "left_semi").select("piece", "cnt"))
      .distinct()
  }

  /** E-step counts with the character floor: multi-char pieces keep
    * their used counts (unused ⇒ dropped); every corpus character stays
    * with max(used, 1).
    */
  private def floorChars(used: DataFrame, chars: DataFrame): DataFrame = {
    // Persisted: consumed by the multi-char branch AND the char-floor
    // outer join — the E-step's segment+count pass must run once.
    val u = graft.util.CacheScope.persist(used)
    u.filter(length(col("piece")) > 1)
      .unionByName(
        chars.join(u, Seq("piece"), "left_outer")
          .select(col("piece"),
            greatest(coalesce(col("cnt"), lit(0L)), lit(1L)).as("cnt")))
  }

  /** Bounded driver collect of a (piece, cnt, ...) table's costs —
    * seedVocab + |alphabet| rows at most.
    */
  def collectVocab(counts: DataFrame): Seq[(String, Long)] = {
    val withC =
      if (counts.columns.contains("cost_micro")) counts else withCosts(counts)
    withC.select("piece", "cost_micro").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  /** Order-invariant corpus fingerprint for artifact self-validation
    * (r14 verdict #2) — see [[graft.util.Fingerprint]], the shared
    * implementation every learn-once/apply-everywhere store rides.
    * Folds the text column in (r15 ADVICE: an id-only fingerprint
    * passes a corpus whose text changed under stable ids).
    */
  def corpusFingerprint(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): (Long, Long) =
    graft.util.Fingerprint.of(docs, idCol, Seq(textCol))

  /** Persist a learned vocabulary as a SELF-VALIDATING serving artifact
    * (r14 verdict #2): `<path>/vocab` holds the (piece, cnt, cost_micro)
    * table and `<path>/fingerprint` one row (n_docs, row_hash) of the
    * corpus it was learned on, so [[readVocabArtifact]] can refuse to
    * apply a stale vocab. The learn-once half of the t44b/t46 serving
    * split.
    */
  def writeVocabArtifact(
      vocab: DataFrame, docs: DataFrame, path: String,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    vocab.write.mode("overwrite").parquet(s"$path/vocab")
    graft.util.Fingerprint.write(vocab.sparkSession, s"$path/fingerprint",
      corpusFingerprint(docs, idCol, textCol))
  }

  /** Read a vocab artifact, FIRST requiring its stored fingerprint to
    * match `docs` — the corpus the caller is about to apply it to must
    * be the one it was learned on (r14 verdict #2: Verify's oracle
    * re-derives the learn chain so a stale artifact fails THERE with a
    * hash mismatch, but production-style callers had no guard — a
    * mutated corpus under the same path would silently serve the old
    * vocabulary). Loud, with both fingerprints in the message; costs one
    * column-pruned (id, text) pass over `docs` — or, with `memo = true`
    * (r15 verdict #4), only on the first read of this artifact per
    * session (see [[graft.util.Fingerprint.requireMatch]] for the
    * tradeoff).
    */
  def readVocabArtifact(
      spark: SparkSession, docs: DataFrame, path: String,
      idCol: String = "doc_id", textCol: String = "text",
      memo: Boolean = false): DataFrame = {
    graft.util.Fingerprint.requireMatch(spark, s"$path/fingerprint",
      docs, idCol, Seq(textCol), what = "vocab", memo = memo)
    spark.read.parquet(s"$path/vocab")
  }

  /** [[writeVocabArtifact]] guarded by the CATALOG-SNAPSHOT fingerprint
    * (r17, the [[graft.text.NgramLm.writeKnModelSnapshot]] pattern):
    * for a path-backed corpus the guard fingerprints the directory's
    * FILE LISTING instead of scanning rows, so
    * [[readVocabArtifactSnapshot]] costs a metadata round-trip per
    * serve job — the production shape at 100 TB. File-set granularity;
    * see [[graft.util.Fingerprint.ofSnapshot]].
    */
  def writeVocabArtifactSnapshot(
      vocab: DataFrame, docsPath: String, path: String): Unit = {
    vocab.write.mode("overwrite").parquet(s"$path/vocab")
    graft.util.Fingerprint.write(vocab.sparkSession,
      s"$path/fingerprint_snapshot",
      graft.util.Fingerprint.ofSnapshot(vocab.sparkSession, docsPath))
  }

  /** Read a snapshot-guarded vocab artifact: loud on any file added,
    * removed, resized, or rewritten under `docsPath` since learning;
    * zero corpus scan either way.
    */
  def readVocabArtifactSnapshot(
      spark: SparkSession, docsPath: String, path: String): DataFrame = {
    graft.util.Fingerprint.requireSnapshotMatch(spark,
      s"$path/fingerprint_snapshot", docsPath, what = "vocab")
    spark.read.parquet(s"$path/vocab")
  }

  // ------------------------------------------------------------------
  // DuckDB oracle (t43/t44): the whole learn loop — seed, hard-EM
  // rounds, prune — unrolled as a CTE chain, with each round's Viterbi
  // reproduced by `relaxRounds` Bellman-Ford relaxations over the
  // word-position DAG. The (cost, np, path) triple is minimized per
  // (word, j) via row_number; `path` carries pieces joined by chr(1),
  // which sorts below every text byte, so binary string order on the
  // joined path EQUALS piece-sequence order (same np ⇒ same piece
  // count). All arithmetic is BIGINT micros — bit-identical to the
  // native DP. relaxRounds bounds the max pieces per word (= max word
  // length when all-singles is optimal); 16 doubles the fixture's
  // longest word — and the bound is ENFORCED, not assumed: Spark-side
  // by [[requireRelaxBound]] in every oracled face, mirror-side by the
  // `w` CTE's error() HAVING guard (r13 ADVICE).
  // ------------------------------------------------------------------

  /** One Viterbi pass as CTE text: edges from `costCte` over the words
    * in `wCte`/`posCte`, `relaxRounds` relaxations, ending in
    * `fin<tag>`(word, path) for fully-segmented words (path = pieces
    * joined by chr(1), no leading separator). A word that is NOT fully
    * segmentable (a character outside the vocabulary) never reaches
    * j = length(word) and is simply absent from `fin<tag>` — t46 reads
    * that absence as the OOV bit.
    */
  private def viterbiCtes(
      tag: String, costCte: String, relaxRounds: Int,
      wCte: String = "w", posCte: String = "pos"): String = {
    val rounds = (1 to relaxRounds).map { k =>
      s"""d$tag$k AS MATERIALIZED (SELECT word, j, cost, np, path FROM (
         |  SELECT word, j, cost, np, path,
         |         row_number() OVER (PARTITION BY word, j
         |                            ORDER BY cost, np, path) AS rn
         |  FROM (SELECT word, j, cost, np, path FROM d$tag${k - 1}
         |        UNION ALL
         |        SELECT d.word, e.j, d.cost + e.cost, d.np + 1,
         |               d.path || chr(1) || e.piece
         |        FROM d$tag${k - 1} d
         |        JOIN e$tag e ON e.word = d.word AND e.i = d.j))
         |  WHERE rn = 1)""".stripMargin
    }
    s"""e$tag AS MATERIALIZED (SELECT p.word, p.i, p.i + length(v.piece) AS j,
       |              v.cost, v.piece
       |       FROM $posCte p JOIN $costCte v
       |         ON substr(p.word, CAST(p.i + 1 AS INTEGER),
       |                   CAST(length(v.piece) AS INTEGER)) = v.piece),
       |d${tag}0 AS MATERIALIZED (SELECT word, CAST(0 AS BIGINT) AS j,
       |              CAST(0 AS BIGINT) AS cost, 0 AS np, '' AS path FROM $wCte),
       |${rounds.mkString(",\n")},
       |fin$tag AS MATERIALIZED (SELECT d.word, substr(d.path, 2) AS path
       |        FROM d$tag$relaxRounds d
       |        JOIN $wCte w ON w.word = d.word AND d.j = length(w.word))""".stripMargin
  }

  /** cost CTE text: (piece, cnt, cost) from a counts CTE — micros of the
    * decimal(12,6) ln grid, the product integral before the BIGINT cast.
    */
  private def costCte(name: String, src: String): String =
    s"""$name AS MATERIALIZED (SELECT piece, cnt,
       |    CAST(CAST(ln((SELECT CAST(SUM(cnt) AS BIGINT) FROM $src))
       |         AS DECIMAL(12,6)) * 1000000 AS BIGINT)
       |  - CAST(CAST(ln(cnt) AS DECIMAL(12,6)) * 1000000 AS BIGINT) AS cost
       |  FROM $src)""".stripMargin

  /** The shared CTE chain up to the FINAL pruned-and-normalized
    * vocabulary CTE `costf`(piece, cnt, cost).
    */
  private def learnCtes(
      emRounds: Int, maxPieceLen: Int, seedVocab: Int, finalVocab: Int,
      relaxRounds: Int, docsWhere: String = ""): String = {
    val emBlocks = (1 to emRounds).map { r =>
      s"""${viterbiCtes(s"r$r", s"cost${r - 1}", relaxRounds)},
         |used$r AS MATERIALIZED (SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
         |    SELECT w.freq, unnest(string_split(f.path, chr(1))) AS piece
         |    FROM finr$r f JOIN w USING (word)) GROUP BY 1),
         |c$r AS MATERIALIZED (SELECT piece, cnt FROM used$r WHERE length(piece) > 1
         |        UNION ALL
         |        SELECT c.piece,
         |               greatest(coalesce(u.cnt, CAST(0 AS BIGINT)),
         |                        CAST(1 AS BIGINT)) AS cnt
         |        FROM chars c LEFT JOIN used$r u USING (piece)),
         |${costCte(s"cost$r", s"c$r")}""".stripMargin
    }
    s"""occ AS MATERIALIZED (SELECT doc_id, i AS widx, ws[i+1] AS word
       |        FROM (SELECT doc_id, string_split(text, ' ') AS ws,
       |                     unnest(range(len(string_split(text, ' ')))) AS i
       |              FROM documents
       |              WHERE text IS NOT NULL AND len(text) > 0$docsWhere)
       |        WHERE len(ws[i+1]) > 0),
       |w AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS freq FROM occ GROUP BY 1
       |       HAVING CASE WHEN length(word) > $relaxRounds
       |              THEN error(concat('unigram oracle: relaxRounds=$relaxRounds < word length ',
       |                  CAST(length(word) AS VARCHAR),
       |                  ' - the Bellman-Ford mirror cannot tile this word'))
       |              ELSE TRUE END),
       |chars AS MATERIALIZED (SELECT DISTINCT cs[i+1] AS piece
       |          FROM (SELECT string_split(word, '') AS cs,
       |                       unnest(range(len(string_split(word, '')))) AS i
       |                FROM w)),
       |seed AS MATERIALIZED (SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
       |    SELECT freq, substr(word, CAST(i + 1 AS INTEGER),
       |                        CAST(l AS INTEGER)) AS piece
       |    FROM (SELECT word, freq, i,
       |                 unnest(range(1, least($maxPieceLen,
       |                                       length(word) - i) + 1)) AS l
       |          FROM (SELECT word, freq, unnest(range(length(word))) AS i
       |                FROM w))) GROUP BY 1),
       |c0 AS MATERIALIZED (SELECT piece, cnt FROM (
       |         SELECT piece, cnt,
       |                row_number() OVER (ORDER BY cnt DESC, piece) AS rn
       |         FROM seed) WHERE rn <= $seedVocab
       |       UNION
       |       SELECT s.piece, s.cnt FROM seed s JOIN chars c USING (piece)),
       |${costCte("cost0", "c0")},
       |pos AS MATERIALIZED (SELECT word, CAST(i AS BIGINT) AS i
       |        FROM (SELECT word, unnest(range(length(word))) AS i FROM w)),
       |${emBlocks.mkString(",\n")},
       |cf AS MATERIALIZED (SELECT piece, cnt FROM (
       |         SELECT piece, cnt,
       |                row_number() OVER (ORDER BY cnt DESC, piece) AS rn
       |         FROM c$emRounds) WHERE rn <= $finalVocab
       |       UNION
       |       SELECT s.piece, s.cnt FROM c$emRounds s
       |       JOIN chars c USING (piece)),
       |${costCte("costf", "cf")}""".stripMargin
  }

  /** Full-oracle SQL for [[learn]] with the same parameters. */
  def learnOracleSql(
      emRounds: Int = 2, maxPieceLen: Int = 6,
      seedVocab: Int = 256, finalVocab: Int = 128,
      relaxRounds: Int = 16): String =
    s"""WITH ${learnCtes(emRounds, maxPieceLen, seedVocab, finalVocab, relaxRounds)}
       |SELECT piece, cnt, cost AS cost_micro FROM costf
       |ORDER BY cnt DESC, piece""".stripMargin

  /** The learn chain (optionally on a filtered train slice, via
    * `docsWhere` — an extra " AND ..." predicate on the documents scan)
    * ending at `costf`, exposed for t46's coverage composition.
    */
  def learnChainCtes(
      emRounds: Int = 2, maxPieceLen: Int = 6,
      seedVocab: Int = 256, finalVocab: Int = 128,
      relaxRounds: Int = 16, docsWhere: String = ""): String =
    learnCtes(emRounds, maxPieceLen, seedVocab, finalVocab, relaxRounds, docsWhere)

  /** One Viterbi pass over an external word table — t46's apply-side
    * relaxation (wCte must provide (word), posCte (word, i)).
    */
  def viterbiChainCtes(
      tag: String, costCte: String, wCte: String, posCte: String,
      relaxRounds: Int = 16): String =
    viterbiCtes(tag, costCte, relaxRounds, wCte, posCte)

  /** The full learn+apply chain as composable CTE text, ending with
    * `wt`(word, word_uni) and `agg`(doc_id, uni_text) — t44's body and
    * t45's unigram leg.
    */
  def learnApplyCtes(
      emRounds: Int = 2, maxPieceLen: Int = 6,
      seedVocab: Int = 256, finalVocab: Int = 128,
      relaxRounds: Int = 16): String =
    s"""${learnCtes(emRounds, maxPieceLen, seedVocab, finalVocab, relaxRounds)},
       |${viterbiCtes("f", "costf", relaxRounds)},
       |wt AS MATERIALIZED (SELECT word, replace(path, chr(1), ' ') AS word_uni FROM finf),
       |agg AS MATERIALIZED (SELECT doc_id, string_agg(word_uni, ' ' ORDER BY widx) AS uni_text
       |        FROM occ JOIN wt USING (word) GROUP BY doc_id)""".stripMargin

  /** Full-oracle SQL for [[learnApply]]: the learn chain plus one more
    * Viterbi pass under the final costs and the per-doc assembly join.
    */
  def learnApplyOracleSql(
      emRounds: Int = 2, maxPieceLen: Int = 6,
      seedVocab: Int = 256, finalVocab: Int = 128,
      relaxRounds: Int = 16): String =
    s"""WITH ${learnApplyCtes(emRounds, maxPieceLen, seedVocab, finalVocab, relaxRounds)}
       |SELECT d.doc_id,
       |       CASE WHEN coalesce(a.uni_text, '') = '' THEN CAST(0 AS BIGINT)
       |            ELSE CAST(len(string_split(a.uni_text, ' ')) AS BIGINT)
       |       END AS n_pieces,
       |       coalesce(a.uni_text, '') AS uni_text
       |FROM documents d LEFT JOIN agg a USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
}
