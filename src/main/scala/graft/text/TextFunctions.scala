package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis expression builders for large-scale training-data pipelines:
  * tokenization, shingling, fingerprinting, language-ID heuristics, quality
  * ratios, MinHash signatures, SimHash bit vectors. All pure Catalyst
  * expressions — they run inside whole-stage codegen, no UDFs, so a 100 TB
  * documents table processes as a single scan + projection.
  */
object TextFunctions {

  /** Whitespace tokens (documents are single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Regex word tokens — the BPE-ish token-count denominator. */
  def regexTokens(text: Column): Column = regexp_extract_all(text, lit("\\w+"), lit(0))

  /** The zero-width char-split pattern: breaks between every character
    * pair in ONE linear pass — the tempting
    * transform(sequence(1, length), i -> substr(text, i, 1)) form is
    * O(n²) per document (UTF8String.substr re-walks to each offset;
    * measured ~2x slower corpus-wide). Spark's split keeps ONE trailing
    * empty element (limit = -1); every consumer must drop it. The single
    * definition keeps the entropy and langid char streams from silently
    * diverging.
    */
  val CharSplitRegex = "(?!^)"

  /** Per-character array of `text` with the trailing empty already
    * filtered at build time — use when the STAGED array is needed (e.g.
    * char bigrams). When the characters go straight into an explode,
    * prefer `explode(split(text, CharSplitRegex)).filter(_ =!= "")`:
    * the post-explode filter stays whole-stage-codegen where this HOF
    * lambda is interpreted per element.
    */
  def chars(text: Column): Column =
    filter(split(text, CharSplitRegex), c => c =!= "")

  /** n-word shingles over an already-materialized token array. Prefer this
    * over [[shingles]] when tokens are a column: every `slice`/`size`
    * reference then reads the bound array instead of re-running the split
    * (the expression tree re-evaluates a subexpression per reference — ~n
    * splits per row otherwise).
    */
  def shinglesFromTokens(toks: Column, n: Int): Column = {
    require(n >= 1, s"shingle width must be >= 1, got $n")
    when(size(toks) >= n,
      transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** n-word shingles, preserving order; empty for docs shorter than n. */
  def shingles(text: Column, n: Int): Column = shinglesFromTokens(tokens(text), n)

  /** 0-based token positions where `phrase` starts in `toks` — exact
    * phrase search as one shuffle-free projection (the positional-index
    * join's single-scan form; at retrieval scale run it over a [[Bm25]]
    * candidate set, not the raw corpus). Empty array when the document is
    * shorter than the phrase.
    */
  def phrasePositions(toks: Column, phrase: String): Column = {
    val words = phrase.split(" ")
    require(words.nonEmpty && words.forall(_.nonEmpty),
      s"phrase must be non-empty words, got '$phrase'")
    phrasePositionsCol(toks, lit(phrase))
  }

  /** [[phrasePositions]] with the phrase itself a COLUMN (one phrase per
    * row — the rescoring join's shape, where each query row carries its
    * own phrase).
    */
  def phrasePositionsCol(toks: Column, phrase: Column): Column = {
    val qn = size(split(phrase, " "))
    when(size(toks) >= qn,
      filter(
        sequence(lit(0), size(toks) - qn),
        i => concat_ws(" ", slice(toks, i + 1, qn)) === phrase))
      .otherwise(array().cast("array<int>"))
  }

  /** Document fingerprint: md5 over the sorted distinct vocabulary — robust
    * to word order, the cheap "bag-of-words identical" dedup key.
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** Rolling-hash winnowing fingerprints (the MOSS scheme): hash every
    * k-gram, keep the minimum hash of each sliding window of w hashes,
    * dedup. Guarantees any shared run of >= k+w-1 tokens between two
    * documents yields a shared fingerprint, at ~1/w the density of full
    * shingling — the sub-document overlap detector for corpus-scale
    * plagiarism/quote mining.
    */
  def winnowingFingerprints(text: Column, k: Int = 5, w: Int = 4): Column =
    winnowFromHashes(transform(shingles(text, k), sh => xxhash64(sh)), w)

  /** The window-min step over an already-materialized hash array. In a hot
    * path, bind `hashes` to a real column first (see
    * [[graft.dedup.Dedup.winnowingFingerprints]]): as an inline
    * subexpression it would be re-evaluated once per window reference —
    * O(windows x hash-build) per row, measured 100x slower at sf0.1.
    */
  def winnowFromHashes(hashes: Column, w: Int): Column = {
    require(w >= 1, s"window size must be >= 1, got $w")
    when(size(hashes) >= w,
      array_distinct(transform(
        sequence(lit(0), size(hashes) - w),
        i => array_min(slice(hashes, i + 1, lit(w))))))
      .when(size(hashes) > 0, array(array_min(hashes)))
      .otherwise(array().cast("array<bigint>"))
  }

  /** BPE-ish subword-boundary tokens: GPT-2-style pattern (space-prefixed
    * letter runs, digit runs, punctuation runs) restricted to ASCII so the
    * same regex means the same thing in Spark (Java regex) and DuckDB (RE2).
    */
  val bpePattern: String = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"

  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(bpePattern), lit(0))

  // -----------------------------------------------------------------------
  // Language ID: tiny per-language stopword lists; prediction = priority-
  // ordered argmax of hit counts (deterministic tie-break en>es>fr>de>zh).
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "was"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "un", "es", "se", "no"),
    "fr" -> Seq("le", "les", "des", "et", "que", "une", "un", "est", "du", "il"),
    "de" -> Seq("der", "die", "das", "und", "zu", "ist", "den", "von", "mit", "nicht"),
    "zh" -> Seq("de_zh", "shi", "bu", "le_zh", "zai", "ren", "you", "wo", "ta", "zhe"))

  def stopwordHits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), w => w.isin(words.map(lit): _*))).cast("long")

  /** Heuristic language ID over the stopword hit counts. */
  def langId(text: Column): Column = {
    val hits = stopwords.map { case (lang, ws) => lang -> stopwordHits(text, ws) }
    // priority-ordered argmax: first language whose count >= all later ones
    hits.zipWithIndex.foldRight(lit("und")) { case (((lang, h), i), elseCol) =>
      val laterMax = hits.drop(i + 1).map(_._2)
      val isMax = laterMax.foldLeft(h > 0) { case (acc, other) => acc && h >= other }
      when(isMax, lang).otherwise(elseCol)
    }
  }

  // -----------------------------------------------------------------------
  // Quality ratios — each a single int/int division, deterministic across
  // engines.
  def nTokens(text: Column): Column = size(tokens(text)).cast("long")
  def nDistinctTokens(text: Column): Column = size(array_distinct(tokens(text))).cast("long")

  /** Type-token ratio: distinct/total — low values flag boilerplate. */
  def distinctRatio(text: Column): Column =
    nDistinctTokens(text).cast("double") / nTokens(text)

  /** Mean token length: (chars - separators) / tokens. */
  def avgTokenLen(text: Column): Column =
    (length(text) - (nTokens(text) - 1)).cast("double") / nTokens(text)

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,!?;:]", ""))).cast("double") / length(text)

  // -----------------------------------------------------------------------
  // MinHash signature: k independent min-hashes over the shingle set.
  // Backed by the native codegen [[org.apache.spark.sql.graftnative
  // .MinHashSig]] — ONE pass over the shingles maintaining k primitive
  // running minima; [[minhashSignatureHof]] is the bit-equivalent HOF form
  // kept as the cross-check (its k×n lambda calls evaluate interpreted
  // and allocate k intermediate hash arrays per row — the dot/dotHof
  // split, applied to the signature step every MinHash path pays once
  // per document).
  def minhashSignature(shinglesCol: Column, k: Int): Column =
    org.apache.spark.sql.graftnative.MinHashSig(shinglesCol, k)

  /** The transform/array_min formulation minhashSignature is verified
    * against (TextFunctionsSpec pins element-wise equality, including the
    * empty-array → k nulls contract).
    */
  def minhashSignatureHof(shinglesCol: Column, k: Int): Column =
    transform(
      typedLit((0 until k).toArray),
      s => array_min(transform(shinglesCol, sh => xxhash64(sh, s))))

  /** Estimated Jaccard from two MinHash signatures: matching fraction. */
  def minhashJaccardEstimate(sigA: Column, sigB: Column, k: Int): Column =
    aggregate(
      zip_with(sigA, sigB, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0),
      (acc, v) => acc + v).cast("double") / k

  /** LSH band hashes: split the k-length signature into `bands` bands of
    * k/bands rows; one hash per band. Near-dup docs collide on >=1 band.
    */
  def minhashBands(sig: Column, k: Int, bands: Int): Column = {
    require(bands > 0 && k % bands == 0,
      s"k=$k must divide evenly into bands=$bands — a remainder would be silently dropped")
    val r = k / bands
    transform(
      sequence(lit(0), lit(bands - 1)),
      i => xxhash64(concat_ws(",", transform(slice(sig, i * r + 1, lit(r)), _.cast("string"))), i))
  }

  // -----------------------------------------------------------------------
  // SimHash: 64 sign bits PACKED INTO ONE LONG. Bit b votes 1 when strictly
  // more than half the tokens have bit b set in their (single) 64-bit token
  // hash. The packed representation matters at scale: hamming distance is
  // bit_count(a XOR b) — pure codegen'd integer ops in the pair-join inner
  // loop — and shuffle rows carry 8 bytes instead of a 64-element array
  // (the array + HOF-hamming form measured 84s for the 10x dup-heavy
  // ScaleProbe re-rank; packed longs make the same re-rank integer-cheap).
  val SimhashBits = 64

  /** One xxhash64 per token yields all 64 pseudo-random bits (re-hashing
    * per bit costs 64x for no extra entropy). Backed by the native codegen
    * [[org.apache.spark.sql.graftnative.SimHashPack]] — one pass per
    * token, 64 primitive bit-votes, no intermediate hash array;
    * [[simhashBitVectorHof]] is the bit-equivalent HOF form kept as the
    * cross-check (its 64 interpreted `filter` passes per document were
    * the row-local cost, the dot/dotHof split again).
    */
  def simhashBitVector(text: Column): Column =
    org.apache.spark.sql.graftnative.SimHashPack(tokens(text))

  /** The 64-filter HOF formulation simhashBitVector is verified against
    * (TextFunctionsSpec pins bit equality). Disjoint single-bit values
    * combine with OR (never +: ANSI arithmetic has nothing to check, and
    * bit 63 is the sign bit).
    */
  def simhashBitVectorHof(text: Column): Column = {
    val t = tokens(text)
    val hs = transform(t, w => xxhash64(w))
    (0 until SimhashBits).map { b =>
      when(size(filter(hs, h => shiftright(h, b).bitwiseAND(lit(1L)) === 1)) * 2 > size(t),
        shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
  }

  /** The low `bits` bits of the packed simhash — a single blocking key. */
  def simhashPrefix(packed: Column, bits: Int): Column = {
    require(bits > 0 && bits < SimhashBits)
    packed.bitwiseAND(lit((1L << bits) - 1))
  }

  /** Pigeonhole blocking keys: the 64 bits split into `nBlocks` contiguous
    * segments, each extracted by shift+mask. Any two vectors within hamming
    * distance `nBlocks - 1` agree exactly on at least one segment, so
    * joining per (segment index, key) has guaranteed recall — unlike a
    * single-prefix block, which misses any pair whose differing bits land
    * in the prefix.
    */
  def simhashBlockKeys(packed: Column, nBlocks: Int): Column = {
    val bounds = (0 to nBlocks).map(i => i * SimhashBits / nBlocks)
    val segs = (0 until nBlocks).map { i =>
      val start = bounds(i)
      val len = bounds(i + 1) - start
      val mask = if (len >= 64) lit(-1L) else lit((1L << len) - 1)
      shiftright(packed, start).bitwiseAND(mask)
    }
    array(segs: _*)
  }

  /** Hamming distance between two packed simhashes: popcount of the XOR —
    * whole-stage-codegen integer ops, no per-pair array traversal.
    */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  // -------------------------------------------------------------------
  // Text cleaning: the pre-dedup normalization pass every scraped corpus
  // needs. ASCII-only patterns that mean the same thing in Java regex
  // (Spark) and RE2 (the DuckDB oracle) — same cross-engine discipline as
  // the PII patterns in graft.curation.Curation.

  /** Anything tag-shaped. Replaced with a SPACE, not deleted: `a<br>b`
    * must not glue into `ab`.
    */
  val htmlTagPattern: String = "<[^>]*>"

  /** C0 control characters + DEL — tab/newline/CR land here too, so they
    * normalize to spaces before the collapse.
    */
  val controlCharPattern: String = "[\\x00-\\x1f\\x7f]"

  /** Runs of 2+ spaces (all other whitespace is already a space). */
  val multiSpacePattern: String = " {2,}"

  /** Strip HTML tags, normalize control chars to spaces, collapse space
    * runs, trim. Pure codegen'd regexp_replace chain — one projection over
    * the corpus scan, the same shape as [[graft.curation.Curation.scrubPii]].
    * Order is load-bearing: tags first (their innards may contain control
    * chars), control chars second (so the collapse sees only spaces),
    * collapse last.
    */
  def cleanText(text: Column): Column =
    trim(
      regexp_replace(
        regexp_replace(
          regexp_replace(text, htmlTagPattern, " "),
          controlCharPattern, " "),
        multiSpacePattern, " "))

  /** S-stemmer-style suffix normalizer: three sequential whole-text
    * regexp passes — `Xies -> Xy` (X not a/e), `Xes -> Xe` (X not
    * a/e/o), then `Xs -> X` (X not u/s) — collapsing common English
    * plural variants onto one form before frequency analysis / dedup.
    * SEQUENTIAL, not else-if (a word rule 2 declines can still lose a
    * bare trailing s to rule 3): documented semantics both engines
    * implement identically, patterns chosen to mean the same thing in
    * Java regex and RE2. Pure codegen'd projection, zero shuffle.
    */
  def sStem(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, "([a-z]*[^ae\\s])ies\\b", "$1y"),
        "([a-z]*[^aeo\\s])es\\b", "$1e"),
      "([a-z]*[^us\\s])s\\b", "$1")
}
