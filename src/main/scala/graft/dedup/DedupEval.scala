package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.similarity.Similarity
import graft.text.TextFunctions

/** Screen-quality evaluation for the near-duplicate family — e13's analog
  * for dedup (r12 verdict #4): how much of the EXACT ground truth does
  * each blocking screen recall, and how much of what it proposes is real?
  * At 100 TB the banding parameters (k, bands, hamming budget, sign-band
  * width) are the knobs users otherwise tune blind; this harness measures
  * them on a bounded fixture before a full run.
  *
  * THE HASH SWAP THAT BUYS THE ORACLE: the production screens hash with
  * xxhash64 (native codegen — [[org.apache.spark.sql.graftnative.MinHashSig]]
  * / SimHashPack), which no SQL engine reproduces, so those paths are
  * golden-pinned (d2/d3), not oracled. What recall/precision actually
  * measure, though, is the BANDING GEOMETRY — min-over-bands collision
  * probability as a function of true similarity — which is
  * hash-family-agnostic (any uniform hash family gives the same expected
  * curves; Broder 1997). The harness therefore builds the same screens
  * over md5 (available bit-for-bit in both engines: hex strings compare
  * as 128-bit values), putting the ENTIRE measurement — ground truth,
  * candidates, hits, ratios — under one DuckDB oracle. The sign-band
  * embedding screen needs no swap: it is deterministic integer math and
  * runs here exactly as deployed (rotate + cap, the e21 configuration).
  *
  * Output: one row per screen — (screen, n_truth, n_cand, n_hit,
  * recall, precision), counts exact BIGINTs, ratios single IEEE
  * divisions.
  *
  * Scale shape: shingle/token tables are inverted-index joins (the d4/d5
  * shapes); the ONLY quadratic piece is the exact-truth pair join, which
  * is the eval's point and is bounded by the caller's fixture (the e13
  * contract — evaluation runs on a sample, screens run on the corpus).
  */
object DedupEval {

  private def pairKey(a: Column, b: Column): Column =
    struct(least(a, b).as("lo"), greatest(a, b).as("hi"))

  /** Exact-Jaccard ground-truth pairs (lo, hi) over distinct
    * `shingleN`-shingles at `threshold` — complete for any threshold > 0
    * (qualifying pairs share a shingle, so the inverted-index join sees
    * them).
    */
  def exactJaccardTruth(
      docs: DataFrame, shingleN: Int, threshold: Double,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // Persisted at both layers (guide §2.4): the shingle-set table feeds
    // the sizes projection AND the inverted index; the index is BOTH legs
    // of the pair self-join — un-persisted, the tokenize+shingle pass ran
    // up to 3x per truth build (the round-20 DupAudit finding).
    val sh = graft.util.CacheScope.persist(docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= shingleN)
      .select(col("id"),
        array_distinct(TextFunctions.shinglesFromTokens(col("toks"), shingleN))
          .as("shingles")))
    val sizes = sh.select(col("id"), size(col("shingles")).cast("long").as("n"))
    val inv = graft.util.CacheScope.persist(
      sh.select(col("id"), explode(col("shingles")).as("shingle")))
    inv.as("a").join(inv.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("lo"), col("b.id").as("hi"))
      .agg(count(lit(1)).as("n_common"))
      .join(sizes.select(col("id").as("lo"), col("n").as("n_lo")), "lo")
      .join(sizes.select(col("id").as("hi"), col("n").as("n_hi")), "hi")
      .filter(col("n_common").cast("double") /
        (col("n_lo") + col("n_hi") - col("n_common")) >= threshold)
      .select("lo", "hi")
  }

  /** md5-MinHash-LSH candidate pairs: signature element s = MIN over
    * distinct shingles of md5(shingle || '#' || s) — fixed-width hex
    * strings compare as 128-bit integers — banded `bands` ways (band key
    * = the band's signature elements concatenated in seed order).
    */
  def md5MinhashLshCandidates(
      docs: DataFrame, k: Int, bands: Int, shingleN: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    lshBandedCandidates(
      md5MinhashSignatures(docs, k, shingleN, idCol, textCol), k, bands)

  /** The (id, seed, sig) md5-MinHash signature table — computed ONCE and
    * shared across band configurations by [[minhashSweep]] (the banding
    * is a regrouping of the same k signature elements).
    */
  private def md5MinhashSignatures(
      docs: DataFrame, k: Int, shingleN: Int,
      idCol: String, textCol: String): DataFrame = {
    val inv = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= shingleN)
      .select(col("id"),
        explode(array_distinct(
          TextFunctions.shinglesFromTokens(col("toks"), shingleN))).as("shingle"))
    inv
      .select(col("id"), col("shingle"),
        explode(sequence(lit(0), lit(k - 1))).as("seed"))
      .select(col("id"), col("seed"),
        md5(concat(col("shingle"), lit("#"), col("seed").cast("string"))).as("h"))
      .groupBy("id", "seed").agg(min(col("h")).as("sig"))
  }

  /** Band a signature table `bands` ways (band key = the band's elements
    * concatenated in seed order) and self-join to candidate pairs.
    */
  private def lshBandedCandidates(
      sig: DataFrame, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, s"k=$k not divisible by bands=$bands")
    val rows = k / bands
    // Persisted: the banded key table is both legs of the candidate
    // self-join (same rationale as exactJaccardTruth's index).
    val banded = graft.util.CacheScope.persist(sig
      .withColumn("band", expr(s"seed div $rows"))
      .groupBy("id", "band")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("seed"), col("sig")))),
          x => x.getField("sig")), "").as("band_key")))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.band_key") === col("y.band_key") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("lo"), col("y.id").as("hi"))
      .distinct()
  }

  /** The d18 report: the (bands) tuning grid over the md5-MinHash screen
    * at fixed k — recall/precision per configuration against the same
    * exact-Jaccard truth, turning d17's single MinHash point into the
    * actual banding curve (more bands ⇒ shorter band keys ⇒ higher
    * collision probability at a given similarity ⇒ recall up, precision
    * down — Broder 1997's S-curve, measured instead of guessed). One
    * truth pass and ONE signature pass feed every configuration; each
    * config adds only its regroup + band self-join. Same enforced
    * eval-size contract as [[screenQuality]].
    */
  def minhashSweep(
      docs: DataFrame, k: Int = 16, bandsGrid: Seq[Int] = Seq(2, 4, 8),
      shingleN: Int = 3, jaccardThreshold: Double = 0.5,
      maxEvalRows: Long = 50000L, sampleOverMax: Boolean = false): DataFrame = {
    val d = boundEvalInput(docs, "doc_id", maxEvalRows, sampleOverMax, "d18d")
    val truth = graft.util.CacheScope.persist(
      exactJaccardTruth(d, shingleN, jaccardThreshold))
    val sig = graft.util.CacheScope.persist(
      md5MinhashSignatures(d, k, shingleN, "doc_id", "text"))
    bandsGrid.map { b =>
      scoreScreen(s"minhash_k${k}_b$b", truth, lshBandedCandidates(sig, k, b))
    }.reduce(_ unionByName _)
  }

  /** The d18b report: the signature-LENGTH axis of the MinHash grid —
    * k = 8 banded 2/4/8 ways against the same exact truth, read beside
    * d18's k = 16 rows. The seed-prefix property buys the whole face
    * for free: signature element s is min(md5(shingle ‖ '#' ‖ s)), so
    * the k = 8 table is EXACTLY the `seed < 8` slice of the k = 16
    * table — one signature pass feeds both faces' five configurations,
    * and the comparison is apples-to-apples by construction (identical
    * hash family, identical truth). Read-off: at the same band count a
    * shorter signature means shorter band keys ⇒ more accidental
    * collisions ⇒ recall ≥ / precision ≤ the k = 16 row — the "how
    * much signature do I need" axis users otherwise size blind.
    */
  def minhashGrid(
      docs: DataFrame, kMax: Int = 16,
      configs: Seq[(Int, Int)] = Seq((8, 2), (8, 4), (8, 8)),
      shingleN: Int = 3, jaccardThreshold: Double = 0.5,
      maxEvalRows: Long = 50000L, sampleOverMax: Boolean = false): DataFrame = {
    require(configs.nonEmpty && configs.forall { case (k, b) =>
      k >= 1 && k <= kMax && b >= 1 && k % b == 0 },
      s"each (k, bands) needs 1 <= k <= kMax=$kMax and bands | k: $configs")
    val d = boundEvalInput(docs, "doc_id", maxEvalRows, sampleOverMax, "d18g")
    val truth = graft.util.CacheScope.persist(
      exactJaccardTruth(d, shingleN, jaccardThreshold))
    val sig = graft.util.CacheScope.persist(
      md5MinhashSignatures(d, kMax, shingleN, "doc_id", "text"))
    configs.map { case (k, b) =>
      scoreScreen(s"minhash_k${k}_b$b",
        truth, lshBandedCandidates(sig.filter(col("seed") < k), k, b))
    }.reduce(_ unionByName _)
  }

  /** md5-SimHash candidate pairs over `bits`-bit keys: one vote per token
    * OCCURRENCE from the token's md5 nibbles (bit i = bit (i mod 4) of
    * hex digit (i div 4); ascii arithmetic, no conv()), majority strictly
    * over half; pigeonhole blocking into `maxHamming + 1` equal blocks
    * guarantees screen recall at the hamming budget. Keys pack as
    * ceil(bits/32) 32-BIT words (the signPack convention): a per-word
    * Σ bit·2^(i mod 32) stays < 2^53, so the double sum is exact at any
    * `bits` ≤ 128 where a single 64-bit key would overflow both the
    * double mantissa and the ANSI long cast. Blocks must not straddle
    * words (blockBits divides 32, or is a multiple of it).
    */
  def md5SimhashCandidates(
      docs: DataFrame, bits: Int, maxHamming: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    simhashBlockedCandidates(
      md5SimhashKeysFromToks(md5TokenHashes(docs, idCol, textCol), bits),
      bits, maxHamming)

  /** The (id, h) per-token-occurrence md5 table the SimHash vote pass
    * consumes — split out so [[screenQuality]] computes it ONCE and feeds
    * both key widths (the 16- and 64-bit screens hash the very same
    * occurrences; guide §2.4's shared-pass rule).
    */
  private def md5TokenHashes(
      docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .filter(length(col("tok")) > 0)
      .withColumn("h", md5(col("tok")))

  /** The (id, ks) packed md5-SimHash key table — computed ONCE and
    * shared across hamming budgets by [[simhashSweep]] (the pigeonhole
    * blocking is a re-slicing of the same packed words).
    */
  private def md5SimhashKeys(
      docs: DataFrame, bits: Int,
      idCol: String, textCol: String): DataFrame =
    md5SimhashKeysFromToks(md5TokenHashes(docs, idCol, textCol), bits)

  private def md5SimhashKeysFromToks(
      toks: DataFrame, bits: Int): DataFrame = {
    require(bits <= 128, s"md5 provides 128 bits, asked for $bits")
    val votes = toks
      .select(col("id"), col("h"),
        explode(sequence(lit(0), lit(bits - 1))).as("i"))
      .withColumn("c", col("h").substr((expr("i div 4") + 1).cast("int"), lit(1)))
      .withColumn("nib",
        when(ascii(col("c")) >= 97, ascii(col("c")) - 87)
          .otherwise(ascii(col("c")) - 48))
      .withColumn("bit",
        expr("(nib div CAST(pow(2, i % 4) AS INT)) % 2"))
      .groupBy("id", "i")
      .agg(sum(col("bit") * 2 - 1).as("vote"))
    votes
      .withColumn("b", when(col("vote") > 0, 1L).otherwise(0L))
      .withColumn("wi", expr("i div 32"))
      .groupBy("id", "wi")
      .agg(sum(col("b") * pow(lit(2.0), col("i") % 32)).cast("long").as("k"))
      .groupBy("id")
      .agg(transform(
        array_sort(collect_list(struct(col("wi"), col("k")))),
        x => x.getField("k")).as("ks"))
  }

  /** Pigeonhole-block a packed key table at `maxHamming` and exact-filter
    * the blocked candidates — recall at the budget is GUARANTEED (a pair
    * within hamming h agrees on at least one of the h+1 blocks).
    */
  private def simhashBlockedCandidates(
      keys: DataFrame, bits: Int, maxHamming: Int): DataFrame = {
    val nBlocks = maxHamming + 1
    require(bits % nBlocks == 0, s"bits=$bits not divisible by blocks=$nBlocks")
    val blockBits = bits / nBlocks
    // <= 32 strictly: blk_key reads ONE 32-bit word, so a 64-bit block
    // (e.g. bits=128, maxHamming=1) would silently use only half its
    // bits AND overflow the ANSI pow(2,64) long cast (r13 ADVICE).
    require(blockBits <= 32 && 32 % blockBits == 0,
      s"blockBits=$blockBits must divide 32 — a block must not straddle " +
        "the 32-bit key words, and multi-word block keys are not assembled")
    val nWords = (bits + 31) / 32
    // Persisted: both legs of the block-key self-join read this table —
    // un-persisted, the whole vote/pack pipeline above it ran twice.
    val blocked = graft.util.CacheScope.persist(keys
      .select(col("id"), col("ks"),
        explode(sequence(lit(0), lit(nBlocks - 1))).as("blk"))
      .withColumn("blk_key",
        expr(s"(ks[CAST(($blockBits * blk) div 32 AS INT)] div " +
          s"CAST(pow(2, ($blockBits * blk) % 32) AS LONG)) % " +
          s"CAST(pow(2, $blockBits) AS LONG)")))
    val ham = (0 until nWords)
      .map(w => bit_count(col("ksa").getItem(w).bitwiseXOR(col("ksb").getItem(w))))
      .reduce(_ + _)
    blocked.as("x").join(blocked.as("y"),
        col("x.blk") === col("y.blk") && col("x.blk_key") === col("y.blk_key") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("lo"), col("y.id").as("hi"),
        col("x.ks").as("ksa"), col("y.ks").as("ksb"))
      .distinct()
      .filter(ham <= maxHamming)
      .select("lo", "hi")
  }

  /** The d19 report: the hamming-BUDGET tuning grid over the md5-SimHash
    * screen at fixed key width — d18's analog on the other axis. The
    * budget sets BOTH the blocking geometry (h+1 pigeonhole blocks of
    * bits/(h+1) bits — recall at the budget is guaranteed, Gionis et
    * al.'s standard argument) and the exact post-filter, so a wider
    * budget buys truth recall at candidate-count cost — the d17 frontier
    * already proved budgets must scale with key width; this measures the
    * curve at the deployed width. The truth pass and the key pass run
    * ONCE; each budget adds only its re-slice + block self-join. Same
    * enforced eval-size contract as [[screenQuality]].
    */
  def simhashSweep(
      docs: DataFrame, bits: Int = 64, hammingGrid: Seq[Int] = Seq(1, 3, 7),
      shingleN: Int = 3, jaccardThreshold: Double = 0.5,
      maxEvalRows: Long = 50000L, sampleOverMax: Boolean = false): DataFrame = {
    val d = boundEvalInput(docs, "doc_id", maxEvalRows, sampleOverMax, "d19d")
    val truth = graft.util.CacheScope.persist(
      exactJaccardTruth(d, shingleN, jaccardThreshold))
    val keys = graft.util.CacheScope.persist(
      md5SimhashKeys(d, bits, "doc_id", "text"))
    hammingGrid.map { h =>
      scoreScreen(s"simhash${bits}_h$h",
        truth, simhashBlockedCandidates(keys, bits, h))
    }.reduce(_ unionByName _)
  }

  /** One (screen, n_truth, n_cand, n_hit, recall, precision) row.
    * n_cand and n_hit come from ONE pass over the candidate set: truth
    * pairs are unique on (lo, hi) by construction (groupBy keys), so a
    * left join + conditional count is exactly the semi-join hit count —
    * and the screen's banded self-join (the expensive leg) materializes
    * once instead of twice (measured ~2× on d18's three-config sweep).
    */
  private def scoreScreen(
      name: String, truth: DataFrame, cand: DataFrame): DataFrame = {
    val t = truth.select(col("lo"), col("hi"))
    val c = cand.select(col("lo"), col("hi")).distinct()
    val hitAgg = c
      .join(t.withColumn("__t", lit(1L)), Seq("lo", "hi"), "left")
      .agg(
        count(lit(1)).as("n_cand"),
        coalesce(sum(col("__t")), lit(0L)).as("n_hit"))
    val row = t.agg(count(lit(1)).as("n_truth")).crossJoin(hitAgg)
    row.select(
      lit(name).as("screen"),
      col("n_truth"), col("n_cand"), col("n_hit"),
      when(col("n_truth") > 0,
        col("n_hit").cast("double") / col("n_truth")).as("recall"),
      when(col("n_cand") > 0,
        col("n_hit").cast("double") / col("n_cand")).as("precision"))
  }

  /** Sample-path bucket granularity. Per-MILLION (not per-mille): with g
    * buckets and keep = ⌊maxEvalRows·g / n⌋, the floor sticks at 1 — and
    * the kept count becomes the UNBOUNDED ~n/g — only once n > g·maxEvalRows,
    * so g=10⁶ pushes that regime to n > 10⁶·maxEvalRows (5·10¹⁰ rows at
    * the 50k default) AND [[boundEvalInput]] closes it with a loud
    * `require` (the r14 ADVICE finding: at g=1000 an n=100M input kept
    * ~100k rows, silently over the 50k contract).
    *
    * `private[graft]` (r15 verdict #2): the d17b/d17e DuckDB mirrors
    * render their `% g` modulus and `maxEvalRows·g` product FROM this
    * constant, so the guard and its oracle cannot drift.
    */
  private[graft] val SampleBuckets = 1000000L

  /** ENFORCED eval-size contract (r13 verdict #1): the exact-truth
    * stages are the harness's designed quadratics — all-pairs cosine and
    * a df-cap-free inverted-index join — so an input beyond
    * `maxEvalRows` must either fail LOUDLY (default; the HdSignPack
    * dim-guard convention) or degrade to a DOCUMENTED deterministic
    * sample (`sampleOverMax = true`): keep rows with
    * md5-bucket(id, 10⁶) < max(1, maxEvalRows·10⁶ ⌊/⌋ n) — the c1 salted
    * md5 bucket, so the DuckDB mirror reproduces it exactly with
    * `... % 1000000 < (SELECT greatest(1, <maxEvalRows>*1000000 //
    * count(*)) FROM <input>)`. The sample holds `maxEvalRows` in
    * EXPECTATION (a hash thinning, not a hard top-N — no global sort
    * needed); the expected shortfall from the floor is < n/10⁶ rows.
    * The bounded `count()` here IS the enforcement: nothing beyond the
    * contract scale ever reaches the quadratic stages — including on the
    * sample path, where n > SampleBuckets·maxEvalRows (the regime where
    * the keep-fraction floor would keep an unbounded ~n/10⁶ rows) fails
    * loudly instead of silently exceeding the contract.
    */
  private def boundEvalInput(
      df: DataFrame, idCol: String, maxEvalRows: Long,
      sampleOverMax: Boolean, salt: String): DataFrame = {
    require(maxEvalRows > 0 && maxEvalRows <= Long.MaxValue / SampleBuckets,
      s"maxEvalRows=$maxEvalRows outside the sample grid (must be in " +
        s"[1, ${Long.MaxValue / SampleBuckets}])")
    val n = df.count()
    // The bounded frame this returns feeds every screen AND the truth pass
    // (4-5 consumers in screenQuality) — persist it so the caller-built
    // fixture lineage (often a union/transform over a corpus scan) runs
    // once, not once per consumer (guide §2.4). Only the BOUNDED side is
    // ever persisted: on the sample path the cached frame is the thinned
    // output (~maxEvalRows rows), never the unbounded input.
    if (n <= maxEvalRows) graft.util.CacheScope.persist(df)
    else {
      require(sampleOverMax,
        s"screenQuality input '$salt' has $n rows > maxEvalRows=" +
          s"$maxEvalRows; the exact-truth stages are quadratic by design " +
          "— raise maxEvalRows deliberately or pass sampleOverMax=true " +
          "for the deterministic md5 per-million sample")
      require(n <= maxEvalRows * SampleBuckets,
        s"screenQuality input '$salt' has $n rows > maxEvalRows·10⁶ = " +
          s"${maxEvalRows * SampleBuckets}: the per-million keep-fraction " +
          "floors at 1 bucket there and the sample would keep an " +
          s"unbounded ~n/$SampleBuckets rows — pre-thin the input or " +
          "raise maxEvalRows deliberately")
      val keep = math.max(1L, maxEvalRows * SampleBuckets / n)
      graft.util.CacheScope.persist(
        df.filter(graft.curation.Curation.hashBucket(
          col(idCol), SampleBuckets.toInt, salt) < keep))
    }
  }

  /** The d20 report: the CAP axis of the sign-band family, measured on
    * the drop path (saltOverCap = false — the SQL-mirrorable exclusion
    * the d17 oracle pins). The r13 ADVICE named the failure mode this
    * curve quantifies: under drop, a pair is lost when EVERY band it
    * collides in is over cap, so tightening the cap trades candidate
    * volume against exactly-measurable recall. One row per cap plus the
    * uncapped ceiling, all against the same exact-cosine truth — read
    * beside e23's occupancy report (which predicts WHERE the cap bites)
    * this is the tuning table for the cap lever, and a flat recall
    * column is itself the measured "rotate re-spreads the keys so the
    * cap is inert on this corpus" claim.
    */
  def signBandCapSweep(
      emb: DataFrame,
      caps: Seq[Option[Int]] = Seq(Some(4), Some(8), Some(64), None),
      dim: Int = 64, cosineThreshold: Double = 0.999,
      maxEvalRows: Long = 50000L, sampleOverMax: Boolean = false): DataFrame = {
    val e = boundEvalInput(emb, "vec_id", maxEvalRows, sampleOverMax, "d20e")
    val vecs = e.select(col("vec_id").as("id"), col("embedding").as("v"),
      Similarity.norm(col("embedding")).as("nrm"))
    val truthE = graft.util.CacheScope.persist(
      vecs.as("a").join(vecs.as("b"), col("a.id") < col("b.id"))
        .filter(Similarity.dot(col("a.v"), col("b.v")) /
          (col("a.nrm") * col("b.nrm")) >= cosineThreshold)
        .select(col("a.id").as("lo"), col("b.id").as("hi")))
    caps.map { cap =>
      val name = cap.fold("sign_band_uncapped")(c => s"sign_band_cap$c")
      val cand = Similarity.signBandCandidatePairs(e, dim,
          rotate = true, maxBucket = cap, saltOverCap = false)
        .select(pairKey(col("id_a"), col("id_b")).as("p"))
        .select(col("p.lo").as("lo"), col("p.hi").as("hi"))
      scoreScreen(name, truthE, cand)
    }.reduce(_ unionByName _)
  }

  /** The d17 report: the blocking screens against their exact ground
    * truths. `docs` / `emb` are the caller-built fixtures (planted
    * near-dups), bounded by [[boundEvalInput]] before any quadratic
    * stage runs.
    */
  def screenQuality(
      docs: DataFrame, emb: DataFrame,
      shingleN: Int = 3, jaccardThreshold: Double = 0.5,
      minhashK: Int = 16, minhashBands: Int = 4,
      simBits: Int = 16, simMaxHamming: Int = 3,
      dim: Int = 64, cosineThreshold: Double = 0.999,
      maxEvalRows: Long = 50000L,
      sampleOverMax: Boolean = false): DataFrame = {
    val d = boundEvalInput(docs, "doc_id", maxEvalRows, sampleOverMax, "d17d")
    val e = boundEvalInput(emb, "vec_id", maxEvalRows, sampleOverMax, "d17e")
    val truthText = graft.util.CacheScope.persist(
      exactJaccardTruth(d, shingleN, jaccardThreshold))
    val mh = scoreScreen("minhash_lsh_md5",
      truthText, md5MinhashLshCandidates(d, minhashK, minhashBands, shingleN))
    // ONE token-md5 pass feeds both SimHash key widths: the 16- and
    // 64-bit screens vote over the same per-occurrence hashes, so
    // computing the (id, h) table twice was a duplicated tokenize+md5
    // corpus pass (guide §2.4).
    val toksH = graft.util.CacheScope.persist(
      md5TokenHashes(d, "doc_id", "text"))
    val sim = scoreScreen("simhash_md5",
      truthText, simhashBlockedCandidates(
        md5SimhashKeysFromToks(toksH, simBits), simBits, simMaxHamming))
    // The 64-bit variant the 16-bit row's precision collapse argues for
    // (same hamming budget, 16-bit pigeonhole blocks): measured side by
    // side so the key-width decision is a read-off, not a guess.
    val sim64 = scoreScreen("simhash64_md5",
      truthText, simhashBlockedCandidates(
        md5SimhashKeysFromToks(toksH, 64), 64, simMaxHamming))
    // Embedding truth: exact all-pairs cosine — THE bounded-quadratic
    // eval pass (size enforced above).
    val vecs = e.select(col("vec_id").as("id"), col("embedding").as("v"),
      Similarity.norm(col("embedding")).as("nrm"))
    val truthE = graft.util.CacheScope.persist(
      vecs.as("a").join(vecs.as("b"), col("a.id") < col("b.id"))
        .filter(Similarity.dot(col("a.v"), col("b.v")) /
          (col("a.nrm") * col("b.nrm")) >= cosineThreshold)
        .select(col("a.id").as("lo"), col("b.id").as("hi")))
    // The CANDIDATE set straight from the band join — not signBandEdges
    // filtered at a >= −1 sentinel, which would drop a NaN-cosine
    // (zero-norm) pair that the DuckDB mirror keeps (r13 ADVICE).
    // saltOverCap = false pins the DROP path the oracle mirrors.
    def sbCand(bandBits: Int): DataFrame =
      Similarity.signBandCandidatePairs(e, dim,
          rotate = true, maxBucket = Some(64), saltOverCap = false,
          bandBits = bandBits)
        .select(pairKey(col("id_a"), col("id_b")).as("p"))
        .select(col("p.lo").as("lo"), col("p.hi").as("hi"))
    val sb = scoreScreen("sign_band", truthE, sbCand(8))
    // The band-width lever measured on the same truth: 16-bit bands =
    // 65,536 keys (≈256× lower random occupancy per bucket) but only
    // dim/16 bands (half the chances to collide) — the frontier row the
    // cap-sizing e23 report pairs with.
    val sb16 = scoreScreen("sign_band_16", truthE, sbCand(16))
    mh.unionByName(sim).unionByName(sim64).unionByName(sb).unionByName(sb16)
  }
}
