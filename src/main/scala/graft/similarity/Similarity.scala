package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.CacheScope.CheckpointOps

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force cosine top-k is the exactness baseline: broadcast the (small)
  * query set, one pass over the corpus, per-query top-k via window — no
  * corpus shuffle beyond the final k rows. The scale path is random-
  * hyperplane LSH: a deterministic bucket id per vector, co-partitioned
  * bucket joins, candidates only within buckets — at 100 TB the bucket key
  * is also the natural partition/bucketing column for the stored table.
  */
object Similarity {

  /** Double-precision dot product, sequential over the array — the same
    * element order DuckDB's list_dot_product uses, so results are
    * bit-identical and oracle-checkable. Backed by the native codegen
    * [[graft.functions.DotProduct]] expression; [[dotHof]] is the
    * bit-equivalent higher-order-function form kept as the cross-check
    * (HOF lambdas evaluate interpreted — too slow for the pair-join loop).
    */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftnative.DotProduct(a, b)

  /** The zip_with/aggregate formulation dot() is verified against. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"), (x, y) => x * y),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact per-query top-k over a candidate set with columns
    * (query_id, neighbor_id, cosine [, extra...]), ordered cosine desc then
    * neighbor_id asc — as a bounded-heap aggregation, NOT a row_number
    * window: the window form funnels every candidate of a query into a
    * single task; [[org.apache.spark.sql.graftnative.TopK]] caps the
    * shuffle at k rows per mapper per query and the final merge at
    * k * mappers. The sort key is (-cosine, neighbor_id): double negation
    * is bit-exact, so results hash-match the window form (pinned by the e1
    * oracle and SimilaritySpec).
    *
    * NaN cosines (zero-norm vectors: 0/0) are dropped before ranking. The
    * window form and the heap would otherwise DISAGREE on them — a
    * `cosine DESC` window ranks NaN first (Spark orders NaN as largest)
    * while the heap's neg_cosine key sorts it last — so neither order is
    * meaningful and zero-norm candidates are excluded outright.
    */
  private def topKPerQuery(cand: DataFrame, k: Int, extra: Seq[String] = Nil): DataFrame = {
    val item = struct(
      negate(col("cosine")).as("neg_cosine") +:
        col("neighbor_id").as("neighbor_id") +:
        extra.map(col): _*)
    cand
      .filter(!isnan(col("cosine")))
      .groupBy("query_id")
      .agg(org.apache.spark.sql.graftnative.TopK.collectTopK(item, k, reverse = true).as("__top"))
      .select(col("query_id"), posexplode(array_sort(col("__top"))).as(Seq("__pos", "__item")))
      .select(
        Seq(
          col("query_id"),
          (col("__pos") + 1).cast("long").as("rank"),
          col("__item.neighbor_id").as("neighbor_id"),
          negate(col("__item.neg_cosine")).as("cosine")) ++
          extra.map(e => col(s"__item.$e").as(e)): _*)
  }

  /** Exact top-k neighbors for each query vector (brute force).
    * queries/corpus: (idCol, vecCol). Excludes self-matches.
    */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // Norms are computed once per input row, not per pair — the join
    // boundary stops the optimizer from inlining them into the pair loop,
    // which would triple the per-candidate flops.
    val q = queries.select(
      col(idCol).as("query_id"), col(vecCol).as("q_vec"), norm(col(vecCol)).as("q_norm"))
    val c = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"), norm(col(vecCol)).as("c_norm"))
    val cand = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", dot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")))
    topKPerQuery(cand, k)
  }

  /** FILTERED exact top-k: each query's neighbors drawn only from corpus
    * rows matching it on `filterCols` (the tenant/label/language
    * constraint of every production vector search). The filter is a
    * PRE-filter by construction — it becomes the JOIN KEY, so the pair
    * loop never scores an ineligible vector and the plan is a hash join
    * on the predicate instead of the unfiltered broadcast cross product.
    * The alternative (post-filtering an unfiltered top-k) silently
    * underfills k whenever fewer than k of the global top score rows
    * match — the classic filtered-ANN correctness trap; this never does.
    *
    * At IVF scale the same rule holds: make the filter column part of the
    * stored table's partition key next to the cell id, and the probe
    * prunes to (filter, cell) — composition left to the caller.
    */
  def filteredTopK(
      queries: DataFrame, corpus: DataFrame, k: Int, filterCols: Seq[String],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(filterCols.nonEmpty, "filterCols must be non-empty; use bruteForceTopK")
    val q = queries.select(
      filterCols.map(col) ++ Seq(
        col(idCol).as("query_id"), col(vecCol).as("q_vec"),
        norm(col(vecCol)).as("q_norm")): _*)
    val c = corpus.select(
      filterCols.map(col) ++ Seq(
        col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
        norm(col(vecCol)).as("c_norm")): _*)
    val cand = c.join(broadcast(q), filterCols)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", dot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")))
    topKPerQuery(cand, k, extra = filterCols)
  }

  /** Contrastive-training triplets: for each anchor, its hardest POSITIVE
    * (highest-cosine same-label neighbor, [[filteredTopK]] k=1) and its
    * hardest NEGATIVE (highest-cosine cross-label neighbor,
    * [[hardNegatives]] k=1), with the margin — the (anchor, positive,
    * negative) rows a triplet/InfoNCE trainer actually consumes, and the
    * margin histogram is the curriculum signal (small or negative margin
    * = the informative triplets). Anchors whose label has no second
    * member emit no triplet (inner join) — there is nothing to contrast.
    */
  def contrastiveTriplets(
      anchors: DataFrame, corpus: DataFrame, labelCol: String = "label",
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val pos = filteredTopK(anchors, corpus, k = 1, filterCols = Seq(labelCol),
        idCol, vecCol)
      .select(col("query_id").as("anchor_id"), col(labelCol).as("label"),
        col("neighbor_id").as("pos_id"), col("cosine").as("pos_cosine"))
    val neg = hardNegatives(anchors, corpus, k = 1, labelCol, idCol, vecCol)
      .select(col("query_id").as("anchor_id"),
        col("neighbor_id").as("neg_id"), col("neg_label"),
        col("cosine").as("neg_cosine"))
    pos.join(neg, Seq("anchor_id"))
      .withColumn("margin", col("pos_cosine") - col("neg_cosine"))
  }

  /** Hard-negative mining for contrastive training: each query's top-k
    * most-similar corpus rows with a DIFFERENT label — the "hardest"
    * negatives are the highest-cosine wrong-label neighbors. The exact
    * complement of [[filteredTopK]]'s same-label constraint; unlike that
    * equi-join, label INEQUALITY can't be a join key, so this keeps
    * [[bruteForceTopK]]'s broadcast-queries shape and filters the pair
    * loop (at IVF scale: probe cells as usual and drop same-label rows
    * before the heap — the filter is still pre-TopK, so k never
    * underfills against eligible candidates). Output carries both labels
    * for auditability.
    */
  def hardNegatives(
      queries: DataFrame, corpus: DataFrame, k: Int, labelCol: String = "label",
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(
      col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      norm(col(vecCol)).as("q_norm"), col(labelCol).as("q_label"))
    val c = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
      norm(col(vecCol)).as("c_norm"), col(labelCol).as("neg_label"))
    val cand = c.crossJoin(broadcast(q))
      .filter(col("neg_label") =!= col("q_label"))
      .withColumn("cosine", dot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")))
    topKPerQuery(cand, k, extra = Seq("q_label", "neg_label"))
  }

  // -------------------------------------------------------------------
  // Scalar quantization (SQ8): one byte per dimension against per-dim
  // [min, max] ranges learned from the corpus — the memory-bound ANN
  // point between full-precision brute force (e1, 4 bytes/dim) and
  // product quantization (e9, ~bits/dim): 4x less scan IO with
  // near-exact recall, decoded on the fly inside the scan projection.
  //
  //   code_d = min(floor((v_d - min_d) * 255 / (max_d - min_d)), 255)
  //
  // floor, not round — no halfway cases, so a SQL mirror agrees
  // bit-for-bit. Constant dimensions (range 0) encode to 0 and decode
  // exactly to min_d. Scoring is ASYMMETRIC (full-precision query vs
  // decoded corpus vector) — the standard SQ setup.
  //
  // Scale shape: the stats pass is one posexplode + dim-row groupBy
  // packed into ONE broadcast row; encode/decode are row-local
  // projections of that row (accounted BNLJ); scoring keeps
  // bruteForceTopK's broadcast-queries + bounded-heap shape. At 100 TB
  // the CODES table is what you store (train stats on a sample, freeze
  // them with the index); this demo query carries encode+decode in one
  // plan so the oracle can see the whole round trip.

  /** One row: (mins: array<double>, ranges: array<double>) per dimension,
    * positions aligned with the vector layout.
    */
  def sq8Stats(corpus: DataFrame, vecCol: String = "embedding"): DataFrame = {
    val dims = corpus
      .select(posexplode(col(vecCol).cast("array<double>")).as(Seq("i", "v")))
      .groupBy("i").agg(min("v").as("mn"), max("v").as("mx"))
    dims
      .agg(
        array_sort(collect_list(struct(col("i"), col("mn")))).as("__mn"),
        array_sort(collect_list(struct(col("i"), col("mx")))).as("__mx"))
      .select(
        transform(col("__mn"), s => s.getField("mn")).as("mins"),
        zip_with(
          transform(col("__mn"), s => s.getField("mn")),
          transform(col("__mx"), s => s.getField("mx")),
          (mn, mx) => mx - mn).as("ranges"))
  }

  /** (idCol, codes: array<long> in [0,255]) — `stats` is [[sq8Stats]]'
    * one-row output, broadcast into the per-row projection.
    */
  def sq8Encode(
      df: DataFrame, stats: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    df.crossJoin(broadcast(stats))
      .select(
        col(idCol),
        zip_with(
          zip_with(col(vecCol).cast("array<double>"), col("mins"), (v, m) => v - m),
          col("ranges"),
          (d, r) => when(r === 0.0, 0L)
            .otherwise(least(floor(d * 255 / r), lit(255L)))).as("codes"))

  /** Decode codes back to doubles: min_d + code_d * range_d / 255. */
  def sq8Decode(
      codes: DataFrame, stats: DataFrame,
      idCol: String = "vec_id", codesCol: String = "codes"): DataFrame =
    codes.crossJoin(broadcast(stats))
      .select(
        col(idCol),
        zip_with(
          zip_with(col(codesCol), col("ranges"), (c, r) => c * r / 255.0),
          col("mins"),
          (x, m) => m + x).as("dec_vec"))

  /** Asymmetric SQ8 top-k: full-precision queries scored against the
    * encode→decode round trip of the corpus. Same output shape as
    * [[bruteForceTopK]] (query_id, rank, neighbor_id, cosine).
    */
  def sq8TopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // Persisted: the one-row stats frame feeds BOTH the encode and the
    // decode broadcast, and each broadcast build would otherwise re-run
    // the full posexplode+per-dim min/max corpus pass (guide §2.4 — the
    // e13/e17 plans showed the stats subtree twice).
    val stats = graft.util.CacheScope.persist(sq8Stats(corpus, vecCol))
    val dec = sq8Decode(sq8Encode(corpus, stats, idCol, vecCol), stats, idCol)
      .select(
        col(idCol).as("neighbor_id"), col("dec_vec").as("c_vec"),
        norm(col("dec_vec")).as("c_norm"))
    val q = queries.select(
      col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("q_vec"),
      norm(col(vecCol)).as("q_norm"))
    val cand = dec.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine",
        dot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")))
    topKPerQuery(cand, k)
  }

  // -------------------------------------------------------------------
  // Binary sign embeddings: pack each vector's sign pattern into
  // ceil(dim/32) non-negative long words and rank by Hamming distance
  // (popcount of XOR) — the 32x-compression retrieval tier below SQ8.
  // 32 bits per word, NOT 64: bit 63 is the long sign bit, and keeping
  // words non-negative keeps every engine's integer semantics (and ANSI
  // overflow rules) out of the picture. Bits within a word are disjoint
  // powers of two, so their SUM equals their OR — summing makes the pack
  // exactly mirrorable in SQL with no bit-aggregate needed.

  /** One bit-packed word: signs of `vec[w*32 .. w*32+bits-1]`. 2^i via
    * pow(2.0, i) — exact in double through i=31 — because shiftleft's
    * Scala signature wants a literal shift and the lambda index is a
    * column.
    */
  private def signWord(vec: Column, w: Int, bits: Int): Column =
    aggregate(
      zip_with(
        slice(vec.cast("array<double>"), w * 32 + 1, bits),
        sequence(lit(0L), lit(bits - 1L)),
        (v, i) => when(v > 0.0, pow(lit(2.0), i).cast("long")).otherwise(0L)),
      lit(0L),
      (acc, b) => acc + b)

  /** (idCol, w0..w{n-1}): the packed sign signature. At 100 TB this is
    * the STORED form — 8 bytes per 64 dims vs 256 for float32.
    *
    * `dim` is cross-checked against each vector's actual length and a
    * mismatch FAILS LOUDLY: an understated dim would silently ignore tail
    * dims and an overstated one would zip_with-null-pad them into sign
    * bits of 0 — plausible-but-wrong Hamming distances, the worst failure
    * mode. Nulls pass through (null words), matching the rest of the ANN
    * family's null contract.
    */
  def signPack(
      df: DataFrame, dim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val words = (dim + 31) / 32
    val vec = when(col(vecCol).isNull || size(col(vecCol)) === dim, col(vecCol))
      .otherwise(raise_error(concat(
        lit(s"signPack: dim=$dim but vector length "),
        size(col(vecCol)).cast("string"))))
    df.select(
      col(idCol) +: (0 until words).map { w =>
        signWord(vec, w, math.min(32, dim - w * 32)).as(s"w$w")
      }: _*)
  }

  /** Deterministic sign-spectrum DECORRELATION before sign packing: the
    * Walsh–Hadamard transform with a fixed ±1 diagonal pre-flip,
    * y_i = Σ_j x_j · s_j · (-1)^popcount(i & j), s_j = (-1)^popcount(j·K)
    * for the fixed odd constant K = 2654435769 (the 32-bit golden-ratio
    * multiplier). Real embedding corpora are ANISOTROPIC — a dominant
    * direction concentrated on a few coordinates pins those sign bits
    * identically across the corpus, and any 8-bit band made of pinned
    * bits degenerates to ONE (band, key) bucket: the N²-per-bucket hot
    * spot [[signBandScoredPairs]]'s cap guards against. H·D spreads a
    * concentrated direction's energy across all `dim` coordinates (each
    * output coordinate mixes every input), so per-coordinate bias drops
    * below the noise floor and band keys re-spread. Unlike seeded random
    * rotations this is a FIXED integer-indexed transform: both engines
    * evaluate the same coefficient formula, the inner product uses the
    * same sequential order as [[dot]]/list_dot_product, and the whole
    * candidate stage stays under the DuckDB oracle.
    *
    * Scaling is irrelevant downstream (only signs are consumed; exact
    * cosine always runs on ORIGINAL vectors), so no 1/√dim factor.
    * An exact duplicate (or any positive scalar multiple) maps to a
    * positive multiple — H·D·(c·x) = c·(H·D·x) — so dup pairs still
    * collide in EVERY band after decorrelation. O(dim²) per row in
    * whole-stage codegen; at larger dims a native blocked-WHT expression
    * is the lever (kept naive here so the summation order is
    * SQL-mirrorable term by term).
    */
  def hdDecorrelate(vec: Column, dim: Int): Column = {
    require(dim > 0 && (dim & (dim - 1)) == 0,
      s"hdDecorrelate needs a power-of-two dim, got $dim")
    transform(sequence(lit(0L), lit(dim - 1L)), i =>
      aggregate(
        zip_with(vec.cast("array<double>"), sequence(lit(0L), lit(dim - 1L)),
          (v, j) => v *
            (lit(1L) - lit(2L) * (bit_count(i.bitwiseAND(j)) % 2)).cast("double") *
            (lit(1L) - lit(2L) * (bit_count(j * lit(2654435769L)) % 2)).cast("double")),
        lit(0.0),
        (acc, v) => acc + v))
  }

  /** Per-band bucket-occupancy report for the sign-band families — the
    * "report what was capped" face of [[knnGraph]]/[[signBandEdges]]'s
    * `maxBucket` knob (the no-silent-caps rule): one row per band with
    * the bucket count, the largest bucket, the closed-form candidate-pair
    * total Σ n·(n−1)/2, and — under `maxBucket` — how many buckets/rows/
    * pairs the cap would drop. Run this BEFORE a 100 TB graph build to
    * size the cap; the whole report is one groupBy over the (≤ dim/8 ×
    * 256)-bucket table, never the pair join itself.
    */
  def signBandBucketStats(
      corpus: DataFrame, dim: Int, maxBucket: Option[Int] = None,
      rotate: Boolean = false,
      idCol: String = "vec_id", vecCol: String = "embedding",
      bandBits: Int = 8): DataFrame = {
    val bands = signBands(corpus, dim, idCol, vecCol, rotate, bandBits)
    val cap = lit(maxBucket.map(_.toLong).getOrElse(Long.MaxValue))
    // Pair counts are INTEGER arithmetic (`div 2`; n(n−1) is even so the
    // halving is exact) — Spark's `/` is double division, which loses
    // exactness once a bucket passes ~9.4e7 rows (n² > 2^53), precisely
    // the 100 TB pre-build sizing regime this report exists for. Exact
    // up to ~4.3e9 rows per bucket (n(n−1) < 2^63). Mirror `// 2` in
    // the e23 oracle.
    bands.groupBy("band", "key").agg(count(lit(1)).as("n"))
      .groupBy("band").agg(
        count(lit(1)).as("n_buckets"),
        max(col("n")).as("max_bucket"),
        sum(col("n")).as("n_rows"),
        sum(expr("n * (n - 1) div 2")).as("pairs_all"),
        sum(when(col("n") > cap, 1L).otherwise(0L)).as("buckets_capped"),
        sum(when(col("n") > cap, col("n")).otherwise(0L)).as("rows_capped"),
        sum(when(col("n") > cap, expr("n * (n - 1) div 2"))
          .otherwise(lit(0L))).as("pairs_capped"))
      .orderBy("band")
  }

  /** Hamming top-k over packed sign signatures: popcount of per-word XOR,
    * summed — integer-exact, so fully SQL-mirrorable unlike the
    * hash-seeded LSH family. Ties break toward the lower neighbor id.
    * Scale shape: broadcast packed queries against the packed corpus scan
    * (8 B/row), bounded-heap top-k — the cheap first stage of a binary
    * retrieval pipeline ([[hammingRefinedTopK]] is the full two-stage).
    */
  def hammingTopK(
      queries: DataFrame, corpus: DataFrame, k: Int, dim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val words = (dim + 31) / 32
    val q = signPack(queries, dim, idCol, vecCol)
      .select(col(idCol).as("query_id") +:
        (0 until words).map(w => col(s"w$w").as(s"qw$w")): _*)
    val c = signPack(corpus, dim, idCol, vecCol)
      .select(col(idCol).as("neighbor_id") +:
        (0 until words).map(w => col(s"w$w").as(s"cw$w")): _*)
    val cand = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("hamming",
        (0 until words)
          .map(w => bit_count(col(s"qw$w").bitwiseXOR(col(s"cw$w"))))
          .reduce(_ + _).cast("long"))
    val item = struct(col("hamming").as("hamming"), col("neighbor_id").as("neighbor_id"))
    cand
      .groupBy("query_id")
      .agg(org.apache.spark.sql.graftnative.TopK
        .collectTopK(item, k, reverse = true).as("__top"))
      .select(col("query_id"), posexplode(array_sort(col("__top"))).as(Seq("__pos", "__it")))
      .select(
        col("query_id"),
        (col("__pos") + 1).cast("long").as("rank"),
        col("__it.neighbor_id").as("neighbor_id"),
        col("__it.hamming").as("hamming"))
  }

  /** Approximate k-NN GRAPH over the whole corpus — top-`k` cosine
    * neighbors for EVERY vector, the batch artifact SemDeDup-style
    * pipelines, graph-based rerankers and cluster diagnostics consume.
    * All-queries brute force would be an N² broadcast loop; instead
    * candidate pairs are vectors agreeing on at least one 8-bit SIGN BAND
    * (byte `b` of the packed [[signPack]] signature — dim/8 bands): the
    * bands table self-joins as an EQUI-join on (band, key), the classic
    * LSH-banding shape (d2) with ~N²/256 expected pairs per band instead
    * of all-pairs, and only the deduped candidate pairs pay the exact
    * cosine re-rank (per-vector norms computed once, not per pair).
    * Per-vector top-k is the bounded heap. Unlike the seeded-hyperplane
    * families every step here is deterministic integer/IEEE math — sign
    * bits, popcount-free band keys, e1's cosine — so the whole graph
    * build sits under the DuckDB oracle.
    *
    * At 100 TB: the bands join shuffles (band, key)-partitioned. Hot
    * buckets (anisotropic corpora pin sign bits — the r12 skew exposure)
    * are handled by the `maxBucket` cap with `saltOverCap` splitting
    * (BOTH default ON — over-cap buckets degrade to ~1/s of their pairs
    * instead of dropping, bounding work at n·cap/2 per bucket; reported
    * via [[signBandBucketStats]], never silent) and the `rotate`
    * decorrelator ([[hdDecorrelate]], spreads the common direction so
    * the cap rarely bites); occupancy/recall trade via `bandBits` (2-byte
    * bands: 256× fewer collisions per bucket, half as many bands) —
    * all four levers leave the join shape intact.
    */
  def knnGraph(
      corpus: DataFrame, k: Int, dim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      rotate: Boolean = false,
      maxBucket: Option[Int] = Some(4096),
      saltOverCap: Boolean = true,
      bandBits: Int = 8): DataFrame = {
    // Persisted: the symmetrization union reads the scored-pair table in
    // BOTH directions — un-persisted, the entire band/self-join/cosine
    // pipeline executed twice (guide §2.4; the 48-node duplicated subtree
    // the round-20 DupAudit flagged on every knn-graph face).
    val scored = graft.util.CacheScope.persist(signBandScoredPairs(
      corpus, dim, idCol, vecCol, rotate, maxBucket, saltOverCap, bandBits))
    val directed = scored
      .select(col("id_a").as("query_id"), col("id_b").as("neighbor_id"), col("cosine"))
      .unionByName(scored
        .select(col("id_b").as("query_id"), col("id_a").as("neighbor_id"), col("cosine")))
    topKPerQuery(directed, k)
  }

  /** Sign-band-blocked NEAR-DUP EDGES: candidate pairs from the band
    * self-join, kept when exact cosine >= `minCosine` — the edge list a
    * graph-based semantic dedup (SemDeDup by collapse: e22) feeds into
    * connected components. Same shape and determinism as [[knnGraph]];
    * only the tail differs (threshold filter instead of per-vertex
    * top-k).
    */
  def signBandEdges(
      corpus: DataFrame, dim: Int, minCosine: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      rotate: Boolean = false,
      maxBucket: Option[Int] = Some(4096),
      saltOverCap: Boolean = true,
      bandBits: Int = 8): DataFrame =
    signBandScoredPairs(
        corpus, dim, idCol, vecCol, rotate, maxBucket, saltOverCap, bandBits)
      .filter(col("cosine") >= minCosine)

  /** The exploded (id, band, key) table both sign-band consumers and the
    * [[signBandBucketStats]] report share; `rotate` runs
    * [[hdDecorrelate]] before packing (signs only — downstream cosine
    * always reads the original vectors).
    */
  private def signBands(
      corpus: DataFrame, dim: Int,
      idCol: String, vecCol: String, rotate: Boolean,
      bandBits: Int = 8): DataFrame = {
    require(bandBits == 8 || bandBits == 16,
      s"bandBits must be 8 or 16, got $bandBits")
    require(dim % bandBits == 0,
      s"dim must be a multiple of bandBits=$bandBits, got $dim")
    val nBands = dim / bandBits
    val bandsPerWord = 32 / bandBits
    val keyMask = (1L << bandBits) - 1
    val nWords = (dim + 31) / 32
    // Rotated packing runs the FUSED native expression — the HOF
    // hdDecorrelate form is interpreted and re-evaluates the O(dim²)
    // rotation per downstream reference (measured 4x the whole query's
    // wall on the sf0.1 fixture); SimilaritySpec pins the differential.
    val packed =
      if (rotate)
        corpus
          .select(col(idCol),
            org.apache.spark.sql.graftnative.HdSignPack(
              col(vecCol).cast("array<double>"), dim).as("__wds"))
          .select(col(idCol) +:
            (0 until nWords).map(w => col("__wds").getItem(w).as(s"w$w")): _*)
      else signPack(corpus.select(col(idCol), col(vecCol)), dim, idCol, vecCol)
    packed.select(
      col(idCol).as("id"),
      explode(array((0 until nBands).map { b =>
        struct(lit(b).as("band"),
          shiftright(col(s"w${b / bandsPerWord}"), (b % bandsPerWord) * bandBits)
            .bitwiseAND(lit(keyMask)).as("key"))
      }: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))
  }

  /** Shared candidate stage of [[knnGraph]]/[[signBandEdges]]: the
    * unordered pair set (id_a < id_b) agreeing on >= 1 of the
    * dim/bandBits sign bands — no cosine attached, so it is also the
    * right surface when every CANDIDATE must survive regardless of
    * score definedness (a zero-norm vector's cosine is NaN; d17 reads
    * this method directly rather than filtering on a >= −1 sentinel).
    *
    * SKEW GUARDS (the 100 TB exposure named in r12): band keys take only
    * 2^bandBits values, and on anisotropic corpora — a dominant shared
    * direction pinning a band's sign bits — a hot (band, key) bucket
    * degenerates toward N²-per-bucket pairs on one task pair. The
    * levers, all SQL-mirrorable so the oracle composition survives:
    *   - `maxBucket` (DEFAULT ON at 4096, the d5 df-cap analog) with
    *     `saltOverCap` (DEFAULT ON — r13 ADVICE): an over-cap bucket is
    *     SPLIT into s = ⌈n/cap⌉ deterministic salt groups (pmod(id, s) —
    *     no seeds, SQL-mirrorable) and pairs form only within a group:
    *     per-bucket work drops from n²/2 to ≤ n·cap/2 (linear in n)
    *     while ~1/s of the bucket's pairs survive. Under-cap buckets get
    *     s = 1 (no behavior change), so the default cap+salt is inert on
    *     sign-balanced corpora.
    *   - `saltOverCap = false` switches to the DROP path: over-cap
    *     buckets are excluded entirely and per-bucket work is
    *     hard-bounded by cap²/2. CAVEAT (why drop is not the default): a
    *     pair is lost if EVERY band it collides in is over cap — exact
    *     dups share ALL bands, so a duplicate CLUSTER larger than the
    *     cap pins all of its own buckets over cap and loses every one of
    *     its pairs. Never silent either way: [[signBandBucketStats]]
    *     reports exactly which bands/buckets/pair-counts a cap affects —
    *     run it (e23) before choosing cap and path.
    *   - `rotate` ([[hdDecorrelate]]): spreads a concentrated common
    *     direction across all coordinates before packing, re-spreading
    *     the band keys so the cap rarely bites in the first place.
    *   - `bandBits` (8 or 16): 16-bit bands give 65,536 keys per band —
    *     ~256× fewer random collisions per bucket (the occupancy lever)
    *     at dim/16 bands instead of dim/8 (fewer chances to collide —
    *     the recall trade d17's sign_band_16 row measures).
    */
  def signBandCandidatePairs(
      corpus: DataFrame, dim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      rotate: Boolean = false,
      maxBucket: Option[Int] = Some(4096),
      saltOverCap: Boolean = true,
      bandBits: Int = 8): DataFrame = {
    // Persisted at both layers (guide §2.4): bandsAll feeds the bucket-size
    // aggregate AND the capped table's build; the capped table is then BOTH
    // legs of the pair self-join — un-persisted, the sign-pack explode ran
    // up to 4x per call. The bands table is nBands narrow rows per vector,
    // far smaller than the vectors it derives from.
    val bandsAll = graft.util.CacheScope.persist(
      signBands(corpus, dim, idCol, vecCol, rotate, bandBits))
    // The bucket-size table is at most (dim/8)·256 rows — broadcast
    // anti-join / size-join, no extra shuffle of the bands table.
    val bands = graft.util.CacheScope.persist(maxBucket.fold(bandsAll) { cap =>
      if (saltOverCap) {
        val sizes = bandsAll.groupBy("band", "key")
          .agg(count(lit(1)).as("__n"))
        bandsAll.join(broadcast(sizes), Seq("band", "key"))
          .withColumn("salt",
            pmod(col("id"), expr(s"(__n + ${cap - 1}) div $cap")))
          .drop("__n")
      } else {
        val over = bandsAll.groupBy("band", "key")
          .agg(count(lit(1)).as("__n")).filter(col("__n") > cap)
          .select("band", "key")
        bandsAll.join(broadcast(over), Seq("band", "key"), "left_anti")
      }
    })
    val saltEq =
      if (saltOverCap && maxBucket.isDefined) col("a.salt") === col("b.salt")
      else lit(true)
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          saltEq && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** [[signBandCandidatePairs]] plus e1's exact cosine per pair
    * (per-vector norms computed once, not per pair) — the shared scored
    * stage of [[knnGraph]] and [[signBandEdges]]. NOTE a zero-norm
    * vector yields cosine NaN, which fails every `>=` comparison —
    * consumers that must keep every CANDIDATE (d17's screen eval) read
    * [[signBandCandidatePairs]] directly instead of filtering on a
    * sentinel threshold.
    */
  private def signBandScoredPairs(
      corpus: DataFrame, dim: Int,
      idCol: String, vecCol: String,
      rotate: Boolean = false,
      maxBucket: Option[Int] = Some(4096),
      saltOverCap: Boolean = true,
      bandBits: Int = 8): DataFrame = {
    val pairs = signBandCandidatePairs(
      corpus, dim, idCol, vecCol, rotate, maxBucket, saltOverCap, bandBits)
    val vecs = corpus.select(
      col(idCol).as("id"), col(vecCol).as("v"), norm(col(vecCol)).as("n"))
    pairs
      .join(vecs.select(col("id").as("id_a"), col("v").as("va"), col("n").as("na")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("v").as("vb"), col("n").as("nb")), Seq("id_b"))
      .withColumn("cosine", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .select("id_a", "id_b", "cosine")
  }

  /** Two-stage binary retrieval: Hamming shortlist (`kShortlist`) →
    * exact cosine re-rank to `k` — the standard binary-embedding serving
    * shape: the popcount scan touches 8 B/vector; full-precision vectors
    * are fetched only for the bounded shortlist. Both stages are
    * integer/IEEE-exact, so the whole pipeline is SQL-mirrorable.
    */
  def hammingRefinedTopK(
      queries: DataFrame, corpus: DataFrame, k: Int, kShortlist: Int, dim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(kShortlist >= k, s"kShortlist ($kShortlist) must be >= k ($k)")
    val shortlist = hammingTopK(queries, corpus, kShortlist, dim, idCol, vecCol)
      .select("query_id", "neighbor_id")
    rerankExact(shortlist, queries, corpus, k, idCol, vecCol)
  }

  /** Matryoshka-style prefix-dimension retrieval (Kusupati et al. 2022):
    * coarse cosine ranking in the first `prefixDim` dimensions — an MRL
    * embedding front-loads information, so a 16-dim prefix scan costs
    * dim/prefixDim less IO/flops — then exact full-dimension re-rank of
    * the bounded shortlist. The dimension-axis sibling of [[sq8TopK]]
    * (precision axis) and [[hammingRefinedTopK]] (bit axis); like them,
    * every stage is IEEE-exact and SQL-mirrorable.
    */
  def prefixRefinedTopK(
      queries: DataFrame, corpus: DataFrame, k: Int, kShortlist: Int,
      prefixDim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(kShortlist >= k, s"kShortlist ($kShortlist) must be >= k ($k)")
    require(prefixDim > 0, s"prefixDim must be positive, got $prefixDim")
    def prefixed(df: DataFrame) = df.select(
      col(idCol), slice(col(vecCol).cast("array<double>"), 1, prefixDim).as(vecCol))
    val shortlist = bruteForceTopK(
        prefixed(queries), prefixed(corpus), kShortlist, idCol, vecCol)
      .select("query_id", "neighbor_id")
    rerankExact(shortlist, queries, corpus, k, idCol, vecCol)
  }

  /** Exact cosine re-rank of a bounded (query_id, neighbor_id) shortlist
    * to the top `k` — shared by every two-stage index here. The full-
    * precision corpus is touched via one equi-join on the shortlist ids.
    */
  private def rerankExact(
      shortlist: DataFrame, queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String, vecCol: String): DataFrame = {
    val q = queries.select(
      col(idCol).as("query_id"), col(vecCol).as("q_vec"), norm(col(vecCol)).as("q_norm"))
    val c = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"), norm(col(vecCol)).as("c_norm"))
    val cand = shortlist
      .join(broadcast(q), Seq("query_id"))
      .join(c, Seq("neighbor_id"))
      .withColumn("cosine",
        dot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")))
    topKPerQuery(cand, k)
  }

  /** Deterministic random hyperplanes (fixed seed) for LSH bucketing. */
  def randomPlanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** LSH bucket id: one sign bit per hyperplane, packed into an int.
    * Capped at 31 planes — bit 32 would wrap the Int shift silently.
    * (2^31 buckets is far past the useful range anyway: probe counts and
    * per-bucket populations, not id width, are the real design bounds.)
    */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column = {
    require(planes.nonEmpty && planes.size <= 31,
      s"lshBucket needs 1..31 planes, got ${planes.size}")
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(vec, typedLit(p.toArray)) > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)
  }

  /** Approximate top-k: candidates restricted to the query's LSH bucket.
    * Trades recall for a bucket-local join — the 1000-executor path where a
    * full cross join is impossible.
    */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame, planes: Seq[Seq[Double]], k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(
      col(idCol).as("query_id"), col(vecCol).as("q_vec"), norm(col(vecCol)).as("q_norm"),
      lshBucket(col(vecCol), planes).as("bucket"))
    val c = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"), norm(col(vecCol)).as("c_norm"),
      lshBucket(col(vecCol), planes).as("bucket"))
    val cand = c.join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", dot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")))
    topKPerQuery(cand, k, extra = Seq("bucket"))
      .select("query_id", "rank", "neighbor_id", "cosine", "bucket")
  }

  /** Multi-probe LSH top-k: each query probes its own bucket PLUS every
    * bucket at hamming distance 1 in sign-bit space (one hyperplane flipped
    * — the buckets a near-boundary neighbor most likely fell into). Recall
    * rises sharply for nPlanes+1 probe buckets per query instead of the
    * many independent hash tables classic LSH needs; corpus-side cost is
    * unchanged (still one bucket id per vector, still a bucket-local join —
    * only the tiny broadcast query side fans out). SimilaritySpec pins
    * recall(multi) >= recall(single) against brute force.
    */
  def lshTopKMultiProbe(
      queries: DataFrame, corpus: DataFrame, planes: Seq[Seq[Double]], k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val nPlanes = planes.size
    val q0 = queries.select(
      col(idCol).as("query_id"), col(vecCol).as("q_vec"), norm(col(vecCol)).as("q_norm"),
      lshBucket(col(vecCol), planes).as("bucket0"))
    // bucket0 plus its nPlanes single-bit flips; a neighbor in several
    // probed buckets must count once, hence the later pair-level distinct
    // via max over duplicate candidates (cosine is identical, so any
    // dedup works — we drop dup rows before scoring).
    val probeBuckets = array(
      (col("bucket0") +: (0 until nPlanes).map(b =>
        col("bucket0").bitwiseXOR(lit(1 << b)))): _*)
    val q = q0
      .select(col("query_id"), col("q_vec"), col("q_norm"),
        explode(probeBuckets).as("bucket"))
    val c = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"), norm(col(vecCol)).as("c_norm"),
      lshBucket(col(vecCol), planes).as("bucket"))
    val cand = c.join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id", "q_vec", "q_norm", "c_vec", "c_norm")
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cosine", dot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")))
    topKPerQuery(cand, k)
  }

  // -------------------------------------------------------------------
  // IVF (inverted-file) ANN: partition the corpus into C cells around
  // centroids; a query probes only its nProbe nearest cells. The build is
  // one broadcast-join pass (n x C x d flops) + one shuffle on the cell id;
  // at 100 TB the cell id doubles as the stored table's partition column, so
  // probing touches nProbe/C of the data — a partition-pruned scan, which is
  // the property LSH buckets can't give a table layout.

  /** Deterministic centroid pick: the C corpus vectors with the smallest
    * id-hash — a reproducible pseudo-random sample, executed as a
    * TakeOrdered (top-C per partition, C merged at the driver), never a
    * global sort. No k-means iterations: sampled centroids are the standard
    * single-pass IVF bootstrap. The only window runs over the C picked rows.
    */
  def ivfCentroids(
      corpus: DataFrame, nCentroids: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val picked = corpus.select(col(idCol).as("cid_src"), col(vecCol).as("centroid_vec"))
      .orderBy(xxhash64(col("cid_src")), col("cid_src"))
      .limit(nCentroids)
    // Dense ids 0..C-1 without a global window (whose "no partition
    // defined" WARN would drown real single-partition regressions; a
    // constant partition key gets folded away by EliminateWindowPartitions):
    // C rows fit one partition by construction, so a single-partition sort +
    // monotonically_increasing_id (= row order within partition 0) is the
    // same deterministic numbering.
    picked
      .coalesce(1)
      .sortWithinPartitions(col("cid_src"))
      .select(
        monotonically_increasing_id().cast("int").as("centroid_id"),
        col("centroid_vec"))
  }

  /** Lloyd's k-means refinement of an initial centroid set. Assignment is
    * by `metric`: "cosine" (spherical k-means — consistent with
    * [[ivfAssign]] and the probe ranking, scale-invariant in the centroid)
    * or "l2" (what PQ subspace codebooks need); update = the plain
    * per-dimension mean of each cell either way. `init` is (centroid_id,
    * centroid_vec); ids survive training, so a cell that goes EMPTY keeps
    * its previous centroid rather than vanishing (the standard guard —
    * k stays k).
    *
    * Scale shape per iteration: broadcast the C centroids, ONE corpus pass
    * (assignment argmax is a map-side-combined max_by, the mean is d
    * map-side-combined avg aggregates — no explode, no window, nothing
    * shuffles but (cell, d partial sums) rows), then a C-row join. The
    * centroid table is `localCheckpoint`ed each round: the loop references
    * it twice per iteration, and lineage would otherwise grow
    * exponentially — the measured driver-stack-overflow trap of every
    * iterative DataFrame algorithm in this repo (see
    * [[graft.dedup.ClusterCollapse]]).
    *
    * Assignment ties break toward the LOWER centroid_id (max_by on a
    * (cos, -centroid_id) struct) so training is deterministic — plain
    * max_by picks arbitrarily on ties, which would make reruns diverge on
    * symmetric data.
    */
  def kmeansIterate(
      corpus: DataFrame, init: DataFrame, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      metric: String = "cosine"): DataFrame = {
    val data = corpus.select(
      lit(0).as("gid"),
      col(idCol).as("id"), col(vecCol).as("vec"), norm(col(vecCol)).as("nrm"))
    kmeansCore(data, init.select(lit(0).as("gid"), col("centroid_id"),
      col("centroid_vec")), iters, metric)
      .drop("gid")
  }

  /** The Lloyd loop itself, generalized to MANY independent k-means
    * problems trained in the same jobs — `gid` keys the problem (a PQ
    * subspace; a constant for plain [[kmeansIterate]]). Per iteration:
    * broadcast all problems' centroids, ONE pass over `data` (the
    * assignment argmax is a map-side-combined max_by per (gid, id), the
    * mean d map-side-combined avgs per (gid, centroid)), then a
    * centroids-sized join. Batching problems into shared passes is the
    * whole point — m subspace codebooks cost the same corpus scans as
    * one.
    *
    * `data` columns: (gid, id, vec, nrm); `init`: (gid, centroid_id,
    * centroid_vec). Both argmax keys are a monotone transform of the true
    * objective: cosine directly; for L2, argmin ‖x−c‖² = argmax 2x·c −
    * c·c (the x·x term is constant per row and drops out — no sqrt, and
    * exact integer arithmetic on integer-valued fixtures). Empty cells
    * keep their previous centroid (left join + coalesce — k stays k).
    * The centroid table is `localCheckpoint`ed each round: the loop
    * references it twice per iteration and lineage would otherwise grow
    * exponentially (the measured driver-stack-overflow trap of every
    * iterative DataFrame algorithm in this repo, see
    * [[graft.dedup.ClusterCollapse]]). Assignment ties break toward the
    * LOWER centroid_id so training is rerun-deterministic.
    */
  private def kmeansCore(
      data: DataFrame, init: DataFrame, iters: Int, metric: String): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(metric == "cosine" || metric == "l2",
      s"metric must be cosine or l2, got $metric")
    // The centroid table is tiny (problems × k rows): keep it ONE
    // partition so each round's eager checkpoint is a single task, and
    // join the equally-tiny means back by broadcast — the loop's only
    // scan-sized work should be the data pass itself.
    var cent = init.select(
      col("gid"),
      col("centroid_id").cast("int").as("centroid_id"),
      transform(col("centroid_vec"), x => x.cast("double")).as("centroid_vec"))
      .coalesce(1)
      .scopedCheckpoint()
    // dims AFTER the init checkpoint: `init`'s lineage is usually a
    // corpus scan (the bootstrap pick), so a head on it would run that
    // scan once for this 1-row metadata job and AGAIN for the checkpoint
    // — measured as a duplicated corpus pass per training call (r10).
    // On the checkpointed k-row table the head is free.
    val dims = cent.select(size(col("centroid_vec"))).head.getInt(0)
    for (_ <- 0 until iters) {
      val withNorm = cent
        .withColumn("c_norm", norm(col("centroid_vec")))
        .withColumn("c_cc", dot(col("centroid_vec"), col("centroid_vec")))
      val key =
        if (metric == "cosine")
          dot(col("vec"), col("centroid_vec")) / (col("nrm") * col("c_norm"))
        else lit(2.0) * dot(col("vec"), col("centroid_vec")) - col("c_cc")
      val assigned = data.join(broadcast(withNorm), Seq("gid"))
        .withColumn("__key", key)
        .groupBy("gid", "id")
        .agg(max_by(
          struct(col("centroid_id"), col("vec")),
          struct(col("__key"), negate(col("centroid_id")).cast("int"))).as("__a"))
        .select(col("gid"),
          col("__a.centroid_id").as("centroid_id"), col("__a.vec").as("vec"))
      val means = assigned.groupBy("gid", "centroid_id")
        .agg(array((0 until dims).map(i => avg(get(col("vec"), lit(i)))): _*).as("__new"))
      val prevCent = cent
      cent = cent.join(broadcast(means), Seq("gid", "centroid_id"), "left_outer")
        .select(
          col("gid"), col("centroid_id"),
          coalesce(col("__new"), col("centroid_vec")).as("centroid_vec"))
        .coalesce(1)
        .scopedCheckpoint()
      // Release round N-1's centroid blocks (tiny here, but the loop
      // contract — at most two live checkpoints — holds engine-wide).
      graft.util.CacheScope.releaseCheckpoint(prevCent)
    }
    cent
  }

  /** Trained IVF centroids: the deterministic [[ivfCentroids]] sample as
    * the k-means++-style bootstrap, refined by `iters` Lloyd rounds.
    */
  def kmeansCentroids(
      corpus: DataFrame, nCentroids: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    kmeansIterate(corpus, ivfCentroids(corpus, nCentroids, idCol, vecCol),
      iters, idCol, vecCol)

  // -------------------------------------------------------------------
  // Product quantization (Jégou/Douze/Schmid, "Product Quantization for
  // Nearest Neighbor Search", TPAMI 2011): split each d-dim vector into m
  // subvectors, learn a ksub-centroid L2 codebook per subspace, store each
  // corpus vector as m small codes (+ its true norm). At 100 TB this is
  // THE memory lever — 64 float dims (256 B) become m=4 codes (4 B) and
  // the scan reads codes, not vectors. Search is asymmetric distance
  // computation (ADC): per query, precompute dot(q_subvec, centroid) for
  // every (subspace, code) — an m·ksub table, broadcast — and a corpus
  // row's approximate dot is the sum of its m table lookups; dividing by
  // the STORED true norm and the query norm gives approximate cosine.

  /** Train the PQ codebook: (subspace, code, centroid_vec) with
    * `code` in 0..ksub-1 per subspace. Deterministic bootstrap (the
    * [[ivfCentroids]] hash-order pick — the SAME ksub ids land in every
    * subspace since the hash ignores the subspace, numbered by sorted id
    * exactly as ivfCentroids numbers them) refined by `iters` L2 Lloyd
    * rounds — all m subspaces JOINTLY via [[kmeansCore]] keyed on the
    * subspace, so training costs one corpus pass per iteration instead
    * of m (the sequential-loop form paid m× the scans and m× the job
    * overhead; at 100 TB the scans are the bill). The exploded subvector
    * projection feeds every iteration, so it persists for the loop
    * (released by the session owner's CacheScope contract).
    */
  def pqCodebook(
      corpus: DataFrame, m: Int, ksub: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      dimsOpt: Option[Int] = None): DataFrame = {
    // A caller that already knows the dimensionality passes it and skips
    // this corpus-lineage metadata job (the PQ family's repeated-head
    // cost, r10 probe).
    val dims = dimsOpt.getOrElse(corpus.select(size(col(vecCol))).head.getInt(0))
    require(m > 0 && dims % m == 0, s"m=$m must divide dims=$dims")
    val dsub = dims / m
    pqCodebookFromSub(
      graft.util.CacheScope.persist(pqSubRows(corpus, m, dsub, idCol, vecCol)),
      ksub, iters)
  }

  /** The shared exploded-subvector table of the PQ family: (id, nrm,
    * subspace, subvec) — one row per (vector, subspace). Built ONCE and
    * persisted by [[pqTopK]] so codebook training and corpus encoding
    * read the same table instead of each re-exploding the corpus (guide
    * §2.4 — e9's plan had the explode subtree twice).
    */
  private def pqSubRows(
      corpus: DataFrame, m: Int, dsub: Int,
      idCol: String, vecCol: String): DataFrame =
    corpus.select(
      col(idCol).as("id"), norm(col(vecCol)).as("nrm"),
      posexplode(array((0 until m).map(j =>
        slice(col(vecCol), j * dsub + 1, dsub)): _*)).as(Seq("subspace", "subvec")))

  /** [[pqCodebook]] over a prebuilt (persisted) [[pqSubRows]] table. The
    * bootstrap pick reads the ids off the subspace-0 slice of the cached
    * table (exactly one row per corpus vector — the same id set, in the
    * same hash order, as the former corpus re-scan).
    */
  private def pqCodebookFromSub(sub: DataFrame, ksub: Int, iters: Int): DataFrame = {
    val data = sub.select(col("subspace").as("gid"), col("id"),
      col("subvec").as("vec"), norm(col("subvec")).as("nrm"))
    val picked = sub.filter(col("subspace") === 0).select("id")
      .orderBy(xxhash64(col("id")), col("id"))
      .limit(ksub)
      .coalesce(1)
      .sortWithinPartitions("id")
      .select(monotonically_increasing_id().cast("int").as("centroid_id"), col("id"))
    val init = data.join(broadcast(picked), Seq("id"))
      .select(col("gid"), col("centroid_id"), col("vec").as("centroid_vec"))
    kmeansCore(data, init, iters, metric = "l2")
      .select(col("gid").as("subspace"), col("centroid_id").as("code"),
        col("centroid_vec"))
  }

  /** Encode the corpus against a codebook: (id, codes array<int>, nrm) —
    * codes[j] = the L2-nearest subspace-j centroid, nrm = the TRUE vector
    * norm kept for cosine denominators (norms don't survive quantization;
    * storing 8 exact bytes beats reconstructing a wrong one).
    *
    * Shape at scale: subvectors explode to m narrow rows per vector, meet
    * the broadcast codebook in an equi-join on subspace, and two
    * map-side-combined aggregations (argmin per (id, subspace), then the
    * m-element code collect per id) — only (id, code) pairs ever shuffle,
    * never vectors. Ties break toward the lower code, mirroring
    * [[kmeansIterate]], so encoding is rerun-deterministic.
    */
  def pqEncode(
      corpus: DataFrame, codebook: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val m = codebook.agg(max(col("subspace"))).head.getInt(0) + 1
    val dsub = codebook.select(size(col("centroid_vec"))).head.getInt(0)
    pqEncodeWith(corpus, codebook, m, dsub, idCol, vecCol)
  }

  private def pqEncodeWith(
      corpus: DataFrame, codebook: DataFrame, m: Int, dsub: Int,
      idCol: String, vecCol: String): DataFrame =
    pqEncodeFromSub(pqSubRows(corpus, m, dsub, idCol, vecCol), codebook)

  /** [[pqEncodeWith]] over a prebuilt [[pqSubRows]] table. */
  private def pqEncodeFromSub(subRows: DataFrame, codebook: DataFrame): DataFrame = {
    val cb = codebook.select(col("subspace"), col("code"), col("centroid_vec"),
      dot(col("centroid_vec"), col("centroid_vec")).as("__cc"))
    subRows.join(broadcast(cb), Seq("subspace"))
      .withColumn("__key",
        lit(2.0) * dot(col("subvec"), col("centroid_vec")) - col("__cc"))
      .groupBy("id", "subspace")
      .agg(
        max_by(col("code"),
          struct(col("__key"), negate(col("code")).cast("int"))).as("code"),
        first(col("nrm")).as("nrm"))
      .groupBy("id")
      .agg(
        transform(
          array_sort(collect_list(struct(col("subspace"), col("code")))),
          s => s.getField("code")).as("codes"),
        first(col("nrm")).as("nrm"))
  }

  /** ADC top-k over a pre-encoded corpus: broadcast the per-query distance
    * table (nq·m·ksub rows — KBs), equi-join the exploded corpus codes,
    * and sum the m partials per (query, neighbor) map-side. The scan cost
    * is m narrow rows per corpus vector; nothing wider than
    * (query, id, double) crosses the shuffle.
    */
  def pqTopKEncoded(
      queries: DataFrame, encoded: DataFrame, codebook: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val m = codebook.agg(max(col("subspace"))).head.getInt(0) + 1
    val dsub = codebook.select(size(col("centroid_vec"))).head.getInt(0)
    pqTopKEncodedWith(queries, encoded, codebook, k, m, dsub, idCol, vecCol)
  }

  private def pqTopKEncodedWith(
      queries: DataFrame, encoded: DataFrame, codebook: DataFrame, k: Int,
      m: Int, dsub: Int, idCol: String, vecCol: String): DataFrame = {
    val adc = queries.select(
      col(idCol).as("query_id"), norm(col(vecCol)).as("q_norm"),
      posexplode(array((0 until m).map(j =>
        slice(col(vecCol), j * dsub + 1, dsub)): _*)).as(Seq("subspace", "q_subvec")))
      .join(codebook, Seq("subspace"))
      .select(col("query_id"), col("q_norm"), col("subspace"), col("code"),
        dot(col("q_subvec"), col("centroid_vec")).as("partial"))
    val corpusCodes = encoded.select(
      col("id").as("neighbor_id"), col("nrm"),
      posexplode(col("codes")).as(Seq("subspace", "code")))
    val scored = corpusCodes
      .join(broadcast(adc), Seq("subspace", "code"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .groupBy("query_id", "neighbor_id")
      .agg(
        sum(col("partial")).as("__dot"),
        first(col("nrm")).as("nrm"),
        first(col("q_norm")).as("q_norm"))
      .withColumn("cosine", col("__dot") / (col("q_norm") * col("nrm")))
    topKPerQuery(scored, k)
  }

  /** End-to-end PQ search: train, encode, ADC — approximate top-k by
    * (quantized) cosine.
    */
  def pqTopK(
      queries: DataFrame, corpus: DataFrame,
      m: Int, ksub: Int, k: Int, trainIters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // The codebook feeds two joins (encode, ADC table); kmeansCore's
    // checkpoints back its branches but the plan above them would re-run
    // per consumer — persist once. m/dsub are known here, so the
    // downstream stages take them as arguments instead of paying four
    // driver-blocking metadata jobs to rediscover them.
    val dims = corpus.select(size(col(vecCol))).head.getInt(0)
    // ONE exploded-subvector pass feeds BOTH codebook training and the
    // corpus encode (guide §2.4 — each re-exploded the corpus before).
    val sub = graft.util.CacheScope.persist(
      pqSubRows(corpus, m, dims / m, idCol, vecCol))
    val codebook = graft.util.CacheScope.persist(
      pqCodebookFromSub(sub, ksub, trainIters))
    pqTopKEncodedWith(queries,
      pqEncodeFromSub(sub, codebook),
      codebook, k, m, dims / m, idCol, vecCol)
  }

  /** Assign every corpus vector to its nearest centroid (by cosine):
    * broadcast the C centroids, one corpus pass, `max_by` argmax — no
    * per-vector shuffle beyond the map-side-combined aggregation.
    */
  def ivfAssign(
      corpus: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(
      col(idCol).as("id"), col(vecCol).as("vec"), norm(col(vecCol)).as("nrm"))
    val cent = centroids.withColumn("c_norm", norm(col("centroid_vec")))
    c.crossJoin(broadcast(cent))
      .withColumn("cos",
        dot(col("vec"), col("centroid_vec")) / (col("nrm") * col("c_norm")))
      .groupBy(col("id"))
      .agg(max_by(col("centroid_id"), col("cos")).as("centroid_id"))
  }

  /** IVF approximate top-k: probe the query's `nProbe` nearest cells, exact
    * cosine re-rank inside them. `nProbe = nCentroids` degrades gracefully
    * to exact brute force (pinned in SimilaritySpec).
    */
  def ivfTopK(
      queries: DataFrame, corpus: DataFrame, nCentroids: Int, nProbe: Int, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      trainIters: Int = 0): DataFrame = {
    // Persisted: the C-row centroid table is consumed by the assignment
    // pass and the probe ranking, and its pick is itself a corpus scan
    // (TakeOrdered) that must not run once per consumer. (The trained
    // variant is already materialized by kmeansIterate's checkpoints.)
    val centroids =
      if (trainIters > 0)
        kmeansCentroids(corpus, nCentroids, trainIters, idCol, vecCol)
      else graft.util.CacheScope.persist(
        ivfCentroids(corpus, nCentroids, idCol, vecCol))
    ivfTopKWith(queries, corpus, centroids, nProbe, k, idCol, vecCol)
  }

  /** [[ivfTopK]] over a PRE-TRAINED (centroid_id, centroid_vec) table —
    * the production path: an index is trained once and served many times,
    * so search must not re-run Lloyd (and an eval comparing IVF variants
    * over the same cells must share one training pass).
    */
  def ivfTopKWith(
      queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      nProbe: Int, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val assignments = ivfAssign(corpus, centroids, idCol, vecCol)

    val q = queries.select(
      col(idCol).as("query_id"), col(vecCol).as("q_vec"), norm(col(vecCol)).as("q_norm"))
    val cent = centroids.withColumn("c_norm", norm(col("centroid_vec")))
    val probeW = Window.partitionBy("query_id")
      .orderBy(col("probe_cos").desc, col("centroid_id").asc)
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("probe_cos",
        dot(col("q_vec"), col("centroid_vec")) / (col("q_norm") * col("c_norm")))
      .withColumn("probe_rank", row_number().over(probeW))
      .filter(col("probe_rank") <= nProbe)
      .select("query_id", "q_vec", "q_norm", "centroid_id")

    val cand = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"), norm(col(vecCol)).as("c_norm"))
      .join(assignments.withColumnRenamed("id", "neighbor_id"), "neighbor_id")
    val scored = cand.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", dot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")))
    topKPerQuery(scored, k)
  }

  // -------------------------------------------------------------------
  // IVF-PQ (Jégou et al. 2011, §V: "non-exhaustive search"): the composed
  // billion-vector layout. Coarse quantizer = the trained IVF cells;
  // within each cell, vectors are stored as PQ codes of their RESIDUAL
  // (x − c_cell) — residuals concentrate near 0, so a ksub-code budget
  // quantizes them far better than raw vectors. A query probes its nProbe
  // nearest cells and scores candidates by ADC over the residual codes:
  //   dot(q, x) ≈ dot(q, c_cell) + Σ_j dot(q_subvec_j, codebook_j[code_j])
  // where the first term is exact (centroids are broadcast) and the sum
  // is m table lookups. At 100 TB: cell id = stored-table partition
  // column (probe = partition-pruned scan, the IVF property), codes not
  // vectors on disk and across shuffles (the PQ property) — this
  // composition, not either piece alone, is what makes the layout work.

  /** IVF-PQ search over PRE-TRAINED structure: `centroids` =
    * (centroid_id, centroid_vec) coarse cells, `codebook` =
    * (subspace, code, centroid_vec) L2 codebooks over the RESIDUAL space.
    * Exposed separately from [[ivfPqTopK]] so the golden entry can pin the
    * assign/residual/encode/ADC math bit-exactly under literal inputs.
    *
    * Scale shape: assignment + residual is one broadcast-join corpus pass;
    * encoding shuffles (id, code) pairs only; the probe fan-out joins the
    * encoded corpus to a broadcast (query × probed-cell) table, so only
    * codes inside probed cells are ever scored — m narrow rows per
    * candidate, every small side broadcast, both aggregations map-side
    * combined.
    */
  def ivfPqTopKWith(
      queries: DataFrame, corpus: DataFrame,
      centroids: DataFrame, codebook: DataFrame, nProbe: Int, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cent = centroids.select(
      col("centroid_id"),
      transform(col("centroid_vec"), x => x.cast("double")).as("centroid_vec"))
    val residuals = graft.util.CacheScope.persist(
      ivfPqResiduals(corpus, cent, idCol, vecCol))
    // The codebook arrives from outside — its geometry is read once here
    // (two small-table jobs), not per search stage.
    val m = codebook.agg(max(col("subspace"))).head.getInt(0) + 1
    val dsub = codebook.select(size(col("centroid_vec"))).head.getInt(0)
    ivfPqSearch(queries, cent, codebook, residuals, nProbe, k, m, dsub, idCol, vecCol)
  }

  /** Corpus pass shared by training and search: cell assignment, residual
    * x − c, TRUE norm for the cosine denominator (residual norms are
    * meaningless for cosine). Callers persist — it feeds codebook
    * training, codebook-side encoding, and the probe join.
    */
  private def ivfPqResiduals(
      corpus: DataFrame, cent: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    val assignments = ivfAssign(corpus, cent, idCol, vecCol)
    corpus.select(
      col(idCol).as("id"), col(vecCol).as("vec"), norm(col(vecCol)).as("true_nrm"))
      .join(assignments, "id")
      .join(broadcast(cent), "centroid_id")
      .select(col("id"), col("centroid_id"), col("true_nrm"),
        zip_with(col("vec").cast("array<double>"), col("centroid_vec"),
          (x, c) => x - c).as("residual"))
  }

  /** Probe + ADC over prepared residuals (see [[ivfPqResiduals]]).
    * m/dsub come from the caller — deriving them here cost two
    * driver-blocking metadata jobs per search (r10 probe).
    */
  private def ivfPqSearch(
      queries: DataFrame, cent: DataFrame, codebook: DataFrame,
      residuals: DataFrame, nProbe: Int, k: Int, m: Int, dsub: Int,
      idCol: String, vecCol: String): DataFrame = {
    // PQ-encode the residuals; re-attach the cell and the TRUE norm
    // (pqEncode stores the norm of what it encodes — here the residual,
    // which we discard).
    val encoded = pqEncodeWith(residuals, codebook, m, dsub, "id", "residual")
      .select(col("id").as("neighbor_id"), col("codes"))
      .join(residuals.select(col("id").as("neighbor_id"),
        col("centroid_id"), col("true_nrm")), "neighbor_id")
    ivfPqAdcSearch(queries, cent, codebook, encoded, nProbe, k, m, dsub,
      idCol, vecCol)
  }

  /** The search HALF of IVF-PQ alone — probe + ADC over an already-built
    * index table (neighbor_id, centroid_id, codes, true_nrm): the plan a
    * serving job runs against STORED artifacts, with no corpus pass, no
    * assignment argmin, no encode anywhere in it.
    */
  private def ivfPqAdcSearch(
      queries: DataFrame, cent: DataFrame, codebook: DataFrame,
      encoded: DataFrame, nProbe: Int, k: Int, m: Int, dsub: Int,
      idCol: String, vecCol: String): DataFrame = {
    // Query side: nProbe nearest cells, with the EXACT dot(q, c) kept per
    // probe — the first ADC term.
    val q = queries.select(
      col(idCol).as("query_id"), col(vecCol).as("q_vec"), norm(col(vecCol)).as("q_norm"))
    val centN = cent.withColumn("c_norm", norm(col("centroid_vec")))
    val probeW = Window.partitionBy("query_id")
      .orderBy(col("probe_cos").desc, col("centroid_id").asc)
    val probes = q.crossJoin(broadcast(centN))
      .withColumn("probe_cos",
        dot(col("q_vec"), col("centroid_vec")) / (col("q_norm") * col("c_norm")))
      .withColumn("probe_rank", row_number().over(probeW))
      .filter(col("probe_rank") <= nProbe)
      .select(col("query_id"), col("q_norm"), col("centroid_id"),
        dot(col("q_vec"), col("centroid_vec")).as("q_dot_c"))

    // Per-query ADC table over the residual codebook: m·ksub partial dots
    // per query, broadcast.
    val adc = q.select(
      col("query_id"),
      posexplode(array((0 until m).map(j =>
        slice(col("q_vec").cast("array<double>"), j * dsub + 1, dsub)): _*))
        .as(Seq("subspace", "q_subvec")))
      .join(codebook, Seq("subspace"))
      .select(col("query_id"), col("subspace"), col("code"),
        dot(col("q_subvec"), col("centroid_vec")).as("partial"))

    val scored = encoded
      .join(broadcast(probes), Seq("centroid_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("q_norm"),
        col("true_nrm"), col("q_dot_c"),
        posexplode(col("codes")).as(Seq("subspace", "code")))
      .join(broadcast(adc), Seq("query_id", "subspace", "code"))
      .groupBy("query_id", "neighbor_id")
      .agg(
        sum(col("partial")).as("__res_dot"),
        first(col("q_dot_c")).as("q_dot_c"),
        first(col("true_nrm")).as("true_nrm"),
        first(col("q_norm")).as("q_norm"))
      .withColumn("cosine",
        (col("q_dot_c") + col("__res_dot")) / (col("q_norm") * col("true_nrm")))
    topKPerQuery(scored, k)
  }

  /** End-to-end IVF-PQ: train coarse cells (spherical k-means over the
    * vectors), train residual codebooks (m joint L2 Lloyd problems over
    * x − c_cell), then probe + ADC via [[ivfPqTopKWith]].
    */
  def ivfPqTopK(
      queries: DataFrame, corpus: DataFrame,
      nCells: Int, nProbe: Int, m: Int, ksub: Int, k: Int, trainIters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val dims = corpus.select(size(col(vecCol))).head.getInt(0)
    require(m > 0 && dims % m == 0, s"m=$m must divide dims=$dims")
    // Coarse training is materialized by kmeansCore's checkpoints.
    val centroids = kmeansCentroids(corpus, nCells, trainIters, idCol, vecCol)
    ivfPqTopKWithCells(
      queries, corpus, centroids, nProbe, m, ksub, k, trainIters, idCol, vecCol)
  }

  /** IVF-PQ over PRE-TRAINED coarse cells, training only the residual
    * codebook: the codebook must be trained on the SAME residuals the
    * search encodes, so the assignment + residual corpus pass runs ONCE
    * here and feeds both — re-deriving it per consumer would re-run the
    * nCells-dot argmin scan over the whole corpus, the dominant cost of
    * this path at scale. Lets an eval (e13) rank plain-IVF vs IVF-PQ over
    * ONE shared Lloyd training pass.
    */
  def ivfPqTopKWithCells(
      queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      nProbe: Int, m: Int, ksub: Int, k: Int, trainIters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cent = centroids.select(
      col("centroid_id"),
      transform(col("centroid_vec"), x => x.cast("double")).as("centroid_vec"))
    // Dimensionality off the C-row centroid table (one near-free job) —
    // residuals share the corpus dims, so the codebook and the search
    // never pay a corpus-lineage or training-lineage metadata head.
    val dims = cent.select(size(col("centroid_vec"))).head.getInt(0)
    val residuals = graft.util.CacheScope.persist(
      ivfPqResiduals(corpus, cent, idCol, vecCol))
    val codebook = graft.util.CacheScope.persist(
      pqCodebook(residuals.select(col("id"), col("residual")),
        m, ksub, trainIters, idCol = "id", vecCol = "residual", Some(dims)))
    ivfPqSearch(queries, cent, codebook, residuals, nProbe, k, m, dims / m, idCol, vecCol)
  }

  /** Train the complete IVF-PQ artifact set in one pass — (centroids,
    * codebook, index) — the learn-once half of the serving split (r14
    * verdict #4). Same chain as [[ivfPqTopK]]'s training (deterministic
    * bootstrap + Lloyd rounds; the codebook trained on the SAME
    * residuals the index encodes, sharing one assignment pass), so
    * serving from these artifacts via [[ivfPqTopKServe]] is
    * bit-identical to the end-to-end path — spec-pinned. Persist all
    * three as parquet (the index partitioned by centroid_id at scale)
    * plus a [[graft.util.Fingerprint]] of the corpus, and every later
    * search is join-only.
    */
  def ivfPqTrain(
      corpus: DataFrame, nCells: Int, m: Int, ksub: Int, trainIters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding")
      : (DataFrame, DataFrame, DataFrame) = {
    val dims = corpus.select(size(col(vecCol))).head.getInt(0)
    require(m > 0 && dims % m == 0, s"m=$m must divide dims=$dims")
    val cent = kmeansCentroids(corpus, nCells, trainIters, idCol, vecCol)
      .select(col("centroid_id"),
        transform(col("centroid_vec"), x => x.cast("double")).as("centroid_vec"))
    val residuals = graft.util.CacheScope.persist(
      ivfPqResiduals(corpus, cent, idCol, vecCol))
    val codebook = graft.util.CacheScope.persist(
      pqCodebook(residuals.select(col("id"), col("residual")),
        m, ksub, trainIters, idCol = "id", vecCol = "residual", Some(dims)))
    val index = pqEncodeWith(residuals, codebook, m, dims / m, "id", "residual")
      .select(col("id").as("neighbor_id"), col("codes"))
      .join(residuals.select(col("id").as("neighbor_id"),
        col("centroid_id"), col("true_nrm")), "neighbor_id")
    (cent, codebook, index)
  }

  /** Build the serving INDEX of an IVF-PQ deployment (r14 verdict #4 —
    * the t44b learn-once/apply-everywhere split applied to the trained
    * vector stack): (neighbor_id, centroid_id, codes, true_nrm), i.e.
    * each corpus vector's coarse cell, its m residual PQ codes, and its
    * exact norm. Together with the centroid and codebook tables this is
    * the complete at-rest state of the index — three narrow parquet
    * writes; at 100 TB the index table is the one that matters (4 code
    * bytes + 8 norm bytes per vector instead of 256 vector bytes), and
    * partitioning it BY centroid_id makes every serve-time probe a
    * partition-pruned read.
    */
  def ivfPqIndex(
      corpus: DataFrame, centroids: DataFrame, codebook: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cent = centroids.select(
      col("centroid_id"),
      transform(col("centroid_vec"), x => x.cast("double")).as("centroid_vec"))
    val m = codebook.agg(max(col("subspace"))).head.getInt(0) + 1
    val dsub = codebook.select(size(col("centroid_vec"))).head.getInt(0)
    val residuals = graft.util.CacheScope.persist(
      ivfPqResiduals(corpus, cent, idCol, vecCol))
    pqEncodeWith(residuals, codebook, m, dsub, "id", "residual")
      .select(col("id").as("neighbor_id"), col("codes"))
      .join(residuals.select(col("id").as("neighbor_id"),
        col("centroid_id"), col("true_nrm")), "neighbor_id")
  }

  /** Persist a trained IVF-PQ deployment as a SELF-VALIDATING serving
    * artifact (r17 — the store logic the e10c face carried inline,
    * lifted to the library so the vector family's API matches the
    * KN/kn3/vocab/NB stores): centroids + codebook as plain parquet,
    * the index PARTITIONED BY centroid_id (the at-scale layout the
    * [[ivfPqIndex]] scaladoc prescribes — a probe reads only the
    * probed cells' files), plus a [[graft.util.Fingerprint]] of the
    * corpus so [[readIvfPq]] refuses to serve a stale index.
    */
  def writeIvfPq(
      centroids: DataFrame, codebook: DataFrame, index: DataFrame,
      corpus: DataFrame, path: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    writeIvfPqTables(centroids, codebook, index, path)
    graft.util.Fingerprint.write(centroids.sparkSession, s"$path/fingerprint",
      graft.util.Fingerprint.of(corpus, idCol, Seq(vecCol)))
  }

  private def writeIvfPqTables(
      centroids: DataFrame, codebook: DataFrame, index: DataFrame,
      path: String): Unit = {
    centroids.write.mode("overwrite").parquet(s"$path/centroids")
    codebook.write.mode("overwrite").parquet(s"$path/codebook")
    index.write.mode("overwrite").partitionBy("centroid_id")
      .parquet(s"$path/index")
  }

  private def readIvfPqTables(
      spark: SparkSession, path: String): (DataFrame, DataFrame, DataFrame) =
    (spark.read.parquet(s"$path/centroids"),
      spark.read.parquet(s"$path/codebook"),
      spark.read.parquet(s"$path/index"))

  /** Read a stored IVF-PQ deployment through the staleness guard:
    * (centroids, codebook, index), ready for [[ivfPqTopKServe]].
    * `memo = true` re-verifies the corpus once per session (see
    * [[graft.util.Fingerprint.requireMatch]] for the contract).
    */
  def readIvfPq(
      spark: SparkSession, corpus: DataFrame, path: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      memo: Boolean = false): (DataFrame, DataFrame, DataFrame) = {
    graft.util.Fingerprint.requireMatch(spark, s"$path/fingerprint",
      corpus, idCol, Seq(vecCol), what = "IVF-PQ index", memo = memo)
    readIvfPqTables(spark, path)
  }

  /** [[writeIvfPq]] under the CATALOG-SNAPSHOT guard (see
    * [[graft.util.Fingerprint.ofSnapshot]]): file-listing fingerprint
    * of the path-backed corpus, zero corpus scan at serve time.
    */
  def writeIvfPqSnapshot(
      centroids: DataFrame, codebook: DataFrame, index: DataFrame,
      corpusPath: String, path: String): Unit = {
    val spark = centroids.sparkSession
    writeIvfPqTables(centroids, codebook, index, path)
    graft.util.Fingerprint.write(spark, s"$path/fingerprint_snapshot",
      graft.util.Fingerprint.ofSnapshot(spark, corpusPath))
  }

  /** Read a snapshot-guarded IVF-PQ deployment (see [[readIvfPq]]). */
  def readIvfPqSnapshot(
      spark: SparkSession, corpusPath: String,
      path: String): (DataFrame, DataFrame, DataFrame) = {
    graft.util.Fingerprint.requireSnapshotMatch(spark,
      s"$path/fingerprint_snapshot", corpusPath, what = "IVF-PQ index")
    readIvfPqTables(spark, path)
  }

  /** Serve IVF-PQ top-k from STORED artifacts (centroids + codebook +
    * [[ivfPqIndex]] table) — the apply-only twin of [[ivfPqTopKWith]]:
    * the plan contains no corpus pass, no Lloyd round, no assignment,
    * no encode — only the query-side probe ranking, the broadcast ADC
    * table, and the equi-join over the index. Bit-identical to the
    * train-and-search path on the same artifacts (spec-pinned; the
    * e10s golden pins the parquet round-trip against the independent
    * mirror).
    */
  def ivfPqTopKServe(
      queries: DataFrame, centroids: DataFrame, codebook: DataFrame,
      index: DataFrame, nProbe: Int, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cent = centroids.select(
      col("centroid_id"),
      transform(col("centroid_vec"), x => x.cast("double")).as("centroid_vec"))
    val m = codebook.agg(max(col("subspace"))).head.getInt(0) + 1
    val dsub = codebook.select(size(col("centroid_vec"))).head.getInt(0)
    ivfPqAdcSearch(queries, cent, codebook, index, nProbe, k, m, dsub,
      idCol, vecCol)
  }

  /** Refine / re-rank — the stage that turns PQ's lossy ADC ranking into
    * usable recall (Jégou et al. 2011 §VI "re-ranking"): re-score a
    * BOUNDED approximate candidate set (any top-k output here — columns
    * (query_id, rank, neighbor_id, ...)) against the EXACT stored vectors
    * and re-rank to the top k. The production IR shape proven lexically by
    * [[graft.text.Bm25.searchRescored]]: evidence that needs the full
    * payload must never run corpus-wide, so the exact dots are bounded at
    * |candidates| = r·k·|queries| no matter the corpus size.
    *
    * Scale shape: the candidate id list is broadcast, so fetching the
    * exact vectors is ONE hash-semi-join pass over the stored table (at
    * 100 TB the id-partitioned layout makes it a pruned point-fetch, and
    * AQE converts the post-filter scan to the broadcast side anyway);
    * the query side is broadcast as in every search here; the re-rank is
    * the bounded-heap [[topKPerQuery]] — never a global sort.
    */
  def refineTopK(
      candidates: DataFrame, queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(
      col(idCol).as("query_id"), col(vecCol).as("q_vec"), norm(col(vecCol)).as("q_norm"))
    val c = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"), norm(col(vecCol)).as("c_norm"))
    val cand = c
      .join(broadcast(candidates.select(col("query_id"), col("neighbor_id"))),
        Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("cosine", dot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")))
    topKPerQuery(cand, k)
  }

  /** End-to-end refined IVF-PQ: ADC recalls `refineFactor · k` candidates
    * per query, [[refineTopK]] re-scores exactly and keeps k. ADC cost is
    * unchanged; the added exact work is r·k·|queries| dots — trivially
    * bounded — and it is what makes the composed index deployable
    * (recall measured by the e13 eval, re-rank math pinned bit-exactly by
    * the e10b golden). `refineFactor` large enough to cover the probed
    * cells degrades gracefully to exact re-ranking of the probe set
    * (pinned in SimilaritySpec: full-probe + full-factor ≡ brute force).
    */
  def ivfPqTopKRefined(
      queries: DataFrame, corpus: DataFrame,
      nCells: Int, nProbe: Int, m: Int, ksub: Int, k: Int,
      refineFactor: Int = 4, trainIters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(refineFactor >= 1, s"refineFactor must be >= 1, got $refineFactor")
    refineTopK(
      ivfPqTopK(queries, corpus, nCells, nProbe, m, ksub, k * refineFactor,
        trainIters, idCol, vecCol),
      queries, corpus, k, idCol, vecCol)
  }

  /** Recall@k of an approximate ANN result against the exact brute-force
    * result — the eval every ANN deployment runs before trusting an
    * index. Both inputs are (query_id, rank, neighbor_id) as every top-k
    * here emits; recall@k = |approx∩exact| / |exact| per query (exact can
    * return < k rows when the corpus is small — the denominator is what
    * the exact search actually found, so recall 1.0 always means "missed
    * nothing"). One semi-join + two tiny aggregations; at scale both
    * sides are k·|queries| rows — eval cost never touches the corpus.
    */
  def recallAtK(approx: DataFrame, exact: DataFrame, k: Int): DataFrame =
    recallAtKWith(approx, exact, recallDenom(exact, k), k)

  /** The per-query denominator of [[recallAtK]] — split out so a
    * multi-leg eval (e13: six legs against ONE exact table) can compute
    * and persist it once instead of re-aggregating the exact set per leg
    * (guide §2.4 — the x6 duplicated denominator aggregate in e13's
    * plan).
    */
  def recallDenom(exact: DataFrame, k: Int): DataFrame =
    exact.filter(col("rank") <= k).select("query_id", "neighbor_id")
      .groupBy("query_id").agg(count(lit(1)).as("n_exact"))

  /** [[recallAtK]] against a precomputed [[recallDenom]] — bit-identical
    * by construction (same expressions, same join).
    */
  def recallAtKWith(
      approx: DataFrame, exact: DataFrame, denom: DataFrame, k: Int): DataFrame = {
    val ex = exact.filter(col("rank") <= k).select("query_id", "neighbor_id")
    val ap = approx.filter(col("rank") <= k).select("query_id", "neighbor_id")
    val hits = ex.join(ap, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hit"))
    denom.join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        (coalesce(col("n_hit"), lit(0L)).cast("double") / col("n_exact"))
          .as("recall"))
  }

  /** Embedding near-duplicate pairs via LSH blocking: exact/near copies land
    * in the same bucket (identical vectors always do), so the pair join is
    * bucket-local. `threshold` on true cosine filters the candidates.
    *
    * `maxBucket` is the hot-bucket guard (same role as `maxDocFreq` in
    * [[graft.dedup.Dedup.jaccardShinglePairs]]): the per-bucket self-join
    * is quadratic in bucket population, so one pathological bucket — many
    * near-identical embeddings at fixed nPlanes — dominates the whole job.
    * With a cap, buckets over `maxBucket` members are dropped from the
    * pair search, bounding every join bucket at cap² pairs; their members
    * simply report no pairs. None (default) keeps the exact
    * oracle-checkable semantics.
    *
    * Sizing note: nPlanes must grow with corpus size — 8 planes is only
    * 256 buckets, so EVERY bucket averages N/256 members at corpus scale
    * and the cap would drop everything. Aim for 2^nPlanes >> N/maxBucket;
    * an over-cap bucket is the signal to add planes, not raise the cap.
    */
  def nearDupPairs(
      vectors: DataFrame, planes: Seq[Seq[Double]], threshold: Double,
      maxBucket: Option[Int] = None,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // Persisted: both pair sides (and the cap's population count) consume
    // this, and each broadcast build side would otherwise recompute the
    // nPlanes dot products per vector.
    val withBucket0 = graft.util.CacheScope.persist(vectors.select(
      col(idCol).as("id"), col(vecCol).as("vec"), norm(col(vecCol)).as("nrm"),
      lshBucket(col(vecCol), planes).as("bucket")))
    val withBucket = maxBucket.fold(withBucket0) { cap =>
      val keep = withBucket0.groupBy("bucket").agg(count(lit(1)).as("__pop"))
        .filter(col("__pop") <= cap).select("bucket")
      withBucket0.join(keep, "bucket")
    }
    val a = withBucket.select(
      col("bucket"), col("id").as("id_a"), col("vec").as("vec_a"), col("nrm").as("nrm_a"))
    val b = withBucket.select(
      col("bucket"), col("id").as("id_b"), col("vec").as("vec_b"), col("nrm").as("nrm_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", dot(col("vec_a"), col("vec_b")) / (col("nrm_a") * col("nrm_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  // -------------------------------------------------------------------
  // SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
  // web-scale through semantic deduplication"): cluster the embeddings,
  // then deduplicate WITHIN each cluster by cosine — semantically
  // redundant documents (paraphrases, templated rewrites) that no lexical
  // dedup catches land in the same cluster, and the cluster bound is what
  // makes the pairwise step tractable: cost is Σ|cluster|², never N².
  // nClusters is the scale knob — the paper runs k=50k on 600M vectors
  // precisely so the within-cluster quadratic stays flat as N grows.

  /** SemDeDup over PRE-TRAINED cluster centroids: assign every vector to
    * its nearest centroid (cosine), generate within-cluster pairs with
    * cosine >= `tau`, and greedily keep the MINIMUM id of each dup
    * relation — a vector is dropped iff a lower-id vector in its cluster
    * sits within `tau` (the paper's "keep one representative per
    * near-dup set", with min-id as the deterministic choice; for
    * quality-aware election feed the survivors to
    * [[graft.dedup.ClusterCollapse]] instead). Emits EVERY input vector:
    * (id, centroid_id, n_within_tau, is_survivor) — an auditable report,
    * not a silent filter.
    *
    * Exposed separately from [[semDedup]] so the golden entry can pin the
    * assign/pair/mark math bit-exactly under literal tie-free centroids.
    */
  def semDedupWith(
      vectors: DataFrame, centroids: DataFrame, tau: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // Persisted: the pair self-join consumes two sides plus the final
    // report join — three consumers of one corpus pass (assignment is the
    // broadcast-centroid argmax inside ivfAssign).
    val assigned = graft.util.CacheScope.persist(
      vectors.select(
        col(idCol).as("id"), col(vecCol).as("vec"), norm(col(vecCol)).as("nrm"))
        .join(ivfAssign(vectors, centroids, idCol, vecCol), "id"))
    // Alias self-join on the cluster key (equi-join; the exchange is
    // planned once and reused) — the quadratic face is per-cluster only.
    val pairs = graft.util.CacheScope.persist(
      assigned.as("x").join(assigned.as("y"),
        col("x.centroid_id") === col("y.centroid_id") && col("x.id") < col("y.id"))
        .withColumn("cos",
          dot(col("x.vec"), col("y.vec")) / (col("x.nrm") * col("y.nrm")))
        .filter(col("cos") >= tau)
        .select(col("x.id").as("id_a"), col("y.id").as("id_b")))
    val neighborCounts = pairs.select(col("id_a").as("id"))
      .unionAll(pairs.select(col("id_b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("n_within_tau"))
    val dropped = pairs.select(col("id_b").as("id")).distinct()
      .withColumn("__dropped", lit(true))
    assigned.select("id", "centroid_id")
      .join(neighborCounts, Seq("id"), "left")
      .join(dropped, Seq("id"), "left")
      .select(
        col("id").as(idCol),
        col("centroid_id"),
        coalesce(col("n_within_tau"), lit(0L)).as("n_within_tau"),
        col("__dropped").isNull.as("is_survivor"))
  }

  /** End-to-end SemDeDup: spherical k-means ([[kmeansCentroids]] —
    * deterministic bootstrap + Lloyd rounds, one corpus pass per round)
    * trains the clusters, then [[semDedupWith]] marks survivors.
    */
  def semDedup(
      vectors: DataFrame, nClusters: Int, trainIters: Int, tau: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    semDedupWith(vectors,
      kmeansCentroids(vectors, nClusters, trainIters, idCol, vecCol),
      tau, idCol, vecCol)

  // -------------------------------------------------------------------
  // MMR — Maximal Marginal Relevance (Carbonell & Goldstein 1998):
  // diversified top-k. Retrieval for curation (picking exemplars,
  // building eval sets, dedup-aware sampling) wants the k results to be
  // relevant AND mutually dissimilar; plain top-k happily returns k
  // near-copies. Greedy MMR picks argmax of
  //   lambda * rel(c) - (1 - lambda) * max_{s in selected} sim(c, s)
  // one result at a time.
  //
  // Scale shape: the greedy loop is inherently sequential IN k but
  // embarrassingly parallel ACROSS queries, and it only ever touches the
  // per-query shortlist (kShortlist rows), never the corpus. So: exact
  // (or ANN) top-kShortlist first — the corpus-sized, Catalyst-planned
  // part — then pack each query's shortlist into ONE row and run the
  // O(kSelect * kShortlist * kSelect) selection as a row-local
  // higher-order-function fold. At 100 TB the expensive stage is the
  // retrieval (already bounded-heap TopK); the re-rank adds one
  // |queries|-row map stage with zero shuffle beyond the shortlist
  // groupBy. HOF lambdas evaluate interpreted, which is exactly right
  // here: the fold runs once per QUERY (not per corpus row), and the
  // inner dot products use the compiled [[dot]] expression.

  /** Greedy MMR re-rank of each query's exact top-`kShortlist` down to
    * `kSelect` diversified results. Output: (query_id, sel_rank,
    * neighbor_id, relevance, mmr_score), where relevance is the
    * query-candidate cosine and mmr_score the selection-time objective
    * (first pick's max-sim term is 0, so its score is lambda * rel).
    * Ties break on lower neighbor_id; double arithmetic mirrors the
    * DuckDB oracle op-for-op (e1's pattern), so e15 hash-matches.
    */
  def mmrRerank(
      queries: DataFrame, corpus: DataFrame, kShortlist: Int, kSelect: Int,
      lambdaRel: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(kSelect >= 1 && kSelect <= kShortlist, "need 1 <= kSelect <= kShortlist")
    val short = bruteForceTopK(queries, corpus, kShortlist, idCol, vecCol)
    // Re-attach candidate vectors (and their norms, same formula that
    // produced `cosine`) for the pair-sim term: corpus-side hash join
    // against the small broadcast shortlist.
    val cvecs = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("n_vec"), norm(col(vecCol)).as("n_nrm"))
    val cand = cvecs.join(broadcast(short), "neighbor_id")
    // One row per query: candidates sorted by retrieval rank (struct sort
    // on the leading field), so the fold's scan order is deterministic.
    val packed = cand.groupBy("query_id").agg(
      sort_array(collect_list(struct(
        col("rank"), col("neighbor_id").as("id"), col("cosine").as("rel"),
        col("n_vec").as("vec"), col("n_nrm").as("nrm")))).as("cands"))

    val lam = lit(lambdaRel)
    val oneMinusLam = lit(1.0 - lambdaRel)
    def selStruct(score: Column, c: Column): Column = struct(
      score.as("score"), c("id").as("id"), c("rel").as("rel"),
      c("vec").as("vec"), c("nrm").as("nrm"))
    // Correctly-typed EMPTY accumulator without spelling the struct type:
    // an empty slice of a transform over the candidates themselves.
    val emptySel = slice(transform(col("cands"), c => selStruct(lit(0.0), c)), 1, 0)
    // score desc, id asc — double compare, then long compare.
    def byScore(l: Column, r: Column): Column =
      when(l("score") > r("score"), -1).when(l("score") < r("score"), 1)
        .when(l("id") < r("id"), -1).when(l("id") > r("id"), 1)
        .otherwise(0).cast("int")
    val selected = aggregate(
      sequence(lit(1), lit(kSelect)),
      emptySel,
      (acc, _) => {
        val accIds = transform(acc, s => s("id"))
        val remaining = filter(col("cands"), c => !array_contains(accIds, c("id")))
        val scored = transform(remaining, c => {
          val maxSim = array_max(transform(acc, s =>
            dot(c("vec"), s("vec")) / (c("nrm") * s("nrm"))))
          selStruct(lam * c("rel") - oneMinusLam * coalesce(maxSim, lit(0.0)), c)
        })
        concat(acc, slice(array_sort(scored, byScore _), 1, 1))
      })
    packed
      .select(col("query_id"), posexplode(selected).as(Seq("__pos", "__s")))
      .select(
        col("query_id"),
        (col("__pos") + 1).cast("long").as("sel_rank"),
        col("__s.id").as("neighbor_id"),
        col("__s.rel").as("relevance"),
        col("__s.score").as("mmr_score"))
      .orderBy("query_id", "sel_rank")
  }

  /** Semantic decontamination: screen a training corpus against a (small)
    * eval/benchmark set in EMBEDDING space — the semantic complement of
    * [[graft.curation.Curation.decontaminate]]'s lexical n-gram overlap
    * (paraphrased eval leakage has zero shingle overlap but cosine ~1).
    * Emits one auditable row per training vector: (idCol, n_hits,
    * max_cos, kept) with n_hits = #eval vectors within `tau` and kept =
    * (n_hits == 0).
    *
    * Scale shape: eval sets are small BY NATURE (thousands of rows), so
    * the whole screen is the packed-broadcast form — the eval set is
    * aggregated into ONE row (array of (vec, nrm)), broadcast, and each
    * training row scores it with a row-local HOF over the compiled
    * [[dot]]: a 100 TB corpus pays one map-side pass with NO shuffle and
    * no per-pair join rows at all (the |train| x |test| product exists
    * only inside the per-row loop). For eval sets too big to pack,
    * compose the LSH-bucketed screen
    * ([[graft.streaming.CorpusIngest.embScreenReport]]) instead.
    * Zero-norm vectors on either side make cosine 0/0 = NaN; those sims
    * are nulled out (never hits, never max) on BOTH engines.
    */
  def semanticDecontaminate(
      train: DataFrame, test: DataFrame, tau: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val packed = test.agg(collect_list(struct(
      col(vecCol).as("vec"), norm(col(vecCol)).as("nrm"))).as("tests"))
    val scored = train
      .select(col(idCol), col(vecCol).as("__v"), norm(col(vecCol)).as("__nrm"))
      .crossJoin(broadcast(packed)) // 1-row build side: a metadata attach, not a join
      .withColumn("__cos", transform(col("tests"), t => {
        // Zero-norm on either side => null, tested BEFORE dividing: ANSI
        // mode (Spark 4 default) makes x/0 an error, not a NaN, so the
        // guard must short-circuit the division, not inspect its result.
        val denom = col("__nrm") * t("nrm")
        when(denom === 0.0, lit(null).cast("double"))
          .otherwise(dot(col("__v"), t("vec")) / denom)
      }))
    scored.select(
      col(idCol),
      size(filter(col("__cos"), c => c >= lit(tau))).cast("long").as("n_hits"),
      array_max(col("__cos")).as("max_cos"))
      .withColumn("kept", col("n_hits") === 0)
      .orderBy(idCol)
  }
}
