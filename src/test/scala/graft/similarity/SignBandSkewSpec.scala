package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The r12 skew exposure, pinned: sign-band blocking on an ANISOTROPIC
  * corpus (a dominant shared direction pins a whole band's sign bits)
  * degenerates to one N-row (band, key) bucket — and the two guards,
  * `maxBucket` and `hdDecorrelate`, bound/dissolve it without losing the
  * exact-duplicate pairs the dedup family exists to find.
  *
  * Fixture: 64-dim vectors whose band-0 coordinates are 5 ± bounded noise
  * (always positive → all N vectors share band 0's key) and whose other
  * 56 coordinates are pure deterministic noise in {-3..3}.
  */
class SignBandSkewSpec extends SparkTestBase {

  private val N = 600

  /** x(k)_j = 5 + u(k,j) for j < 8 (strictly positive: 5 - 3 >= 2),
    * u(k,j) otherwise, with u(k,j) = murmur3(k, j) mod 7 - 3 — hash
    * noise, not a linear grid: a linear (k·a + j·b) mod 7 has period 7
    * in k and collapses the corpus to seven sign profiles, which would
    * fake the very skew this spec probes.
    */
  private lazy val aniso: DataFrame =
    spark.range(N).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0L), lit(63L)), j => {
        val u = (pmod(hash(col("id"), j), lit(7)) - 3).cast("double")
        when(j < 8, lit(5.0) + u).otherwise(u)
      }).cast("array<float>").as("embedding"))

  test("anisotropy collapses band 0 into ONE bucket; hdDecorrelate re-spreads it") {
    val raw = Similarity.signBandBucketStats(aniso, dim = 64)
      .filter(col("band") === 0).head()
    assert(raw.getAs[Long]("n_buckets") == 1L)
    assert(raw.getAs[Long]("max_bucket") == N.toLong)
    assert(raw.getAs[Long]("pairs_all") == N.toLong * (N - 1) / 2)

    val rot = Similarity.signBandBucketStats(aniso, dim = 64, rotate = true)
    val maxBuckets = rot.select("band", "max_bucket").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // Every band's hottest bucket is far below the degenerate N — the
    // pinned direction's energy is spread across all 64 coordinates.
    // (The coarse 7-value noise grid keeps the spread short of uniform:
    // observed 86–172 vs the raw 600.)
    assert(maxBuckets(0) < N / 4,
      s"band 0 still hot after decorrelation: $maxBuckets")
    assert(maxBuckets.values.max < N / 3,
      s"decorrelation left a hot bucket: $maxBuckets")
  }

  test("maxBucket hard-bounds the candidate pairs and the stats report what was dropped") {
    val stats = Similarity.signBandBucketStats(aniso, dim = 64, maxBucket = Some(100))
    val band0 = stats.filter(col("band") === 0).head()
    assert(band0.getAs[Long]("buckets_capped") == 1L)
    assert(band0.getAs[Long]("rows_capped") == N.toLong)
    assert(band0.getAs[Long]("pairs_capped") == N.toLong * (N - 1) / 2)

    // Candidate pairs under the cap can never exceed the closed-form
    // sum of under-cap buckets' n(n-1)/2 — the degenerate band-0 bucket
    // contributes nothing.
    val kept = stats.select(
      sum(col("pairs_all") - col("pairs_capped")).as("kept")).head().getAs[Long]("kept")
    val pairs = Similarity.signBandEdges(
      aniso, dim = 64, minCosine = -1.0, maxBucket = Some(100),
      saltOverCap = false).count()
    assert(pairs <= kept)
    // and the unguarded form really is ~N² (the exposure exists at all)
    val unguarded = Similarity.signBandEdges(
      aniso, dim = 64, minCosine = -1.0, maxBucket = None).count()
    assert(unguarded >= N.toLong * (N - 1) / 2)
  }

  test("saltOverCap degrades instead of drops: superset of the drop path, bounded below uncapped") {
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dropped = pairs(Similarity.signBandEdges(
      aniso, dim = 64, minCosine = -1.0, maxBucket = Some(100),
      saltOverCap = false))
    // saltOverCap = true is the library DEFAULT (r13 ADVICE) — spelled
    // out here because this test is exactly the drop-vs-salt contrast.
    val salted = pairs(Similarity.signBandEdges(
      aniso, dim = 64, minCosine = -1.0, maxBucket = Some(100), saltOverCap = true))
    val uncapped = pairs(Similarity.signBandEdges(
      aniso, dim = 64, minCosine = -1.0, maxBucket = None))
    // under-cap buckets get s = 1, so every drop-path pair survives; the
    // split buckets contribute ~1/s of their pairs on top — strictly
    // between the two extremes on this fixture (band 0 splits 6 ways).
    assert(dropped.subsetOf(salted))
    assert(salted.subsetOf(uncapped))
    assert(salted.size > dropped.size && salted.size < uncapped.size)
    // the split's work bound: the degenerate band-0 bucket (n = N) adds
    // at most n·cap/2 pairs instead of n²/2
    assert(salted.size - dropped.size <= N.toLong * 100 / 2)
  }

  test("planted exact duplicates survive rotation + cap (positive scaling preserves every band)") {
    // Every 10th vector duplicated at x2 into the disjoint negative id
    // space — H·D·(2x) = 2·(H·D·x), so the copy collides with its
    // original in EVERY band and a cap only needs one band under it.
    val dups = aniso.filter(col("vec_id") % 10 === 0)
      .select((-col("vec_id") - 1).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    val edges = Similarity.signBandEdges(
      aniso.unionByName(dups), dim = 64, minCosine = 0.999,
      rotate = true, maxBucket = Some(100), saltOverCap = false)
    val found = edges.select(
      least(col("id_a"), col("id_b")).as("lo"),
      greatest(col("id_a"), col("id_b")).as("hi"))
      .filter(col("lo") < 0 && col("hi") === -col("lo") - 1)
      .count()
    assert(found == (0 until N by 10).size.toLong,
      s"expected every planted dup pair, found $found")
  }

  test("the default cap is inert on benign (sign-balanced) corpora") {
    val benign = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val a = Similarity.knnGraph(benign, k = 3, dim = 64, maxBucket = None)
      .collect().toSet
    val b = Similarity.knnGraph(benign, k = 3, dim = 64, maxBucket = Some(4096))
      .collect().toSet
    assert(a == b)
  }

  test("native HdSignPack is bit-identical to signPack ∘ hdDecorrelate (HOF cross-check)") {
    val viaHof = Similarity.signPack(
      aniso.select(col("vec_id"),
        Similarity.hdDecorrelate(col("embedding"), 64).as("embedding")), 64)
    val viaNative = aniso.select(
      col("vec_id"),
      org.apache.spark.sql.graftnative.HdSignPack(
        col("embedding").cast("array<double>"), 64).as("__wds"))
      .select(col("vec_id"),
        col("__wds").getItem(0).as("w0"), col("__wds").getItem(1).as("w1"))
    assert(viaHof.exceptAll(viaNative).isEmpty && viaNative.exceptAll(viaHof).isEmpty)
  }

  test("a duplicate CLUSTER larger than the cap: drop loses EVERY pair, the DEFAULT salt path keeps ~1/s") {
    // 150 identical vectors — the r13 ADVICE scenario: the cluster pins
    // every one of its own band buckets over cap=100, so under the drop
    // path 'exact dups survive any cap that leaves one band breathing'
    // fails (no band breathes). The library default is therefore salt.
    val cluster = spark.range(150).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0L), lit(63L)), _ => lit(1.0))
        .cast("array<float>").as("embedding"))
    val dropPairs = Similarity.signBandEdges(cluster, dim = 64,
      minCosine = 0.999, maxBucket = Some(100), saltOverCap = false).count()
    assert(dropPairs == 0L)
    // default (salt): s = ceil(150/100) = 2 -> two pmod(id, 2) groups of
    // 75, pairs within a group only: exactly 2 * C(75, 2) survive.
    val salted = Similarity.signBandEdges(cluster, dim = 64,
      minCosine = 0.999, maxBucket = Some(100)).count()
    assert(salted == 2L * (75L * 74 / 2))
  }

  test("bandBits = 16: candidate subset of the 8-bit set (uncapped), hottest bucket no hotter") {
    def pairSet(bb: Int) = Similarity.signBandCandidatePairs(
      aniso, dim = 64, rotate = true, maxBucket = None, bandBits = bb)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p8 = pairSet(8)
    val p16 = pairSet(16)
    // agreement on a 16-bit band IS agreement on both of its 8-bit
    // halves, so widening bands only removes candidates (recall trade)…
    assert(p16.subsetOf(p8) && p16.size < p8.size)
    // …and every 16-bit bucket is an intersection of two 8-bit buckets,
    // so occupancy (the cap-sizing number) can only fall.
    def hottest(bb: Int) = Similarity.signBandBucketStats(
      aniso, dim = 64, rotate = true, bandBits = bb)
      .agg(max(col("max_bucket"))).head().getLong(0)
    assert(hottest(16) <= hottest(8))
    // dims must tile into bands at the requested width
    intercept[IllegalArgumentException] {
      Similarity.signBandCandidatePairs(aniso, dim = 40, bandBits = 16)
    }
  }

  test("hdDecorrelate rejects a non-power-of-two dim and preserves vector arity") {
    intercept[IllegalArgumentException] {
      Similarity.hdDecorrelate(col("embedding"), 48)
    }
    val n = aniso.select(size(Similarity.hdDecorrelate(col("embedding"), 64)).as("n"))
      .distinct().collect()
    assert(n.map(_.getInt(0)).toSeq == Seq(64))
  }
}
