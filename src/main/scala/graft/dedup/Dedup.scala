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

  /** Exact dedup: one survivor (min id) per identical text. */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol), md5(col(textCol)).as("text_hash"))
      .groupBy("text_hash")
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .select(idCol, "text_hash", "n_copies")

  /** MinHash+LSH near-duplicate candidate pairs with estimated Jaccard.
    * k = signature length, bands = LSH bands (rows per band = k/bands).
    */
  def minhashLshPairs(
      docs: DataFrame, k: Int = 32, bands: Int = 8, shingleN: Int = 3,
      minEstJaccard: Double = 0.5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sigs = docs
      .select(
        col(idCol).as("id"),
        TextFunctions.minhashSignature(TextFunctions.shingles(col(textCol), shingleN), k).as("sig"))
      .filter(size(col("sig")) > 0 && !array_contains(transform(col("sig"), _.isNull), true))
    val banded = sigs.select(
      col("id"), col("sig"),
      posexplode(TextFunctions.minhashBands(col("sig"), k, bands)).as(Seq("band", "band_hash")))
    val a = banded.select(col("band"), col("band_hash"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("band_hash"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        TextFunctions.minhashJaccardEstimate(col("sig_a"), col("sig_b"), k).as("est_jaccard"))
      .distinct()
      .filter(col("est_jaccard") >= minEstJaccard)
  }

  /** SimHash near-duplicate pairs: pigeonhole-blocked hamming join. The 64
    * bits split into `maxHamming + 1` segments; any pair within the budget
    * agrees exactly on >=1 segment, so the per-(segment, key) self-join has
    * guaranteed recall while never comparing all pairs. Candidates that
    * collide on several segments are deduped after the hamming filter.
    */
  def simhashPairs(
      docs: DataFrame, maxHamming: Int = 6,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val nBlocks = maxHamming + 1
    val sh = docs.select(
      col(idCol).as("id"),
      TextFunctions.simhashBitVector(col(textCol)).as("bits"))
    val blocked = sh.select(
      col("id"), col("bits"),
      posexplode(TextFunctions.simhashBlockKeys(col("bits"), nBlocks)).as(Seq("blk", "blk_key")))
    val a = blocked.select(col("blk"), col("blk_key"), col("id").as("id_a"), col("bits").as("bits_a"))
    val b = blocked.select(col("blk"), col("blk_key"), col("id").as("id_b"), col("bits").as("bits_b"))
    a.join(b, Seq("blk", "blk_key"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", TextFunctions.hamming(col("bits_a"), col("bits_b")).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
      .distinct()
  }

  /** Exact n-gram (shingle) Jaccard pairs >= threshold, via inverted index:
    * explode distinct shingles -> self-join on shingle -> count intersections
    * -> Jaccard from |A|,|B|,|A∩B|.
    */
  def jaccardShinglePairs(
      docs: DataFrame, shingleN: Int = 3, threshold: Double = 0.5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sh = docs.select(
      col(idCol).as("id"),
      array_distinct(TextFunctions.shingles(col(textCol), shingleN)).as("shingles"))
      .filter(size(col("shingles")) > 0)
    val sizes = sh.select(col("id"), size(col("shingles")).cast("long").as("n_sh"))
    val inv = sh.select(col("id"), explode(col("shingles")).as("shingle"))
    val common = inv.as("x").join(inv.as("y"), Seq("shingle"))
      .filter(col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("n_a") + col("n_b") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "n_common", "n_a", "n_b", "jaccard")
  }
}
