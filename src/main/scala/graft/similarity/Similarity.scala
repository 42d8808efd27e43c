package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
    * bit-identical and oracle-checkable.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"), (x, y) => x * y),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

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
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", dot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** Deterministic random hyperplanes (fixed seed) for LSH bucketing. */
  def randomPlanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** LSH bucket id: one sign bit per hyperplane, packed into an int. */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(vec, typedLit(p.toArray)) > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

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
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", dot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine", "bucket")
  }

  /** Embedding near-duplicate pairs via LSH blocking: exact/near copies land
    * in the same bucket (identical vectors always do), so the pair join is
    * bucket-local. `threshold` on true cosine filters the candidates.
    */
  def nearDupPairs(
      vectors: DataFrame, planes: Seq[Seq[Double]], threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val withBucket = vectors.select(
      col(idCol).as("id"), col(vecCol).as("vec"), norm(col(vecCol)).as("nrm"),
      lshBucket(col(vecCol), planes).as("bucket"))
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
}
