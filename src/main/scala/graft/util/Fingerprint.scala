package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Order-invariant corpus fingerprints for SELF-VALIDATING stored
  * artifacts (r14 verdict #2, generalized in r15 to every learn-once/
  * apply-everywhere store: unigram vocabularies, IVF-PQ centroid/
  * codebook/index tables): (n_rows, id_hash) with id_hash = XOR of
  * xxhash64(id). XOR is commutative/associative and never overflows, so
  * partitioning cannot move the value, and both legs are SQL-mirrorable
  * (COUNT + a 64-bit-hash XOR aggregate) should a face ever need the
  * DuckDB twin. One column-pruned pass over the ids.
  */
object Fingerprint {

  def of(df: DataFrame, idCol: String): (Long, Long) = {
    val r = df.select(xxhash64(col(idCol)).as("__h"))
      .agg(count(lit(1)).as("n"),
        coalesce(expr("bit_xor(__h)"), lit(0L)).as("h"))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  /** Persist a fingerprint as a one-row parquet beside an artifact. */
  def write(spark: SparkSession, path: String, fp: (Long, Long)): Unit = {
    import spark.implicits._
    Seq(fp).toDF("n_rows", "id_hash")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Read a stored fingerprint and require it matches `df` — the loud
    * staleness guard every artifact read passes BEFORE the artifact is
    * applied; `what` names the artifact in the failure message.
    */
  def requireMatch(
      spark: SparkSession, path: String, df: DataFrame, idCol: String,
      what: String): Unit = {
    val st = spark.read.parquet(path).head()
    val stored = (st.getAs[Long]("n_rows"), st.getAs[Long]("id_hash"))
    val current = of(df, idCol)
    require(stored == current,
      s"stale $what artifact (fingerprint at $path): stored " +
        s"(n=${stored._1}, id_hash=${stored._2}) does not match the " +
        s"current corpus (n=${current._1}, id_hash=${current._2}) - " +
        "the corpus changed since the artifact was built; re-train and " +
        "re-persist instead of serving stale state")
  }
}
