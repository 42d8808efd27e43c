package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** TF-IDF keyword extraction: the top-k most distinctive terms per
  * document — the classic corpus-analysis primitive behind keyword
  * tagging, topic drift checks, and boilerplate hunting in a
  * training-data pipeline.
  *
  * The idf factor is the RATIONAL form N/df, not log(N/df): for a fixed
  * corpus size N the log is a monotone transform, so the per-document
  * top-k and its ordering are IDENTICAL — and `tf * N / df` is one exact
  * integer product and one IEEE-754 division, bit-reproducible across
  * engines, where `ln` implementations (JVM StrictMath vs DuckDB libm)
  * may differ in the final ulp and poison value-level verification.
  * Callers who want the log-scaled score can apply `log()` to the result.
  *
  * Shape at scale: one corpus scan explodes tokens; tf = one
  * map-side-combined aggregation on (doc, term); df reuses the tf rows
  * (already distinct per doc-term) with a second small aggregation on
  * term; the per-document top-k is the bounded-heap aggregate (k rows per
  * mapper per doc cross the shuffle), never a row_number window over all
  * scored terms. The corpus row count rides along as a broadcast one-row
  * cross join.
  */
object TfIdf {

  def topTerms(
      docs: DataFrame,
      k: Int,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // tf feeds both the scoring join and the df rollup — persisted, or the
    // token explode re-runs per consumer (broadcast build sides never
    // reuse exchanges; measured ~4x elsewhere in this repo).
    val tf = graft.util.CacheScope.persist(docs
      .select(col(idCol).as("id"), explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy("id", "term")
      .agg(count(lit(1)).as("tf")))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf
      .join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("score", (col("tf") * col("n_docs")).cast("double") / col("df"))
    // Ties rank by term ascending: the struct orders (neg score, term),
    // matching ORDER BY score DESC, term. Double negation is bit-exact.
    val item = struct(
      negate(col("score")).as("ns"),
      col("term").as("term"),
      col("tf").as("tf"),
      col("df").as("df"))
    scored
      .groupBy("id")
      .agg(org.apache.spark.sql.graftnative.TopK
        .collectTopK(item, k, reverse = true).as("__top"))
      .select(col("id"), posexplode(array_sort(col("__top"))).as(Seq("__pos", "__it")))
      .select(
        col("id").as(idCol),
        (col("__pos") + 1).cast("long").as("rk"),
        col("__it.term").as("term"),
        col("__it.tf").as("tf"),
        col("__it.df").as("df"),
        negate(col("__it.ns")).as("score"))
  }
}
