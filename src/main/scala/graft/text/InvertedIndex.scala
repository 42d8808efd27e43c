package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted-index construction: term → (df, cf, sorted posting list,
  * delta-encoded gaps) — the storage layout behind every lexical search
  * engine ([[Bm25]] consumes the same tf rows at query time; this entry
  * MATERIALIZES the index as a table, the batch-build step a pipeline runs
  * once per corpus snapshot).
  *
  * Gap encoding (each posting minus its predecessor) is what makes real
  * posting lists compress — stored here alongside the raw ids so both
  * layouts are verifiable.
  *
  * Shape at scale: one token explode + two map-side-combined aggregations;
  * postings are assembled per term by collect_list + array_sort (the gap
  * pass is a per-row `transform` over the assembled array — no second
  * shuffle, no per-term window). A pathological stopword term's posting
  * list is one row's array — cap with `minDf`/`maxDf` screening (the
  * vocabulary-builder policy, [[HeavyHitters]]) when a real corpus needs
  * it; the synthetic vocabulary here is small by construction.
  */
object InvertedIndex {

  def build(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val tf = docs
      .select(col(idCol).as("id"), explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy("term", "id")
      .agg(count(lit(1)).as("tf"))
    tf
      .groupBy("term")
      .agg(
        count(lit(1)).as("df"),
        sum(col("tf")).as("cf"),
        array_sort(collect_list(col("id"))).as("postings"))
      .withColumn("gaps",
        transform(col("postings"),
          (x, i) => x - coalesce(get(col("postings"), i - 1), lit(0L))))
  }
}
