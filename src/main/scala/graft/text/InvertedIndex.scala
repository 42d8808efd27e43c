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
      textCol: String = "text"): DataFrame =
    withGaps(buildDelta(docs, idCol, textCol))

  /** The per-row gap view of an assembled posting list — no shuffle. */
  private def withGaps(idx: DataFrame): DataFrame =
    idx.withColumn("gaps",
      transform(col("postings"),
        (x, i) => x - coalesce(get(col("postings"), i - 1), lit(0L))))

  /** One batch's DELTA index: term → (df, cf, sorted postings), no gaps —
    * gaps are a property of the ASSEMBLED list, so they are derived at
    * merge/read time, never stored per delta.
    */
  def buildDelta(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol).as("id"), explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy("term", "id")
      .agg(count(lit(1)).as("tf"))
      .groupBy("term")
      .agg(
        count(lit(1)).as("df"),
        sum(col("tf")).as("cf"),
        array_sort(collect_list(col("id"))).as("postings"))

  /** Merge a union of delta-index rows (one or more rows per term) into
    * the assembled index — the incremental-maintenance read path: a new
    * document batch contributes ONE delta built from its own text
    * ([[buildDelta]]), and the corpus index is the per-term sum/concat of
    * the deltas. PRECONDITION: the deltas' document sets are disjoint
    * (the [[graft.streaming.CorpusIngest]] frontier guarantees first-seen
    * docs), so df/cf add and postings concatenate without dedup.
    *
    * Shape at scale: the merge shuffles INDEX-sized rows (term, counts,
    * posting arrays) — corpus text is tokenized exactly once, in the
    * batch that introduced it; maintenance never re-reads landed text.
    * Equivalence with a from-scratch [[build]] is oracle-gated (t27b)
    * and spec-pinned.
    */
  def mergeDeltas(deltas: DataFrame): DataFrame =
    withGaps(compactDeltas(deltas))

  /** Collapse a pile of delta rows into ONE delta row per term — the LSM
    * compaction step for the index: the output is itself a valid delta
    * (no gaps — those stay a read-time property), so it can keep
    * absorbing future batches. Run when the delta count makes the
    * read-time merge pay for too many term-row duplicates (the same
    * read-amplification threshold policy as
    * [[graft.etl.Load.appendPartitioned]]'s file compaction; the curve is
    * probed by ScaleProbe's `inverted_merge_d*` legs). Same disjoint-docs
    * precondition as [[mergeDeltas]]; compact-then-merge ≡ merge directly
    * (spec-pinned — sum and concat are associative).
    */
  def compactDeltas(deltas: DataFrame): DataFrame =
    deltas
      .groupBy("term")
      .agg(
        sum(col("df")).as("df"),
        sum(col("cf")).as("cf"),
        array_sort(flatten(collect_list(col("postings")))).as("postings"))
}
