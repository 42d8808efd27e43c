package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Span-level (paragraph-level) exact dedup: finds boilerplate repeated
  * INSIDE otherwise-distinct documents — headers, license blocks,
  * navigation chrome — which document-granular dedup (exact or MinHash)
  * under-flags because the documents differ overall. The reference's analog
  * is its exact-key collapse (src/etl/load.rs:239-279); this is the
  * within-document generalization every corpus pipeline runs before
  * training.
  *
  * A "span" is a fixed run of `span` consecutive tokens (documents here are
  * flat word streams with no paragraph delimiters; on corpora with real
  * paragraph breaks, split on the delimiter first and feed each paragraph
  * as its own doc). Each document splits into ceil(n/span) non-overlapping
  * chunks; a chunk is "duplicated" when its exact text occurs at least
  * `minCount` times corpus-wide.
  *
  * Scale shape (the whole point): explode -> md5 -> groupBy -> join back —
  * the same inverted-index skeleton as [[Dedup.exact]] and the repetition
  * signals. Span TEXT never shuffles in the stats path: spans reduce to
  * their 128-bit md5 immediately after the (map-side, shuffle-free)
  * explode, so the frequency shuffle moves (hash, count) rows, not
  * paragraphs. The frequency table's hot keys (a license block repeated a
  * billion times) meet the span table in an equi-join AQE can skew-split —
  * never a window over the hash, whose hot partition could not be split.
  */
object SpanDedup {

  /** (id, pos, sp): every document exploded to its 0-based span chunks.
    * Null/empty documents produce no rows — the guard is load-bearing
    * twice over: `split("", " ")` yields `[""]`, which would mint a
    * phantom empty span, and `sequence` counts DOWN from an inverted
    * range.
    */
  def spans(
      docs: DataFrame, span: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(span >= 1, s"span width must be >= 1, got $span")
    docs
      .filter(col(textCol).isNotNull && length(col(textCol)) > 0)
      .select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("w"))
      .select(
        col("id"),
        posexplode(
          transform(
            sequence(lit(0L), floor((size(col("w")) - 1) / lit(span))),
            i => array_join(slice(col("w"), (i * span + 1).cast("int"), lit(span)), " ")))
          .as(Seq("pos", "sp")))
  }

  /** Per-document duplication profile: (doc_id, n_spans, n_duplicated,
    * dup_frac) where n_duplicated counts this document's spans whose exact
    * text appears >= `minCount` times across the corpus (occurrences
    * include the document's own). dup_frac near 1.0 = the document IS
    * boilerplate; a moderate dup_frac with distinct remainder = chrome
    * around real content — the rows [[scrub]] cleans rather than drops.
    */
  def spanStats(
      docs: DataFrame, span: Int = 10, minCount: Long = 2L,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sh = spans(docs, span, idCol, textCol)
      .select(col("id"), md5(col("sp")).as("h"))
    val freq = sh.groupBy("h").agg(count(lit(1)).as("span_df"))
    sh.join(freq, "h")
      .groupBy(col("id").as(idCol))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("span_df") >= minCount, 1L).otherwise(0L)).as("n_duplicated"))
      .withColumn("dup_frac", col("n_duplicated").cast("double") / col("n_spans"))
  }

  /** Sliding-window duplication profile — the Lee et al. ("Deduplicating
    * Training Data Makes Language Models Better", 2022) exact-substring
    * shape, at k-token-window granularity: every k-token SLIDING window
    * (not [[spanStats]]'s fixed chunks, which miss repeats that straddle a
    * chunk boundary or sit at a shifted offset) is hashed and counted
    * corpus-wide; windows occurring >= `minCount` times become intervals
    * `[pos, pos+k)` and overlapping/adjacent hits coalesce into MAXIMAL
    * repeated spans via [[graft.operators.IntervalMerge]]. Returns one row
    * per document: total tokens, raw hot-window count, merged span count,
    * tokens covered by some repeated span, and the covered fraction — the
    * excision-ready profile (a doc with coverage 1.0 IS boilerplate; a
    * doc with one tight span quotes something).
    *
    * Scale shape: same skeleton as [[spanStats]] (window text reduces to
    * md5 before any shuffle; frequencies meet hits in an AQE-splittable
    * equi-join) plus the islands merge, whose per-key windows parallelize
    * per document. Sliding windows cost ~k× the rows of fixed chunks —
    * that is the price of offset-invariance, paid in the cheap exploded
    * projection, never in shuffled text.
    */
  /** (id, s, e): every k-token sliding window whose corpus occurrence
    * count reaches `minCount`, as a half-open token interval. Shared by
    * [[slidingSpanStats]] (profile) and [[slidingScrub]] (excision).
    */
  private def hotWindowHits(
      docs: DataFrame, k: Int, minCount: Long,
      idCol: String, textCol: String): DataFrame = {
    require(k >= 1, s"window width must be >= 1, got $k")
    // The hashed-window projection feeds BOTH the frequency rollup and the
    // hits join; persist the reduced (id, pos, 128-bit hash) rows — the
    // minhash-signature precedent — instead of exploding and hashing the
    // text twice (window text itself is never cached, never shuffled).
    val wins = graft.util.CacheScope.persist(docs
      .filter(col(textCol).isNotNull && length(col(textCol)) > 0)
      .select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("w"))
      .select(col("id"),
        posexplode(TextFunctions.shinglesFromTokens(col("w"), k)).as(Seq("pos", "sp")))
      .select(col("id"), col("pos").cast("long").as("pos"), md5(col("sp")).as("h")))
    val freq = wins.groupBy("h").agg(count(lit(1)).as("w_df"))
    // Persisted: slidingSpanStats consumes the hit set twice (interval
    // merge + hot-window counts) — without this the frequency rollup and
    // the hits join re-ran per consumer (guide §2.4 — d10's plan dup).
    // Hot-hit-sized (windows at/over minCount only).
    graft.util.CacheScope.persist(wins.join(freq, "h")
      .filter(col("w_df") >= minCount)
      .select(col("id"), col("pos").as("s"), (col("pos") + k).as("e")))
  }

  def slidingSpanStats(
      docs: DataFrame, k: Int = 10, minCount: Long = 2L,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val base = docs
      .filter(col(textCol).isNotNull && length(col(textCol)) > 0)
      .select(col(idCol).as("id"), TextFunctions.nTokens(col(textCol)).as("n_tokens"))
    val hits = hotWindowHits(docs, k, minCount, idCol, textCol)
    val merged = graft.operators.IntervalMerge.merge(hits, Seq("id"), "s", "e")
    val perDoc = merged.groupBy("id")
      .agg(
        count(lit(1)).as("n_spans"),
        sum(col("span_end") - col("span_start")).as("covered_tokens"))
    val hotCounts = hits.groupBy("id").agg(count(lit(1)).as("n_hot_windows"))
    base
      .join(hotCounts, Seq("id"), "left_outer")
      .join(perDoc, Seq("id"), "left_outer")
      .select(
        col("id").as(idCol),
        col("n_tokens"),
        coalesce(col("n_hot_windows"), lit(0L)).as("n_hot_windows"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"))
      .withColumn("coverage_frac",
        col("covered_tokens").cast("double") / col("n_tokens"))
  }

  /** Excision at sliding-window precision: cut exactly the tokens covered
    * by a maximal repeated span ([[slidingSpanStats]]'s intervals) and
    * rejoin the survivors in order — where [[scrub]] drops whole fixed
    * chunks, this removes the repeated run itself, at any offset, and
    * nothing else. Documents scrubbed to nothing come back as '' (same
    * contract as [[scrub]]).
    *
    * Shape at scale: tokens meet the merged spans in an equi-join on the
    * doc id with a range residual (per-doc span counts are small, so the
    * residual filters a short build side); the reassembly shuffle is the
    * same one [[scrub]] pays, after the hot runs — the volume — are
    * anti-joined away.
    */
  def slidingScrub(
      docs: DataFrame, k: Int = 10, minCount: Long = 2L,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spans = graft.operators.IntervalMerge.merge(
      hotWindowHits(docs, k, minCount, idCol, textCol), Seq("id"), "s", "e")
    val toks = docs
      .filter(col(textCol).isNotNull && length(col(textCol)) > 0)
      .select(col(idCol).as("id"), posexplode(TextFunctions.tokens(col(textCol)))
        .as(Seq("pos", "tok")))
      .select(col("id"), col("pos").cast("long").as("pos"), col("tok"))
    val kept = toks.alias("t").join(spans.alias("sp"),
      col("t.id") === col("sp.id") &&
        col("t.pos") >= col("sp.span_start") && col("t.pos") < col("sp.span_end"),
      "left_anti")
    val rejoined = kept
      .groupBy(col("id").as(idCol))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok")), " ").as(textCol))
    docs.select(col(idCol))
      .join(rejoined, Seq(idCol), "left_outer")
      .select(col(idCol), coalesce(col(textCol), lit("")).as(textCol))
  }

  /** Boilerplate excision: (doc_id, text) with every span whose corpus
    * frequency exceeds `maxCount` removed and the survivors rejoined in
    * order. Documents that were entirely boilerplate (or empty) come back
    * with an empty string — the row survives so callers can tell "scrubbed
    * to nothing" from "missing".
    *
    * This is the one path where span text must shuffle (reassembly groups a
    * document's surviving spans); it travels once, in span-sized pieces,
    * after the hot spans — by construction the highest-volume ones — were
    * anti-joined away.
    */
  def scrub(
      docs: DataFrame, span: Int = 10, maxCount: Long = 1L,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sp = spans(docs, span, idCol, textCol)
      .withColumn("h", md5(col("sp")))
    val hot = sp.groupBy("h").agg(count(lit(1)).as("span_df"))
      .filter(col("span_df") > maxCount)
      .select("h")
    val kept = sp.join(hot, Seq("h"), "left_anti")
      .groupBy(col("id").as(idCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("sp")))),
            x => x.getField("sp")),
          " ").as(textCol))
    docs.select(col(idCol))
      .join(kept, Seq(idCol), "left_outer")
      .select(col(idCol), coalesce(col(textCol), lit("")).as(textCol))
  }
}
