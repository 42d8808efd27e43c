package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy word matching via deletion-neighborhood blocking — the
  * SymSpell/FastSS shape for typo normalization and OCR-noise cleanup in
  * a corpus pipeline. The naive formulation is an all-pairs levenshtein
  * (quadratic in vocabulary — unusable at crawl scale); here every
  * DISTINCT word emits itself plus its len single-deletion variants, and
  * the classic completeness property — two words within edit distance 1
  * MUST share such a variant (delete the differing position) — turns
  * candidate generation into an EQUI self-join on the variant key, the
  * d2/e21 banding shape. The exact integer `levenshtein` (same classic DP
  * in Spark and DuckDB — fully oracle-checkable) then filters the blocked
  * pairs, which distance-2 collisions like ("ab","ba") require.
  *
  * At 100 TB: keys are |vocab|·(len+1) rows — vocabulary-sized, not
  * corpus-sized (block on DISTINCT words and join occurrences back, the
  * BPE "tokenizer cache" pattern). Short words make hot variant keys
  * ("a" is a variant of every 2-char word) — `minLen` floors them away,
  * the same df-cap lever the inverted-index family documents; deeper
  * distances use k-deletion neighborhoods with the identical shape.
  */
object Fuzzy {

  /** The word itself plus its single-character-deletion variants. */
  private[text] def delVariants(word: Column): Column =
    array_union(
      array(word),
      transform(sequence(lit(0), length(word) - 1), i =>
        concat(word.substr(lit(1), i), word.substr(i + 2, length(word)))))

  /** All unordered pairs of distinct `words` (column `word`) within edit
    * distance 1: (word_a, word_b, dist) with word_a < word_b. Words
    * shorter than `minLen` are dropped (hot-key floor, see above).
    */
  def editDistance1Pairs(words: DataFrame, minLen: Int = 2): DataFrame = {
    require(minLen >= 1, s"minLen must be >= 1, got $minLen")
    val w = words.select("word").distinct()
      .filter(length(col("word")) >= minLen)
    // Persisted: the variant table is BOTH legs of the self-join below, so
    // the whole upstream chain (corpus tokenize + distinct + variant
    // explode) would otherwise run twice (guide §2.4 — t41's x4 Generate
    // plan dup). Vocabulary-sized (|vocab|·(len+1) rows), never corpus-sized.
    val vars = graft.util.CacheScope.persist(
      w.select(col("word"), explode(delVariants(col("word"))).as("v")))
    vars.as("a")
      .join(vars.as("b"),
        col("a.v") === col("b.v") && col("a.word") < col("b.word"))
      .select(col("a.word").as("word_a"), col("b.word").as("word_b"))
      .distinct()
      .withColumn("dist", levenshtein(col("word_a"), col("word_b")).cast("long"))
      .filter(col("dist") <= 1)
  }

  /** Did-you-mean query correction: rewrite each query term to its best
    * vocabulary match. In-vocabulary terms stay; OOV terms map through
    * the deletion-neighborhood join to the distance-1 candidate with
    * (min dist, max corpus frequency, min word) — the classic
    * did-you-mean rule — and OOV terms with no candidate stay unchanged.
    * `queries` = (query_id, query_text); `vocab` = (word, ctf).
    * Returns (query_id, query_text) with terms corrected in place.
    *
    * Shape: variants are vocabulary- and query-sized, never
    * corpus-sized; the best-candidate window partitions by
    * (query_id, term position). Composes with [[graft.text.Bm25]] as
    * the retrieval front-end (t42).
    */
  def correctTerms(queries: DataFrame, vocab: DataFrame): DataFrame = {
    val qt = queries.select(col("query_id"),
      posexplode(TextFunctions.tokens(col("query_text"))).as(Seq("widx", "term")))
    val inVocab = vocab.select(col("word").as("term"), lit(true).as("__iv"))
    val oov = qt.join(inVocab, Seq("term"), "left_anti")
    val qv = oov.select(col("query_id"), col("widx"), col("term"),
      explode(delVariants(col("term"))).as("vv"))
    val wv = vocab.select(col("word"), col("ctf"),
      explode(delVariants(col("word"))).as("vv"))
    val cand = qv.join(wv, Seq("vv"))
      .select("query_id", "widx", "term", "word", "ctf").distinct()
      .withColumn("dist", levenshtein(col("term"), col("word")))
      .filter(col("dist") <= 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id", "widx")
      .orderBy(col("dist"), col("ctf").desc, col("word"))
    val best = cand
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col("query_id"), col("widx"), col("word").as("__corr"))
    qt.join(inVocab, Seq("term"), "left_outer")
      .join(best, Seq("query_id", "widx"), "left_outer")
      .withColumn("__t",
        when(col("__iv").isNotNull, col("term"))
          .otherwise(coalesce(col("__corr"), col("term"))))
      .groupBy("query_id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("widx"), col("__t")))),
          x => x.getField("__t")), " ").as("query_text"))
  }
}
