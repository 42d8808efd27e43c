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
    val vars = w.select(col("word"), explode(delVariants(col("word"))).as("v"))
    vars.as("a")
      .join(vars.as("b"),
        col("a.v") === col("b.v") && col("a.word") < col("b.word"))
      .select(col("a.word").as("word_a"), col("b.word").as("word_b"))
      .distinct()
      .withColumn("dist", levenshtein(col("word_a"), col("word_b")).cast("long"))
      .filter(col("dist") <= 1)
  }
}
