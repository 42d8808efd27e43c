package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.CacheScope

/** Trained character-n-gram language identification — the langid.py /
  * fastText shape reduced to its exact-arithmetic core: per-language
  * character-bigram profiles counted from labeled training text, and a
  * document classified to the language whose profile best matches its own
  * bigram counts. The heuristic stopword scorer ([[TextFunctions.langId]])
  * needs a curated word list per language; this learns its evidence from
  * data and handles languages without whitespace-delimited stopwords (the
  * zh case) for free.
  *
  * Score(doc, lang) = Σ_g c_doc(g)·c_lang(g) / N_lang — the dot product
  * of the document's bigram counts with the language's profile,
  * normalized by the profile's total mass so big training languages don't
  * win by volume. The dot product is an exact INTEGER (long sums of
  * count products — no floats until the single normalizing division), so
  * the score is engine-exact and the argmax needs no epsilon. Ties break
  * to the lexicographically first language.
  *
  * Shape at scale: the model IS a (gram, lang, count) table built by one
  * explode + map-side-combined groupBy; scoring is an equi-join on the
  * gram followed by a map-side-combined rollup and a 5-rows-per-doc
  * window. Store the profile table and classifying a new crawl is
  * join-only — the same train-once/score-cheap shape as [[NgramLm]].
  */
object CharNgramLangId {

  /** Character bigrams from a STAGED char array: adjacent-pair concat via
    * zip_with of the array against its own 1-shifted slice — one linear
    * pass per document. The substr-per-position form
    * (transform(sequence(1, len-1), i -> substr(text, i, 2))) is O(n^2):
    * UTF8String re-walks the string to find each position (same trap
    * Entropy.charEntropy had; ~2x on this corpus). The char array must be
    * a BOUND column, not an inline split — a repeated inline split
    * re-runs per slice reference (the staging pitfall
    * TextFunctions.shinglesFromTokens documents).
    */
  private def charBigramsFromChars(chs: Column): Column =
    zip_with(
      slice(chs, lit(1), size(chs) - 1),
      slice(chs, lit(2), size(chs) - 1),
      (a, b) => concat(a, b))

  /** (id, gram, c_doc) exploded bigram counts. Length >= 2 is filtered
    * first so the shifted slices are never empty-vs-negative.
    */
  private def docGrams(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .filter(col(textCol).isNotNull && length(col(textCol)) >= 2)
      .select(col(idCol).as("id"),
        TextFunctions.chars(col(textCol)).as("__chs"))
      .select(col("id"), explode(charBigramsFromChars(col("__chs"))).as("gram"))
      .groupBy("id", "gram")
      .agg(count(lit(1)).as("c_doc"))

  /** Classify every `docs` row against profiles trained on `train`
    * (which carries `langCol` labels): (id, pred_lang, score, is_correct).
    * `is_correct` is computed when `docs` also carries the `langCol`
    * label; an unlabeled corpus (no such column) gets null — classifying
    * a new crawl must not require a label column.
    */
  def classify(
      docs: DataFrame,
      train: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      langCol: String = "lang"): DataFrame = {
    val profile = CacheScope.persist(
      train
        .filter(col(textCol).isNotNull && col(langCol).isNotNull &&
          length(col(textCol)) >= 2)
        .select(col(langCol).as("plang"),
          TextFunctions.chars(col(textCol)).as("__chs"))
        .select(col("plang"), explode(charBigramsFromChars(col("__chs"))).as("gram"))
        .groupBy("plang", "gram")
        .agg(count(lit(1)).as("c_lang")))
    val totals = profile.groupBy("plang").agg(sum(col("c_lang")).as("n_lang"))
    val scores = docGrams(docs, idCol, textCol)
      .join(profile, Seq("gram"))
      .groupBy("id", "plang")
      .agg(sum(col("c_doc") * col("c_lang")).as("__dot"))
      .join(broadcast(totals), Seq("plang"))
      .withColumn("score", col("__dot").cast("double") / col("n_lang"))
    // Argmax as a map-side-combinable min_by over (−score, plang) instead
    // of a row_number window (guide §2.3: aggregate before you shuffle —
    // the window form shuffled and SORTED every (doc, lang) score row;
    // the aggregate ships one partial row per doc per mapper). Ordering
    // identical to the window's (score desc, plang asc) FOR NON-NaN
    // scores — guaranteed here because score is an exact integer dot
    // divided by a count >= 1. A score source that could produce NaN
    // would break the equivalence (Spark sorts NaN greatest, so the
    // window picked a NaN row first while min_by on the negation picks
    // it last) — keep the denominator positive if this ever changes.
    // Otherwise: Double.compare on the negated score reverses exactly,
    // ties fall to the language.
    val best = scores
      .groupBy("id")
      .agg(min_by(
        struct(col("plang"), col("score")),
        struct(negate(col("score")), col("plang"))).as("__b"))
      .select(col("id"), col("__b.plang").as("pred_lang"),
        col("__b.score").as("score"))
    val label =
      if (docs.columns.contains(langCol)) col(langCol)
      else lit(null).cast("string")
    val isCorrect =
      if (docs.columns.contains(langCol)) col("pred_lang") <=> col("__label")
      else lit(null).cast("boolean")
    docs
      .filter(col(textCol).isNotNull && length(col(textCol)) >= 2)
      .select(col(idCol), label.as("__label"))
      .join(best, col(idCol) === best("id"), "left")
      .select(
        col(idCol),
        col("pred_lang"),
        col("score"),
        isCorrect.as("is_correct"))
  }
}
