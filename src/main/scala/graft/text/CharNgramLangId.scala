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

  /** Character bigrams of `text` as an array column. Callers must filter
    * length >= 2 first: Spark's `sequence(1, 0)` runs DESCENDING, so an
    * unguarded length-1 text would fabricate grams. Positions are Java
    * chars — BMP-safe, which covers the corpus.
    */
  private def charBigrams(text: Column): Column =
    transform(
      sequence(lit(1), length(text) - 1),
      i => text.substr(i, lit(2)))

  /** (id, gram, c_doc) exploded bigram counts. */
  private def docGrams(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .filter(col(textCol).isNotNull && length(col(textCol)) >= 2)
      .select(col(idCol).as("id"),
        explode(charBigrams(col(textCol))).as("gram"))
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
          explode(charBigrams(col(textCol))).as("gram"))
        .groupBy("plang", "gram")
        .agg(count(lit(1)).as("c_lang")))
    val totals = profile.groupBy("plang").agg(sum(col("c_lang")).as("n_lang"))
    val scores = docGrams(docs, idCol, textCol)
      .join(profile, Seq("gram"))
      .groupBy("id", "plang")
      .agg(sum(col("c_doc") * col("c_lang")).as("__dot"))
      .join(broadcast(totals), Seq("plang"))
      .withColumn("score", col("__dot").cast("double") / col("n_lang"))
    val byDoc = Window.partitionBy("id").orderBy(col("score").desc, col("plang").asc)
    val best = scores
      .withColumn("__rk", row_number().over(byDoc))
      .filter(col("__rk") === 1)
      .select(col("id"), col("plang").as("pred_lang"), col("score"))
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
