package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Character-entropy quality scoring — the cheap gibberish/degeneracy
  * detector that needs no trained model: H = ln(N) − (Σ c·ln(c))/N nats
  * over the document's character histogram. Repetitive texts (`aaaa…`,
  * template spam) score near 0; natural prose sits in a mid band; uniform
  * random noise approaches ln(alphabet). The usual quality gate keeps a
  * band, not a side.
  *
  * Determinism: the same contract as [[NgramLm]] — `ln` only ever sees
  * INTEGERS (character counts), each log is decimal(20,6)-rounded, the
  * per-document accumulation multiplies exact integers into exact
  * decimals and sums them exactly, and the final expression is two IEEE
  * ops on engine-identical doubles.
  *
  * Shape at scale: explode characters → two map-side-combined groupBys.
  * Only (id, char, count) rows shuffle; the histogram bound is the
  * alphabet, so the second aggregate is tiny per doc.
  */
object Entropy {

  private def lnDec(x: Column): Column = log(x).cast("decimal(20,6)")

  /** (id, n_chars, n_distinct_chars, entropy_nats, keep) per document;
    * `keep` = entropy within [minEntropy, maxEntropy]. Null/empty text
    * rows are excluded (nothing to measure).
    */
  def charEntropy(
      docs: DataFrame,
      minEntropy: Double,
      maxEntropy: Double,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .filter(col(textCol).isNotNull && length(col(textCol)) >= 1)
      // One linear pass per document (see TextFunctions.CharSplitRegex
      // for the O(n) vs O(n^2) rationale); the trailing empty Spark's
      // limit=-1 split keeps is dropped POST-explode — that filter stays
      // whole-stage-codegen where the staged-array HOF form would run an
      // interpreted lambda per character.
      .select(col(idCol).as("id"),
        explode(split(col(textCol), TextFunctions.CharSplitRegex)).as("ch"))
      .filter(col("ch") =!= "")
      .groupBy("id", "ch")
      .agg(count(lit(1)).as("c"))
      .groupBy("id")
      .agg(
        sum(col("c")).as("n_chars"),
        count(lit(1)).as("n_distinct_chars"),
        sum(col("c") * lnDec(col("c"))).as("__clnc"))
      .select(
        col("id").as(idCol),
        col("n_chars"),
        col("n_distinct_chars"),
        (lnDec(col("n_chars")).cast("double") -
          col("__clnc").cast("double") / col("n_chars")).as("entropy_nats"))
      .withColumn("keep",
        col("entropy_nats") >= minEntropy && col("entropy_nats") <= maxEntropy)
}
