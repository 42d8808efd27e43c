package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-law diagnostics for dataset cards: the Zipf rank-frequency fit
  * and the Heaps vocabulary-growth curve — the two plots every corpus
  * report ships next to its size table. A healthy natural-language crawl
  * has Zipf slope ≈ −1 and sublinear Heaps growth; a synthetic, templated
  * or duplicated corpus bends both, which makes them cheap drift alarms
  * for an ingest pipeline.
  *
  * Engine-exactness contract (the t20/t23 pattern): every ln is taken of
  * an INTEGER (rank or frequency) and rounded once onto the
  * DECIMAL(8,6) grid, so the regression sums are exact decimal
  * arithmetic regardless of partitioning; the final slope/intercept are
  * one fixed double expression over those exact sums.
  */
object CorpusStats {

  /** Top-`topN` terms by corpus frequency with their Zipf rank and the
    * least-squares slope/intercept of ln(freq) on ln(rank) repeated on
    * every row (the fit is over exactly these topN rows). The top-N pick
    * is a bounded-heap aggregation (freq desc, term asc) — never a global
    * window over the vocabulary, which at crawl scale is billions of
    * terms; the regression is a one-row aggregate broadcast back.
    */
  def zipfFit(
      docs: DataFrame,
      topN: Int = 200,
      textCol: String = "text"): DataFrame = {
    require(topN > 0, s"topN must be positive, got $topN")
    val tf = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("freq"))
    val item = struct(negate(col("freq")).as("nf"), col("term").as("term"))
    val ranked = tf
      .agg(org.apache.spark.sql.graftnative.TopK
        .collectTopK(item, topN, reverse = true).as("__top"))
      .select(posexplode(array_sort(col("__top"))).as(Seq("__pos", "__it")))
      .select(
        (col("__pos") + 1).cast("long").as("rank"),
        col("__it.term").as("term"),
        negate(col("__it.nf")).as("freq"))
      .withColumn("__x", log(col("rank")).cast("decimal(8,6)"))
      .withColumn("__y", log(col("freq")).cast("decimal(8,6)"))
    val sums = ranked.agg(
      count(lit(1)).cast("double").as("__n"),
      sum(col("__x")).cast("double").as("__sx"),
      sum(col("__y")).cast("double").as("__sy"),
      sum(col("__x") * col("__y")).cast("double").as("__sxy"),
      sum(col("__x") * col("__x")).cast("double").as("__sxx"))
    ranked.crossJoin(broadcast(sums))
      .withColumn("slope",
        (col("__n") * col("__sxy") - col("__sx") * col("__sy")) /
          (col("__n") * col("__sxx") - col("__sx") * col("__sx")))
      .withColumn("intercept",
        (col("__sy") - col("slope") * col("__sx")) / col("__n"))
      .select("rank", "term", "freq", "slope", "intercept")
  }

  /** Heaps vocabulary-growth curve: cut the corpus into `parts` doc-id
    * prefixes and report, per decile, the number of NEW terms first seen
    * there and the cumulative vocabulary — distinct-terms-so-far as a
    * function of corpus prefix. One explode + min-per-term rollup; the
    * decile of a term is integer math off its first doc id, so no second
    * corpus pass and no per-prefix distinct counts. Assumes contiguous
    * doc ids from 0 (the synthetic-table layout).
    */
  def heapsCurve(
      docs: DataFrame,
      parts: Int = 10,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(parts > 0, s"parts must be positive, got $parts")
    val spark = docs.sparkSession
    val fd = docs
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy("term").agg(min(col(idCol)).as("f"))
    val dTot = docs.agg((max(col(idCol)) + 1).as("d"))
    val dec = fd.crossJoin(broadcast(dTot))
      .select((floor((col("f") * parts) / col("d")) + 1).cast("long").as("decile"))
      .groupBy("decile").agg(count(lit(1)).as("new_terms"))
    val spine = spark.range(1, parts + 1).select(col("id").as("decile"))
    // the running total is a parts-row window — bounded by construction
    val w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    spine.join(dec, Seq("decile"), "left")
      .withColumn("new_terms", coalesce(col("new_terms"), lit(0L)))
      .withColumn("vocab", sum(col("new_terms")).over(w).cast("long"))
      .orderBy("decile")
  }
}
