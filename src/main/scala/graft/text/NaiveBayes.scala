package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.CacheScope

/** Multinomial Naive Bayes text classification with Laplace smoothing —
  * the classic trained document classifier (domain/source/topic routing in
  * a curation pipeline; McCallum & Nigam 1998's event model), built so the
  * score is engine-reproducible.
  *
  * score(c, d) = ln P(c) + Σ_t tf(t,d) · ln( (cnt(t,c)+1) / (N_c + V) )
  *
  * decomposed for the join (the smoothing denominator does not depend on
  * the term, and unseen (t,c) pairs contribute ln 1 = 0):
  *
  *   Σ_t tf · ln(cnt(t,c)+1)   — equi-join on the term, only EXISTING
  *                               (t,c) rows ever move (the sparse part)
  * − dl_d · ln(N_c + V)        — per (doc, class): doc length × a class
  *                               constant, broadcast 20 rows
  * + ln(n_docs_c / n_docs)     — the class prior, same broadcast
  *
  * Every ln is computed once per (t,c) / class — never per (doc, term) —
  * and immediately rounded to the DECIMAL(20,6) grid (the t23/t25 entropy
  * precedent: JVM and DuckDB libm agree to well past 6 dp, and after the
  * cast both engines sum IDENTICAL decimals exactly, so the argmax is
  * order- and partition-invariant). Ties break to the first class name.
  *
  * Shape at scale: training is one explode + map-side-combined groupBy
  * into a (term, class, weight) model table; scoring joins doc term
  * counts to the model on the term — model rows move once, text never
  * does — then one rollup and a per-doc argmax over |classes| rows.
  */
object NaiveBayes {

  private def termCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy("id", "term")
      .agg(count(lit(1)).as("tf"))

  private val fix = "decimal(20,6)"

  /** The frozen NB model state: the sparse (cls, term, w) weight table
    * and the per-class (cls, denom, prior) constants — everything
    * scoring needs, both on the decimal(20,6) grid, so the model
    * round-trips parquet EXACTLY (decimals are exact at rest; the lns
    * are computed once at training time, never re-derived on read).
    * The t44b/t49c/e10c serving split on the classifier family.
    */
  final case class NbModel(weights: DataFrame, classes: DataFrame)

  def nbModel(
      train: DataFrame,
      classCol: String,
      textCol: String = "text"): NbModel = {
    val trainTf = CacheScope.persist(
      train
        .filter(col(classCol).isNotNull)
        .select(col(classCol).as("cls"),
          explode(TextFunctions.tokens(col(textCol))).as("term"))
        .groupBy("cls", "term")
        .agg(count(lit(1)).as("cnt")))
    // ln(cnt+1) once per existing (term, class) row, on the decimal grid.
    val weights = trainTf.select(col("cls"), col("term"),
      log(col("cnt") + 1).cast(fix).as("w"))
    val vocab = trainTf.select(countDistinct(col("term")).as("v"))
    val classes = trainTf.groupBy("cls").agg(sum(col("cnt")).as("n_c"))
      .crossJoin(broadcast(vocab))
      .join(broadcast(
        train.filter(col(classCol).isNotNull)
          .groupBy(col(classCol).as("cls")).agg(count(lit(1)).as("docs_c"))
          .crossJoin(train.filter(col(classCol).isNotNull)
            .agg(count(lit(1)).as("docs_all")))), Seq("cls"))
      .select(col("cls"),
        log(col("n_c") + col("v")).cast(fix).as("denom"),
        (log(col("docs_c")).cast(fix) - log(col("docs_all")).cast(fix)).as("prior"))
    NbModel(weights, classes)
  }

  /** Persist a frozen NB model beside a [[graft.util.Fingerprint]] of
    * the train corpus, so [[readNbModel]] refuses a stale artifact.
    * `contentCols` must list BOTH the text column AND the class-label
    * column the model was trained on (r15 ADVICE: labels changed under
    * stable ids are a mutation the guard must see).
    */
  def writeNbModel(model: NbModel, train: DataFrame, path: String,
      idCol: String = "doc_id",
      contentCols: Seq[String] = Seq("text", "lang")): Unit = {
    model.weights.write.mode("overwrite").parquet(s"$path/weights")
    model.classes.coalesce(1).write.mode("overwrite").parquet(s"$path/classes")
    graft.util.Fingerprint.write(model.weights.sparkSession,
      s"$path/fingerprint", graft.util.Fingerprint.of(train, idCol, contentCols))
  }

  def readNbModel(spark: org.apache.spark.sql.SparkSession,
      train: DataFrame, path: String,
      idCol: String = "doc_id",
      contentCols: Seq[String] = Seq("text", "lang"),
      memo: Boolean = false): NbModel = {
    graft.util.Fingerprint.requireMatch(spark, s"$path/fingerprint",
      train, idCol, contentCols, what = "NB model", memo = memo)
    NbModel(
      weights = spark.read.parquet(s"$path/weights"),
      classes = spark.read.parquet(s"$path/classes"))
  }

  /** [[writeNbModel]] guarded by the CATALOG-SNAPSHOT fingerprint (r17,
    * the [[NgramLm.writeKnModelSnapshot]] pattern): for a path-backed
    * train corpus the guard fingerprints the directory's FILE LISTING —
    * which covers text AND labels at once, since any column mutation
    * rewrites the files — so [[readNbModelSnapshot]] costs a metadata
    * round-trip per serve job, never a corpus pass. File-set
    * granularity; see [[graft.util.Fingerprint.ofSnapshot]].
    */
  def writeNbModelSnapshot(model: NbModel, trainPath: String,
      path: String): Unit = {
    val spark = model.weights.sparkSession
    model.weights.write.mode("overwrite").parquet(s"$path/weights")
    model.classes.coalesce(1).write.mode("overwrite").parquet(s"$path/classes")
    graft.util.Fingerprint.write(spark, s"$path/fingerprint_snapshot",
      graft.util.Fingerprint.ofSnapshot(spark, trainPath))
  }

  /** Read a snapshot-guarded NB model: loud on any file change under
    * `trainPath` since training; zero corpus scan either way.
    */
  def readNbModelSnapshot(spark: org.apache.spark.sql.SparkSession,
      trainPath: String, path: String): NbModel = {
    graft.util.Fingerprint.requireSnapshotMatch(spark,
      s"$path/fingerprint_snapshot", trainPath, what = "NB model")
    NbModel(
      weights = spark.read.parquet(s"$path/weights"),
      classes = spark.read.parquet(s"$path/classes"))
  }

  /** Classify `docs` against profiles trained on `train` (which carries
    * `classCol` labels): (id, pred_class, score). Score is the fixed-point
    * log-posterior (up to the constant, as a double for output).
    */
  def classify(
      docs: DataFrame,
      train: DataFrame,
      classCol: String,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    classifyWith(docs, nbModel(train, classCol, textCol), idCol, textCol)

  /** [[classify]] against a pre-built frozen model — the apply-only
    * serving plan: doc term counts equi-join the weight table, one
    * rollup, a per-doc argmax over |classes| rows; no training stage.
    */
  def classifyWith(
      docs: DataFrame,
      m: NbModel,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val model = m.weights
    val classes = m.classes
    val docTf = CacheScope.persist(termCounts(docs, idCol, textCol))
    val dl = docTf.groupBy("id").agg(sum(col("tf")).as("dl"))
    // Sparse part: only matching (term, class) rows join and move.
    val sparse = docTf
      .join(model, Seq("term"))
      .groupBy("id", "cls")
      .agg(sum(col("tf") * col("w")).as("s1"))
    val scored = dl
      .crossJoin(broadcast(classes))
      .join(sparse, Seq("id", "cls"), "left")
      .select(col("id"), col("cls"),
        (coalesce(col("s1"), lit(0).cast(fix))
          - col("dl") * col("denom") + col("prior")).as("score"))
    // Argmax as a map-side-combinable min_by over (−score, cls) instead of
    // a row_number window (see CharNgramLangId.classify — same rationale,
    // same ordering; decimal negation is exact so the reversal is too;
    // the score is exact DECIMAL here, which can never be NaN, so the
    // NaN caveat documented there is unreachable on this path).
    scored
      .groupBy("id")
      .agg(min_by(
        struct(col("cls"), col("score")),
        struct(negate(col("score")), col("cls"))).as("__b"))
      .select(col("id").as(idCol), col("__b.cls").as("pred_class"),
        col("__b.score").cast("double").as("score"))
  }
}
