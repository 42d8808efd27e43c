package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.CacheScope

/** N-gram language-model quality scoring — the CCNet/KenLM-style filter:
  * train bigram statistics on a trusted slice of the corpus, score every
  * document's cross-entropy under the model, and flag documents whose text
  * the model finds improbable (gibberish, boilerplate soup, wrong-language
  * leakage). The canonical perplexity filter between heuristic ratios
  * ([[TextFunctions]] t2) and a learned classifier.
  *
  * Model: add-one-smoothed bigram MLE over whitespace tokens,
  * P(w2 | w1) = (c(w1,w2) + 1) / (c(w1) + V), where c(w1) is w1's count as
  * a bigram PREFIX (so the model is self-consistent: summing the smoothed
  * P over the vocab gives 1) and V is the number of distinct prefixes in
  * the training slice. Unseen bigrams and unseen prefixes fall out of the
  * same formula (c = 0). Cross-entropy is in nats per bigram; perplexity
  * is e^ce (left to the caller — see determinism note).
  *
  * Shape at scale: the model IS two count tables — built with one explode
  * + map-side-combined groupBy each, joined back to the exploded document
  * bigrams by plain equi-joins. Nothing is collected, no window touches
  * the corpus, and the count tables are the only state (store them and
  * scoring a new crawl is join-only, the incremental-dedup shape).
  *
  * Determinism (the cross-engine hash contract): `ln` is only ever applied
  * to INTEGERS (counts), each log is immediately rounded to 6 decimals by
  * a decimal(20,6) cast, and the per-document accumulation sums those
  * decimals EXACTLY — so partial aggregation order cannot move the result,
  * and a sub-ulp `ln` disagreement between engines would have to land
  * within 1e-16 of a 5e-7 rounding boundary to matter. The final
  * cross-entropy is one IEEE division. (Re-exponentiating to perplexity
  * would reintroduce an arbitrary-argument libm call — the exact drift the
  * TF-IDF rational-score note documents — so the operator reports nats.)
  */
object NgramLm {

  /** round(ln(x), 6) as an exactly-summable decimal; x must be >= 1 so the
    * value is non-negative and both engines' half-up / half-away-from-zero
    * decimal roundings coincide.
    */
  private def lnDec(x: Column): Column = log(x).cast("decimal(20,6)")

  /** −slp/n as a double, normalized by `+ 0.0` so an exact-zero
    * log-prob sum (a perfectly-predicted doc — every gram at
    * probability 1 on the decimal grid) emits +0.0, never −0.0: IEEE
    * negation flips the zero's sign bit, the one bit pattern a
    * cross-engine hash can disagree on while both engines print "0.0"
    * (r16 verdict #2 — observed live in t53d's driver dump). −0.0 + 0.0
    * is +0.0 in round-to-nearest, any other value is unchanged, and a
    * NULL sum stays NULL; every oracle mirrors the same `+ 0.0`.
    */
  private def ceNorm(slp: Column, n: Column): Column =
    -slp.cast("double") / n + lit(0.0)

  /** (doc_id, w1, w2) bigram stream of a corpus. */
  private def bigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= 2)
      .select(col("id"), posexplode(slice(col("__toks"), lit(1), size(col("__toks")) - 1))
        .as(Seq("__pos", "w1")), col("__toks"))
      .select(col("id"), col("w1"),
        element_at(col("__toks"), col("__pos") + 2).as("w2"))

  /** (doc_id, w1, w2, w3) trigram stream of a corpus. */
  private def trigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= 3)
      .select(col("id"), posexplode(slice(col("__toks"), lit(1), size(col("__toks")) - 2))
        .as(Seq("__pos", "w1")), col("__toks"))
      .select(col("id"), col("w1"),
        element_at(col("__toks"), col("__pos") + 2).as("w2"),
        element_at(col("__toks"), col("__pos") + 3).as("w3"))

  /** ONE explode carrying BOTH gram orders (r15 verdict #3 — t51's kn3
    * block re-exploded doc trigrams beside the bigram legs' explode):
    * one row per BIGRAM position with `w3` = the following token or
    * NULL at the last position, so
    *   - the bigram stream is the (id, w1, w2) projection (every row), and
    *   - the trigram stream is the w3-not-null filter
    * — exactly [[bigrams]] and [[trigrams]] row-for-row (same >= 2
    * filter; `w3 IS NOT NULL` ⇔ pos ≤ n−3 ⇔ the >= 3 slice). `get` is
    * the 0-based null-safe array access (ANSI `element_at` throws
    * out-of-bounds, and the last bigram position has no third token).
    */
  private def grams23(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= 2)
      .select(col("id"), posexplode(slice(col("__toks"), lit(1), size(col("__toks")) - 1))
        .as(Seq("__pos", "w1")), col("__toks"))
      .select(col("id"), col("w1"),
        element_at(col("__toks"), col("__pos") + 2).as("w2"),
        get(col("__toks"), col("__pos") + 2).as("w3"))

  /** Score every `docs` row under a bigram model trained on `train`:
    * (id, n_bigrams, n_unseen, cross_entropy, keep). Documents with fewer
    * than two tokens score null entropy and keep=false (nothing to judge —
    * route them to a length filter, not past this one).
    */
  def crossEntropy(
      docs: DataFrame,
      train: DataFrame,
      maxCrossEntropy: Double,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    addOnePerDoc(docs, train, maxCrossEntropy, idCol, textCol).drop("__slp")

  /** Per-doc add-one scoring keeping the exact decimal log-prob sum
    * (`__slp`) — the same internal split as [[knPerDoc]], so
    * [[screenCompare]] can pool batches without float accumulation.
    * The add-one model is fully derivable from [[KnModel]]'s tables
    * (c12 = big.c12, c(w1) = uni.c1, V = |uni|), so one train bigram
    * pass feeds BOTH smoothers in the shoot-outs (r15 — the d18
    * shared-signature-pass pattern applied here).
    */
  private def addOnePerDoc(
      docs: DataFrame,
      train: DataFrame,
      maxCrossEntropy: Double,
      idCol: String,
      textCol: String): DataFrame =
    addOnePerDocModel(bigrams(docs, idCol, textCol), docs,
      knModel(train, idCol, textCol), maxCrossEntropy, idCol, textCol)

  private def addOnePerDocModel(
      docBigrams: DataFrame,
      docs: DataFrame,
      m: KnModel,
      maxCrossEntropy: Double,
      idCol: String,
      textCol: String): DataFrame = {
    // V = distinct prefixes: a ONE-ROW side — the broadcast crossJoin is
    // the same accounted shape as t10's corpus-count side (a constant-key
    // equi-join folds to the identical BNLJ anyway).
    val v = m.uni.agg(count(lit(1)).as("v"))

    val scored = docBigrams
      .join(m.big, Seq("w1", "w2"), "left")
      .join(m.uni.select(col("w1"), col("c1")), Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .select(
        col("id"),
        (lnDec(coalesce(col("c12"), lit(0L)) + 1) -
          lnDec(coalesce(col("c1"), lit(0L)) + col("v"))).as("__logp"),
        when(col("c12").isNull, 1L).otherwise(0L).as("__unseen"))
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(col("__unseen")).as("n_unseen"),
        sum(col("__logp")).as("__sum_logp"))
      .withColumn("cross_entropy",
        ceNorm(col("__sum_logp"), col("n_bigrams")))
    docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol))
      .join(scored, col(idCol) === scored("id"), "left")
      .select(
        col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_unseen"), lit(0L)).as("n_unseen"),
        col("__sum_logp").as("__slp"),
        col("cross_entropy"),
        coalesce(col("cross_entropy") <= maxCrossEntropy, lit(false)).as("keep"))
  }

  /** Interpolated Kneser–Ney bigram scoring (Kneser & Ney 1995; the
    * smoother inside KenLM, i.e. what CCNet-style perplexity filtering
    * actually runs) — the serious upgrade over [[crossEntropy]]'s add-one
    * baseline. With absolute discount D = 3/4:
    *
    *   P(w|v) = max(c(vw) − D, 0)/c(v) + (D·N1+(v·)/c(v)) · N1+(·w)/T
    *
    * where N1+(v·) = distinct continuations of v, N1+(·w) = distinct
    * prefixes of w (the "how many contexts has this word completed"
    * fertility that makes KN rank 'Francisco' low despite its raw count),
    * and T = distinct bigram types (so Pcont sums to 1). An unseen prefix
    * backs off to Pcont(w) alone. Σ_w P(w|v) = 1 exactly: the discount
    * mass D·N1+(v·) removed from the seen counts is precisely what the
    * continuation term redistributes.
    *
    * Exactness contract: D = 3/4 makes every probability a ratio of
    * INTEGERS — multiply through by 4·c(v)·T and
    *   num = max(4·c(vw) − 3, 0)·T + 3·N1+(v·)·N1+(·w),  den = 4·c(v)·T
    * (unseen prefix: num = 4·N1+(·w), den = 4·T). A bigram whose
    * continuation was never seen in training has num = 0; it takes the
    * documented floor num = 1 (P = 1/den — the one corner where exact
    * normalization is traded for a finite score, the standard OOV hack).
    * From there the [[crossEntropy]] contract applies verbatim: ln only
    * of integers, rounded onto the decimal(20,6) grid, summed exactly,
    * one final IEEE division. The num/den grid is ENFORCED, not assumed
    * (r14 verdict #1, completed r16): scoring runs one one-row agg over
    * the frozen model and, once 4·max(c(v))·T + 3·max(N1+(v·))·
    * max(N1+(·w)) leaves 2^63, AUTO-SELECTS the DECIMAL(38,0) num/den
    * path (r15 verdict #1 — the mitigation is a code path, not prose;
    * same plan shape, still exact integers, and DuckDB mirrors it
    * natively as HUGEINT — the t49d face). In-grid models keep the
    * cheaper Long arithmetic; past even 10^38 the engine refuses
    * loudly.
    *
    * Shape at scale: the model is THREE narrow tables (bigram counts +
    * per-prefix rollup + per-continuation rollup) all derived from one
    * map-side-combined aggregation of the train bigrams; T is a one-row
    * broadcast. Scoring is equi-joins on the exploded document bigrams —
    * store the tables and scoring a new crawl is join-only.
    */
  def knCrossEntropy(
      docs: DataFrame,
      train: DataFrame,
      maxCrossEntropy: Double,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    knScore(docs, knModel(train, idCol, textCol), maxCrossEntropy, idCol, textCol)

  /** The frozen KN model state: the three narrow count tables plus the
    * one-row bigram-type total. Train once offline, then [[knScore]] /
    * [[knScreenReport]] any number of batches against it — the
    * learn-once/apply-everywhere serving split (the t44b/ST11 shape;
    * each table is a plain DataFrame, so persisting the model is four
    * parquet writes).
    */
  final case class KnModel(big: DataFrame, uni: DataFrame, cont: DataFrame, tt: DataFrame) {
    /** Worst-case num/den bound over ANY scoring batch — a property of
      * the MODEL alone (r14 verdict #1 — the d17 lesson: contracts live
      * in requires, not scaladoc): num ≤ 4·max(c(v))·T +
      * 3·max(N1+(v·))·max(N1+(·w)) and den = 4·c(v)·T ≤ the same bound,
      * so one one-row agg over the frozen tables decides the whole
      * grid. Computed in BigInt (the check itself must not wrap), once
      * per model instance (lazy — ST12 scores a stream of micro-batches
      * against one model), before any scoring plan is built. An empty
      * model (T = 0) is trivially in-grid.
      */
    private[text] lazy val gridBound: BigInt = {
      val r = uni.agg(
          coalesce(max(col("c1")), lit(0L)).as("max_c1"),
          coalesce(max(col("fert")), lit(0L)).as("max_fert"))
        .crossJoin(broadcast(
          cont.agg(coalesce(max(col("cont")), lit(0L)).as("max_cont"))))
        .crossJoin(broadcast(tt))
        .head()
      BigInt(4) * r.getLong(0) * r.getLong(3) +
        BigInt(3) * r.getLong(1) * r.getLong(2)
    }

    /** Whether the exact Long multiply-through fits 2^63−1. In-grid
      * models score on Long arithmetic (the codegen-cheap common case);
      * past the grid [[knPerDoc]] AUTO-SELECTS the DECIMAL(38,0) path —
      * the mitigation the r15 guard message promised, now a real code
      * path (r15 verdict #1) — after [[decimalGridChecked]] confirms
      * even the decimal grid holds.
      */
    private[text] lazy val fitsLongGrid: Boolean = gridBound <= Long.MaxValue

    /** Loud enforcement of the DECIMAL(38,0) fallback grid: 38 digits
      * hold num/den bounds to 10^38−1 (DuckDB's HUGEINT twin holds to
      * ~1.7e38, so the tighter decimal bound governs both engines).
      * Reaching it needs 4·max(c1)·T ≈ 10^38 — two near-2^63 factors,
      * beyond any corpus — but the refusal stays loud, not a silent
      * ANSI overflow mid-plan.
      */
    private[text] lazy val decimalGridChecked: Unit =
      require(gridBound < BigInt(10).pow(38),
        s"KN model leaves even the DECIMAL(38,0) num/den grid: " +
          s"4*max(c1)*T + 3*max(fert)*max(cont) = $gridBound >= 10^38 - " +
          "no exact integer grid this engine (or DuckDB's HUGEINT) can " +
          "carry; shard the model or rescale the counts")
  }

  def knModel(train: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): KnModel =
    knModelOf(CacheScope.persist(
      bigrams(train, idCol, textCol).groupBy("w1", "w2").agg(count(lit(1)).as("c12"))))

  /** The three rollups of a PRE-BUILT (w1, w2, c12) bigram-count table —
    * c1 = Σ_w c(v,w) (prefix count), fert = N1+(v·): one rollup of
    * `big`, not a second pass over the train corpus. Factored so callers
    * holding a shared gram stream ([[screenCompare3]]) can build the
    * model without re-exploding.
    */
  private def knModelOf(big: DataFrame): KnModel =
    KnModel(
      big = big,
      uni = big.groupBy("w1").agg(sum(col("c12")).as("c1"), count(lit(1)).as("fert")),
      cont = big.groupBy("w2").agg(count(lit(1)).as("cont")),
      tt = big.agg(count(lit(1)).as("t")))

  /** Persist a frozen KN model as a SELF-VALIDATING serving artifact
    * (the t44b/e10c split on the LM family): the four narrow tables as
    * parquet plus a [[graft.util.Fingerprint]] of the train corpus, so
    * [[readKnModel]] refuses to score under a stale model. This is the
    * scaladoc's "store the tables and scoring a new crawl is join-only"
    * claim made executable.
    */
  def writeKnModel(model: KnModel, train: DataFrame, path: String,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    writeKnTables(model, path)
    graft.util.Fingerprint.write(model.big.sparkSession, s"$path/fingerprint",
      graft.util.Fingerprint.of(train, idCol, Seq(textCol)))
  }

  private def writeKnTables(model: KnModel, path: String): Unit = {
    model.big.write.mode("overwrite").parquet(s"$path/big")
    model.uni.write.mode("overwrite").parquet(s"$path/uni")
    model.cont.write.mode("overwrite").parquet(s"$path/cont")
    model.tt.write.mode("overwrite").parquet(s"$path/tt")
  }

  private def readKnTables(spark: SparkSession, path: String): KnModel =
    KnModel(
      big = spark.read.parquet(s"$path/big"),
      uni = spark.read.parquet(s"$path/uni"),
      cont = spark.read.parquet(s"$path/cont"),
      tt = spark.read.parquet(s"$path/tt"))

  /** [[writeKnModel]] guarded by the CATALOG-SNAPSHOT fingerprint
    * (r17): when the train corpus is path-backed, the staleness guard
    * fingerprints its FILE LISTING ([[graft.util.Fingerprint.ofSnapshot]])
    * instead of scanning rows — so [[readKnModelSnapshot]] costs a
    * metadata round-trip per serve job, never a corpus pass. This is
    * the production shape the row-fingerprint scaladoc recommends at
    * 100 TB, executable for any parquet-directory corpus; the
    * row-exact [[writeKnModel]] remains the corpus-identity-agnostic
    * default.
    */
  def writeKnModelSnapshot(model: KnModel, trainPath: String,
      path: String): Unit = {
    val spark = model.big.sparkSession
    writeKnTables(model, path)
    graft.util.Fingerprint.write(spark, s"$path/fingerprint_snapshot",
      graft.util.Fingerprint.ofSnapshot(spark, trainPath))
  }

  /** Read a snapshot-guarded KN model: requires the stored file-listing
    * fingerprint of `trainPath` to match the directory's CURRENT
    * listing — loud on any file added, removed, resized, or rewritten
    * since training; zero corpus scan either way.
    */
  def readKnModelSnapshot(spark: SparkSession, trainPath: String,
      path: String): KnModel = {
    graft.util.Fingerprint.requireSnapshotMatch(spark,
      s"$path/fingerprint_snapshot", trainPath, what = "KN model")
    readKnTables(spark, path)
  }

  /** Read a stored KN model, FIRST requiring its fingerprint to match
    * `train` — the corpus the caller believes it was trained on. Loud
    * on mismatch; the Long-grid guard then re-checks the loaded tables
    * on first scoring call as always (the guard is a KnModel property,
    * not a training-path one).
    */
  def readKnModel(spark: SparkSession, train: DataFrame, path: String,
      idCol: String = "doc_id", textCol: String = "text",
      memo: Boolean = false): KnModel = {
    graft.util.Fingerprint.requireMatch(spark, s"$path/fingerprint",
      train, idCol, Seq(textCol), what = "KN model", memo = memo)
    readKnTables(spark, path)
  }

  /** Per-doc scoring under a frozen model, keeping the exact decimal
    * log-prob sum (`__slp`) so callers can roll batches up without
    * re-introducing float accumulation ([[knScreenReport]]).
    */
  private def knPerDoc(
      docs: DataFrame, model: KnModel, maxCrossEntropy: Double,
      idCol: String, textCol: String): DataFrame =
    knPerDocStream(bigrams(docs, idCol, textCol), docs, model,
      maxCrossEntropy, idCol, textCol)

  /** The grid-selected KN num/den column pair over the joined
    * (c12, c1, fert, cont, t) row (r15 verdict #1): in-grid models
    * multiply through on Long (codegen integer arithmetic); a model
    * whose num/den bound leaves 2^63 switches every leaf to
    * DECIMAL(38,0) — identical formula, identical plan shape, still
    * exact integers (ANSI decimal overflow would be loud, and
    * decimalGridChecked pre-empts it). Shared by the standalone KN
    * scorer and the fused dual-model pass.
    */
  private def knNumDen(model: KnModel): (Column, Column) = {
    val useDecimal = !model.fitsLongGrid
    if (useDecimal) model.decimalGridChecked
    val g: Column => Column =
      if (useDecimal) _.cast("decimal(38,0)") else identity
    val c12 = g(coalesce(col("c12"), lit(0L)))
    val contC = g(coalesce(col("cont"), lit(0L)))
    val seen = col("c1").isNotNull
    val num = when(seen,
      greatest(
        greatest(g(lit(4L)) * c12 - g(lit(3L)), g(lit(0L))) * g(col("t")) +
          g(lit(3L)) * g(col("fert")) * contC,
        g(lit(1L))))
      .otherwise(greatest(g(lit(4L)) * contC, g(lit(1L))))
    val den = when(seen, g(lit(4L)) * g(col("c1")) * g(col("t")))
      .otherwise(g(lit(4L)) * g(col("t")))
    (num, den)
  }

  private def knPerDocStream(
      docBigrams: DataFrame, docs: DataFrame, model: KnModel,
      maxCrossEntropy: Double,
      idCol: String, textCol: String): DataFrame = {
    val big = model.big
    val uni = model.uni
    val cont = model.cont
    val tt = model.tt
    val (num, den) = knNumDen(model)

    val scored = docBigrams
      .join(big, Seq("w1", "w2"), "left")
      .join(uni, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(tt))
      .select(
        col("id"),
        (lnDec(num) - lnDec(den)).as("__logp"),
        when(col("c12").isNull, 1L).otherwise(0L).as("__unseen"),
        when(col("c1").isNull, 1L).otherwise(0L).as("__unseen_prefix"))
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(col("__unseen")).as("n_unseen"),
        sum(col("__unseen_prefix")).as("n_unseen_prefix"),
        sum(col("__logp")).as("__sum_logp"))
      .withColumn("kn_cross_entropy",
        ceNorm(col("__sum_logp"), col("n_bigrams")))
    docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol))
      .join(scored, col(idCol) === scored("id"), "left")
      .select(
        col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_unseen"), lit(0L)).as("n_unseen"),
        coalesce(col("n_unseen_prefix"), lit(0L)).as("n_unseen_prefix"),
        col("__sum_logp").as("__slp"),
        col("kn_cross_entropy"),
        coalesce(col("kn_cross_entropy") <= maxCrossEntropy, lit(false)).as("keep"))
  }

  /** [[knCrossEntropy]] against a pre-built frozen model. */
  def knScore(
      docs: DataFrame,
      model: KnModel,
      maxCrossEntropy: Double,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    knPerDoc(docs, model, maxCrossEntropy, idCol, textCol).drop("__slp")

  /** One-row screen report of a batch under a frozen model — the ST12
    * streaming gauge's unit of output and t49b's oracled batch face:
    * (n_docs, n_scored, n_rejected, n_bigrams, n_unseen,
    * corpus_cross_entropy). `n_rejected` counts keep=false under the
    * face's own convention (band failures AND too-short-to-judge docs);
    * `corpus_cross_entropy` is the per-BIGRAM pooled CE — the per-doc
    * decimal log-prob sums are summed EXACTLY across the batch (decimal,
    * not float), then divided once, so the report is order- and
    * partitioning-invariant like everything else on the contract.
    */
  def knScreenReport(
      docs: DataFrame,
      model: KnModel,
      maxCrossEntropy: Double,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    knPerDoc(docs, model, maxCrossEntropy, idCol, textCol)
      .agg(
        count(lit(1)).as("n_docs"),
        // coalesce(0): an EMPTY micro-batch (ST12's quiet-period case)
        // reports zero counts and a NULL pooled CE, not a row of NULLs
        // (the NULL slp-sum short-circuits the division under ANSI
        // before the zero-divisor check — spec-pinned)
        coalesce(sum(when(col("n_bigrams") > 0, 1L).otherwise(0L)), lit(0L))
          .as("n_scored"),
        coalesce(sum(when(col("keep"), 0L).otherwise(1L)), lit(0L))
          .as("n_rejected"),
        coalesce(sum(col("n_bigrams")), lit(0L)).as("n_bigrams"),
        coalesce(sum(col("n_unseen")), lit(0L)).as("n_unseen"),
        sum(col("__slp")).as("__slp_total"))
      .select(
        col("n_docs"), col("n_scored"), col("n_rejected"),
        col("n_bigrams"), col("n_unseen"),
        ceNorm(col("__slp_total"), col("n_bigrams"))
          .as("corpus_cross_entropy"))

  /** The frozen TRIGRAM KN model state (t53 — the LM-screen family's
    * next rung; Chen & Goodman 1998's interpolated-KN recursion at
    * order 3, D = 3/4 at every level):
    *
    *   P(w|uv) = max(c(uvw)−D,0)/c(uv) + (D·N1+(uv·)/c(uv))·Pkn(w|v)
    *   Pkn(w|v) = max(N1+(·vw)−D,0)/N1+(·v·) + (D·N1+(v··)/N1+(·v·))·Pcont(w)
    *   Pcont(w) = N1+(·w)/T
    *
    * where the middle level runs on CONTINUATION counts over trigram
    * TYPES (N1+(·vw) = distinct u with c(uvw)>0; N1+(·v·) = trigram
    * types with middle v; N1+(v··) = distinct w types following middle
    * v) and the unigram level reuses the bigram-type fertilities of
    * [[knModel]] (N1+(·w), T = bigram types). c(uv) here is the
    * TRIGRAM-PREFIX count Σ_w c(uvw) — not the raw bigram count — so
    * Σ_w P(w|uv) = 1 exactly at every seen level (each of the N1+
    * continuation types loses exactly D, and the redistributed mass
    * telescopes through the recursion).
    *
    * Exactness: multiplying through by the common denominator
    * 16·c(uv)·N1+(·v·)·T makes every probability a ratio of INTEGERS —
    *   num = 4·max(4·c(uvw)−3, 0)·N1+(·v·)·T
    *       + 3·N1+(uv·)·(max(4·N1+(·vw)−3, 0)·T + 3·N1+(v··)·N1+(·w))
    *   den = 16·c(uv)·N1+(·v·)·T
    * (unseen trigram prefix: drop to the middle level, num =
    * max(4·N1+(·vw)−3,0)·T + 3·N1+(v··)·N1+(·w), den = 4·N1+(·v·)·T;
    * unseen middle: num = 4·N1+(·w), den = 4·T — the bigram path's
    * floor tier; zero num takes the documented floor 1). From there the
    * [[crossEntropy]] contract applies verbatim, and the Long grid is
    * ENFORCED like the bigram's — the guard below.
    *
    * Shape at scale: five narrow tables, all rollups of ONE
    * map-side-combined trigram-type aggregation plus the bigram pass
    * [[knModel]] already runs; scoring is equi-joins on the exploded
    * document trigrams — store the tables and scoring stays join-only.
    */
  final case class Kn3Model(
      tri: DataFrame, pre: DataFrame, mid2: DataFrame, mid1: DataFrame,
      cont: DataFrame, tt: DataFrame) {
    /** The bigram guard's argument at order 3: the worst num/den over
      * any batch is a model property — num ≤ 16·max(c3)·max(N1+(·v·))·T
      * + 3·max(N1+(uv·))·(4·max(N1+(·vw))·T + 3·max(N1+(v··))·max cont),
      * den ≤ 16·max(c2)·max(N1+(·v·))·T — one one-row agg, BigInt,
      * once per model instance. Past 2^63 [[kn3PerDoc]] auto-selects the
      * DECIMAL(38,0) path (r15 verdict #1), exactly like [[KnModel]].
      */
    private[text] lazy val gridBound: BigInt = {
      val r = pre.agg(
          coalesce(max(col("c2")), lit(0L)).as("mc2"),
          coalesce(max(col("f3")), lit(0L)).as("mf3"))
        .crossJoin(broadcast(tri.agg(
          coalesce(max(col("c3")), lit(0L)).as("mc3"))))
        .crossJoin(broadcast(mid2.agg(
          coalesce(max(col("n3w")), lit(0L)).as("mn3w"))))
        .crossJoin(broadcast(mid1.agg(
          coalesce(max(col("nvdd")), lit(0L)).as("mnvdd"),
          coalesce(max(col("f2")), lit(0L)).as("mf2"))))
        .crossJoin(broadcast(cont.agg(
          coalesce(max(col("cont")), lit(0L)).as("mcont"))))
        .crossJoin(broadcast(tt))
        .head()
      val (mc2, mf3, mc3, mn3w, mnvdd, mf2, mcont, t) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
      val maxNum = BigInt(16) * mc3 * mnvdd * t +
        BigInt(3) * mf3 * (BigInt(4) * mn3w * t + BigInt(3) * mf2 * mcont)
      val maxDen = BigInt(16) * mc2 * mnvdd * t
      maxNum.max(maxDen)
    }

    private[text] lazy val fitsLongGrid: Boolean = gridBound <= Long.MaxValue

    /** Loud DECIMAL(38,0)-grid enforcement, as in [[KnModel]]. */
    private[text] lazy val decimalGridChecked: Unit =
      require(gridBound < BigInt(10).pow(38),
        s"trigram KN model leaves even the DECIMAL(38,0) num/den grid: " +
          s"max(num bound, den bound) = $gridBound >= 10^38 - no exact " +
          "integer grid this engine (or DuckDB's HUGEINT) can carry; " +
          "shard the model or rescale the counts")
  }

  /** Both orders' model state off ONE train explode (r16, extending the
    * r15 doc-side sharing): the two-order [[grams23]] stream yields the
    * bigram-count table as its (w1, w2) rollup and the trigram-count
    * table as its w3-not-null rollup — one corpus pass where kn3Model
    * alone used to pay two.
    */
  def kn3Model(train: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): Kn3Model = {
    val tg = CacheScope.persist(grams23(train, idCol, textCol))
    kn3ModelOf(
      CacheScope.persist(tg.filter(col("w3").isNotNull)
        .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c3"))),
      tg.groupBy("w1", "w2").agg(count(lit(1)).as("c12")))
  }

  /** [[kn3Model]] over a PRE-BUILT bigram-type table (a [[knModel]]'s
    * `big` — so [[screenCompare3]] pays ONE train bigram pass shared
    * between both orders; the unigram level of the trigram recursion is
    * the bigram-type fertilities by definition, keyed here by the
    * trigram's THIRD word).
    */
  def kn3ModelFrom(train: DataFrame, bigTypes: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): Kn3Model =
    kn3ModelOf(CacheScope.persist(
      trigrams(train, idCol, textCol)
        .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c3"))),
      bigTypes)

  /** The five rollups of a PRE-BUILT (w1, w2, w3, c3) trigram-count
    * table plus a bigram-type table — the explode-free core both
    * builders above share.
    */
  private def kn3ModelOf(tri: DataFrame, bigTypes: DataFrame): Kn3Model = {
    val mid2 = CacheScope.persist(
      tri.groupBy("w2", "w3").agg(count(lit(1)).as("n3w")))
    Kn3Model(
      tri = tri,
      pre = tri.groupBy("w1", "w2")
        .agg(sum(col("c3")).as("c2"), count(lit(1)).as("f3")),
      mid2 = mid2,
      mid1 = mid2.groupBy("w2")
        .agg(sum(col("n3w")).as("nvdd"), count(lit(1)).as("f2")),
      cont = bigTypes.groupBy(col("w2").as("w3")).agg(count(lit(1)).as("cont")),
      tt = bigTypes.agg(count(lit(1)).as("t")))
  }

  /** Persist a frozen TRIGRAM KN model as a SELF-VALIDATING serving
    * artifact — [[writeKnModel]]'s order-3 sibling (r17, completing the
    * serving split across the LM family): the six narrow tables as
    * parquet plus a [[graft.util.Fingerprint]] of the train corpus, so
    * [[readKn3Model]] refuses to score under a stale model.
    */
  def writeKn3Model(model: Kn3Model, train: DataFrame, path: String,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    writeKn3Tables(model, path)
    graft.util.Fingerprint.write(model.tri.sparkSession, s"$path/fingerprint",
      graft.util.Fingerprint.of(train, idCol, Seq(textCol)))
  }

  private def writeKn3Tables(model: Kn3Model, path: String): Unit = {
    model.tri.write.mode("overwrite").parquet(s"$path/tri")
    model.pre.write.mode("overwrite").parquet(s"$path/pre")
    model.mid2.write.mode("overwrite").parquet(s"$path/mid2")
    model.mid1.write.mode("overwrite").parquet(s"$path/mid1")
    model.cont.write.mode("overwrite").parquet(s"$path/cont")
    model.tt.write.mode("overwrite").parquet(s"$path/tt")
  }

  private def readKn3Tables(spark: SparkSession, path: String): Kn3Model =
    Kn3Model(
      tri = spark.read.parquet(s"$path/tri"),
      pre = spark.read.parquet(s"$path/pre"),
      mid2 = spark.read.parquet(s"$path/mid2"),
      mid1 = spark.read.parquet(s"$path/mid1"),
      cont = spark.read.parquet(s"$path/cont"),
      tt = spark.read.parquet(s"$path/tt"))

  /** Read a stored trigram KN model through the staleness guard
    * ([[readKnModel]]'s contract at order 3); the grid guard re-checks
    * the loaded tables on first scoring call as always.
    */
  def readKn3Model(spark: SparkSession, train: DataFrame, path: String,
      idCol: String = "doc_id", textCol: String = "text",
      memo: Boolean = false): Kn3Model = {
    graft.util.Fingerprint.requireMatch(spark, s"$path/fingerprint",
      train, idCol, Seq(textCol), what = "trigram KN model", memo = memo)
    readKn3Tables(spark, path)
  }

  /** [[writeKn3Model]] under the CATALOG-SNAPSHOT guard (see
    * [[writeKnModelSnapshot]]): file-listing fingerprint of the
    * path-backed train corpus, zero corpus scan at serve time.
    */
  def writeKn3ModelSnapshot(model: Kn3Model, trainPath: String,
      path: String): Unit = {
    val spark = model.tri.sparkSession
    writeKn3Tables(model, path)
    graft.util.Fingerprint.write(spark, s"$path/fingerprint_snapshot",
      graft.util.Fingerprint.ofSnapshot(spark, trainPath))
  }

  /** Read a snapshot-guarded trigram KN model (see
    * [[readKnModelSnapshot]]).
    */
  def readKn3ModelSnapshot(spark: SparkSession, trainPath: String,
      path: String): Kn3Model = {
    graft.util.Fingerprint.requireSnapshotMatch(spark,
      s"$path/fingerprint_snapshot", trainPath, what = "trigram KN model")
    readKn3Tables(spark, path)
  }

  /** Per-doc trigram-KN scoring under a frozen model, keeping the exact
    * decimal log-prob sum (the [[knPerDoc]] split): (id, n_trigrams,
    * n_unseen, n_unseen_prefix, n_unseen_mid, __slp, kn3_cross_entropy,
    * keep). Documents with fewer than three tokens score null entropy
    * and keep=false (the n<2 bigram rule, one order up).
    */
  private def kn3PerDoc(
      docs: DataFrame, model: Kn3Model, maxCrossEntropy: Double,
      idCol: String, textCol: String): DataFrame =
    kn3PerDocStream(trigrams(docs, idCol, textCol), docs, model,
      maxCrossEntropy, idCol, textCol)

  private def kn3PerDocStream(
      docTrigrams: DataFrame, docs: DataFrame, model: Kn3Model,
      maxCrossEntropy: Double,
      idCol: String, textCol: String): DataFrame = {
    // Grid auto-selection, exactly as in knPerDocStream (r15 verdict #1).
    val useDecimal = !model.fitsLongGrid
    if (useDecimal) model.decimalGridChecked
    val g: Column => Column =
      if (useDecimal) _.cast("decimal(38,0)") else identity
    val c3 = g(coalesce(col("c3"), lit(0L)))
    val n3w = g(coalesce(col("n3w"), lit(0L)))
    val contC = g(coalesce(col("cont"), lit(0L)))
    val seenPre = col("c2").isNotNull
    val seenMid = col("nvdd").isNotNull
    // The middle-level numerator piece, shared by the top two tiers.
    val contNum = greatest(g(lit(4L)) * n3w - g(lit(3L)), g(lit(0L))) * g(col("t")) +
      g(lit(3L)) * g(col("f2")) * contC
    val num = when(seenPre, greatest(
        g(lit(4L)) * greatest(g(lit(4L)) * c3 - g(lit(3L)), g(lit(0L))) *
          g(col("nvdd")) * g(col("t")) + g(lit(3L)) * g(col("f3")) * contNum,
        g(lit(1L))))
      .when(seenMid, greatest(contNum, g(lit(1L))))
      .otherwise(greatest(g(lit(4L)) * contC, g(lit(1L))))
    val den = when(seenPre, g(lit(16L)) * g(col("c2")) * g(col("nvdd")) * g(col("t")))
      .when(seenMid, g(lit(4L)) * g(col("nvdd")) * g(col("t")))
      .otherwise(g(lit(4L)) * g(col("t")))

    val scored = docTrigrams
      .join(model.tri, Seq("w1", "w2", "w3"), "left")
      .join(model.pre, Seq("w1", "w2"), "left")
      .join(model.mid2, Seq("w2", "w3"), "left")
      .join(model.mid1, Seq("w2"), "left")
      .join(model.cont, Seq("w3"), "left")
      .crossJoin(broadcast(model.tt))
      .select(
        col("id"),
        (lnDec(num) - lnDec(den)).as("__logp"),
        when(col("c3").isNull, 1L).otherwise(0L).as("__unseen"),
        when(col("c2").isNull, 1L).otherwise(0L).as("__unseen_prefix"),
        when(col("nvdd").isNull, 1L).otherwise(0L).as("__unseen_mid"))
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_trigrams"),
        sum(col("__unseen")).as("n_unseen"),
        sum(col("__unseen_prefix")).as("n_unseen_prefix"),
        sum(col("__unseen_mid")).as("n_unseen_mid"),
        sum(col("__logp")).as("__sum_logp"))
      .withColumn("kn3_cross_entropy",
        ceNorm(col("__sum_logp"), col("n_trigrams")))
    docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol))
      .join(scored, col(idCol) === scored("id"), "left")
      .select(
        col(idCol),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("n_unseen"), lit(0L)).as("n_unseen"),
        coalesce(col("n_unseen_prefix"), lit(0L)).as("n_unseen_prefix"),
        coalesce(col("n_unseen_mid"), lit(0L)).as("n_unseen_mid"),
        col("__sum_logp").as("__slp"),
        col("kn3_cross_entropy"),
        coalesce(col("kn3_cross_entropy") <= maxCrossEntropy, lit(false))
          .as("keep"))
  }

  /** Trigram-KN scoring against a pre-built frozen model. */
  def kn3Score(
      docs: DataFrame,
      model: Kn3Model,
      maxCrossEntropy: Double,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    kn3PerDoc(docs, model, maxCrossEntropy, idCol, textCol).drop("__slp")

  /** Train-and-score in one call — the t53 shape. */
  def kn3CrossEntropy(
      docs: DataFrame,
      train: DataFrame,
      maxCrossEntropy: Double,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    kn3Score(docs, kn3Model(train, idCol, textCol), maxCrossEntropy,
      idCol, textCol)

  /** Smoother shoot-out — the "which perplexity filter do I ship" table:
    * score the SAME corpus under both the add-one baseline and the KN
    * model (each trained on the same slice), pool per (model, cohort)
    * where `cohort` is a caller-supplied labeling column (natural vs
    * planted-gibberish in the t51 fixture), and report each screen's
    * rejection count and pooled per-bigram cross-entropy. The read-off is
    * the SEPARATION each smoother achieves between the cohorts and the
    * false-reject count on the clean cohort — measured engine-exactly,
    * not eyeballed from two per-doc listings. Each model keeps its own
    * shipped band (`addOneMaxCe`, `knMaxCe`): the comparison is between
    * the screens as deployed, not between raw scores on a shared
    * threshold (CE scales differ by construction — add-one's unseen
    * floor is ~ln V, KN's is ln 4T).
    *
    * Exactness: per-doc decimal log-prob sums (`__slp`) are summed
    * exactly across each cohort before the one IEEE division — the
    * knScreenReport contract, applied symmetrically to both models.
    *
    * Shape at scale: two scoring passes over the exploded document
    * bigrams (one per model) — each is the equi-join-only plan of its
    * parent operator; the output is 2·|cohorts| rows.
    */
  /** Pool a per-doc screen face into per-(model, cohort) rows —
    * `gramCol` names the scored-gram count column (n_bigrams for the
    * bigram-order faces, n_trigrams for kn3; emitted under the shared
    * n_bigrams schema either way).
    */
  private def poolScreen(
      perDoc: DataFrame, model: String, cohort: Column,
      gramCol: String): DataFrame =
    perDoc
      .withColumn("cohort", cohort)
      .groupBy("cohort")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col(gramCol) > 0, 1L).otherwise(0L)).as("n_scored"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_rejected"),
        sum(col(gramCol)).as("n_bigrams"),
        sum(col("n_unseen")).as("n_unseen"),
        sum(col("__slp")).as("__slp_total"))
      .select(
        lit(model).as("model"), col("cohort"),
        col("n_docs"), col("n_scored"), col("n_rejected"),
        col("n_bigrams"), col("n_unseen"),
        ceNorm(col("__slp_total"), col("n_bigrams"))
          .as("cross_entropy"))

  /** The bigram pair of shoot-out rows over ONE shared model + doc
    * stream — the internal engine of both public shoot-outs. FUSED
    * (r16, from the measured t51 profile: the explode sharing alone
    * moved t51 only 4.70 → 4.65 s because the wall is the scoring
    * passes themselves): addone and KN share the join set
    * {big, uni, cont, tt} plus the one-row V side, so ONE pass over
    * the exploded doc bigrams computes BOTH models' per-bigram logp
    * columns and one groupBy carries both exact decimal sums — half
    * the join/aggregate work of the two standalone scorers, with the
    * logp expressions verbatim from each (the decimal contract and
    * every hash are unchanged; the t51 DuckDB oracle, which scores
    * the two models independently, is the unfused twin).
    */
  private def screenCompareRows(
      docs: DataFrame, m: KnModel, docBigrams: DataFrame, cohort: Column,
      addOneMaxCe: Double, knMaxCe: Double,
      idCol: String, textCol: String): DataFrame = {
    val (num, den) = knNumDen(m)
    val v = m.uni.agg(count(lit(1)).as("v"))
    val scored = docBigrams
      .join(m.big, Seq("w1", "w2"), "left")
      .join(m.uni, Seq("w1"), "left")
      .join(m.cont, Seq("w2"), "left")
      .crossJoin(broadcast(m.tt))
      .crossJoin(broadcast(v))
      .select(
        col("id"),
        (lnDec(coalesce(col("c12"), lit(0L)) + 1) -
          lnDec(coalesce(col("c1"), lit(0L)) + col("v"))).as("__logp_add"),
        (lnDec(num) - lnDec(den)).as("__logp_kn"),
        when(col("c12").isNull, 1L).otherwise(0L).as("__unseen"))
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(col("__unseen")).as("n_unseen"),
        sum(col("__logp_add")).as("__slp_add"),
        sum(col("__logp_kn")).as("__slp_kn"))
      .withColumn("ce_add", ceNorm(col("__slp_add"), col("n_bigrams")))
      .withColumn("ce_kn", ceNorm(col("__slp_kn"), col("n_bigrams")))
    // Per-doc dual table is |docs|-row — persist it so the two pooled
    // views below don't re-run the gram-stream joins.
    val per = CacheScope.persist(docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol))
      .join(scored, col(idCol) === scored("id"), "left")
      .select(
        col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_unseen"), lit(0L)).as("n_unseen"),
        col("__slp_add"), col("__slp_kn"),
        col("ce_add"), col("ce_kn")))
    def view(slp: String, ce: String, maxCe: Double): DataFrame =
      per.select(
        col(idCol), col("n_bigrams"), col("n_unseen"),
        col(slp).as("__slp"),
        coalesce(col(ce) <= maxCe, lit(false)).as("keep"))
    poolScreen(view("__slp_add", "ce_add", addOneMaxCe),
        "addone", cohort, "n_bigrams")
      .unionByName(poolScreen(view("__slp_kn", "ce_kn", knMaxCe),
        "kn", cohort, "n_bigrams"))
  }

  def screenCompare(
      docs: DataFrame,
      train: DataFrame,
      cohort: Column,
      addOneMaxCe: Double,
      knMaxCe: Double,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val m = knModel(train, idCol, textCol)
    val db = CacheScope.persist(bigrams(docs, idCol, textCol))
    screenCompareRows(docs, m, db, cohort, addOneMaxCe, knMaxCe,
      idCol, textCol)
      .orderBy("model", "cohort")
  }

  /** [[screenCompare]] plus the TRIGRAM KN screen (t53's row in the t51
    * shoot-out — "does order 3 buy separation over bigram KN?"). Same
    * schema; in the kn3 rows `n_bigrams`/`n_unseen` count TRIGRAMS and
    * unseen trigrams (the scored-gram unit of that model — documented
    * rather than renamed, so the three screens stay one unionable
    * table). Each model keeps its own shipped band, as in
    * [[screenCompare]].
    */
  def screenCompare3(
      docs: DataFrame,
      train: DataFrame,
      cohort: Column,
      addOneMaxCe: Double,
      knMaxCe: Double,
      kn3MaxCe: Double,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // ONE train explode and ONE doc explode feed all three smoothers
    // (r15 verdict #3): each corpus passes through [[grams23]] once —
    // the bigram legs project (w1, w2), the trigram legs filter the
    // rows that carry a third token — and the three models are rollups
    // of those two persisted streams (addone and kn score off the same
    // KnModel; kn3's unigram level reuses its `big` type table).
    val tg = CacheScope.persist(grams23(train, idCol, textCol))
    val m = knModelOf(CacheScope.persist(
      tg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))))
    val kn3m = kn3ModelOf(
      CacheScope.persist(tg.filter(col("w3").isNotNull)
        .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c3"))),
      m.big)
    val g23 = CacheScope.persist(grams23(docs, idCol, textCol))
    val db = g23.select("id", "w1", "w2")
    val dt = g23.filter(col("w3").isNotNull).select("id", "w1", "w2", "w3")
    val kn3 = poolScreen(
      kn3PerDocStream(dt, docs, kn3m, kn3MaxCe, idCol, textCol),
      "kn3", cohort, "n_trigrams")
    screenCompareRows(docs, m, db, cohort, addOneMaxCe, knMaxCe,
      idCol, textCol)
      .unionByName(kn3)
      .orderBy("model", "cohort")
  }
}
