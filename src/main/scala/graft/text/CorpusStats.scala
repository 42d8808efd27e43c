package graft.text

import org.apache.spark.sql.{Column, DataFrame}
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
      textCol: String = "text"): DataFrame =
    zipfFitFromTokens(
      docs.select(explode(TextFunctions.tokens(col(textCol))).as("term")), topN)

  /** [[zipfFit]] over an already-exploded (term) stream — so a composed
    * report (t38) can tokenize the corpus ONCE and feed every diagnostic
    * from the same persisted stream (guide §2.4).
    */
  def zipfFitFromTokens(tokens: DataFrame, topN: Int = 200): DataFrame = {
    require(topN > 0, s"topN must be positive, got $topN")
    val tf = tokens.groupBy("term").agg(count(lit(1)).as("freq"))
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
      // Persisted: the topN-row ranked table feeds both the regression
      // sums and the join-back; without it the corpus tokenize + TopK
      // pass runs once per consumer (guide §2.4 — t33/t38 plan dup).
    val rankedP = graft.util.CacheScope.persist(ranked)
    val sums = rankedP.agg(
      count(lit(1)).cast("double").as("__n"),
      sum(col("__x")).cast("double").as("__sx"),
      sum(col("__y")).cast("double").as("__sy"),
      sum(col("__x") * col("__y")).cast("double").as("__sxy"),
      sum(col("__x") * col("__x")).cast("double").as("__sxx"))
    rankedP.crossJoin(broadcast(sums))
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

  /** Good–Turing unseen-mass estimate (Good 1953) — the crawl-planning
    * read-off the Heaps curve only eyeballs: the probability that the
    * NEXT n-gram drawn is one never seen in this corpus is estimated by
    * the singleton fraction N1/N, and the adjusted Good–Turing count
    * for once-seen types is c* = 2·N2/N1. One row per (gram, source)
    * plus each gram's pooled `__all` row. Multiple n-gram orders matter:
    * a small-vocabulary corpus saturates at the unigram level (N1 = 0,
    * unseen mass 0 — "more crawl buys no new words") while its
    * higher-order type space still has live tail — exactly the pair of
    * numbers an LM-data decision needs. The pooled row is its own
    * aggregation, NOT a rollup of the per-source counts — a type single
    * in two sources is a global doubleton, so the coarser level cannot
    * be derived from the finer one's singleton flags.
    *
    * Exactness: every statistic is an integer count; the three reported
    * ratios are single IEEE divisions (2·N2 is exact in double first).
    *
    * Shape at scale: one n-gram explode per requested order feeding two
    * map-side-combined count rollups ((source, term) and (term)), then
    * a |grams|·(|sources|+1)-row result — no window, no driver loop,
    * corpus-linear.
    */
  def goodTuring(
      docs: DataFrame,
      grams: Seq[Int] = Seq(1),
      textCol: String = "text",
      sourceCol: String = "source"): DataFrame = {
    require(grams.nonEmpty && grams.forall(_ >= 1), s"grams must be >= 1: $grams")
    val base = docs.filter(col(textCol).isNotNull)
      .select(col(sourceCol).as("source"),
        TextFunctions.tokens(col(textCol)).as("__toks"))
    grams.map { g =>
      val tok = graft.util.CacheScope.persist(
        base.filter(size(col("__toks")) >= g)
          .select(col("source"),
            explode(transform(
              sequence(lit(1), size(col("__toks")) - (g - 1)),
              i => concat_ws(" ", slice(col("__toks"), i, lit(g)))))
              .as("term")))
      def level(wc: DataFrame): DataFrame =
        wc.groupBy("source").agg(
          sum(col("c")).as("n_tokens"),
          count(lit(1)).as("vocab"),
          sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_singletons"),
          sum(when(col("c") === 2, 1L).otherwise(0L)).as("n_doubletons"))
      // ONE pass over the exploded grams (guide §2.4): the pooled level's
      // per-term count is exactly the per-source counts re-summed
      // (c_pooled = Σ_s c_st), so both levels roll up the same persisted
      // vocabulary-sized table instead of re-aggregating the gram stream.
      val srcCounts = graft.util.CacheScope.persist(
        tok.groupBy("source", "term").agg(count(lit(1)).as("c")))
      val perSrc = level(srcCounts)
      val pooled = level(
        srcCounts.groupBy("term").agg(sum(col("c")).as("c"))
          .withColumn("source", lit("__all")))
      perSrc.unionByName(pooled).withColumn("gram", lit(g.toLong))
    }.reduce(_ unionByName _)
      .select(
        col("gram"), col("source"), col("n_tokens"), col("vocab"),
        col("n_singletons"), col("n_doubletons"),
        (col("n_singletons").cast("double") / col("n_tokens")).as("unseen_mass"),
        (col("n_singletons").cast("double") / col("vocab")).as("singleton_frac"),
        when(col("n_singletons") > 0,
          (lit(2.0) * col("n_doubletons")) / col("n_singletons"))
          .as("gt_singleton_cstar"))
      .orderBy("gram", "source")
  }

  /** Per-source unigram KL divergence from the corpus-wide distribution —
    * the source-drift / contamination alarm of a multi-source mixture:
    * KL(P_s ‖ P) = Σ_t (c_st/N_s)·ln((c_st/N_s)/(c_t/N)). A source whose
    * vocabulary distribution wanders from the pool (a crawl gone bad, a
    * template flood) spikes its KL long before eyeballing catches it.
    *
    * Exactness: rewrite each term's contribution as
    * c_st·(ln c_st − ln N_s − ln c_t + ln N) — every ln is of an INTEGER
    * count, rounded once onto the DECIMAL(12,6) grid; the product against
    * the integer c_st and the per-source sum are exact decimal arithmetic
    * (scale 6 throughout, max precision 38 — no rounding anywhere), and
    * the single division by N_s happens once, in double, at the end.
    * KL ≥ 0 up to the 1e-6 grid (Gibbs); only terms the source actually
    * uses contribute (c_st > 0), so the sum is over the source's own
    * vocabulary — never a dense |sources|×|vocab| grid.
    *
    * Shape: three map-side-combined rollups off one explode + an equi-join
    * on term (the corpus count table) + a broadcast |sources|-row and
    * ONE-ROW total side — corpus-linear, no window, no driver loop.
    */
  def sourceDivergence(
      docs: DataFrame,
      sourceCol: String = "source",
      textCol: String = "text"): DataFrame =
    sourceDivergenceFromTokens(docs.select(col(sourceCol).as("source"),
      explode(TextFunctions.tokens(col(textCol))).as("term")))

  /** [[sourceDivergence]] over an already-exploded (source, term) stream
    * — the t38 shared-tokenize entry point (guide §2.4).
    */
  def sourceDivergenceFromTokens(tok: DataFrame): DataFrame = {
    def lnDec(x: Column): Column = log(x).cast("decimal(12,6)")
    // ONE corpus tokenize pass (guide §2.4): the per-(source, term) counts
    // are a lossless rollup base — c_t = Σ_s c_st, n_s = Σ_t c_st,
    // n = Σ c_st — so the corpus-wide/per-source/total counts aggregate
    // the persisted vocabulary-sized table instead of each re-exploding
    // the corpus (4 passes before).
    val cst = graft.util.CacheScope.persist(
      tok.groupBy("source", "term").agg(count(lit(1)).as("c_st")))
    val ct = cst.groupBy("term").agg(sum(col("c_st")).as("c_t"))
    val ns = cst.groupBy("source").agg(sum(col("c_st")).as("n_s"))
    val nn = cst.agg(sum(col("c_st")).as("n"))
    cst
      .join(ct, Seq("term"))
      .join(broadcast(ns), Seq("source"))
      .crossJoin(broadcast(nn))
      .select(col("source"), col("n_s"),
        (col("c_st").cast("decimal(12,0)") *
          (lnDec(col("c_st")) - lnDec(col("n_s")) -
            lnDec(col("c_t")) + lnDec(col("n")))).as("__w"))
      .groupBy("source", "n_s")
      .agg(sum(col("__w")).as("__sw"))
      .select(
        col("source"),
        col("n_s").as("n_tokens"),
        (col("__sw").cast("double") / col("n_s")).as("kl"))
      .orderBy("source")
  }

  /** Frozen reference profile for [[klDrift]]: (bucket, cnt) unigram
    * counts over md5 hash buckets. Train once on the reference corpus,
    * store the B-row table with the index — scoring any future corpus
    * (or micro-batch) against it is one pass + one broadcast join.
    */
  def bucketProfile(
      docs: DataFrame,
      buckets: Int,
      salt: String,
      textCol: String = "text"): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    docs.filter(col(textCol).isNotNull)
      .select(explode(TextFunctions.tokens(col(textCol))).as("term"))
      .select(graft.curation.Curation
        .hashBucket(col("term"), buckets, salt).cast("long").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Bucketed-profile KL drift — the streaming-safe form of
    * [[sourceDivergence]]: KL(P_docs ‖ P_ref) over the FIXED B-bucket
    * support with add-one smoothing (finite even for tiny or disjoint
    * batches), where the reference side is a frozen [[bucketProfile]].
    * ONE row out: (n_tokens, kl).
    *
    * Exactness (the t36 contract): p_b/q_b =
    * (c_b+1)(N_ref+B) / ((c_ref_b+1)(N+B)) decomposes into four INTEGER
    * lns on the DECIMAL(12,6) grid; each bucket contributes
    * (c_b+1)·(ln(c_b+1) + ln(N_ref+B) − ln(c_ref_b+1) − ln(N+B)), the
    * B-row sum is exact decimal, and the single /(N+B) happens once in
    * double — repartition-deterministic. The spine/profile joins are
    * B-row (tiny); the only corpus-sized work is the token explode.
    */
  def klDrift(
      docs: DataFrame,
      refProfile: DataFrame,
      buckets: Int,
      salt: String,
      textCol: String = "text"): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    def lnDec(x: Column): Column = log(x).cast("decimal(12,6)")
    val spark = docs.sparkSession
    // Persisted: each B-row profile feeds its total aggregate AND the
    // spine join — without this the corpus tokenize behind each side ran
    // twice (guide §2.4 — t39 scanned documents 4x). persist() is
    // idempotent on an already-persisted refProfile.
    val cur = graft.util.CacheScope.persist(
      bucketProfile(docs, buckets, salt, textCol))
    val ref = graft.util.CacheScope.persist(refProfile)
    val nRow = cur.agg(coalesce(sum(col("cnt")), lit(0L)).as("n"))
    val nrRow = ref.agg(coalesce(sum(col("cnt")), lit(0L)).as("nr"))
    val spine = spark.range(buckets).select(col("id").as("bucket"))
    spine
      .join(cur, Seq("bucket"), "left_outer")
      .join(ref.select(col("bucket").cast("long").as("bucket"),
        col("cnt").as("__cr")), Seq("bucket"), "left_outer")
      .crossJoin(broadcast(nRow))
      .crossJoin(broadcast(nrRow))
      .select(col("n"),
        ((coalesce(col("cnt"), lit(0L)) + 1).cast("decimal(12,0)") *
          (lnDec(coalesce(col("cnt"), lit(0L)) + 1) +
            lnDec(col("nr") + buckets) -
            lnDec(coalesce(col("__cr"), lit(0L)) + 1) -
            lnDec(col("n") + buckets))).as("__w"))
      .groupBy("n")
      .agg(sum(col("__w")).as("__sw"))
      .select(
        col("n").as("n_tokens"),
        (col("__sw").cast("double") / (col("n") + buckets)).as("kl"))
  }
}
