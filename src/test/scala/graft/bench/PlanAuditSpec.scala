package graft.bench

import graft.{SparkEntry, SparkTestBase}

/** The PlanAudit lint as a GATE: any future query that plans a cartesian
  * product — or a broadcast nested-loop join that is not on the accounted
  * whitelist — fails `sbt test` instead of waiting for a bench regression.
  * Plans are BUILT, not executed (the handful of setup-writing queries do
  * run their tiny sf0.001 side effects).
  */
class PlanAuditSpec extends SparkTestBase {

  /** Intended BNLJs, each with a bounded broadcast side:
    *  - q7 / etl_type_histogram: a ONE-ROW grand-total crossJoin;
    *  - e1: the broadcast ANN query set (brute-force baseline by design);
    *  - e5 (+golden) / e8 (+golden): the broadcast centroid table (C rows)
    *    for IVF assignment, probe ranking, and Lloyd re-assignment;
    *  - c4/c4b/c4c: the ONE-ROW injected probe in the fixture scenario.
    */
  private val accountedBnlj = Set(
    "q7_histogram_pct",
    "etl_type_histogram_golden",
    "e1_ann_bruteforce",
    "e5_ann_ivf",
    "e5_ivf_golden",
    "e8_ann_ivf_trained",
    "e8_kmeans_golden",
    // Lloyd re-assignment inside codebook training (same broadcast
    // C-row side); the PQ encode/ADC joins themselves are equi-joins.
    "e9_ann_pq",
    // IVF-PQ: the query-side probe ranking crossJoins the broadcast
    // C-row centroid table (same shape as e5/e8); encoding and ADC
    // scoring are equi-joins on (centroid_id) / (query_id,subspace,code).
    "e10_ann_ivfpq",
    "e10_ivfpq_golden",
    // the serve-path faces carry ONLY e10's query-side probe ranking
    // (query × broadcast C-row centroid table) — the index/ADC joins
    // are equi-joins over the STORED code table; no corpus pass at all
    "e10c_ann_ivfpq_served",
    "e10s_ivfpq_served_golden",
    // refine stage reuses e10's broadcast-centroid probe ranking; the
    // exact re-rank itself is an equi-join on the bounded shortlist
    "e10b_ivfpq_refined",
    // SemDeDup's assignment pass is the same broadcast-centroid argmax.
    "e11_semdedup",
    "e11_semdedup_golden",
    // the catch-contract face runs the same semDedup assignment pass
    // over base ∪ injected copies (broadcast-centroid argmax, C rows)
    "e11b_semdedup_dup_catch",
    // recall eval runs the e1 brute-force baseline + e5/e8-shape probes
    "e13_ann_recall",
    // the recall-contract face runs the same baseline + probe legs
    // (broadcast 10-query set × corpus, broadcast C-row centroids)
    "e13b_ann_recall_contract",
    "c4_decontaminate",
    "c4b_decontaminate_shuffle",
    "c4c_contaminated_spans",
    "c4d_decontaminate_bloom",
    // one-row corpus-count side of the tf*N/df scoring join
    "t10_tfidf_top_terms",
    // one-row (n_docs, l_tokens) corpus-stats side of the BM25 scoring join
    "t26_bm25_search",
    "t26b_bm25_phrase_rescored",
    // same one-row BM25 corpus-stats side behind the did-you-mean front-end
    "t42_bm25_didyoumean",
    // both PRF passes carry the same one-row corpus-stats side
    "t37_bm25_prf",
    "t26c_bm25f_fielded",
    "t26d_bm25f_dl_unweighted",
    // |classes|-row (denom, prior) constant side of the NB dense term
    "t24_naive_bayes",
    // one-row vocabulary-total side of the piece-cost normalization
    // (Unigram.withCosts — the t10/t26 one-row shape)
    "t43_unigram_learn",
    // Profile's two one-row aggregate legs crossJoin (r17: the distinct
    // counts ride the Expand alone on the HashAggregate path; the
    // string-min/max leg stays a keyless single-pass aggregate)
    "q41_profile_table",
    // one-row tokenizer-stat sides (n_docs/total_pieces/distinct/total
    // words) of the t45 compression report
    "t45_tokenizer_compare",
    // one-row n_docs side of the coverage report (the ST11 batch face)
    "t46_unigram_coverage",
    // same one-row BM25 corpus-stats side behind the known-item eval
    "t47_bm25_knownitem_eval",
    // the eval harness's DESIGNED bounded quadratic: the exact all-pairs
    // cosine ground truth, plus the one-row n_truth/n_cand/n_hit stat
    // sides. The bound is ENFORCED IN CODE, not prose: both truth inputs
    // pass DedupEval.boundEvalInput (require(n <= maxEvalRows) or the
    // opt-in deterministic md5 per-million sample, itself bounded at
    // n <= maxEvalRows*1e6 since r15) before any quadratic stage —
    // DedupEvalSpec pins both guards firing.
    "d17_dedup_screen_eval",
    // the SAMPLE path of the same harness (maxEvalRows=40 fires, md5
    // per-million thinning) — identical designed shapes on ~5% of rows
    "d17b_dedup_screen_eval_sampled",
    // same one-row n_truth/n_cand/n_hit stat sides per sweep point (the
    // candidate legs themselves are banded equi-joins; the truth input
    // passes the same enforced boundEvalInput as d17)
    "d18_minhash_sweep",
    // d18's analog on the hamming-budget axis: identical one-row stat
    // sides per budget point; candidate legs are pigeonhole-block
    // equi-joins over the once-computed key table, truth input passes
    // the same enforced boundEvalInput
    "d19_simhash_sweep",
    // the k axis of the same grid: identical one-row stat sides; the
    // k=8 legs band the seed<8 slice of the one shared signature table
    "d18b_minhash_kgrid",
    // the cap axis of the sign-band family: the same designed bounded
    // all-pairs cosine truth as d17 (enforced boundEvalInput) plus the
    // one-row stat sides; candidate legs are band equi-joins
    "d20_signband_cap_sweep",
    "t24b_nb_confusion",
    // t24 served from the stored model — identical plan shape, the
    // per-class constants row read from parquet
    "t24c_nb_classify_stored",
    // one-row vocabulary-size side of the smoothed-probability join
    "t20_lm_perplexity_filter",
    // the t26 one-row BM25 corpus-stats side behind the retrieval leg;
    // the grading joins are equi-joins on (query_id) / (doc_id, term)
    // over the broadcast-bounded retrieved set
    "t48_bm25_rbp_eval",
    // the same one-row corpus-stats side at k = 62 on the decimal
    // accumulation grid — retrieval and grading joins unchanged
    "t48d_bm25_rbp_decimal_grid",
    // one-row bigram-type-total (T) side of the KN num/den computation —
    // the count-table joins themselves are equi-joins on w1/w2
    "t49_kn_perplexity",
    "t49b_kn_screen_report",
    // t49 served from the stored model tables — identical plan shape,
    // the one-row T side now read from parquet
    "t49c_kn_score_stored",
    // the same one-row T side on the DECIMAL(38,0) over-grid literal
    // model — the count-table joins stay equi-joins on w1/w2
    "t49d_kn_decimal_grid",
    // the same one-row T side at order 3: the five model-table joins
    // are equi-joins on (w1,w2,w3)/(w1,w2)/(w2,w3)/(w2)/(w3)
    "t53_kn3_perplexity",
    // t53 served from the stored six-table model — identical plan
    // shape, same one-row T side (r17)
    "t53c_kn3_score_stored",
    // order-3 twin of t49d: the one-row T side over the DECIMAL(38,0)
    // over-grid literal model
    "t53d_kn3_decimal_grid",
    // the shoot-out runs ALL THREE scoring passes: t20's one-row V
    // side and the t49/t53 one-row T sides, over equi-join count tables
    "t51_lm_screen_compare",
    // the agreement matrix composes the t49 scoring pass (one-row T
    // side); the entropy/ratio legs and the flag joins are equi-joins
    "t52_screen_agreement",
    // one-row weight-total side of the temperature-share computation
    "c18_temperature_mixture",
    // e1-shape broadcast query sets: MMR's retrieval stage and the
    // cross-label hard-negative pair loop (label INEQUALITY cannot be an
    // equi-join key — the filter runs before the bounded-heap TopK)
    "e15_mmr_rerank",
    "e16_hard_negatives",
    // the triplet export composes e16's cross-label broadcast pair loop
    "e20_contrastive_triplets",
    // ONE-ROW packed eval set (the whole point: a map-side screen with
    // no shuffle and no per-pair join rows)
    "c22_semantic_decontaminate",
    // two ONE-ROW total-token-count sides (Nt, Nq) of the lambda table —
    // the lambda join itself is an equi-join on the bucket id
    "c23_dsir_importance",
    // hybrid fusion's legs: the t26 one-row BM25 corpus-stats side and
    // the e1-shape broadcast dense query set; the fusion joins are
    // equi-joins on (query_id, doc_id) over bounded top-k sides
    "t31_hybrid_rrf",
    // t20's one-row vocabulary-size side (the scoring pass is shared)
    "t32_perplexity_buckets",
    // the report capstone: t20's one-row V side + the ONE-ROW corpus
    // (zipf_slope, vocab) side joined onto every per-source row
    "t38_corpus_report",
    // the two ONE-ROW token totals (N, N_ref) of the smoothed KL rewrite
    "t39_drift_kl",
    // per round, the ONE-ROW remaining-budget and unsat-weight-sum sides
    "c26_mixture_waterfill",
    // per relation, the ONE-ROW (n_child) x ONE-ROW (n_orphans) pairing
    "q57_fk_orphans",
    // the e1-shape broadcast probe set over the per-user series table
    "q58_ts_user_similarity",
    // the ONE-ROW revenue-total side the class boundaries compare against
    "q59_abc_pareto",
    // the ONE-ROW customer-count side the closed-form rank functions
    // (ntile/percent_rank/cume_dist) compare against
    "q37_rank_functions",
    // the ONE-ROW regression-sums side repeated onto the 200 fit rows
    "t33_zipf_fit",
    // the ONE-ROW (max doc id + 1) denominator of the decile math
    "t34_heaps_curve",
    // the ONE-ROW corpus token total of the KL rewrite (the |sources|-row
    // N_s side is an equi-join on source)
    "t36_source_divergence",
    // the broadcast packed-query set of the Hamming scan (8 B/row on the
    // corpus side; the e1 shape over 32x smaller data)
    "e18_ann_hamming",
    "e18b_hamming_refined",
    // the e1-shape broadcast prefix-query set of the Matryoshka coarse
    // stage (the rerank itself is equi-joins on the bounded shortlist)
    "e19_ann_matryoshka",
    // SQ8: the ONE-ROW packed (mins, ranges) stats side of encode/decode
    // plus the e1-shape broadcast query set for the asymmetric scoring
    "e17_ann_sq8",
    // t20's one-row V side + the ONE-ROW corpus token total the phase
    // thresholds compare against (the cumsum joins are equi-joins on the
    // range-bucket id)
    "c24_curriculum_phases")

  /** Partition-less windows a query may plan WITHOUT being an offense:
    * ONLY the two-phase pattern's offsets rollup, recognized by its
    * convention — the window orders by exactly the range-bucket column
    * `__b` (TwoPhase.offsets), whose input is one row per bucket, never
    * the data. Everything else needs an entry here, each justified as
    * running over a BOUNDED table. Name-based whitelisting alone would
    * let a whitelisted query silently regress to the q59-at-r11 shape (a
    * global window over the data-sized table) — the `__b` rule keeps the
    * gate meaningful for the two-phase users too, since their data-sized
    * windows are all bucket-partitioned.
    */
  private val accountedGlobalWindow: Set[String] = Set(
    // the 10-row decile spine of the Heaps-law growth curve
    "t34_heaps_curve",
    // the candidate-piece ranking window runs over the VOCABULARY-sized
    // substring table (pruned to seedVocab from round one), never the
    // corpus — Unigram.pruneTop's documented bound
    "t43_unigram_learn")

  test("no registered query plans a cartesian or an unaccounted nested-loop join") {
    val sfDir = "/root/testdata/sf0.001"
    // Failure-isolated: one query's analysis error is reported as ITS
    // offense (with the root message) instead of aborting the whole audit —
    // the other 175 plans still get screened.
    val offenders = SparkEntry.allQueries.flatMap { q =>
      scala.util.Try(q.run(spark, sfDir).queryExecution.executedPlan.toString) match {
        case scala.util.Failure(e) =>
          // String.valueOf: getMessage is null for e.g. bare NPEs, and a
          // null here would crash the Failure branch itself.
          Some(s"${q.name}: plan build FAILED — " +
            String.valueOf(e.getMessage).linesIterator.nextOption().getOrElse("<no message>"))
        case scala.util.Success(plan) =>
          if (plan.contains("CartesianProduct"))
            Some(s"${q.name}: CartesianProduct")
          else if (plan.contains("BroadcastNestedLoopJoin") && !accountedBnlj(q.name))
            Some(s"${q.name}: BroadcastNestedLoopJoin not on the accounted whitelist")
          else None
      }
    }
    assert(offenders.isEmpty,
      s"scale-killer plan shapes found:\n${offenders.mkString("\n")}")
  }

  test("no registered query plans an unaccounted partition-less window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow, WindowGroupLimit}
    // The OPTIMIZED LOGICAL plan, not executedPlan: AQE wraps the physical
    // tree in AdaptiveSparkPlanExec (no children — collect() sees nothing),
    // and the logical Window node carries the partitionSpec either way.
    val sfDir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.allQueries.flatMap { q =>
      scala.util.Try(q.run(spark, sfDir).queryExecution.optimizedPlan) match {
        case scala.util.Failure(e) =>
          Some(s"${q.name}: plan build FAILED — " +
            String.valueOf(e.getMessage).linesIterator.nextOption().getOrElse("<no message>"))
        case scala.util.Success(plan) =>
          def isOffsetsWindow(order: Seq[org.apache.spark.sql.catalyst.expressions.SortOrder]) =
            order.nonEmpty && order.forall(_.child.references.map(_.name).toSet == Set("__b"))
          // The __b convention is only trustworthy when the window really
          // runs over the bucket ROLLUP (bucket-count rows), not merely a
          // column renamed __b: walk the child chain through
          // cardinality-preserving unary nodes and require an Aggregate —
          // the TwoPhase.offsets shape — at the bottom.
          import org.apache.spark.sql.catalyst.plans.logical.{
            Aggregate, Filter, LogicalPlan, Project, Sort, SubqueryAlias}
          @annotation.tailrec
          def rollupBelow(p: LogicalPlan): Boolean = p match {
            case _: Aggregate => true
            case pr: Project => rollupBelow(pr.child)
            case f: Filter => rollupBelow(f.child)
            case s: Sort => rollupBelow(s.child)
            case sa: SubqueryAlias => rollupBelow(sa.child)
            case w: LWindow => rollupBelow(w.child)
            case _ => false
          }
          val global = plan.collectWithSubqueries {
            case w: LWindow if w.partitionSpec.isEmpty &&
              !(isOffsetsWindow(w.orderSpec) && rollupBelow(w.child)) => w
            case w: WindowGroupLimit if w.partitionSpec.isEmpty &&
              !(isOffsetsWindow(w.orderSpec) && rollupBelow(w.child)) => w
          }
          if (global.nonEmpty && !accountedGlobalWindow(q.name))
            Some(s"${q.name}: partition-less Window (single-task funnel) " +
              "not ordered by the __b bucket convention nor whitelisted")
          else None
      }
    }
    assert(offenders.isEmpty,
      s"global-window plan shapes found:\n${offenders.mkString("\n")}")
  }

  test("whitelist carries no dead entries") {
    val names = SparkEntry.allQueries.map(_.name).toSet
    val dead = (accountedBnlj ++ accountedGlobalWindow).diff(names)
    assert(dead.isEmpty, s"whitelisted queries no longer registered: $dead")
  }
}
