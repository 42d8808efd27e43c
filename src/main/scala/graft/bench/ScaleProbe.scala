package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.expressions.Window

import graft.GraftSession
import graft.curation.Curation
import graft.dedup.{ClusterCollapse, Dedup, SpanDedup}
import graft.operators.AsOfJoin
import graft.similarity.Similarity
import graft.tables.Tables
import graft.graph.Triangles
import graft.text.{Bm25, Chunker, HeavyHitters, InvertedIndex, TextFunctions}

/** Scale probe: run the shuffle-heavy operators at Nx the sf corpus (id-
  * offset unions — dup-heavy on purpose, the worst case for banded/blocked
  * joins) and print per-op seconds at 1x and Nx. A healthy operator scales
  * ~linearly in input; superlinear growth here is the local canary for the
  * 100 TB cliff. Usage: runMain graft.bench.ScaleProbe [sfDir] [N]
  */
object ScaleProbe {

  private def replicate(docs: DataFrame, copies: Int, idCol: String): DataFrame =
    (0 until copies)
      .map(i => docs.withColumn(idCol, col(idCol) + lit(i * 10000000L)))
      .reduce(_ unionByName _)

  /** Optional probe-name prefix filters (3rd arg onward): only matching
    * probes run — the full sweep is ~10 min and iterating on one operator
    * shouldn't pay for all of them.
    */
  private var only: Seq[String] = Nil

  private def time(label: String)(f: => Long): Unit = {
    if (only.nonEmpty && !only.exists(label.startsWith)) return
    val t0 = System.nanoTime()
    val n = f
    println(f"[scaleprobe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    // Each probe op is its own scope — the 10x replicas would otherwise
    // stack cached intermediates across the whole run.
    graft.util.CacheScope.releaseAll()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).map(_.toInt).getOrElse(10)
    only = args.drop(2).toSeq
    val spark: SparkSession = GraftSession.fromEnv("graft-scaleprobe")

    val docs1 = Tables.documents(spark, sfDir).select("doc_id", "text")
    val docsN = replicate(docs1, n, "doc_id")
    val emb1 = Tables.embeddings(spark, sfDir)
    val embN = replicate(emb1, n, "vec_id")
    val planes = Similarity.randomPlanes(12, emb1.select("embedding").head.getSeq[Float](0).size)

    for ((label, d) <- Seq("1x" -> docs1, s"${n}x" -> docsN)) {
      // The split profiler (r17): distinct counts ride the Expand alone
      // on the HashAggregate path; the string-min/max leg is a keyless
      // single-pass aggregate. Healthy = ~linear in the input — the
      // fused shape this replaced went through SortAggregate on the
      // multiplied Expand stream (two wide sorts).
      time(s"profile_table $label")(
        graft.quality.Profile.profile(d, Seq(
          graft.quality.Profile.ColSpec("doc_id", graft.quality.Profile.Num),
          graft.quality.Profile.ColSpec("text", graft.quality.Profile.Str)))
          .count())
      time(s"exact_dedup $label")(Dedup.exact(d).count())
      time(s"minhash_lsh $label")(Dedup.minhashLshPairs(d).count())
      time(s"simhash $label")(Dedup.simhashPairs(d, maxHamming = 3).count())
      time(s"jaccard_capped $label")(
        Dedup.jaccardShinglePairs(d, threshold = 0.5, maxDocFreq = Some(100)).count())
      // Span dedup on the replicated corpus is the boilerplate-heavy worst
      // case by construction: every span's corpus frequency multiplies by
      // the copy count. Healthy = ~linear (the frequency rollup is a
      // map-side-combined groupBy on 128-bit hashes; hot spans are an AQE-
      // splittable join, not a window).
      time(s"span_stats $label")(SpanDedup.spanStats(d).count())
      time(s"span_scrub $label")(SpanDedup.scrub(d).count())
      // Sliding windows cost ~k x the fixed chunks' rows, and the replica
      // corpus multiplies every window's frequency — the boilerplate-heavy
      // worst case. Healthy = ~linear; the islands merge parallelizes per
      // doc so hot windows never funnel one task.
      time(s"sliding_spans $label")(SpanDedup.slidingSpanStats(d).count())
      time(s"sliding_scrub $label")(SpanDedup.slidingScrub(d).count())
      // The documented pipeline order for duplicate-heavy corpora: exact
      // dedup FIRST, then shingle Jaccard over the survivors. On the 10x
      // replica corpus this collapses the inverted index back to 1x size —
      // copies share every shingle, so skipping this step multiplies every
      // df (and each bucket's quadratic join) by the copy count.
      time(s"jaccard_dedup_first $label") {
        val surv = Dedup.exact(d).select("doc_id")
        Dedup.jaccardShinglePairs(
          d.join(surv, "doc_id"), threshold = 0.5, maxDocFreq = Some(100)).count()
      }
      // Incremental near-dup: a FIXED 1x batch screened against a growing
      // history — the steady-state daily-crawl regime (history >> batch).
      // The replica history multiplies every shingle's df by the copy
      // count, so the df cap is what keeps the probe-index join bounded;
      // healthy = ~linear in history (index build) with the join flat.
      time(s"incr_neardup $label")(
        Dedup.incrementalNearDup(docs1.limit(500), d,
          threshold = 0.5, maxDocFreq = Some(100)).count())
      // LM scoring: train on 1x, score the growing corpus — the count
      // tables are fixed; healthy = ~linear (scoring is equi-joins + one
      // map-side-combined rollup; nothing about the model rescales).
      time(s"lm_crossentropy $label")(
        graft.text.NgramLm.crossEntropy(d, docs1, maxCrossEntropy = 3.4).count())
      // KN scoring, same regime (fixed 1x model, growing corpus): the
      // extra cont/fert tables are model-sized, the scoring adds one
      // equi-join over add-one's plan — healthy = ~linear and ~the
      // lm_crossentropy wall, not a multiple of it.
      time(s"kn_crossentropy $label")(
        graft.text.NgramLm.knCrossEntropy(d, docs1, maxCrossEntropy = 4.0).count())
      // Trigram KN, same regime: the model grows to five tables (still
      // rollups of one trigram-type agg) and scoring adds three
      // equi-joins over the bigram plan — healthy = ~linear and a small
      // constant over kn_crossentropy, not a multiple (the gram count
      // per doc is the same to within one).
      time(s"kn3_crossentropy $label")(
        graft.text.NgramLm.kn3CrossEntropy(d, docs1, maxCrossEntropy = 5.2).count())
      // DSIR selection: FIXED 1x target distribution, growing raw corpus —
      // the steady-state "select from the next crawl" regime. The model is
      // two B-row count tables; healthy = ~linear (explode + map-side-
      // combined groupBys; only (bucket, count) rows shuffle).
      time(s"dsir_importance $label")(
        Curation.dsirImportance(d, docs1.limit(500), buckets = 4096,
          salt = "sp").count())
      // Good-Turing tail stats: one explode + two map-side-combined count
      // rollups per gram order over the growing corpus; output is
      // |grams|x(|sources|+1) rows. Healthy = ~linear. (Replicated docs
      // share one synthetic source - the per-source level degenerates to
      // the pooled one, which only makes the rollup cheaper.)
      time(s"good_turing $label")(
        graft.text.CorpusStats.goodTuring(
          d.withColumn("source", lit("probe")), grams = Seq(1, 3)).count())
    }
    for ((label, e) <- Seq("1x" -> emb1, s"${n}x" -> embN)) {
      val queries = e.limit(20)
      time(s"ann_lsh $label")(Similarity.lshTopK(queries, e, planes, k = 5).count())
      time(s"ann_lsh_multiprobe $label")(
        Similarity.lshTopKMultiProbe(queries, e, planes, k = 5).count())
      time(s"ann_ivf $label")(
        Similarity.ivfTopK(queries, e, nCentroids = 32, nProbe = 4, k = 5).count())
      // Lloyd training cost is iters broadcast passes over the corpus;
      // healthy = ~linear in input per iteration (the update shuffles only
      // (cell, d partial sums) rows, never vectors).
      time(s"kmeans_train3 $label")(
        Similarity.kmeansCentroids(e, nCentroids = 32, iters = 3).count())
      // PQ = m codebook trainings + encode (m narrow rows/vector against
      // a broadcast codebook) + ADC — healthy is ~linear: the corpus only
      // ever appears as subvector projections and (id, code) pairs.
      time(s"pq_topk $label")(
        Similarity.pqTopK(queries, e, m = 4, ksub = 16, k = 5, trainIters = 2).count())
      // IVF-PQ vs flat PQ: same code budget, but ADC only runs inside the
      // nProbe probed cells — at scale the probe is a partition-pruned
      // scan, so healthy is ~linear AND at-or-under flat PQ's time (flat
      // scores every vector; IVF-PQ scores ~nProbe/nCells of them).
      time(s"ivfpq_topk $label")(
        Similarity.ivfPqTopK(queries, e, nCells = 32, nProbe = 4,
          m = 4, ksub = 16, k = 5, trainIters = 2).count())
      time(s"embedding_neardup $label")(Similarity.nearDupPairs(e, planes, 0.95).count())
      // MMR re-rank: retrieval (the corpus-linear part) + a |queries|-row
      // fold — healthy = tracking bruteForceTopK's growth with the fold
      // invisible (it never touches the corpus).
      time(s"mmr_rerank $label")(
        Similarity.mmrRerank(queries, e, kShortlist = 8, kSelect = 4,
          lambdaRel = 0.75).count())
      // Packed-broadcast decontamination screen: FIXED eval set as one
      // broadcast row, growing train corpus — one map-side pass, zero
      // shuffle; healthy = ~linear with no exchange in the plan.
      time(s"semantic_decon $label")(
        Similarity.semanticDecontaminate(e, emb1.filter(col("vec_id") % 10 === 0),
          tau = 0.95).count())
    }
    // SemDeDup's scale knob made visible: at FIXED k the per-cluster
    // population grows with N and the within-cluster join is quadratic in
    // it (Σ|cluster|² ≈ N²/k) — the paper grows k with the corpus
    // precisely to hold |cluster| flat. The counter-cost is assignment
    // (N·k cosines against the broadcast centroids), so the two faces
    // balance around k ~ sqrt(N·cost-ratio): at this toy N the N·k face
    // still dominates and scaled-k pays MORE than fixed-k — the probe's
    // real check is that neither regime bends superlinear, and that the
    // pair face (the one that owns the 100 TB cliff, growing N²/k) is the
    // one scaled-k visibly caps.
    for ((label, e, k) <- Seq(("1x", emb1, 16), (s"${n}x fixed-k", embN, 16),
      (s"${n}x scaled-k", embN, 16 * n))) {
      time(s"semdedup $label")(
        Similarity.semDedup(e, nClusters = k, trainIters = 1, tau = 0.9)
          .filter(!col("is_survivor")).count())
    }
    // Cluster-collapse worst case: one chain-shaped component (the
    // adversarial diameter for label propagation — naive min-propagation
    // needs length-1 rounds). Healthy = time ~linear in edges and ROUNDS
    // growing only logarithmically from 1x to Nx (log2(10x) adds ~3-4).
    for ((label, len) <- Seq("1x" -> 100000L, s"${n}x" -> 100000L * n)) {
      val chain = spark.range(1, len)
        .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
      time(s"cc_chain $label") {
        val (labels, rounds) = ClusterCollapse.connectedComponentsWithRounds(chain)
        val cnt = labels.count()
        println(f"[scaleprobe]   cc_chain $label rounds=$rounds (len=$len)")
        cnt
      }
    }
    // Cluster collapse over a real pair generator's output at 1x vs Nx
    // (dup-heavy replica corpus -> dense components).
    for ((label, d) <- Seq("1x" -> docs1, s"${n}x" -> docsN)) {
      time(s"cc_minhash_collapse $label") {
        val pairs = Dedup.minhashLshPairs(d)
        ClusterCollapse.collapse(d, pairs).filter(!col("is_survivor")).count()
      }
    }
    // (No REPLICATION probe for the r17 snapshot-vs-row fingerprint
    // guards: the scaling argument is structural — ofSnapshot never
    // scans corpus rows BY CONSTRUCTION (no DataFrame is even passed;
    // it lists files driver-side), while the row fingerprint's one
    // column-pruned pass is the cost the snapshot store variants exist
    // to remove per serve job. The gap IS pinned numerically at sf0.1
    // by graft.bench.GuardProbe (r17 verdict #5) — per-serve guarded
    // reads of the same vocab artifact under each guard flavor.)

    // As-of hot key: ONE key owns the entire history — the straggler case
    // timeBucket exists for. Unbucketed, the key's full event stream sorts
    // in a single task regardless of cluster size; bucketed splits it into
    // ~40 per-(key, bucket) tasks plus a 40-row carry table. Healthy =
    // bucketed times growing ~linearly and beating unbucketed at 10x.
    // (agg on the carried value, not count(*): pruning must not delete the
    // window being measured.)
    for ((label, rows) <- Seq("1x" -> 200000L, s"${n}x" -> 200000L * n)) {
      val span = rows * 3
      val left = spark.range(rows).select(
        lit("hot").as("k"), (col("id") * 7 % span).as("t"), col("id").as("lv"))
      val right = spark.range(rows)
        .select(lit("hot").as("k"), (col("id") * 13 % span).as("t"))
        .dropDuplicates("k", "t") // as-of contract: unique per (key, ts)
        .withColumn("rv", col("t") * 2)
      time(s"asof_hotkey_1task $label")(
        AsOfJoin.backward(left, right, Seq("k"), "t", "t", Seq("rv"))
          .agg(count(col("rv"))).head.getLong(0))
      time(s"asof_hotkey_bucketed $label")(
        AsOfJoin.backward(left, right, Seq("k"), "t", "t", Seq("rv"),
          timeBucket = Some(span / 40))
          .agg(count(col("rv"))).head.getLong(0))
    }

    // Hot-bucket guard probe: one vector duplicated 50x vs 50Nx (identical
    // vectors always share a bucket) on top of the 1x corpus — the
    // pathological skew nearDupPairs' maxBucket exists for. The uncapped
    // pair count is quadratic in the hot bucket's population (N² growth);
    // the capped form drops the over-cap bucket and stays flat.
    val hot = emb1.limit(1).select("embedding")
    def withHot(copies: Int) = emb1.select("vec_id", "embedding").unionByName(
      hot.crossJoin(spark.range(copies).withColumnRenamed("id", "vec_id"))
        .select(col("vec_id") + lit(90000000L) as "vec_id", col("embedding")))
    for ((label, copies) <- Seq("1x" -> 50, s"${n}x" -> 50 * n)) {
      val skewed = withHot(copies)
      time(s"neardup_hot_uncapped $label")(
        Similarity.nearDupPairs(skewed, planes, 0.95).count())
      time(s"neardup_hot_cap64 $label")(
        Similarity.nearDupPairs(skewed, planes, 0.95, maxBucket = Some(64)).count())
      // The bucket-count ceiling at 8 planes (=256 buckets): with fewer
      // buckets the background corpus itself crowds them, so the cap
      // starts dropping non-pathological pairs too — the measured form of
      // "an over-cap bucket means add planes, not raise the cap".
      time(s"neardup_hot_cap64_8planes $label")(
        Similarity.nearDupPairs(skewed, planes.take(8), 0.95, maxBucket = Some(64)).count())
    }
    // Token-budget trim / global numbering: the bucketed two-phase cumsum
    // vs the naive form (ONE window partition per source — and with one
    // source, ONE task owns every row regardless of cluster size: the
    // funnel the first-byte bucketing exists for). Healthy = bucketed
    // ~linear and beating the single window at Nx.
    for ((label, rows) <- Seq("1x" -> 1000000L, s"${n}x" -> 1000000L * n)) {
      val df = spark.range(rows).select(
        lit("s").as("src"), col("id"), (col("id") % 19 + 1).as("nt"))
      val budget = rows * 5
      time(s"budget_trim_bucketed $label")(
        Curation.tokenBudgetTrim(df, "src", "id", "nt", budget, salt = "p").count())
      time(s"budget_trim_1window $label") {
        val w = Window.partitionBy("src")
          .orderBy(md5(concat(lit("p"), col("id").cast("string"))))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        df.withColumn("cum", sum("nt").over(w)).filter(col("cum") <= budget).count()
      }
      time(s"global_positions $label")(
        Curation.globalPositions(df, "id", "p").agg(max(col("pos"))).head.getLong(0) + 1)
    }

    // Heavy hitters on a Zipf-shaped synthetic (2 unique bigrams per doc +
    // 3 hot ones corpus-wide — the real-corpus regime the sf tables lack):
    // the CMS prefilter drops the unique tail MAP-SIDE (candidates ≈ the
    // 3 hot grams + eps·N false positives vs ~2·rows distinct grams for
    // the direct groupBy — a ~10^6x shuffle-row reduction at 10x). What
    // this probe can show is only ~linear scaling of both: a local[N]
    // shuffle is memory-speed, so the sketch's second scan + per-row
    // estimates COST more here than the shuffle they avoid — the win is
    // network shuffle volume on a real cluster, not local seconds.
    // Healthy = both ~linear, CMS within ~2x of direct locally.
    for ((label, rows) <- Seq("1x" -> 500000L, s"${n}x" -> 500000L * n)) {
      val docs = spark.range(rows).select(
        col("id").as("doc_id"),
        concat_ws(" ",
          concat(lit("u"), col("id") * 2), concat(lit("u"), col("id") * 2 + 1),
          lit("hot alpha hot beta")).as("text"))
      time(s"heavyhitters_cms $label")(
        HeavyHitters.ngrams(docs, n = 2, minCount = rows).count())
      time(s"heavyhitters_direct $label")(
        docs.select(explode(TextFunctions.shingles(col("text"), 2)).as("gram"))
          .groupBy("gram").agg(count(lit(1)).as("freq"))
          .filter(col("freq") >= rows).count())
    }

    // BM25 / inverted index / chunking on the replica corpus: every
    // posting list (and df, and L) multiplies by the copy count, but the
    // scoring join only ever moves posting rows for the query's terms and
    // the query side stays broadcast. Healthy = ~linear (tf/df/dl are
    // map-side-combined aggs; chunking is shuffle-free per-row compute).
    {
      import spark.implicits._
      val probeQs = Seq((1L, "fast hash join"), (2L, "window sort order"),
        (3L, "slow scan filter")).toDF("query_id", "query_text")
      for ((label, d) <- Seq("1x" -> docs1, s"${n}x" -> docsN)) {
        time(s"bm25_search $label")(Bm25.search(d, probeQs, k = 10).count())
        time(s"inverted_index $label")(InvertedIndex.build(d).count())
        time(s"chunk_overlap $label")(Chunker.chunk(d, 12, 3).count())
      }
    }
    // Naive Bayes: train once on 1x, score the growing corpus — the model
    // is a fixed (term, class) table, so scoring is equi-joins + one
    // rollup + a |classes|-bounded argmax. Healthy = ~linear in the
    // scored corpus with the model cost flat (the NgramLm shape).
    {
      val labeled1 = Tables.documents(spark, sfDir).select("doc_id", "text", "lang")
      val labeledN = (0 until n)
        .map(i => labeled1.withColumn("doc_id", col("doc_id") + lit(i * 10000000L)))
        .reduce(_ unionByName _)
      for ((label, d) <- Seq("1x" -> labeled1, s"${n}x" -> labeledN)) {
        time(s"naive_bayes_score $label")(
          graft.text.NaiveBayes.classify(d, labeled1, classCol = "lang").count())
      }
    }
    // Triangle counting: replicate USERS (id-offset) so the graph grows
    // in vertices at constant density — healthy = ~linear in edges.
    // (Replicating the EVENT LOG onto the same users would instead
    // densify every co-occurrence bucket quadratically; that regime is a
    // cap-guard question, not a probe of the wedge join's scaling.)
    {
      val occ1 = Tables.events(spark, sfDir)
        .select(col("user_id"), col("event_type"),
          date_trunc("minute", col("ts")).as("mb"))
        .distinct()
      for ((label, mult) <- Seq("1x" -> 1, s"${n}x" -> n)) {
        // Tag the bucket key per copy too: offset users ALONE would still
        // share (event_type, minute) buckets across copies and densify
        // the graph n^2 instead of growing it n-fold.
        val occ = (0 until mult)
          .map(i => occ1
            .withColumn("user_id", col("user_id") + lit(i * 10000000L))
            .withColumn("event_type", concat(col("event_type"), lit("#" + i))))
          .reduce(_ unionByName _)
        def coEdges = occ.as("o1")
          .join(occ.as("o2"),
            col("o1.event_type") === col("o2.event_type") &&
              col("o1.mb") === col("o2.mb") &&
              col("o1.user_id") < col("o2.user_id"))
          .select(col("o1.user_id").as("src"), col("o2.user_id").as("dst"))
        time(s"triangles $label")(Triangles.perVertex(coEdges).count())
        // LPA on the same constant-density graph: 3 fixed rounds, each a
        // join + two map-side-combined aggs on the vertex — healthy =
        // ~linear in edges, rounds constant by construction.
        time(s"label_propagation $label")(
          graft.graph.LabelPropagation.communities(coEdges, rounds = 3).count())
      }
    }
    // Incremental inverted index: read-time merge cost vs delta count at
    // CONSTANT total corpus (the LSM read-amplification curve, r9 verdict
    // #8). Each term's rows multiply by the delta count, so the merge
    // shuffles D× the term rows; healthy = ~linear in D with a shallow
    // slope — when the slope bites, compactDeltas resets D to 1 (timed as
    // the last leg; compact-then-merge ≡ merge is spec-pinned).
    {
      import graft.text.InvertedIndex
      for (d <- Seq(1, 8, 32)) {
        time(s"inverted_merge_d$d") {
          val deltas = (0 until d)
            .map(i => InvertedIndex.buildDelta(docs1.filter(col("doc_id") % d === i)))
            .reduce(_ unionByName _)
          InvertedIndex.mergeDeltas(deltas).count()
        }
      }
      time("inverted_compact_d32") {
        val deltas = (0 until 32)
          .map(i => InvertedIndex.buildDelta(docs1.filter(col("doc_id") % 32 === i)))
          .reduce(_ unionByName _)
        InvertedIndex.compactDeltas(deltas).count()
      }
    }
    // BPE learn batching: same merge budget, M=1 vs M=8 — the job-count
    // lever (r9 verdict #6). Healthy = rounds collapse ~M-fold and wall
    // time follows, since each round is one pair-count job + checkpoint
    // regardless of how many merges it commits.
    {
      val nMergesProbe = 24
      for (m <- Seq(1, 8)) {
        if (only.isEmpty || only.exists(s"bpe_learn_m$m".startsWith)) {
          val t0 = System.nanoTime()
          val (merges, rounds) =
            graft.text.Bpe.learnMergesBatchedWithRounds(docs1, nMergesProbe, m)
          println(f"[scaleprobe] bpe_learn_m$m%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s  " +
            f"(${merges.size} merges in $rounds rounds)")
          graft.util.CacheScope.releaseAll()
        }
      }
    }
    // BPE apply at DEPTH (word-local replay): plan depth is constant in
    // merge count — one codegen projection — so 64 -> 256 merges at 1x
    // must be ~flat, and the Nx run must track corpus growth only. The
    // pre-r12 window-chain form could not even ANALYZE a 256-merge plan
    // (3 window stages per merge).
    {
      // t19d's exact gated table (single definition — the probe must
      // measure the same merges the oracle pins), padded to depth 256
      // with never-matching filler (depth is what's under test).
      val d64 = graft.queries.TrainingData.bpeDeepMerges
      val d256 = d64 ++ (0 until (256 - d64.size)).map(k => (s"zz$k", "q"))
      time("bpe_apply_d64 1x")(graft.text.Bpe.applyBpe(docs1, d64).count())
      for ((label, d) <- Seq("1x" -> docs1, s"${n}x" -> docsN))
        time(s"bpe_apply_d256 $label")(graft.text.Bpe.applyBpe(d, d256).count())
    }
    // Unigram-LM tokenizer over a GROWING DISTINCT-WORD corpus (the real
    // work is distinct-words-sized, so replicating the fixture — whose
    // 31-word vocabulary replication cannot grow — would probe nothing):
    // synthetic docs of 8 hex words each, vocabulary ~8 per doc. Healthy
    // = learn ~linear in distinct words (seed explode + 2 bounded-vocab
    // EM segmentation passes), apply tracking it (one more Viterbi pass
    // + the assembly join).
    locally {
      def synth(nDocs: Int) = spark.range(nDocs).select(
        col("id").as("doc_id"),
        concat_ws(" ", (0 until 8).map(k =>
          substring(md5(concat(lit(k * 1000003), col("id"))), 1, 6)): _*)
          .as("text"))
      for ((label, nd) <- Seq("1x" -> 2000, "3x" -> 6000)) {
        time(s"unigram_learn $label")(graft.text.Unigram.learn(synth(nd)).count())
        time(s"unigram_apply $label")(
          graft.text.Unigram.learnApply(synth(nd)).count())
      }
    }
    // Distributed exact percentiles: the two-phase rank over (group,
    // value-bucket). Healthy = ~linear in rows (two data passes: bucket
    // rollup + ranked join); the native-percentile hazard it replaces is
    // MEMORY (one task buffers a group), which a wall-clock probe can't
    // show — this pins the throughput side.
    locally {
      val o1 = Tables.orders(spark, sfDir)
      val oN = replicate(o1, n, "o_orderkey")
      for ((label, o) <- Seq("1x" -> o1, s"${n}x" -> oN))
        time(s"pctl_distributed $label")(
          graft.operators.ExactPercentiles.perGroup(o, "o_orderpriority",
            "o_totalprice", Seq(("p50", 0.5), ("p90", 0.9), ("p99", 0.99)),
            bucketWidth = 4096.0).count())
    }
    // kNN graph via sign-band blocking. NOTE the replica sweep is the
    // ADVERSARIAL case: id-offset copies have IDENTICAL signatures, so
    // every copy collides in every band and candidate pairs grow ~N² per
    // duplicate cluster (real corpora pay ~N²/256 per band only within
    // genuinely-similar neighborhoods). Healthy here = completes with
    // pair growth tracking the duplicate structure, not a hang.
    for ((label, e) <- Seq("1x" -> emb1, "3x" -> replicate(emb1, 3, "vec_id")))
      time(s"knn_graph $label")(Similarity.knnGraph(e, k = 3, dim = 64).count())
    // The r12 skew exposure, probed head-on: an ANISOTROPIC corpus (a
    // shared direction pins band 0's sign bits — every vector lands in
    // ONE (band, key) bucket) drives the unguarded candidate stage to
    // exactly N(N-1)/2 pairs. rotate+cap first dissolves the pinned
    // band (hdDecorrelate spreads the direction's energy), then the cap
    // hard-bounds what bias survives: guarded pairs can never exceed
    // bands·256·cap²/2 REGARDLESS of N. Healthy = the guarded count is
    // orders of magnitude under the unguarded N²/2 with the gap
    // widening at 2x (observed 45x -> 82x, guarded growth 2.2x at 2x N).
    locally {
      def aniso(n: Int) = spark.range(n).select(
        col("id").as("vec_id"),
        transform(sequence(lit(0L), lit(63L)), j => {
          // hash noise, not a linear grid — see SignBandSkewSpec
          val u = (pmod(hash(col("id"), j), lit(7)) - 3).cast("double")
          when(j < 8, lit(5.0) + u).otherwise(u)
        }).cast("array<float>").as("embedding"))
      for ((label, n) <- Seq("1x" -> 2000, "2x" -> 4000)) {
        time(s"band_skew_unguarded $label")(
          Similarity.signBandEdges(aniso(n), dim = 64, minCosine = -1.0,
            maxBucket = None).count())
        // saltOverCap = false: this leg pins the DROP-path bound
        // (<= bands·2^bandBits·cap²/2 regardless of N); the salted leg
        // below is the library DEFAULT (degrade, <= n·cap/2 per bucket
        // — linear in n, so growth ~2x at 2x N instead of flat).
        time(s"band_skew_guarded $label")(
          Similarity.signBandEdges(aniso(n), dim = 64, minCosine = -1.0,
            rotate = true, maxBucket = Some(64), saltOverCap = false).count())
        time(s"band_skew_salted $label")(
          Similarity.signBandEdges(aniso(n), dim = 64, minCosine = -1.0,
            rotate = true, maxBucket = Some(64)).count())
        // The fourth lever: 16-bit bands spread the same corpus over
        // 65,536 keys/band — occupancy collapses before any cap bites.
        time(s"band_skew_b16 $label")(
          Similarity.signBandEdges(aniso(n), dim = 64, minCosine = -1.0,
            rotate = true, maxBucket = Some(64), bandBits = 16).count())
      }
    }
    // SQ8 ANN: fixed queries, growing corpus — stats is one 64-row
    // rollup, encode/decode are row-local, scoring is the e1 broadcast
    // scan over DECODED vectors. Healthy = ~linear, tracking brute force
    // (locally SQ8 pays decode flops for the IO it saves on a cluster).
    for ((label, e) <- Seq("1x" -> emb1, s"${n}x" -> embN)) {
      val queries = emb1.limit(8)
      time(s"ann_sq8 $label")(Similarity.sq8TopK(queries, e, k = 5).count())
    }
    // IVF-PQ SERVE split (e10c): train-and-store once per corpus size
    // (the train wall, reported separately — it writes the three
    // artifact tables, index partitioned by cell), then the serve probe
    // answers from the FILES only, the production shape. Healthy =
    // serve ~linear in index size with a wall far under train's — the
    // growing cost is the probed cells' scan; everything else is
    // query-side constants.
    for ((label, e) <- Seq("1x" -> emb1, s"${n}x" -> embN)) {
      val queries = emb1.limit(8)
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_scaleprobe_ivfpq").toString
      time(s"ivfpq_train_store $label") {
        val (c, cb, idx) = Similarity.ivfPqTrain(e, nCells = 16, m = 4,
          ksub = 16, trainIters = 1)
        c.write.mode("overwrite").parquet(s"$tmp/cent")
        cb.write.mode("overwrite").parquet(s"$tmp/cb")
        idx.write.mode("overwrite").partitionBy("centroid_id")
          .parquet(s"$tmp/idx")
        spark.read.parquet(s"$tmp/idx").count()
      }
      time(s"ivfpq_serve $label")(
        Similarity.ivfPqTopKServe(queries,
          spark.read.parquet(s"$tmp/cent"), spark.read.parquet(s"$tmp/cb"),
          spark.read.parquet(s"$tmp/idx"), nProbe = 4, k = 5).count())
    }
    // Hybrid RRF: both legs are corpus-linear retrievals; the fusion
    // joins two k·|queries|-row sides. Healthy = tracking the legs'
    // growth with the fusion itself invisible.
    {
      import spark.implicits._
      val fuseQs = Seq((1L, "fast hash join"), (2L, "window sort order"),
        (3L, "slow scan filter")).toDF("query_id", "query_text")
      for ((label, d, e) <- Seq(("1x", docs1, emb1), (s"${n}x", docsN, embN))) {
        time(s"hybrid_rrf $label") {
          val lex = Bm25.search(d, fuseQs, k = 20)
            .select(col("query_id"), col("doc_id"), col("rk").as("rank"))
          val den = Similarity.bruteForceTopK(
              emb1.filter(col("vec_id").between(1L, 3L)), e, k = 20)
            .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
          graft.text.Fusion.rrf(Seq("lex" -> lex, "dense" -> den), k = 10).count()
        }
      }
    }
    // Curriculum phases: the bucketed two-phase cumsum over a synthetic
    // score (the machinery, not the scorer — lm_crossentropy probes that
    // separately). Healthy = ~linear; the per-bucket windows parallelize
    // and only the bucket-count offset table is serial.
    for ((label, d) <- Seq("1x" -> docs1, s"${n}x" -> docsN)) {
      time(s"curriculum_phases $label")(
        Curation.curriculumPhases(
          d.select(col("doc_id"),
            (col("doc_id") % 100 / 10.0).as("score"),
            size(split(col("text"), " ")).cast("long").as("n_toks")),
          "score", "n_toks").count())
    }
    // t54 capstone (r18): stored-vocab tokenize -> id-map projection ->
    // deterministic shard -> per-shard packing cumsum, as one chain. The
    // vocab is learned ONCE at 1x and served fixed at both scales (the
    // serving shape — a tokenizer never re-learns per batch). Healthy =
    // ~linear: segmentation is per-DISTINCT-word (the replicas share
    // the word table), the id map is a literal projection, the packing
    // is one window per shard.
    if (only.isEmpty || only.exists("tokenize_pack_shard".startsWith)) {
      val vrows = graft.text.Unigram.learn(docs1)
        .select("piece", "cnt", "cost_micro").collect()
      val vocab = vrows.map(r => (r.getString(0), r.getLong(2))).toSeq
      val idOf: Map[String, Long] = vrows
        .sortBy(r => (-r.getLong(1), r.getString(0))).zipWithIndex
        .map { case (r, i) => r.getString(0) -> i.toLong }.toMap
      for ((label, d) <- Seq("1x" -> docs1, s"${n}x" -> docsN)) {
        time(s"tokenize_pack_shard $label") {
          val seg = graft.text.Unigram.applyUnigram(d, vocab)
          val ids = seg.withColumn("token_ids",
            transform(split(col("uni_text"), " "),
              p => coalesce(try_element_at(typedLit(idOf), p), lit(-1L))))
          val sharded = Curation.deterministicShuffle(ids, "doc_id", "t54", 4)
          // agg over the id array AND the packing columns, MATERIALIZED
          // via head.getLong (r18 ADVICE #1): a trailing .count() plans
          // as Aggregate(count(1)) over this aggregate and references
          // none of its output, so ColumnPruning could strip the agg
          // expressions and with them the token-id transform and the
          // packing window — timing only segmentation. Reading the value
          // itself (the asof probes' pattern) keeps every layer live.
          Curation.packSequences(sharded, "shard", "shuffle_key",
            "n_pieces", 64)
            .filter(col("n_pieces") > 0)
            // coalesce: sum/max over ZERO rows are SQL NULL and
            // getLong would NPE — an empty/all-filtered corpus should
            // record 0, as the old .count() did, not abort the sweep.
            .agg(coalesce(
              sum(size(col("token_ids"))) + max(col("end_seq"))
                + max(col("start_tok")), lit(0L)).as("probe_sum"))
            .head.getLong(0)
        }
      }
    }
    spark.stop()
  }
}
