package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.curation.Curation
import graft.graph.PageRank
import graft.quality.Expectations
import graft.operators.{AsOfJoin, IntervalMerge, RangeJoin, Scd2, TableDiff, ZOrder}
import graft.quality.Profile
import graft.tables.Tables
import graft.text.{TextFunctions, TfIdf}

/** Round-4 surface: the two join operators Spark lacks as primitives
  * (backward as-of, interval containment) re-expressed Spark-first with
  * DuckDB's native forms as oracles, plus the corpus-curation stage of a
  * training-data pipeline (deterministic sampling, mixture weighting,
  * sequence packing, decontamination, repetition signals, PII scrubbing) —
  * every entry value-verified against an exact SQL oracle.
  */
object CurationQueries {

  /** Per-source keep rates for the mixture query: src<i> keeps (i%5)*25%
    * — includes 0% (drop a source entirely) and 100% (keep all) endpoints.
    */
  private val mixtureRates: Map[String, Double] =
    (0 until 20).map(i => s"src$i" -> (i % 5) * 0.25).toMap

  /** [[mixtureRates]] as a one-line SQL CASE body (c2's oracle and the
    * c29b mixture-audit block share it).
    */
  private val mixtureCasesSql: String =
    mixtureRates.toSeq.sortBy(_._1).map { case (src, rate) =>
      s"WHEN '$src' THEN ${(rate * 10000).toInt}"
    }.mkString(" ")

  /** Per-source token budgets for c9b: src<i> gets (i%4)*500 tokens —
    * includes 0 (drop the source) and budgets no source can exhaust.
    */
  private val sourceBudgets: Map[String, Long] =
    (0 until 20).map(i => s"src$i" -> (i % 4) * 500L).toMap

  /** The same map as a SQL CASE, so the oracle can never drift from it. */
  private val sourceBudgetCase: String =
    "CASE source " +
      sourceBudgets.toSeq.sortBy(_._1)
        .map { case (k, v) => s"WHEN '$k' THEN $v" }.mkString(" ") +
      " ELSE 0 END"

  private val SeqLen = 2048
  private val MicrosPer17h = 17L * 3600 * 1000000
  private val Micros90m = 90L * 60 * 1000000
  private val Micros30m = 30L * 60 * 1000000
  private val BaseUs = 1704067200000000L // 2024-01-01T00:00:00Z

  /** The q34 reconciliation scenario: "yesterday" is a narrow lineitem
    * projection; "today" dropped every 97th order's rows, bumped
    * quantities on every 13th, and appended re-keyed copies of every
    * 89th — removals, changes, and additions in one diff. The appended
    * copies live in the NEGATIVE key space (−key−1, the r16 fixture
    * convention): lineitem orderkeys are positive at every SF, so the
    * injected cohort can never collide with a real key — unlike the
    * old fixed `+1e7` offset, which an SF≈1700 lineitem would have
    * caught up with (r16 verdict #3, the last fixed-offset residue).
    */
  private def diffFixture(
      s: org.apache.spark.sql.SparkSession,
      dir: String): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val li = Tables.lineitem(s, dir)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag")
    val cur = li.filter(col("l_orderkey") % 97 =!= 0)
      .withColumn("l_quantity",
        when(col("l_orderkey") % 13 === 0, col("l_quantity") + 1)
          .otherwise(col("l_quantity")))
      .unionByName(li.filter(col("l_orderkey") % 89 === 0)
        .withColumn("l_orderkey", -col("l_orderkey") - 1L))
    (li, cur)
  }

  private val diffSqlCte =
    """WITH li AS (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
      |            FROM lineitem),
      |r AS (SELECT l_orderkey, l_linenumber,
      |             CASE WHEN l_orderkey % 13 = 0 THEN l_quantity + 1 ELSE l_quantity END AS l_quantity,
      |             l_extendedprice, l_returnflag
      |      FROM li WHERE l_orderkey % 97 <> 0
      |      UNION ALL
      |      SELECT -l_orderkey - 1, l_linenumber, l_quantity, l_extendedprice, l_returnflag
      |      FROM li WHERE l_orderkey % 89 = 0),
      |j AS (SELECT coalesce(l.l_orderkey, r.l_orderkey) AS l_orderkey,
      |             coalesce(l.l_linenumber, r.l_linenumber) AS l_linenumber,
      |             CASE WHEN r.l_orderkey IS NULL THEN 'removed'
      |                  WHEN l.l_orderkey IS NULL THEN 'added'
      |                  WHEN l.l_quantity IS NOT DISTINCT FROM r.l_quantity
      |                   AND l.l_extendedprice IS NOT DISTINCT FROM r.l_extendedprice
      |                   AND l.l_returnflag IS NOT DISTINCT FROM r.l_returnflag THEN 'unchanged'
      |                  ELSE 'changed' END AS diff_status,
      |             CASE WHEN l.l_orderkey IS NULL OR r.l_orderkey IS NULL THEN ''
      |                  ELSE array_to_string(list_filter([
      |                     CASE WHEN l.l_quantity IS DISTINCT FROM r.l_quantity THEN 'l_quantity' END,
      |                     CASE WHEN l.l_extendedprice IS DISTINCT FROM r.l_extendedprice THEN 'l_extendedprice' END,
      |                     CASE WHEN l.l_returnflag IS DISTINCT FROM r.l_returnflag THEN 'l_returnflag' END],
      |                     x -> x IS NOT NULL), ',') END AS changed_columns
      |      FROM li l FULL OUTER JOIN r
      |        ON l.l_orderkey = r.l_orderkey AND l.l_linenumber = r.l_linenumber)""".stripMargin

  val all: Seq[Q] = Seq(
    // ------------------------------------------------------------------
    // Q29 — backward as-of join: every purchase event annotated with the
    // user's most recent click at-or-before it. One shuffle on user_id,
    // union + ordered scan (see AsOfJoin scaladoc); the oracle is DuckDB's
    // native ASOF LEFT JOIN. Clicks are pre-aggregated per (user, ts) so
    // "the" as-of row is well-defined in both engines.
    Q(
      "q29_asof_join",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"),
            col("value").as("purchase_value"))
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy("user_id", "ts")
          .agg(max(col("value")).as("click_value"))
        AsOfJoin.backward(purchases, clicks,
          keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
          valueCols = Seq("click_value"))
          .orderBy("event_id")
      },
      Some("""WITH p AS (SELECT event_id, user_id, ts, value AS purchase_value
             |           FROM events WHERE event_type = 'purchase'),
             |c AS (SELECT user_id, ts, max(value) AS click_value
             |      FROM events WHERE event_type = 'click' GROUP BY 1, 2)
             |SELECT p.event_id, p.user_id, p.ts, p.purchase_value, c.click_value
             |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
             |ORDER BY p.event_id""".stripMargin)),

    // ------------------------------------------------------------------
    // Q29b — as-of with tolerance (max staleness): clicks older than 24h
    // null out. The as-of match is the nearest predecessor by definition,
    // so a post-filter on the matched row is exact in both engines; the
    // fixture's spread (683 of 1838 matches within 24h at sf0.01)
    // exercises both branches.
    Q(
      "q29b_asof_tolerance",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"),
            col("value").as("purchase_value"))
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy("user_id", "ts")
          .agg(max(col("value")).as("click_value"))
        AsOfJoin.backward(purchases, clicks,
          keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
          valueCols = Seq("click_value"),
          tolerance = Some(24L * 3600 * 1000000))
          .orderBy("event_id")
      },
      Some("""WITH p AS (SELECT event_id, user_id, ts, value AS purchase_value
             |           FROM events WHERE event_type = 'purchase'),
             |c AS (SELECT user_id, ts, max(value) AS click_value
             |      FROM events WHERE event_type = 'click' GROUP BY 1, 2)
             |SELECT p.event_id, p.user_id, p.ts, p.purchase_value,
             |       CASE WHEN epoch_us(p.ts) - epoch_us(c.ts) <= 86400000000
             |            THEN c.click_value END AS click_value
             |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
             |ORDER BY p.event_id""".stripMargin)),

    // ------------------------------------------------------------------
    // Q29c — forward as-of: each purchase annotated with the user's NEXT
    // click at-or-after it (same union-scan shape, time order reversed).
    // DuckDB's ASOF with <= is the oracle.
    Q(
      "q29c_asof_forward",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"),
            col("value").as("purchase_value"))
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy("user_id", "ts")
          .agg(max(col("value")).as("click_value"))
        AsOfJoin.forward(purchases, clicks,
          keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
          valueCols = Seq("click_value"))
          .orderBy("event_id")
      },
      Some("""WITH p AS (SELECT event_id, user_id, ts, value AS purchase_value
             |           FROM events WHERE event_type = 'purchase'),
             |c AS (SELECT user_id, ts, max(value) AS click_value
             |      FROM events WHERE event_type = 'click' GROUP BY 1, 2)
             |SELECT p.event_id, p.user_id, p.ts, p.purchase_value, c.click_value
             |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts <= c.ts
             |ORDER BY p.event_id""".stripMargin)),

    // ------------------------------------------------------------------
    // Q29d — q29 with hot-key hardening engaged (weekly time buckets):
    // per-(user, bucket) windows + a per-bucket carry table, so one user's
    // full history never serializes into a single task. Same oracle as
    // q29 — bucketing must be result-invisible.
    Q(
      "q29d_asof_bucketed",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"),
            col("value").as("purchase_value"))
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy("user_id", "ts")
          .agg(max(col("value")).as("click_value"))
        AsOfJoin.backward(purchases, clicks,
          keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
          valueCols = Seq("click_value"),
          timeBucket = Some(7L * 24 * 3600 * 1000000))
          .orderBy("event_id")
      },
      Some("""WITH p AS (SELECT event_id, user_id, ts, value AS purchase_value
             |           FROM events WHERE event_type = 'purchase'),
             |c AS (SELECT user_id, ts, max(value) AS click_value
             |      FROM events WHERE event_type = 'click' GROUP BY 1, 2)
             |SELECT p.event_id, p.user_id, p.ts, p.purchase_value, c.click_value
             |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
             |ORDER BY p.event_id""".stripMargin)),

    // ------------------------------------------------------------------
    // Q30 — interval containment join: events matched to the maintenance
    // windows (90 min every 17 h from 2024-01-01) containing them. The
    // Spark plan is a bucketed EQUI-join (bucket width = window length, so
    // each window lands in <= 2 buckets and each event in exactly 1) — a
    // raw inequality join would plan as BroadcastNestedLoopJoin and go
    // O(events x windows). DuckDB's inequality join is the oracle.
    Q(
      "q30_range_join",
      (s, dir) => {
        val points = Tables.events(s, dir)
          .select(col("event_id"), unix_micros(col("ts")).as("ts_us"))
        val windows = s.range(40).select(
          col("id").as("w"),
          (lit(BaseUs) + col("id") * MicrosPer17h).as("start_us"))
          .withColumn("end_us", col("start_us") + Micros90m)
        RangeJoin.bucketed(points, windows,
          pointCol = "ts_us", startCol = "start_us", endCol = "end_us",
          bucketWidth = Micros90m)
          .select("event_id", "w", "ts_us")
          .orderBy("event_id", "w")
      },
      Some(s"""WITH win AS (
             |  SELECT w, $BaseUs + w * $MicrosPer17h AS start_us,
             |         $BaseUs + w * $MicrosPer17h + $Micros90m AS end_us
             |  FROM (SELECT unnest(range(0, 40)) AS w)),
             |e AS (SELECT event_id, epoch_us(ts) AS ts_us FROM events)
             |SELECT e.event_id, win.w, e.ts_us
             |FROM e JOIN win ON win.start_us <= e.ts_us AND e.ts_us < win.end_us
             |ORDER BY event_id, w""".stripMargin)),

    // ------------------------------------------------------------------
    // Q31 — interval-interval overlap join: 30-minute activity intervals
    // (one per event) against the q30 maintenance windows. BOTH sides
    // explode to 90-min buckets; a pair is emitted only in the bucket
    // owning greatest(start_a, start_b), so multi-bucket overlaps never
    // duplicate and no dedup shuffle is needed. DuckDB's inequality join
    // is the oracle.
    Q(
      "q31_overlap_join",
      (s, dir) => {
        val activity = Tables.events(s, dir)
          .select(col("event_id"), unix_micros(col("ts")).as("start_us"))
          .withColumn("end_us", col("start_us") + Micros30m)
        val windows = s.range(40).select(
          col("id").as("w"),
          (lit(BaseUs) + col("id") * MicrosPer17h).as("w_start_us"))
          .withColumn("w_end_us", col("w_start_us") + Micros90m)
        RangeJoin.overlap(activity, windows,
          leftStart = "start_us", leftEnd = "end_us",
          rightStart = "w_start_us", rightEnd = "w_end_us",
          bucketWidth = Micros90m)
          .select("event_id", "w", "start_us")
          .orderBy("event_id", "w")
      },
      Some(s"""WITH win AS (
             |  SELECT w, $BaseUs + w * $MicrosPer17h AS w_start_us,
             |         $BaseUs + w * $MicrosPer17h + $Micros90m AS w_end_us
             |  FROM (SELECT unnest(range(0, 40)) AS w)),
             |e AS (SELECT event_id, epoch_us(ts) AS start_us,
             |             epoch_us(ts) + $Micros30m AS end_us
             |      FROM events)
             |SELECT e.event_id, win.w, e.start_us
             |FROM e JOIN win ON e.start_us < win.w_end_us AND win.w_start_us < e.end_us
             |ORDER BY event_id, w""".stripMargin)),

    // ------------------------------------------------------------------
    // C1 — deterministic hash sampling: ~10% of documents kept by md5
    // bucket of the salted id. Stable across reruns/retries/partitioning
    // (rand() is not); md5 so the oracle computes the identical bucket.
    Q(
      "c1_hash_sample",
      (s, dir) =>
        Curation.hashSample(Tables.documents(s, dir), "doc_id", keepPct = 10, salt = "s1")
          .select(col("doc_id"),
            Curation.hashBucket(col("doc_id"), 100, "s1").as("bucket"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, bucket FROM (
             |  SELECT doc_id,
             |         CAST(CAST('0x' || substr(md5('s1' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 AS BIGINT) AS bucket
             |  FROM documents)
             |WHERE bucket < 10 ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // C20 — per-row WEIGHTED sampling: each document kept with probability
    // equal to its own quality weight (distinct-word fraction here) — the
    // importance-sampling curation step. Weight resolves to the 1/10000
    // integer grid (floor is IEEE-exact: the ratio, the multiply, and the
    // floor are the identical doubles on both engines), compared against
    // the same salted md5 bucket as c1/c2.
    Q(
      "c20_weighted_sample",
      (s, dir) => {
        val w = size(array_distinct(split(col("text"), " "))).cast("double") /
          size(split(col("text"), " "))
        Curation.weightedSample(
          Tables.documents(s, dir).withColumn("w", w),
          idCol = "doc_id", weightCol = "w", salt = "ws")
          .select("doc_id", "w")
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, w FROM (
             |  SELECT doc_id,
             |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             |      / len(string_split(text, ' ')) AS w,
             |    CAST('0x' || substr(md5('ws' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 10000 AS bucket
             |  FROM documents)
             |WHERE bucket < CAST(floor(w * 10000) AS BIGINT)
             |ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // C21 — train/val/test split: 80/10/10 by the shared salted-md5 grid,
    // per-document deterministic (rerun/retry/partition stable, and a
    // document's split NEVER changes when the corpus grows — the property
    // random splits lack and leakage audits depend on). Stratification
    // comes free: hashing is source-independent, so each source lands
    // ~80/10/10 without coordination.
    Q(
      "c21_dataset_split",
      (s, dir) => {
        val b = Curation.hashBucket(col("doc_id"), 100, "sp")
        Tables.documents(s, dir)
          .select(col("doc_id"), col("source"),
            when(b < 80, "train").when(b < 90, "val").otherwise("test")
              .as("split"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, source,
             |       CASE WHEN bucket < 80 THEN 'train'
             |            WHEN bucket < 90 THEN 'val'
             |            ELSE 'test' END AS split
             |FROM (SELECT doc_id, source,
             |        CAST('0x' || substr(md5('sp' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 AS bucket
             |      FROM documents)
             |ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // C22 — SEMANTIC decontamination: the embedding-space complement of
    // c4's lexical n-gram screen (paraphrased eval leakage has zero
    // shingle overlap but cosine ~1). Eval sets are small by nature, so
    // the screen is the packed-broadcast form — the eval set becomes ONE
    // broadcast row and a 100 TB train corpus pays a single map-side
    // pass, no shuffle, no per-pair join rows. Fixture plants the leak:
    // eval = every 10th vector scaled x2 (exact in both engines — a
    // float/double exponent bump), so each source row scores cosine
    // exactly cos(v,v) vs its planted copy while every other pair keeps
    // its natural cosine (max ~0.49 in this data, well under tau=0.95).
    // n_hits (count) and max_cos (max) are order-independent, so the
    // nondeterministic collect_list pack order cannot flake the hash.
    Q(
      "c22_semantic_decontaminate",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
        val evalSet = emb.filter(col("vec_id") % 10 === 0)
          .select(transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
        graft.similarity.Similarity.semanticDecontaminate(emb, evalSet, tau = 0.95)
      },
      Some("""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |ev AS (SELECT list_transform(v, x -> x * 2.0) AS tv FROM emb WHERE vec_id % 10 = 0),
             |tn AS (SELECT tv, sqrt(list_dot_product(tv, tv)) AS tnrm FROM ev),
             |tr AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM emb),
             |sc AS (SELECT t.vec_id,
             |              CASE WHEN isnan(list_dot_product(t.v, s.tv)/(t.nrm*s.tnrm)) THEN NULL
             |                   ELSE list_dot_product(t.v, s.tv)/(t.nrm*s.tnrm) END AS cos
             |       FROM tr t CROSS JOIN tn s),
             |agg AS (SELECT vec_id,
             |               CAST(count(*) FILTER (cos >= 0.95) AS BIGINT) AS n_hits,
             |               max(cos) AS max_cos
             |        FROM sc GROUP BY 1)
             |SELECT vec_id, n_hits, max_cos, n_hits = 0 AS kept
             |FROM agg ORDER BY vec_id""".stripMargin)),

    // ------------------------------------------------------------------
    // C23 — DSIR importance weighting (Xie et al. 2023): hashed-unigram
    // likelihood ratio of every document against a target domain
    // (src0/src1 here), the classifier-free "make the corpus look like
    // the target" selection step. md5 integer-grid buckets, decimal-grid
    // logs (t20's contract) — the per-doc sum is exact decimal, so the
    // oracle matches bit-for-bit.
    Q(
      "c23_dsir_importance",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Curation.dsirImportance(docs,
          docs.filter(col("source").isin("src0", "src1")),
          buckets = 64, salt = "dsir")
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (SELECT doc_id,
             |         CAST('0x' || substr(md5('dsir' || term), 1, 8) AS BIGINT) % 64 AS b
             |       FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
             |             FROM documents WHERE text IS NOT NULL)),
             |ttok AS (SELECT b FROM tok JOIN documents USING (doc_id)
             |         WHERE source IN ('src0', 'src1')),
             |ct AS (SELECT b, count(*) AS ct FROM ttok GROUP BY 1),
             |cq AS (SELECT b, count(*) AS cq FROM tok GROUP BY 1),
             |nt AS (SELECT count(*) AS nt FROM ttok),
             |nq AS (SELECT count(*) AS nq FROM tok),
             |lam AS (SELECT b,
             |          CAST(ln(coalesce(ct, 0) + 1) AS DECIMAL(20,6))
             |        - CAST(ln(nt + 64) AS DECIMAL(20,6))
             |        - CAST(ln(coalesce(cq, 0) + 1) AS DECIMAL(20,6))
             |        + CAST(ln(nq + 64) AS DECIMAL(20,6)) AS lam
             |        FROM ct FULL JOIN cq USING (b) CROSS JOIN nt CROSS JOIN nq),
             |perdoc AS (SELECT doc_id, b, count(*) AS c FROM tok GROUP BY 1, 2),
             |agg AS (SELECT doc_id, sum(c) AS n_tokens,
             |               CAST(sum(c * lam) AS DOUBLE) AS log_w
             |        FROM perdoc JOIN lam USING (b) GROUP BY 1)
             |SELECT d.doc_id, CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
             |       a.log_w, coalesce(a.log_w > 0.0, FALSE) AS selected
             |FROM (SELECT DISTINCT doc_id FROM documents) d LEFT JOIN agg a USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // C28 — the DEDUP-ADJUSTED token budget (the honest version of
    // c26's plan): per-source availability is counted on exact-dedup
    // SURVIVORS (global md5 of the text, min-doc_id survivor election —
    // d1's convention), then the SAME 3-round waterfill allocates 40%
    // of the DEDUPED pool. The fixture plants the two failure modes a
    // naive plan mis-budgets: a 'mirror' source that is a pure re-crawl
    // of every 5th doc (its naive avail is all duplicate tokens —
    // deduped avail 0, alloc 0) and mild in-source duplication (every
    // 7th doc re-entered under its own source). The report carries both
    // counts so the shift is a read-off: (avail_naive, avail_dedup,
    // dup_tokens, dup_frac, alloc, saturated) per source. Shape at
    // scale: the survivor election is d1's one md5 groupBy; everything
    // downstream operates on |sources|-row tables.
    Q(
      "c28_dedup_adjusted_budget",
      (s, dir) => {
        val base = Tables.documents(s, dir)
          .filter(col("text").isNotNull)
          .select("doc_id", "source", "text")
        // Two injected cohorts in one fixture: the negative id space
        // split by PARITY (−2·id−1 / −2·id−2) so the cohorts cannot
        // collide with each other or with real ids at any sf (r15
        // verdict #5 — fixed +offsets collide at sf≈2000).
        val docs = base
          .unionByName(base.filter(col("doc_id") % 5 === 0)
            .select((-col("doc_id") * 2 - 1L).as("doc_id"),
              lit("mirror").as("source"), col("text")))
          .unionByName(base.filter(col("doc_id") % 7 === 0)
            .select((-col("doc_id") * 2 - 2L).as("doc_id"),
              col("source"), col("text")))
        // Three consumers (naive rollup, survivor election, dedup
        // rollup) — persist per the CacheScope convention or the md5 +
        // tokenize pass over the tripled corpus runs three times.
        val withH = graft.util.CacheScope.persist(
          docs.select(col("doc_id"), col("source"),
            md5(col("text")).as("__h"),
            size(TextFunctions.tokens(col("text"))).cast("long").as("__t")))
        val surv = withH.groupBy("__h").agg(min("doc_id").as("doc_id"))
        val naive = withH.groupBy("source")
          .agg(sum(col("__t")).as("avail_naive"))
        val ded = withH.join(surv, Seq("__h", "doc_id"), "left_semi")
          .groupBy("source").agg(sum(col("__t")).as("avail_dedup"))
        // |sources|-row table with three consumers (budget agg, waterfill
        // input, final naive join) — persist or each re-runs both rollups.
        val av = graft.util.CacheScope.persist(
          naive.join(ded, Seq("source"), "left")
            .select(col("source"), col("avail_naive"),
              coalesce(col("avail_dedup"), lit(0L)).as("avail"),
              lit(1L).as("w")))
        val budget = av.agg(expr("sum(avail) * 2 div 5").as("budget"))
        Curation.waterfillAllocation(av.select("source", "avail", "w"),
            budget, rounds = 3)
          .join(av.select("source", "avail_naive"), "source")
          .select(
            col("source"), col("avail_naive"),
            col("avail").as("avail_dedup"),
            (col("avail_naive") - col("avail")).as("dup_tokens"),
            when(col("avail_naive") > 0,
              (col("avail_naive") - col("avail")).cast("double") /
                col("avail_naive")).as("dup_frac"),
            col("alloc"), col("saturated"))
          .orderBy("source")
      },
      Some("""WITH base AS (SELECT doc_id, source, text FROM documents
             |              WHERE text IS NOT NULL),
             |docs AS (SELECT * FROM base
             |  UNION ALL SELECT -doc_id * 2 - 1, 'mirror', text FROM base
             |            WHERE doc_id % 5 = 0
             |  UNION ALL SELECT -doc_id * 2 - 2, source, text FROM base
             |            WHERE doc_id % 7 = 0),
             |h AS MATERIALIZED (SELECT doc_id, source, md5(text) AS hh,
             |       CAST(len(string_split(text, ' ')) AS BIGINT) AS t
             |     FROM docs),
             |sv AS (SELECT hh, min(doc_id) AS doc_id FROM h GROUP BY 1),
             |naive AS (SELECT source, CAST(sum(t) AS BIGINT) AS avail_naive
             |          FROM h GROUP BY 1),
             |ded AS (SELECT h.source, CAST(sum(h.t) AS BIGINT) AS avail_dedup
             |        FROM h JOIN sv ON h.hh = sv.hh AND h.doc_id = sv.doc_id
             |        GROUP BY 1),
             |av AS (SELECT n.source, n.avail_naive,
             |              COALESCE(d.avail_dedup, 0) AS avail
             |       FROM naive n LEFT JOIN ded d USING (source)),
             |b AS (SELECT (sum(avail) * 2) // 5 AS r FROM av),
             |u1 AS (SELECT count(*) AS ws FROM av WHERE avail > 0),
             |a1 AS (SELECT source, avail_naive, avail,
             |         least(CASE WHEN avail > 0 AND ws > 0
             |                    THEN (r * 1) // ws ELSE 0 END, avail) AS alloc
             |       FROM av CROSS JOIN b CROSS JOIN u1),
             |r1 AS (SELECT b.r - (SELECT sum(alloc) FROM a1) AS r FROM b),
             |u2 AS (SELECT count(*) AS ws FROM a1 WHERE alloc < avail),
             |a2 AS (SELECT source, avail_naive, avail, alloc +
             |         least(CASE WHEN avail - alloc > 0 AND ws > 0
             |                    THEN (r * 1) // ws ELSE 0 END,
             |               avail - alloc) AS alloc
             |       FROM a1 CROSS JOIN r1 CROSS JOIN u2),
             |r2 AS (SELECT r1.r - (SELECT sum(a2.alloc - a1.alloc)
             |                      FROM a2 JOIN a1 USING (source)) AS r
             |       FROM r1),
             |u3 AS (SELECT count(*) AS ws FROM a2 WHERE alloc < avail),
             |a3 AS (SELECT source, avail_naive, avail, alloc +
             |         least(CASE WHEN avail - alloc > 0 AND ws > 0
             |                    THEN (r * 1) // ws ELSE 0 END,
             |               avail - alloc) AS alloc
             |       FROM a2 CROSS JOIN r2 CROSS JOIN u3)
             |SELECT source, avail_naive, avail AS avail_dedup,
             |       avail_naive - avail AS dup_tokens,
             |       CASE WHEN avail_naive > 0
             |            THEN CAST(avail_naive - avail AS DOUBLE) / avail_naive
             |       END AS dup_frac,
             |       CAST(alloc AS BIGINT) AS alloc,
             |       alloc = avail AS saturated
             |FROM a3 ORDER BY source""".stripMargin)),

    // ------------------------------------------------------------------
    // C29 — sample-representativeness eval (the sampling family's
    // measurement face, closing the family-eval convention: every
    // screen family carries one): c1's deterministic md5 sample at 10%,
    // audited per source + pooled — n_corpus vs n_sample, the one-
    // division sample_rate, and the EXACT integer deviation
    // 100·n_sample − 10·n_corpus (zero = perfectly proportional). A
    // source whose ids correlated with the hash would surface here
    // before it silently skewed every downstream mixture face.
    Q(
      "c29_sample_representativeness",
      (s, dir) =>
        Curation.sampleRepresentativeness(
          Tables.documents(s, dir).select("doc_id", "source"),
          keepPct = 10, salt = "s1"),
      Some("""WITH f AS (SELECT source,
             |    CASE WHEN CAST(CAST('0x' || substr(md5('s1' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 AS BIGINT) < 10
             |         THEN 1 ELSE 0 END AS i
             |  FROM documents),
             |lv AS (SELECT source, CAST(count(*) AS BIGINT) AS n_corpus,
             |              CAST(sum(i) AS BIGINT) AS n_sample
             |       FROM f GROUP BY 1
             |       UNION ALL
             |       SELECT '__all', CAST(count(*) AS BIGINT),
             |              CAST(sum(i) AS BIGINT)
             |       FROM f)
             |SELECT source, n_corpus, n_sample,
             |       CAST(n_sample AS DOUBLE) / n_corpus AS sample_rate,
             |       100 * n_sample - 10 * n_corpus AS excess_per_100
             |FROM lv ORDER BY source""".stripMargin)),

    // ------------------------------------------------------------------
    // C29B — the c29 audit extended to the QUOTA, WEIGHTED, and
    // MIXTURE samplers (r14 verdict #6): one schema, three sampler
    // blocks — with c29's own flat-rate face this audits every sampler
    // in the family. The stratified rows audit c6's exact per-group
    // quota (expected = min(n, 5) BY CONSTRUCTION, so any nonzero
    // deviation is an implementation bug — this face proves the
    // sampler, not the estimator); the weighted rows audit c20's
    // per-row draw on its own 1/10000 grid (deviation = 10000·n_sample
    // − Σ floor(w·10⁴): exact integers, magnitude = hash luck per
    // source — c29's reading at grid 10⁴); the mixture rows audit c2's
    // per-source rates (expected = n·thr(source) exactly — constant
    // rate within a source). Every block re-runs the REAL sampler
    // (c6's heap top-k / c20's and c2's bucket compares), so the audit
    // exercises the deployed code paths, mirrored in DuckDB by the
    // same row_number ranking and bucket arithmetic the c6/c20/c2
    // oracles pin.
    Q(
      "c29b_sampler_audit",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val w = size(array_distinct(split(col("text"), " "))).cast("double") /
          size(split(col("text"), " "))
        Curation.stratifiedSampleAudit(docs,
            groupCol = "source", idCol = "doc_id", nPerGroup = 5, salt = "st")
          .unionByName(Curation.weightedSampleAudit(
            docs.withColumn("w", w),
            idCol = "doc_id", weightCol = "w", sourceCol = "source",
            salt = "ws"))
          .unionByName(Curation.mixtureSampleAudit(docs,
            sourceCol = "source", idCol = "doc_id",
            rates = mixtureRates, salt = "mix"))
          .orderBy("sampler", "grp")
      },
      Some(s"""WITH st AS (SELECT source AS grp, CAST(count(*) AS BIGINT) AS n_corpus
             |      FROM documents GROUP BY 1),
             |sel AS (SELECT source AS grp, CAST(count(*) AS BIGINT) AS n_sample FROM (
             |    SELECT source,
             |           row_number() OVER (PARTITION BY source
             |             ORDER BY md5('st' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
             |    FROM documents) WHERE rk <= 5 GROUP BY 1),
             |strat AS (
             |  SELECT 'stratified' AS sampler, st.grp, st.n_corpus,
             |         CAST(coalesce(sel.n_sample, 0) AS BIGINT) AS n_sample,
             |         CAST(1 AS BIGINT) AS grid,
             |         CAST(least(st.n_corpus, 5) AS BIGINT) AS expected_grid,
             |         CAST(coalesce(sel.n_sample, 0) - least(st.n_corpus, 5) AS BIGINT) AS deviation
             |  FROM st LEFT JOIN sel USING (grp)),
             |wf AS (SELECT source AS grp,
             |         CAST(floor(least(1.0, greatest(0.0,
             |              CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             |              / len(string_split(text, ' ')))) * 10000) AS BIGINT) AS thr,
             |         CAST('0x' || substr(md5('ws' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 10000 AS bucket
             |       FROM documents),
             |wt AS (
             |  SELECT 'weighted' AS sampler, grp,
             |         CAST(count(*) AS BIGINT) AS n_corpus,
             |         CAST(sum(CASE WHEN bucket < thr THEN 1 ELSE 0 END) AS BIGINT) AS n_sample,
             |         CAST(10000 AS BIGINT) AS grid,
             |         CAST(sum(thr) AS BIGINT) AS expected_grid,
             |         CAST(10000 * sum(CASE WHEN bucket < thr THEN 1 ELSE 0 END) - sum(thr) AS BIGINT) AS deviation
             |  FROM wf GROUP BY 2),
             |mf AS (SELECT source AS grp,
             |         CAST(CASE source ${mixtureCasesSql} ELSE 0 END AS BIGINT) AS thr,
             |         CAST('0x' || substr(md5('mix' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 10000 AS bucket
             |       FROM documents),
             |mt AS (
             |  SELECT 'mixture' AS sampler, grp,
             |         CAST(count(*) AS BIGINT) AS n_corpus,
             |         CAST(sum(CASE WHEN bucket < thr THEN 1 ELSE 0 END) AS BIGINT) AS n_sample,
             |         CAST(10000 AS BIGINT) AS grid,
             |         CAST(sum(thr) AS BIGINT) AS expected_grid,
             |         CAST(10000 * sum(CASE WHEN bucket < thr THEN 1 ELSE 0 END) - sum(thr) AS BIGINT) AS deviation
             |  FROM mf GROUP BY 2)
             |SELECT sampler, grp, n_corpus, n_sample, grid, expected_grid, deviation
             |FROM (SELECT * FROM strat UNION ALL SELECT * FROM wt
             |      UNION ALL SELECT * FROM mt)
             |ORDER BY sampler, grp""".stripMargin)),

    // ------------------------------------------------------------------
    // C26 — water-filling mixture allocation (the PLANNING face of the
    // mixture samplers): 40% of the corpus's tokens split uniformly
    // across the 20 sources, availability-capped, with freed budget
    // redistributed over 3 pinned rounds (the g4/g6 fixed-round pattern
    // — integer floor shares, so both engines agree bit-for-bit). Small
    // sources saturate; the slack flows to the big ones.
    Q(
      "c26_mixture_waterfill",
      (s, dir) => {
        val av = Tables.documents(s, dir)
          .filter(col("text").isNotNull)
          .select(col("source"),
            size(TextFunctions.tokens(col("text"))).cast("long").as("__t"))
          .groupBy("source").agg(sum(col("__t")).as("avail"))
          .withColumn("w", lit(1L))
        val budget = av.agg(expr("sum(avail) * 2 div 5").as("budget"))
        Curation.waterfillAllocation(av, budget, rounds = 3)
          .orderBy("source")
      },
      Some("""WITH av AS (SELECT source,
             |         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS avail
             |       FROM documents WHERE text IS NOT NULL GROUP BY 1),
             |b AS (SELECT (sum(avail) * 2) // 5 AS r FROM av),
             |u1 AS (SELECT count(*) AS ws FROM av WHERE avail > 0),
             |a1 AS (SELECT source, avail,
             |         least(CASE WHEN avail > 0 AND ws > 0
             |                    THEN (r * 1) // ws ELSE 0 END, avail) AS alloc
             |       FROM av CROSS JOIN b CROSS JOIN u1),
             |r1 AS (SELECT b.r - (SELECT sum(alloc) FROM a1) AS r FROM b),
             |u2 AS (SELECT count(*) AS ws FROM a1 WHERE alloc < avail),
             |a2 AS (SELECT source, avail, alloc +
             |         least(CASE WHEN avail - alloc > 0 AND ws > 0
             |                    THEN (r * 1) // ws ELSE 0 END,
             |               avail - alloc) AS alloc
             |       FROM a1 CROSS JOIN r1 CROSS JOIN u2),
             |r2 AS (SELECT r1.r - (SELECT sum(a2.alloc - a1.alloc)
             |                      FROM a2 JOIN a1 USING (source)) AS r
             |       FROM r1),
             |u3 AS (SELECT count(*) AS ws FROM a2 WHERE alloc < avail),
             |a3 AS (SELECT source, avail, alloc +
             |         least(CASE WHEN avail - alloc > 0 AND ws > 0
             |                    THEN (r * 1) // ws ELSE 0 END,
             |               avail - alloc) AS alloc
             |       FROM a2 CROSS JOIN r2 CROSS JOIN u3)
             |SELECT source, avail, CAST(1 AS BIGINT) AS w,
             |       CAST(alloc AS BIGINT) AS alloc,
             |       alloc = avail AS saturated
             |FROM a3 ORDER BY source""".stripMargin)),

    // ------------------------------------------------------------------
    // C2 — mixture weighting: each source down-sampled to its recipe rate
    // (0/25/50/75/100% across src0..src19), decided by the same
    // deterministic hash at 1/10000 resolution. Thresholds are integers on
    // both sides — no float comparison anywhere.
    Q(
      "c2_mixture_sample",
      (s, dir) =>
        Curation.mixtureSample(Tables.documents(s, dir),
          sourceCol = "source", idCol = "doc_id",
          rates = mixtureRates, salt = "mix")
          .select("doc_id", "source")
          .orderBy("doc_id"),
      Some {
        val cases = mixtureRates.toSeq.sortBy(_._1).map { case (src, rate) =>
          s"WHEN '$src' THEN ${(rate * 10000).toInt}"
        }.mkString("\n           ")
        s"""SELECT doc_id, source FROM (
           |  SELECT doc_id, source,
           |         CAST(CAST('0x' || substr(md5('mix' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 10000 AS BIGINT) AS bucket,
           |         CASE source
           |           $cases
           |           ELSE 0 END AS thr
           |  FROM documents)
           |WHERE bucket < thr ORDER BY doc_id""".stripMargin
      }),

    // ------------------------------------------------------------------
    // C3 — concat-and-chunk sequence packing: every document's placement in
    // the fixed-length token stream of its shard (= source), as one window
    // cumsum per shard. The layout step between curation and tokenization.
    Q(
      "c3_pack_sequences",
      (s, dir) =>
        Curation.packSequences(
          Tables.documents(s, dir)
            .select(col("doc_id"), col("source"),
              TextFunctions.nTokens(col("text")).as("n_tokens")),
          shardCol = "source", orderCol = "doc_id",
          nTokensCol = "n_tokens", seqLen = SeqLen)
          .select("doc_id", "source", "n_tokens", "start_tok",
            "first_seq", "tok_offset", "end_seq")
          .orderBy("doc_id"),
      Some(s"""WITH t AS (SELECT doc_id, source,
             |                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
             |           FROM documents),
             |p AS (SELECT doc_id, source, n_tokens,
             |             CAST(COALESCE(SUM(n_tokens) OVER (
             |               PARTITION BY source ORDER BY doc_id
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
             |      FROM t)
             |SELECT doc_id, source, n_tokens, start_tok,
             |       CAST(floor(start_tok / $SeqLen) AS BIGINT) AS first_seq,
             |       start_tok % $SeqLen AS tok_offset,
             |       CAST(floor((start_tok + n_tokens - 1) / $SeqLen) AS BIGINT) AS end_seq
             |FROM p ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // C5 — the tokenizer-facing contract: every document exploded across
    // the sequences it occupies, with the half-open [tok_start, tok_end)
    // slice per sequence. Oracle = the c3 placement SQL + a range() unnest.
    Q(
      "c5_packed_sequences",
      (s, dir) =>
        Curation.packedSequences(
          Tables.documents(s, dir)
            .select(col("doc_id"), col("source"),
              TextFunctions.nTokens(col("text")).as("n_tokens")),
          shardCol = "source", orderCol = "doc_id",
          nTokensCol = "n_tokens", seqLen = SeqLen)
          .select("doc_id", "source", "seq_id", "tok_start", "tok_end")
          .orderBy("doc_id", "seq_id"),
      Some(s"""WITH t AS (SELECT doc_id, source,
             |                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
             |           FROM documents),
             |p AS (SELECT doc_id, source, n_tokens,
             |             CAST(COALESCE(SUM(n_tokens) OVER (
             |               PARTITION BY source ORDER BY doc_id
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
             |      FROM t),
             |q AS (SELECT doc_id, source, n_tokens, start_tok,
             |             CAST(floor(start_tok / $SeqLen) AS BIGINT) AS first_seq,
             |             start_tok % $SeqLen AS tok_offset,
             |             CAST(floor((start_tok + n_tokens - 1) / $SeqLen) AS BIGINT) AS end_seq
             |      FROM p WHERE n_tokens > 0),
             |u AS (SELECT doc_id, source, n_tokens, start_tok, first_seq, tok_offset, end_seq,
             |             unnest(range(first_seq, end_seq + 1)) AS seq_id
             |      FROM q)
             |SELECT doc_id, source, seq_id,
             |       CASE WHEN seq_id = first_seq THEN tok_offset ELSE 0 END AS tok_start,
             |       CASE WHEN seq_id = end_seq THEN (start_tok + n_tokens - 1) % $SeqLen + 1
             |            ELSE $SeqLen END AS tok_end
             |FROM u ORDER BY doc_id, seq_id""".stripMargin)),

    // ------------------------------------------------------------------
    // C4 — eval-set decontamination: flag every corpus doc sharing an
    // 8-token shingle with the eval set (doc_id % 97 == 0). The natural
    // corpus has no cross-doc 8-grams at these SFs, so contaminated copies
    // are injected (every 50th doc + the first 8 tokens of eval doc 0) the
    // same way the near-dup queries inject their scenario. Eval shingles
    // broadcast; the corpus is scanned once.
    Q(
      "c4_decontaminate",
      (s, dir) => decontaminateScenario(s, dir, broadcastEval = true),
      Some(decontaminateOracle)),

    // ------------------------------------------------------------------
    // C4b — same scenario through the SHUFFLE fallback (broadcastEval =
    // false): both sides reduced to xxhash64(shingle) and met in a
    // shuffled semi-join — the path for an eval side too big to
    // broadcast. Same oracle as c4: the fallback must be
    // result-invisible.
    Q(
      "c4b_decontaminate_shuffle",
      (s, dir) => decontaminateScenario(s, dir, broadcastEval = false),
      Some(decontaminateOracle)),

    // ------------------------------------------------------------------
    // C4d — bloom-sketch decontamination: the regime between c4
    // (broadcast rows) and c4b (full shuffled semi-join) — eval hashes
    // broadcast as a SKETCH, corpus prefiltered map-side, survivors
    // exact-confirmed. No false negatives + confirm join ⇒ result
    // identical to c4/c4b, so the same exact oracle gates it.
    Q(
      "c4d_decontaminate_bloom",
      (s, dir) => {
        val (corpus, eval) = decontaminateInputs(s, dir)
        Curation.decontaminateBloom(corpus, eval, n = 8)
          .select("doc_id", "contaminated")
          .orderBy("doc_id")
      },
      Some(decontaminateOracle))
  ) ++ tailQueries

  /** The shared c4/c4b scenario: the natural corpus has no cross-doc
    * 8-grams at these SFs, so contaminated copies are injected (every 50th
    * doc + the first 8 tokens of eval doc 0), same style as the near-dup
    * queries' injection.
    */
  private def decontaminateScenario(
      s: org.apache.spark.sql.SparkSession, dir: String,
      broadcastEval: Boolean): org.apache.spark.sql.DataFrame = {
    val (corpus, eval) = decontaminateInputs(s, dir)
    Curation.decontaminate(corpus, eval, n = 8, broadcastEval = broadcastEval)
      .select("doc_id", "contaminated")
      .orderBy("doc_id")
  }

  // lazy: referenced by `all`, which initializes first in declaration order
  // — a strict val here would still be null at capture time.
  private lazy val decontaminateOracle =
    """WITH d AS (SELECT doc_id, text FROM documents),
             |probe AS (SELECT array_to_string((string_split(text, ' '))[1:8], ' ') AS p
             |          FROM d WHERE doc_id = 0),
             |inj AS (SELECT -doc_id - 1 AS doc_id,
             |               text || ' ' || (SELECT p FROM probe) AS text
             |        FROM d WHERE doc_id % 50 = 0 AND doc_id <> 0),
             |corpus AS (SELECT * FROM d UNION ALL SELECT * FROM inj),
             |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
             |         range(len(string_split(text, ' ')) - 7),
             |         i -> array_to_string((string_split(text, ' '))[i+1:i+8], ' ')))) AS shingle
             |       FROM corpus WHERE len(string_split(text, ' ')) >= 8),
             |ev AS (SELECT DISTINCT shingle FROM sh
             |       WHERE doc_id % 97 = 0 AND doc_id >= 0),
             |hit AS (SELECT DISTINCT doc_id FROM sh
             |        WHERE shingle IN (SELECT shingle FROM ev))
             |SELECT c.doc_id, (hit.doc_id IS NOT NULL) AS contaminated
             |FROM corpus c LEFT JOIN hit ON c.doc_id = hit.doc_id
             |ORDER BY c.doc_id""".stripMargin

  private lazy val tailQueries: Seq[Q] = Seq(
    // ------------------------------------------------------------------
    // C6 — stratified sampling with exact per-group quotas: the 5
    // hash-smallest docs per source, ranked. Bounded-heap top-k aggregate
    // per group (never a row_number window over the whole group); DuckDB's
    // row_number over the same md5 order is the oracle.
    Q(
      "c6_stratified_sample",
      (s, dir) =>
        Curation.stratifiedSample(Tables.documents(s, dir),
          groupCol = "source", idCol = "doc_id", nPerGroup = 5, salt = "st")
          .orderBy("source", "rk"),
      Some("""SELECT source, doc_id, rk FROM (
             |  SELECT source, doc_id,
             |         row_number() OVER (PARTITION BY source
             |           ORDER BY md5('st' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
             |  FROM documents)
             |WHERE rk <= 5 ORDER BY source, rk""".stripMargin)),

    // ------------------------------------------------------------------
    // T10 — TF-IDF top terms per document (rational idf N/df: identical
    // top-k and ordering to the log form for fixed N, but bit-exact across
    // engines — ln() differs in the last ulp between libms). Top-3 per
    // doc, ties broken by term; DuckDB computes the identical division.
    Q(
      "t10_tfidf_top_terms",
      (s, dir) =>
        TfIdf.topTerms(Tables.documents(s, dir), k = 3)
          .orderBy("doc_id", "rk"),
      Some("""WITH tf AS (
             |  SELECT doc_id, term, count(*) AS tf FROM (
             |    SELECT doc_id, unnest(string_split(text, ' ')) AS term
             |    FROM documents) GROUP BY 1, 2),
             |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
             |n AS (SELECT count(*) AS n_docs FROM documents),
             |scored AS (
             |  SELECT doc_id, term, tf.tf, df.df,
             |         CAST(tf.tf * n.n_docs AS DOUBLE) / df.df AS score
             |  FROM tf JOIN df USING (term) CROSS JOIN n),
             |ranked AS (
             |  SELECT doc_id, term, tf, df, score,
             |         row_number() OVER (PARTITION BY doc_id
             |           ORDER BY score DESC, term) AS rk
             |  FROM scored)
             |SELECT doc_id, rk, term, tf, df, score
             |FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin)),

    // ------------------------------------------------------------------
    // T8 — Gopher-style repetition signals over word bigrams: duplicate
    // fraction and top-gram share per document. Explode + two map-side-
    // combined aggregations; only (id, gram) pre-counts cross the shuffle.
    Q(
      "t8_repetition_signals",
      (s, dir) =>
        Curation.repetitionSignals(Tables.documents(s, dir), n = 2)
          .select("doc_id", "n_grams", "n_distinct_grams", "top_gram_count",
            "dup_gram_frac", "top_gram_frac")
          .orderBy("doc_id"),
      Some("""WITH g AS (SELECT doc_id, unnest(list_transform(
             |         range(len(string_split(text, ' ')) - 1),
             |         i -> array_to_string((string_split(text, ' '))[i+1:i+2], ' '))) AS gram
             |       FROM documents WHERE len(string_split(text, ' ')) >= 2),
             |pc AS (SELECT doc_id, gram, count(*) AS n FROM g GROUP BY 1, 2),
             |sig AS (SELECT doc_id,
             |               CAST(sum(n) AS BIGINT) AS n_grams,
             |               count(*) AS n_distinct_grams,
             |               CAST(max(n) AS BIGINT) AS top_gram_count
             |        FROM pc GROUP BY 1)
             |SELECT doc_id, n_grams, n_distinct_grams, top_gram_count,
             |       CAST(1.0 - CAST(n_distinct_grams AS DOUBLE) / n_grams AS DOUBLE) AS dup_gram_frac,
             |       CAST(top_gram_count AS DOUBLE) / n_grams AS top_gram_frac
             |FROM sig ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // T9 — PII scrubbing: emails, IPv4s, and phone-shaped digit runs masked
    // by a codegen'd regexp_replace chain. The corpus text carries no PII,
    // so each row synthesizes a deterministic contact line from its id;
    // both engines scrub the identical string with the identical patterns.
    Q(
      "t9_pii_scrub",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"),
            concat(
              substring(col("text"), 1, 40),
              lit(" contact user"), col("doc_id"),
              lit("@example.com or 555-01"),
              lpad((col("doc_id") % 100).cast("string"), 2, "0"),
              lit(" ip 10.0."), col("doc_id") % 256, lit(".1 end")).as("raw"))
          .select(col("doc_id"), Curation.scrubPii(col("raw")).as("scrubbed"))
          .orderBy("doc_id"),
      Some(s"""WITH synth AS (SELECT doc_id,
             |    substr(text, 1, 40) || ' contact user' || CAST(doc_id AS VARCHAR)
             |    || '@example.com or 555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
             |    || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1 end' AS raw
             |  FROM documents)
             |SELECT doc_id,
             |       regexp_replace(regexp_replace(regexp_replace(raw,
             |         '${Curation.emailPattern}', '<EMAIL>', 'g'),
             |         '${Curation.ipPattern}', '<IP>', 'g'),
             |         '${Curation.phonePattern}', '<PHONE>', 'g') AS scrubbed
             |FROM synth ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // C7 — token-budget mixture with epochs: rates above 1.0 up-weight a
    // source by emitting whole-epoch repeats plus a deterministic
    // fractional keep (2.8 = twice + an 80% third copy), each repeat
    // tagged with its epoch index. One scan + a bounded generator explode,
    // no shuffle; DuckDB computes identical repetition counts from the
    // same md5 grid.
    Q(
      "c7_mixture_epochs",
      (s, dir) =>
        Curation.mixtureSampleEpochs(Tables.documents(s, dir),
          sourceCol = "source", idCol = "doc_id",
          rates = epochRates, salt = "ep")
          .select("doc_id", "source", "epoch")
          .orderBy("doc_id", "epoch"),
      Some {
        val cases = epochRates.toSeq.sortBy(_._1).map { case (src, rate) =>
          s"WHEN '$src' THEN ${(rate * 10000).toInt}"
        }.mkString("\n           ")
        s"""SELECT doc_id, source, epoch FROM (
           |  SELECT doc_id, source, unnest(range(reps)) AS epoch FROM (
           |    SELECT doc_id, source,
           |           (tot // 10000)
           |             + CASE WHEN CAST(CAST('0x' || substr(md5('ep' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 10000 AS BIGINT) < tot % 10000
           |                    THEN 1 ELSE 0 END AS reps
           |    FROM (SELECT doc_id, source,
           |                 CASE source
           |           $cases
           |           ELSE 0 END AS tot
           |          FROM documents)
           |    ) WHERE reps > 0)
           |ORDER BY doc_id, epoch""".stripMargin
      }),

    // ------------------------------------------------------------------
    // C8 — deterministic corpus shuffle: the global training-order step
    // after curation. shuffle_key = md5(salt || id) defines a reproducible
    // total order; shard = the key's top 32 bits scaled to the shard
    // count, so shards are contiguous slices of that order and reading
    // them in index order replays the exact shuffled sequence.
    Q(
      "c8_corpus_shuffle",
      (s, dir) =>
        Curation.deterministicShuffle(Tables.documents(s, dir),
          idCol = "doc_id", salt = "sh", nShards = 8)
          .select("doc_id", "shuffle_key", "shard")
          .orderBy("shuffle_key"),
      Some("""SELECT doc_id, shuffle_key,
             |       CAST(floor(CAST(CAST('0x' || substr(shuffle_key, 1, 8) AS BIGINT) * 8 AS DOUBLE) / 4294967296) AS INTEGER) AS shard
             |FROM (SELECT doc_id, md5('sh' || CAST(doc_id AS VARCHAR)) AS shuffle_key
             |      FROM documents)
             |ORDER BY shuffle_key""".stripMargin)),

    // ------------------------------------------------------------------
    // C4c — span-granular decontamination: which n-token windows of which
    // corpus docs overlap the eval set — the excision listing (drop
    // [pos, pos+8) instead of the whole document). Same injected scenario
    // as c4; every injected doc must surface its probe's position.
    Q(
      "c4c_contaminated_spans",
      (s, dir) => {
        val (corpus, eval) = decontaminateInputs(s, dir)
        Curation.contaminatedSpans(corpus, eval, n = 8)
          .orderBy("doc_id", "pos")
      },
      Some("""WITH d AS (SELECT doc_id, text FROM documents),
             |probe AS (SELECT array_to_string((string_split(text, ' '))[1:8], ' ') AS p
             |          FROM d WHERE doc_id = 0),
             |inj AS (SELECT -doc_id - 1 AS doc_id,
             |               text || ' ' || (SELECT p FROM probe) AS text
             |        FROM d WHERE doc_id % 50 = 0 AND doc_id <> 0),
             |corpus AS (SELECT * FROM d UNION ALL SELECT * FROM inj),
             |sh AS (SELECT doc_id, i AS pos,
             |              array_to_string(w[i+1:i+8], ' ') AS shingle
             |       FROM (SELECT doc_id, string_split(text, ' ') AS w,
             |                    unnest(range(len(string_split(text, ' ')) - 7)) AS i
             |             FROM corpus WHERE len(string_split(text, ' ')) >= 8)),
             |ev AS (SELECT DISTINCT shingle FROM sh
             |       JOIN (SELECT doc_id FROM d WHERE doc_id % 97 = 0) e USING (doc_id)),
             |hits AS (SELECT doc_id, pos FROM sh
             |         WHERE shingle IN (SELECT shingle FROM ev))
             |SELECT doc_id, pos FROM hits ORDER BY doc_id, pos""".stripMargin)),

    // ------------------------------------------------------------------
    // C9 — token-budget trimming: each source keeps its md5-ordered
    // document prefix until 1,000 tokens are spent. The bucketed
    // two-phase cumsum (bucket = the order key's own first byte) must be
    // row-identical to the oracle's single global window per source.
    Q(
      "c9_token_budget",
      (s, dir) =>
        Curation.tokenBudgetTrim(
          Tables.documents(s, dir)
            .select(col("source"), col("doc_id"),
              TextFunctions.nTokens(col("text")).as("n_tokens")),
          sourceCol = "source", idCol = "doc_id",
          nTokensCol = "n_tokens", budget = 1000L, salt = "tb")
          .select("source", "doc_id", "order_key", "n_tokens", "cum_tokens")
          .orderBy("source", "order_key"),
      Some("""WITH d AS (SELECT source, doc_id,
             |                  md5('tb' || CAST(doc_id AS VARCHAR)) AS order_key,
             |                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
             |           FROM documents),
             |c AS (SELECT source, doc_id, order_key, n_tokens,
             |             CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY order_key
             |                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
             |      FROM d)
             |SELECT source, doc_id, order_key, n_tokens, cum_tokens
             |FROM c WHERE cum_tokens <= 1000
             |ORDER BY source, order_key""".stripMargin)),

    // ------------------------------------------------------------------
    // C15 — packing efficiency: per shard, sequences emitted and padding
    // paid by the c3 layout at this seqLen — ceil/multiply arithmetic
    // identical in both engines.
    Q(
      "c15_packing_stats",
      (s, dir) =>
        Curation.packingStats(
          Tables.documents(s, dir)
            .select(col("source"), TextFunctions.nTokens(col("text")).as("n_tokens")),
          shardCol = "source", nTokensCol = "n_tokens", seqLen = SeqLen)
          .orderBy("source"),
      Some(s"""SELECT source, count(*) AS n_docs,
             |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
             |       CAST(ceil(CAST(sum(len(string_split(text, ' '))) AS DOUBLE) / $SeqLen) AS BIGINT) AS n_seqs,
             |       CAST(ceil(CAST(sum(len(string_split(text, ' '))) AS DOUBLE) / $SeqLen) AS BIGINT) * $SeqLen
             |         - CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS pad_tokens,
             |       CAST(CAST(ceil(CAST(sum(len(string_split(text, ' '))) AS DOUBLE) / $SeqLen) AS BIGINT) * $SeqLen
             |              - sum(len(string_split(text, ' '))) AS DOUBLE)
             |         / (CAST(ceil(CAST(sum(len(string_split(text, ' '))) AS DOUBLE) / $SeqLen) AS BIGINT) * $SeqLen) AS pad_frac
             |FROM documents GROUP BY source
             |ORDER BY source""".stripMargin)),

    // ------------------------------------------------------------------
    // C9b — token budgets per SOURCE (the real recipe shape): src<i> gets
    // (i%4)*500 tokens — including 0 (source dropped) — via the same
    // map-literal resolution as the mixture rates. Oracle budgets come
    // from the identical Scala map rendered as a CASE.
    Q(
      "c9b_token_budget_per_source",
      (s, dir) =>
        Curation.tokenBudgetTrim(
          Tables.documents(s, dir)
            .select(col("source"), col("doc_id"),
              TextFunctions.nTokens(col("text")).as("n_tokens")),
          sourceCol = "source", idCol = "doc_id",
          nTokensCol = "n_tokens", budgets = sourceBudgets, salt = "tb")
          .select("source", "doc_id", "order_key", "n_tokens", "cum_tokens")
          .orderBy("source", "order_key"),
      Some(s"""WITH d AS (SELECT source, doc_id,
             |                  md5('tb' || CAST(doc_id AS VARCHAR)) AS order_key,
             |                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
             |           FROM documents),
             |c AS (SELECT source, doc_id, order_key, n_tokens,
             |             CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY order_key
             |                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
             |      FROM d)
             |SELECT source, doc_id, order_key, n_tokens, cum_tokens
             |FROM c WHERE cum_tokens <= $sourceBudgetCase
             |ORDER BY source, order_key""".stripMargin)),

    // ------------------------------------------------------------------
    // C10 — per-source quality floor: drop each source's worst quartile by
    // type-token ratio. Per-source thresholds (tiny aggregate, broadcast
    // back) rather than one global cutoff; interpolated percentile matches
    // DuckDB's quantile_cont exactly (the q26 pattern).
    Q(
      "c10_quality_floor",
      (s, dir) =>
        Curation.qualityFloor(
          Tables.documents(s, dir)
            .select(col("source"), col("doc_id"),
              TextFunctions.distinctRatio(col("text")).as("distinct_ratio")),
          sourceCol = "source", scoreCol = "distinct_ratio", q = 0.25)
          .select("source", "doc_id", "distinct_ratio", "source_threshold")
          .orderBy("source", "doc_id"),
      Some("""WITH sc AS (SELECT source, doc_id,
             |                   CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
             |                     / len(string_split(text,' ')) AS distinct_ratio
             |            FROM documents),
             |thr AS (SELECT source, quantile_cont(distinct_ratio, 0.25) AS source_threshold
             |        FROM sc GROUP BY 1)
             |SELECT sc.source, sc.doc_id, sc.distinct_ratio, thr.source_threshold
             |FROM sc JOIN thr USING (source)
             |WHERE sc.distinct_ratio >= thr.source_threshold
             |ORDER BY sc.source, sc.doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // C11 — contiguous global positions in deterministic hash order: the
    // scalable zipWithIndex. The bucketed two-phase numbering must equal
    // the oracle's single global row_number exactly.
    Q(
      "c11_global_positions",
      (s, dir) =>
        Curation.globalPositions(
          Tables.documents(s, dir).select("doc_id"), idCol = "doc_id", salt = "gp")
          .select("doc_id", "order_key", "pos")
          .orderBy("pos"),
      Some("""SELECT doc_id, order_key,
             |       row_number() OVER (ORDER BY order_key) - 1 AS pos
             |FROM (SELECT doc_id, md5('gp' || CAST(doc_id AS VARCHAR)) AS order_key
             |      FROM documents)
             |ORDER BY pos""".stripMargin)),

    // ------------------------------------------------------------------
    // Q32 — Z-order layout: lineitem clustered by the Morton interleave of
    // (l_partkey, l_suppkey), sharded on fixed z-domain slices. Every bit
    // of the interleave and every shard boundary is recomputed by the
    // oracle — the layout is deterministic arithmetic, not sampled ranges.
    Q(
      "q32_zorder_layout",
      (s, dir) =>
        ZOrder.layout(
          Tables.lineitem(s, dir)
            .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
          xCol = "l_partkey", yCol = "l_suppkey", nShards = 16)
          .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
            "zval", "zshard")
          .orderBy("zval", "l_orderkey", "l_linenumber"),
      Some(s"""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
             |       ${ZOrder.zvalueSql("l_partkey", "l_suppkey")} AS zval,
             |       CAST(floor(CAST(${ZOrder.zvalueSql("l_partkey", "l_suppkey")} AS DOUBLE)
             |                  * 16 / 4294967296) AS INTEGER) AS zshard
             |FROM lineitem
             |ORDER BY zval, l_orderkey, l_linenumber""".stripMargin)),

    // ------------------------------------------------------------------
    // Q33 — interval coalescing: every event opens a 30-minute activity
    // window per user; overlapping/adjacent windows merge into maximal
    // availability spans (the islands scan). The oracle recomputes heads,
    // islands, and spans with DuckDB window functions.
    Q(
      "q33_interval_merge",
      (s, dir) => {
        val iv = Tables.events(s, dir)
          .select(col("user_id"), unix_micros(col("ts")).as("s_us"))
          .withColumn("e_us", col("s_us") + Micros30m)
        IntervalMerge.merge(iv, Seq("user_id"), "s_us", "e_us")
          .select("user_id", "span_start", "span_end", "n_merged")
          .orderBy("user_id", "span_start")
      },
      Some(s"""WITH iv AS (SELECT user_id, epoch_us(ts) AS s,
             |                   epoch_us(ts) + $Micros30m AS e
             |            FROM events),
             |h AS (SELECT user_id, s, e,
             |        CASE WHEN s > coalesce(max(e) OVER (
             |               PARTITION BY user_id ORDER BY s, e
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |               -9223372036854775808)
             |             THEN 1 ELSE 0 END AS head
             |      FROM iv),
             |i AS (SELECT user_id, s, e, sum(head) OVER (
             |        PARTITION BY user_id ORDER BY s, e
             |        ROWS UNBOUNDED PRECEDING) AS island
             |      FROM h)
             |SELECT user_id, min(s) AS span_start, max(e) AS span_end,
             |       count(*) AS n_merged
             |FROM i GROUP BY user_id, island
             |ORDER BY user_id, span_start""".stripMargin)),

    // ------------------------------------------------------------------
    // Q34 — table diff: today's run (rows dropped, quantities bumped,
    // rows appended) reconciled against yesterday's — added/removed/
    // changed with the differing columns named. DuckDB's FULL OUTER JOIN
    // with IS DISTINCT FROM recomputes the classification exactly.
    Q(
      "q34_table_diff",
      (s, dir) => {
        val (old, cur) = diffFixture(s, dir)
        TableDiff.diff(old, cur, Seq("l_orderkey", "l_linenumber"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some(s"""$diffSqlCte
             |SELECT l_orderkey, l_linenumber, diff_status, changed_columns
             |FROM j WHERE diff_status <> 'unchanged'
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ------------------------------------------------------------------
    // Q34b — the hash form of the same reconciliation: only (keys, 8-byte
    // payload hash) cross the shuffle, classification must be identical.
    Q(
      "q34b_table_diff_hash",
      (s, dir) => {
        val (old, cur) = diffFixture(s, dir)
        TableDiff.hashDiff(old, cur, Seq("l_orderkey", "l_linenumber"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some(s"""$diffSqlCte
             |SELECT l_orderkey, l_linenumber, diff_status
             |FROM j WHERE diff_status <> 'unchanged'
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ------------------------------------------------------------------
    // C14 — per-source winsorization: document lengths clipped to each
    // source's [p05, p95] band — outliers pinned to the band edge, rows
    // kept (vs c10's floor, which drops). Interpolated percentile matches
    // quantile_cont exactly (the q26 pattern).
    Q(
      "c14_winsorize",
      (s, dir) =>
        Curation.winsorize(
          Tables.documents(s, dir).select("source", "doc_id", "n_chars"),
          sourceCol = "source", valueCol = "n_chars", lo = 0.05, hi = 0.95)
          .select("source", "doc_id", "n_chars", "band_lo", "band_hi", "n_chars_clipped")
          .orderBy("source", "doc_id"),
      Some("""WITH bands AS (SELECT source,
             |                      quantile_cont(n_chars, 0.05) AS band_lo,
             |                      quantile_cont(n_chars, 0.95) AS band_hi
             |               FROM documents GROUP BY 1)
             |SELECT d.source, d.doc_id, d.n_chars, b.band_lo, b.band_hi,
             |       greatest(b.band_lo, least(b.band_hi, CAST(d.n_chars AS DOUBLE))) AS n_chars_clipped
             |FROM documents d JOIN bands b USING (source)
             |ORDER BY d.source, d.doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // C27 — robust per-source outlier labels: |n_chars − median| > 3·MAD
    // (the Hampel test) — c14 CLIPS the tails, this FLAGS them for the
    // triage report, and median/MAD shrug off exactly the heavy tails
    // that poison mean±3σ. Two per-source aggregates broadcast over one
    // scan; interpolated percentile ≡ quantile_cont (the q26 pattern), so
    // the boolean is engine-exact.
    Q(
      "c27_mad_outliers",
      (s, dir) =>
        Curation.madOutliers(
          Tables.documents(s, dir).select("source", "doc_id", "n_chars"),
          sourceCol = "source", valueCol = "n_chars")
          .select("source", "doc_id", "n_chars", "med", "mad", "is_outlier")
          .orderBy("source", "doc_id"),
      Some("""WITH med AS (SELECT source, quantile_cont(n_chars, 0.5) AS med
             |             FROM documents GROUP BY 1),
             |dev AS (SELECT d.source, d.doc_id, d.n_chars, m.med,
             |               abs(d.n_chars - m.med) AS adev
             |        FROM documents d JOIN med m USING (source)),
             |mad AS (SELECT source, quantile_cont(adev, 0.5) AS mad
             |        FROM dev GROUP BY 1)
             |SELECT d.source, d.doc_id, d.n_chars, d.med, a.mad,
             |       d.adev > 3.0 * a.mad AS is_outlier
             |FROM dev d JOIN mad a USING (source)
             |ORDER BY d.source, d.doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // Q38 — data-quality gate: not-null / range / pattern / uniqueness
    // expectations over an orders variant with injected violations (null
    // statuses, negated prices, malformed priorities, duplicated keys).
    // All row-local rules share ONE pass; uniqueness counts excess rows.
    Q(
      "q38_quality_gate",
      (s, dir) => {
        val base = Tables.orders(s, dir)
          .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
        val dirty = base
          .withColumn("o_orderstatus",
            when(col("o_orderkey") % 97 === 0, lit(null: String))
              .otherwise(col("o_orderstatus")))
          .withColumn("o_totalprice",
            when(col("o_orderkey") % 101 === 0, -col("o_totalprice"))
              .otherwise(col("o_totalprice")))
          .withColumn("o_orderpriority",
            when(col("o_orderkey") % 83 === 0, lit("9-BAD!"))
              .otherwise(col("o_orderpriority")))
          .unionByName(base.filter(col("o_orderkey") % 89 === 0))
        Expectations.check(dirty,
          notNull = Seq(Expectations.NotNull("o_orderstatus")),
          inRange = Seq(Expectations.InRange("o_totalprice", 0.0, 999999.0)),
          matches = Seq(Expectations.Matches("o_orderpriority", "^[1-5]-")),
          unique = Seq(Expectations.Unique(Seq("o_orderkey"))))
          .orderBy("rule")
      },
      Some("""WITH base AS (SELECT o_orderkey, o_custkey, o_orderstatus,
             |                     o_totalprice, o_orderpriority FROM orders),
             |dirty0 AS (SELECT o_orderkey, o_custkey,
             |                  CASE WHEN o_orderkey % 97 = 0 THEN NULL ELSE o_orderstatus END AS o_orderstatus,
             |                  CASE WHEN o_orderkey % 101 = 0 THEN -o_totalprice ELSE o_totalprice END AS o_totalprice,
             |                  CASE WHEN o_orderkey % 83 = 0 THEN '9-BAD!' ELSE o_orderpriority END AS o_orderpriority
             |           FROM base),
             |dirty AS (SELECT * FROM dirty0
             |          UNION ALL
             |          SELECT * FROM base WHERE o_orderkey % 89 = 0)
             |SELECT 'not_null(o_orderstatus)' AS rule,
             |       CAST(coalesce(sum(CASE WHEN o_orderstatus IS NULL THEN 1 END), 0) AS BIGINT) AS n_violations
             |FROM dirty
             |UNION ALL
             |SELECT 'in_range(o_totalprice, 0.0, 999999.0)',
             |       CAST(coalesce(sum(CASE WHEN o_totalprice IS NOT NULL
             |                               AND (o_totalprice < 0.0 OR o_totalprice > 999999.0)
             |                              THEN 1 END), 0) AS BIGINT)
             |FROM dirty
             |UNION ALL
             |SELECT 'matches(o_orderpriority)',
             |       CAST(coalesce(sum(CASE WHEN o_orderpriority IS NOT NULL
             |                               AND NOT regexp_matches(o_orderpriority, '^[1-5]-')
             |                              THEN 1 END), 0) AS BIGINT)
             |FROM dirty
             |UNION ALL
             |SELECT 'unique(o_orderkey)',
             |       (SELECT CAST(coalesce(sum(n - 1), 0) AS BIGINT)
             |        FROM (SELECT o_orderkey, count(*) AS n FROM dirty GROUP BY 1)
             |        WHERE n > 1)
             |ORDER BY rule""".stripMargin)),

    // ------------------------------------------------------------------
    // G1 — fixed-point PageRank, 5 power iterations over a deterministic
    // 1000-node graph (3 arithmetic out-edges per node, duplicates
    // dropped). Integer mass units make every rank value bit-identical
    // across engines; the oracle is the same recurrence as 5 unrolled
    // CTEs with DuckDB's // floor-divide.
    Q(
      "g1_pagerank",
      (s, dir) => {
        val nodes = s.range(1000).select(col("id").as("v"))
        val edges = graft.util.CacheScope.persist(
          nodes.select(col("v").as("u"), explode(array(
            (col("v") * 7 + 1) % 1000,
            (col("v") * 13 + 3) % 1000,
            (col("v") * 31 + 7) % 1000)).as("t")).distinct())
        PageRank.run(edges, nodes, iters = 5).orderBy("v")
      },
      Some(PageRank.oracleSql(
        nodesCte = "nodes AS (SELECT unnest(range(1000)) AS v)",
        edgesCte = """edges AS (SELECT DISTINCT v AS u, t FROM (
                     |  SELECT v, unnest([(v*7+1)%1000, (v*13+3)%1000, (v*31+7)%1000]) AS t
                     |  FROM nodes))""".stripMargin,
        iters = 5))),

    // ------------------------------------------------------------------
    // G2 — weighted PageRank over the same graph with arithmetic integer
    // weights (1 + (u+t)%5): contribution proportional to edge weight,
    // still bit-exact fixed-point.
    Q(
      "g2_pagerank_weighted",
      (s, dir) => {
        val nodes = s.range(1000).select(col("id").as("v"))
        val edges = graft.util.CacheScope.persist(
          nodes.select(col("v").as("u"), explode(array(
            (col("v") * 7 + 1) % 1000,
            (col("v") * 13 + 3) % 1000,
            (col("v") * 31 + 7) % 1000)).as("t")).distinct()
            .withColumn("w", lit(1L) + (col("u") + col("t")) % 5))
        PageRank.runWeighted(edges, nodes, iters = 5).orderBy("v")
      },
      Some(PageRank.oracleSqlWeighted(
        nodesCte = "nodes AS (SELECT unnest(range(1000)) AS v)",
        edgesCte = """edges AS (SELECT u, t, 1 + (u + t) % 5 AS w FROM (
                     |  SELECT DISTINCT v AS u, t FROM (
                     |    SELECT v, unnest([(v*7+1)%1000, (v*13+3)%1000, (v*31+7)%1000]) AS t
                     |    FROM nodes)))""".stripMargin,
        iters = 5))),

    // ------------------------------------------------------------------
    // Q33b — the strict-overlap mode: exactly-adjacent windows (next
    // start == prev end) stay separate spans. Same islands oracle with
    // >= heads instead of >.
    Q(
      "q33b_interval_merge_strict",
      (s, dir) => {
        val iv = Tables.events(s, dir)
          .select(col("user_id"), unix_micros(col("ts")).as("s_us"))
          .withColumn("e_us", col("s_us") + Micros30m)
        IntervalMerge.merge(iv, Seq("user_id"), "s_us", "e_us", mergeTouching = false)
          .select("user_id", "span_start", "span_end", "n_merged")
          .orderBy("user_id", "span_start")
      },
      Some(s"""WITH iv AS (SELECT user_id, epoch_us(ts) AS s,
             |                   epoch_us(ts) + $Micros30m AS e
             |            FROM events),
             |h AS (SELECT user_id, s, e,
             |        CASE WHEN s >= coalesce(max(e) OVER (
             |               PARTITION BY user_id ORDER BY s, e
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |               -9223372036854775808)
             |             THEN 1 ELSE 0 END AS head
             |      FROM iv),
             |i AS (SELECT user_id, s, e, sum(head) OVER (
             |        PARTITION BY user_id ORDER BY s, e
             |        ROWS UNBOUNDED PRECEDING) AS island
             |      FROM h)
             |SELECT user_id, min(s) AS span_start, max(e) AS span_end,
             |       count(*) AS n_merged
             |FROM i GROUP BY user_id, island
             |ORDER BY user_id, span_start""".stripMargin)),

    // ------------------------------------------------------------------
    // T13 — per-source distinct-token counts, exact vs HLL sketch: the
    // sketch path is the 100 TB answer (mergeable one-row-per-source
    // state, no distinct shuffle); the exact column here sizes its error.
    // Sketch internals are engine-specific: rows-only entry, accuracy and
    // merge semantics pinned by SketchesSpec.
    Q(
      "t13_distinct_tokens_hll",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("source"), explode(TextFunctions.tokens(col("text"))).as("tok"))
          .groupBy("source")
          .agg(
            count_distinct(col("tok")).as("n_exact"),
            hll_sketch_estimate(hll_sketch_agg(col("tok"), lit(12))).as("n_hll"))
          .orderBy("source")),

    // ------------------------------------------------------------------
    // T13B — the HLL ACCURACY CONTRACT under a full DuckDB oracle (r17
    // verdict #4, the e13 recall-eval pattern applied to the sketch
    // rows-only family): sketch INTERNALS stay engine-specific, but the
    // guarantee the sketch ships with — |estimate − exact| within a
    // declared relative-error bound — is itself a deterministic,
    // oracle-expressible fact. The engine computes the estimate AND the
    // bound comparison; the oracle recomputes the exact cardinality and
    // the bound, and asserts the contract held (within_bound = TRUE is
    // the oracle's literal — a sketch regression past the bound flips
    // the engine's boolean and the hash goes red). Bound = 5% of the
    // exact count (≥ 3σ for lgK = 12, σ ≈ 1.04/√4096 ≈ 1.6%; the same
    // 5% SketchesSpec pins), floored at 1 for tiny sources. The HLL
    // union is register-wise max — commutative/associative — so the
    // estimate is partition-order-invariant and the face deterministic.
    Q(
      "t13b_hll_error_contract",
      (s, dir) => {
        val est = Tables.documents(s, dir)
          .select(col("source"), explode(TextFunctions.tokens(col("text"))).as("tok"))
          .groupBy("source")
          .agg(
            count_distinct(col("tok")).as("n_exact"),
            hll_sketch_estimate(hll_sketch_agg(col("tok"), lit(12))).as("est"))
        val bound = greatest(ceil(col("n_exact") * 0.05).cast("long"), lit(1L))
        est.select(
          col("source"), col("n_exact"), bound.as("max_abs_err"),
          (abs(round(col("est")).cast("long") - col("n_exact")) <= bound)
            .as("within_bound"))
          .orderBy("source")
      },
      Some("""WITH d AS (SELECT source, count(DISTINCT tok) AS n_exact
             |           FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
             |                 FROM documents)
             |           GROUP BY 1)
             |SELECT source, CAST(n_exact AS BIGINT) AS n_exact,
             |       greatest(CAST(ceil(n_exact * 0.05) AS BIGINT), 1) AS max_abs_err,
             |       TRUE AS within_bound
             |FROM d ORDER BY source""".stripMargin)),

    // ------------------------------------------------------------------
    // T29 — mergeable quantile sketch (approx_percentile) beside the exact
    // interpolated percentile: the sketch is THE scale path for quantiles
    // (partial sketches merge across partitions; the exact form needs the
    // full group). Sketch internals are engine-specific ⇒ rows-only; the
    // rank-error contract (approx p50 lands between the exact p45/p55,
    // same for p95) is SketchesSpec-pinned alongside the exact columns
    // here. Completes the sketch family: CMS (t12), HLL (t13), Bloom
    // (c4d), quantiles (this).
    Q(
      "t29_quantile_sketch",
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n"),
            percentile(col("value"), lit(0.5)).as("p50_exact"),
            percentile(col("value"), lit(0.95)).as("p95_exact"),
            approx_percentile(col("value"), lit(0.5), lit(10000)).as("p50_sketch"),
            approx_percentile(col("value"), lit(0.95), lit(10000)).as("p95_sketch"))
          .orderBy("event_type")),

    // ------------------------------------------------------------------
    // T29B — the quantile-sketch RANK-ERROR CONTRACT under a full DuckDB
    // oracle (r17 verdict #4, t13b's twin): Greenwald–Khanna guarantees
    // the returned element's rank is within εn of the target rank
    // (ε = 1/accuracy), REGARDLESS of partition merge order — so while
    // the estimate itself may move with parallelism (why t29 is
    // rows-only), the thresholded rank comparison is deterministic. Per
    // (event_type, percentile): the engine ranks its own estimate
    // against the exact data (r_lo = #values < est, r_hi = #values ≤
    // est — the estimate occupies rank interval [r_lo+1, r_hi]) and
    // asserts the target rank ceil(p·n) lands within rank_tol of that
    // interval; the oracle recomputes n, the target and the tolerance
    // exactly and asserts TRUE. rank_tol = ceil(n/2500) = 4εn at
    // accuracy 10000 — nominal ε plus merge/rounding slack — floored at
    // 1. Shape at scale: one sketch aggregate + one broadcast-join rank
    // count; the exact-rank leg is the EVAL's designed cost (the truth
    // side), not the serving path — production serves the sketch alone.
    Q(
      "t29b_quantile_rank_error",
      (s, dir) => {
        val ev = Tables.events(s, dir).select(col("event_type"), col("value"))
        val sk = ev.groupBy("event_type").agg(
          count(lit(1)).as("n"),
          approx_percentile(col("value"), lit(0.5), lit(10000)).as("est50"),
          approx_percentile(col("value"), lit(0.95), lit(10000)).as("est95"))
        val targets = sk.select(col("event_type"), col("n"),
          explode(array(
            struct(lit(50L).as("q_pct"), col("est50").as("est")),
            struct(lit(95L).as("q_pct"), col("est95").as("est")))).as("q"))
          .select(col("event_type"), col("n"), col("q.q_pct"), col("q.est"))
        val ranked = ev.join(broadcast(targets), Seq("event_type"))
          .groupBy("event_type", "q_pct", "n")
          .agg(
            sum(when(col("value") < col("est"), 1L).otherwise(0L)).as("r_lo"),
            sum(when(col("value") <= col("est"), 1L).otherwise(0L)).as("r_hi"))
        val tol = greatest(ceil(col("n") / lit(2500.0)).cast("long"), lit(1L))
        val target = ceil(col("q_pct") * col("n") / lit(100.0)).cast("long")
        ranked.select(
          col("event_type"), col("q_pct"), col("n"), tol.as("rank_tol"),
          (target >= col("r_lo") + lit(1L) - tol &&
            target <= col("r_hi") + tol).as("within_bound"))
          .orderBy("event_type", "q_pct")
      },
      Some("""WITH g AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1),
             |u AS (SELECT event_type, n, unnest([50, 95]) AS q_pct FROM g)
             |SELECT event_type, CAST(q_pct AS BIGINT) AS q_pct,
             |       CAST(n AS BIGINT) AS n,
             |       greatest(CAST(ceil(n / 2500.0) AS BIGINT), 1) AS rank_tol,
             |       TRUE AS within_bound
             |FROM u ORDER BY event_type, q_pct""".stripMargin)),

    // ------------------------------------------------------------------
    // T13g — the HLL estimate pinned over a literal fixture: two sources
    // whose exact distinct-token counts are hand-countable (9 and 5). At
    // these cardinalities the DataSketches HLL_4 sketch is in exact
    // (coupon) mode, so the estimate equals the true count and the VALUES
    // oracle pins the whole agg→estimate chain — any drift in hashing,
    // lgK plumbing, or estimator constants breaks the hash. (SketchesSpec
    // pins the 5%-error + merge semantics at corpus scale.)
    Q(
      "t13_hll_golden",
      (s, _) => {
        import s.implicits._
        Seq(
          ("srcA", "the quick brown fox jumps over the lazy dog"),
          ("srcA", "the quick red fox"),
          ("srcB", "alpha beta gamma alpha"),
          ("srcB", "delta epsilon"))
          .toDF("source", "text")
          .select(col("source"), explode(TextFunctions.tokens(col("text"))).as("tok"))
          .groupBy("source")
          .agg(
            count_distinct(col("tok")).as("n_exact"),
            hll_sketch_estimate(hll_sketch_agg(col("tok"), lit(12))).as("n_hll"))
          .orderBy("source")
      },
      Some("""SELECT source, CAST(n_exact AS BIGINT) AS n_exact,
             |       CAST(n_hll AS BIGINT) AS n_hll
             |FROM (VALUES
             |  ('srcA', 9, 9),
             |  ('srcB', 5, 5)
             |) AS t(source, n_exact, n_hll)
             |ORDER BY source""".stripMargin)),

    // ------------------------------------------------------------------
    // Q41 — one-pass dataset profiler: per-column n / nulls / distincts /
    // min / max over orders, ONE aggregate (Spark's Expand multi-distinct
    // plan) unpivoted via inline — the "what did I just ingest" report.
    // Numeric+timestamp min/max land in DOUBLE columns (timestamps as
    // epoch micros — exact under 2^53), strings in VARCHAR columns;
    // rendering doubles to one shared string column would tie the result
    // to each engine's float formatting.
    Q(
      "q41_profile_table",
      (s, dir) =>
        Profile.profile(
          Tables.orders(s, dir),
          Seq(
            Profile.ColSpec("o_orderkey", Profile.Num),
            Profile.ColSpec("o_custkey", Profile.Num),
            Profile.ColSpec("o_orderstatus", Profile.Str),
            Profile.ColSpec("o_totalprice", Profile.Num),
            Profile.ColSpec("o_orderdate", Profile.Ts),
            Profile.ColSpec("o_orderpriority", Profile.Str)))
          .orderBy("col_name"),
      Some {
        def num(c: String, expr: String = null) = {
          val e = Option(expr).getOrElse(c)
          s"""SELECT '$c' AS col_name, count($c) AS n,
             |       count(*) - count($c) AS n_null,
             |       count(DISTINCT $c) AS n_distinct,
             |       CAST(min($e) AS DOUBLE) AS min_num,
             |       CAST(max($e) AS DOUBLE) AS max_num,
             |       CAST(NULL AS VARCHAR) AS min_str,
             |       CAST(NULL AS VARCHAR) AS max_str
             |FROM orders""".stripMargin
        }
        def str(c: String) =
          s"""SELECT '$c' AS col_name, count($c) AS n,
             |       count(*) - count($c) AS n_null,
             |       count(DISTINCT $c) AS n_distinct,
             |       CAST(NULL AS DOUBLE) AS min_num,
             |       CAST(NULL AS DOUBLE) AS max_num,
             |       min($c) AS min_str, max($c) AS max_str
             |FROM orders""".stripMargin
        Seq(
          num("o_orderkey"), num("o_custkey"), str("o_orderstatus"),
          num("o_totalprice"),
          num("o_orderdate", "epoch_us(o_orderdate)"), str("o_orderpriority"))
          .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
      }),

    // ------------------------------------------------------------------
    // Q42 — SCD-type-2 history build from the events change log: per user,
    // consecutive runs of the same event_type collapse to one versioned
    // row with [valid_from, valid_to) validity and an is_current flag —
    // the standard warehouse-history shape, all windows key-partitioned.
    Q(
      "q42_scd2_history",
      (s, dir) =>
        Scd2.history(
          Tables.events(s, dir).select("user_id", "ts", "event_id", "event_type"),
          keyCol = "user_id", tsCol = "ts", tieCol = "event_id", attrCol = "event_type")
          .orderBy("user_id", "version"),
      Some("""WITH runs AS (
             |  SELECT user_id, ts, event_id, event_type,
             |         CASE WHEN lag(event_type) OVER w IS NOT DISTINCT FROM event_type
             |              THEN 0 ELSE 1 END AS chg
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |seg AS (SELECT user_id, ts, event_type,
             |               sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                              ROWS UNBOUNDED PRECEDING) AS version
             |        FROM runs),
             |g AS (SELECT user_id, version, min(event_type) AS event_type,
             |             min(ts) AS valid_from, max(ts) AS last_seen,
             |             count(*) AS n_events
             |      FROM seg GROUP BY 1, 2),
             |fin AS (SELECT user_id, version, event_type, valid_from,
             |               lead(valid_from) OVER (PARTITION BY user_id
             |                                      ORDER BY valid_from, version) AS valid_to,
             |               last_seen, n_events
             |        FROM g)
             |SELECT user_id, CAST(version AS BIGINT) AS version, event_type,
             |       valid_from, valid_to, last_seen,
             |       CAST(n_events AS BIGINT) AS n_events,
             |       valid_to IS NULL AS is_current
             |FROM fin ORDER BY user_id, version""".stripMargin)),

    // ------------------------------------------------------------------
    // C16 — the quality floor's 100 TB form: per-source quantile cut from
    // a value-domain HISTOGRAM (corpus reduces to (source, bucket, count)
    // before any window; the cumulative scan runs over that bounded table)
    // instead of c10's exact per-group percentile sort. Pure integer cut
    // rule — drop a bucket iff its cumulative count is still <= 1/10 of
    // the source total — so both engines agree bit-for-bit.
    Q(
      "c16_histogram_floor",
      (s, dir) =>
        Curation.histogramQuantileFloor(
          Tables.documents(s, dir).select("source", "doc_id", "n_chars"),
          sourceCol = "source", valueCol = "n_chars",
          qNum = 1L, qDen = 10L, bucketWidth = 16L)
          .select("source", "doc_id", "n_chars", "cut_bucket", "n_source")
          .orderBy("source", "doc_id"),
      Some("""WITH hist AS (SELECT source,
             |                     CAST(floor(n_chars / 16.0) AS BIGINT) AS bucket,
             |                     count(*) AS n
             |              FROM documents GROUP BY 1, 2),
             |c AS (SELECT source, bucket,
             |             sum(n) OVER (PARTITION BY source ORDER BY bucket
             |                          ROWS UNBOUNDED PRECEDING) AS cum,
             |             sum(n) OVER (PARTITION BY source) AS n_source
             |      FROM hist),
             |cuts AS (SELECT source, min(bucket) AS cut_bucket,
             |                CAST(min(n_source) AS BIGINT) AS n_source
             |         FROM c WHERE cum * 10 > n_source * 1 GROUP BY 1)
             |SELECT d.source, d.doc_id, d.n_chars, t.cut_bucket, t.n_source
             |FROM documents d JOIN cuts t USING (source)
             |WHERE CAST(floor(d.n_chars / 16.0) AS BIGINT) >= t.cut_bucket
             |ORDER BY d.source, d.doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // C18 — temperature mixture (n^alpha shares at alpha=1/2, the
    // mT5/XLM-R up-sampling rule) over a deterministically SKEWED corpus
    // (per-source keep percentage 30%..87% by source index, md5-decided —
    // uniform sources would make every temperature rate identical).
    // Small sources get boosted keep rates toward parity; rates derive
    // from the data, not a hand map. sqrt is the one correctly-rounded
    // power, per-source weights sum on the decimal grid, thresholds land
    // on the integer 1/10000 grid — engine-exact end to end.
    Q(
      "c18_temperature_mixture",
      (s, dir) => {
        val skewed = Tables.documents(s, dir)
          .select("doc_id", "source")
          .filter(Curation.hashBucket(col("doc_id"), 100, "skew") <
            lit(30) + lit(3) * expr("CAST(substring(source, 4) AS INT)"))
        Curation.temperatureMixture(skewed, "source", "doc_id",
          targetDocs = 150L, salt = "temp")
          .select("doc_id", "source", "n_source", "thr")
          .orderBy("doc_id")
      },
      Some("""WITH skewed AS (
             |  SELECT doc_id, source FROM documents
             |  WHERE CAST(CAST('0x' || substr(md5('skew' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 AS BIGINT)
             |        < 30 + 3 * CAST(substr(source, 4) AS INT)),
             |stats AS (SELECT source, count(*) AS n_source,
             |                 CAST(round(sqrt(count(*)), 6) AS DECIMAL(20,6)) AS w
             |          FROM skewed GROUP BY 1),
             |tot AS (SELECT sum(w) AS tw FROM stats),
             |thr AS (SELECT source, n_source,
             |               least(10000, CAST(floor(
             |                 (CAST(w AS DOUBLE) / CAST(tw AS DOUBLE))
             |                   * 150.0 * 10000.0 / n_source) AS BIGINT)) AS thr
             |        FROM stats CROSS JOIN tot)
             |SELECT s.doc_id, s.source, t.n_source, t.thr
             |FROM skewed s JOIN thr t USING (source)
             |WHERE CAST(CAST('0x' || substr(md5('temp' || CAST(s.doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 10000 AS BIGINT) < t.thr
             |ORDER BY s.doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // Q43 — the dataset card: the per-source summary a data team
    // publishes with a corpus release — volume, length, language purity,
    // exact-dup rate, token mass — as ONE scan + two tiny aggregates.
    // Integer-exact until the final per-column division (the decimal
    // contract); language share reported as a RATIO (max lang count /
    // docs), not a name, so argmax tie semantics can't enter the hash.
    Q(
      "q43_dataset_card",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val bySrc = d.groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("n_chars_total"),
          count_distinct(col("lang")).as("n_langs"),
          count_distinct(md5(col("text"))).as("n_distinct_texts"),
          sum(TextFunctions.nTokens(col("text"))).as("n_tokens_total"))
        val topLang = d.groupBy("source", "lang")
          .agg(count(lit(1)).as("__nl"))
          .groupBy("source").agg(max(col("__nl")).as("__top_lang_n"))
        bySrc.join(topLang, Seq("source"))
          .select(
            col("source"), col("n_docs"), col("n_chars_total"),
            (col("n_chars_total").cast("double") / col("n_docs")).as("avg_chars"),
            col("n_langs"),
            (col("__top_lang_n").cast("double") / col("n_docs")).as("top_lang_share"),
            (lit(1.0) - col("n_distinct_texts").cast("double") / col("n_docs")).as("dup_frac"),
            (col("n_tokens_total").cast("double") / col("n_docs")).as("avg_tokens"))
          .orderBy("source")
      },
      Some("""WITH bysrc AS (
             |  SELECT source, count(*) AS n_docs,
             |         CAST(sum(n_chars) AS BIGINT) AS n_chars_total,
             |         count(DISTINCT lang) AS n_langs,
             |         count(DISTINCT md5(text)) AS n_distinct_texts,
             |         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens_total
             |  FROM documents GROUP BY 1),
             |toplang AS (
             |  SELECT source, max(nl) AS top_lang_n FROM (
             |    SELECT source, lang, count(*) AS nl FROM documents GROUP BY 1, 2)
             |  GROUP BY 1)
             |SELECT b.source, b.n_docs, b.n_chars_total,
             |       CAST(b.n_chars_total AS DOUBLE) / b.n_docs AS avg_chars,
             |       b.n_langs,
             |       CAST(t.top_lang_n AS DOUBLE) / b.n_docs AS top_lang_share,
             |       1.0 - CAST(b.n_distinct_texts AS DOUBLE) / b.n_docs AS dup_frac,
             |       CAST(b.n_tokens_total AS DOUBLE) / b.n_docs AS avg_tokens
             |FROM bysrc b JOIN toplang t USING (source)
             |ORDER BY b.source""".stripMargin)),

    // ------------------------------------------------------------------
    // Q44 — transcript assembly: gap-sessionized event streams flattened
    // to ONE ordered row per conversation — the log→SFT-example step
    // (q27 counts sessions; this emits their contents). Ordered collect
    // done deterministically: collect_list is order-free, so the structs
    // sort on their unique (ts, event_id) key INSIDE the row before the
    // join — never a window re-sort of the exploded stream.
    Q(
      "q44_transcript_assembly",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
        Tables.events(s, dir)
          .withColumn("prev_ts", lag(col("ts"), 1).over(w))
          .withColumn("boundary",
            when(col("prev_ts").isNull ||
              col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1L)
              .otherwise(0L))
          .withColumn("session_idx", sum(col("boundary")).over(w))
          .groupBy("user_id", "session_idx")
          .agg(
            count(lit(1)).as("n_turns"),
            concat_ws(" -> ", transform(
              array_sort(collect_list(struct(col("ts"), col("event_id"), col("event_type")))),
              x => x.getField("event_type"))).as("transcript"))
          .orderBy("user_id", "session_idx")
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id, event_type, ts,
             |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
             |  FROM events),
             |b AS (
             |  SELECT *, CASE WHEN prev_ts IS NULL
             |                   OR date_diff('second', prev_ts, ts) > 1800
             |                 THEN 1 ELSE 0 END AS boundary FROM e),
             |s AS (
             |  SELECT *, CAST(sum(boundary) OVER (
             |    PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_idx
             |  FROM b)
             |SELECT user_id, session_idx, count(*) AS n_turns,
             |       string_agg(event_type, ' -> ' ORDER BY ts, event_id) AS transcript
             |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))
  )

  /** src<i> repeats (i%8)*0.4 epochs — covers drop (0), fractional (<1),
    * exactly-once-ish, and multi-epoch (up to 2.8) regimes.
    */
  private lazy val epochRates: Map[String, Double] =
    (0 until 20).map(i => s"src$i" -> (i % 8) * 0.4).toMap

  /** The c4/c4b/c4c injected corpus and its eval side, shared so the span
    * listing provably agrees with the per-doc flag scenario.
    */
  private def decontaminateInputs(
      s: org.apache.spark.sql.SparkSession,
      dir: String): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val d = Tables.documents(s, dir).select("doc_id", "text")
    val probe = d.filter(col("doc_id") === 0)
      .select(concat_ws(" ",
        slice(TextFunctions.tokens(col("text")), 1, 8)).as("__probe"))
    val injected = d.filter(col("doc_id") % 50 === 0 && col("doc_id") =!= 0)
      .crossJoin(broadcast(probe))
      .select((-col("doc_id") - 1L).as("doc_id"),
        concat(col("text"), lit(" "), col("__probe")).as("text"))
    (d.unionByName(injected), d.filter(col("doc_id") % 97 === 0))
  }
}
