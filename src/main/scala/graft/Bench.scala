package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every registered query against
  * SPARK_GRAFT_SF_DIR, one JSON line of per-query seconds.
  *
  * Queries execute into the `noop` sink, not `.count()` — count() lets
  * column pruning delete the very projections being measured (a fingerprint
  * query that never hashes anything benches meaninglessly fast).
  */
object Bench {
  /** Cross-round growth test (r16 verdict #4 thresholds): >2x for entries
    * >= 1 s; >3x above a 0.25 s floor below that, where sub-second entries
    * double-to-triple on scheduler jitter alone. Object-level so
    * BenchAdjudicationSpec pins it alongside [[classifyRow]].
    */
  private[graft] def grew(recorded: Double, base: Double): Boolean =
    if (recorded >= 1.0) recorded > 2.0 * base
    else recorded >= 0.25 && recorded > 3.0 * base

  /** Per-row recheck classification (r17 verdict #1), in priority order —
    * contaminated / regression / ambient_unreproduced / ambient / ok; see
    * the call site for the full rationale of each class. Pure function of
    * the row's numbers so the spec can pin every branch.
    */
  private[graft] def classifyRow(
      recorded: Double,
      rerun: Option[Double],
      contaminated: Boolean,
      prev: Option[Double],
      localRatio: Double): String =
    if (contaminated) "contaminated"
    else prev.map(_ * localRatio) match {
      case Some(adj) if grew(recorded, adj) =>
        if (rerun.exists(v => grew(v, adj) && v <= 2.0 * recorded)) "regression"
        else "ambient_unreproduced"
      case _ if prev.exists(p => grew(recorded, p)) => "ambient"
      case _ => "ok"
    }

  /** Prev-chain value for a rechecked row (r19 verdict #3): a slow-window
    * median whose clean end-of-run rerun the classifier adjudicated
    * `ok`/`ambient` must NOT become next round's baseline (r19's t44
    * entered the chain at 4.25 s though its rerun measured 2.50 s — r20
    * would have compared against the inflated figure). For those two
    * classes, min(recorded, rerun) is persisted into the
    * `queries_adjudicated` map the next round's parser prefers; every
    * other class (contaminated rows never reach a committed quiet
    * artifact; regression/ambient_unreproduced keep their loud recorded
    * number) passes through unchanged.
    */
  private[graft] def adjudicated(
      recorded: Double, rerun: Option[Double], cls: String): Double =
    if (cls == "ok" || cls == "ambient")
      rerun.fold(recorded)(math.min(recorded, _))
    else recorded

  /** HEAD commit of the repo the bench ran from, resolved by plain file
    * reads (`.git/HEAD` → loose ref → packed-refs) — no process exec, and
    * any failure degrades to None. Stamped into the artifact (r19 verdict
    * #2 / "what's wrong" #1) so a cross-round reader can tell a code
    * change from a host change.
    */
  private[graft] def headSha(gitDir: java.nio.file.Path =
      java.nio.file.Paths.get(".git")): Option[String] =
    try {
      import java.nio.file.Files
      val utf8 = java.nio.charset.StandardCharsets.UTF_8
      val head = new String(Files.readAllBytes(gitDir.resolve("HEAD")), utf8).trim
      if (!head.startsWith("ref: ")) Some(head.take(40))
      else {
        val ref = head.stripPrefix("ref: ").trim
        val loose = gitDir.resolve(ref)
        if (Files.exists(loose))
          Some(new String(Files.readAllBytes(loose), utf8).trim.take(40))
        else {
          val packed = gitDir.resolve("packed-refs")
          if (!Files.exists(packed)) None
          else new String(Files.readAllBytes(packed), utf8)
            .linesIterator
            .find(l => !l.startsWith("#") && l.endsWith(" " + ref))
            .map(_.split(" ").head.take(40))
        }
      }
    } catch { case _: Throwable => None }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.fromEnv("graft-bench")
    // Returns whether the query ran clean: the contamination recheck must
    // distinguish "re-ran fast" from "re-ran and THREW" (r15 ADVICE #3 —
    // a failed rerun reads near-zero and would falsely flag its entry).
    def execute(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Boolean =
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
    // Previous complete artifact (this round's output location, before we
    // overwrite it): the cross-round delta adjudication below (r15
    // verdict #6) compares each entry against its last-round median, so
    // a contaminated MID-PACK reading — too fast to make the 10-slowest
    // recheck, like r14's q2 at 1.87 s vs quiet 0.80 s — still gets
    // re-run and flagged. Absent file (first round / cleaned workspace)
    // degrades to rank-only adjudication.
    val benchOut = sys.env.get("SPARK_GRAFT_BENCH_OUT")
      .map(java.nio.file.Paths.get(_))
      .getOrElse(java.nio.file.Paths.get("target", "bench.json"))
    val prevArtifact: Option[String] =
      try {
        if (java.nio.file.Files.exists(benchOut))
          Some(new String(java.nio.file.Files.readAllBytes(benchOut),
            java.nio.charset.StandardCharsets.UTF_8))
        else None
      } catch { case _: Throwable => None }
    // Prev medians: `queries_adjudicated` preferred over raw `queries`
    // (r19 verdict #3) — the adjudicated map replaces slow-window medians
    // whose clean rerun the classifier accepted, so cross-round ratios
    // compare against the number the recheck itself vouched for. Pre-r20
    // artifacts carry only `queries`; the fallback keeps them readable.
    def parseQueryMap(field: String): Option[Map[String, Double]] =
      prevArtifact.flatMap { s =>
        ("\"" + field + """":\{([^}]*)\}""").r.findFirstMatchIn(s)
          .map(_.group(1).split(",").toSeq.flatMap { kv =>
            kv.split(":") match {
              case Array(k, v) =>
                try Some(k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim.toDouble)
                catch { case _: NumberFormatException => None }
              case _ => None
            }
          }.toMap)
      }.filter(_.nonEmpty)
    val prevQueries: Map[String, Double] =
      parseQueryMap("queries_adjudicated")
        .orElse(parseQueryMap("queries"))
        .getOrElse(Map.empty)
    // Previous run's machine-speed yardstick, parsed back from the same
    // artifact the prev medians come from (r17 verdict #1): cross-round
    // ratios are only meaningful relative to how fast each MACHINE ran,
    // so the prev yardstick persists beside the prev times and every
    // cross-round comparison below scales by yardstick(now)/yardstick(prev).
    // toDouble guarded like the prevQueries parser above (r18 ADVICE #2):
    // the [0-9.]+ class matches non-parseable tokens ("1.2.3", ".") from
    // a corrupt/hand-edited prev artifact, and a crash here would abort
    // the whole bench; a malformed prev degrades to yardRatio = 1.0.
    val prevYardstick: Option[Double] =
      prevArtifact.flatMap { s =>
        """"yardstick_warm_s":([0-9.]+)""".r.findFirstMatchIn(s)
          .flatMap(m =>
            try Some(m.group(1).toDouble)
            catch { case _: NumberFormatException => None })
          .filter(_ > 0)
      }
    // Prev run's MULTI-POINT yardstick series (r18 verdict #1): the
    // in-run ambient index sampled every ~25 queries, [[index, secs],
    // ...]. When present, each query's cross-round ratio scales by its
    // NEAREST sample on both sides instead of one run-level scalar —
    // the r18 quiet artifact carried a ~12% carried-suite drift that a
    // single early-run yardstick could not localize. Absent (pre-r19
    // artifact) degrades to the scalar prevYardstick.
    val prevSeries: Seq[(Int, Double)] =
      prevArtifact.flatMap { s =>
        """"yardstick_series":\[((?:\[[^\]]*\],?)*)\]""".r
          .findFirstMatchIn(s).map(_.group(1))
      }.map { inner =>
        """\[([0-9]+),([0-9.]+)\]""".r.findAllMatchIn(inner).flatMap { m =>
          try Some((m.group(1).toInt, m.group(2).toDouble))
          catch { case _: NumberFormatException => None }
        }.filter(_._2 > 0).toSeq
      }.getOrElse(Seq.empty)
    // Untimed warmup pass: first executions pay ~6s of JVM/codegen/classload
    // warmup that would otherwise land on arbitrary queries and make
    // per-query numbers useless for regression tracking (measured: q6 6.74s
    // cold vs 1.05s warm — round-1 verdict finding #4).
    SparkEntry.queries.foreach { case (name, fn) =>
      execute(name, fn)
      graft.util.CacheScope.releaseAll()
    }
    // Machine-speed yardstick (r13 verdict #5): t27b warm x3, MIN of
    // three — the one-minute calibration that separates machine/session
    // drift from code regressions (r13 burned a full adjudication cycle
    // because a 228 s and a 176 s total were both "the bench"). Emitted
    // into the artifact as yardstick_warm_s alongside total_normalized =
    // total x (yardstickRef / yardstick), so every BENCH_r*.json
    // self-reports how slow its machine was.
    //
    // The reference MUST be a same-harness number: this yardstick runs
    // after the full untimed warmup pass, i.e. in a fully JIT-hot JVM,
    // where t27b reads 0.54–0.61 s on every machine seen across rounds
    // (in-run t27b: r12 driver bench 0.565, r13 0.614, r14 local 0.589).
    // The first r14 cut anchored on 0.755 — BenchOne's fresh-JVM warm
    // reading — which inflated total_normalized by ~39% and would have
    // read as a false regression. 0.565 is the in-run t27b from the
    // quiet r12 driver bench (BENCH_r12.json), the cleanest same-harness
    // anchor on record.
    val yardstickName = "t27b_inverted_index_incremental"
    val yardstickRef = 0.565
    val yardstick = SparkEntry.queries.get(yardstickName).map { fn =>
      val samples = Seq.fill(3) {
        val t0 = System.nanoTime()
        execute(yardstickName, fn)
        (System.nanoTime() - t0) / 1e9
      }
      graft.util.CacheScope.releaseAll()
      samples.min
    }.getOrElse(Double.NaN)
    // raw toString, not the f interpolator: %f is locale-sensitive and a
    // comma decimal would break the JSON artifact
    val yardstickJson =
      if (yardstick.isNaN) "null"
      else ((yardstick * 1000).round / 1000.0).toString
    def normalizedJson(total: Double): String =
      if (yardstick.isNaN || yardstick <= 0) "null"
      else ((total * yardstickRef / yardstick * 10).round / 10.0).toString
    // Multi-point ambient index (r18 verdict #1): the single early-run
    // yardstick cannot adjudicate drift DURING a 40-minute run on a host
    // whose speed swings ~30% within an hour (r18 carried a ~12%
    // cross-round drift the artifact could not prove ambient). The
    // yardstick re-runs every `sampleEvery` queries (min of 2, ~1.2 s a
    // sample) and once after the last query; the full series is emitted
    // in the artifact, every query normalizes by its NEAREST sample, and
    // cross-round growers are classified against the LOCAL ratio
    // (nearest-now / nearest-prev) instead of one run-level scalar.
    // Prev-series indices refer to the prev round's query order — query
    // additions shift names by a few positions, which is within the
    // 25-query sample granularity anyway (positions proxy elapsed time).
    val sampleEvery = 25
    def yardSample(): Double = {
      val ts = Seq.fill(2) {
        val t0 = System.nanoTime()
        execute(yardstickName, SparkEntry.queries(yardstickName))
        (System.nanoTime() - t0) / 1e9
      }
      graft.util.CacheScope.releaseAll()
      ts.min
    }
    val orderedQueries = SparkEntry.queries.toSeq
    val nameIdx: Map[String, Int] =
      orderedQueries.zipWithIndex.map { case ((n, _), i) => n -> i }.toMap
    val ySamples = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    if (!yardstick.isNaN) ySamples += ((0, yardstick))
    // Median of 3 timed runs per query: a single sample at local[32]
    // carries ±30%+ contention noise (r3/r4 both burned a judge round on
    // one-shot artifacts, e.g. q22 2.92s recorded vs 1.3s steady-state);
    // the median of three is stable against one bad draw at 3x the cost.
    val runs = 3
    val resultsSeq = orderedQueries.zipWithIndex.map { case ((name, fn), idx) =>
      if (idx > 0 && idx % sampleEvery == 0 && !yardstick.isNaN)
        ySamples += ((idx, yardSample()))
      val samples = Seq.fill(runs) {
        val t0 = System.nanoTime()
        execute(name, fn)
        (System.nanoTime() - t0) / 1e9
      }
      // Release between QUERIES, not between the 3 runs of one query:
      // identical re-built plans hit the CacheManager and reuse warm
      // blocks, which is the steady-state a benchmark should report; the
      // release bounds accumulation to one query's intermediates.
      graft.util.CacheScope.releaseAll()
      // samples.head is the query's COLD-CACHE time (the JVM is warm from
      // the untimed pass, but CacheScope was released, so run 1 pays every
      // persist's materialization; runs 2-3 reuse the warm blocks). The
      // r20 judge asked for it beside the median ("what's wrong" #2):
      // the median measures steady state, the cold column measures the
      // plan — emitted as an ADDITIONAL map, never changing the median.
      name -> (samples.sorted.apply(runs / 2), samples.head)
    }
    if (!yardstick.isNaN) ySamples += ((orderedQueries.size, yardSample()))
    val coldSeq: Seq[(String, Double)] =
      resultsSeq.map { case (n, (_, cold)) => n -> cold }
    val medianSeq: Seq[(String, Double)] =
      resultsSeq.map { case (n, (med, _)) => n -> med }
    val results: Map[String, Double] = medianSeq.toMap
    def localYard(idx: Int): Double =
      if (ySamples.isEmpty) Double.NaN
      else ySamples.minBy { case (i, _) => math.abs(i - idx) }._2
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val qsCold = coldSeq.map { case (k, v) =>
      s"\"" + k + "\":" + ((v * 1000).round / 1000.0) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // Contamination self-adjudication (r14 verdict #5): every round so
    // far that ran under driver contention produced a handful of 4–12×
    // outliers that only a manual warm spot-bench could adjudicate
    // (r14: q57 9.47 s recorded vs 1.23 s warm). Re-run the N slowest
    // entries once more at the END of the bench — the JVM is at its
    // hottest and the measured pass's contention has drained — and emit
    // BOTH readings: an entry whose recorded median is >2× its re-run
    // is flagged contaminated in the artifact, so the judge reads the
    // adjudication off BENCH_r*.json instead of re-deriving it by hand.
    // The designed-cost floors (e10, d17b, t48) re-run at their
    // recorded readings and stay unflagged — that reproducibility is
    // exactly the signal that separates them from contention victims.
    // Roster (r15 verdict #6, floor lowered r16 verdict #4): the 10
    // slowest PLUS every cross-round grower — >2x over its previous-
    // round artifact value for entries >= 1 s (t26b's 1.39 -> 2.08 s
    // adjudicated growth sailed under the old uniform >3x), keeping the
    // >3x bar below 1 s where sub-second entries double-to-triple on
    // scheduler jitter alone (still floored at 0.25 s) — so mid-band
    // deltas self-adjudicate too, not just in-round ranks.
    //
    // Yardstick-aware (r17 verdict #1): "rerun ≈ recorded" is the wrong
    // contamination test when the WHOLE run is elevated — r17's driver
    // machine ran its yardstick at 0.589 vs the prev round's 0.538, and
    // five entries recorded ~2x their prev with reruns matching, so the
    // artifact called them "not contaminated" when the correct reading
    // was ambient (their code hadn't changed a line). Every cross-round
    // ratio below therefore compares against prev SCALED BY
    // yardRatio = yardstick(now)/yardstick(prev-run): growth the
    // machine-speed delta explains never enters the roster, and growth
    // that survives the adjustment is classified per-row (see `cls`)
    // so the artifact alone adjudicates — no judge spot-bench.
    val yardRatio: Double =
      (for { y <- Option(yardstick).filter(v => !v.isNaN && v > 0)
             p <- prevYardstick } yield y / p).getOrElse(1.0)
    // LOCAL ratio per query (r18 verdict #1): nearest in-run sample over
    // the nearest prev-run sample (prev scalar when the prev artifact
    // predates the series) — so a host that degrades DURING the run
    // excuses only the queries measured while it was slow, and a grower
    // measured in a fast window cannot hide behind a slow early
    // yardstick.
    def prevLocal(idx: Int): Option[Double] =
      if (prevSeries.nonEmpty)
        Some(prevSeries.minBy { case (i, _) => math.abs(i - idx) }._2)
      else prevYardstick
    def localRatio(name: String): Double = {
      val idx = nameIdx.getOrElse(name, 0)
      val ly = localYard(idx)
      (for { p <- prevLocal(idx) if !ly.isNaN && ly > 0 && p > 0 }
        yield ly / p).getOrElse(1.0)
    }
    // Run-level degradation flag: the initial yardstick >15% over the
    // prev run's, OR the in-run series median >15% over the prev
    // series' median — a run that STARTED healthy but degraded mid-pass
    // is degraded too (surfaced at the top of the artifact, not buried
    // per-row).
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val seriesRatio: Option[Double] =
      if (ySamples.nonEmpty && prevSeries.nonEmpty)
        Some(med(ySamples.map(_._2).toSeq) / med(prevSeries.map(_._2)))
      else None
    val runDegraded = yardRatio > 1.15 || seriesRatio.exists(_ > 1.15)
    val adjudicateN = 10
    val slowestNames = results.toSeq.sortBy(-_._2).take(adjudicateN).map(_._1)
    val grownNames = results.toSeq.collect {
      case (name, recorded)
        if prevQueries.get(name)
          .exists(p => grew(recorded, p * localRatio(name))) =>
        name
    }
    // Raw-growers the yardstick adjustment EXPLAINS still enter the
    // roster once (so the artifact carries their "ambient" row instead
    // of silence), but only on a degraded run — on a healthy run a raw
    // grower is an adjusted grower anyway.
    val ambientNames =
      if (runDegraded)
        results.toSeq.collect {
          case (name, recorded)
            if prevQueries.get(name).exists(p => grew(recorded, p)) =>
            name
        }
      else Seq.empty
    val recheck = (slowestNames ++ grownNames ++ ambientNames).distinct
      .map { name =>
        val recorded = results(name)
        // MIN of 2 clean re-runs (r15 ADVICE #3: one sample is noisier
        // than the median it adjudicates); a rerun pass that THREW is
        // excluded — if both threw, rerun is null and the entry is NOT
        // flagged (a crash is its own loud signal, not contamination).
        val attempts = Seq.fill(2) {
          val t0 = System.nanoTime()
          val ok = execute(name, SparkEntry.queries(name))
          val dt = (System.nanoTime() - t0) / 1e9
          graft.util.CacheScope.releaseAll()
          if (ok) Some(dt) else None
        }.flatten
        val rerun = if (attempts.nonEmpty) Some(attempts.min) else None
        val contaminated = rerun.exists(recorded > 2.0 * _)
        val prev = prevQueries.get(name)
        // Per-row classification (r17 verdict #1) — the artifact's own
        // verdict on every rechecked entry, in priority order:
        //   contaminated — recorded > 2x its end-of-run rerun: in-run
        //     contention on the measured pass; the rerun is the number.
        //   regression — growth over yardstick-ADJUSTED prev that a CLEAN
        //     rerun reproduces: real, and machine speed does not excuse
        //     it. A rerun that itself reads > 2x the recorded median is
        //     not clean — end-of-run contention can inflate reruns just
        //     like measured passes (observed live in r18: a host spike
        //     put a 0.6 s query's rerun at 4.0 s, "confirming" growth
        //     that four same-code runs showed was oscillation) — so an
        //     elevated rerun demotes to ambient_unreproduced instead of
        //     confirming.
        //   ambient_unreproduced — adjusted growth the rerun does NOT
        //     cleanly reproduce: mixed evidence, treat as noise unless it
        //     recurs next round.
        //   ambient — raw growth fully explained by the yardstick ratio
        //     (the r17 t51/e13/d18b/g2/t24b case).
        //   ok — in the roster by rank only, no cross-round growth.
        // Adjustment uses the query's LOCAL ratio (nearest yardstick
        // sample on both sides), not the run-level scalar.
        val cls = classifyRow(recorded, rerun, contaminated, prev, localRatio(name))
        (name, recorded, rerun, contaminated, prev, cls)
      }
    val recheckJson = recheck.map { case (n, rec, rr, c, prev, cls) =>
      val rrJson = rr.map(_.toString).getOrElse("null")
      val lr = localRatio(n)
      val lyJson = {
        val ly = localYard(nameIdx.getOrElse(n, 0))
        if (ly.isNaN) "null" else ((ly * 1000).round / 1000.0).toString
      }
      val prevJson = prev.map { p =>
        val ratioAdj = ((rec / (p * lr)) * 100).round / 100.0
        s""","prev":$p,"prev_adjusted":${((p * lr) * 1000).round / 1000.0},"ratio_adjusted":$ratioAdj,"ratio_local_yard":${((lr) * 1000).round / 1000.0}"""
      }.getOrElse("")
      s"""\"$n\":{"recorded":$rec,"rerun":$rrJson,"contaminated":$c,"class":"$cls","yard_local":$lyJson$prevJson}"""
    }.mkString("{", ",", "}")
    val contaminatedJson = recheck.filter(_._4)
      .map("\"" + _._1 + "\"").mkString("[", ",", "]")
    // BASELINE.md's headline regime, measured end-to-end on this engine:
    // 10 blocks x 1,200 txs through parse+classify+enrich+upsert-write.
    val (txs, etlSecs, txPerS) =
      try graft.bench.EtlBench.run(spark)
      catch { case e: Throwable => System.err.println(s"[bench] etl failed: ${e.getMessage}"); (0L, 0.0, 0.0) }
    val prevYardJson = prevYardstick.map(_.toString).getOrElse("null")
    val yardRatioJson = ((yardRatio * 1000).round / 1000.0).toString
    // The in-run ambient index and its per-query application (r18
    // verdict #1): the series itself, each query normalized by its
    // NEAREST sample (query_s x yardstickRef / nearest_sample), and the
    // locally-normalized total — so a cross-round carried-suite delta is
    // explained by the artifact alone: compare queries_normalized maps,
    // not raw seconds.
    val seriesJson = ySamples
      .map { case (i, v) => s"[$i,${(v * 1000).round / 1000.0}]" }
      .mkString("[", ",", "]")
    val seriesRatioJson =
      seriesRatio.map(r => ((r * 1000).round / 1000.0).toString).getOrElse("null")
    // No yardstick (e.g. the yardstick face renamed/absent) ⇒ emit null
    // and an empty map, NOT raw seconds masquerading as normalized ones
    // (mirrors normalizedJson's degradation) — a cross-round consumer
    // reading "queries_normalized" must never see unnormalized values.
    val haveYard = ySamples.nonEmpty
    val qsNormSeq = medianSeq.map { case (name, v) =>
      val ly = localYard(nameIdx(name))
      val nv = if (ly.isNaN || ly <= 0) v else v * yardstickRef / ly
      name -> ((nv * 1000).round / 1000.0)
    }
    val qsNormJson =
      if (!haveYard) "{}"
      else qsNormSeq.map { case (k, v) => s"\"" + k + "\":" + v }
        .mkString("{", ",", "}")
    val totalNormLocal =
      if (!haveYard) "null"
      else ((qsNormSeq.map(_._2).sum * 10).round / 10.0).toString
    // The single-early-yardstick scalar is DEPRECATED whenever the in-run
    // series exists (r19 verdict #2): in r19 it read +16% while the
    // series-local total read −3% — the early sample happened to be the
    // run's fastest moment — so a consumer keying on the old field name
    // would conclude a regression the series refutes. The value is still
    // emitted (under the _scalar_deprecated name) for archaeology; only a
    // series-less run (yardstick face renamed/absent) keeps the old name,
    // because then the scalar is all there is.
    val totalNormField =
      if (haveYard) "total_normalized_scalar_deprecated" else "total_normalized"
    // Run config + code identity (r19 verdict #2): r19's quiet artifact
    // ran at 8 cpus while the driver's ran at 32, and neither said so —
    // a cross-round reader could not tell a config change from a host
    // change. Both JSON lines now carry the cpu count the session was
    // built with and the git HEAD the code was benched at.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val headJson = headSha().map("\"" + _ + "\"").getOrElse("null")
    // The prev chain the NEXT round compares against (r19 verdict #3):
    // recheck rows classed ok/ambient with a clean rerun enter at
    // min(recorded, rerun) — see [[adjudicated]]; all other entries keep
    // their recorded median.
    val adjOverrides = recheck.map { case (n, rec, rr, _, _, cls) =>
      n -> adjudicated(rec, rr, cls)
    }.toMap
    val qsAdjJson = medianSeq.map { case (k, v) =>
      s"\"" + k + "\":" + adjOverrides.getOrElse(k, v)
    }.mkString("{", ",", "}")
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","stat":"median_of_$runs","cpus":$cpus,"head_sha":$headJson,"yardstick_warm_s":$yardstickJson,"yardstick_ref_s":$yardstickRef,"prev_yardstick_warm_s":$prevYardJson,"yardstick_ratio_vs_prev":$yardRatioJson,"yardstick_series":$seriesJson,"yardstick_series_ratio_vs_prev":$seriesRatioJson,"run_degraded":$runDegraded,"$totalNormField":${normalizedJson(total)},"total_normalized_local":$totalNormLocal,"queries_normalized":$qsNormJson,"recheck":$recheckJson,"contaminated":$contaminatedJson,"queries":$qs,"queries_cold":$qsCold,"queries_adjudicated":$qsAdjJson,"sf":"$sfDir",""" +
      s""""etl_baseline_comparable":{"blocks":10,"transactions":$txs,"secs":$etlSecs,"tx_per_s":$txPerS,""" +
      s""""reference_tx_per_s":"200-300 (README.md:366, 12000 txs in 20-25s)"}}"""
    println(fullLine)
    // The stdout tail the driver captures truncates this ~8 KB line, so
    // also persist the complete record as a file artifact: every per-query
    // number survives the round regardless of log retention.
    try {
      // Anchored via SPARK_GRAFT_BENCH_OUT when the launcher's cwd is not
      // the repo root (spark-submit from elsewhere would otherwise drop
      // the artifact into a scratch dir and the round collector would
      // silently find nothing). The same path is what the NEXT round's
      // cross-round delta adjudication reads back as `prevQueries`.
      Option(benchOut.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.write(benchOut,
        fullLine.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case e: Throwable => System.err.println(s"[bench] artifact write failed: ${e.getMessage}") }
    // The full per-query line above is ~8 KB and the driver keeps only the
    // TAIL of stdout, decapitating it past JSON-parseability (every
    // BENCH_r*.json so far has parsed:null). Repeat the headline plus the
    // 10 slowest queries as one short self-contained line LAST, so the
    // retained tail always contains a complete parseable record.
    val slowest = results.toSeq.sortBy(-_._2).take(10)
      .map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    // Distinct metric name from the full line above: a consumer keying on
    // "total" must never pick this truncated tail record or double-count.
    println(s"""{"metric":"total_tail","value":$total,"unit":"sec","stat":"median_of_$runs","n_queries":${results.size},"cpus":$cpus,"head_sha":$headJson,""" +
      s""""yardstick_warm_s":$yardstickJson,"yardstick_ratio_vs_prev":$yardRatioJson,"yardstick_series":$seriesJson,"run_degraded":$runDegraded,"$totalNormField":${normalizedJson(total)},"total_normalized_local":$totalNormLocal,""" +
      s""""contaminated":$contaminatedJson,""" +
      s""""slowest":$slowest,"sf":"$sfDir","etl_tx_per_s":$txPerS,"etl_secs":$etlSecs}""")
    spark.stop()
  }
}
