package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.util.CacheScope.CheckpointOps

/** Power-iteration PageRank in FIXED-POINT integer arithmetic — the graph
  * centrality rollup beyond [[graft.dedup.ClusterCollapse]]'s connectivity
  * (rank near-dup clusters by authority, weight link-farm detection,
  * order crawl frontiers). Floating-point PageRank is aggregation-order
  * dependent (parallel partial sums re-associate), so it can never be
  * value-verified against an independent engine; here every rank is a
  * BIGINT number of "mass units" and every step is integer add / multiply
  * / floor-divide — bit-identical under any partitioning, any engine.
  *
  *   rank_0(v)   = totalMass div N
  *   contrib(u→v) = rank_i(u) div outdeg(u)
  *   rank_i+1(v) = base + (dampNum * Σ contrib) div dampDen
  *   base        = ((dampDen - dampNum) * totalMass div dampDen) div N
  *
  * Floor-divisions deterministically shed sub-unit remainders (bounded by
  * edges + N units per iteration — at totalMass 1e12 that is relative
  * error ~1e-6, far below any ranking use); dangling nodes' mass sheds
  * the same way, the standard simplification. Scale shape per iteration:
  * ranks are one row per node; the contribution pass is one equi-join of
  * edges against (rank, outdeg) — both keyed on the source, map-side
  * combinable into per-target sums — and the update is a left join of
  * nodes against those sums. Ranks `localCheckpoint` each round (the
  * iterative-lineage trap, see ClusterCollapse); edges are consumed once
  * per iteration and should be persisted BY THE CALLER if the input is a
  * derived frame (the registered query persists; a parquet-backed edge
  * table needs nothing).
  */
object PageRank {

  def run(
      edges: DataFrame, // (u, t): one row per directed edge u -> t
      nodes: DataFrame, // (v): the full vertex set (isolated nodes included)
      iters: Int,
      totalMass: Long = 1000000000000L,
      dampNum: Long = 85,
      dampDen: Long = 100): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(dampDen > 0 && dampNum >= 0 && dampNum <= dampDen,
      s"damping must satisfy 0 <= num <= den, got $dampNum/$dampDen")
    val n = nodes.count()
    require(n > 0, "PageRank needs at least one node")
    val deg = edges.groupBy("u").agg(count(lit(1)).as("outdeg"))
    val base = ((dampDen - dampNum) * totalMass / dampDen) / n
    // Ranks are one row per NODE — unlike kmeansCore's bounded centroid
    // table they must stay partitioned (a coalesce(1) here would funnel
    // the whole vertex set through one task at cluster scale).
    var ranks = nodes.select(col("v"), lit(totalMass / n).as("rank_fp"))
      .scopedCheckpoint()
    for (_ <- 0 until iters) {
      val prev = ranks
      val contribs = edges
        .join(ranks.withColumnRenamed("v", "u"), "u")
        .join(deg, "u")
        .select(col("t").as("v"), expr("rank_fp div outdeg").as("c"))
        .groupBy("v").agg(sum(col("c")).as("in_sum"))
      ranks = nodes.select(col("v"))
        .join(contribs, Seq("v"), "left_outer")
        .select(col("v"),
          (lit(base) + expr(s"($dampNum * coalesce(in_sum, 0)) div $dampDen"))
            .as("rank_fp"))
        .scopedCheckpoint()
      // New round materialized -> previous round's blocks are dead; free
      // them so the loop never holds more than two |V|-row rank tables.
      graft.util.CacheScope.releaseCheckpoint(prev)
    }
    ranks
  }

  /** Weighted edges: contribution is proportional to integer edge weight —
    * `contrib(u→v) = (rank(u) * w) div Σ_u w` — the citation-count /
    * link-multiplicity form. Same fixed-point guarantees as [[run]]
    * (products stay far below 2^63 at the default mass and small
    * weights); `run` is exactly this with every weight 1.
    */
  def runWeighted(
      edges: DataFrame, // (u, t, w): directed edge u -> t with weight w >= 1
      nodes: DataFrame,
      iters: Int,
      totalMass: Long = 1000000000000L,
      dampNum: Long = 85,
      dampDen: Long = 100): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(dampDen > 0 && dampNum >= 0 && dampNum <= dampDen,
      s"damping must satisfy 0 <= num <= den, got $dampNum/$dampDen")
    val n = nodes.count()
    require(n > 0, "PageRank needs at least one node")
    val wsum = edges.groupBy("u").agg(sum(col("w")).as("wsum"))
    val base = ((dampDen - dampNum) * totalMass / dampDen) / n
    var ranks = nodes.select(col("v"), lit(totalMass / n).as("rank_fp"))
      .scopedCheckpoint()
    for (_ <- 0 until iters) {
      val prev = ranks
      val contribs = edges
        .join(ranks.withColumnRenamed("v", "u"), "u")
        .join(wsum, "u")
        .select(col("t").as("v"), expr("(rank_fp * w) div wsum").as("c"))
        .groupBy("v").agg(sum(col("c")).as("in_sum"))
      ranks = nodes.select(col("v"))
        .join(contribs, Seq("v"), "left_outer")
        .select(col("v"),
          (lit(base) + expr(s"($dampNum * coalesce(in_sum, 0)) div $dampDen"))
            .as("rank_fp"))
        .scopedCheckpoint()
      // Same release contract as run(): at most two live rank tables.
      graft.util.CacheScope.releaseCheckpoint(prev)
    }
    ranks
  }

  /** The DuckDB mirror of [[runWeighted]]: `edgesCte` must define
    * `edges(u, t, w)`.
    */
  def oracleSqlWeighted(
      nodesCte: String, edgesCte: String, iters: Int,
      totalMass: Long = 1000000000000L,
      dampNum: Long = 85,
      dampDen: Long = 100): String = {
    val header =
      s"""WITH $nodesCte,
         |$edgesCte,
         |wsum AS (SELECT u, sum(w) AS wsum FROM edges GROUP BY u),
         |nn AS (SELECT count(*) AS n FROM nodes),
         |r0 AS (SELECT v, $totalMass // (SELECT n FROM nn) AS rank_fp FROM nodes)""".stripMargin
    val rounds = (0 until iters).map { i =>
      s"""r${i + 1} AS (
         |  SELECT nodes.v,
         |         ((($dampDen - $dampNum) * $totalMass // $dampDen) // (SELECT n FROM nn))
         |           + ($dampNum * coalesce(s.in_sum, 0)) // $dampDen AS rank_fp
         |  FROM nodes LEFT JOIN (
         |    SELECT e.t AS v, sum((r$i.rank_fp * e.w) // wsum.wsum) AS in_sum
         |    FROM edges e JOIN r$i ON e.u = r$i.v JOIN wsum ON e.u = wsum.u
         |    GROUP BY e.t) s ON nodes.v = s.v)""".stripMargin
    }.mkString(",\n")
    s"""$header${if (iters > 0) ",\n" + rounds else ""}
       |SELECT v, CAST(rank_fp AS BIGINT) AS rank_fp FROM r$iters ORDER BY v""".stripMargin
  }

  /** The DuckDB mirror: the same fixed-point recurrence as `iters` chained
    * CTEs over `edgesCte` (must define `edges(u, t)`) and `nodesCte`
    * (must define `nodes(v)`). `//` is DuckDB's integer floor-divide —
    * identical to `div` on the non-negative values here.
    */
  def oracleSql(
      nodesCte: String, edgesCte: String, iters: Int,
      totalMass: Long = 1000000000000L,
      dampNum: Long = 85,
      dampDen: Long = 100): String = {
    val header =
      s"""WITH $nodesCte,
         |$edgesCte,
         |deg AS (SELECT u, count(*) AS outdeg FROM edges GROUP BY u),
         |nn AS (SELECT count(*) AS n FROM nodes),
         |r0 AS (SELECT v, $totalMass // (SELECT n FROM nn) AS rank_fp FROM nodes)""".stripMargin
    val rounds = (0 until iters).map { i =>
      s"""r${i + 1} AS (
         |  SELECT nodes.v,
         |         ((($dampDen - $dampNum) * $totalMass // $dampDen) // (SELECT n FROM nn))
         |           + ($dampNum * coalesce(s.in_sum, 0)) // $dampDen AS rank_fp
         |  FROM nodes LEFT JOIN (
         |    SELECT e.t AS v, sum(r$i.rank_fp // deg.outdeg) AS in_sum
         |    FROM edges e JOIN r$i ON e.u = r$i.v JOIN deg ON e.u = deg.u
         |    GROUP BY e.t) s ON nodes.v = s.v)""".stripMargin
    }.mkString(",\n")
    s"""$header${if (iters > 0) ",\n" + rounds else ""}
       |SELECT v, CAST(rank_fp AS BIGINT) AS rank_fp FROM r$iters ORDER BY v""".stripMargin
  }
}
