package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.util.CacheScope.CheckpointOps

/** k-core decomposition by synchronous peeling: repeatedly delete every
  * vertex whose degree in the CURRENT subgraph is below k; what survives
  * is the k-core — the standard graph-density filter (Seidman 1983): in
  * a near-dup or co-occurrence graph the k-core is the "everything here
  * is corroborated k ways" region, and peeling order is a useful
  * centrality proxy.
  *
  * Each round is two map-side-combined degree rollups + one semi-join of
  * the edge set against the survivor list — the edge set stays
  * distributed end to end (no driver-side peeling), and rounds are
  * checkpointed like ClusterCollapse's so the plan tree stays one layer
  * deep. Peeling deletes monotonically, so the round count is bounded by
  * the longest deletion cascade; `rounds = Some(r)` pins an exact
  * r-round semantics (the g4 fixed-round pattern — what a SQL mirror can
  * unroll), `rounds = None` (default) runs to the true fixpoint.
  */
object KCore {

  /** Vertices of the (k-core after `rounds` peels | true k-core), with
    * their degree in the surviving induced subgraph. Input edges are
    * symmetrized/deduplicated; self-loops dropped.
    */
  def kCore(
      edges: DataFrame,
      k: Int,
      rounds: Option[Int] = None,
      srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds.forall(_ >= 1), s"rounds must be >= 1, got $rounds")
    // canonical undirected edge set (u < v), self-loops out
    var e = edges
      .select(
        least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") < col("v"))
      .distinct()
      .scopedCheckpoint()
    var done = false
    var r = 0
    // carried across rounds: last round's `after` IS this round's edge
    // count — one count job per round, not two.
    var before = e.count()
    val maxRounds = rounds.getOrElse(Int.MaxValue)
    while (!done && r < maxRounds) {
      val deg = e.select(col("u").as("n")).union(e.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("__d"))
      val keep = deg.filter(col("__d") >= k).select("n")
      val next = e
        .join(keep.withColumnRenamed("n", "u"), Seq("u"), "left_semi")
        .join(keep.withColumnRenamed("n", "v"), Seq("v"), "left_semi")
        .select("u", "v")
        .scopedCheckpoint()
      val after = next.count()
      graft.util.CacheScope.releaseCheckpoint(e)
      e = next
      r += 1
      // fixpoint: a peel that deletes no edge deletes no vertex either
      // (degrees only change via edge deletions), so stop — except under
      // pinned `rounds`, where the caller asked for exactly r peels.
      done = rounds.isEmpty && after == before
      before = after
    }
    // Endpoints of the surviving edge set with their induced degrees. At
    // the fixpoint every degree is >= k by definition; under pinned
    // `rounds` a vertex may still sit below k (it would peel next round)
    // — that IS the r-round semantics, and the SQL mirror sees the same.
    e.select(col("u").as("n")).union(e.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).cast("long").as("degree"))
      .select(col("n").as("vertex"), col("degree"))
  }
}
