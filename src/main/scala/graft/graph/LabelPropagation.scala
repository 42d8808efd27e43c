package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.util.CacheScope.CheckpointOps

/** Synchronous label propagation (Raghavan et al. 2007) made DETERMINISTIC:
  * every vertex starts as its own label; each round it adopts the most
  * frequent label among its neighbors, ties to the SMALLEST label — the
  * async/random-order variants converge faster but are irreproducible,
  * and a data-engine operator must hash-match across engines and runs, so
  * this is the synchronized fixed-round form (communities stabilize in a
  * handful of rounds on modular graphs; `rounds` is the caller's budget).
  *
  * Shape at scale: one round = one join of the adjacency list against the
  * |V|-row label table + a map-side-combined (vertex, label) count + an
  * argmax — all hash-partitioned on the vertex, nothing quadratic; the
  * label table localCheckpoints per round (the PageRank/kmeans loop
  * contract) so lineage stays flat. Deliberately NOT min-propagation:
  * [[graft.dedup.ClusterCollapse]] computes components; frequency voting
  * finds DENSE regions inside a component.
  */
object LabelPropagation {

  /** (vertex, community) after `rounds` synchronous votes over the
    * undirected edge set (duplicates/self-loops/orientations normalized
    * away). Isolated vertices don't occur (vertices are edge endpoints).
    */
  def communities(
      edges: DataFrame, rounds: Int,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val e = edges
      .select(
        least(col(srcCol), col(dstCol)).as("lo"),
        greatest(col(srcCol), col(dstCol)).as("hi"))
      .filter(col("lo") < col("hi"))
      .distinct()
    // Loop-invariant: the normalized adjacency (dedup shuffle + union) is
    // consumed once per round PLUS the initial vertex set — persist it
    // once instead of re-running the distinct per consumer (guide §2.4;
    // 2|E| rows).
    val nbr = graft.util.CacheScope.persist(
      e.select(col("lo").as("v"), col("hi").as("u"))
        .unionByName(e.select(col("hi").as("v"), col("lo").as("u"))))
    var labels = nbr.select(col("v").as("vertex"))
      .distinct()
      .withColumn("lbl", col("vertex"))
      .scopedCheckpoint()
    for (_ <- 0 until rounds) {
      val prev = labels
      labels = nbr
        .join(labels.select(col("vertex").as("u"), col("lbl")), Seq("u"))
        .groupBy(col("v"), col("lbl"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("v"))
        // argmax by (count desc, label asc) as a MIN over (-count, label):
        // the negation lands on the always-numeric count, so any orderable
        // label type works (negate on a string label would implicitly cast
        // to double -> null and silently destroy the tie-break).
        .agg(min_by(col("lbl"), struct(negate(col("c")), col("lbl"))).as("lbl"))
        .select(col("v").as("vertex"), col("lbl"))
        .scopedCheckpoint()
      // The new round's checkpoint is materialized (eager=true), so the
      // previous round's blocks are dead weight — release them, or every
      // round's |V|-row table stays live in executor storage until job end.
      graft.util.CacheScope.releaseCheckpoint(prev)
    }
    labels.select(col("vertex"), col("lbl").as("community"))
  }
}
