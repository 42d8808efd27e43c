package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.util.CacheScope.CheckpointOps

/** Near-duplicate cluster collapse: the step after pair generation that
  * every real dedup run ends with — "which rows do I drop". Takes the pair
  * outputs of [[Dedup.minhashLshPairs]] / [[Dedup.simhashPairs]] /
  * [[graft.similarity.Similarity.nearDupPairs]], computes connected
  * components (near-duplication is transitive in intent: if A~B and B~C,
  * one survivor should represent all three), and elects the min-id member
  * of each component as its survivor. The reference's analog is its
  * exact-KEY collapse — UPSERT last-write-wins (src/etl/load.rs:239-279);
  * this is the near-dup generalization.
  *
  * The algorithm is alternating large-star / small-star min-id label
  * propagation (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC'14) — each round is two shuffles of the EDGE set and the
  * round count is O(log n) even on pathological chain-shaped components,
  * where naive min-propagation needs O(diameter) = O(n) rounds. Never a
  * driver-side union-find: the edge set stays distributed end to end, so
  * the operator survives pair sets that don't fit one machine (a
  * boilerplate-heavy corpus can emit billions of pairs).
  *
  *  - large-star: every node points its LARGER neighbors at the minimum of
  *    its neighborhood (cuts long chains in half);
  *  - small-star: every node and its smaller neighbors re-point at the
  *    neighborhood minimum (flattens the partial trees into stars).
  *
  * Convergence = the edge set reaches a fixpoint (each round's output is
  * compared by an order-independent (count, bit_xor of row hashes)
  * checksum — one cheap action per round). At the fixpoint the edges are
  * exactly a star forest: (member -> component minimum).
  */
object ClusterCollapse {

  /** (count, xor-of-row-hashes): order-independent edge-set fingerprint.
    * bit_xor, not sum — ANSI mode makes a sum of 64-bit hashes throw on
    * overflow, and xor is overflow-free by construction.
    */
  private def checksum(edges: DataFrame): (Long, Long) = {
    val r = edges
      .agg(count(lit(1)), coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L)))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  /** One large-star round over canonical (u > v) edges. Both directions of
    * each edge are considered; every node u emits (w, min(N(u) ∪ u)) for
    * its strictly larger neighbors w. Output is canonical again (w > min).
    * The groupBy-min + join-back shape keeps the hot-node path map-side
    * combinable — a collect_list per node would serialize a star's whole
    * neighborhood into one row.
    */
  private def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy("u").agg(min("v").as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("m"))
    sym.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** One small-star round: every node u re-points itself and its smaller
    * neighbors at min(smaller neighbors) — with canonical u > v input that
    * minimum is just min(v). Output stays canonical (everything emitted
    * points at the group min, from strictly above it).
    */
  private def smallStar(edges: DataFrame): DataFrame = {
    val mins = edges.groupBy("u").agg(min("v").as("m"))
    val withMin = edges.join(mins, "u")
    withMin.select(col("v").as("u"), col("m").as("v"))
      .union(mins.select(col("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Connected components of the pair graph: one row (id, cluster_id) per
    * node APPEARING IN `pairs`, cluster_id = the component's minimum id.
    * Returns the label map and the number of large+small rounds it took —
    * the ScaleProbe hook that pins O(log n) behavior on chain graphs.
    *
    * Each round's edge set is `localCheckpoint`ed, not merely persisted:
    * every round references its input ~6 times (symmetrization + the min
    * join-back on both stars), so without lineage TRUNCATION the logical
    * plan tree grows ~6x per round — exponential analysis cost and a
    * driver stack overflow near round 10 (measured). Checkpointing keeps
    * each round's plan one layer deep; the edge set is small (two longs a
    * row) next to the corpus. On a real cluster prefer
    * `spark.sparkContext.setCheckpointDir` + `.checkpoint()` if executor
    * loss during the handful of rounds must be survivable.
    */
  def connectedComponentsWithRounds(
      pairs: DataFrame,
      idACol: String = "id_a",
      idBCol: String = "id_b",
      maxRounds: Int = 30): (DataFrame, Int) = {
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    var edges = pairs
      .select(
        greatest(col(idACol), col(idBCol)).as("u"),
        least(col(idACol), col(idBCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .scopedCheckpoint()
    var sig = checksum(edges)
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val prev = edges
      val next = smallStar(largeStar(edges)).scopedCheckpoint()
      val nextSig = checksum(next)
      edges = next
      rounds += 1
      // The fingerprint is probabilistic; a collision would stop early
      // with wrong components. Backstop: the ONE round where fingerprints
      // first agree pays an exact set-equality check (same count already
      // verified, so one anti-join direction suffices).
      converged = nextSig == sig && next.except(prev).isEmpty
      sig = nextSig
      // prev's last reader (the except above) has run; free its blocks so
      // the loop holds at most two rounds' edge sets, not all of them.
      graft.util.CacheScope.releaseCheckpoint(prev)
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxRounds rounds — " +
          "raise maxRounds (expected O(log n) rounds; this is a backstop, not a tuning knob)")
    // Fixpoint edges are a star forest: u = member, v = its component min.
    // Roots appear only on the v side and label themselves.
    val labels = edges.select(col("u").as("id"), col("v").as("cluster_id"))
      .union(edges.select(col("v").as("id"), col("v").as("cluster_id")).distinct())
    (labels, rounds)
  }

  /** [[connectedComponentsWithRounds]] without the round count. */
  def connectedComponents(
      pairs: DataFrame,
      idACol: String = "id_a",
      idBCol: String = "id_b",
      maxRounds: Int = 30): DataFrame =
    connectedComponentsWithRounds(pairs, idACol, idBCol, maxRounds)._1

  /** The full collapse: every document labeled with its cluster and its
    * survivor flag. Documents in no pair are their own (singleton) cluster;
    * the survivor of every cluster is its minimum id — deterministic, and
    * consistent with [[Dedup.exact]]'s min-id election. Downstream, keeping
    * rows where `is_survivor` IS the dedup.
    */
  def collapse(
      docs: DataFrame,
      pairs: DataFrame,
      idCol: String = "doc_id",
      idACol: String = "id_a",
      idBCol: String = "id_b",
      maxRounds: Int = 30): DataFrame = {
    val cc = connectedComponents(pairs, idACol, idBCol, maxRounds)
      .withColumnRenamed("id", idCol)
    docs.select(col(idCol))
      .join(cc, Seq(idCol), "left_outer")
      .select(
        col(idCol),
        coalesce(col("cluster_id"), col(idCol)).as("cluster_id"))
      .withColumn("is_survivor", col(idCol) === col("cluster_id"))
  }

  /** [[collapse]] with QUALITY-aware survivor election: per cluster, the
    * member with the highest `scoreCol` wins (ties break toward the lower
    * id, keeping elections deterministic) — what real dedup pipelines
    * want, where min-id keeps an arbitrary copy but "the longest / least
    * boilerplate / highest-scoring duplicate" should survive. The
    * election is one map-side-combinable max_by per cluster joined back —
    * never a per-cluster window funnel. Cluster ids remain the component
    * minimum (stable labels); only the survivor flag moves.
    */
  def collapseBy(
      docs: DataFrame,
      pairs: DataFrame,
      scoreCol: String,
      idCol: String = "doc_id",
      idACol: String = "id_a",
      idBCol: String = "id_b",
      maxRounds: Int = 30): DataFrame = {
    // Persisted: the labeled table feeds the winner election AND the
    // final join — un-persisted, the component labeling re-ran per use.
    val labeled = graft.util.CacheScope.persist(
      collapse(docs, pairs, idCol, idACol, idBCol, maxRounds)
        .drop("is_survivor")
        .join(docs.select(col(idCol), col(scoreCol)), Seq(idCol)))
    val winners = labeled
      .groupBy("cluster_id")
      .agg(max_by(
        col(idCol),
        struct(col(scoreCol), negate(col(idCol)))).as("__winner"))
    labeled
      .join(winners, Seq("cluster_id"))
      .withColumn("is_survivor", col(idCol) === col("__winner"))
      .select(idCol, "cluster_id", scoreCol, "is_survivor")
  }
}
