package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ClusterCollapseSpec extends SparkTestBase {
  import spark.implicits._

  private def labelMap(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    ClusterCollapse
      .connectedComponents(pairs.toDF("id_a", "id_b"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap

  test("two components and transitive closure collapse to min-id labels") {
    // 1-2, 2-3 (one triangle-free chain) and 5-6: transitivity must label 3
    // with 1 even though (1,3) was never a pair.
    val labels = labelMap(Seq((1L, 2L), (2L, 3L), (5L, 6L)))
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("reversed and duplicate pairs and self-loops are normalized away") {
    val labels = labelMap(Seq((2L, 1L), (1L, 2L), (2L, 1L), (3L, 3L), (4L, 3L)))
    // (3,3) is a self-loop: contributes nothing; (4,3) still forms {3,4}.
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
  }

  test("chain-shaped worst case converges in O(log n) rounds") {
    // A 256-node path is the adversarial case for naive min-propagation
    // (needs 255 rounds); large-star/small-star must stay logarithmic.
    val n = 256L
    val chain = (1L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (labels, rounds) = ClusterCollapse.connectedComponentsWithRounds(chain)
    assert(rounds <= 12, s"expected O(log n) rounds on a 256-chain, took $rounds")
    val collected = labels.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(collected.length === n)
    assert(collected.forall(_._2 == 1L))
  }

  test("collapse labels every doc, singletons survive as their own cluster") {
    val docs = (1L to 7L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val out = ClusterCollapse.collapse(docs, pairs)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out === Array(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (4L, 4L, true),
      (5L, 5L, true), (6L, 5L, false),
      (7L, 7L, true)))
  }

  test("empty pair set leaves every doc a surviving singleton") {
    val docs = (1L to 3L).toDF("doc_id")
    val pairs = spark.emptyDataset[(Long, Long)].toDF("id_a", "id_b")
    val out = ClusterCollapse.collapse(docs, pairs).orderBy("doc_id").collect()
    assert(out.map(_.getBoolean(2)).forall(identity))
    assert(out.map(r => r.getLong(0) -> r.getLong(1)).forall { case (d, c) => d == c })
  }

  test("survivor count equals component count and matches exact dedup's election") {
    // A star (hub 10) plus an isolated edge: min-id election everywhere.
    val docs = (1L to 12L).toDF("doc_id")
    val pairs = Seq((10L, 2L), (10L, 4L), (10L, 6L), (11L, 12L)).toDF("id_a", "id_b")
    val out = ClusterCollapse.collapse(docs, pairs)
    val survivors = out.filter(col("is_survivor")).select("doc_id")
      .as[Long].collect().sorted
    // {2,4,6,10} -> 2; {11,12} -> 11; the rest are singletons.
    assert(survivors === Array(1L, 2L, 3L, 5L, 7L, 8L, 9L, 11L))
  }

  test("collapseBy elects the highest score per cluster, min id on ties") {
    val docs = Seq(
      (1L, 10L), (2L, 50L), (3L, 50L), // cluster {1,2,3}: 2 and 3 tie -> 2
      (4L, 7L), (5L, 9L), // cluster {4,5}: 5 wins over the min id
      (6L, 1L)) // singleton survives regardless of score
      .toDF("doc_id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val out = ClusterCollapse.collapseBy(docs, pairs, scoreCol = "score")
      .select("doc_id", "cluster_id", "is_survivor")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(out == Set(
      (1L, 1L, false), (2L, 1L, true), (3L, 1L, false),
      (4L, 4L, false), (5L, 4L, true),
      (6L, 6L, true)))
  }
}
