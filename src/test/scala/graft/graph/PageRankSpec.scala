package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class PageRankSpec extends SparkTestBase {
  import spark.implicits._

  test("a ring graph stays uniform; iters=0 is the uniform init") {
    val nodes = spark.range(10).select(col("id").as("v"))
    val ring = nodes.select(col("v").as("u"), ((col("v") + 1) % 10).as("t"))
    for (it <- Seq(0, 3)) {
      val ranks = PageRank.run(ring, nodes, iters = it)
        .select("rank_fp").as[Long].collect().toSet
      assert(ranks.size == 1, s"ring must stay uniform at iters=$it, got $ranks")
    }
  }

  test("an authority hub outranks leaf nodes and total mass is conserved (minus shed)") {
    // Star: every node points at 0; 0 points at 1.
    val nodes = spark.range(20).select(col("id").as("v"))
    val edges = nodes.filter(col("v") =!= 0).select(col("v").as("u"), lit(0L).as("t"))
      .unionByName(Seq((0L, 1L)).toDF("u", "t"))
    val ranks = PageRank.run(edges, nodes, iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(ranks(0L) > ranks(1L) && ranks(1L) > ranks(2L))
    assert(ranks.filterKeys(_ >= 2).values.toSet.size == 1) // leaves identical
    val total = ranks.values.sum
    val mass = 1000000000000L
    // Floor-divides shed < 1 unit per div: base (n), contribs (edges), damp (n).
    assert(total <= mass && total > mass - 5L * (20 + 20 + 20))
  }

  test("weighted with unit weights equals unweighted; heavier edges pull more rank") {
    val nodes = spark.range(50).select(col("id").as("v"))
    val edges = nodes.select(col("v").as("u"),
      explode(array((col("v") * 3 + 1) % 50, (col("v") * 17 + 5) % 50)).as("t"))
      .distinct()
    val plain = PageRank.run(edges, nodes, iters = 3)
      .as[(Long, Long)].collect().toSet
    val unit = PageRank.runWeighted(edges.withColumn("w", lit(1L)), nodes, iters = 3)
      .as[(Long, Long)].collect().toSet
    assert(unit == plain)
    // Two nodes each split mass between targets a and b; weighting the
    // a-edges 9:1 must rank a above b (unweighted they tie).
    val tiny = Seq((1L, 10L, 9L), (1L, 11L, 1L), (2L, 10L, 9L), (2L, 11L, 1L))
      .toDF("u", "t", "w")
    val tinyNodes = Seq(1L, 2L, 10L, 11L).toDF("v")
    val ranks = PageRank.runWeighted(tiny, tinyNodes, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(ranks(10L) > ranks(11L))
  }

  test("is repartition-stable (pure integer arithmetic)") {
    val nodes = spark.range(100).select(col("id").as("v"))
    val edges = nodes.select(col("v").as("u"),
      explode(array((col("v") * 3 + 1) % 100, (col("v") * 17 + 5) % 100)).as("t"))
      .distinct()
    val a = PageRank.run(edges, nodes, iters = 4)
      .as[(Long, Long)].collect().toSet
    val b = PageRank.run(edges.repartition(13), nodes.repartition(7), iters = 4)
      .as[(Long, Long)].collect().toSet
    assert(a == b)
  }
}
