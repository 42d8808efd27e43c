package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle counting on an undirected graph — the classic graph
  * statistic behind clustering coefficients and community density, and the
  * canonical "order the join or it explodes" distributed-graph exercise.
  *
  * Algorithm (the standard compact-forward / ordered-wedge shape): keep
  * each undirected edge once as (lo, hi) with lo < hi, build wedges by
  * joining edges on their low endpoint (a<b, a<c, b<c), and close each
  * wedge against the edge set. Every triangle {a,b,c} with a<b<c is
  * counted exactly once as the wedge (b, c) centered at a closed by edge
  * (b, c) — no double counting, and the wedge join fans out on the
  * ORDERED degree (each vertex only pairs its higher neighbors), which is
  * what keeps hub vertices from exploding the join at scale (the
  * direction a real implementation strengthens further by ordering on
  * degree rather than id).
  *
  * Input `edges` may carry duplicates, self-loops, or both orientations;
  * normalization dedups to the canonical lo<hi form first.
  */
object Triangles {

  /** Per-vertex triangle participation counts: (vertex, n_triangles),
    * vertices in no triangle omitted.
    */
  def perVertex(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    // Persisted: the canonical edge set is read three times (both wedge
    // legs + the closing join) — un-persisted, the caller's edge lineage
    // (often itself a self-join) re-ran per leg (guide §2.4).
    val e = graft.util.CacheScope.persist(edges
      .select(
        least(col(srcCol), col(dstCol)).as("lo"),
        greatest(col(srcCol), col(dstCol)).as("hi"))
      .filter(col("lo") < col("hi"))
      .distinct())
    // Wedges centered at a: (a,b) and (a,c) with b < c; close with (b,c).
    val wedges = e.as("e1")
      .join(e.as("e2"),
        col("e1.lo") === col("e2.lo") && col("e1.hi") < col("e2.hi"))
      .select(col("e1.lo").as("a"), col("e1.hi").as("b"), col("e2.hi").as("c"))
    val tris = wedges
      .join(e.as("e3"), col("b") === col("e3.lo") && col("c") === col("e3.hi"))
      .select("a", "b", "c")
    tris
      .select(explode(array(col("a"), col("b"), col("c"))).as("vertex"))
      .groupBy("vertex")
      .agg(count(lit(1)).as("n_triangles"))
  }
}
