package graft.graph

import graft.SparkTestBase

class TrianglesSpec extends SparkTestBase {
  import spark.implicits._

  test("K4: every vertex sits in C(3,2)=3 triangles") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst")
    val got = Triangles.perVertex(k4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("duplicate edges, reversed orientations, and self-loops normalize away") {
    val messy = Seq(
      (1L, 2L), (2L, 1L), (1L, 2L),  // one edge, three encodings
      (2L, 3L), (3L, 1L),
      (2L, 2L),                       // self-loop: dropped
      (4L, 5L))                       // dangling edge: no triangle
      .toDF("src", "dst")
    val got = Triangles.perVertex(messy).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangle-free graph returns no rows") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    assert(Triangles.perVertex(path).collect().isEmpty)
  }

  test("counts are repartition-stable") {
    // two K4s sharing vertex 1
    val edges = (Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)) ++
      Seq((1L, 5L), (1L, 6L), (1L, 7L), (5L, 6L), (5L, 7L), (6L, 7L)))
      .toDF("src", "dst")
    def run(d: org.apache.spark.sql.DataFrame) =
      Triangles.perVertex(d).collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(run(edges) == run(edges.repartition(9)))
    assert(run(edges).toMap.apply(1L) == 6L)
  }
}
