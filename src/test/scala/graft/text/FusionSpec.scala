package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class FusionSpec extends SparkTestBase {
  import spark.implicits._

  // one query; lexical ranks docs (10, 20, 30), dense ranks (20, 40, 30):
  // doc 20 appears in both legs at ranks (2, 1), doc 30 in both at (3, 3),
  // docs 10 and 40 each in exactly one leg.
  private def lex = Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L))
    .toDF("query_id", "doc_id", "rank")
  private def den = Seq((1L, 20L, 1L), (1L, 40L, 2L), (1L, 30L, 3L))
    .toDF("query_id", "doc_id", "rank")

  test("rrf scores are the exact reciprocal-rank sums; both-leg docs rise") {
    val got = Fusion.rrf(Seq("lex" -> lex, "dense" -> den), k = 10)
      .orderBy("rk")
      .collect()
      .map(r => (r.getLong(2), r.getDouble(3)))
    val expected = Seq(
      20L -> (1.0 / 62 + 1.0 / 61), // both legs, best combined
      30L -> (1.0 / 63 + 1.0 / 63),
      10L -> (1.0 / 61), // lexical #1, absent from dense
      40L -> (1.0 / 62))
    assert(got.toSeq == expected,
      s"got ${got.toSeq} expected $expected")
  }

  test("missing legs carry null ranks, present legs keep theirs") {
    val rows = Fusion.rrf(Seq("lex" -> lex, "dense" -> den), k = 10)
      .orderBy("doc_id")
      .select("doc_id", "lex_rank", "dense_rank")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(rows.toSeq == Seq(
      (10L, Some(1L), None),
      (20L, Some(2L), Some(1L)),
      (30L, Some(3L), Some(3L)),
      (40L, None, Some(2L))))
  }

  test("a single leg degenerates to that leg's own ranking") {
    val got = Fusion.rrf(Seq("only" -> lex), k = 10)
      .orderBy("rk").select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(10L, 20L, 30L))
  }

  test("k bounds the output per query; ties break toward the lower doc id") {
    // two docs sharing identical (rank, rank) pairs -> identical rrf
    val a = Seq((1L, 5L, 1L), (1L, 7L, 2L)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 7L, 1L), (1L, 5L, 2L)).toDF("query_id", "doc_id", "rank")
    val got = Fusion.rrf(Seq("a" -> a, "b" -> b), k = 1)
      .select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(5L)) // equal scores -> doc 5 wins the tie, k=1 cuts 7
  }

  test("fusion is repartition-stable and independent of input row order") {
    def run(l: org.apache.spark.sql.DataFrame, d: org.apache.spark.sql.DataFrame) =
      Fusion.rrf(Seq("lex" -> l, "dense" -> d), k = 10)
        .orderBy("rk")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(run(lex, den) == run(lex.repartition(7), den.orderBy(col("doc_id").desc)))
  }

  test("three legs fuse with three rank columns and a three-term sum") {
    val third = Seq((1L, 30L, 1L), (1L, 50L, 2L)).toDF("query_id", "doc_id", "rank")
    val got = Fusion.rrf(Seq("lex" -> lex, "dense" -> den, "phrase" -> third), k = 10)
    assert(got.columns.toSeq ==
      Seq("query_id", "rk", "doc_id", "rrf", "lex_rank", "dense_rank", "phrase_rank"))
    val byDoc = got.collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
    // doc 30 now carries all three legs: 1/63 + 1/63 + 1/61
    assert(byDoc(30L) == 1.0 / 63 + 1.0 / 63 + 1.0 / 61, s"got $byDoc")
    // doc 50 exists only in the third leg
    assert(byDoc(50L) == 0.0 + 0.0 + 1.0 / 62, s"got $byDoc")
  }

  test("duplicate leg names are rejected") {
    intercept[IllegalArgumentException] {
      Fusion.rrf(Seq("x" -> lex, "x" -> den), k = 5)
    }
  }
}
