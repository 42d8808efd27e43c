package graft.text

import graft.SparkTestBase

class InvertedIndexSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    (5L, "b a b"),
    (2L, "a c"),
    (9L, "b"))
    .toDF("doc_id", "text")

  test("postings are sorted by doc id with df/cf counts") {
    val got = InvertedIndex.build(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getSeq[Long](3).toList)).toMap
    assert(got("a") == ((2L, 2L, List(2L, 5L))))
    assert(got("b") == ((2L, 3L, List(5L, 9L))))
    assert(got("c") == ((1L, 1L, List(2L))))
  }

  test("gaps delta-encode the postings; first gap is the first id") {
    val got = InvertedIndex.build(docs).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](4).toList).toMap
    assert(got("a") == List(2L, 3L))   // 2, 5-2
    assert(got("b") == List(5L, 4L))   // 5, 9-5
    assert(got("c") == List(2L))
  }

  test("incremental merge over disjoint batches equals a full rebuild") {
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getSeq[Long](3).toList, r.getSeq[Long](4).toList)).sortBy(_._1).toSeq
    val full = canon(InvertedIndex.build(docs))
    // three deltas, one per doc — the finest split is the hardest case
    // (every term's final postings cross delta boundaries)
    val deltas = Seq(5L, 2L, 9L).map(id =>
      InvertedIndex.buildDelta(docs.filter($"doc_id" === id)))
    val merged = canon(InvertedIndex.mergeDeltas(deltas.reduce(_ unionByName _)))
    assert(merged == full)
    // and merging a single delta covering everything is build() itself
    assert(canon(InvertedIndex.mergeDeltas(InvertedIndex.buildDelta(docs))) == full)
  }

  test("compaction: compact-then-merge equals merging the raw deltas") {
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getSeq[Long](3).toList, r.getSeq[Long](4).toList)).sortBy(_._1).toSeq
    val deltas = Seq(5L, 2L, 9L).map(id =>
      InvertedIndex.buildDelta(docs.filter($"doc_id" === id)))
    val raw = deltas.reduce(_ unionByName _)
    // compact the first two deltas, leave the third raw — the mid-stream
    // LSM state; the read must not care.
    val partial = InvertedIndex.compactDeltas(deltas(0).unionByName(deltas(1)))
      .unionByName(deltas(2))
    assert(canon(InvertedIndex.mergeDeltas(partial)) == canon(InvertedIndex.mergeDeltas(raw)))
    // a compacted pile is ONE row per term
    val counts = InvertedIndex.compactDeltas(raw).groupBy("term").count()
      .collect().map(_.getLong(1))
    assert(counts.forall(_ == 1L))
  }

  test("index is repartition-stable") {
    def run(d: org.apache.spark.sql.DataFrame) =
      InvertedIndex.build(d).collect()
        .map(r => (r.getString(0), r.getSeq[Long](3).mkString(","))).sorted.toSeq
    assert(run(docs) == run(docs.repartition(5)))
  }
}
