package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.dedup.SpanDedup

class IntervalMergeSpec extends SparkTestBase {
  import spark.implicits._

  test("merges overlapping and (by default) touching intervals per key") {
    val iv = Seq(
      // key a: [0,5) + [3,8) overlap; [8,10) touches; [20,25) is separate
      ("a", 0L, 5L), ("a", 3L, 8L), ("a", 8L, 10L), ("a", 20L, 25L),
      // key b: a contained interval must not extend its span
      ("b", 0L, 100L), ("b", 10L, 20L)).toDF("k", "s", "e")
    val got = IntervalMerge.merge(iv, Seq("k"), "s", "e")
      .select("k", "span_start", "span_end", "n_merged")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(("a", 0L, 10L, 3L), ("a", 20L, 25L, 1L), ("b", 0L, 100L, 2L)))
  }

  test("mergeTouching=false keeps adjacent half-open intervals apart") {
    val iv = Seq(("a", 0L, 5L), ("a", 5L, 8L), ("a", 7L, 9L)).toDF("k", "s", "e")
    val got = IntervalMerge.merge(iv, Seq("k"), "s", "e", mergeTouching = false)
      .select("span_start", "span_end").as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 5L), (5L, 9L)))
  }

  test("is repartition-stable") {
    val iv = (0 until 500).map(i => ("k" + i % 7, (i * 13 % 97).toLong, (i * 13 % 97 + 5).toLong))
      .toDF("k", "s", "e")
    val once = IntervalMerge.merge(iv, Seq("k"), "s", "e")
      .collect().map(_.toSeq).toSet
    val again = IntervalMerge.merge(iv.repartition(11), Seq("k"), "s", "e")
      .collect().map(_.toSeq).toSet
    assert(once == again && once.nonEmpty)
  }

  test("slidingSpanStats: straddling repeats merge into one maximal span") {
    // Docs 1 and 2 share a 12-token run at different offsets; with k=10
    // the run yields 3 hot windows each, coalescing to one span of 12.
    val shared = (1 to 12).map(i => s"x$i").mkString(" ")
    val docs = Seq(
      (1L, s"$shared tail one two three"),
      (2L, s"lead1 lead2 $shared other words here"),
      (3L, "entirely distinct content with no repeats at all ok fine")).toDF("doc_id", "text")
    val got = SpanDedup.slidingSpanStats(docs, k = 10, minCount = 2L)
      .select("doc_id", "n_hot_windows", "n_spans", "covered_tokens")
      .as[(Long, Long, Long, Long)].collect()
      .map { case (a, b, c, d) => a -> ((b, c, d)) }.toMap
    assert(got(1L) == (3L, 1L, 12L))
    assert(got(2L) == (3L, 1L, 12L))
    assert(got(3L) == (0L, 0L, 0L))
  }
}
