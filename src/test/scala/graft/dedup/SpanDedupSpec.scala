package graft.dedup

import graft.SparkTestBase

class SpanDedupSpec extends SparkTestBase {
  import spark.implicits._

  // span=3 chunks: doc 1 = ["a b c", "d e f"], doc 2 = ["a b c", "x y z"],
  // doc 3 = ["x y z"], doc 4 = ["a b c", "d"] (trailing partial chunk).
  private def docs = Seq(
    1L -> "a b c d e f",
    2L -> "a b c x y z",
    3L -> "x y z",
    4L -> "a b c d").toDF("doc_id", "text")

  test("spanStats counts corpus-wide duplicated chunks per document") {
    val got = SpanDedup.spanStats(docs, span = 3, minCount = 2L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // "a b c" occurs 3x, "x y z" 2x; "d e f" and "d" are unique.
    assert(got(1L) === ((2L, 1L, 0.5)))
    assert(got(2L) === ((2L, 2L, 1.0)))
    assert(got(3L) === ((1L, 1L, 1.0)))
    assert(got(4L) === ((2L, 1L, 0.5)))
  }

  test("scrub drops frequent spans, keeps order, and returns '' for all-boilerplate docs") {
    val got = SpanDedup.scrub(docs, span = 3, maxCount = 1L)
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    assert(got === Map(
      1L -> "d e f",
      2L -> "",
      3L -> "",
      4L -> "d"))
  }

  test("empty and null texts survive scrub as empty strings and produce no spans") {
    val weird = Seq((1L, Option("a b c")), (2L, Option("")), (3L, Option.empty[String]))
      .toDF("doc_id", "text")
    assert(SpanDedup.spans(weird, span = 2).count() === 2) // "a b" and "c"
    val got = SpanDedup.scrub(weird, span = 2, maxCount = 1L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "a b c", 2L -> "", 3L -> ""))
  }

  test("slidingScrub cuts exactly the repeated run at any offset, keeps the rest") {
    import spark.implicits._
    val shared = (1 to 12).map(i => s"x$i").mkString(" ")
    val fixture = Seq(
      (1L, s"$shared tail one two three"),
      (2L, s"lead1 lead2 $shared other words"),
      (3L, "entirely distinct content with no repeats at all ok")).toDF("doc_id", "text")
    val got = SpanDedup.slidingScrub(fixture, k = 10, minCount = 2L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // The 12-token shared run is excised wherever it sits; neighbors stay.
    assert(got(1L) == "tail one two three")
    assert(got(2L) == "lead1 lead2 other words")
    assert(got(3L) == "entirely distinct content with no repeats at all ok")
  }

  test("slidingScrub with a high minCount reconstructs every text verbatim") {
    val got = SpanDedup.slidingScrub(docs, k = 3, minCount = 100000L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === want)
  }

  test("scrub with a high threshold reconstructs every text verbatim") {
    // Round-tripping exactly (including the trailing partial chunk) pins
    // the ordered reassembly: sort by pos, join with single spaces.
    val got = SpanDedup.scrub(docs, span = 3, maxCount = 1000L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === want)
  }
}
