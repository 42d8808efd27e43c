package graft.text

import graft.SparkTestBase

class EntropySpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], lo: Double = 0.5, hi: Double = 4.5) =
    Entropy.charEntropy(rows.toDF("doc_id", "text"), lo, hi)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap

  test("hand values: constant text is 0 nats, two-symbol alternation ~ln 2, uniform = ln k") {
    val got = run(Seq(
      (1L, "aaaaaaaa"),
      (2L, "abababab"),
      (3L, "abcd")))
    assert(got(1L)._3 == 0.0 && !got(1L)._4)
    assert(math.abs(got(2L)._3 - math.log(2)) < 1e-5)
    assert(math.abs(got(3L)._3 - math.log(4)) < 1e-5)
    assert(got(3L) == ((4L, 4L, got(3L)._3, true)))
  }

  test("null and empty texts are excluded, not scored") {
    val got = run(Seq((1L, "ab"), (2L, null.asInstanceOf[String]), (3L, "")))
    assert(got.keySet == Set(1L))
  }

  test("entropy is repartition-stable (decimal accumulation)") {
    val docs = (0L until 200L).map(i => (i, s"doc $i " + ("xyz" * (i % 7 + 1).toInt)))
    def once(d: org.apache.spark.sql.DataFrame) =
      Entropy.charEntropy(d, 0.0, 10.0)
        .collect().map(r => (r.getLong(0), r.getDouble(3))).sorted.toSeq
    val df = docs.toDF("doc_id", "text")
    assert(once(df) == once(df.repartition(13)))
  }
}
