package graft.text

import graft.SparkTestBase

class ChunkerSpec extends SparkTestBase {
  import spark.implicits._

  private def doc(n: Int) = Seq((1L, (1 to n).map(i => s"w$i").mkString(" ")))
    .toDF("doc_id", "text")

  private def chunks(n: Int, size: Int = 12, overlap: Int = 3) =
    Chunker.chunk(doc(n), size, overlap).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3))).sortBy(_._1)

  test("30 tokens, size 12 stride 9: three chunks covering every token") {
    val got = chunks(30)
    assert(got.map(_._1).toSeq == Seq(0L, 1L, 2L))
    assert(got.map(_._2).toSeq == Seq(12L, 12L, 12L))
    assert(got(0)._3.startsWith("w1 ") && got(0)._3.endsWith(" w12"))
    assert(got(1)._3.startsWith("w10 ") && got(1)._3.endsWith(" w21"))
    assert(got(2)._3.startsWith("w19 ") && got(2)._3.endsWith(" w30"))
  }

  test("short document emits exactly chunk 0") {
    val got = chunks(3)
    assert(got.toSeq == Seq((0L, 3L, "w1 w2 w3")))
    assert(chunks(12).map(_._1).toSeq == Seq(0L)) // boundary: fits one chunk
  }

  test("13 tokens: second chunk exists and covers the tail (no token dropped)") {
    val got = chunks(13)
    assert(got.map(_._1).toSeq == Seq(0L, 1L))
    assert(got(1)._2 == 4L && got(1)._3 == "w10 w11 w12 w13")
  }

  test("no chunk is wholly contained in its predecessor") {
    for (n <- Seq(4, 9, 10, 12, 13, 21, 22, 30, 31)) {
      val got = chunks(n)
      val ends = got.map(c => c._1 * 9 + c._2) // exclusive end in tokens
      assert(ends.toSeq == ends.sorted.toSeq && ends.distinct.length == ends.length,
        s"n=$n got=${got.toSeq}")
      assert(ends.last == n, s"n=$n: last token uncovered")
    }
  }

  test("null-text documents emit no chunks (no phantom full-size empty chunk)") {
    val d = Seq((1L, Option("w1 w2 w3")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val got = Chunker.chunk(d, 12, 3).collect()
    assert(got.map(_.getLong(0)).toSet == Set(1L))
  }

  test("invalid parameters are rejected") {
    intercept[IllegalArgumentException](Chunker.chunk(doc(5), 0, 0))
    intercept[IllegalArgumentException](Chunker.chunk(doc(5), 10, 10))
  }
}
