package graft.text

import graft.SparkTestBase

class CharNgramLangIdSpec extends SparkTestBase {
  import spark.implicits._

  private def train = Seq(
    (1L, "aa ab aa ab aa", "aa-ish"),
    (2L, "ab aa ab aa ab", "aa-ish"),
    (3L, "zz zy zz zy zz", "zz-ish"),
    (4L, "zy zz zy zz zy", "zz-ish"))
    .toDF("doc_id", "text", "lang")

  test("classifies held-out docs to the language whose grams they share") {
    val docs = Seq(
      (10L, "aa ab", null.asInstanceOf[String]),
      (11L, "zz zy zz", null.asInstanceOf[String]))
      .toDF("doc_id", "text", "lang")
    val got = CharNgramLangId.classify(docs, train)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(10L -> "aa-ish", 11L -> "zz-ish"))
  }

  test("labeled docs report is_correct; no shared gram at all -> null prediction, not a crash") {
    val docs = Seq(
      (10L, "aa ab aa", "aa-ish"),     // correct
      (11L, "aa ab aa", "zz-ish"),     // classifier disagrees with label
      (12L, "qqqq", "aa-ish"))          // no gram overlap with any profile
      .toDF("doc_id", "text", "lang")
    val got = CharNgramLangId.classify(docs, train)
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(1)), r.getBoolean(3))).toMap
    assert(got(10L) == ((Some("aa-ish"), true)))
    assert(got(11L) == ((Some("aa-ish"), false)))
    assert(got(12L) == ((None, false)))
  }

  test("unlabeled corpus (no lang column) classifies with null is_correct") {
    val docs = Seq((10L, "aa ab aa"), (11L, "zz zy")).toDF("doc_id", "text")
    val rows = CharNgramLangId.classify(docs, train).collect()
    val got = rows.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(10L -> "aa-ish", 11L -> "zz-ish"))
    assert(rows.forall(_.isNullAt(3)))
  }

  test("score ties break to the lexicographically first language") {
    // one train doc per lang with IDENTICAL text: profiles are identical,
    // so every score ties and the argmax must deterministically pick the
    // first language name.
    val t = Seq((1L, "ab ab", "blang"), (2L, "ab ab", "alang"))
      .toDF("doc_id", "text", "lang")
    val docs = Seq((10L, "ab", null.asInstanceOf[String])).toDF("doc_id", "text", "lang")
    val got = CharNgramLangId.classify(docs, t).collect().head
    assert(got.getString(1) == "alang")
  }

  test("classification is repartition-stable (integer dot products)") {
    val docs = (0L until 100L)
      .map(i => (i, if (i % 2 == 0) s"aa ab aa x$i" else s"zz zy zz x$i",
        null.asInstanceOf[String]))
      .toDF("doc_id", "text", "lang")
    def run(d: org.apache.spark.sql.DataFrame) =
      CharNgramLangId.classify(d, train)
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(run(docs) == run(docs.repartition(13)))
    assert(run(docs).count(_._2 == "aa-ish") == 50)
  }
}
