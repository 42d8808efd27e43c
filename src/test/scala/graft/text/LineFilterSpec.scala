package graft.text

import graft.SparkTestBase

class LineFilterSpec extends SparkTestBase {
  import spark.implicits._

  test("keeps prose lines, drops short/unterminated/banned ones, in order") {
    val doc = Seq((1L, Seq(
      "This is a real sentence with enough words.",
      "Home | About",                                   // unterminated
      "Too short here.",                                // < 5 words
      "Enable JavaScript or else nothing works!",       // banned word
      "Cookies are delicious but banned in banners.",   // banned word
      "A second proper sentence closes the document?")  // kept ('?' terminal)
      .mkString("\n"))).toDF("doc_id", "text")
    val r = LineFilter.c4Lines(doc).collect().head
    assert(r.getLong(1) == 6 && r.getLong(2) == 2)
    assert(r.getString(3) ==
      "This is a real sentence with enough words.\n" +
        "A second proper sentence closes the document?")
    assert(r.getBoolean(4))
  }

  test("curly brace anywhere kills the document even when lines survive") {
    val doc = Seq((1L, "A perfectly fine long sentence { ruined.")).toDF("doc_id", "text")
    val r = LineFilter.c4Lines(doc).collect().head
    assert(r.getLong(2) == 1 && !r.getBoolean(4))
  }

  test("document with no surviving lines is flagged, not dropped from the report") {
    val doc = Seq((1L, "nav | crumbs\nshort.")).toDF("doc_id", "text")
    val r = LineFilter.c4Lines(doc).collect().head
    assert(r.getLong(1) == 2 && r.getLong(2) == 0 && !r.getBoolean(4))
    assert(r.getString(3) == "")
  }

  test("banned matching is case-insensitive and substring-based") {
    val doc = Seq(
      (1L, "Please accept our COOKIES policy right now."),
      (2L, "JavaScripty frameworks are discussed at length here."))
      .toDF("doc_id", "text")
    val r = LineFilter.c4Lines(doc).orderBy("doc_id").collect()
    assert(r(0).getLong(2) == 0)  // COOKIES caught despite case
    assert(r(1).getLong(2) == 0)  // substring: 'javascripty' contains 'javascript'
  }
}
