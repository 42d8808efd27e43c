package graft.operators

import graft.SparkTestBase

class TableDiffSpec extends SparkTestBase {
  import spark.implicits._

  private def old = Seq(
    (1L, Some(10.0), "a"),
    (2L, Some(20.0), "b"),
    (3L, None, "c"), // null payload value: must NOT read as changed
    (4L, Some(40.0), "d")).toDF("k", "v", "tag")

  private def cur = Seq(
    (1L, Some(10.0), "a"), // unchanged -> dropped from output
    (2L, Some(21.0), "B"), // two columns changed
    (3L, None, "c"), // unchanged, null-safely
    (5L, Some(50.0), "e")) // added; 4 removed
    .toDF("k", "v", "tag")

  test("diff classifies added/removed/changed and names the columns") {
    val got = TableDiff.diff(old, cur, Seq("k"))
      .select("k", "diff_status", "changed_columns")
      .as[(Long, String, String)].collect().toSet
    assert(got == Set(
      (2L, "changed", "v,tag"),
      (4L, "removed", ""),
      (5L, "added", "")))
  }

  test("hashDiff classification matches diff exactly") {
    val detail = TableDiff.diff(old, cur, Seq("k"))
      .select("k", "diff_status").as[(Long, String)].collect().toSet
    val hashed = TableDiff.hashDiff(old, cur, Seq("k"))
      .select("k", "diff_status").as[(Long, String)].collect().toSet
    assert(hashed == detail)
  }

  test("identical tables diff to nothing; schema mismatch is rejected") {
    assert(TableDiff.diff(old, old, Seq("k")).count() == 0L)
    assert(TableDiff.hashDiff(old, old, Seq("k")).count() == 0L)
    intercept[IllegalArgumentException] {
      TableDiff.diff(old, old.withColumnRenamed("tag", "t2"), Seq("k"))
    }
  }
}
