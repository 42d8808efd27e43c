package graft.quality

import graft.SparkTestBase

class ExpectationsSpec extends SparkTestBase {
  import spark.implicits._

  private def df = Seq(
    (1L, Option("a"), 10.0),
    (2L, Option("b"), -5.0), // range violation
    (3L, Option.empty[String], 20.0), // null violation; range/pattern skip it
    (3L, Option("zz"), 30.0), // duplicate key + pattern violation
    (4L, Option("c"), 40.0)).toDF("k", "tag", "v")

  test("counts each rule independently; clean rules report zero") {
    val got = Expectations.check(df,
      notNull = Seq(Expectations.NotNull("tag")),
      inRange = Seq(
        Expectations.InRange("v", 0.0, 100.0),
        Expectations.InRange("k", 0.0, 100.0)), // clean -> 0
      matches = Seq(Expectations.Matches("tag", "^[a-c]$")),
      unique = Seq(Expectations.Unique(Seq("k"))))
      .as[(String, Long)].collect().toMap
    assert(got == Map(
      "not_null(tag)" -> 1L,
      "in_range(v, 0.0, 100.0)" -> 1L,
      "in_range(k, 0.0, 100.0)" -> 0L,
      "matches(tag)" -> 1L, // null tag skipped, 'zz' fails
      "unique(k)" -> 1L)) // one excess row for k=3
  }

  test("an empty table passes every rule with zero counts") {
    val got = Expectations.check(df.filter("k < 0"),
      notNull = Seq(Expectations.NotNull("tag")),
      unique = Seq(Expectations.Unique(Seq("k"))))
      .as[(String, Long)].collect().toMap
    assert(got.values.toSet == Set(0L))
  }
}
