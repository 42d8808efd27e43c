package graft.quality

import java.sql.Timestamp

import org.apache.spark.sql.Row

import graft.SparkTestBase

class ProfileSpec extends SparkTestBase {
  import spark.implicits._

  private def fixture = Seq(
    (1L, Some("a"), Some(2.5), Some(Timestamp.valueOf("2024-01-01 00:00:00"))),
    (2L, Some("c"), Some(-1.0), Some(Timestamp.valueOf("2024-01-03 00:00:00"))),
    (3L, None, Some(2.5), None),
    (4L, Some("b"), None, Some(Timestamp.valueOf("2024-01-02 00:00:00"))))
    .toDF("id", "s", "x", "ts")

  private def profiled = Profile.profile(fixture, Seq(
    Profile.ColSpec("id", Profile.Num),
    Profile.ColSpec("s", Profile.Str),
    Profile.ColSpec("x", Profile.Num),
    Profile.ColSpec("ts", Profile.Ts)))
    .collect().map(r => r.getString(0) -> r).toMap

  test("counts, nulls and distincts per column") {
    val p = profiled
    assert(p("id").getLong(1) == 4 && p("id").getLong(2) == 0 && p("id").getLong(3) == 4)
    assert(p("s").getLong(1) == 3 && p("s").getLong(2) == 1 && p("s").getLong(3) == 3)
    // x: one null, and the duplicated 2.5 collapses in the distinct count
    assert(p("x").getLong(1) == 3 && p("x").getLong(2) == 1 && p("x").getLong(3) == 2)
  }

  test("numeric columns fill min_num/max_num, strings fill min_str/max_str") {
    val p = profiled
    assert(p("x").getDouble(4) == -1.0 && p("x").getDouble(5) == 2.5)
    assert(p("x").isNullAt(6) && p("x").isNullAt(7))
    assert(p("s").getString(6) == "a" && p("s").getString(7) == "c")
    assert(p("s").isNullAt(4) && p("s").isNullAt(5))
  }

  test("timestamps profile as epoch micros, nulls ignored by min/max") {
    val p = profiled
    val jan1 = Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000.0
    val jan3 = Timestamp.valueOf("2024-01-03 00:00:00").getTime * 1000.0
    assert(p("ts").getDouble(4) == jan1 && p("ts").getDouble(5) == jan3)
    assert(p("ts").getLong(1) == 3 && p("ts").getLong(2) == 1)
  }

  test("output is one row per requested column, schema stable") {
    val rows: Array[Row] = Profile.profile(fixture,
      Seq(Profile.ColSpec("id", Profile.Num))).collect()
    assert(rows.length == 1)
    assert(rows.head.schema.fieldNames.toSeq == Seq(
      "col_name", "n", "n_null", "n_distinct", "min_num", "max_num", "min_str", "max_str"))
  }
}
