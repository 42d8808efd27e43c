package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins the gate-boundary conventions the driver's DuckDB compare relies
  * on: C-style `%` semantics for q23's k_mod (so a future negative-k
  * fixture cannot silently diverge from the oracle's `%`), and the
  * to_json array stringification format shared by both engines.
  */
class QueriesSpec extends SparkTestBase {
  import spark.implicits._

  test("q23 modulo is sign-of-dividend, matching DuckDB %") {
    val rows = Seq(-17L, -10L, -7L, 0L, 7L, 10L, 17L).toDF("k")
      .select(col("k"), (col("k") % 10).as("k_mod"))
      .as[(Long, Long)].collect().toMap
    // DuckDB: -17 % 10 = -7, -7 % 10 = -7 (verified against duckdb 1.x);
    // pmod would give 3 for both, which is why q23 must not use pmod.
    assert(rows == Map(-17L -> -7L, -10L -> 0L, -7L -> -7L,
      0L -> 0L, 7L -> 7L, 10L -> 0L, 17L -> 7L))
  }

  test("to_json of array columns matches DuckDB to_json rendering") {
    val (strs, longs, empty, nul) = Seq(
      (Seq("a", "b"), Seq(0L, 4L, 8L), Seq.empty[Long], null: Seq[String]))
      .toDF("s", "l", "e", "n")
      .select(to_json($"s"), to_json($"l"), to_json($"e"), to_json($"n"))
      .as[(String, String, String, String)].head()
    assert(strs == """["a","b"]""")   // no spaces, double quotes
    assert(longs == "[0,4,8]")
    assert(empty == "[]")
    assert(nul == null)               // SQL NULL, not the string "null"
  }
}
