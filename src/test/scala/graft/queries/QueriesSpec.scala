package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.dedup.Dedup

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

  test("hash-golden fixture: near-dup pair survives LSH banding and simhash blocking") {
    // Same fixture as TrainingData.hashFixture; the d2/d3 goldens pin the
    // hash values, this pins the end-to-end pair extraction on top of them.
    val docs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog today",
      2L -> "the quick brown fox jumps over the lazy cat today",
      3L -> "pack my box with five dozen liquor jugs right now",
      4L -> "tiny doc",
      5L -> "alpha beta gamma delta epsilon zeta")
      .toDF("doc_id", "text")
    val mh = Dedup.minhashLshPairs(docs, k = 8, bands = 4)
      .as[(Long, Long, Double)].collect().toSeq
    assert(mh == Seq((1L, 2L, 0.875)))   // 7 of 8 signature slots agree
    val sh = Dedup.simhashPairs(docs, maxHamming = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(sh == Seq((1L, 2L, 3L)))      // hamming(1,2)=3, found via blocks
  }

  test("registry integrity: names unique and filename-safe") {
    // SparkEntry.queries/oracleSql are Maps: a duplicated name would
    // SILENTLY drop one entry from the driver gate — the registry must
    // fail loudly here instead.
    val names = graft.SparkEntry.allQueries.map(_.name)
    val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty, s"duplicate query names: $dups")
    // the driver keys results by '<name>.parquet' output files
    val bad = names.filterNot(_.matches("[a-z0-9_]+"))
    assert(bad.isEmpty, s"names not filename-safe: $bad")
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
