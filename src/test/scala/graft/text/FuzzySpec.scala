package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class FuzzySpec extends SparkTestBase {

  private def pairs(words: Seq[String], minLen: Int = 2): Set[(String, String, Long)] = {
    import spark.implicits._
    Fuzzy.editDistance1Pairs(words.toDF("word"), minLen)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
  }

  test("blocking is complete for distance 1: substitution, insertion, deletion all found") {
    val got = pairs(Seq("table", "fable", "tables", "tble", "chair"))
    assert(got == Set(
      ("fable", "table", 1L),   // substitution
      ("table", "tables", 1L),  // trailing insertion
      ("table", "tble", 1L)))   // deletion
  }

  test("distance-2 collisions blocked by the variant join are screened out") {
    // "ab" and "ba" share deletion variants "a" and "b" but lev = 2.
    assert(pairs(Seq("ab", "ba")) == Set.empty)
    // "scan"/"span" substitution pair survives; "scan"/"spans" (dist 2) not.
    assert(pairs(Seq("scan", "span", "spans")) ==
      Set(("scan", "span", 1L), ("span", "spans", 1L)))
  }

  test("brute-force equivalence on a mixed vocabulary") {
    import spark.implicits._
    val words = Seq("low", "lower", "lows", "flow", "glow", "slow", "sow",
      "row", "bow", "arc", "ark", "arm", "art", "cart", "card")
    // The all-pairs form the blocking must reproduce exactly.
    val brute = for { a <- words; b <- words if a < b } yield (a, b)
    val bruteDf = brute.toDF("word_a", "word_b")
      .withColumn("dist", levenshtein(col("word_a"), col("word_b")).cast("long"))
      .filter(col("dist") <= 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(pairs(words) == bruteDf)
  }

  test("minLen floors hot short-word keys") {
    assert(pairs(Seq("a", "b", "at", "it"), minLen = 2) == Set(("at", "it", 1L)))
    assert(pairs(Seq("a", "b"), minLen = 1) == Set(("a", "b", 1L)))
  }
}
