package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TextFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column): org.apache.spark.sql.Row =
    Seq(text).toDF("text").select(c).head

  test("shingles: n-grams in order, short docs empty") {
    val got = one("a b c d", TextFunctions.shingles(col("text"), 3)).getSeq[String](0)
    assert(got == Seq("a b c", "b c d"))
    assert(one("a b", TextFunctions.shingles(col("text"), 3)).getSeq[String](0).isEmpty)
  }

  test("fingerprint is word-order invariant, content sensitive") {
    val fp = (t: String) => one(t, TextFunctions.fingerprint(col("text"))).getString(0)
    assert(fp("spark join table") == fp("table spark join"))
    assert(fp("spark join table") == fp("spark spark join table")) // multiset-insensitive
    assert(fp("spark join table") != fp("spark join tables"))
  }

  test("langId: stopword argmax with deterministic priority") {
    val lid = (t: String) => one(t, TextFunctions.langId(col("text"))).getString(0)
    assert(lid("the cat sat on the mat") == "en")
    assert(lid("el gato es un animal y no la casa") == "es")
    assert(lid("xyzzy qwerty") == "und")
    // tie (both 1 hit) resolves to the higher-priority language
    assert(lid("the el") == "en")
  }

  test("quality ratios: exact fractions") {
    val df = Seq("aa bb aa").toDF("text")
    val r = df.select(
      TextFunctions.nTokens(col("text")),
      TextFunctions.nDistinctTokens(col("text")),
      TextFunctions.distinctRatio(col("text")),
      TextFunctions.avgTokenLen(col("text"))).head
    assert(r.getLong(0) == 3 && r.getLong(1) == 2)
    assert(math.abs(r.getDouble(2) - 2.0 / 3) < 1e-15)
    assert(math.abs(r.getDouble(3) - 2.0) < 1e-15) // (8 - 2) / 3
  }

  test("minhash estimate approximates exact jaccard for near-identical docs") {
    val a = (1 to 50).map(i => s"w$i").mkString(" ")
    val b = (1 to 47).map(i => s"w$i").mkString(" ") // drop last 3 words
    val df = Seq((a, b)).toDF("a", "b")
    val est = df.select(
      TextFunctions.minhashJaccardEstimate(
        TextFunctions.minhashSignature(TextFunctions.shingles(col("a"), 3), 64),
        TextFunctions.minhashSignature(TextFunctions.shingles(col("b"), 3), 64),
        64)).head.getDouble(0)
    // exact shingle jaccard = 45/48 = 0.9375; 64 hashes -> within ~0.15
    assert(est > 0.75 && est <= 1.0, s"est=$est")
  }

  test("native minhash signature is bit-identical to the HOF form") {
    val docs = Seq(
      (1 to 50).map(i => s"w$i").mkString(" "),
      "short doc here",
      "a b",     // shorter than the shingle size: empty shingle array
      "")        // empty text
      .toDF("text")
    val k = 32
    val rows = docs.select(
      TextFunctions.minhashSignature(TextFunctions.shingles(col("text"), 3), k).as("native"),
      TextFunctions.minhashSignatureHof(TextFunctions.shingles(col("text"), 3), k).as("hof"))
      .collect()
    rows.foreach { r =>
      // getSeq boxes identically for both representations; null elements
      // (empty shingle set) must match position-by-position too.
      assert(r.getSeq[Any](0) == r.getSeq[Any](1))
    }
    // the empty-shingle rows really exercised the k-nulls contract
    assert(rows.exists(_.getSeq[Any](0).forall(_ == null)))
    // rehash family (Dedup.minhashSignatures' historical values): native
    // one-pass == the explode-form's hash chain xxhash64(xxhash64(sh), s)
    val sh = TextFunctions.shingles(col("text"), 3)
    val rehashRows = docs.select(
      org.apache.spark.sql.graftnative.MinHashSig(sh, k, rehash = true).as("native"),
      transform(typedLit((0 until k).toArray),
        s => array_min(transform(sh, x => xxhash64(xxhash64(x), s)))).as("hof"))
      .collect()
    rehashRows.foreach(r => assert(r.getSeq[Any](0) == r.getSeq[Any](1)))
    // and a repartitioned run is stable (pure function of the row)
    val again = docs.repartition(3).select(
      TextFunctions.minhashSignature(TextFunctions.shingles(col("text"), 3), k))
      .collect().map(_.getSeq[Any](0)).toSet
    assert(again == rows.map(_.getSeq[Any](0)).toSet)
  }

  test("winnowing: shared long runs yield shared fingerprints; short/empty safe") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val overlap = (21 to 60).map(i => s"w$i").mkString(" ") + " extra tail words here"
    val unrelated = (1 to 60).map(i => s"z$i").mkString(" ")
    val rows = Seq(
      ("a", base), ("b", overlap), ("c", unrelated),
      ("d", "one two three four five six"), // 2 shingles < window: min survives
      ("e", "tiny doc"))                    // shorter than k: no k-grams at all
      .toDF("id", "text")
      .select(col("id"), TextFunctions.winnowingFingerprints(col("text")).as("fps"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSet).toMap
    // a and b share a 40-token run >= k+w-1: guaranteed common fingerprint
    assert(rows("a").intersect(rows("b")).nonEmpty)
    assert(rows("a").intersect(rows("c")).isEmpty)
    assert(rows("d").size == 1)
    assert(rows("e").isEmpty)
  }

  test("staged winnowing (Dedup) equals the inline expression form") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 30).map(i => s"w$i").mkString(" ")),
      (2L, "one two three four five six"),
      (3L, "x")).toDF("doc_id", "text")
    val inline = docs
      .select(col("doc_id"), graft.text.TextFunctions.winnowingFingerprints(col("text")).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val staged = graft.dedup.Dedup.winnowingFingerprints(docs)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(inline == staged)
  }

  test("bpe tokens: subword boundaries on letters/digits/punctuation") {
    import spark.implicits._
    val got = Seq("abc123 def, gh9!").toDF("text")
      .select(TextFunctions.bpeTokens(col("text")).as("t"))
      .head.getSeq[String](0).toSeq
    assert(got == Seq("abc", "123", " def", ",", " gh", "9", "!"))
  }

  test("simhash: identical docs hamming 0, near docs small, different docs large") {
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val near = (1 to 57).map(i => s"w$i").mkString(" ")
    val far = (100 to 160).map(i => s"v$i").mkString(" ")
    val df = Seq((base, base, near, far)).toDF("a", "b", "c", "d")
    val bits = (c: String) => TextFunctions.simhashBitVector(col(c))
    val r = df.select(
      TextFunctions.hamming(bits("a"), bits("b")),
      TextFunctions.hamming(bits("a"), bits("c")),
      TextFunctions.hamming(bits("a"), bits("d"))).head
    assert(r.getInt(0) == 0)
    assert(r.getInt(1) < r.getInt(2), s"near=${r.getInt(1)} far=${r.getInt(2)}")
  }

  test("native simhash pack is bit-identical to the 64-filter HOF form") {
    val docs = Seq(
      (1 to 60).map(i => s"w$i").mkString(" "),
      "short doc here",
      "dup dup dup distinct",  // duplicate tokens vote per occurrence
      "")                      // split('') = [''] — one token, never empty
      .toDF("text")
    val rows = docs.select(
      TextFunctions.simhashBitVector(col("text")).as("native"),
      TextFunctions.simhashBitVectorHof(col("text")).as("hof"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // and stable under repartition (pure function of the row)
    val again = docs.repartition(3)
      .select(TextFunctions.simhashBitVector(col("text")))
      .collect().map(_.getLong(0)).toSet
    assert(again == rows.map(_.getLong(0)).toSet)
  }

  test("cleanText strips tags, normalizes controls, collapses spaces, trims") {
    def clean(s: String): String =
      one(s, TextFunctions.cleanText(col("text"))).getString(0)
    assert(clean("""<div class="x">hello</div> world""") === "hello world")
    assert(clean("a<br>b") === "a b")          // tag becomes a space, no gluing
    assert(clean("a\tb\r\ncd") === "a b c d")
    assert(clean("  lots   of    space  ") === "lots of space")
    assert(clean("<p><b>all</b></p>") === "all")
    assert(clean("no markup here") === "no markup here")
    assert(clean("<unclosed") === "<unclosed") // not a complete tag: kept
    assert(clean("") === "")
  }

  test("sStem: plural variants collapse, protected endings survive") {
    import spark.implicits._
    def stem(s: String): String =
      Seq(s).toDF("t").select(TextFunctions.sStem(col("t"))).head.getString(0)
    assert(stem("queries tables rows") === "query table row")
    assert(stem("boxes") === "boxe") // es after x: drop only the s
    assert(stem("bus pass") === "bus pass") // us/ss protected
    assert(stem("echoes") === "echoe") // rule 2 declines (oes), rule 3 strips s
    assert(stem("ties dies") === "ty dy") // rule 1 applies to any non-a/e stem
    // Sequential (not else-if) semantics: rule 1 declines 'aies' (a
    // before ies) but rule 2 then sees '...ies' as an i-before-es match.
    assert(stem("aies") === "aie")
  }
}
