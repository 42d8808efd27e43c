package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class BpeSpec extends SparkTestBase {

  private def seg(words: Seq[String], merges: Seq[(String, String)]): Map[String, Seq[String]] = {
    import spark.implicits._
    Bpe.segmentWords(words.toDF("word"), merges)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1)
      .map { case (w, rows) => w -> rows.sortBy(_._2).map(_._3).toSeq }
  }

  test("leftmost-first non-overlapping merge: the aaa/aaaa parity cases") {
    val m = Seq(("a", "a"))
    val got = seg(Seq("aaa", "aaaa", "aaaaa", "xaay", "xaaay", "aa"), m)
    assert(got("aaa") == Seq("aa", "a"))
    assert(got("aaaa") == Seq("aa", "aa"))
    assert(got("aaaaa") == Seq("aa", "aa", "a"))
    assert(got("xaay") == Seq("x", "aa", "y"))
    assert(got("xaaay") == Seq("x", "aa", "a", "y"))
    assert(got("aa") == Seq("aa"))
  }

  test("merges cascade in rank order and later ranks see earlier output") {
    val m = Seq(("t", "a"), ("ta", "b"), ("l", "e"))
    val got = seg(Seq("table", "tab", "stable", "let"), m)
    assert(got("table") == Seq("tab", "le"))
    assert(got("tab") == Seq("tab"))
    assert(got("stable") == Seq("s", "tab", "le"))
    // (t,a) not adjacent in "let": only (l,e) fires
    assert(got("let") == Seq("le", "t"))
    // Reversed rank order: (ta,b) first finds no "ta" symbol yet -> no-op
    val rev = seg(Seq("table"), Seq(("ta", "b"), ("t", "a"), ("l", "e")))
    assert(rev("table") == Seq("ta", "b", "le"))
  }

  test("applyBpe: per-doc reassembly in word order, scrub contract on null/empty") {
    import spark.implicits._
    val docs = Seq(
      (1L, "table let table"),
      (2L, "tab"),
      (3L, ""),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = Bpe.applyBpe(docs, Seq(("t", "a"), ("ta", "b"), ("l", "e")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "tab le le t tab le")
    assert(got(2L) == "tab")
    assert(got(3L) == "")
    assert(got(4L) == "")
  }

  test("learnMerges: weighted overlapping counts, deterministic tie-break, early stop") {
    import spark.implicits._
    // "aa" x2 and "ab" x1: pair (a,a) weight 2, (a,b) weight 1 < 2 -> one
    // merge then exhaustion, even with budget for more.
    val docs = Seq((1L, "aa aa ab")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, nMerges = 5)
    assert(merges == Seq((0, "a", "a", 2L)))
    // Overlapping occurrences count (reference get_stats semantics):
    // "aaa" x1 contributes (a,a) twice.
    val overlap = Bpe.learnMerges(Seq((1L, "aaa")).toDF("doc_id", "text"), 1)
    assert(overlap == Seq((0, "a", "a", 2L)))
    // Tie at equal count breaks (left, right) ascending: "xy" x2, "ab" x2.
    val tie = Bpe.learnMerges(Seq((1L, "xy ab xy ab")).toDF("doc_id", "text"), 1)
    assert(tie == Seq((0, "a", "b", 2L)))
  }

  test("learnMergesBatched: M=1 reproduces the textbook loop bit-for-bit") {
    import spark.implicits._
    val docs = Seq(
      (1L, "low lower lowest low low"),
      (2L, "new newer newest new"),
      (3L, "wide wider widest low newer")).toDF("doc_id", "text")
    val sequential = Bpe.learnMerges(docs, nMerges = 8)
    val batched1 = Bpe.learnMergesBatched(docs, nMerges = 8, batchM = 1)
    assert(batched1 == sequential)
  }

  test("learnMergesBatched: batch pairs are non-interacting, freqs exact, budget respected") {
    import spark.implicits._
    val docs = Seq(
      (1L, "low lower lowest low low"),
      (2L, "new newer newest new"),
      (3L, "wide wider widest low newer"),
      (4L, "stream streams streaming stream")).toDF("doc_id", "text")
    val n = 10
    val batched = Bpe.learnMergesBatched(docs, nMerges = n, batchM = 4)
    assert(batched.size <= n)
    assert(batched.map(_._1) == batched.indices) // dense ranks in order
    // Every recorded pair_freq is the TRUE weighted count at its round
    // start (>= 2 by the survivor rule).
    assert(batched.forall(_._4 >= 2L))
    // Determinism under repartition (the learnMerges stability contract).
    val again = Bpe.learnMergesBatched(docs.repartition(5), nMerges = n, batchM = 4)
    assert(again == batched)
    // The learned table still drives applyBpe and compresses.
    val merges = batched.map { case (_, l, r, _) => (l, r) }
    val nSyms = Bpe.applyBpe(docs, merges)
      .select(sum(size(split(col("bpe_text"), " ")))).head.getLong(0)
    val nChars = docs
      .select(sum(length(regexp_replace(col("text"), " ", "")))).head.getLong(0)
    assert(nSyms < nChars, s"nSyms=$nSyms nChars=$nChars")
  }

  test("segmentWordsLocal: bit-identical to the window chain on parity, cascade and unicode cases") {
    import spark.implicits._
    val words = Seq(
      "aaa", "aaaa", "aaaaa", "xaay", "xaaay", "aa", "a",
      "table", "tab", "stable", "let", "lettable",
      "scan", "scans", "banana", "tatata",
      "héé", "a𝌆b", "𝌆𝌆𝌆", // surrogate pairs stay whole code points
      "low", "lower", "lowest", "new", "newer", "widest")
    val merges = Seq(("t", "a"), ("ta", "b"), ("l", "e"), ("s", "c"),
      ("a", "n"), ("a", "a"), ("é", "é"), ("𝌆", "𝌆"))
    val chain = Bpe.segmentWords(words.toDF("word"), merges)
      .groupBy("word")
      .agg(array_join(sort_array(collect_list(struct(col("pos"), col("sym"))))
        .getField("sym"), " ").as("word_bpe"))
    val local = Bpe.segmentWordsLocal(words.toDF("word"), merges)
    assert(local.collect().map(r => r.getString(0) -> r.getString(1)).toMap ==
      chain.collect().map(r => r.getString(0) -> r.getString(1)).toMap)
  }

  test("segmentWordsLocal: a 256-merge table is one projection, no window stages") {
    import spark.implicits._
    // A deep cascading table the window chain cannot plan: merge rank k
    // glues one more 'a' onto the run ("aa", then ("aa","a") -> "aaa", ...)
    // plus filler rules that never match — depth is what's under test.
    val deep = ("a", "a") +: (1 until 64).map(k => ("a" * (k + 1), "a")) ++:
      (0 until 192).map(k => (s"zz$k", "q"))
    assert(deep.size == 256)
    val got = Bpe.segmentWordsLocal(
      Seq("a" * 65, "a" * 64, "a" * 7, "b").toDF("word"), deep)
    val m = got.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // Sequential replay: ("a","a") leaves runs of "aa" pairs; each later
    // rank can fire at most once per word (leftmost), so 65 a's collapse
    // leftward one rule at a time.
    assert(m("b") == "b")
    assert(m("a" * 64).split(" ").forall(_.forall(_ == 'a')))
    assert(m("a" * 64).replace(" ", "") == "a" * 64)
    assert(m("a" * 65).replace(" ", "") == "a" * 65)
    // The whole point: plan depth is constant — no WindowExec anywhere.
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window stage leaked into the local path:\n$plan")
  }

  test("applyBpe inherits the bounded plan: no window stages at any merge depth") {
    import spark.implicits._
    val docs = Seq((1L, "table let table"), (2L, "tab")).toDF("doc_id", "text")
    val plan = Bpe.applyBpe(docs, Seq(("t", "a"), ("ta", "b"), ("l", "e")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"applyBpe plans a window stage:\n$plan")
  }

  test("learnMerges is repartition-stable and its merges feed applyBpe") {
    import spark.implicits._
    val docs = Seq(
      (1L, "low lower lowest low low"),
      (2L, "new newer newest new"),
      (3L, "wide wider widest low newer")).toDF("doc_id", "text")
    val a = Bpe.learnMerges(docs, nMerges = 6)
    val b = Bpe.learnMerges(docs.repartition(7), nMerges = 6)
    assert(a == b)
    assert(a.nonEmpty)
    // Replaying the learned table compresses: fewer symbols than chars.
    val merges = a.map { case (_, l, r, _) => (l, r) }
    val nSyms = Bpe.applyBpe(docs, merges)
      .select(sum(size(split(col("bpe_text"), " ")))).head.getLong(0)
    val nChars = docs
      .select(sum(length(regexp_replace(col("text"), " ", "")))).head.getLong(0)
    assert(nSyms < nChars, s"nSyms=$nSyms nChars=$nChars")
  }
}
