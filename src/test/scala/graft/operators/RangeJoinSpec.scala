package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class RangeJoinSpec extends SparkTestBase {

  test("equals the naive inequality join, including multi-bucket intervals") {
    import spark.implicits._
    val points = (0L until 500L by 7L).map(t => (t, s"p$t")).toDF("t", "pname")
    // widths from sub-bucket to 4x the bucket width of 50
    val intervals = Seq(
      (0L, 10L, "tiny"), (40L, 60L, "straddle"), (100L, 300L, "wide"),
      (300L, 301L, "point"), (450L, 500L, "tail"), (600L, 700L, "nomatch"))
      .toDF("s", "e", "iname")

    val naive = points.crossJoin(intervals)
      .filter(col("s") <= col("t") && col("t") < col("e"))
      .select("t", "pname", "s", "e", "iname")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val bucketed = RangeJoin.bucketed(points, intervals, "t", "s", "e", bucketWidth = 50L)
      .select("t", "pname", "s", "e", "iname")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(bucketed == naive)
    assert(bucketed.nonEmpty)
  }

  test("boundaries: start inclusive, end exclusive, even on bucket edges") {
    import spark.implicits._
    val points = Seq(99L, 100L, 149L, 150L).toDF("t")
    val intervals = Seq((100L, 150L, "w")).toDF("s", "e", "iname")
    val out = RangeJoin.bucketed(points, intervals, "t", "s", "e", bucketWidth = 50L)
      .select("t").as[Long].collect().sorted.toSeq
    assert(out == Seq(100L, 149L))
  }

  test("equi-keys restrict matches to the same key") {
    import spark.implicits._
    val points = Seq(("a", 10L), ("b", 10L)).toDF("k", "t")
    val intervals = Seq(("a", 0L, 20L)).toDF("k", "s", "e")
    val out = RangeJoin.bucketed(points, intervals, "t", "s", "e",
      bucketWidth = 20L, keys = Seq("k"))
      .select("k").as[String].collect().toSeq
    assert(out == Seq("a"))
  }

  test("plans as an equi-join on the bucket, never a nested-loop/cartesian") {
    import spark.implicits._
    val points = Seq(1L, 75L).toDF("t")
    val intervals = Seq((0L, 50L, "w")).toDF("s", "e", "iname")
    val plan = RangeJoin.bucketed(points, intervals, "t", "s", "e", bucketWidth = 50L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a scale-killer plan:\n$plan")
  }

  test("overlap equals the naive inequality join and emits each pair once") {
    import spark.implicits._
    // Deterministic mix of widths/alignments, both sides spanning multiple
    // 50-wide buckets — the case where ownership must prevent duplicates.
    val a = (0 until 40)
      .map(i => (s"a$i", (i * 37 % 300).toLong, (i * 37 % 300 + 1 + i * 13 % 160).toLong))
      .toDF("aname", "as", "ae")
    val b = (0 until 40)
      .map(i => (s"b$i", (i * 53 % 310).toLong, (i * 53 % 310 + 1 + i * 11 % 140).toLong))
      .toDF("bname", "bs", "be")
    val naive = a.crossJoin(b)
      .filter(col("as") < col("be") && col("bs") < col("ae"))
      .select("aname", "bname")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    for (width <- Seq(10L, 50L, 500L)) {
      val ours = RangeJoin.overlap(a, b, "as", "ae", "bs", "be", bucketWidth = width)
        .select("aname", "bname")
        .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
      assert(ours == naive, s"width=$width diverged (or duplicated pairs)")
    }
    assert(naive.nonEmpty && naive.size < 1600)
  }

  test("overlap half-open semantics: touching intervals do not match, empty never match") {
    import spark.implicits._
    val a = Seq(("a1", 0L, 10L), ("empty", 20L, 20L)).toDF("aname", "as", "ae")
    val b = Seq(("touch", 10L, 15L), ("inside", 5L, 6L), ("covers20", 15L, 30L))
      .toDF("bname", "bs", "be")
    val out = RangeJoin.overlap(a, b, "as", "ae", "bs", "be", bucketWidth = 8L)
      .select("aname", "bname")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    // [0,10) meets [5,6) only; [10,15) touches but half-open excludes it;
    // the empty [20,20) matches nothing even though [15,30) covers t=20.
    assert(out == Seq(("a1", "inside")))
  }

  test("overlap with equi-keys restricts matches to the same key") {
    import spark.implicits._
    val a = Seq(("k1", 0L, 10L), ("k2", 0L, 10L)).toDF("k", "as", "ae")
    val b = Seq(("k1", 5L, 15L)).toDF("k", "bs", "be")
    val out = RangeJoin.overlap(a, b, "as", "ae", "bs", "be",
      bucketWidth = 10L, keys = Seq("k"))
      .select("k").as[String].collect().toSeq
    assert(out == Seq("k1"))
  }

  test("overlap plans as an equi-join on the bucket, never a nested-loop/cartesian") {
    import spark.implicits._
    val a = Seq(("a1", 0L, 10L)).toDF("aname", "as", "ae")
    val b = Seq(("b1", 5L, 15L)).toDF("bname", "bs", "be")
    val plan = RangeJoin.overlap(a, b, "as", "ae", "bs", "be", bucketWidth = 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"overlap join fell back to a scale-killer plan:\n$plan")
  }

  test("colliding non-key columns are rejected") {
    import spark.implicits._
    val points = Seq((1L, "x")).toDF("t", "name")
    val intervals = Seq((0L, 50L, "y")).toDF("s", "e", "name")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.bucketed(points, intervals, "t", "s", "e", bucketWidth = 50L)
    }
    assert(e.getMessage.contains("name"))
  }
}
