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
