package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class AsOfJoinSpec extends SparkTestBase {

  private def collectPairs(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Option[String])] =
    df.select("k", "t", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), Option(r.getString(2))))
      .sorted.toSeq

  test("each left row gets the latest right row at or before its timestamp") {
    import spark.implicits._
    val left = Seq(("a", 5L), ("a", 14L), ("a", 25L), ("b", 7L)).toDF("k", "t")
    val right = Seq(("a", 10L, "r10"), ("a", 20L, "r20"), ("b", 3L, "rb")).toDF("k", "t", "v")
    val out = AsOfJoin.backward(left, right, Seq("k"), "t", "t", Seq("v"))
    assert(collectPairs(out) == Seq(
      ("a", 5L, None), // before any right row
      ("a", 14L, Some("r10")),
      ("a", 25L, Some("r20")),
      ("b", 7L, Some("rb"))))
  }

  test("a right row at exactly the left timestamp matches (>= semantics)") {
    import spark.implicits._
    val left = Seq(("a", 10L)).toDF("k", "t")
    val right = Seq(("a", 10L, "same"), ("a", 9L, "earlier")).toDF("k", "t", "v")
    val out = AsOfJoin.backward(left, right, Seq("k"), "t", "t", Seq("v"))
    assert(collectPairs(out) == Seq(("a", 10L, Some("same"))))
  }

  test("keys never match across groups and all left rows survive") {
    import spark.implicits._
    val left = Seq(("a", 100L), ("z", 100L)).toDF("k", "t")
    val right = Seq(("a", 1L, "ra")).toDF("k", "t", "v")
    val out = AsOfJoin.backward(left, right, Seq("k"), "t", "t", Seq("v"))
    assert(collectPairs(out) == Seq(("a", 100L, Some("ra")), ("z", 100L, None)))
  }

  test("equals the quadratic join-then-rank reference implementation") {
    import spark.implicits._
    // Deterministic pseudo-random fixture, multiple value columns.
    val left = (1 to 200)
      .map(i => (s"k${i % 7}", (i * 37 % 101).toLong, i)).toDF("k", "t", "lv")
    val right = (1 to 80)
      .map(i => (s"k${i % 7}", (i * 53 % 97).toLong, s"v$i", i * 1.5))
      .toDF("k", "t", "rv", "rd")
      // contract: right side unique per (k, t)
      .groupBy("k", "t").agg(max("rv").as("rv"), max("rd").as("rd"))

    // The O(left x right-predecessors) form this operator exists to avoid:
    // explode every predecessor pair, keep the max-rt one per left row
    // (struct ordering is lexicographic, rt first; right is unique per
    // (k, t) so there are no ties). Unmatched left rows surface one
    // null-rt struct from the outer join.
    val reference = left.withColumnRenamed("t", "lt")
      .join(right.toDF("rk", "rt", "rv", "rd"),
        col("k") === col("rk") && col("rt") <= col("lt"), "left_outer")
      .groupBy("k", "lt", "lv")
      .agg(max(struct(col("rt"), col("rv"), col("rd"))).as("s"))
      .select(col("k"), col("lt").as("t"), col("lv"),
        col("s.rv").as("rv"), col("s.rd").as("rd"))
    val ours = AsOfJoin.backward(left, right, Seq("k"), "t", "t", Seq("rv", "rd"))

    def key(r: org.apache.spark.sql.Row): String =
      Seq(r.getString(0), r.getLong(1), r.getInt(2),
        Option(r.getString(3)), Option(r.get(4))).mkString("|")
    val a = ours.select("k", "t", "lv", "rv", "rd").collect().map(key).sorted.toSeq
    val b = reference.collect().map(key).sorted.toSeq
    assert(a == b)
    assert(a.size == 200)
  }

  test("forward: each left row gets the earliest right row at or after it") {
    import spark.implicits._
    val left = Seq(("a", 5L), ("a", 14L), ("a", 25L), ("b", 7L)).toDF("k", "t")
    val right = Seq(("a", 10L, "r10"), ("a", 20L, "r20"), ("b", 3L, "rb")).toDF("k", "t", "v")
    val out = AsOfJoin.forward(left, right, Seq("k"), "t", "t", Seq("v"))
    assert(collectPairs(out) == Seq(
      ("a", 5L, Some("r10")),
      ("a", 14L, Some("r20")),
      ("a", 25L, None), // after every right row
      ("b", 7L, None)))
  }

  test("forward: a right row at exactly the left timestamp matches (<= semantics)") {
    import spark.implicits._
    val left = Seq(("a", 10L)).toDF("k", "t")
    val right = Seq(("a", 10L, "same"), ("a", 11L, "later")).toDF("k", "t", "v")
    val out = AsOfJoin.forward(left, right, Seq("k"), "t", "t", Seq("v"))
    assert(collectPairs(out) == Seq(("a", 10L, Some("same"))))
  }

  test("tolerance nulls out matches staler than the budget, keeps the rest") {
    import spark.implicits._
    val left = Seq(("a", 5L), ("a", 14L), ("a", 25L)).toDF("k", "t")
    val right = Seq(("a", 10L, "r10"), ("a", 20L, "r20")).toDF("k", "t", "v")
    // backward distances: t=14 -> 4 from r10; t=25 -> 5 from r20.
    val out4 = AsOfJoin.backward(left, right, Seq("k"), "t", "t", Seq("v"),
      tolerance = Some(4L))
    assert(collectPairs(out4) == Seq(
      ("a", 5L, None), ("a", 14L, Some("r10")), ("a", 25L, None)))
    // forward distances: t=5 -> 5 to r10; t=14 -> 6 to r20.
    val fwd5 = AsOfJoin.forward(left, right, Seq("k"), "t", "t", Seq("v"),
      tolerance = Some(5L))
    assert(collectPairs(fwd5) == Seq(
      ("a", 5L, Some("r10")), ("a", 14L, None), ("a", 25L, None)))
  }

  test("timeBucket partitioning reproduces the unbucketed result exactly") {
    import spark.implicits._
    val left = (1 to 200)
      .map(i => (s"k${i % 7}", (i * 37 % 101).toLong, i)).toDF("k", "t", "lv")
    val right = (1 to 80)
      .map(i => (s"k${i % 7}", (i * 53 % 97).toLong, s"v$i"))
      .toDF("k", "t", "rv")
      .groupBy("k", "t").agg(max("rv").as("rv"))
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select("k", "t", "lv", "rv").collect()
        .map(r => Seq(r.getString(0), r.getLong(1), r.getInt(2), Option(r.getString(3)))
          .mkString("|")).sorted.toSeq
    for (direction <- Seq(false, true); width <- Seq(1L, 7L, 50L, 1000L)) {
      val run = if (direction)
        (b: Option[Long]) => AsOfJoin.forward(left, right, Seq("k"), "t", "t", Seq("rv"),
          tolerance = Some(30L), timeBucket = b)
      else
        (b: Option[Long]) => AsOfJoin.backward(left, right, Seq("k"), "t", "t", Seq("rv"),
          tolerance = Some(30L), timeBucket = b)
      assert(canon(run(Some(width))) == canon(run(None)),
        s"bucketed (width=$width, forward=$direction) diverged from unbucketed")
    }
  }

  test("plan shuffles once on the key — no join node at all") {
    import spark.implicits._
    val left = Seq(("a", 5L)).toDF("k", "t")
    val right = Seq(("a", 1L, "x")).toDF("k", "t", "v")
    val plan = AsOfJoin.backward(left, right, Seq("k"), "t", "t", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"expected a join-free union+window plan:\n$plan")
    assert(plan.contains("Window"))
  }

  test("requireRightUnique passes unique inputs, names duplicate (key, ts) groups") {
    import spark.implicits._
    val unique = Seq(("a", 1L, "x"), ("a", 2L, "y"), ("b", 1L, "z")).toDF("k", "t", "v")
    AsOfJoin.requireRightUnique(unique, Seq("k"), "t") // must not throw
    val dup = unique.unionAll(Seq(("a", 2L, "y2")).toDF("k", "t", "v"))
    val e = intercept[IllegalStateException] {
      AsOfJoin.requireRightUnique(dup, Seq("k"), "t")
    }
    assert(e.getMessage.contains("uniqueness contract") && e.getMessage.contains("[a,2,2]"))
  }
}
