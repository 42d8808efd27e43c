package graft.util

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SaltingSpec extends SparkTestBase {

  test("salted join equals the plain equi-join on skewed data") {
    import spark.implicits._
    // 10k rows of one hot key + a tail of cold keys.
    val left = ((1 to 10000).map(i => ("hot", i)) ++ (1 to 100).map(i => (s"cold$i", i)))
      .toDF("k", "v")
    val right = (Seq("hot") ++ (1 to 100).map(i => s"cold$i")).zipWithIndex
      .map { case (k, i) => (k, s"dim$i") }.toDF("k", "name")

    val plain = left.join(right, Seq("k")).select("k", "v", "name")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).sorted.toSeq
    val salted = Salting.saltedJoin(left, right, Seq("k"), numSalts = 8)
      .select("k", "v", "name")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).sorted.toSeq
    assert(salted == plain)
    assert(salted.size == 10100)
  }

  test("left join semantics preserved (unmatched rows survive once)") {
    import spark.implicits._
    val left = Seq(("a", 1), ("b", 2), ("nomatch", 3)).toDF("k", "v")
    val right = Seq(("a", "x"), ("b", "y")).toDF("k", "name")
    val out = Salting.saltedJoin(left, right, Seq("k"), numSalts = 4, joinType = "left")
      .select("k", "v", "name").collect()
      .map(r => (r.getString(0), r.getInt(1), Option(r.getString(2)))).sorted.toSeq
    assert(out == Seq(("a", 1, Some("x")), ("b", 2, Some("y")), ("nomatch", 3, None)))
  }

  test("right-preserving join types are rejected (replication would duplicate them)") {
    import spark.implicits._
    val left = Seq(("a", 1)).toDF("k", "v")
    val right = Seq(("a", "x"), ("orphan", "y")).toDF("k", "name")
    for (jt <- Seq("right", "right_outer", "full", "full_outer", "outer"))
      intercept[IllegalArgumentException] {
        Salting.saltedJoin(left, right, Seq("k"), numSalts = 4, joinType = jt)
      }
    // left_anti still works (left-preserving).
    val anti = Salting.saltedJoin(left, right, Seq("k"), numSalts = 4, joinType = "left_anti")
    assert(anti.count() == 0)
  }
}
