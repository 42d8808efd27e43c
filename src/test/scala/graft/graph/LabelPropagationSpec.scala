package graft.graph

import graft.SparkTestBase

class LabelPropagationSpec extends SparkTestBase {
  import spark.implicits._

  // two K4 cliques {1..4} and {11..14} joined by one bridge 4-11
  private def twoCliques = {
    def k4(vs: Seq[Long]) = for (a <- vs; b <- vs if a < b) yield (a, b)
    (k4(Seq(1L, 2L, 3L, 4L)) ++ k4(Seq(11L, 12L, 13L, 14L)) :+ (4L, 11L))
      .toDF("src", "dst")
  }

  test("two bridged cliques resolve to two communities (labels converge within-clique)") {
    val got = LabelPropagation.communities(twoCliques, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val c1 = Set(1L, 2L, 3L, 4L).map(got)
    val c2 = Set(11L, 12L, 13L, 14L).map(got)
    assert(c1.size == 1, s"clique 1 split: $got")
    assert(c2.size == 1, s"clique 2 split: $got")
    assert(c1 != c2, s"cliques merged: $got")
  }

  test("one round on a star: every leaf adopts its only neighbor; ties go to the smallest label") {
    val star = Seq((5L, 1L), (5L, 2L), (5L, 3L)).toDF("src", "dst")
    val got = LabelPropagation.communities(star, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // leaves see only {5}; the hub sees {1,2,3} all count 1 -> smallest = 1
    assert(got == Map(1L -> 5L, 2L -> 5L, 3L -> 5L, 5L -> 1L))
  }

  test("string vertex ids keep the deterministic tie-break (negation lands on the count)") {
    // hub "e" sees {a,b,c} all count 1 -> smallest label "a"; a negate on
    // the LABEL would cast string->double->null and break this.
    val star = Seq(("e", "a"), ("e", "b"), ("e", "c")).toDF("src", "dst")
    val got = LabelPropagation.communities(star, rounds = 1)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> "e", "b" -> "e", "c" -> "e", "e" -> "a"))
  }

  test("duplicate/reversed/self-loop edges normalize; result is repartition-stable") {
    val messy = twoCliques
      .unionByName(Seq((2L, 1L), (1L, 2L), (3L, 3L)).toDF("src", "dst"))
    def run(d: org.apache.spark.sql.DataFrame) =
      LabelPropagation.communities(d, rounds = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(run(messy) == run(messy.repartition(7)))
    assert(run(messy) == run(twoCliques))
  }
}
