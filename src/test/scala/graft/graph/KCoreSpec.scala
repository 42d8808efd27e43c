package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class KCoreSpec extends SparkTestBase {
  import spark.implicits._

  // K4 clique {1..4} with a pendant chain 4-10-11-12
  private def cliqueWithTail = {
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    (k4 ++ Seq((4L, 10L), (10L, 11L), (11L, 12L))).toDF("src", "dst")
  }

  test("3-core of a clique with a pendant chain is exactly the clique") {
    val got = KCore.kCore(cliqueWithTail, k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), s"got $got")
  }

  test("2-core keeps cycles and peels chains by cascade (multi-round)") {
    // triangle 1-2-3 plus chain 3-20-21-22: each peel removes ONE chain
    // end, so the full peel needs 3 rounds — pinning that the loop
    // actually iterates.
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (3L, 20L), (20L, 21L), (21L, 22L)).toDF("src", "dst")
    val full = KCore.kCore(g, k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(full == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), s"got $full")
    // one pinned round only strips the chain's endpoint
    val one = KCore.kCore(g, k = 2, rounds = Some(1))
      .collect().map(r => r.getLong(0)).toSet
    assert(one == Set(1L, 2L, 3L, 20L, 21L), s"got $one")
    // enough pinned rounds reach the fixpoint exactly
    val pinned = KCore.kCore(g, k = 2, rounds = Some(5))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pinned == full)
  }

  test("reversed/duplicate/self-loop edges normalize; repartition-stable") {
    val messy = cliqueWithTail
      .unionByName(Seq((2L, 1L), (3L, 3L), (10L, 4L)).toDF("src", "dst"))
    def run(d: org.apache.spark.sql.DataFrame) =
      KCore.kCore(d, k = 3).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(run(messy) == run(cliqueWithTail))
    assert(run(messy) == run(messy.repartition(7)))
  }

  test("g6's pinned 4 rounds reach the true fixpoint on the sf0.001 graph") {
    val sf = "/root/testdata/sf0.001"
    val occ = graft.tables.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        date_trunc("minute", col("ts")).as("mb"))
      .distinct()
    val edges = occ.as("o1")
      .join(occ.as("o2"),
        col("o1.event_type") === col("o2.event_type") &&
          col("o1.mb") === col("o2.mb") &&
          col("o1.user_id") < col("o2.user_id"))
      .select(col("o1.user_id").as("src"), col("o2.user_id").as("dst"))
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(rows(KCore.kCore(edges, k = 3, rounds = Some(4))) ==
      rows(KCore.kCore(edges, k = 3)),
      "the registered 4-round semantics must coincide with the fixpoint here")
  }
}
