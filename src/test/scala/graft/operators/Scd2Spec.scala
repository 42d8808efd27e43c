package graft.operators

import graft.SparkTestBase

class Scd2Spec extends SparkTestBase {
  import spark.implicits._

  // (user, ts, event_id, status) — ts as plain longs; the operator only
  // compares/orders them.
  private def log = Seq(
    (1L, 10L, 100L, "bronze"),
    (1L, 20L, 101L, "bronze"),
    (1L, 30L, 102L, "gold"),
    (1L, 40L, 103L, "bronze"),
    (2L, 10L, 200L, "gold"))
    .toDF("user_id", "ts", "event_id", "status")

  private def hist = Scd2.history(log, "user_id", "ts", "event_id", "status")
    .orderBy("user_id", "version").collect()

  test("consecutive same-value runs collapse; value reappearing later opens a NEW version") {
    val u1 = hist.filter(_.getLong(0) == 1L)
    assert(u1.map(r => (r.getLong(1), r.getString(2), r.getLong(6))).toSeq ==
      Seq((1L, "bronze", 2L), (2L, "gold", 1L), (3L, "bronze", 1L)))
  }

  test("valid_to chains to the next version's valid_from; only the last is current") {
    val u1 = hist.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getLong(3)).toSeq == Seq(10L, 30L, 40L))        // valid_from
    assert(u1.dropRight(1).map(_.getLong(4)).toSeq == Seq(30L, 40L)) // valid_to
    assert(u1.map(_.getBoolean(7)).toSeq == Seq(false, false, true))
    assert(u1.last.isNullAt(4))
  }

  test("single-event key is one current version") {
    val u2 = hist.filter(_.getLong(0) == 2L)
    assert(u2.length == 1 && u2.head.getBoolean(7) && u2.head.getLong(6) == 1L)
  }

  test("null attribute values form runs (null-safe change detection)") {
    val withNulls = Seq(
      (1L, 10L, 1L, Some("a")),
      (1L, 20L, 2L, None),
      (1L, 30L, 3L, None),
      (1L, 40L, 4L, Some("a")))
      .toDF("user_id", "ts", "event_id", "status")
    val h = Scd2.history(withNulls, "user_id", "ts", "event_id", "status")
      .orderBy("version").collect()
    assert(h.length == 3)
    assert(h(1).isNullAt(2) && h(1).getLong(6) == 2L) // the null run collapsed
  }

  test("equal timestamps break ties on the tie column, so runs are deterministic") {
    val tied = Seq(
      (1L, 10L, 2L, "b"),
      (1L, 10L, 1L, "a"),
      (1L, 20L, 3L, "b"))
      .toDF("user_id", "ts", "event_id", "status")
    val h = Scd2.history(tied, "user_id", "ts", "event_id", "status")
      .orderBy("version").collect()
    // order is (10,1)a, (10,2)b, (20,3)b -> runs a(1), b(2)
    assert(h.map(r => (r.getString(2), r.getLong(6))).toSeq == Seq(("a", 1L), ("b", 2L)))
    // Both runs share valid_from=10 (the boundary falls on the tied ts):
    // lead() must still chain a -> b (version tie-break), never b -> a.
    assert(h.map(_.getLong(3)).toSeq == Seq(10L, 10L))       // valid_from tied
    assert(h(0).getLong(4) == 10L)                           // a.valid_to = b.valid_from
    assert(h(1).isNullAt(4))                                 // b open-ended
    assert(h.map(_.getBoolean(7)).toSeq == Seq(false, true)) // only b current
  }
}
