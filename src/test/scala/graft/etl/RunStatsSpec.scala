package graft.etl

import org.scalatest.funsuite.AnyFunSuite

class RunStatsSpec extends AnyFunSuite {

  test("success rate and throughput match the reference formulas (A3)") {
    val s = RunStats(10, 9, 1, 12000, 25.0, Seq("e1"))
    assert(s.successRate == 90.0)
    assert(s.blocksPerSecond == 9 / 25.0)
    assert(s.transactionsPerSecond == 480.0) // the reference's headline regime
  }

  test("zero-attempt and zero-elapsed runs do not divide by zero") {
    assert(RunStats.empty.successRate == 0.0)
    assert(RunStats.empty.blocksPerSecond == 0.0)
    assert(RunStats.empty.transactionsPerSecond == 0.0)
  }

  test("top-5 errors cap (pipeline.rs:303) and merge") {
    val s = RunStats(0, 0, 0, 0, 0, (1 to 8).map(i => s"e$i"))
    assert(s.topErrors == Seq("e1", "e2", "e3", "e4", "e5"))
    val m = RunStats(1, 1, 0, 5, 1.0, Seq("a")).merge(RunStats(2, 1, 1, 7, 2.0, Seq("b")))
    assert(m == RunStats(3, 2, 1, 12, 3.0, Seq("a", "b")))
  }
}
