package graft.bench

import org.scalatest.funsuite.AnyFunSuite

import graft.Bench

/** Pins the bench's cross-round adjudication helpers (r19 verdict #3):
  * the recheck classifier's per-row verdicts, the growth thresholds they
  * rest on, and — the round's new guarantee — that a slow-window median
  * the recheck adjudicated `ok`/`ambient` with a clean rerun enters the
  * prev chain at the rerun value, not the inflated median (r19's t44
  * recorded 4.25 s, rerun 2.50 s, classed `ok` — and 4.25 became r20's
  * comparison base).
  */
class BenchAdjudicationSpec extends AnyFunSuite {

  // --- grew: the r16 verdict #4 thresholds -------------------------------
  test("grew: >2x for entries >= 1 s") {
    assert(Bench.grew(2.1, 1.0))
    assert(!Bench.grew(1.9, 1.0))
  }
  test("grew: >3x above the 0.25 s floor below 1 s") {
    assert(Bench.grew(0.9, 0.25))
    assert(!Bench.grew(0.7, 0.25))   // under 3x
    assert(!Bench.grew(0.24, 0.05))  // under the floor: never a grower
  }

  // --- classifyRow: every branch, priority order -------------------------
  test("contaminated wins over everything") {
    assert(Bench.classifyRow(4.0, Some(1.0), contaminated = true,
      prev = Some(1.0), localRatio = 1.0) === "contaminated")
  }
  test("regression: adjusted growth a clean rerun reproduces") {
    assert(Bench.classifyRow(2.5, Some(2.4), contaminated = false,
      prev = Some(1.0), localRatio = 1.0) === "regression")
  }
  test("ambient_unreproduced: adjusted growth the rerun does not reproduce") {
    // rerun back at the prev level — mixed evidence, not a confirmed
    // regression (the classifier's `contaminated` test upstream uses
    // recorded > 2x rerun; here 2.5 vs 1.3 is below that bar).
    assert(Bench.classifyRow(2.5, Some(1.3), contaminated = false,
      prev = Some(1.0), localRatio = 1.0) === "ambient_unreproduced")
  }
  test("ambient: raw growth fully explained by the local yardstick ratio") {
    // recorded 2.5 over prev 1.0 raw, but the local ambient index ran
    // 3x slower — adjusted base 3.0, no adjusted growth, raw growth yes.
    assert(Bench.classifyRow(2.5, Some(2.4), contaminated = false,
      prev = Some(1.0), localRatio = 3.0) === "ambient")
  }
  test("ok: in the roster by rank only") {
    assert(Bench.classifyRow(1.5, Some(1.4), contaminated = false,
      prev = Some(1.0), localRatio = 1.0) === "ok")
    assert(Bench.classifyRow(1.5, Some(1.4), contaminated = false,
      prev = None, localRatio = 1.0) === "ok")
  }

  // --- adjudicated: the prev-chain value (r19 verdict #3) ----------------
  test("ok-classed row with a clean rerun persists min(recorded, rerun)") {
    // The literal t44 case: recorded 4.25, clean rerun 2.50, class ok.
    assert(Bench.adjudicated(4.25, Some(2.50), "ok") === 2.50)
  }
  test("ambient-classed row's prev-chain value is the clean rerun") {
    assert(Bench.adjudicated(3.0, Some(1.2), "ambient") === 1.2)
  }
  test("a rerun slower than the median never raises the chain value") {
    assert(Bench.adjudicated(1.0, Some(1.6), "ok") === 1.0)
  }
  test("regression and ambient_unreproduced keep the loud recorded number") {
    assert(Bench.adjudicated(2.5, Some(2.4), "regression") === 2.5)
    assert(Bench.adjudicated(2.5, Some(1.3), "ambient_unreproduced") === 2.5)
  }
  test("contaminated and rerun-less rows pass through unchanged") {
    assert(Bench.adjudicated(4.0, Some(1.0), "contaminated") === 4.0)
    assert(Bench.adjudicated(4.0, None, "ok") === 4.0)
  }

  // --- headSha: plain-file resolution, loose and packed ------------------
  test("headSha resolves a loose ref, a packed ref, and a detached HEAD") {
    import java.nio.file.{Files, Paths}
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val git = Files.createTempDirectory("graft_bench_git")
    val sha = "0123456789abcdef0123456789abcdef01234567"
    Files.write(git.resolve("HEAD"), "ref: refs/heads/main\n".getBytes(utf8))
    // packed only
    Files.write(git.resolve("packed-refs"),
      s"# pack-refs with: peeled\n$sha refs/heads/main\n".getBytes(utf8))
    assert(Bench.headSha(git) === Some(sha))
    // loose ref wins once present
    val loose = git.resolve(Paths.get("refs", "heads"))
    Files.createDirectories(loose)
    val sha2 = "fedcba9876543210fedcba9876543210fedcba98"
    Files.write(loose.resolve("main"), (sha2 + "\n").getBytes(utf8))
    assert(Bench.headSha(git) === Some(sha2))
    // detached HEAD
    Files.write(git.resolve("HEAD"), (sha + "\n").getBytes(utf8))
    assert(Bench.headSha(git) === Some(sha))
    // unreadable dir degrades to None, never throws
    assert(Bench.headSha(git.resolve("absent")) === None)
  }
}
