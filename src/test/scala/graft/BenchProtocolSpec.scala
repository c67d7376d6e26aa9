package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the measurement protocol's clean-flag logic
  * (round-4 VERDICT #2): the task-time floor must reject
  * frequency-throttled reps even when EVERY rep of a context is
  * throttled — via the external (global, cross-config) floor. */
class BenchProtocolSpec extends AnyFunSuite {

  private def s(cores: Int, sec: Double, taskSec: Double,
                clean: Boolean = true): Bench.Sample =
    Bench.Sample(cores, 1, sec, stealPct = 0.1, taskSec = taskSec,
      util = 0.95, clean = clean)

  test("context-relative floor rejects a throttled rep beside a clean one") {
    val out = Bench.withTaskFloor(Seq(s(16, 3.3, 47.0), s(16, 52.0, 2900.0)))
    assert(out.map(_.clean) == Seq(true, false))
  }

  test("a wholly-throttled context self-certifies WITHOUT the external floor…") {
    // both reps throttled (task_sec ~8x the true cost): relative to
    // each other they look fine — this is exactly the round-4
    // efficiency-5.47 failure mode
    val out = Bench.withTaskFloor(Seq(s(8, 52.0, 400.0), s(8, 55.0, 410.0)))
    assert(out.forall(_.clean))
  }

  test("…and is rejected WITH the external (global, cross-config) floor") {
    val out = Bench.withTaskFloor(
      Seq(s(8, 52.0, 400.0), s(8, 55.0, 410.0)), extMin = 47.0)
    assert(out.forall(!_.clean))
  }

  test("the external floor keeps legitimate higher-thread-count cost (<=1.5x)") {
    // measured legitimate inflation at 4x threads is ~1.29x — must
    // survive a floor observed on the small-cores side
    val out = Bench.withTaskFloor(Seq(s(16, 3.4, 60.6)), extMin = 47.0)
    assert(out.forall(_.clean))
  }

  test("an upstream-dirty rep can never be promoted by the floor") {
    val out = Bench.withTaskFloor(Seq(s(8, 5.0, 47.0, clean = false)))
    assert(out.forall(!_.clean))
  }

  test("no positive task_sec and no external floor means nothing is clean") {
    val out = Bench.withTaskFloor(Seq(s(8, 5.0, 0.0)))
    assert(out.forall(!_.clean))
  }

  // --- per-query sweep clean flag (round-5 VERDICT #1): the frozen
  // task_sec baseline must reject a frequency-throttled sweep entry
  // that passes the steal-only check ---

  test("sweep: a 10x-task_sec entry at low steal is dirty once a baseline exists") {
    // the BENCH_r05 q10 signature: 26 s, 0.4% steal, task_sec 25.4 vs
    // a historical clean 2.2-4.6 — steal-only printed clean:true
    val throttled = s(32, 26.16, 25.4)
    assert(!Bench.sweepClean(throttled, baseline = Some(2.4)))
    assert(Bench.sweepClean(throttled, baseline = None)) // steal-only fallback
  }

  test("sweep: a clean entry within the floor factor stays clean") {
    assert(Bench.sweepClean(s(32, 2.6, 2.9), baseline = Some(2.4)))
  }

  test("sweep: sub-second noise above the factor but inside the slack stays clean") {
    // the first live run's q39: task 0.77 vs a 0.28 min-of-3 baseline —
    // 2.7x the factor, but pure codegen/JIT noise, absorbed by +2 s
    assert(Bench.sweepClean(s(32, 1.45, 0.77), baseline = Some(0.28)))
    // the slack must NOT rescue a genuine mid-size inflation: q13 at
    // 24.0 vs baseline 12.6 (1.5x+2 = 20.9) stays dirty
    assert(!Bench.sweepClean(s(32, 4.3, 24.0), baseline = Some(12.6)))
  }

  test("sweep: high steal is dirty regardless of baseline") {
    val stolen = Bench.Sample(32, 0, 24.7, stealPct = 11.4,
      taskSec = 2.4, util = 0.4, clean = true)
    assert(!Bench.sweepClean(stolen, baseline = Some(2.4)))
    assert(!Bench.sweepClean(stolen, baseline = None))
  }

  test("sweep: a failed run (sec<0) is never clean") {
    val failed = Bench.Sample(32, 0, -1.0, -1.0, 0.0, 0.0, clean = false)
    assert(!Bench.sweepClean(failed, baseline = None))
  }

  test("sweep baseline loader filters by SF prefix and survives a missing file") {
    val f = java.nio.file.Files.createTempFile("sweep-baseline", ".json")
    java.nio.file.Files.writeString(f,
      """{"sf0.1/q10": 2.4, "sf0.1/q15": 3.1, "sf0.01/q10": 0.6}""")
    try {
      assert(Bench.loadSweepBaseline("/root/testdata/sf0.1", f.toString) ==
        Map("q10" -> 2.4, "q15" -> 3.1))
      assert(Bench.loadSweepBaseline("/root/testdata/sf0.01", f.toString) ==
        Map("q10" -> 0.6))
      assert(Bench.loadSweepBaseline("/root/testdata/sf0.1",
        "/nonexistent/baseline.json").isEmpty)
    } finally java.nio.file.Files.deleteIfExists(f)
  }
}
