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
}
