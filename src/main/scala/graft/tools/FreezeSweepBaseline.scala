package graft.tools

import graft.{Bench, SparkEntry}
import graft.queries.TempCaches

/** Freeze per-query sweep task_sec baselines (round-5 VERDICT #1).
  *
  * The per-query sweep in graft.Bench runs each query ONCE, so it has
  * no reference task-time floor of its own — a frequency-throttled
  * window (low steal, plausible utilization, ~10× task_sec) could
  * print `clean: true`. This tool runs the full registry sweep
  * several times in one session and freezes the per-query MINIMUM
  * task_sec — the least-throttled observation, and on an identical
  * plan + input the task set's CPU cost is constant, so the minimum
  * is the honest floor. Bench then flags any sweep entry whose
  * task_sec exceeds taskFloorFactor × baseline as dirty and retries
  * it once.
  *
  * Output: a committed flat JSON file mapping "<sfName>/<query>" →
  * task_sec (merged with any existing entries for OTHER SFs or
  * queries not measured in this run only when they don't collide).
  *
  * Usage: runMain graft.tools.FreezeSweepBaseline [sfDir] [reps] [out]
  */
object FreezeSweepBaseline {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val out = args.lift(2).getOrElse("SWEEP_BASELINE.json")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val sfName = java.nio.file.Paths.get(sfDir).getFileName.toString

    val spark = Bench.session(cpus)
    val listener = new Bench.TaskTimeListener
    spark.sparkContext.addSparkListener(listener)
    val best = scala.collection.mutable.Map[String, Double]()
    for (rep <- 1 to reps; q <- SparkEntry.registry) {
      val s =
        try Bench.timedRep(cpus, rep, listener, Some(spark))(
          Bench.timeBuilt(q.fn(spark, sfDir)))
        catch { case e: Throwable =>
          System.err.println(s"[freeze-sweep] ${q.name} FAILED: $e")
          Bench.Sample(cpus, rep, -1.0, -1.0, 0.0, 0.0, clean = false)
        } finally {
          TempCaches.release(spark)
          spark.catalog.clearCache()
        }
      if (s.taskSec > 0) {
        val cur = best.getOrElse(q.name, Double.PositiveInfinity)
        if (s.taskSec < cur) best(q.name) = s.taskSec
        System.err.println(s"[freeze-sweep] rep$rep ${q.name} sec=${s.sec} " +
          s"task_sec=${s.taskSec} steal%=${s.stealPct} min=${best(q.name)}")
      }
    }
    spark.stop()

    // merge: keep existing entries for other SFs / unmeasured queries;
    // on collision take the MIN — the baseline is the least-throttled
    // observation ever recorded for the current plan, so a re-freeze
    // in a slow host regime must never RAISE a floor (delete the
    // entry manually when a plan deliberately changes cost)
    val existing: Map[String, Double] =
      try {
        val txt = java.nio.file.Files.readString(java.nio.file.Paths.get(out))
        """"([^"]+)"\s*:\s*([0-9.Ee+-]+)""".r.findAllMatchIn(txt)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      } catch { case _: Throwable => Map.empty }
    val merged = existing ++ best.map { case (k, v) =>
      val key = s"$sfName/$k"
      val vr = math.rint(v * 1000) / 1000
      key -> existing.get(key).fold(vr)(math.min(_, vr))
    }
    val json = merged.toSeq.sorted
      .map { case (k, v) => s""""$k": $v""" }
      .mkString("{\n", ",\n", "\n}\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json)
    System.err.println(s"[freeze-sweep] wrote ${merged.size} entries to $out")
  }
}
