package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-7 optimization instrumentation (guide §1): per-query
  * noop-sink isolation timings + `.explain("formatted")` capture for
  * every registry query, WITHOUT touching the frozen graft.Bench
  * harness. Mirrors Bench's session config (master local[$CPUS],
  * shuffle.partitions=$CPUS, AQE on) so numbers are comparable.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt -batch "runMain graft.tools.BenchExtra <planOutDir> [reps] [q...]"
  *
  * Writes <planOutDir>/<query>.txt (formatted plan) when planOutDir is
  * not "-", times `reps` repetitions per query (plan construction
  * inside the timed window, as Bench does), and prints one JSON line:
  * {"queries": {name: [sec,...]}, "min": {name: sec}}.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val planDir = args.headOption.getOrElse("-")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val names = if (args.length > 2) args.drop(2).toSeq
                else graft.SparkEntry.registry.map(_.name)

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (planDir != "-")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(planDir))

    val listener = new graft.Bench.TaskTimeListener
    spark.sparkContext.addSparkListener(listener)

    val byName = graft.SparkEntry.queries
    val results = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    for (n <- names) {
      val fn = byName(n)
      // plan capture (pre-execution; shows join strategy + exchanges)
      if (planDir != "-") {
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(planDir, s"$n.txt"), plan)
        } catch { case e: Throwable =>
          System.err.println(s"[extra] plan capture $n FAILED: $e")
        } finally {
          graft.queries.TempCaches.release(spark)
          spark.catalog.clearCache()
        }
      }
      spark.sparkContext.setJobDescription(s"extra:$n")
      val secs = (1 to reps).map { r =>
        val smp =
          try graft.Bench.timedRep(cpus, r, listener, Some(spark))(
            graft.Bench.timeBuilt(fn(spark, sfDir)))
          catch { case e: Throwable =>
            System.err.println(s"[extra] $n FAILED: $e")
            graft.Bench.Sample(cpus, r, -1.0, -1.0, 0.0, 0.0, clean = false)
          } finally {
            graft.queries.TempCaches.release(spark)
            spark.catalog.clearCache()
          }
        System.err.println(s"[extra] $n rep=${smp.sec} steal%=${smp.stealPct} " +
          s"task_sec=${smp.taskSec} util=${smp.util}")
        smp.sec
      }
      results(n) = secs
    }
    val qs = results.map { case (k, v) =>
      "\"" + k + "\":[" + v.mkString(",") + "]"
    }.mkString("{", ",", "}")
    val mins = results.map { case (k, v) =>
      "\"" + k + "\":" + v.filter(_ > 0).minOption.getOrElse(-1.0)
    }.mkString("{", ",", "}")
    println(s"""{"sf":"$sfDir","cpus":$cpus,"queries":$qs,"min":$mins}""")
    spark.stop()
  }
}
