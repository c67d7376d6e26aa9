package graft

import org.apache.spark.sql.SparkSession

/** One timed extraction run at a single parallelism level — the
  * building block of the two-cluster-size scaling evidence
  * (BASELINE.md). Run it once per core count in a FRESH JVM (shared
  * JVMs showed multi-x session-order variance) via
  * tools/scaling.sh, which computes
  * efficiency = throughput(4N) / (4 × throughput(N)).
  *
  * Usage: runMain graft.ScalingBench [sfDir] [cores] [replicate]
  * Prints one JSON line with rows, seconds (best of 2 timed runs
  * after an in-JVM warm-up), throughput, and an output fingerprint
  * (equal fingerprints across core counts = order invariance).
  */
object ScalingBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cores = args.lift(1).map(_.toInt).getOrElse(8)
    val replicate = args.lift(2).map(_.toInt)
      .orElse(sys.env.get("SPARK_GRAFT_REPLICATE").map(_.toInt)).getOrElse(80)

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
    // heavy HTML or one task materializes + shuffle-writes everything
    val docs = queries.Tables.documents(spark, sfDir).repartition(4 * cores)
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
    val taskTime = new java.util.concurrent.atomic.AtomicLong()
    val gcTime = new java.util.concurrent.atomic.AtomicLong()
    val nTasks = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        if (t.taskMetrics != null) {
          taskTime.addAndGet(t.taskMetrics.executorRunTime)
          gcTime.addAndGet(t.taskMetrics.jvmGCTime)
          nTasks.incrementAndGet()
        }
      }
    })
    Bench.time(job) // JIT warm-up
    taskTime.set(0); gcTime.set(0); nTasks.set(0)
    val sec = Bench.time(job)
    System.err.println(s"[scaling] cores=$cores wall=$sec tasks=${nTasks.get} " +
      s"taskTimeSum=${taskTime.get / 1000.0}s gcSum=${gcTime.get / 1000.0}s " +
      s"utilization=${taskTime.get / 1000.0 / (sec * cores)}")
    val fp = job
      .selectExpr("bit_xor(xxhash64(conv_id, turn_idx, title, text_content, platform)) AS h")
      .head.getLong(0)

    println(
      s"""{"metric":"extract_throughput","cores":$cores,"rows":$n,"sec":$sec,"turns_per_sec":${n / sec},"fingerprint":$fp,"sf":"$sfDir"}""")
    spark.stop()
  }
}
