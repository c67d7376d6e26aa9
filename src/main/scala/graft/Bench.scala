package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark harness (driver contract): measures the headline
  * extraction throughput and times every registered query on
  * SPARK_GRAFT_SF_DIR, printing ONE bare JSON line on stdout
  * (build.sbt sets `run / outputStrategy := StdoutOutput` so the line
  * is not wrapped in sbt's `[info]` decoration — round-1's official
  * record was unparseable because of it).
  *
  * Measurement protocol (the sandbox host has documented bursty CPU
  * steal: identical runs have measured 2.5 s and 410 s — a single
  * timed sample is worthless, which is what poisoned the round-1 AND
  * round-2 official records):
  *  - the replicated corpus is generated ONCE and staged to local
  *    parquet; each headline context re-reads + re-caches it (cuts
  *    per-context setup so more timed samples fit in the budget);
  *  - the headline runs at TWO core counts (N and 4N, fresh
  *    SparkContext each); each fresh context times THREE repetitions
  *    after a warm-up and keeps the min (a throttle window inside a
  *    context no longer poisons the whole config — round 2 timed only
  *    once per context, and both 32-core contexts landed in throttle
  *    windows);
  *  - contexts are ordered 4N-first in every round, so if the budget
  *    guard trips mid-round the headline config got the sample, and
  *    two extra budget-gated 4N contexts run after the interleaved
  *    rounds (the 4N number IS the headline — spend leftover budget
  *    there);
  *  - host CPU steal is sampled from /proc/stat around every timed
  *    repetition and reported per-sample (`headline_detail`), so a
  *    low official number is attributable to the host inside the
  *    artifact itself;
  *  - all per-context minima are reported in `headline_runs`; the
  *    N-vs-4N pair doubles as the in-process two-cluster-size scaling
  *    evidence (`scaling.efficiency`); the official fresh-JVM
  *    protocol lives in tools/scaling.sh and BASELINE.md.
  *
  * Timing uses the `noop` sink so the full plan materializes —
  * `count()` would let Catalyst prune expensive columns (e.g. the
  * extraction struct) and measure nothing.
  */
object Bench {

  def time(df: DataFrame): Double = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  /** (steal ticks, total ticks) from the aggregate /proc/stat cpu
    * line; (0,0) when unreadable (non-Linux). */
  private def cpuTicks(): (Long, Long) = {
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val f = src.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
        (f.lift(7).getOrElse(0L), f.sum)
      } finally src.close()
    } catch { case _: Throwable => (0L, 0L) }
  }

  final case class Sample(cores: Int, round: Int, sec: Double, stealPct: Double)

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // trade memory for per-run decompress CPU on the cached corpus
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Generate the replicated transcript corpus once and stage it as
    * local parquet — corpus generation (HTML synthesis) is the most
    * expensive part of a headline context's setup, and it is
    * deterministic, so every context can read the same staged files. */
  private def stageCorpus(sfDir: String, cpus: Int, targetTurns: Long): (String, Long) = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bench-corpus").toString
    val spark = session(cpus)
    try {
      val docs = queries.Tables.documents(spark, sfDir)
        .repartition(4 * cpus) // tiny parquet = 1 input split
      val replicate =
        math.max(1, (targetTurns / math.max(1L, docs.count())).toInt)
      val turns = pipeline.TranscriptGen.fromDocumentsReplicated(docs, replicate)
      turns.write.mode("overwrite").parquet(dir)
      val n = spark.read.parquet(dir).count()
      (dir, n)
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  /** One fresh-context headline run: re-cache the staged corpus, warm
    * up once, then time `timed` repetitions with steal sampled around
    * each. Returns all repetition samples. */
  private def headlineSamples(cpus: Int, round: Int, corpusDir: String,
                              timed: Int): Seq[Sample] = {
    val spark = session(cpus)
    try {
      val turns = spark.read.parquet(corpusDir)
        .repartition(4 * cpus) // deterministic task granularity per config
        .cache()
      turns.count() // materialize the cache
      def job = pipeline.ExtractJob
        .runTyped(spark, turns, repartitionInput = false).toDF()
      time(job) // context warm-up (JIT persists JVM-wide)
      (1 to timed).map { _ =>
        val (s0, t0) = cpuTicks()
        val sec = time(job)
        val (s1, t1) = cpuTicks()
        val steal =
          if (t1 > t0) 100.0 * (s1 - s0) / (t1 - t0) else -1.0
        Sample(cpus, round, sec, math.rint(steal * 100) / 100)
      }
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val rounds = sys.env.get("SPARK_GRAFT_BENCH_ROUNDS").map(_.toInt).getOrElse(3)
    val timed = sys.env.get("SPARK_GRAFT_BENCH_TIMED").map(_.toInt).getOrElse(3)
    val smallCpus = math.max(1, cpus / 4)
    val targetTurns = sys.env.get("SPARK_GRAFT_BENCH_TURNS").map(_.toLong)
      .getOrElse(400000L)
    val budgetSec = sys.env.get("SPARK_GRAFT_BENCH_BUDGET_SEC").map(_.toLong)
      .getOrElse(420L)

    val t0 = System.nanoTime()
    def elapsedSec: Long = (System.nanoTime() - t0) / 1000000000L

    val (corpusDir, rows) = stageCorpus(sfDir, cpus, targetTurns)
    System.err.println(s"[bench] corpus staged: $rows turns in ${elapsedSec}s at $corpusDir")

    // ---- headline + scaling: interleaved fresh contexts, 4N first ----
    // Context plan: round 1 runs both configs unconditionally; later
    // rounds and the two trailing extra-4N contexts are budget-gated.
    val plan: Seq[(Int, Int)] =
      Seq(cpus -> 1, smallCpus -> 1).distinct ++
        (2 to rounds).flatMap(r => Seq(cpus -> r, smallCpus -> r).distinct) ++
        Seq(cpus -> (rounds + 1), cpus -> (rounds + 2))
    val samples = scala.collection.mutable.ArrayBuffer[Sample]()
    plan.foreach { case (c, r) =>
      if (r == 1 || elapsedSec < budgetSec) {
        try {
          val ss = headlineSamples(c, r, corpusDir, timed)
          samples ++= ss
          val best = ss.map(_.sec).min
          System.err.println(s"[bench] round $r cores=$c best=$best " +
            s"secs=${ss.map(_.sec).mkString(",")} steal%=${ss.map(_.stealPct).mkString(",")} " +
            s"tps=${rows / best}")
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] headline round $r cores=$c FAILED: $e")
        }
      } else System.err.println(
        s"[bench] budget ${budgetSec}s exhausted after ${elapsedSec}s — skipping round $r cores=$c")
    }
    try { // best-effort corpus cleanup
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(corpusDir)
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    } catch { case _: Throwable => () }

    def tps(c: Int): Double = {
      val ss = samples.filter(_.cores == c).map(_.sec)
      if (ss.isEmpty) -1.0 else rows / ss.min
    }
    val turnsPerSec = tps(cpus)
    val efficiency =
      if (smallCpus == cpus || tps(smallCpus) <= 0 || turnsPerSec <= 0) -1.0
      else turnsPerSec / ((cpus.toDouble / smallCpus) * tps(smallCpus))

    // ---- per-query sweep at full parallelism ----
    // single-shot per query (driver-contract shape), so each time is
    // steal-annotated — a throttle window inflating the sweep is
    // attributable inside the artifact (round-2 sweep swung 62-206 s
    // on identical code)
    val spark = session(cpus)
    val results = SparkEntry.registry.map { q =>
      val (s0, t0) = cpuTicks()
      val sec =
        try time(q.fn(spark, sfDir))
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] query ${q.name} FAILED: $e")
            -1.0
        }
      val (s1, t1) = cpuTicks()
      val steal = if (t1 > t0) 100.0 * (s1 - s0) / (t1 - t0) else -1.0
      (q.name, sec, math.rint(steal * 100) / 100)
    }

    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val qSteal = results.map { case (k, _, st) => "\"" + k + "\":" + st }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ > 0).sum
    // per-context minima, round order (the round-2 artifact shape)
    val runsJson = samples.groupBy(_.cores).toSeq.sortBy(_._1).map { case (c, ss) =>
      val mins = ss.groupBy(_.round).toSeq.sortBy(_._1)
        .map(_._2.map(_.sec).min)
      "\"" + c + "\":[" + mins.mkString(",") + "]"
    }.mkString("{", ",", "}")
    // every timed repetition with its host-steal reading
    val detailJson = samples.map { s =>
      s"""{"cores":${s.cores},"round":${s.round},"sec":${s.sec},"steal_pct":${s.stealPct}}"""
    }.mkString("[", ",", "]")
    val scalingJson =
      s"""{"cores_n":$smallCpus,"throughput_n":${tps(smallCpus)},"cores_4n":$cpus,"throughput_4n":$turnsPerSec,"efficiency":$efficiency}"""
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"turns_per_sec":$turnsPerSec,"headline_rows":$rows,"headline_runs":$runsJson,"headline_detail":$detailJson,"queries_steal_pct":$qSteal,"scaling":$scalingJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
