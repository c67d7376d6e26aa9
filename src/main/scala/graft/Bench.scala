package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark harness (driver contract): times every registered query
  * on SPARK_GRAFT_SF_DIR and prints ONE JSON line.
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

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // headline FIRST (clean session): steady-state extraction
    // throughput (turns/sec) on a replicated synthetic transcript
    // corpus (~200k turns — the raw documents table is too small to
    // measure past fixed job costs)
    val turnsPerSec =
      try {
        val docs = queries.Tables.documents(spark, sfDir)
          .repartition(4 * cpus.toInt) // tiny parquet = 1 input split
        val replicate = math.max(1, (200000 / math.max(1L, docs.count())).toInt)
        val turns = pipeline.TranscriptGen
          .fromDocumentsReplicated(docs, replicate).cache()
        val n = turns.count()
        def job = pipeline.ExtractJob
          .runTyped(spark, turns, repartitionInput = false).toDF()
        time(job) // warm-up
        val sec = time(job)
        turns.unpersist()
        if (sec > 0) n / sec else 0.0
      } catch { case _: Throwable => -1.0 }

    val results = SparkEntry.registry.map { q =>
      val sec =
        try time(q.fn(spark, sfDir))
        catch { case _: Throwable => -1.0 }
      q.name -> sec
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ > 0).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"turns_per_sec":$turnsPerSec,"sf":"$sfDir"}""")
    spark.stop()
  }
}
