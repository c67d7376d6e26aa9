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

    val results = SparkEntry.registry.map { q =>
      val sec =
        try time(q.fn(spark, sfDir))
        catch { case _: Throwable => -1.0 }
      q.name -> sec
    }

    // headline: extraction throughput (turns/sec) on the synthetic
    // transcript table derived from `documents`
    val turnsPerSec =
      try {
        // tiny parquet = 1 input split; spread before generating HTML
        val turns = pipeline.TranscriptGen.fromDocuments(
          queries.Tables.documents(spark, sfDir)
            .repartition(2 * cpus.toInt)).cache()
        val n = turns.count()
        val sec = time(pipeline.ExtractJob.run(spark, turns))
        turns.unpersist()
        if (sec > 0) n / sec else 0.0
      } catch { case _: Throwable => -1.0 }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ > 0).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"turns_per_sec":$turnsPerSec,"sf":"$sfDir"}""")
    spark.stop()
  }
}
