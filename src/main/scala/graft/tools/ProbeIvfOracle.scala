package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: dump q37's Spark result to parquet so the DuckDB
  * oracle replay can be diffed against it out-of-band (the driver
  * does this officially via Verify; this is the fast single-query
  * loop for iterating on the q37 SQL).
  * Usage: runMain graft.tools.ProbeIvfOracle [sfDir] [outDir]
  */
object ProbeIvfOracle {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("/tmp/ivf/q37_spark")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries("q37_cosine_ann_ivf")(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(outDir)
    graft.queries.TempCaches.release(spark)
    println(s"PROBE q37 -> $outDir from $sfDir")
    spark.stop()
  }
}
