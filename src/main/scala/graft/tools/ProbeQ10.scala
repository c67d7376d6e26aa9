package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc probe: time one named query at a given SF (dev tool). */
object ProbeQ10 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val name = args.headOption.getOrElse("q10_cosine_topk")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sec = graft.Bench.timeBuilt(graft.SparkEntry.queries(name)(spark, sfDir))
    graft.queries.TempCaches.release(spark) // don't leak run 1's caches into run 2
    val sec2 = graft.Bench.timeBuilt(graft.SparkEntry.queries(name)(spark, sfDir))
    graft.queries.TempCaches.release(spark)
    println(s"PROBE $name @ $sfDir: cold $sec sec, warm $sec2 sec")
    spark.stop()
  }
}
