package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: recall@3 of the q15 ANN vs the exact q10 top-3.
  * Usage: runMain graft.tools.ProbeRecall [sfDir]
  */
object ProbeRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val exact = graft.SparkEntry.queries("q10_cosine_topk")(spark, sfDir)
      .select("vec_id", "neighbor_id").cache()
    val tot = exact.count()
    for (name <- Seq("q15_cosine_ann_lsh", "q37_cosine_ann_ivf")) {
      val ann = graft.SparkEntry.queries(name)(spark, sfDir)
        .select("vec_id", "neighbor_id")
      val hit = exact.join(ann, Seq("vec_id", "neighbor_id")).count()
      println(s"RECALL $name ${hit.toDouble / tot} ($hit/$tot) @ $sfDir")
      graft.queries.TempCaches.release(spark)
    }
    spark.stop()
  }
}
