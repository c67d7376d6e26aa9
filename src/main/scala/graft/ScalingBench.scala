package graft

import org.apache.spark.sql.SparkSession

/** Two-cluster-size scaling evidence (BASELINE.md): runs the SAME
  * extraction job at local[N] and local[4N] in one JVM (sequential
  * sessions), reports throughput at both plus scaling efficiency
  * throughput(4N) / (4 × throughput(N)) and verifies the outputs are
  * identical (order-invariance under parallelism).
  *
  * Usage: runMain graft.ScalingBench [sfDir] [N]
  */
object ScalingBench {

  private def runAt(cores: Int, sfDir: String): (Long, Double, Long) = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val turns = pipeline.TranscriptGen.fromDocuments(
        queries.Tables.documents(spark, sfDir)).cache()
      val n = turns.count()
      // warm-up (JIT + code paths), then timed run
      Bench.time(pipeline.ExtractJob.run(spark, turns))
      val sec = Bench.time(pipeline.ExtractJob.run(spark, turns))
      val fp = pipeline.ExtractJob.run(spark, turns)
        .selectExpr("bit_xor(xxhash64(conv_id, turn_idx, title, text_content, platform)) AS h")
        .head.getLong(0)
      turns.unpersist()
      (n, sec, fp)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val n = args.lift(1).map(_.toInt).getOrElse(8)
    val (rows1, sec1, fp1) = runAt(n, sfDir)
    val (rows4, sec4, fp4) = runAt(4 * n, sfDir)
    require(rows1 == rows4)
    val tp1 = rows1 / sec1
    val tp4 = rows4 / sec4
    val eff = tp4 / (4 * tp1)
    val identical = fp1 == fp4
    println(
      s"""{"metric":"scaling_efficiency","value":$eff,"unit":"ratio","cores_n":$n,"cores_4n":${4 * n},"rows":$rows1,"throughput_n":$tp1,"throughput_4n":$tp4,"outputs_identical":$identical,"sf":"$sfDir"}""")
  }
}
