package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Writes the current q30 (multimodal decode + features) output at
  * sf0.001 to src/test/resources/q30_golden_sf0.001.csv — the frozen
  * feature-value pin the round-3 VERDICT asked for (#6): q30 is
  * rows-only for the driver, so without this fixture a decode
  * regression would pass the correctness gate silently. Run ONCE per
  * deliberate codec change, review the diff, commit —
  * MultimodalCodecSpec pins q30 to this file thereafter.
  */
object FreezeQ30 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = graft.pipeline.MultimodalQueries.q30.fn(spark, sfDir).collect()
    val csv = "asset_id,kind,n_bytes,feature_norm\n" + rows.map { r =>
      s"${r.getAs[Long]("asset_id")},${r.getAs[String]("kind")}," +
        s"${r.getAs[Int]("n_bytes")},${r.getAs[Double]("feature_norm")}"
    }.mkString("\n") + "\n"
    val out = Paths.get("src/test/resources/q30_golden_sf0.001.csv")
    Files.createDirectories(out.getParent)
    Files.writeString(out, csv)
    println(s"[freeze-q30] wrote ${rows.length} rows to $out")
    spark.stop()
  }
}
