package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Writes the current q38 (extraction → corpus-clean composite)
  * output at sf0.001 to src/test/resources/q38_golden_sf0.001.csv —
  * the frozen end-to-end pin (round-4 VERDICT #6): q38 crosses the
  * extraction boundary, so no SQL oracle exists and without this
  * fixture a regression in either the extractor or the cleaning
  * stages' composition would pass the correctness gate silently. Run
  * ONCE per deliberate behavior change, review the diff, commit —
  * ExtractCleanSpec pins q38 to this file thereafter.
  */
object FreezeQ38 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = graft.pipeline.ExtractQueries.qExtractClean.fn(spark, sfDir).collect()
    graft.queries.TempCaches.release(spark)
    val csv = "doc_id,platform,n_chars_t\n" + rows.map { r =>
      s"${r.getAs[Long]("doc_id")},${r.getAs[String]("platform")}," +
        s"${r.getAs[Long]("n_chars_t")}"
    }.mkString("\n") + "\n"
    val out = Paths.get("src/test/resources/q38_golden_sf0.001.csv")
    Files.createDirectories(out.getParent)
    Files.writeString(out, csv)
    println(s"[freeze-q38] wrote ${rows.length} rows to $out")
    spark.stop()
  }
}
