package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the MinHash-LSH pipeline (dev tool). */
object ProbeMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = graft.queries.Tables.documents(spark, sfDir)
    val sh = graft.queries.TextPipeline.shingles(docs).cache()
    t("shingles count")(sh.count())
    val aggs = (0 until 32).map(i => min(xxhash64(lit(i), col("shingle"))).as(s"mh$i"))
    val sig = sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
    t("signatures")(sig.write.format("noop").mode("overwrite").save())
    val bandCols = (0 until 8).map { b =>
      val hs = (0 until 4).map(r => col(s"mh${b * 4 + r}"))
      struct(lit(b).as("band"), xxhash64(hs: _*).as("bh"))
    }
    val buckets = sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    t("buckets")(buckets.write.format("noop").mode("overwrite").save())
    val cand = buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2")).distinct()
    t("candidates")(cand.write.format("noop").mode("overwrite").save())
    t("full q12")(graft.SparkEntry.queries("q12_minhash_lsh")(spark, sfDir)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
