package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-provided test tables
  * (`/root/testdata/sf*`; see TESTDATA.md). At production scale these
  * scans are Iceberg table scans — the rest of the plan is unchanged
  * (see graft.pipeline.TranscriptStore).
  */
object Tables {
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Rebalance an under-split scan to full parallelism — ONLY when
    * the source yields fewer partitions than the session's default
    * parallelism (round-7 guide §2.5 "input skew": every sandbox
    * table is ONE small parquet file with ONE row group = one
    * unsplittable input split, so all scan-side per-row compute —
    * tokenize/shingle explode, regex scrub, codec work, map-side
    * partial aggregation — ran on 1 of 32 cores; the same defect
    * round 6 fixed for `embeddings` only, Similarity.repart). The
    * condition makes it scale-adaptive rather than local-tuned: at
    * production scale scans have >= parallelism splits and this is a
    * no-op — no shuffle is added. Values are partition-independent
    * throughout (integer/left-fold per-row arithmetic, keyed aggs),
    * so oracle hash parity is unchanged. */
  def parallelize(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def events(s: SparkSession, d: String): DataFrame    = t(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
