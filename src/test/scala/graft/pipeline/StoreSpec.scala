package graft.pipeline

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StoreSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"
  private def turns = TranscriptGen.fromDocuments(
    spark.read.parquet(s"$sf/documents.parquet"))

  private def fingerprint(df: org.apache.spark.sql.DataFrame): Long =
    df.agg(expr("bit_xor(xxhash64(conv_id, turn_idx, text_content))")).head.getLong(0)

  test("commit/read round trip equals direct extraction") {
    val dir = Files.createTempDirectory("graft-store").toString
    val store = new ParquetSnapshotStore(dir)
    val snaps = CheckpointedExtract.run(spark, turns, store, buckets = 8, bucketsPerCommit = 4)
    assert(snaps == Seq(0L, 1L))
    assert(store.committedBuckets() == (0 until 8).toSet)
    val direct = ExtractJob.run(spark, turns)
    assert(store.readData(spark).count() == direct.count())
    assert(fingerprint(store.readData(spark)) == fingerprint(direct))
  }

  test("resume: interrupted run completes from last snapshot, identical output") {
    val dir = Files.createTempDirectory("graft-store-resume").toString
    val store = new ParquetSnapshotStore(dir)
    // simulate a crash after the first commit: only buckets 0-3
    val firstHalf = turns.filter(
      pmod(xxhash64(col("conv_id")), lit(8)).isin(0L, 1L, 2L, 3L))
    val ext = ExtractJob.run(spark, firstHalf)
    store.commit(ext, CheckpointedExtract.lineageOf(ext),
      CheckpointedExtract.metricsOf(ext), Seq(0, 1, 2, 3))
    assert(store.committedBuckets() == Set(0, 1, 2, 3))
    // resumed run processes ONLY the remaining buckets
    val snaps = CheckpointedExtract.run(spark, turns, store, buckets = 8, bucketsPerCommit = 4)
    assert(snaps == Seq(1L))
    assert(fingerprint(store.readData(spark)) == fingerprint(ExtractJob.run(spark, turns)))
    // idempotent: a third run commits nothing
    assert(CheckpointedExtract.run(spark, turns, store, buckets = 8).isEmpty)
  }

  test("empty input still commits every todo bucket (resume/empty-corpus)") {
    // the one-pass rewrite stages the extracted slice with partitionBy;
    // a zero-row slice writes no data files, so the read-back must use
    // an explicit schema instead of inference (round-3 ADVICE)
    val dir = Files.createTempDirectory("graft-store-empty").toString
    val store = new ParquetSnapshotStore(dir)
    val snaps = CheckpointedExtract.run(spark, turns.limit(0), store,
      buckets = 8, bucketsPerCommit = 4)
    assert(snaps == Seq(0L, 1L))
    assert(store.committedBuckets() == (0 until 8).toSet)
    // idempotent: a re-run with real input finds all buckets done
    assert(CheckpointedExtract.run(spark, turns, store, buckets = 8).isEmpty)
  }

  test("lineage and metrics are committed alongside data") {
    val dir = Files.createTempDirectory("graft-store-lineage").toString
    val store = new ParquetSnapshotStore(dir)
    CheckpointedExtract.run(spark, turns, store, buckets = 4, bucketsPerCommit = 4)
    val lineage = spark.read.parquet(s"$dir/snapshot=0/_lineage")
    val metrics = spark.read.parquet(s"$dir/snapshot=0/_metrics")
    assert(lineage.agg(sum("n_rows")).head.getLong(0) == turns.count())
    assert(metrics.select("platform").collect().map(_.getString(0)).toSet ==
      Set("article", "forum", "weixin"))
    assert(metrics.agg(sum("n_turns")).head.getLong(0) == turns.count())
  }

  test("one-pass: input is extracted once, not once per commit group") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-store-onepass").toString
    val store = new ParquetSnapshotStore(dir)
    val parts = 4
    // wrap the input so every executed scan of it bumps a counter
    val counted = turns.as[Turn].repartition(parts)
      .mapPartitions { it => StoreSpecScanCount.n.incrementAndGet(); it }
      .toDF()
    StoreSpecScanCount.n.set(0)
    // 4 commit groups — the pre-round-3 implementation re-scanned and
    // re-extracted the input per group (counter would read 4 × parts)
    CheckpointedExtract.run(spark, counted, store, buckets = 8, bucketsPerCommit = 2)
    assert(StoreSpecScanCount.n.get == parts)
    assert(store.committedBuckets() == (0 until 8).toSet)
    assert(fingerprint(store.readData(spark)) ==
      fingerprint(ExtractJob.run(spark, turns)))
  }

  test("no partial state visible without a commit") {
    val dir = Files.createTempDirectory("graft-store-empty").toString
    val store = new ParquetSnapshotStore(dir)
    assert(store.currentSnapshot().isEmpty)
    assert(store.committedBuckets().isEmpty)
    intercept[IllegalArgumentException](store.readData(spark))
  }

  test("incremental ingest composes with the committed store (q41 over readData)") {
    // the daily-pipeline shape (round-5 VERDICT #3): day 1 extracts
    // and COMMITS a corpus; day 2 admits a new batch against the
    // committed snapshot's content — re-crawled (already-committed)
    // turns must drop via the store-hash anti-join, fresh ones admit
    val dir = Files.createTempDirectory("graft-store-ingest").toString
    val store = new ParquetSnapshotStore(dir)
    CheckpointedExtract.run(spark, turns, store, buckets = 4, bucketsPerCommit = 4)
    val committed = store.readData(spark).select(
      xxhash64(col("conv_id"), col("turn_idx")).as("doc_id"),
      col("text_content").as("text"))
    // batch = a re-crawl of 20 committed turns (new doc_ids — the
    // crawler assigns fresh keys) + fresh synthetic docs
    val s = spark; import s.implicits._
    val recrawl = committed.orderBy(col("doc_id")).limit(20)
      .select((col("doc_id") + 7L).as("doc_id"), col("text"))
    val fresh = Seq(
      (1L, "entirely new corpus content alpha beta gamma delta"),
      (2L, "another genuinely fresh document with novel words"))
      .toDF("doc_id", "text")
    val admitted = graft.queries.TextPipeline
      .incrementalIngest(committed, recrawl.unionAll(fresh))
      .collect().map(_.getLong(0)).toSet
    graft.queries.TempCaches.release(spark)
    assert(admitted == Set(1L, 2L)) // every re-crawled row dropped
  }
}

/** JVM-global scan counter for the one-pass test (local mode: executor
  * threads share this object). */
object StoreSpecScanCount {
  val n = new java.util.concurrent.atomic.AtomicLong()
}
