package graft.pipeline

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot-committed table storage (north rule: "resumable from
  * Iceberg snapshot checkpoints with per-partition lineage rows and
  * extraction metrics committed atomically alongside output").
  *
  * The sandbox ships no Iceberg runtime jar (SURVEY.md §7.6), so this
  * is a thin trait with a Parquet implementation that emulates the
  * snapshot semantics the job relies on:
  *
  *  - every commit writes data + `_lineage` + `_metrics` into a new
  *    `snapshot=<n>` directory, staged under `_tmp_<uuid>` and made
  *    visible by a SINGLE atomic directory rename (the Iceberg
  *    analogue of a snapshot commit — readers never observe partial
  *    output);
  *  - `_current` is a one-line pointer file updated via
  *    write-to-temp + ATOMIC_MOVE (the catalog pointer swap);
  *  - resume: work is committed per BUCKET (hash(conv_id) % buckets —
  *    the Iceberg bucket-partition analogue); a restarted job lists
  *    committed buckets in the current snapshot chain and reprocesses
  *    only the missing ones, producing byte-identical final output
  *    (extraction is deterministic per turn).
  *
  * In production the implementation is an Iceberg catalog
  * (`df.writeTo(tbl).append()` under a WAP branch); everything above
  * this trait is unchanged.
  */
trait TranscriptStore {
  def commit(data: DataFrame, lineage: DataFrame, metrics: DataFrame,
             doneBuckets: Seq[Int]): Long
  def currentSnapshot(): Option[Long]
  def committedBuckets(): Set[Int]
  def readData(spark: SparkSession): DataFrame
}

final class ParquetSnapshotStore(root: String) extends TranscriptStore {
  private val rootPath: Path = Paths.get(root)
  Files.createDirectories(rootPath)

  private def snapDir(id: Long): Path = rootPath.resolve(s"snapshot=$id")

  override def currentSnapshot(): Option[Long] = {
    val p = rootPath.resolve("_current")
    if (Files.exists(p)) Some(Files.readString(p).trim.toLong) else None
  }

  private def snapshotChain(): Seq[Long] =
    currentSnapshot().map(c => (0L to c)).getOrElse(Seq.empty[Long])
      .filter(id => Files.exists(snapDir(id)))

  override def committedBuckets(): Set[Int] =
    snapshotChain().flatMap { id =>
      val f = snapDir(id).resolve("_buckets")
      if (Files.exists(f))
        Files.readString(f).trim.split(",").filter(_.nonEmpty).map(_.toInt)
      else Array.empty[Int]
    }.toSet

  override def commit(data: DataFrame, lineage: DataFrame, metrics: DataFrame,
                      doneBuckets: Seq[Int]): Long = {
    val next = currentSnapshot().map(_ + 1).getOrElse(0L)
    val staging = rootPath.resolve(s"_tmp_${java.util.UUID.randomUUID()}")
    // stage everything invisibly — the three writes are independent
    // jobs over disjoint output dirs, so they are submitted from a
    // small thread pool and overlap (guide §2.6: the scheduler
    // back-fills executors from the next job's tasks while the
    // current one drains its tail; round 7 measured the sequential
    // form costing 3 small-job latencies per commit group). The
    // atomic directory-rename publish below still happens only after
    // ALL three have completed — snapshot visibility is unchanged.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    Await.result(Future.sequence(Seq(
      Future(data.write.mode(SaveMode.Overwrite)
        .parquet(staging.resolve("data").toString)),
      Future(lineage.write.mode(SaveMode.Overwrite)
        .parquet(staging.resolve("_lineage").toString)),
      Future(metrics.write.mode(SaveMode.Overwrite)
        .parquet(staging.resolve("_metrics").toString)))), Duration.Inf)
    Files.writeString(staging.resolve("_buckets"), doneBuckets.mkString(","))
    // single atomic publish
    Files.move(staging, snapDir(next), StandardCopyOption.ATOMIC_MOVE)
    // catalog pointer swap (atomic)
    val tmpPtr = rootPath.resolve(s"_current_tmp_${java.util.UUID.randomUUID()}")
    Files.writeString(tmpPtr, next.toString)
    Files.move(tmpPtr, rootPath.resolve("_current"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    next
  }

  override def readData(spark: SparkSession): DataFrame = {
    val dirs = snapshotChain().map(id => snapDir(id).resolve("data").toString)
    require(dirs.nonEmpty, s"no committed snapshot under $root")
    spark.read.parquet(dirs: _*)
  }
}

/** Checkpointed, resumable extraction run (north rule). Buckets by
  * hash(conv_id) so a re-run after a crash reprocesses only
  * uncommitted buckets — idempotent because extraction is a pure
  * function of the turn.
  */
object CheckpointedExtract {

  def lineageOf(extracted: DataFrame): DataFrame =
    extracted.groupBy(spark_partition_id().as("partition_id")).agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("conv_id")).as("n_convs"),
      sum(when(col("error").isNotNull, 1L).otherwise(0L)).as("n_errors"),
      expr("bit_xor(xxhash64(conv_id, turn_idx, text_content))").as("content_hash"))

  def metricsOf(extracted: DataFrame): DataFrame =
    extracted.groupBy(col("platform")).agg(
      count(lit(1)).as("n_turns"),
      sum(col("metrics.nodes_scored").cast("long")).as("nodes_scored"),
      avg(col("metrics.boilerplate_ratio")).as("avg_boilerplate_ratio"),
      avg(when(col("metrics.fallback_stage") === 5, 1.0).otherwise(0.0))
        .as("body_fallback_rate"),
      sum(when(col("error").isNotNull, 1L).otherwise(0L)).as("n_errors"))

  /** Run extraction over `turns`, committing per bucket group;
    * resumes past already-committed buckets. Returns snapshot ids
    * committed by THIS invocation.
    *
    * One-pass: the input is scanned and extracted ONCE for all todo
    * buckets, staged to parquet `partitionBy(bucket)`; each commit
    * group then reads back only its buckets (partition-pruned scan of
    * the already-extracted output) — extraction cost no longer
    * depends on `buckets / bucketsPerCommit` (round-2 VERDICT #5; the
    * Iceberg analogue stages to an uncommitted WAP branch and commits
    * per bucket group from it).
    */
  /** @param repartitionInput forwarded to [[ExtractJob.run]] — pass
    *   false when `turns` is already well-partitioned (e.g. built
    *   from a Tables.parallelize'd scan), eliding the salted shuffle
    *   of the synthesized HTML bodies. */
  def run(spark: SparkSession, turns: DataFrame, store: TranscriptStore,
          buckets: Int = 8, bucketsPerCommit: Int = 4,
          repartitionInput: Boolean = true): Seq[Long] = {
    val done = store.committedBuckets()
    val todo = (0 until buckets).filterNot(done.contains)
    if (todo.isEmpty) return Seq.empty
    val staging = Files.createTempDirectory("graft-extract-staging")
    try {
      val bucketCol = pmod(xxhash64(col("conv_id")), lit(buckets))
      val slice = turns.filter(bucketCol.isin(todo.map(_.toLong): _*))
      val extracted = ExtractJob.run(spark, slice, repartitionInput = repartitionInput)
        .withColumn("bucket", bucketCol)
      extracted.write.mode(SaveMode.Overwrite)
        .partitionBy("bucket").parquet(staging.toString)
      // explicit schema: a zero-row slice stages no data files, and
      // schema INFERENCE on the empty dir would throw — empty buckets
      // must still commit (resume/empty-corpus callers relied on it
      // before the one-pass rewrite)
      val staged = spark.read.schema(extracted.schema).parquet(staging.toString)
      todo.grouped(bucketsPerCommit).map { group =>
        val data = staged
          .filter(col("bucket").isin(group: _*)) // partition-pruned
          .drop("bucket")
        store.commit(data, lineageOf(data), metricsOf(data), group)
      }.toSeq
    } finally {
      import scala.jdk.CollectionConverters._
      try Files.walk(staging).iterator().asScala.toSeq.reverse
        .foreach(Files.deleteIfExists(_))
      catch { case _: Throwable => () }
    }
  }
}
