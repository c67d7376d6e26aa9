package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime evidence that AQE actually splits a skewed join partition
  * (round-2 VERDICT #7: the generator's conv-skew exercises *salting*,
  * but nothing pinned that a join on a skewed key gets AQE's
  * skew-join treatment). Thresholds are scaled down so the sf-test
  * corpus triggers the same optimizer path a production hot key
  * would. */
class SkewJoinSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // isolated SQL conf (newSession) so the skew thresholds don't
    // leak into the other suites sharing this JVM's SparkContext
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
      .newSession()
    s.conf.set("spark.sql.shuffle.partitions", "8")
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64k")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32k")
    s.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    s
  }

  test("join on a skewed conv key is split by AQE (skew=true in the adaptive plan)") {
    import spark.implicits._
    // one pathological conversation (~60k rows, high-entropy payload
    // so the shuffle bytes stay ≫ threshold after lz4) among many
    // small ones — the conv-skew shape of TranscriptGen. The payload
    // is aggregated after the join so it rides the join-side shuffle.
    val left = spark.range(0, 70000).select(
      when(col("id") < 60000, lit("conv-skew"))
        .otherwise(concat(lit("conv-"), (col("id") % 500).cast("string")))
        .as("conv_id"),
      col("id").cast("int").as("turn_idx"),
      concat(md5(col("id").cast("string")), md5((col("id") + 1).cast("string")),
        md5((col("id") + 2).cast("string"))).as("payload"))
    val right = spark.range(0, 501).select(
      when(col("id") === 500, lit("conv-skew"))
        .otherwise(concat(lit("conv-"), col("id").cast("string")))
        .as("conv_id"),
      (col("id") * 7).cast("int").as("priority"))
    val joined = left.join(right, "conv_id")
      .groupBy(col("conv_id")).agg(count(lit(1)).as("n"), max("priority").as("p"),
        max(length(col("payload"))).as("pl"))
    val rows = joined.collect()
    assert(rows.length == 501)
    assert(rows.find(_.getString(0) == "conv-skew").get.getLong(1) == 60000L)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"), s"no skew split in adaptive plan:\n${plan.take(4000)}")
  }
}
