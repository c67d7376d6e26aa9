package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational-shell operators (SURVEY.md §2.10): aggregation,
  * broadcast-star joins, ordering windows, per-conversation
  * reassembly, dedup-on-resume. These are the Spark primitives the
  * extraction pipeline's shell is made of, exercised against the
  * driver's TPC-H-ish tables + `events` (the transcript-shaped
  * table: user_id ≈ conv_id, ts ≈ turn order).
  *
  * Scale notes (100 TB design intent, verified via .explain):
  *  - q01: partial (map-side) aggregation before the 2-key shuffle;
  *    decimal sums, filter pushed to parquet.
  *  - q02: big-big joins shuffle on their keys; `nation`/`region` are
  *    broadcast (never shuffle the fact table for a 25-row dim).
  *  - q03/q09: single window shuffle on the partition key; no extra
  *    sort since the window sort covers the output order per key.
  *  - q08: collect_list here is bounded by per-user event counts (the
  *    events table has no pathological key); the extraction-side
  *    reassembly, where the generator deliberately skews one
  *    conversation, uses the memory-bounded two-level chunked
  *    aggregation in graft.pipeline.Reassembly instead.
  */
object Relational {

  private val D = DecimalType(18, 2)

  /** Pricing summary: partial-agg + decimal-exact sums. */
  val q01 = Q(
    "q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(38,4))) AS DOUBLE) AS sum_disc_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    // input-split rebalance AFTER the pushed-down filter (the scan
    // keeps PushedFilters/pruning — PlanSpec); the sandbox lineitem is
    // one unsplittable row group, so the decimal partial aggregation
    // otherwise runs on one core (Tables.parallelize: no-op at scale)
    Tables.parallelize(Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-01 00:00:00").cast("timestamp")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(D)).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(D)).cast("double").as("sum_base_price"),
        sum((col("l_extendedprice").cast(D) * (lit(1) - col("l_discount").cast(D)))
          .cast(DecimalType(38, 4))).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Star join: fact-fact shuffle joins + broadcast dims. */
  val q02 = Q(
    "q02_revenue_by_nation",
    """SELECT n_name,
      |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(38,4))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin) { (s, d) =>
    // rebalanced probe side: all four dims broadcast (plan-pinned), so
    // the fact side never shuffles for the joins — but on the sandbox's
    // single-split file every hash-probe + partial agg ran on one core
    val li = Tables.parallelize(Tables.lineitem(s, d))
    val o  = Tables.orders(s, d)
    val c  = Tables.customer(s, d)
    val n  = Tables.nation(s, d)
    val r  = Tables.region(s, d)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(
        sum((col("l_extendedprice").cast(D) * (lit(1) - col("l_discount").cast(D)))
          .cast(DecimalType(38, 4))).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Stable turn ordering + lineage columns: the `window over
    * (conv_id order by turn_idx)` operator of the north rule, on the
    * transcript-shaped `events` table.
    */
  val q03 = Q(
    "q03_turn_order_window",
    """SELECT event_id, user_id, event_type, ts,
      |  ROW_NUMBER() OVER w AS turn_rank,
      |  LAG(event_type) OVER w AS prev_type,
      |  DATE_DIFF('second', LAG(ts) OVER w, ts) AS gap_s
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, turn_rank""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      .withColumn("turn_rank", row_number().over(w).cast("long"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("gap_s",
        (unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)))
          .cast("bigint"))
      .orderBy(col("user_id"), col("turn_rank"))
  }

  /** Per-conversation reassembly (ForumExtractor.reorganizeContent at
    * table scale, reference /root/reference/app/lib/extractors/
    * ForumExtractor.ts:245-273): collect turns of a conversation in
    * stable order into one row.
    */
  val q08 = Q(
    "q08_conv_reassembly",
    """SELECT user_id, COUNT(*) AS n_events,
      |  STRING_AGG(event_type, '|' ORDER BY ts, event_id) AS event_seq
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        concat_ws("|",
          transform(
            array_sort(collect_list(struct(col("ts"), col("event_id"), col("event_type")))),
            x => x.getField("event_type"))).as("event_seq"))
      .orderBy(col("user_id"))
  }

  /** Dedup-on-resume / idempotent re-ingest: keep the latest row per
    * natural key (SURVEY.md §2.10 "dedup/idempotent resume").
    */
  val q09 = Q(
    "q09_dedup_latest",
    """SELECT user_id, event_type, event_id, ts, value
      |FROM events
      |QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) = 1
      |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts"), col("value"))
      .orderBy(col("user_id"), col("event_type"))
  }

  /** Sessionization: split each user's event stream at >30-min gaps
    * (two stacked windows over the same (user_id, ts) ordering — one
    * shuffle), then per-session rollup.
    */
  val q16 = Q(
    "q16_sessionize",
    """SELECT user_id, session_id, COUNT(*) AS n_events,
      |  MIN(ts) AS session_start, MAX(ts) AS session_end,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS session_value
      |FROM (
      |  SELECT user_id, ts, value,
      |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM (
      |    SELECT user_id, event_id, ts, value,
      |      CASE WHEN LAG(ts) OVER w IS NULL THEN 1
      |           WHEN DATE_DIFF('second', LAG(ts) OVER w, ts) > 1800 THEN 1
      |           ELSE 0 END AS is_new
      |    FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)))
      |GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val flagged = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("is_new",
        when(lag(col("ts"), 1).over(w).isNull, 1L)
          .when(unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)) > 1800, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("session_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  val all: Seq[Q] = Seq(q01, q02, q03, q08, q09, q16)
}
