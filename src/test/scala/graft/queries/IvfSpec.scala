package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVF coarse-quantizer ANN (q37).
  *
  * The load-bearing checks:
  *  - EXHAUSTIVE-REGIME EQUALITY: at n ≤ 128·IvfProbe the probe list
  *    covers every cell, so q37 must equal the exact q10 top-3
  *    ROW-FOR-ROW — and q10 itself is DuckDB-oracle-verified, so this
  *    transitively oracle-checks the whole IVF machinery
  *    (quantization, codebook iterations, assignment, probing,
  *    scoring, bounded top-k).
  *  - DETERMINISM: the integer-quantized codebook makes two
  *    independent runs bit-identical (no FP-accumulation-order or RNG
  *    sensitivity) — the property that justifies shipping k-means
  *    without a SQL oracle.
  */
class IvfSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001" // n=500 ⇒ K=4, probe=4: exhaustive

  private def fp(df: org.apache.spark.sql.DataFrame): Long =
    df.agg(expr("bit_xor(xxhash64(vec_id, neighbor_id, rank, cast(sim*1e6 as bigint)))"))
      .head.getLong(0)

  test("exhaustive regime: q37 equals the oracle-verified exact q10 row-for-row") {
    val ivf = graft.SparkEntry.queries("q37_cosine_ann_ivf")(spark, sf)
    val exact = graft.SparkEntry.queries("q10_cosine_topk")(spark, sf)
    try {
      assert(ivf.count() == exact.count())
      assert(fp(ivf) == fp(exact))
    } finally TempCaches.release(spark)
  }

  test("determinism: two independent runs are bit-identical") {
    val a = fp(graft.SparkEntry.queries("q37_cosine_ann_ivf")(spark, sf))
    TempCaches.release(spark)
    val b = fp(graft.SparkEntry.queries("q37_cosine_ann_ivf")(spark, sf))
    TempCaches.release(spark)
    assert(a == b)
  }
}
