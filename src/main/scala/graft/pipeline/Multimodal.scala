package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The Spark-side plumbing (schema, partitioning, per-partition
  * batched processing, output shape) is real and tested; the actual
  * media decode is STUBBED with a deterministic byte-level fake —
  * no image/audio codec library ships in this sandbox. The stub is
  * clearly marked; swapping in a real decoder changes only the body
  * of [[StubCodec.decode]].
  *
  * Scale notes: payloads stay opaque binary end-to-end (never
  * exploded into rows); the feature extractor is a narrow
  * mapPartitions (no shuffle); `frame-sample` emits bounded arrays,
  * not row blowup.
  */
object Multimodal {

  /** Deterministic synthetic assets derived from `documents` — pure
    * column arithmetic (same determinism contract as TranscriptGen).
    * payload = 4-byte magic + 32 md5-derived bytes. */
  def syntheticAssets(docs: DataFrame): DataFrame = {
    val kind = element_at(array(lit("image"), lit("audio"), lit("video")),
      (col("doc_id") % 3).cast("int") + 1)
    val magic = when(kind === "image", lit("89504e47")) // PNG-ish
      .when(kind === "audio", lit("52494646"))          // RIFF-ish
      .otherwise(lit("00000018"))                       // MP4-ish box len
    docs.select(
      col("doc_id").as("asset_id"),
      kind.as("kind"),
      unhex(concat(magic, md5(col("text").cast("binary")),
        md5(concat(col("text"), lit("x")).cast("binary")))).as("payload"),
      struct(
        // SQL-expressible deterministic dims (oracle-checkable)
        (lit(16) + (length(col("text")) % 1024)).cast("int").as("width"),
        (lit(16) + ((length(col("text")) * 31) % 768)).cast("int").as("height"),
        kind.as("format"),
        ((col("n_chars") * 997) % 600000).cast("long").as("duration_ms")).as("meta"))
  }

  /** ======== STUB ========
    * Deterministic fake codec: derives "decoded" statistics and a
    * fixed-width feature vector from the payload BYTES (so results
    * are reproducible anywhere). A real implementation would decode
    * pixels/samples here; everything around it is production-shaped.
    */
  object StubCodec {
    val FeatureDim = 16
    def decode(payload: Array[Byte]): Array[Float] = {
      val f = new Array[Float](FeatureDim)
      var i = 0
      while (i < payload.length) {
        f(i % FeatureDim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      f
    }
    def resizedBytes(payload: Array[Byte], w: Int, h: Int): Int =
      math.max(4, math.min(payload.length, (w.toLong * h / 64).toInt))
  }

  final case class AssetFeatures(
      asset_id: Long, kind: String, n_bytes: Int,
      features: Array[Float], feature_norm: Double)

  /** Decode + feature-extract: one batched pass per partition (the
    * mapInPandas-equivalent batch shape in Scala). */
  def extractFeatures(spark: SparkSession, assets: DataFrame): DataFrame = {
    import spark.implicits._
    assets.select(col("asset_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, payload) =>
          val f = StubCodec.decode(payload) // STUB decode
          val norm = math.sqrt(f.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
          AssetFeatures(id, kind, payload.length, f, norm)
        }
      }.toDF()
  }

  /** Resize plan: pure metadata transform (no decode) — target dims +
    * projected payload size; the real resize happens in the same
    * partition-batched shape as extractFeatures. */
  def resizePlan(assets: DataFrame, maxDim: Int): DataFrame =
    assets.select(col("asset_id"), col("kind"), col("meta"),
      least(col("meta.width"), lit(maxDim)).as("target_width"),
      least(col("meta.height"), lit(maxDim)).as("target_height"),
      length(col("payload")).as("n_bytes"))

  /** Frame-sample: bounded array of sample timestamps per video —
    * array column, not a row explosion. */
  def frameSamplePlan(assets: DataFrame, everyMs: Long, maxFrames: Int): DataFrame =
    assets.filter(col("kind") === "video").select(
      col("asset_id"),
      slice(sequence(lit(0L), col("meta.duration_ms"), lit(everyMs)),
        1, maxFrames).as("sample_ts_ms"))
}
