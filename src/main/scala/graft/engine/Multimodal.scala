package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column handling (task brief + SURVEY.md §2.9 multimodal_cols):
  * image/audio/video payloads as opaque BINARY columns with typed metadata
  * structs, plus the decode / feature-extract / resize / frame-sample
  * plumbing a training pipeline needs.
  *
  * The decode kernels are STUBS by design — no image/audio codecs exist in
  * this container — implemented as deterministic byte-level fakes so the
  * Spark-side contract (schemas, batch shapes, partition behaviour, null
  * policy) is fully real and testable. Swapping in a real codec changes
  * only the function body, not the pipeline.
  *
  * 100 TB notes: payload bytes dominate storage — keep them in their own
  * parquet column so column pruning skips them unless the query touches
  * them (metadata-only queries read KBs, not TBs). Decode work is per-row
  * CPU: `mapPartitions` over a Dataset amortizes per-batch init (codec
  * setup) exactly like Arrow-batched UDFs do, and repartitioning by size
  * class balances skew from variable-length payloads.
  */
object Multimodal {

  /** Typed metadata carried next to the opaque payload. */
  case class MediaMeta(kind: String, width: Int, height: Int,
                       durationMs: Long, codec: String)

  case class MediaRow(media_id: Long, meta: MediaMeta, payload: Array[Byte])

  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                           checksum: Long, features: Array[Float])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("kind", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("durationMs", LongType, nullable = false),
      StructField("codec", StringType, nullable = false))), nullable = false),
    StructField("payload", BinaryType, nullable = true)))

  /** Deterministic synthetic corpus (in lieu of real media fixtures):
    * payload bytes are a pure function of media_id.
    */
  def syntheticCorpus(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).as[Long].map { id =>
      val kind = Seq("image", "audio", "video")((id % 3).toInt)
      val len = 64 + (id % 192).toInt
      val payload = Array.tabulate[Byte](len)(i => ((id * 31 + i * 7) % 251).toByte)
      MediaRow(id, MediaMeta(kind, 640, 480, if (kind == "image") 0L else 1000L + id, "fake/1"),
               payload)
    }
  }

  /** STUB decode + feature extraction: a real implementation would run a
    * codec + model forward pass per payload. The fake derives a fixed-width
    * feature vector from payload bytes deterministically. mapPartitions so
    * per-partition init (real codecs are expensive to construct) happens
    * once per task, not once per row.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition "codec" init would go here (once per task)
      rows.map { r =>
        val bytes = Option(r.payload).getOrElse(Array.emptyByteArray)
        val checksum = bytes.foldLeft(0L)((acc, b) => acc * 31L + (b & 0xff))
        val features = Array.tabulate(dim) { d =>
          if (bytes.isEmpty) 0.0f
          else {
            var acc = 0L
            var i = d
            while (i < bytes.length) { acc += (bytes(i) & 0xff).toLong * (d + 1); i += dim }
            (acc % 1000L).toFloat / 1000.0f
          }
        }
        MediaFeatures(r.media_id, r.meta.kind, bytes.length, checksum, features)
      }
    }
  }

  /** STUB resize: real codecs rescale pixels; the fake truncates/pads the
    * payload to the target byte budget and rewrites the metadata — which
    * exercises the real contract (payload AND metadata must change
    * together).
    */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      val budget = math.max(16, (w * h) / 4096)
      val p = Option(r.payload).getOrElse(Array.emptyByteArray)
      val resized = if (p.length >= budget) p.take(budget)
                    else p ++ Array.fill[Byte](budget - p.length)(0)
      r.copy(meta = r.meta.copy(width = w, height = h), payload = resized)
    }
  }

  /** Frame sampling plumbing: one output row per sampled frame index —
    * a generator (flatMap) keyed by media_id, every `everyMs` ms of
    * duration. Real decoders would attach the frame payload; the stub
    * attaches the frame's byte-offset window.
    */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val frames = if (r.meta.durationMs <= 0) 0L else r.meta.durationMs / everyMs
      (0L until frames).map { f =>
        val p = Option(r.payload).getOrElse(Array.emptyByteArray)
        val off = if (p.isEmpty) 0 else ((f * everyMs) % p.length).toInt
        (r.media_id, f, f * everyMs, off)
      }
    }.toDF("media_id", "frame_idx", "frame_ts_ms", "byte_offset")
  }

  /** Metadata-only projection — must NOT read payload bytes (column pruning
    * down to the scan; asserted in MultimodalSpec via the parquet
    * ReadSchema).
    */
  def metaOnly(df: DataFrame): DataFrame =
    df.select(col("media_id"), col("meta.kind").as("kind"),
              col("meta.width").as("width"), col("meta.height").as("height"))
}
