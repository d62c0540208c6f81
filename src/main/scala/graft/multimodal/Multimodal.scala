package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media record: an opaque binary payload plus typed metadata — the
  * multimodal column pattern for LLM-data pipelines (brief requirement). */
case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])

/** Features extracted per record by the (stubbed) decoder.
  * `sample_offsets` is a comma-joined string (not array<long>) so the frame
  * stays oracle-comparable and parquet-friendly for downstream SQL engines. */
case class MediaFeatures(
    doc_id: Long,
    media_type: String,
    n_bytes: Long,
    magic_hex: String,
    fake_width: Long,
    fake_height: Long,
    n_frames: Long,
    sample_offsets: String,
    content_digest: String)

/** Multimodal binary-column plumbing.
  *
  * Real image/audio codecs aren't in this container, so the decode step is a
  * clearly-marked deterministic STUB (`decodeStub`) — but the Spark-side
  * shape is real: typed `Dataset[MediaRecord]`, per-partition batch iteration
  * via `mapPartitions` (the Scala analog of `mapInPandas` batches), a binary
  * payload column with typed metadata, and frame-sampling offsets. Swap
  * `decodeStub` for a JNI/codec call and nothing else changes.
  *
  * The fake "decoded" dimensions are content-addressed from the SHA-256
  * digest (not JVM `Arrays.hashCode`) so the whole operator is reproducible
  * in any engine — which is what lets `multimodal_features` be fully
  * oracle-checked instead of rows-only.
  */
object Multimodal {

  /** Fabricates a media table from `documents`: payload = utf8 bytes of the
    * text (stand-in for image/audio bytes), media_type round-robins. */
  def mediaFromDocuments(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      col("text").cast("binary").as("payload"))

  /** STUB decoder — deterministic fake for the codec call. A real deployment
    * replaces the body (and only the body) with e.g. an image decode +
    * resize; the batch shape, schema and partitioning are already correct.
    * All fake fields derive from the SHA-256 digest so they are portable
    * across engines (h = first 24 digest bits). */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val bytes = r.payload
    val n = bytes.length.toLong
    val magic = bytes.take(4).map(b => f"$b%02x").mkString
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(bytes).map(b => f"$b%02x").mkString
    val h = java.lang.Long.parseLong(digest.substring(0, 6), 16) // 24 bits, content-addressed
    val width = 64 + h % 1857L          // 64..1920
    val height = 64 + (h / 1857L) % 1017L // 64..1080
    val frames = if (r.media_type == "video") 1 + h % 300L else 1L
    val step = math.max(1L, n / 5)
    val offsets = (0 until 5).map(i => i * step).mkString(",")
    MediaFeatures(r.doc_id, r.media_type, n, magic, width, height, frames, offsets, digest)
  }

  /** Batch feature extraction: one decoder instance per partition, streaming
    * over the rows — the shape a real codec needs (expensive init amortized,
    * no per-row driver involvement). */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      // real decoders initialize here (per partition, not per row)
      it.map(decodeStub)
    }
  }

  def features(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaFromDocuments(spark, dir)).toDF()
}
