package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One decoded-media feature row (the stub decoder's output schema). */
case class MediaFeatures(
    doc_id: Long,
    media_type: String,
    byte_len: Long,
    n_frames: Long,
    content_hash: Long)

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/featurized per partition.
  *
  * The Spark-side shape is the real thing — binary column + metadata,
  * partition-parallel batch iteration through a decoder, typed output
  * schema — while the decoder itself is a clearly marked STUB (no media
  * codecs ship in this environment): it derives deterministic fake
  * features from the bytes. Swapping in a real decoder (JNI/ffmpeg/
  * image lib) changes only the body of `decodeStub`.
  *
  * Scale notes: decode is embarrassingly parallel — `mapPartitions`
  * keeps one decoder instance per partition (amortized init), binary
  * payloads never shuffle (features only), and partition sizing is
  * governed by `spark.sql.files.maxPartitionBytes` on the media scan.
  */
object Multimodal {

  /** Attach a binary media column (here: the utf-8 bytes of the text —
    * deterministic test media) + media-type metadata.
    */
  def withBinaryColumn(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("media"),
      lit("text/plain").as("media_type"))

  /** STUB decoder: a real implementation would decode the media payload
    * (e.g. JPEG → pixels, WAV → samples) and emit model features. This
    * stand-in derives deterministic pseudo-features from the raw bytes so
    * the full pipeline (schema, batching, partitioning) is exercised.
    */
  private def decodeStub(docId: Long, mediaType: String, bytes: Array[Byte]): MediaFeatures = {
    val len = bytes.length.toLong
    // "frame sampling": one fake frame per 256-byte block
    val frames = len / 256L + 1L
    // cheap rolling content hash (NOT a media decode — stub)
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31L * h + bytes(i); i += 1 }
    MediaFeatures(docId, mediaType, len, frames, h)
  }

  /** Partition-parallel decode/feature-extract over the binary column. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "media_type", "media")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // one decoder context per partition (amortized init in real impl)
        it.map { case (id, mt, bytes) => decodeStub(id, mt, bytes) }
      }
  }

  /** One sampled frame (frame-sampling's one-to-many output shape). */
  case class Frame(doc_id: Long, frame_idx: Long, frame_len: Long)

  /** Frame sampling: one OUTPUT ROW per frame — the flatMap shape a real
    * video sampler has (decode is stubbed as fixed-size byte blocks;
    * `maxFrames` is the per-doc cap a production sampler needs so one
    * pathological 10-hour video cannot skew a partition).
    */
  def sampleFrames(
      spark: SparkSession, media: DataFrame,
      frameBytes: Int = 256, maxFrames: Int = 10000): Dataset[Frame] = {
    import spark.implicits._
    media.select("doc_id", "media")
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val n = math.min(bytes.length / frameBytes + 1L, maxFrames.toLong)
        (0L until n).iterator.map(i =>
          Frame(id, i, math.max(0L, math.min(frameBytes.toLong, bytes.length - i * frameBytes))))
      }
  }

  /** STUB resize: a real implementation would rescale pixels; this
    * deterministic stand-in keeps every k-th byte so the output payload
    * is at most `targetBytes` — exercising the binary→binary map shape
    * (payloads stay partition-local, never shuffled).
    */
  def resize(spark: SparkSession, media: DataFrame, targetBytes: Int): DataFrame = {
    import spark.implicits._
    // one map carries the original payload through — NO join/shuffle:
    // a re-join on doc_id would move every blob across the network twice
    media.select("doc_id", "media_type", "media")
      .as[(Long, String, Array[Byte])]
      .map { case (id, mt, bytes) =>
        val step = math.max(1, math.ceil(bytes.length.toDouble / targetBytes).toInt)
        (id, mt, bytes, bytes.indices.by(step).map(bytes).toArray)
      }
      .toDF("doc_id", "media_type", "media", "media_resized")
  }
}
