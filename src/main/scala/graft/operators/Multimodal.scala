package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One decoded-media feature row. Field semantics by media type:
  *
  * | column      | image (BMP/PPM)  | audio (WAV)     | other (octet)     |
  * |-------------|------------------|-----------------|-------------------|
  * | width       | pixels           | -1              | -1                |
  * | height      | pixels           | -1              | -1                |
  * | sample_rate | -1               | Hz              | -1                |
  * | n_units     | pixel count      | sample count    | 256-byte blocks   |
  * | mean_c1     | mean R           | mean sample     | mean byte         |
  * | mean_c2     | mean G           | RMS sample      | RMS byte          |
  * | mean_c3     | mean B           | peak abs sample | max byte          |
  *
  * `decode_ok=false` marks a malformed payload (stats zeroed, byte_len
  * and content_hash still populated) — one corrupt blob must produce an
  * inspectable row, never a failed stage.
  */
case class MediaFeatures(
    doc_id: Long,
    media_type: String,
    byte_len: Long,
    decode_ok: Boolean,
    width: Int,
    height: Int,
    sample_rate: Int,
    n_units: Long,
    mean_c1: Double,
    mean_c2: Double,
    mean_c3: Double,
    content_hash: Long)

/** Multimodal-column operators: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/featurized per partition.
  *
  * The decode step is REAL for the pure-JVM public formats in
  * [[MediaCodecs]] (24-bit BMP, P6 PPM, PCM16 WAV); any other media
  * type falls back to opaque byte statistics. Formats that need native
  * codec libraries (JPEG/MP4/...) would slot into the same dispatch —
  * the Spark-side shape (binary column in, one feature row out, decoder
  * context per partition) is format-agnostic.
  *
  * Scale notes: decode is embarrassingly parallel — `mapPartitions`
  * keeps one decoder context per partition (amortized init), binary
  * payloads never shuffle (features only), decoding streams per-channel
  * sums so no decoded frame is ever materialized, and partition sizing
  * is governed by `spark.sql.files.maxPartitionBytes` on the media scan.
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

  /** Synthetic 6×4 24-bit BMP per key — deterministic pixels from the
    * key so decoded channel means are recomputable by any engine:
    * r = (k + 7x + 13y) mod 256, g = 3k mod 256, b = (5k + x) mod 256.
    * Width 6 forces 2 padding bytes per row, so a decoder that misreads
    * the BMP stride is caught by the means shifting.
    */
  def syntheticBmp(spark: SparkSession, keys: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    keys.select(col(idCol).cast("long")).as[Long].map { k =>
      val bytes = MediaCodecs.encodeBmp(6, 4, (x, y) => (
        ((k + 7L * x + 13L * y) % 256L).toInt,
        ((3L * k) % 256L).toInt,
        ((5L * k + x) % 256L).toInt))
      (k, bytes, "image/bmp")
    }.toDF("doc_id", "media", "media_type")
  }

  /** Synthetic PCM16 mono WAV per embedding row: each component is
    * clamped to [-1, 1] and quantized by truncation (`trunc(x*32767)` —
    * the same arithmetic any engine can replay on the source floats).
    */
  def syntheticWav(
      spark: SparkSession, emb: DataFrame, idCol: String, vecCol: String,
      sampleRate: Int = 16000): DataFrame = {
    import spark.implicits._
    emb.select(col(idCol).cast("long"), col(vecCol)).as[(Long, Array[Float])]
      .map { case (k, v) =>
        val samples = v.map(x =>
          (math.max(-1.0, math.min(1.0, x.toDouble)) * 32767.0).toInt.toShort)
        (k, MediaCodecs.encodeWav(sampleRate, samples), "audio/wav")
      }.toDF("doc_id", "media", "media_type")
  }

  /** Per-row decode dispatch — see [[MediaFeatures]] for the contract. */
  private[operators] def decodeOne(
      docId: Long, mediaType: String, bytes: Array[Byte]): MediaFeatures = {
    val len = bytes.length.toLong
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31L * h + bytes(i); i += 1 }
    try mediaType match {
      case "image/bmp" =>
        val s = MediaCodecs.decodeBmp(bytes)
        MediaFeatures(docId, mediaType, len, decode_ok = true,
          s.width, s.height, -1, s.width.toLong * s.height,
          s.meanR, s.meanG, s.meanB, h)
      case "image/x-portable-pixmap" =>
        val s = MediaCodecs.decodePpm(bytes)
        MediaFeatures(docId, mediaType, len, decode_ok = true,
          s.width, s.height, -1, s.width.toLong * s.height,
          s.meanR, s.meanG, s.meanB, h)
      case "audio/wav" =>
        val s = MediaCodecs.decodeWav(bytes)
        MediaFeatures(docId, mediaType, len, decode_ok = true,
          -1, -1, s.sampleRate, s.nSamples, s.mean, s.rms, s.peakAbs.toDouble, h)
      case _ =>
        // opaque payload: byte-level stats + 256-byte "frame" blocks
        var (sum, sumSq) = (0L, 0L)
        var mx = 0
        var j = 0
        while (j < bytes.length) {
          val b = bytes(j) & 0xFF
          sum += b; sumSq += b.toLong * b
          if (b > mx) mx = b
          j += 1
        }
        val mean = if (len == 0) 0.0 else sum.toDouble / len
        val rms = if (len == 0) 0.0 else math.sqrt(sumSq.toDouble / len)
        MediaFeatures(docId, mediaType, len, decode_ok = true,
          -1, -1, -1, len / 256L + 1L, mean, rms, mx.toDouble, h)
    } catch {
      case e: IllegalArgumentException =>
        // malformed media: inspectable error row, never a failed stage
        MediaFeatures(docId, mediaType, len, decode_ok = false,
          -1, -1, -1, 0L, 0.0, 0.0, 0.0, h)
    }
  }

  /** Partition-parallel decode/feature-extract over the binary column. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "media_type", "media")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // one decoder context per partition (amortized init)
        it.map { case (id, mt, bytes) => decodeOne(id, mt, bytes) }
      }
  }

  /** One sampled frame (frame-sampling's one-to-many output shape). */
  case class Frame(doc_id: Long, frame_idx: Long, frame_len: Long)

  /** Frame sampling: one OUTPUT ROW per frame — the flatMap shape a real
    * video sampler has (opaque payloads sample as fixed-size byte
    * blocks; `maxFrames` is the per-doc cap a production sampler needs
    * so one pathological 10-hour video cannot skew a partition).
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

  /** Payload downsample: keeps every k-th byte so the output payload is
    * at most `targetBytes` — the binary→binary map shape (payloads stay
    * partition-local, never shuffled). A pixel-aware rescale would
    * decode via [[MediaCodecs]] and re-encode in the same map; byte
    * decimation is kept as the format-agnostic default.
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
