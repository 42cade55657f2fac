package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MediaCodecs, Multimodal}

/** Multimodal operators: binary columns, partition-parallel REAL decode
  * (BMP/PPM/WAV via MediaCodecs), frame sampling (one-to-many), resize
  * (binary→binary). Codec tests decode hand-crafted byte-level fixtures
  * — every header offset written out literally — so a codec bug cannot
  * hide behind its own encoder.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val media =
    Multimodal.withBinaryColumn(Tables.table(spark, sf, "documents"))

  test("feature extraction is deterministic and covers every doc") {
    val a = Multimodal.extractFeatures(spark, media).collect().sortBy(_.doc_id)
    val b = Multimodal.extractFeatures(spark, media).collect().sortBy(_.doc_id)
    assert(a.length == 500 && a.toSeq == b.toSeq)
    assert(a.forall(f => f.n_units == f.byte_len / 256 + 1))
    assert(a.forall(_.decode_ok))
  }

  test("frame sampling caps frames per document") {
    val capped = Multimodal.sampleFrames(spark, media, frameBytes = 16, maxFrames = 3)
    val counts = capped.groupBy("doc_id").count().collect()
    assert(counts.forall(_.getLong(1) <= 3))
    // an uncapped run yields more frames for any doc longer than 48 bytes
    val uncapped = Multimodal.sampleFrames(spark, media, frameBytes = 16)
    assert(uncapped.count() > capped.count())
  }

  test("resize bounds the payload and keeps it deterministic") {
    val out = Multimodal.resize(spark, media, targetBytes = 64)
      .select(col("doc_id"), length(col("media_resized")).as("len"),
        length(col("media")).as("orig"))
      .collect()
    assert(out.length == 500)
    assert(out.forall(r => r.getAs[Int]("len") <= 64))
    // shorter-than-target payloads pass through whole
    assert(out.filter(_.getAs[Int]("orig") <= 64)
      .forall(r => r.getAs[Int]("len") == r.getAs[Int]("orig")))
  }

  // ------------------------------------------------------------ codecs

  /** A 2×2 24-bit BMP written out byte by byte: pixels (top-left origin)
    *   (0,0)=RGB(10,20,30)   (1,0)=RGB(40,50,60)
    *   (0,1)=RGB(70,80,90)   (1,1)=RGB(100,110,120)
    * Storage is bottom-up BGR with rows padded to 4 bytes (2 px × 3 B =
    * 6 B → 2 pad bytes per row).
    */
  private val craftedBmp: Array[Byte] = {
    def le32(v: Int) = Array[Byte](
      (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def le16(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    Array[Byte]('B', 'M') ++
      le32(54 + 16) ++ le32(0) ++ le32(54) ++ // file size, reserved, offset
      le32(40) ++ le32(2) ++ le32(2) ++       // DIB size, width, height
      le16(1) ++ le16(24) ++ le32(0) ++       // planes, bpp, compression
      le32(16) ++ le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0) ++
      // bottom row first (y=1), BGR order, then 2 pad bytes
      Array[Byte](90, 80, 70, 120, 110, 100, 0, 0,
        30, 20, 10, 60, 50, 40, 0, 0)
  }

  test("BMP decode: crafted fixture byte-for-byte") {
    val s = MediaCodecs.decodeBmp(craftedBmp)
    assert(s.width == 2 && s.height == 2)
    assert(s.meanR == (10 + 40 + 70 + 100) / 4.0)
    assert(s.meanG == (20 + 50 + 80 + 110) / 4.0)
    assert(s.meanB == (30 + 60 + 90 + 120) / 4.0)
  }

  test("BMP encode∘decode is identity on dimensions and channel means") {
    val bytes = MediaCodecs.encodeBmp(6, 4, (x, y) =>
      ((x * 40 + y) % 256, (y * 60) % 256, (x + y * 50) % 256))
    // width 6 → 18-byte rows → 2 pad bytes per row must be skipped
    assert(bytes.length == 54 + 20 * 4)
    val s = MediaCodecs.decodeBmp(bytes)
    val px = for { y <- 0 until 4; x <- 0 until 6 }
      yield ((x * 40 + y) % 256, (y * 60) % 256, (x + y * 50) % 256)
    assert(s.width == 6 && s.height == 4)
    assert(s.meanR == px.map(_._1).sum / 24.0)
    assert(s.meanG == px.map(_._2).sum / 24.0)
    assert(s.meanB == px.map(_._3).sum / 24.0)
  }

  test("PPM decode: crafted fixture with comment in header") {
    val header = "P6\n# a comment\n 3 1\n255\n"
    val bytes = header.getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9)
    val s = MediaCodecs.decodePpm(bytes)
    assert(s.width == 3 && s.height == 1)
    assert(s.meanR == (1 + 4 + 7) / 3.0)
    assert(s.meanG == (2 + 5 + 8) / 3.0)
    assert(s.meanB == (3 + 6 + 9) / 3.0)
  }

  test("WAV decode: crafted PCM16 fixture incl. negative samples") {
    val samples = Array[Short](1000, -2000, 32767, -32768, 0)
    val bytes = MediaCodecs.encodeWav(8000, samples)
    assert(bytes.length == 44 + 10)
    // sanity of the literal layout: RIFF at 0, WAVE at 8, data size at 40
    assert(new String(bytes.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") == "WAVE")
    val s = MediaCodecs.decodeWav(bytes)
    assert(s.sampleRate == 8000 && s.channels == 1 && s.nSamples == 5)
    assert(s.sum == 1000L - 2000L + 32767L - 32768L)
    assert(s.peakAbs == 32768)
    assert(s.rms == math.sqrt(
      (1000.0 * 1000 + 2000.0 * 2000 + 32767.0 * 32767 + 32768.0 * 32768) / 5))
  }

  test("WAV decode walks extra chunks before data") {
    val base = MediaCodecs.encodeWav(16000, Array[Short](5, -5))
    // splice a LIST chunk between fmt and data
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val spliced = base.slice(0, 36) ++ listChunk ++ base.slice(36, base.length)
    // fix the RIFF size field (bytes 4..7, little-endian)
    val total = spliced.length - 8
    spliced(4) = (total & 0xFF).toByte
    spliced(5) = ((total >> 8) & 0xFF).toByte
    spliced(6) = ((total >> 16) & 0xFF).toByte
    spliced(7) = ((total >> 24) & 0xFF).toByte
    val s = MediaCodecs.decodeWav(spliced)
    assert(s.nSamples == 2 && s.sum == 0 && s.peakAbs == 5)
  }

  test("malformed media produces an error row, not a failed stage") {
    import spark.implicits._
    val bad = Seq(
      (1L, Array[Byte]('B', 'M', 0, 0), "image/bmp"),      // truncated
      (2L, "nonsense".getBytes("UTF-8"), "audio/wav"),     // wrong magic
      (3L, MediaCodecs.encodeWav(8000, Array[Short](7)), "audio/wav"))
      .toDF("doc_id", "media", "media_type")
    val rows = Multimodal.extractFeatures(spark, bad).collect().sortBy(_.doc_id)
    assert(rows.length == 3)
    assert(!rows(0).decode_ok && !rows(1).decode_ok)
    assert(rows(2).decode_ok && rows(2).n_units == 1 && rows(2).mean_c1 == 7.0)
  }

  test("decode streams stats partition-locally over generated media") {
    import spark.implicits._
    val keys = (1L to 50L).toDF("k")
    val bmps = Multimodal.syntheticBmp(spark, keys, "k")
    val feats = Multimodal.extractFeatures(spark, bmps).collect()
    assert(feats.length == 50)
    assert(feats.forall(f => f.decode_ok && f.width == 6 && f.height == 4 &&
      f.n_units == 24 && f.byte_len == 134))
    // spot-check one key against the pixel formula
    val f7 = feats.find(_.doc_id == 7L).get
    val px = for { y <- 0 until 4; x <- 0 until 6 } yield (7 + 7 * x + 13 * y) % 256
    assert(f7.mean_c1 == px.sum / 24.0)
  }
}
