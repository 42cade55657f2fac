package graft.operators

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Pure-JVM codecs for three public, spec-simple media formats — the
  * real decode step behind [[Multimodal.extractFeatures]] (no native
  * codec libraries ship in this environment, so formats were chosen to
  * be fully parseable from their public specs with zero dependencies):
  *
  *  - BMP: uncompressed 24-bit Windows bitmap (BITMAPFILEHEADER +
  *    BITMAPINFOHEADER, bottom-up rows, rows padded to 4 bytes)
  *  - PPM: binary P6 (ASCII header with comments, then raw RGB bytes)
  *  - WAV: RIFF/WAVE with PCM 16-bit samples (chunk-walked, so extra
  *    chunks like LIST/fact before `data` parse correctly)
  *
  * Decoders return streaming per-channel statistics rather than pixel/
  * sample buffers: the feature extractor never materializes a decoded
  * frame, so executor memory per row is O(1) regardless of media size —
  * the property that lets a 100 TB media scan run with ordinary
  * partition sizing. Encoders exist for fixture/synthetic-media
  * generation (tests and the q78 oracle row) and for symmetry checks.
  *
  * Malformed payloads throw IllegalArgumentException with the offending
  * offset; [[Multimodal.extractFeatures]] maps that to an error row
  * rather than failing the stage (one corrupt blob in a billion must not
  * kill the scan).
  */
object MediaCodecs {

  /** Streaming image stats: means over each 8-bit channel. */
  case class ImageStats(
      width: Int, height: Int, meanR: Double, meanG: Double, meanB: Double)

  /** Streaming audio stats over PCM16 samples (all channels pooled):
    * integer sums stay exact; callers derive mean/rms/peak.
    */
  case class AudioStats(
      sampleRate: Int, channels: Int, nSamples: Long,
      sum: Long, sumSq: Long, peakAbs: Int) {
    def mean: Double = if (nSamples == 0) 0.0 else sum.toDouble / nSamples
    def rms: Double =
      if (nSamples == 0) 0.0 else math.sqrt(sumSq.toDouble / nSamples)
  }

  // ---------------------------------------------------------------- BMP

  /** Encode a 24-bit uncompressed BMP. `pixel(x, y)` returns (r, g, b)
    * for the TOP-LEFT-origin coordinate; storage is bottom-up per the
    * format. Rows are padded to 4-byte boundaries.
    */
  def encodeBmp(width: Int, height: Int,
      pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    val rowBytes = width * 3
    val pad = (4 - rowBytes % 4) % 4
    val dataSize = (rowBytes + pad) * height
    val buf = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + dataSize) // file size
    buf.putInt(0)             // reserved
    buf.putInt(54)            // pixel data offset
    buf.putInt(40)            // BITMAPINFOHEADER size
    buf.putInt(width).putInt(height) // positive height = bottom-up
    buf.putShort(1)           // planes
    buf.putShort(24)          // bits per pixel
    buf.putInt(0)             // BI_RGB (uncompressed)
    buf.putInt(dataSize)
    buf.putInt(2835).putInt(2835) // 72 DPI
    buf.putInt(0).putInt(0)   // palette
    var y = height - 1        // bottom row first
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val (r, g, b) = pixel(x, y)
        buf.put(b.toByte).put(g.toByte).put(r.toByte) // BGR on disk
        x += 1
      }
      var p = 0
      while (p < pad) { buf.put(0.toByte); p += 1 }
      y -= 1
    }
    buf.array()
  }

  /** Decode a 24-bit uncompressed BMP to channel statistics. */
  def decodeBmp(bytes: Array[Byte]): ImageStats = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "not a BMP: missing BM magic")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dataOffset = buf.getInt(10)
    val dibSize = buf.getInt(14)
    require(dibSize >= 40, s"unsupported DIB header size $dibSize")
    val width = buf.getInt(18)
    val rawHeight = buf.getInt(22)
    val height = math.abs(rawHeight) // negative = top-down (rare, legal)
    val bpp = buf.getShort(28).toInt
    val compression = buf.getInt(30)
    require(bpp == 24, s"unsupported bpp $bpp (only 24-bit)")
    require(compression == 0, s"unsupported compression $compression")
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    val rowBytes = width * 3
    val stride = rowBytes + (4 - rowBytes % 4) % 4
    require(bytes.length >= dataOffset + stride.toLong * height,
      s"truncated pixel data: need ${dataOffset + stride.toLong * height}, " +
        s"have ${bytes.length}")
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < height) {
      var off = dataOffset + y * stride
      var x = 0
      while (x < width) {
        sb += bytes(off) & 0xFF
        sg += bytes(off + 1) & 0xFF
        sr += bytes(off + 2) & 0xFF
        off += 3
        x += 1
      }
      y += 1
    }
    val n = width.toLong * height
    ImageStats(width, height, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
  }

  // ---------------------------------------------------------------- PPM

  /** Encode a binary (P6) PPM, maxval 255. */
  def encodePpm(width: Int, height: Int,
      pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    val header = s"P6\n$width $height\n255\n".getBytes(StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + width * height * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var off = header.length
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = pixel(x, y)
        out(off) = r.toByte; out(off + 1) = g.toByte; out(off + 2) = b.toByte
        off += 3; x += 1
      }
      y += 1
    }
    out
  }

  /** Decode a binary (P6) PPM — full header grammar: `#` comments and
    * any whitespace between tokens, single whitespace after maxval.
    */
  def decodePpm(bytes: Array[Byte]): ImageStats = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
      "not a P6 PPM")
    var pos = 2
    def nextInt(): Int = {
      // skip whitespace and comments
      var inComment = false
      while (pos < bytes.length && {
        val c = bytes(pos).toChar
        if (inComment) { if (c == '\n') inComment = false; true }
        else if (c == '#') { inComment = true; true }
        else c.isWhitespace
      }) pos += 1
      val start = pos
      while (pos < bytes.length && bytes(pos).toChar.isDigit) pos += 1
      require(pos > start, s"expected integer at offset $start")
      new String(bytes, start, pos - start, StandardCharsets.US_ASCII).toInt
    }
    val width = nextInt()
    val height = nextInt()
    val maxval = nextInt()
    require(maxval == 255, s"unsupported maxval $maxval (only 8-bit)")
    pos += 1 // exactly one whitespace byte after maxval per the spec
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    val n = width.toLong * height
    require(bytes.length >= pos + n * 3,
      s"truncated pixel data: need ${pos + n * 3}, have ${bytes.length}")
    var (sr, sg, sb) = (0L, 0L, 0L)
    var i = 0L
    var off = pos
    while (i < n) {
      sr += bytes(off) & 0xFF
      sg += bytes(off + 1) & 0xFF
      sb += bytes(off + 2) & 0xFF
      off += 3; i += 1
    }
    ImageStats(width, height, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
  }

  // ---------------------------------------------------------------- WAV

  /** Encode a PCM 16-bit mono RIFF/WAVE file. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes(StandardCharsets.US_ASCII))
    buf.putInt(36 + dataSize)
    buf.put("WAVE".getBytes(StandardCharsets.US_ASCII))
    buf.put("fmt ".getBytes(StandardCharsets.US_ASCII))
    buf.putInt(16)            // PCM fmt chunk size
    buf.putShort(1)           // audio format: PCM
    buf.putShort(1)           // channels
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * 2) // byte rate
    buf.putShort(2)           // block align
    buf.putShort(16)          // bits per sample
    buf.put("data".getBytes(StandardCharsets.US_ASCII))
    buf.putInt(dataSize)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Decode a PCM 16-bit RIFF/WAVE file (any channel count; channels
    * pooled into one stat stream). Walks chunks, so files with LIST/
    * fact/etc. chunks before `data` parse correctly.
    */
  def decodeWav(bytes: Array[Byte]): AudioStats = {
    require(bytes.length >= 44, "truncated WAV header")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int): String =
      new String(bytes, off, 4, StandardCharsets.US_ASCII)
    require(tag(0) == "RIFF" && tag(8) == "WAVE",
      "not a RIFF/WAVE file")
    var pos = 12
    var sampleRate = -1
    var channels = -1
    var fmtOk = false
    var dataOff = -1
    var dataLen = -1
    while (pos + 8 <= bytes.length && (!fmtOk || dataOff < 0)) {
      val id = tag(pos)
      val size = buf.getInt(pos + 4)
      require(size >= 0, s"bad chunk size $size at offset $pos")
      if (id == "fmt ") {
        require(size >= 16, s"short fmt chunk ($size bytes)")
        val audioFormat = buf.getShort(pos + 8).toInt
        channels = buf.getShort(pos + 10).toInt
        sampleRate = buf.getInt(pos + 12)
        val bits = buf.getShort(pos + 22).toInt
        require(audioFormat == 1, s"unsupported audio format $audioFormat")
        require(bits == 16, s"unsupported bit depth $bits")
        require(channels > 0, s"bad channel count $channels")
        fmtOk = true
      } else if (id == "data") {
        dataOff = pos + 8
        dataLen = math.min(size.toLong, (bytes.length - dataOff).toLong).toInt
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    require(fmtOk, "missing fmt chunk")
    require(dataOff >= 0, "missing data chunk")
    var (sum, sumSq) = (0L, 0L)
    var peak = 0
    var n = 0L
    var off = dataOff
    val end = dataOff + (dataLen / 2) * 2
    while (off < end) {
      val s = buf.getShort(off).toInt
      sum += s
      sumSq += s.toLong * s
      val a = math.abs(s)
      if (a > peak) peak = a
      n += 1
      off += 2
    }
    AudioStats(sampleRate, channels, n, sum, sumSq, peak)
  }
}
