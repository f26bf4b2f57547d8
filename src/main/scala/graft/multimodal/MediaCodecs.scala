package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Real, dependency-free codecs for two simple public container formats:
  * RIFF/WAVE (PCM) and BMP (BITMAPINFOHEADER). These replace one notch of
  * the `fakeDecode` stub with a genuine decode branch — header fields
  * (sample rate, channel count, dimensions) are parsed from actual bytes,
  * so the oracle gate checks a real parser, not an assumption.
  *
  * The full image/audio codec stack (JPEG, MP3, H.264…) still needs
  * external libraries that are not in this container; WAV/BMP are chosen
  * because their containers are fully specified by public byte layouts and
  * parseable with ByteBuffer alone.
  */
object MediaCodecs {

  final case class WavInfo(
      sampleRate: Int, channels: Int, bitsPerSample: Int,
      nFrames: Long, peakAbs: Int)

  final case class BmpInfo(width: Int, height: Int, bitsPerPixel: Int)

  /** Sniff the container from magic bytes — the mime is DERIVED from the
    * blob, never trusted from metadata. */
  def sniffMime(blob: Array[Byte]): String =
    if (blob == null || blob.length < 12) "application/octet-stream"
    else if (blob(0) == 'R' && blob(1) == 'I' && blob(2) == 'F' &&
             blob(3) == 'F' && blob(8) == 'W' && blob(9) == 'A' &&
             blob(10) == 'V' && blob(11) == 'E') "audio/wav"
    else if (blob(0) == 'B' && blob(1) == 'M') "image/bmp"
    else "application/octet-stream"

  // ---- WAV (RIFF + fmt + data, PCM16 little-endian) ----------------------

  /** Encode interleaved PCM16 frames into a canonical WAV container. */
  def encodeWavPcm16(sampleRate: Int, channels: Int,
                     samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16)                      // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Parse a WAV header by walking RIFF chunks (fmt may not be first —
    * LIST/INFO chunks are legal before it). Returns None on anything that
    * is not a PCM16 RIFF/WAVE — including truncated or corrupt blobs
    * whose declared chunk sizes overrun the buffer (a decoder running
    * over 100 TB of scraped bytes must never throw on malformed input). */
  def decodeWav(blob: Array[Byte]): Option[WavInfo] =
    try decodeWavUnsafe(blob) catch { case _: RuntimeException => None }

  private def decodeWavUnsafe(blob: Array[Byte]): Option[WavInfo] = {
    if (sniffMime(blob) != "audio/wav") return None
    val buf = ByteBuffer.wrap(blob).order(ByteOrder.LITTLE_ENDIAN)
    buf.position(12) // past RIFF<size>WAVE
    var sampleRate = -1; var channels = -1; var bits = -1
    var blockAlign = -1; var dataSize = -1L
    var dataPos = -1
    while (buf.remaining() >= 8) {
      val id = new String(Array(buf.get(), buf.get(), buf.get(), buf.get()),
        "US-ASCII")
      val size = buf.getInt()
      if (size < 0) return None // corrupt declared size
      id match {
        case "fmt " if size >= 16 =>
          if (buf.remaining() < 16) return None // truncated fmt chunk
          val fmtStart = buf.position()
          val audioFormat = buf.getShort()
          channels = buf.getShort().toInt
          sampleRate = buf.getInt()
          buf.getInt() // byte rate
          blockAlign = buf.getShort().toInt
          bits = buf.getShort().toInt
          if (audioFormat != 1) return None // PCM only
          buf.position(math.min(blob.length,
            fmtStart + size + (size & 1))) // chunks pad to even
        case "data" =>
          // clamp the declared payload to the bytes actually present
          dataPos = buf.position()
          dataSize = math.min(size.toLong & 0xffffffffL,
            (blob.length - dataPos).toLong)
          buf.position(math.min(blob.length,
            buf.position() + size + (size & 1)))
        case _ =>
          buf.position(math.min(blob.length,
            buf.position() + size + (size & 1)))
      }
    }
    if (sampleRate < 0 || dataSize < 0 || blockAlign <= 0) return None
    val nFrames = dataSize / blockAlign
    // Peak |amplitude| over the PCM16 payload — a real sample-level pass.
    var peak = 0
    if (bits == 16 && dataPos >= 0) {
      val end = math.min(blob.length.toLong, dataPos + dataSize).toInt
      var i = dataPos
      while (i + 1 < end) {
        val s = ((blob(i) & 0xff) | (blob(i + 1) << 8)).toShort.toInt
        val a = math.abs(s)
        if (a > peak) peak = a
        i += 2
      }
    }
    Some(WavInfo(sampleRate, channels, bits, nFrames, peak))
  }

  /** Decode the full interleaved PCM16 sample payload alongside the
    * header info. Same RIFF-chunk tolerance as decodeWav (the header walk
    * is shared); None for non-PCM16 or torn blobs. The samples array is
    * the real bytes-to-shorts pass a fingerprint must run on — never the
    * synthesis formula. */
  def decodeWavPcm(blob: Array[Byte]): Option[(WavInfo, Array[Short])] =
    decodeWav(blob).flatMap { info =>
      if (info.bitsPerSample != 16) None
      else {
        // re-locate the data chunk (headers are tiny; one extra walk)
        val buf = ByteBuffer.wrap(blob).order(ByteOrder.LITTLE_ENDIAN)
        buf.position(12)
        var dataPos = -1; var dataLen = 0
        while (dataPos < 0 && buf.remaining() >= 8) {
          val id = new String(Array(buf.get(), buf.get(), buf.get(),
            buf.get()), "US-ASCII")
          val size = buf.getInt()
          if (size < 0) return None
          if (id == "data") {
            dataPos = buf.position()
            dataLen = math.min(size.toLong & 0xffffffffL,
              (blob.length - dataPos).toLong).toInt
          } else buf.position(math.min(blob.length,
            buf.position() + size + (size & 1)))
        }
        if (dataPos < 0) None
        else {
          val n = dataLen / 2
          val out = new Array[Short](n)
          var i = 0
          while (i < n) {
            out(i) = ((blob(dataPos + 2 * i) & 0xff)
              | (blob(dataPos + 2 * i + 1) << 8)).toShort
            i += 1
          }
          Some((info, out))
        }
      }
    }

  // ---- BMP (BITMAPFILEHEADER + BITMAPINFOHEADER, 24bpp bottom-up) --------

  /** Encode a 24bpp BMP; pixel(x, y) returns packed 0xRRGGBB. Rows are
    * bottom-up and padded to 4-byte boundaries per the spec. */
  def encodeBmp24(width: Int, height: Int,
                  pixel: (Int, Int) => Int): Array[Byte] = {
    val rowBytes = width * 3
    val pad = (4 - rowBytes % 4) % 4
    val imageSize = (rowBytes + pad) * height
    val buf = ByteBuffer.allocate(54 + imageSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
      .putInt(54 + imageSize).putInt(0).putInt(54)
    buf.putInt(40).putInt(width).putInt(height)
      .putShort(1).putShort(24).putInt(0).putInt(imageSize)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = height - 1
    while (y >= 0) { // bottom-up row order
      var x = 0
      while (x < width) {
        val p = pixel(x, y)
        buf.put((p & 0xff).toByte)          // B
          .put(((p >> 8) & 0xff).toByte)    // G
          .put(((p >> 16) & 0xff).toByte)   // R
        x += 1
      }
      var k = 0
      while (k < pad) { buf.put(0.toByte); k += 1 }
      y -= 1
    }
    buf.array()
  }

  /** Full pixel read of a 24bpp bottom-up BMP (the encodeBmp24 layout):
    * returns (width, height, gray) with gray row-major TOP-DOWN, one int
    * per pixel from the blue channel (our fixtures write r=g=b, and blue
    * is byte 0 of each pixel triple). None on any malformed geometry. */
  def decodeBmpGray(blob: Array[Byte]): Option[(Int, Int, Array[Int])] =
    decodeBmp(blob).filter(i => i.bitsPerPixel == 24 && i.width > 0 && i.height > 0)
      .flatMap { info =>
        val w = info.width; val h = info.height
        val rowBytes = w * 3
        val pad = (4 - rowBytes % 4) % 4
        if (blob.length < 54 + (rowBytes + pad).toLong * h) None
        else {
          val g = new Array[Int](w * h)
          var y = 0
          while (y < h) {
            val base = 54 + (h - 1 - y) * (rowBytes + pad)
            var x = 0
            while (x < w) { g(y * w + x) = blob(base + x * 3) & 0xff; x += 1 }
            y += 1
          }
          Some((w, h, g))
        }
      }

  /** Parse BMP dimensions from a BITMAPINFOHEADER (the universal core
    * header; height may be negative = top-down, we report magnitude). */
  def decodeBmp(blob: Array[Byte]): Option[BmpInfo] = {
    if (sniffMime(blob) != "image/bmp" || blob.length < 54) return None
    val buf = ByteBuffer.wrap(blob).order(ByteOrder.LITTLE_ENDIAN)
    val headerSize = buf.getInt(14)
    if (headerSize < 40) return None
    val width = buf.getInt(18)
    val height = math.abs(buf.getInt(22))
    val bpp = buf.getShort(28).toInt
    Some(BmpInfo(width, height, bpp))
  }
}
