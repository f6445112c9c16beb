package graft.datapipe

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM codecs for the two uncompressed container formats a sandboxed
  * pipeline can decode without native media libraries (VERDICT r2 task #8):
  * BMP (24-bit uncompressed, the canonical bottom-up BGR layout) and WAV
  * (RIFF PCM16). These make the multimodal batched-decode scaffold REAL for
  * media that uses them; compressed formats (JPEG/MP3/H.264) remain behind
  * the declared stub — their codecs do not ship in this container.
  *
  * Encoders exist so tests and fixtures can synthesize byte-exact media
  * deterministically; decoders parse the headers for real (size fields,
  * row padding, chunk walking) and reject malformed input with a clear
  * error rather than mis-decoding.
  */
object MediaCodec {

  /** Decoded 24-bit image: row-major, top-down, 3 bytes per pixel (B,G,R —
    * the file's channel order, padding stripped). */
  case class Bmp(width: Int, height: Int, pixels: Array[Byte])

  /** Decoded PCM16 audio (interleaved channels). */
  case class Wav(sampleRate: Int, channels: Int, samples: Array[Short]) {
    def nFrames: Int = samples.length / channels
    def durationMs: Long = nFrames * 1000L / sampleRate
  }

  sealed trait Sniffed
  case object IsBmp extends Sniffed
  case object IsWav extends Sniffed
  case object Opaque extends Sniffed

  /** Container detection by magic bytes. */
  def sniff(bytes: Array[Byte]): Sniffed =
    if (bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M') IsBmp
    else if (bytes.length >= 44 && bytes(0) == 'R' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E') IsWav
    else Opaque

  // ---------------------------------------------------------------- BMP --

  private val FileHeaderLen = 14
  private val InfoHeaderLen = 40

  private def rowStride(width: Int): Int = ((width * 3) + 3) & ~3

  /** 24-bit uncompressed BMP from a pixel function (x, y) → (r, g, b),
    * y = 0 at the TOP (the encoder writes rows bottom-up as the format
    * requires). */
  def encodeBmp(width: Int, height: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    val stride = rowStride(width)
    val dataSize = stride * height
    val buf = ByteBuffer.allocate(FileHeaderLen + InfoHeaderLen + dataSize)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
      .putInt(buf.capacity).putShort(0).putShort(0)
      .putInt(FileHeaderLen + InfoHeaderLen)
    buf.putInt(InfoHeaderLen).putInt(width).putInt(height)
      .putShort(1).putShort(24).putInt(0).putInt(dataSize)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = height - 1
    while (y >= 0) { // bottom-up
      var x = 0
      while (x < width) {
        val (r, g, b) = px(x, y)
        buf.put(b.toByte).put(g.toByte).put(r.toByte)
        x += 1
      }
      var pad = stride - width * 3
      while (pad > 0) { buf.put(0: Byte); pad -= 1 }
      y -= 1
    }
    buf.array()
  }

  /** Parse a 24-bit uncompressed BMP (BITMAPINFOHEADER or longer). */
  def decodeBmp(bytes: Array[Byte]): Bmp = {
    require(sniff(bytes) == IsBmp, "not a BMP payload")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dataOffset = buf.getInt(10)
    val infoLen = buf.getInt(14)
    require(infoLen >= InfoHeaderLen, s"unsupported BMP header length $infoLen")
    val width = buf.getInt(18)
    val heightRaw = buf.getInt(22)
    val topDown = heightRaw < 0
    val height = math.abs(heightRaw)
    val bpp = buf.getShort(28)
    val compression = buf.getInt(30)
    require(bpp == 24, s"unsupported BMP bpp $bpp (24-bit uncompressed only)")
    require(compression == 0, s"unsupported BMP compression $compression")
    require(width > 0 && height > 0 && width <= (1 << 20) && height <= (1 << 20),
      s"implausible BMP dimensions ${width}x$height")
    val stride = rowStride(width)
    require(bytes.length >= dataOffset + stride.toLong * height,
      s"truncated BMP: need ${dataOffset + stride.toLong * height} bytes, have ${bytes.length}")
    val out = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val srcRow = if (topDown) y else height - 1 - y
      System.arraycopy(bytes, dataOffset + srcRow * stride, out, y * width * 3, width * 3)
      y += 1
    }
    Bmp(width, height, out)
  }

  // ---------------------------------------------------------------- WAV --

  /** RIFF/WAVE PCM16 (interleaved). */
  def encodeWav(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && samples.length % channels == 0)
    val dataSize = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(36 + dataSize).put("WAVE".getBytes)
    buf.put("fmt ".getBytes).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2).putShort((channels * 2).toShort).putShort(16)
    buf.put("data".getBytes).putInt(dataSize)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Walk the RIFF chunks, parse fmt, return the data samples. */
  def decodeWav(bytes: Array[Byte]): Wav = {
    require(sniff(bytes) == IsWav, "not a WAV payload")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var sampleRate = -1
    var channels = -1
    var bps = -1
    var samples: Array[Short] = null
    while (pos + 8 <= bytes.length && (samples == null || sampleRate < 0)) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val size = buf.getInt(pos + 4)
      require(size >= 0 && pos + 8 + size <= bytes.length,
        s"truncated WAV chunk $id at $pos (size $size)")
      id match {
        case "fmt " =>
          require(size >= 16, s"short fmt chunk ($size)")
          val fmt = buf.getShort(pos + 8)
          require(fmt == 1, s"unsupported WAV format $fmt (PCM only)")
          channels = buf.getShort(pos + 10)
          sampleRate = buf.getInt(pos + 12)
          bps = buf.getShort(pos + 22)
          require(bps == 16, s"unsupported WAV bits/sample $bps (PCM16 only)")
        case "data" =>
          samples = new Array[Short](size / 2)
          var i = 0
          while (i < samples.length) { samples(i) = buf.getShort(pos + 8 + i * 2); i += 1 }
        case _ => // skip unknown chunk
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    require(sampleRate > 0 && channels > 0, "WAV missing fmt chunk")
    require(samples != null, "WAV missing data chunk")
    Wav(sampleRate, channels, samples)
  }
}
