package graft.datapipe

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM codecs for the container formats a sandboxed pipeline can
  * decode without native media libraries (VERDICT r2 task #8; PNG r4 #7):
  * BMP (24-bit uncompressed, the canonical bottom-up BGR layout), PNG
  * (8-bit gray/RGB/RGBA, deflate via java.util.zip, all five scanline
  * filters) and WAV (RIFF PCM16). These make the multimodal batched-decode
  * scaffold REAL for media that uses them; remaining compressed formats
  * (JPEG/MP3/H.264) stay behind the declared stub — their codecs do not
  * ship in this container.
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

  /** Decoded PNG: row-major, top-down, `channels` bytes per pixel in the
    * file's sample order (G / RGB / RGBA for color types 0 / 2 / 6). */
  case class Png(width: Int, height: Int, channels: Int, pixels: Array[Byte])

  sealed trait Sniffed
  case object IsBmp extends Sniffed
  case object IsWav extends Sniffed
  case object IsPng extends Sniffed
  case object Opaque extends Sniffed

  private val PngSig =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  /** Container detection by magic bytes. */
  def sniff(bytes: Array[Byte]): Sniffed =
    if (bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M') IsBmp
    else if (bytes.length >= 44 && bytes(0) == 'R' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E') IsWav
    else if (bytes.length >= 8 + 25 && PngSig.indices.forall(i => bytes(i) == PngSig(i))) IsPng
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

  // ---------------------------------------------------------------- PNG --
  // Pure-JVM via java.util.zip (Deflater/Inflater/CRC32) — the compressed
  // format a real multimodal corpus hits first (VERDICT r4 task #7). Scope:
  // 8-bit gray / truecolor / truecolor+alpha (color types 0/2/6), no
  // interlace; all five scanline filters are unfiltered on decode. Chunk
  // CRCs are VERIFIED — malformed input fails loudly, never mis-decodes.

  private def pngChunk(kind: String, data: Array[Byte]): Array[Byte] = {
    val buf = ByteBuffer.allocate(12 + data.length) // PNG ints are BIG-endian
    buf.putInt(data.length).put(kind.getBytes("US-ASCII")).put(data)
    val crc = new java.util.zip.CRC32
    crc.update(kind.getBytes("US-ASCII"))
    crc.update(data)
    buf.putInt(crc.getValue.toInt)
    buf.array()
  }

  /** One full-buffer deflate pass (shared by the PNG and APNG encoders). */
  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val out = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) out.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    out.toByteArray
  }

  private case class Ihdr(width: Int, height: Int, channels: Int)

  /** Parse + validate an IHDR chunk at `pos` — ONE set of header rules for
    * the still and animated decoders (they diverged once: the APNG path
    * lacked the compression/filter-method check). */
  private def parseIhdr(bytes: Array[Byte], buf: ByteBuffer, pos: Int, len: Int): Ihdr = {
    require(len == 13, s"bad IHDR length $len")
    val width = buf.getInt(pos + 8)
    val height = buf.getInt(pos + 12)
    val bitDepth = bytes(pos + 16)
    require(bitDepth == 8, s"unsupported PNG bit depth $bitDepth (8 only)")
    val channels = bytes(pos + 17) match {
      case 0 => 1
      case 2 => 3
      case 6 => 4
      case t => throw new IllegalArgumentException(
        s"unsupported PNG color type $t (gray/RGB/RGBA only)")
    }
    require(bytes(pos + 18) == 0 && bytes(pos + 19) == 0,
      "unsupported PNG compression/filter method")
    require(bytes(pos + 20) == 0, "interlaced PNG not supported")
    require(width > 0 && height > 0 && width <= (1 << 20) && height <= (1 << 20),
      s"implausible PNG dimensions ${width}x$height")
    Ihdr(width, height, channels)
  }

  /** Walk a PNG chunk stream, verifying length bounds and per-chunk CRCs;
    * `handler` sees every chunk except IEND as (kind, chunkPos, dataLen)
    * with chunk data at `chunkPos + 8`. Fails loudly on truncation, a bad
    * CRC, or a missing IEND — shared by [[decodePng]] and [[decodeApng]]. */
  private def walkPngChunks(bytes: Array[Byte])(handler: (String, Int, Int) => Unit): Unit = {
    require(sniff(bytes) == IsPng, "not a PNG payload")
    val buf = ByteBuffer.wrap(bytes) // big-endian by default
    var pos = 8
    var sawEnd = false
    while (!sawEnd && pos + 12 <= bytes.length) {
      val len = buf.getInt(pos)
      require(len >= 0 && pos + 12 + len <= bytes.length,
        s"truncated PNG chunk at $pos (len $len)")
      val kind = new String(bytes, pos + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32
      crc.update(bytes, pos + 4, 4 + len)
      require(crc.getValue.toInt == buf.getInt(pos + 8 + len),
        s"PNG chunk $kind CRC mismatch at $pos")
      if (kind == "IEND") sawEnd = true else handler(kind, pos, len)
      pos += 12 + len
    }
    require(sawEnd, "PNG missing IEND")
  }

  /** 8-bit truecolor (color type 2) PNG from (x, y) → (r, g, b); every
    * scanline uses filter 0 (None) — decoders must accept any filter, so
    * tests exercise the other four via hand-built streams. */
  def encodePng(width: Int, height: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    val raw = new Array[Byte](height * (1 + width * 3))
    var y = 0
    while (y < height) {
      val row = y * (1 + width * 3)
      raw(row) = 0 // filter: None
      var x = 0
      while (x < width) {
        val (r, g, b) = px(x, y)
        raw(row + 1 + x * 3) = r.toByte
        raw(row + 2 + x * 3) = g.toByte
        raw(row + 3 + x * 3) = b.toByte
        x += 1
      }
      y += 1
    }
    val ihdr = ByteBuffer.allocate(13)
      .putInt(width).putInt(height).put(8: Byte).put(2: Byte)
      .put(0: Byte).put(0: Byte).put(0: Byte).array()
    PngSig ++ pngChunk("IHDR", ihdr) ++ pngChunk("IDAT", deflate(raw)) ++
      pngChunk("IEND", Array.emptyByteArray)
  }

  /** Parse + inflate + unfilter a PNG (8-bit, color type 0/2/6, no
    * interlace). CRCs verified per chunk. */
  def decodePng(bytes: Array[Byte]): Png = {
    val buf = ByteBuffer.wrap(bytes) // big-endian by default
    var hdr: Ihdr = null
    val idat = new java.io.ByteArrayOutputStream()
    walkPngChunks(bytes) { (kind, pos, len) =>
      kind match {
        case "IHDR" => hdr = parseIhdr(bytes, buf, pos, len)
        case "IDAT" => idat.write(bytes, pos + 8, len)
        case _      => // ancillary chunk — skip
      }
    }
    require(hdr != null, "PNG missing IHDR")
    Png(hdr.width, hdr.height, hdr.channels,
      inflateAndUnfilter(idat.toByteArray, hdr.width, hdr.height, hdr.channels))
  }

  /** Inflate one PNG/APNG-frame deflate stream to exactly
    * `height × (1 + width·channels)` filtered bytes, then unfilter. Frame
    * regions in APNG are filtered independently with this same algorithm,
    * so the helper is shared between [[decodePng]] and [[decodeApng]]. */
  private def inflateAndUnfilter(deflated: Array[Byte], width: Int,
      height: Int, channels: Int): Array[Byte] = {
    val stride = width * channels
    val raw = new Array[Byte](height * (1 + stride))
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(deflated)
    var off = 0
    while (!inflater.finished() && off < raw.length) {
      val n = inflater.inflate(raw, off, raw.length - off)
      require(n > 0 || inflater.finished(),
        "PNG pixel stream ended early (corrupt or truncated deflate data)")
      off += n
    }
    inflater.end()
    require(off == raw.length,
      s"PNG pixel data short: $off of ${raw.length} bytes")
    val out = new Array[Byte](height * stride)
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    var y = 0
    while (y < height) {
      val ft = raw(y * (1 + stride)) & 0xff
      val src = y * (1 + stride) + 1
      val dst = y * stride
      var i = 0
      while (i < stride) {
        val x = raw(src + i) & 0xff
        val a = if (i >= channels) out(dst + i - channels) & 0xff else 0 // left
        val b = if (y > 0) out(dst - stride + i) & 0xff else 0           // up
        val c = if (y > 0 && i >= channels) out(dst - stride + i - channels) & 0xff else 0
        val v = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + (a + b) / 2
          case 4 => x + paeth(a, b, c)
          case t => throw new IllegalArgumentException(s"bad PNG filter type $t at row $y")
        }
        out(dst + i) = v.toByte
        i += 1
      }
      y += 1
    }
    out
  }

  // --------------------------------------------------------------- APNG --
  // Animated PNG (the PNG spec's animation chunks: acTL / fcTL / fdAT) —
  // the one VIDEO-shaped container a pure JVM can decode, which turns the
  // frame-sampling operator from a declared stub into a real decode path.
  // The animation chunks are ancillary, so [[decodePng]] on an APNG still
  // returns the default image (frame 0) — image consumers need no change.
  // Scope mirrors the still decoder (8-bit, color types 0/2/6) plus:
  // dispose_op 0 (none) / 1 (background), blend_op 0 (source); frame
  // regions may be sub-rectangles with offsets. CRCs verified per chunk.

  /** One composed animation: full-canvas pixel buffers per frame (the
    * region/dispose/blend composition already applied). */
  case class Apng(width: Int, height: Int, channels: Int,
      frames: IndexedSeq[Array[Byte]], delaysMs: IndexedSeq[Long])

  /** True when the payload is a PNG that declares animation (an `acTL`
    * chunk before the first `IDAT`) — a light structural scan, no CRC. */
  def isApng(bytes: Array[Byte]): Boolean = {
    if (sniff(bytes) != IsPng) return false
    val buf = ByteBuffer.wrap(bytes)
    var pos = 8
    while (pos + 12 <= bytes.length) {
      val len = buf.getInt(pos)
      if (len < 0 || pos + 12 + len > bytes.length) return false
      new String(bytes, pos + 4, 4, "US-ASCII") match {
        case "acTL"          => return true
        case "IDAT" | "IEND" => return false
        case _               =>
      }
      pos += 12 + len
    }
    false
  }

  /** Truecolor APNG from (frame, x, y) → (r, g, b): full-canvas frames,
    * filter 0, dispose none / blend source. `delayNum/delayDen` is the
    * per-frame delay fraction in seconds (PNG spec semantics). */
  def encodeApng(width: Int, height: Int, nFrames: Int,
      px: (Int, Int, Int) => (Int, Int, Int),
      delayNum: Int = 1, delayDen: Int = 10): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(nFrames >= 1, s"need at least one frame, got $nFrames")
    def rawFrame(f: Int): Array[Byte] = {
      val raw = new Array[Byte](height * (1 + width * 3))
      var y = 0
      while (y < height) {
        val row = y * (1 + width * 3)
        raw(row) = 0 // filter: None
        var x = 0
        while (x < width) {
          val (r, g, b) = px(f, x, y)
          raw(row + 1 + x * 3) = r.toByte
          raw(row + 2 + x * 3) = g.toByte
          raw(row + 3 + x * 3) = b.toByte
          x += 1
        }
        y += 1
      }
      raw
    }
    def fcTL(seq: Int): Array[Byte] =
      ByteBuffer.allocate(26).putInt(seq).putInt(width).putInt(height)
        .putInt(0).putInt(0) // x/y offset
        .putShort(delayNum.toShort).putShort(delayDen.toShort)
        .put(0: Byte).put(0: Byte) // dispose none, blend source
        .array()
    val ihdr = ByteBuffer.allocate(13)
      .putInt(width).putInt(height).put(8: Byte).put(2: Byte)
      .put(0: Byte).put(0: Byte).put(0: Byte).array()
    val acTL = ByteBuffer.allocate(8).putInt(nFrames).putInt(0).array()
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig)
    out.write(pngChunk("IHDR", ihdr))
    out.write(pngChunk("acTL", acTL))
    out.write(pngChunk("fcTL", fcTL(0))) // frame 0 IS the default image
    out.write(pngChunk("IDAT", deflate(rawFrame(0))))
    var f = 1
    while (f < nFrames) {
      out.write(pngChunk("fcTL", fcTL(2 * f - 1)))
      val data = deflate(rawFrame(f))
      out.write(pngChunk("fdAT",
        ByteBuffer.allocate(4 + data.length).putInt(2 * f).put(data).array()))
      f += 1
    }
    out.write(pngChunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  /** Walk the animation chunks, inflate + unfilter each frame region
    * independently (per spec), and compose onto the canvas. Sequence
    * numbers are validated consecutive-from-0; chunk CRCs verified. */
  def decodeApng(bytes: Array[Byte]): Apng = {
    val buf = ByteBuffer.wrap(bytes)
    var hdr: Ihdr = null
    var declaredFrames = -1
    // per-frame accumulation: control record + that frame's deflate bytes
    case class Ctl(seq: Int, w: Int, h: Int, x: Int, y: Int,
        delayNum: Int, delayDen: Int, dispose: Int, blend: Int)
    val ctls = scala.collection.mutable.ArrayBuffer[Ctl]()
    val datas = scala.collection.mutable.ArrayBuffer[java.io.ByteArrayOutputStream]()
    var nextSeq = 0
    var sawIdat = false
    var idatIsFrame0 = false
    walkPngChunks(bytes) { (kind, pos, len) =>
      kind match {
        case "IHDR" => hdr = parseIhdr(bytes, buf, pos, len)
        case "acTL" =>
          require(len == 8, s"bad acTL length $len")
          declaredFrames = buf.getInt(pos + 8)
          require(declaredFrames >= 1, s"bad acTL frame count $declaredFrames")
        case "fcTL" =>
          require(len == 26, s"bad fcTL length $len")
          require(hdr != null, "fcTL before IHDR")
          val c = Ctl(buf.getInt(pos + 8), buf.getInt(pos + 12), buf.getInt(pos + 16),
            buf.getInt(pos + 20), buf.getInt(pos + 24),
            buf.getShort(pos + 28) & 0xffff, buf.getShort(pos + 30) & 0xffff,
            bytes(pos + 32) & 0xff, bytes(pos + 33) & 0xff)
          require(c.seq == nextSeq, s"fcTL sequence ${c.seq}, expected $nextSeq")
          nextSeq += 1
          require(c.w > 0 && c.h > 0 && c.x >= 0 && c.y >= 0 &&
            c.x + c.w <= hdr.width && c.y + c.h <= hdr.height,
            s"frame region ${c.w}x${c.h}+${c.x}+${c.y} outside ${hdr.width}x${hdr.height} canvas")
          require(c.dispose <= 1, s"unsupported dispose_op ${c.dispose} (none/background only)")
          require(c.blend == 0, s"unsupported blend_op ${c.blend} (source only)")
          if (!sawIdat) idatIsFrame0 = true
          ctls += c
          datas += new java.io.ByteArrayOutputStream()
        case "IDAT" =>
          sawIdat = true
          if (idatIsFrame0) datas.head.write(bytes, pos + 8, len)
        case "fdAT" =>
          require(len >= 4, s"bad fdAT length $len")
          require(buf.getInt(pos + 8) == nextSeq,
            s"fdAT sequence ${buf.getInt(pos + 8)}, expected $nextSeq")
          nextSeq += 1
          require(datas.nonEmpty, "fdAT before any fcTL")
          datas.last.write(bytes, pos + 12, len - 4)
        case _ => // ancillary chunk — skip
      }
    }
    require(hdr != null, "PNG missing IHDR")
    val width = hdr.width; val height = hdr.height; val channels = hdr.channels
    require(declaredFrames > 0, "not an APNG (no acTL chunk)")
    require(ctls.length == declaredFrames,
      s"acTL declares $declaredFrames frames, found ${ctls.length} fcTL chunks")
    if (idatIsFrame0) { // default image is frame 0: region must be full canvas
      val c = ctls.head
      require(c.x == 0 && c.y == 0 && c.w == width && c.h == height,
        "frame 0 (default image) must cover the full canvas")
    }
    val stride = width * channels
    val canvas = new Array[Byte](height * stride)
    val frames = Vector.newBuilder[Array[Byte]]
    val delays = Vector.newBuilder[Long]
    var i = 0
    while (i < ctls.length) {
      val c = ctls(i)
      val region = inflateAndUnfilter(datas(i).toByteArray, c.w, c.h, channels)
      var ry = 0
      while (ry < c.h) { // blend_op 0: overwrite the region
        System.arraycopy(region, ry * c.w * channels,
          canvas, (c.y + ry) * stride + c.x * channels, c.w * channels)
        ry += 1
      }
      frames += canvas.clone()
      delays += c.delayNum * 1000L / (if (c.delayDen == 0) 100 else c.delayDen)
      if (c.dispose == 1) { // background: clear the region before next frame
        var dy = 0
        while (dy < c.h) {
          java.util.Arrays.fill(canvas, (c.y + dy) * stride + c.x * channels,
            (c.y + dy) * stride + (c.x + c.w) * channels, 0: Byte)
          dy += 1
        }
      }
      i += 1
    }
    Apng(width, height, channels, frames.result(), delays.result())
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
