package graft.datapipe

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.spider.SparkTestBase

class MultimodalSpec extends AnyFunSuite with SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("synthMedia: binary payload + typed metadata, deterministic") {
    val a = Multimodal.synthMedia(spark, sfDir)
    assert(a.schema.fieldNames.toSeq ==
      Seq("media_id", "kind", "bytes", "width", "height", "duration_ms", "mime"))
    val r1 = a.orderBy("media_id").head()
    val r2 = Multimodal.synthMedia(spark, sfDir).orderBy("media_id").head()
    assert(java.util.Arrays.equals(r1.getAs[Array[Byte]]("bytes"), r2.getAs[Array[Byte]]("bytes")))
    assert(a.filter(col("kind").isin("image", "audio", "video")).count() == a.count())
  }

  test("extractFeatures: batched map over binary column, fixed dim, deterministic") {
    import spark.implicits._
    val media = Multimodal.synthMedia(spark, sfDir).as[Multimodal.MediaRow]
    val f1 = Multimodal.extractFeatures(media, dim = 16, batchSize = 32)
      .collect().sortBy(_.media_id)
    assert(f1.length == 500)
    assert(f1.forall(_.feature.length == 16))
    assert(f1.forall(_.n_bytes > 0))
    val f2 = Multimodal.extractFeatures(media, dim = 16, batchSize = 7)
      .collect().sortBy(_.media_id)
    // batch size must not change results (plumbing, not semantics)
    f1.zip(f2).foreach { case (a, b) =>
      assert(a.media_id == b.media_id && a.feature.sameElements(b.feature))
    }
  }

  test("BMP roundtrip: encode → decode recovers dimensions and every pixel") {
    val (w, h) = (13, 7) // odd width exercises row padding
    def px(x: Int, y: Int): (Int, Int, Int) = ((x * 17 + y) % 256, (y * 31) % 256, (x ^ y) % 256)
    val img = MediaCodec.decodeBmp(MediaCodec.encodeBmp(w, h, px))
    assert(img.width == w && img.height == h)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      val off = (y * w + x) * 3
      assert((img.pixels(off) & 0xff) == b && (img.pixels(off + 1) & 0xff) == g &&
        (img.pixels(off + 2) & 0xff) == r, s"pixel ($x,$y)")
    }
    // malformed input rejected, not mis-decoded
    assertThrows[IllegalArgumentException](
      MediaCodec.decodeBmp(MediaCodec.encodeBmp(4, 4, px).take(40)))
  }

  test("WAV roundtrip: encode → decode recovers rate, channels, every sample; extra chunks skipped") {
    val samples = Array.tabulate(4321)(i => ((i * 2731) % 65536 - 32768).toShort)
    val wav = MediaCodec.decodeWav(MediaCodec.encodeWav(16000, 1, samples))
    assert(wav.sampleRate == 16000 && wav.channels == 1)
    assert(wav.samples.sameElements(samples))
    assert(wav.durationMs == 4321L * 1000 / 16000)
    // chunk walking: a LIST chunk between fmt and data must be skipped
    val plain = MediaCodec.encodeWav(8000, 2, samples.take(100))
    val withExtra = {
      val head = plain.take(36) // RIFF..fmt chunk end
      val extra = "LIST".getBytes ++ Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes
      val tail = plain.drop(36)
      val out = head ++ extra ++ tail
      // fix RIFF size
      val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(4, out.length - 8)
      out
    }
    val wav2 = MediaCodec.decodeWav(withExtra)
    assert(wav2.channels == 2 && wav2.sampleRate == 8000 &&
      wav2.samples.sameElements(samples.take(100)))
  }

  test("extractFeatures decodes real BMP/WAV payloads: codec tags, dimensions, sample counts") {
    import spark.implicits._
    val media = Multimodal.synthMedia(spark, sfDir).as[Multimodal.MediaRow]
    val byId = media.collect().map(r => r.media_id -> r).toMap
    val feats = Multimodal.extractFeatures(media, dim = 16).collect()
    assert(feats.nonEmpty)
    val kinds = feats.map(_.kind).toSet
    assert(kinds == Set("image", "audio", "video"))
    feats.foreach { f =>
      val src = byId(f.media_id)
      f.kind match {
        case "image" =>
          assert(f.codec == "bmp" || f.codec == "png", s"codec ${f.codec}")
          assert(f.decoded_w == src.width && f.decoded_h == src.height,
            s"media ${f.media_id}: decoded ${f.decoded_w}x${f.decoded_h} vs metadata ${src.width}x${src.height}")
          assert(f.n_samples == -1L)
          // channel means are normalized
          assert(f.feature.take(3).forall(v => v >= 0f && v <= 1f))
        case "audio" =>
          assert(f.codec == "wav")
          assert(f.n_samples > 0)
          assert(f.n_samples * 1000L / 8000 == src.duration_ms,
            s"media ${f.media_id}: ${f.n_samples} samples vs duration ${src.duration_ms}")
        case "video" =>
          if (src.mime == "image/apng") {
            // real APNG payload: the still decoder reads its default image
            // (frame 0) — the animation chunks are ancillary
            assert(f.codec == "png" && f.decoded_w == src.width &&
              f.decoded_h == src.height, s"media ${f.media_id}")
          } else {
            assert(f.codec == "opaque" && f.decoded_w == -1 && f.n_samples == -1L)
          }
      }
    }
    // both image containers are present and take their REAL decode paths
    val imageCodecs = feats.filter(_.kind == "image").map(_.codec).toSet
    assert(imageCodecs == Set("bmp", "png"), s"image codecs: $imageCodecs")
    // and the video column carries both the real-APNG and the opaque path
    val videoMimes = feats.filter(_.kind == "video")
      .map(f => byId(f.media_id).mime).toSet
    assert(videoMimes == Set("image/apng", "application/octet-stream"),
      s"video mimes: $videoMimes")
  }

  test("PNG roundtrip: encode → decode recovers dimensions and every pixel; " +
      "CRC corruption and truncation rejected") {
    val (w, h) = (13, 7)
    def px(x: Int, y: Int): (Int, Int, Int) = ((x * 17 + y) % 256, (y * 31) % 256, (x ^ y) % 256)
    val bytes = MediaCodec.encodePng(w, h, px)
    val img = MediaCodec.decodePng(bytes)
    assert(img.width == w && img.height == h && img.channels == 3)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      val off = (y * w + x) * 3
      assert((img.pixels(off) & 0xff) == r && (img.pixels(off + 1) & 0xff) == g &&
        (img.pixels(off + 2) & 0xff) == b, s"pixel ($x,$y)")
    }
    // a flipped pixel byte breaks the IDAT CRC → loud failure
    val corrupt = bytes.clone()
    corrupt(bytes.length - 20) = (corrupt(bytes.length - 20) ^ 0x5a).toByte
    assertThrows[IllegalArgumentException](MediaCodec.decodePng(corrupt))
    assertThrows[IllegalArgumentException](MediaCodec.decodePng(bytes.take(40)))
  }

  test("PNG decode unfilters all five scanline filter types (hand-built stream)") {
    // 4x5 RGB image, one row per filter type 0..4; expected pixels derived
    // by applying the spec's reconstruction functions to chosen raw bytes
    val (w, h, ch) = (4, 5, 3)
    val stride = w * ch
    val rnd = new scala.util.Random(7)
    val expected = Array.fill(h * stride)((rnd.nextInt(256) & 0xff).toByte)
    // build the FILTERED stream from the expected output (invert each filter)
    val raw = new Array[Byte](h * (1 + stride))
    def e(y: Int, i: Int): Int = expected(y * stride + i) & 0xff
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    for (y <- 0 until h) {
      val ft = y % 5
      raw(y * (1 + stride)) = ft.toByte
      for (i <- 0 until stride) {
        val a = if (i >= ch) e(y, i - ch) else 0
        val b = if (y > 0) e(y - 1, i) else 0
        val c = if (y > 0 && i >= ch) e(y - 1, i - ch) else 0
        val x = ft match {
          case 0 => e(y, i)
          case 1 => e(y, i) - a
          case 2 => e(y, i) - b
          case 3 => e(y, i) - (a + b) / 2
          case 4 => e(y, i) - paeth(a, b, c)
        }
        raw(y * (1 + stride) + 1 + i) = x.toByte
      }
    }
    // wrap raw in IHDR/IDAT/IEND chunks (reflection-free: rebuild encodePng's
    // framing by hand so the test does not depend on the encoder's filters)
    def chunk(kind: String, data: Array[Byte]): Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(12 + data.length)
      buf.putInt(data.length).put(kind.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32
      crc.update(kind.getBytes("US-ASCII")); crc.update(data)
      buf.putInt(crc.getValue.toInt).array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8: Byte).put(2: Byte)
      .put(0: Byte).put(0: Byte).put(0: Byte).array()
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val out = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) out.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    val png = sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", out.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
    val img = MediaCodec.decodePng(png)
    assert(img.width == w && img.height == h && img.channels == 3)
    assert(img.pixels.sameElements(expected),
      "unfiltered pixels differ from the reconstruction-spec expectation")
  }

  test("PNG gray and RGBA color types decode (channels, feature reorder)") {
    // hand-build a 2x2 gray (type 0) and a 2x2 RGBA (type 6) image
    def build(colorType: Int, ch: Int, pix: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val stride = w * ch
      val raw = new Array[Byte](h * (1 + stride))
      for (y <- 0 until h) {
        raw(y * (1 + stride)) = 0
        System.arraycopy(pix, y * stride, raw, y * (1 + stride) + 1, stride)
      }
      def chunk(kind: String, data: Array[Byte]): Array[Byte] = {
        val buf = java.nio.ByteBuffer.allocate(12 + data.length)
        buf.putInt(data.length).put(kind.getBytes("US-ASCII")).put(data)
        val crc = new java.util.zip.CRC32
        crc.update(kind.getBytes("US-ASCII")); crc.update(data)
        buf.putInt(crc.getValue.toInt).array()
      }
      val ihdr = java.nio.ByteBuffer.allocate(13)
        .putInt(w).putInt(h).put(8: Byte).put(colorType.toByte)
        .put(0: Byte).put(0: Byte).put(0: Byte).array()
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(raw); deflater.finish()
      val out = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      while (!deflater.finished()) out.write(tmp, 0, deflater.deflate(tmp))
      deflater.end()
      val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", out.toByteArray) ++
        chunk("IEND", Array.emptyByteArray)
    }
    val gray = MediaCodec.decodePng(build(0, 1, Array[Byte](10, 20, 30, 40), 2, 2))
    assert(gray.channels == 1 && gray.pixels.sameElements(Array[Byte](10, 20, 30, 40)))
    val rgbaPix = Array.tabulate[Byte](2 * 2 * 4)(i => (i * 11).toByte)
    val rgba = MediaCodec.decodePng(build(6, 4, rgbaPix, 2, 2))
    assert(rgba.channels == 4 && rgba.pixels.sameElements(rgbaPix))
    // feature reorder: gray broadcasts to all three channel means
    val f = Multimodal.pngFeatures(gray, 3)
    assert(f(0) == f(1) && f(1) == f(2))
  }

  test("APNG roundtrip: encode k frames → decodeApng recovers every frame pixel + delays") {
    val (w, h, n) = (9, 5, 5)
    def px(f: Int, x: Int, y: Int): (Int, Int, Int) =
      ((f * 41 + x * 17 + y) % 256, (f + y * 31) % 256, (f ^ x ^ y) % 256)
    val bytes = MediaCodec.encodeApng(w, h, n, px, delayNum = 1, delayDen = 10)
    assert(MediaCodec.isApng(bytes))
    assert(!MediaCodec.isApng(MediaCodec.encodePng(4, 4, (x, y) => (x, y, 0))))
    val anim = MediaCodec.decodeApng(bytes)
    assert(anim.width == w && anim.height == h && anim.channels == 3)
    assert(anim.frames.length == n)
    assert(anim.delaysMs.forall(_ == 100L))
    for (f <- 0 until n; y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(f, x, y)
      val off = (y * w + x) * 3
      val fr = anim.frames(f)
      assert((fr(off) & 0xff) == r && (fr(off + 1) & 0xff) == g &&
        (fr(off + 2) & 0xff) == b, s"frame $f pixel ($x,$y)")
    }
    // the animation chunks are ancillary: the STILL decoder sees frame 0
    val still = MediaCodec.decodePng(bytes)
    assert(still.pixels.sameElements(anim.frames.head))
    // malformed input rejected, not mis-decoded: corrupt an fdAT byte (CRC),
    // then truncate mid-stream
    val corrupt = bytes.clone()
    val fdatAt = {
      var p = 8; var at = -1
      while (at < 0) {
        val len = java.nio.ByteBuffer.wrap(corrupt).getInt(p)
        if (new String(corrupt, p + 4, 4, "US-ASCII") == "fdAT") at = p + 12
        else p += 12 + len
      }
      at
    }
    corrupt(fdatAt) = (corrupt(fdatAt) ^ 0x5a).toByte
    assertThrows[IllegalArgumentException](MediaCodec.decodeApng(corrupt))
    assertThrows[IllegalArgumentException](
      MediaCodec.decodeApng(bytes.take(bytes.length / 2)))
    // an IHDR declaring filter method 1 (CRC fixed up so the chunk-level
    // check passes) must fail loudly in BOTH decoders — unfiltering with
    // method-0 semantics would silently mis-decode every scanline
    val badFilter = bytes.clone()
    badFilter(27) = 1 // IHDR data byte 11 = filter method
    val ihdrCrc = new java.util.zip.CRC32
    ihdrCrc.update(badFilter, 12, 4 + 13)
    java.nio.ByteBuffer.wrap(badFilter).putInt(29, ihdrCrc.getValue.toInt)
    assertThrows[IllegalArgumentException](MediaCodec.decodePng(badFilter))
    assertThrows[IllegalArgumentException](MediaCodec.decodeApng(badFilter))
  }

  test("APNG composition: sub-region frame + dispose background, hand-built stream") {
    // gray 4x4 canvas: frame 0 = all 100 (full, dispose 1 = background),
    // frame 1 = 2x2 region of 200s at offset (1,1), dispose 0
    def chunk(kind: String, data: Array[Byte]): Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(12 + data.length)
      buf.putInt(data.length).put(kind.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32
      crc.update(kind.getBytes("US-ASCII")); crc.update(data)
      buf.putInt(crc.getValue.toInt).array()
    }
    def deflate(raw: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater(); d.setInput(raw); d.finish()
      val out = new java.io.ByteArrayOutputStream(); val tmp = new Array[Byte](4096)
      while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
      d.end(); out.toByteArray
    }
    def fctl(seq: Int, w: Int, h: Int, x: Int, y: Int, dispose: Int): Array[Byte] =
      java.nio.ByteBuffer.allocate(26).putInt(seq).putInt(w).putInt(h)
        .putInt(x).putInt(y).putShort(1).putShort(10)
        .put(dispose.toByte).put(0: Byte).array()
    def rawGray(w: Int, h: Int, v: Byte): Array[Byte] =
      Array.tabulate[Byte](h * (1 + w))(i => if (i % (1 + w) == 0) 0 else v)
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(4).putInt(4).put(8: Byte).put(0: Byte)
      .put(0: Byte).put(0: Byte).put(0: Byte).array()
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    val fdat1 = {
      val d = deflate(rawGray(2, 2, 200.toByte))
      java.nio.ByteBuffer.allocate(4 + d.length).putInt(2).put(d).array()
    }
    val bytes = sig ++ chunk("IHDR", ihdr) ++
      chunk("acTL", java.nio.ByteBuffer.allocate(8).putInt(2).putInt(0).array()) ++
      chunk("fcTL", fctl(0, 4, 4, 0, 0, dispose = 1)) ++
      chunk("IDAT", deflate(rawGray(4, 4, 100.toByte))) ++
      chunk("fcTL", fctl(1, 2, 2, 1, 1, dispose = 0)) ++
      chunk("fdAT", fdat1) ++
      chunk("IEND", Array.emptyByteArray)
    val anim = MediaCodec.decodeApng(bytes)
    assert(anim.channels == 1 && anim.frames.length == 2)
    assert(anim.frames(0).forall(b => (b & 0xff) == 100))
    // frame 1: dispose=background cleared frame 0's region (full canvas),
    // then the 2x2 region of 200s landed at (1,1)
    for (y <- 0 until 4; x <- 0 until 4) {
      val expect = if (x >= 1 && x <= 2 && y >= 1 && y <= 2) 200 else 0
      assert((anim.frames(1)(y * 4 + x) & 0xff) == expect, s"frame 1 pixel ($x,$y)")
    }
  }

  test("frameSample: real APNG frames where decodable, byte-window fallback otherwise") {
    import spark.implicits._
    val media = Multimodal.synthMedia(spark, sfDir)
    val out = Multimodal.frameSample(media, k = 4)
      .as[Multimodal.FrameRow].collect()
    val byCodec = out.groupBy(_.codec)
    assert(byCodec.keySet == Set("apng", "opaque"))
    // fallback rows: exactly k per media
    val perOpaque = byCodec("opaque").groupBy(_.media_id).values.map(_.length)
    assert(perOpaque.forall(_ == 4))
    // apng rows: real frame indices, evenly sampled over the decoded count
    val apng = byCodec("apng")
    assert(apng.nonEmpty)
    assert(apng.forall(r => r.n_frames >= 2 && r.n_frames <= 7))
    assert(apng.forall(r => r.frame_idx >= 0 && r.frame_idx < r.n_frames))
    val perApng = apng.groupBy(_.media_id)
    assert(perApng.values.forall(rs =>
      rs.length == (0 until 4).map(j => j * rs.head.n_frames / 4).distinct.length))
    // hashes match a direct decode of that media row's payload
    val one = perApng.head
    val bytes = media.filter(col("media_id") === one._1)
      .head().getAs[Array[Byte]]("bytes")
    val anim = MediaCodec.decodeApng(bytes)
    one._2.foreach { r =>
      assert(r.frame_hash == graft.spider.core.Hash64.bytes(anim.frames(r.frame_idx)))
    }
    // deterministic across runs
    val again = Multimodal.frameSample(media, k = 4)
      .as[Multimodal.FrameRow].collect()
    assert(out.map(r => (r.media_id, r.frame_idx, r.frame_hash)).sorted
      .sameElements(again.map(r => (r.media_id, r.frame_idx, r.frame_hash)).sorted))
  }
}
