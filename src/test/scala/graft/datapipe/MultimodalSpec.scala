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
          assert(f.codec == "bmp")
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
          assert(f.codec == "opaque" && f.decoded_w == -1 && f.n_samples == -1L)
      }
    }
  }

  test("frameSample: k frames per media, deterministic offsets") {
    val out = Multimodal.frameSample(Multimodal.synthMedia(spark, sfDir), k = 4)
    assert(out.count() == 2000)
    val per = out.groupBy("media_id").count().agg(min("count"), max("count")).head()
    assert(per.getLong(0) == 4 && per.getLong(1) == 4)
  }
}
