package graft.datapipe

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.spider.core.Hash64

/** Multimodal columns: image/audio/video as opaque `binary` with typed
  * metadata, plus the decode / feature-extract plumbing a training-data
  * pipeline needs.
  *
  * Decode is REAL for the container formats a pure JVM can parse — BMP
  * (24-bit), PNG (8-bit gray/RGB/RGBA via java.util.zip.Inflater), animated
  * PNG (frame sampling) and WAV (PCM16), see [[MediaCodec]] — with decoded
  * dimensions / sample counts surfaced in the output and features computed
  * from actual pixels / samples. Remaining compressed formats
  * (JPEG/MP3/H.264) stay behind the deterministic `decodeStub` (their
  * codecs do not ship in this container), clearly tagged `codec = "opaque"`. Everything around the
  * dispatch is the same load-bearing scaffold either way — the schema, the
  * binary column handling, the batched per-partition execution shape
  * (mirroring an Arrow-batched UDF: rows are processed in fixed-size
  * batches so a heavyweight decoder could amortize codec/model setup per
  * batch), and the partitioning.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
      width: Int, height: Int, duration_ms: Long, mime: String)

  /** `codec` ∈ bmp|png|wav|opaque; decoded_w/decoded_h (images) and
    * n_samples (audio) are -1 where not applicable. */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
      feature: Array[Float], codec: String, decoded_w: Int, decoded_h: Int,
      n_samples: Long)

  /** Deterministic synthetic media table derived from documents: binary
    * payload + typed metadata columns. Image rows carry REAL 24-bit BMP or
    * PNG bytes, audio rows REAL PCM16 WAV bytes, and half the video rows
    * REAL animated-PNG bytes (synthesized via [[MediaCodec]], pixel/sample
    * content a pure function of doc_id), so decode AND frame-sampling
    * downstream are exercised end-to-end; the other video rows keep an
    * opaque payload (the declared stub path for codecs outside the JVM). */
  def synthMedia(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), substring(col("text"), 1, 512).as("text"))
    // r6: the synthesis/decode kernels are CPU-heavy per row while the
    // documents file at sandbox scale is under the 4 MB openCost floor —
    // ONE scan split would serialize the codec work. Widen only when the
    // scan is narrower than the session parallelism (a no-op at production
    // scale, where scans carry plenty of splits); the shuffle moved is the
    // truncated (doc_id, text≤512) projection, not media bytes.
    val par = spark.sparkContext.defaultParallelism
    val docs = (if (docs0.rdd.getNumPartitions < par) docs0.repartition(par)
                else docs0).as[(Long, String)]
    docs.map { case (id, text) => synthMediaRow(id, text) }.toDF()
  }

  /** First 512 Unicode codepoints — the same truncation Spark's
    * `substring(text, 1, 512)` applies in [[synthMedia]], for a sequential
    * replay that starts from the raw document text. */
  def truncate512(text: String): String =
    text.substring(0,
      text.offsetByCodePoints(0, math.min(512, text.codePointCount(0, text.length))))

  /** The per-document media synthesis kernel — one implementation, shared
    * by the distributed [[synthMedia]] map and the sequential oracle replay
    * that materializes the multimodal expected fixtures (Demos), so the
    * driver's DuckDB compare checks the distributed execution against a
    * single-threaded one. `text` must already be 512-codepoint-truncated
    * ([[truncate512]]). */
  def synthMediaRow(id: Long, text: String): MediaRow = {
      val h = Hash64.string(s"media-$id")
      val kind = Hash64.pmod(h, 3L) match {
        case 0L => "image"
        case 1L => "audio"
        case _  => "video"
      }
      kind match {
        case "image" =>
          val w = (Hash64.pmod(Hash64.string(s"$id-w"), 24L) + 8).toInt
          val hh = (Hash64.pmod(Hash64.string(s"$id-h"), 24L) + 8).toInt
          def px(x: Int, y: Int): (Int, Int, Int) = {
            val p = Hash64.string(s"$id:$x:$y")
            (((p >>> 16) & 0xff).toInt, ((p >>> 8) & 0xff).toInt, (p & 0xff).toInt)
          }
          // alternate containers by id hash: half BMP, half PNG — both real
          // decode paths downstream (same pixel function either way)
          if (Hash64.pmod(Hash64.string(s"$id-c"), 2L) == 0L)
            MediaRow(id, kind, MediaCodec.encodeBmp(w, hh, px), w, hh, -1L, "image/bmp")
          else
            MediaRow(id, kind, MediaCodec.encodePng(w, hh, px), w, hh, -1L, "image/png")
        case "audio" =>
          val rate = 8000
          val n = (Hash64.pmod(Hash64.string(s"$id-n"), 4000L) + 1000).toInt
          val samples = Array.tabulate(n) { i =>
            (Hash64.string(s"$id~$i") & 0xffffL).toShort
          }
          val bytes = MediaCodec.encodeWav(rate, 1, samples)
          MediaRow(id, kind, bytes, -1, -1, n * 1000L / rate, "audio/wav")
        case _ =>
          // video: half the rows carry a REAL animated-PNG payload (the one
          // video-shaped container a pure JVM decodes — frame sampling
          // downstream is a real decode path); the other half keep the
          // opaque payload standing in for compressed codecs (stub path)
          if (Hash64.pmod(Hash64.string(s"$id-c"), 2L) == 0L) {
            val w = (Hash64.pmod(Hash64.string(s"$id-w"), 12L) + 6).toInt
            val hh = (Hash64.pmod(Hash64.string(s"$id-h"), 12L) + 6).toInt
            val nf = (Hash64.pmod(Hash64.string(s"$id-f"), 6L) + 2).toInt
            def px(f: Int, x: Int, y: Int): (Int, Int, Int) = {
              val p = Hash64.string(s"$id:$f:$x:$y")
              (((p >>> 16) & 0xff).toInt, ((p >>> 8) & 0xff).toInt, (p & 0xff).toInt)
            }
            MediaRow(id, kind, MediaCodec.encodeApng(w, hh, nf, px),
              w, hh, nf * 100L, "image/apng")
          } else {
            val bytes = (text * 3).getBytes("UTF-8").take(4096)
            MediaRow(id, kind, bytes,
              (Hash64.pmod(Hash64.string(s"$id-w"), 1024L) + 256).toInt,
              (Hash64.pmod(Hash64.string(s"$id-h"), 768L) + 256).toInt,
              Hash64.pmod(Hash64.string(s"$id-d"), 60000L),
              "application/octet-stream")
          }
      }
  }

  /** STUB decoder: a real implementation would decode the image/audio bytes
    * (e.g. via javax.imageio / an ONNX feature extractor) — not available in
    * this container. This fake is deterministic in the bytes so tests and
    * benchmarks are stable, and has the same cost shape (touches every
    * byte). */
  private[datapipe] def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 0x9e3779b97f4a7c15L
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L
      out(i % dim) += ((h >>> 40) & 0xff).toFloat / 255f
      i += 1
    }
    out
  }

  /** Image features from decoded pixels: per-channel means (R,G,B) then a
    * luminance histogram over the remaining dims. */
  private[datapipe] def bmpFeatures(img: MediaCodec.Bmp, dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    val n = img.width * img.height
    var sb = 0L; var sg = 0L; var sr = 0L
    val bins = math.max(1, dim - 3)
    var i = 0
    while (i < n) {
      val b = img.pixels(i * 3) & 0xff
      val g = img.pixels(i * 3 + 1) & 0xff
      val r = img.pixels(i * 3 + 2) & 0xff
      sb += b; sg += g; sr += r
      val lum = (r * 299 + g * 587 + b * 114) / 1000 // 0..255
      if (dim > 3) out(3 + lum * bins / 256) += 1f
      i += 1
    }
    if (dim > 0) out(0) = sr.toFloat / n / 255f
    if (dim > 1) out(1) = sg.toFloat / n / 255f
    if (dim > 2) out(2) = sb.toFloat / n / 255f
    var j = 3
    while (j < dim) { out(j) /= n; j += 1 }
    out
  }

  /** PNG features: reorder decoded RGB(A) samples to the BMP channel layout
    * (B,G,R; alpha dropped, gray broadcast) and reuse [[bmpFeatures]] — one
    * feature semantics across image containers. */
  private[datapipe] def pngFeatures(png: MediaCodec.Png, dim: Int): Array[Float] = {
    val n = png.width * png.height
    val bgr = new Array[Byte](n * 3)
    var i = 0
    while (i < n) {
      val base = i * png.channels
      val (r, g, b) = png.channels match {
        case 1 => val v = png.pixels(base); (v, v, v)
        case _ => (png.pixels(base), png.pixels(base + 1), png.pixels(base + 2))
      }
      bgr(i * 3) = b; bgr(i * 3 + 1) = g; bgr(i * 3 + 2) = r
      i += 1
    }
    bmpFeatures(MediaCodec.Bmp(png.width, png.height, bgr), dim)
  }

  /** Audio features from decoded samples: RMS, zero-crossing rate, then a
    * mean-|amplitude| envelope over the remaining dims. */
  private[datapipe] def wavFeatures(wav: MediaCodec.Wav, dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    val s = wav.samples
    if (s.isEmpty) return out
    var sq = 0.0; var zc = 0
    var i = 0
    while (i < s.length) {
      sq += s(i).toDouble * s(i)
      if (i > 0 && ((s(i) >= 0) != (s(i - 1) >= 0))) zc += 1
      i += 1
    }
    if (dim > 0) out(0) = (math.sqrt(sq / s.length) / 32768.0).toFloat
    if (dim > 1) out(1) = zc.toFloat / s.length
    if (dim > 2) { // envelope only fits when dims remain (mirrors bmpFeatures)
      val env = dim - 2
      i = 0
      while (i < s.length) {
        out(2 + i * env / s.length) += math.abs(s(i).toInt).toFloat
        i += 1
      }
      var j = 2
      while (j < dim) { out(j) /= (s.length.toFloat / env) * 32768f; j += 1 }
    }
    out
  }

  /** Batched feature extraction over the binary column. Runs per-partition
    * in fixed-size batches — the execution shape of `mapInPandas`/Arrow UDFs
    * — so a heavyweight decoder can hold codec/model state per batch. BMP
    * and WAV payloads are decoded for real ([[MediaCodec]]); anything else
    * takes the deterministic stub path tagged `opaque`. */
  /** The per-row decode/feature kernel — shared by the distributed
    * [[extractFeatures]] and the sequential oracle replay (see
    * [[synthMediaRow]]). */
  def featuresOf(r: MediaRow, dim: Int = 16): MediaFeatures =
    MediaCodec.sniff(r.bytes) match {
      case MediaCodec.IsBmp =>
        val img = MediaCodec.decodeBmp(r.bytes)
        MediaFeatures(r.media_id, r.kind, r.bytes.length,
          bmpFeatures(img, dim), "bmp", img.width, img.height, -1L)
      case MediaCodec.IsPng =>
        val png = MediaCodec.decodePng(r.bytes)
        MediaFeatures(r.media_id, r.kind, r.bytes.length,
          pngFeatures(png, dim), "png", png.width, png.height, -1L)
      case MediaCodec.IsWav =>
        val wav = MediaCodec.decodeWav(r.bytes)
        MediaFeatures(r.media_id, r.kind, r.bytes.length,
          wavFeatures(wav, dim), "wav", -1, -1, wav.samples.length.toLong)
      case MediaCodec.Opaque =>
        MediaFeatures(r.media_id, r.kind, r.bytes.length,
          decodeStub(r.bytes, dim), "opaque", -1, -1, -1L)
    }

  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch setup would go here (decoder/model init)
        batch.iterator.map(featuresOf(_, dim))
      }
    }
  }

  /** One sampled frame. For a decodable animation (`codec = "apng"`)
    * `frame_idx` is the real frame index, `frame_hash` hashes the composed
    * full-canvas pixels of that frame and `n_frames` the decoded frame
    * count. For undecodable payloads (`codec = "opaque"`) the row falls
    * back to the deterministic byte-window fallback (k pseudo-frames,
    * `n_frames = -1`) so every media row still yields sample rows. */
  case class FrameRow(media_id: Long, frame_idx: Int, frame_hash: Long,
      codec: String, n_frames: Int)

  /** Frame sampling over the binary column: decode the animation and take
    * (up to) k frames evenly spaced over its real frame sequence. REAL for
    * animated PNG via [[MediaCodec.decodeApng]]; other containers (H.264
    * etc. — codecs not in this container) take the declared byte-window
    * fallback, tagged `opaque`. Batched per-partition kernel — the same
    * Arrow-UDF execution shape as [[extractFeatures]]; a distributed
    * per-row map, no shuffle. */
  /** The per-row frame-sampling kernel — shared by the distributed
    * [[frameSample]] and the sequential oracle replay (see
    * [[synthMediaRow]]). */
  def framesOf(id: Long, bytes: Array[Byte], k: Int = 4): Seq[FrameRow] =
    if (MediaCodec.isApng(bytes)) {
      val anim = MediaCodec.decodeApng(bytes)
      val n = anim.frames.length
      // evenly spaced over the real frame sequence; distinct keeps
      // short animations (n < k) from duplicating frames
      (0 until k).map(j => j * n / k).distinct.map { f =>
        FrameRow(id, f, Hash64.bytes(anim.frames(f)), "apng", n)
      }
    } else {
      // fallback: k deterministic 64-byte windows into the payload
      val len = math.max(1, bytes.length)
      (0 until k).map { j =>
        val off = Hash64.pmod(Hash64.string(s"$id$j"), len.toLong).toInt
        val win = java.util.Arrays.copyOfRange(bytes, off,
          math.min(bytes.length, off + 64))
        FrameRow(id, j, Hash64.bytes(win), "opaque", -1)
      }
    }

  def frameSample(media: DataFrame, k: Int = 4, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("bytes")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // per-batch setup would go here (decoder init)
          batch.iterator.flatMap { case (id, bytes) => framesOf(id, bytes, k) }
        }
      }.toDF()
  }
}
