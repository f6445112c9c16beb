package graft.datapipe

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.spider.core.Hash64

/** Multimodal columns: image/audio/video as opaque `binary` with typed
  * metadata, plus the decode / feature-extract plumbing a training-data
  * pipeline needs.
  *
  * The actual media decode is STUBBED (no image/audio codecs ship in this
  * container): `decodeStub` produces a deterministic fake feature vector
  * from the bytes. Everything AROUND the stub is real and load-bearing —
  * the schema, the binary column handling, the batched per-partition
  * execution shape (mirroring an Arrow-batched UDF: rows are processed in
  * fixed-size batches so a real decoder could amortize model/codec setup
  * per batch), and the partitioning.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
      width: Int, height: Int, duration_ms: Long, mime: String)

  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
      feature: Array[Float])

  /** Deterministic synthetic media table derived from documents: binary
    * payload + typed metadata columns. */
  def synthMedia(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.select(
      col("doc_id").as("media_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (pmod(xxhash64(col("doc_id").cast("string")), lit(3L)) + 1).cast("int")).as("kind"),
      // payload: repeated text bytes, truncated — stands in for encoded media
      substring(encode(repeat(col("text"), 3), "UTF-8"), 1, 4096).as("bytes"),
      (pmod(xxhash64(concat(col("doc_id").cast("string"), lit("w"))), lit(1024L)) + 256)
        .cast("int").as("width"),
      (pmod(xxhash64(concat(col("doc_id").cast("string"), lit("h"))), lit(768L)) + 256)
        .cast("int").as("height"),
      (pmod(xxhash64(concat(col("doc_id").cast("string"), lit("d"))), lit(60000L)))
        .as("duration_ms"),
      lit("application/octet-stream").as("mime"))
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

  /** Batched feature extraction over the binary column. Runs per-partition
    * in fixed-size batches — the execution shape of `mapInPandas`/Arrow UDFs
    * — so a real decoder can hold codec/model state per batch. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch setup would go here (decoder/model init)
        batch.iterator.map { r =>
          MediaFeatures(r.media_id, r.kind, r.bytes.length, decodeStub(r.bytes, dim))
        }
      }
    }
  }

  /** Frame-sample stub: pick k deterministic offsets into the payload
    * (stands in for video frame sampling); returns (media_id, frame_idx,
    * frame_hash). Pure DataFrame plan around a tiny per-row kernel. */
  def frameSample(media: DataFrame, k: Int = 4): DataFrame = {
    media.select(col("media_id"), col("bytes"),
        posexplode(transform(sequence(lit(0), lit(k - 1)),
          i => pmod(xxhash64(concat(col("media_id").cast("string"), i.cast("string"))),
            greatest(octet_length(col("bytes")).cast("long"), lit(1L))))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumn("frame_hash", xxhash64(substring(col("bytes"),
        (col("col") + 1).cast("int"), lit(64))))
      .select("media_id", "frame_idx", "frame_hash")
  }

  private def pmod(c: org.apache.spark.sql.Column, m: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.pmod(c, m)
}
