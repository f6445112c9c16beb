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

  test("frameSample: k frames per media, deterministic offsets") {
    val out = Multimodal.frameSample(Multimodal.synthMedia(spark, sfDir), k = 4)
    assert(out.count() == 2000)
    val per = out.groupBy("media_id").count().agg(min("count"), max("count")).head()
    assert(per.getLong(0) == 4 && per.getLong(1) == 4)
  }
}
