package graft.spider.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.spider.SparkTestBase
import graft.spider.synth.PagesSynth

class StreamingCrawlSpec extends AnyFunSuite with SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("streaming ingest ≡ batch: dedup + extraction over the same drop") {
    val dropDir = Files.createTempDirectory("graft-stream-in-").toString
    val ckpt = Files.createTempDirectory("graft-stream-ck-").toString
    val outDir = Files.createTempDirectory("graft-stream-out-").toString

    // one "drop" of pages, with duplicates injected
    val pages = PagesSynth.pages(spark, sfDir)
    pages.unionByName(pages.limit(50)).write.mode("overwrite").parquet(dropDir)

    val q = StreamingCrawl.ingest(spark, dropDir, ckpt, outDir)
    q.awaitTermination(120000)

    val got = spark.read.parquet(outDir)
    assert(got.count() == 500) // dups dropped
    // extraction in the streaming plan matches the batch invariant
    val joined = got.select(col("url"), col("text").as("stream_text"))
      .join(pages.select(col("url"), col("text")), Seq("url"))
    assert(joined.filter(col("stream_text") =!= col("text")).count() == 0)
  }

  test("politeness clock state: admissions spaced by crawl delay per host") {
    import spark.implicits._
    val events = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[StreamingCrawl.FetchEvent](
      spark, 1)
    events.addData(
      StreamingCrawl.FetchEvent("h1", "u1", 1000L),
      StreamingCrawl.FetchEvent("h1", "u2", 1000L),
      StreamingCrawl.FetchEvent("h1", "u3", 1400L),
      StreamingCrawl.FetchEvent("h2", "u4", 1000L))
    val out = StreamingCrawl.politenessClock(events.toDS(), delayMs = 500L)
    val q = out.writeStream.format("memory").queryName("admissions")
      .outputMode("append").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val rows = spark.table("admissions").as[StreamingCrawl.Admission]
      .collect().sortBy(a => (a.host, a.scheduled_ms))
    val h1 = rows.filter(_.host == "h1").map(_.scheduled_ms).toSeq
    assert(h1 == Seq(1000L, 1500L, 2000L)) // clock pushes u2/u3 back
    assert(rows.filter(_.host == "h2").map(_.scheduled_ms).toSeq == Seq(1000L))
    assert(rows.filter(_.host == "h1").map(_.fetched_total).max == 3L)
  }
}
