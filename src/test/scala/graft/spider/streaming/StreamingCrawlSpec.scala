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

  test("discovery loop: k waves ≡ k-step batch BFS closure of the seeds") {
    import graft.spider.expr.SpiderFunctions._
    val work = Files.createTempDirectory("graft-loop-").toString
    val corpus = PagesSynth.pages(spark, sfDir).persist()
    corpus.count()

    // seed the loop: drop the first 10 pages as "already fetched"
    val seeds = corpus.orderBy("url").limit(10)
    seeds.write.mode("overwrite").parquet(s"$work/fetched")

    val waves = 3
    val fetched = StreamingCrawl.discoveryLoop(spark, corpus, work, waves)
      .select("url").collect().map(_.getString(0)).toSet

    // batch BFS with the same per-wave semantics (outlinks of everything
    // fetched so far, joined against the closed corpus)
    var batch = seeds.select("url")
    for (_ <- 1 to waves) {
      val next = batch.join(corpus, Seq("url"))
        .select(explode(extract_outlinks(col("html"))).as("raw_url"))
        .select(url_canonicalize(col("raw_url")).as("url"))
        .join(corpus.select("url"), Seq("url"), "left_semi")
      batch = batch.unionByName(next).distinct()
    }
    val want = batch.collect().map(_.getString(0)).toSet
    assert(fetched == want,
      s"streaming=${fetched.size} batch=${want.size}; " +
        s"missing=${(want -- fetched).take(3)} extra=${(fetched -- want).take(3)}")
    assert(fetched.size > 10, "loop must actually discover beyond the seeds")
    corpus.unpersist()
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
