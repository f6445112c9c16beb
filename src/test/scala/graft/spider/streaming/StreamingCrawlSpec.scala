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

  test("fused frontier+politeness GroupState loop ≡ batch rounds (ordering, ranks, residuals)") {
    import spark.implicits._
    import graft.spider.core.{CrawlConfig, RobotsRule}
    import graft.spider.CrawlDriver

    val pages = PagesSynth.pages(spark, sfDir).persist()
    pages.count()
    // uniform politeness so both sides compute the same per-host budget:
    // roundLen 3000 / delay 1000 → budget 3, matching the batch default for
    // hosts without a robots row
    val delayMs = 1000L
    val cfg = CrawlConfig(rounds = 3, roundLenMs = 3000L)
    val budget = (cfg.roundLenMs / delayMs).toInt
    val seeds = PagesSynth.seeds(spark, sfDir, cfg)
    val allHosts = pages
      .select(graft.spider.expr.SpiderFunctions.url_host(col("url")).as("host"))
      .distinct().as[String].collect()
    val robots = spark.createDataset(
      allHosts.toSeq.map(h => RobotsRule(h, Seq.empty, delayMs)))

    val batchCatalog = CrawlDriver.run(spark, pages, seeds, robots, cfg,
      Files.createTempDirectory("graft-fused-batch-").toString)
    val batchTuples = batchCatalog.readCrawled(cfg.rounds)
      .select(col("round").cast("long"), col("host"), col("rank_in_host"), col("url"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3)))
      .toSet

    val work = Files.createTempDirectory("graft-fused-").toString
    val admitted = StreamingCrawl.fusedLoop(spark, pages, work, seeds.toDF(),
      budget, delayMs, waves = cfg.rounds)
    // batch `crawled` excludes dequeued-but-missing urls; admissions include
    // them (budget consumed either way, both engines) — restrict the same way
    val streamTuples = admitted
      .join(pages.select("url"), Seq("url"), "left_semi")
      .select(col("wave"), col("host"), col("rank_in_host"), col("url"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3)))
      .toSet

    assert(streamTuples == batchTuples,
      s"stream=${streamTuples.size} batch=${batchTuples.size}; " +
        s"missing=${(batchTuples -- streamTuples).take(3)} " +
        s"extra=${(streamTuples -- batchTuples).take(3)}")
    // politeness invariant on the streaming side: per (host, wave) ≤ budget,
    // admission clocks strictly delay-spaced per host
    val perHostWave = admitted.groupBy("host", "wave").count()
      .agg(max("count")).head().getLong(0)
    assert(perHostWave <= budget)
    val badSpacing = admitted.select("host", "sched_ms").collect()
      .groupBy(_.getString(0)).values.map { rows =>
        val ts = rows.map(_.getLong(1)).sorted
        ts.zip(ts.drop(1)).count { case (a, b) => b - a < delayMs }
      }.sum
    assert(badSpacing == 0, "politeness clock must space admissions by the delay")

    // BOUNDED state (VERDICT r3 task #4): with maxPending = 0 NOTHING stays
    // in the per-host state beyond the politeness clock — every residual
    // cycles through the spill/re-queue path every wave — and the admitted
    // tuples must still replicate the batch rounds exactly (spilled rows
    // preserve their dequeue-order key).
    val workCap = Files.createTempDirectory("graft-fused-cap-").toString
    val admittedCap = StreamingCrawl.fusedLoop(spark, pages, workCap,
      seeds.toDF(), budget, delayMs, waves = cfg.rounds, maxPending = 0)
    val capTuples = admittedCap
      .join(pages.select("url"), Seq("url"), "left_semi")
      .select(col("wave"), col("host"), col("rank_in_host"), col("url"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3)))
      .toSet
    assert(capTuples == batchTuples,
      s"cap=0 stream=${capTuples.size} batch=${batchTuples.size}; " +
        s"missing=${(batchTuples -- capTuples).take(3)} " +
        s"extra=${(capTuples -- batchTuples).take(3)}")
    // the spill path must actually have carried rows (the cap was binding)
    val spilled = spark.read.parquet(s"$workCap/requeue").count()
    assert(spilled > 0, "maxPending=0 must route residuals through the re-queue dir")
    pages.unpersist()
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
