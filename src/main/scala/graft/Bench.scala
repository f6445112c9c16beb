package graft
import org.apache.spark.sql.SparkSession

import graft.spider.CrawlDriver
import graft.spider.core.CrawlConfig
import graft.spider.state.CrawlCatalog

/** Driver-run benchmark: times every SparkEntry query, then measures the
  * headline crawl throughput (urls fetched+extracted / sec) on a host-spread
  * replicated corpus. Prints ONE JSON line.
  *
  * SELF-ATTRIBUTING (VERDICT r3 task #3): the machine this runs on has
  * measured multi-× phase swings (co-tenant drift — BENCH/BASELINE.md), so a
  * bench number without a validity signal cannot be compared across rounds.
  * The JSON therefore carries `probe_gibs` — the ScalingBench memory-
  * bandwidth microprobe run before, between, and after the timed sections,
  * at a FIXED configuration (4 threads × 512 MiB × 3 passes, independent of
  * SPARK_GRAFT_CPUS) so the readings are comparable across rounds — plus
  * `phases` wall-clock stamps per section. A reader can then phase-normalize
  * or discard a drifted run without rerunning it: a probe reading far below
  * the campaign norm (~10 GiB/s solo on this box at 4 threads) marks the
  * surrounding section as machine-phase-suspect, not engine truth. */
object Bench {

  private def probe(): Double =
    graft.spider.tools.ScalingBench.bandwidthProbe(
      threads = 4, mibPerThread = 512, passes = 3)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val replicate = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPLICATE", "10").toInt
    val wall0 = System.currentTimeMillis()
    val probePre = probe()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", math.max(32, cpus.toInt * 2).toString)
      // plan-description strings for listener events are built eagerly per
      // action and cost driver seconds on nested cached plans — truncate
      .config("spark.sql.maxPlanStringLength", "8192")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .config("spark.driver.bindAddress", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Shared fixtures (synth pages cache + the one shared crawl catalog)
    // are built OUTSIDE the timed region: per-query numbers then measure
    // each operator's own plan; crawl cost is measured by the headline
    // crawl bench below.
    val tPrewarm0 = System.nanoTime()
    graft.queries.Demos.prewarm(spark, sfDir)
    val prewarmSecs = (System.nanoTime() - tPrewarm0) / 1e9

    // TWO full sweeps, per-query time = min of the two. This box stalls in
    // minute-scale phases (measured 2026-08-21: one run's alphabetical
    // window e..m inflated 6-9× while probes before/after read normal, the
    // next run was uniformly fast) — a single-shot sweep can tar a
    // contiguous block of queries with one stall. The min of two sweeps
    // taken minutes apart is robust to any stall shorter than a sweep;
    // both raw sweeps are reported alongside for transparency
    // (`queries_rep1/2`), so a reader can reconstruct the single-shot view.
    val tQueries0 = System.nanoTime()
    def sweep(): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        name -> (System.nanoTime() - t0) / 1e9
      }
    val rep1 = sweep()
    // drop the LSH state the minhash/simhash queries persisted, so sweep 2
    // measures the same COLD build as sweep 1 (without this the CacheManager
    // serves sweep 2 the sweep-1 signatures and min-of-2 reports a warm
    // number for those two queries); everything else cleans up after itself
    graft.datapipe.Dedup.releaseLshState()
    val rep2 = sweep()
    val results = rep1.zip(rep2).map { case ((n, a), (_, b)) => n -> math.min(a, b) }
    val queriesSecs = (System.nanoTime() - tQueries0) / 1e9
    val probeMid = probe()

    // headline: multi-round crawl throughput on a host-spread corpus
    // (replicate×20 hosts, generous politeness budgets so compute dominates).
    // Run as a same-JVM A/B over the fetch-join strategy so the two numbers
    // are attributable (VERDICT r2 "wrong" #4): `crawl` = always-shuffled-
    // hash fetch join (the only strategy that exists at a 10^10-URL
    // frontier — the headline); `crawl_bcast` = broadcast fetch join (the
    // sandbox-scale-fast variant, reported for the delta only).
    def crawlOnce(key: String, fetchBroadcastMax: Long): String =
      try {
        val state = java.nio.file.Files.createTempDirectory("graft-bench-crawl-").toString
        val cfg = CrawlConfig(rounds = 3, roundLenMs = 60000L, nSeeds = 1000,
          fetchBroadcastMax = fetchBroadcastMax)
        val t0 = System.nanoTime()
        CrawlDriver.crawlFromSf(spark, sfDir, cfg, state, replicate, spreadHosts = true)
        val secs = (System.nanoTime() - t0) / 1e9
        val catalog = new CrawlCatalog(state, spark)
        val fetched = (1 to cfg.rounds).map(r => catalog.countersOf(r).fetched).sum
        f""""$key":{"fetched":$fetched,"rounds":${cfg.rounds},"secs":$secs%.2f,"urls_per_sec":${fetched / secs}%.1f},"""
      } catch { case e: Throwable =>
        s""""$key":{"error":"${e.getClass.getSimpleName}"},"""
      }
    val tCrawl0 = System.nanoTime()
    val crawlJson = crawlOnce("crawl", 0L) + crawlOnce("crawl_bcast", Long.MaxValue)
    val crawlSecs = (System.nanoTime() - tCrawl0) / 1e9
    val probePost = probe()

    def qjson(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qs = qjson(results)
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val attribution =
      f""""probe_gibs":{"pre":$probePre%.2f,"mid":$probeMid%.2f,"post":$probePost%.2f},""" +
        f""""phases":{"wall_start_ms":$wall0,"prewarm":$prewarmSecs%.1f,""" +
        f""""queries":$queriesSecs%.1f,"crawl":$crawlSecs%.1f},""" +
        s""""reps":2,"queries_rep1":${qjson(rep1)},"queries_rep2":${qjson(rep2)},"""
    println(s"""{"metric":"total","value":$total,"unit":"sec",$attribution$crawlJson"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
