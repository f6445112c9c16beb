package graft.spider.tools

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.spider.{CrawlDriver, CrawlEngine}
import graft.spider.core.CrawlConfig
import graft.spider.sketch.Sketches
import graft.spider.state.CrawlCatalog
import graft.spider.synth.PagesSynth

/** Dump the ENGINE round plans (not just demo queries): the flipped seen
  * probe and the cutoff-pruned dequeue, as `.explain("formatted")` output.
  * The audit criteria (BENCH/PLANS.md):
  *   - seen probe: the seen scan feeds the semi join with NO Exchange above
  *     it (the only exchanges in the plan belong to the candidate side);
  *     ReadSchema on the seen scan is url_hash only (+ the bucket partition
  *     column — not materialized in the files).
  *   - dequeue: exactly ONE full-row Exchange (hashpartitioning(host)) under
  *     the rank window; the cutoff filter sits below it.
  *
  *   runMain graft.spider.tools.RoundPlanAudit <sfDir> <outFile>
  */
object RoundPlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outFile = if (args.length > 1) args(1) else "/tmp/round-plans.md"

    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .config("spark.driver.bindAddress", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val cfg = CrawlConfig(rounds = 2)
    val state = java.nio.file.Files.createTempDirectory("graft-audit-").toString
    CrawlDriver.crawlFromSf(spark, sfDir, cfg, state)
    val catalog = new CrawlCatalog(state, spark)

    def fmt(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

    val sb = new StringBuilder
    sb.append(s"# Engine round plans (sf=$sfDir, after a 2-round crawl)\n\n")

    // ---- flipped seen probe over the committed (bucketed) seen history ----
    val seen = catalog.readSeenBucketed(2)
    // candidate stand-in = a plain parquet scan, so the probe-side plan
    // stays readable (a real round's cand comes from the cached extract)
    val cand = catalog.readFrontier(2)
      .select(col("url"), col("url_hash"), col("host"), col("warc_ts"))
    val bloomBc = catalog.readBloom(2).map(b =>
      spark.sparkContext.broadcast(Sketches.shardedFrom(b)))
    val flagged = CrawlEngine.flagAgainstSeen(cand,
      CrawlEngine.SeenInput.plain(seen), bloomBc, cfg, flip = true)
    sb.append("## seen probe (flipped, bloom-sharded prefilter)\n\n```\n")
    sb.append(fmt(flagged)).append("\n```\n\n")

    // ---- classic fallback via the DSv2 bucket-reporting reader ----
    // audit: storage-partitioned join — BatchScan(icelite seen) feeds the
    // join with NO Exchange above it; the only exchange in the plan belongs
    // to the candidate side (shuffled into the bucket grouping).
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
    val seenV2 = catalog.readSeenV2(2, cfg.seenBuckets)
    val flaggedClassic = CrawlEngine.flagAgainstSeen(cand,
      CrawlEngine.SeenInput(seen, Some(seenV2), None), bloomBc = None, cfg, flip = false)
    sb.append("## seen probe (classic fallback, DSv2 storage-partitioned join)\n\n```\n")
    sb.append(fmt(flaggedClassic)).append("\n```\n\n")

    // ---- cutoff-pruned dequeue over the committed frontier ----
    val frontier = catalog.readFrontier(2)
    val robots = PagesSynth.robots(spark, sfDir).toDF()
    val gated = frontier
      .join(broadcast(robots), Seq("host"), "left_outer")
      .withColumn("crawl_delay_ms", coalesce(col("crawl_delay_ms"), lit(1000L)))
      .withColumn("allowed", coalesce(
        graft.spider.expr.SpiderFunctions.robots_allows(
          col("url"), col("disallow_prefixes")), lit(true)))
    val eligible = gated.filter(col("allowed"))
      .withColumn("budget", greatest(lit(1L),
        floor(lit(cfg.roundLenMs) / col("crawl_delay_ms"))))
    val hb = eligible.groupBy("host", "priority")
      .agg(count(lit(1)).as("n"), first(col("budget")).as("budget"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy("host").orderBy(col("priority").desc)
      .rowsBetween(Long.MinValue, -1)
    val cutoffs = hb
      .withColumn("higher_cum", coalesce(sum(col("n")).over(wCum), lit(0L)))
      .filter(col("higher_cum") < col("budget"))
      .groupBy("host").agg(min("priority").as("prio_cutoff"))
    val ranked = CrawlEngine.rankPerHost(
      eligible.join(broadcast(cutoffs), Seq("host"))
        .filter(col("priority") >= col("prio_cutoff")).drop("prio_cutoff"), cfg)
    sb.append("## dequeue (cutoff-pruned rank window)\n\n```\n")
    sb.append(fmt(ranked.filter(col("rank_in_host") <= col("budget")))).append("\n```\n\n")

    // ---- dequeue with the PARTITIONED robots gate (robots too big to
    // broadcast at design scale) ----
    // audit: the robots shuffle-join introduces hashpartitioning(host),
    // which is exactly the rank window's required distribution — the plan
    // must NOT contain a second full-frontier host exchange above the join.
    // (auto-broadcast off: at sf0.001 AQE would re-broadcast the tiny
    // robots table and hide the at-scale plan under audit)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val gatedPart = frontier
      .join(robots, Seq("host"), "left_outer")
      .withColumn("crawl_delay_ms", coalesce(col("crawl_delay_ms"), lit(1000L)))
      .withColumn("allowed", coalesce(
        graft.spider.expr.SpiderFunctions.robots_allows(
          col("url"), col("disallow_prefixes")), lit(true)))
    val eligiblePart = gatedPart.filter(col("allowed"))
      .withColumn("budget", greatest(lit(1L),
        floor(lit(cfg.roundLenMs) / col("crawl_delay_ms"))))
    val rankedPart = CrawlEngine.rankPerHost(
      eligiblePart.join(broadcast(cutoffs), Seq("host"))
        .filter(col("priority") >= col("prio_cutoff")).drop("prio_cutoff"), cfg)
    sb.append("## dequeue (partitioned robots gate — host exchange reused by the window)\n\n```\n")
    sb.append(fmt(rankedPart.filter(col("rank_in_host") <= col("budget")))).append("\n```\n\n")

    // ---- two-phase (salted) dequeue under FORCED mega-host skew (J4) ----
    // fixture: one host holds ~95% of the frontier. Audit: phase 1's rank
    // window partitions by (host, pmod(url_hash, S)) — its Exchange hashes
    // the mega-host across S task groups instead of one — and phase 2's
    // exact re-rank runs over only the ~S·budget phase-1 survivors. The
    // per-task row counts below are measured, not inferred from the plan.
    {
      val s = math.max(2, cfg.saltFactor)
      val megaN = 19000L
      val mega = spark.range(0, megaN).select(
          concat(lit("https://mega.example.com/doc/"), col("id")).as("url"),
          lit("mega.example.com").as("host"))
        .unionByName(spark.range(0, 1000).select(
          concat(lit("https://small"), pmod(col("id"), lit(20)),
            lit(".example.com/doc/"), col("id")).as("url"),
          concat(lit("small"), pmod(col("id"), lit(20)),
            lit(".example.com")).as("host")))
        .withColumn("url_hash", xxhash64(col("url")))
        .withColumn("priority", lit(100))
        .withColumn("warc_ts", timestamp_micros(pmod(col("url_hash"), lit(1000000L))))
        .withColumn("budget", lit(5L))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      mega.count()
      val twoPhase = CrawlEngine.rankPerHost(mega, cfg.copy(twoPhaseDequeue = true))
        .filter(col("rank_in_host") <= col("budget"))
      sb.append("## two-phase dequeue under forced mega-host skew (19k/20k rows on one host)\n\n```\n")
      sb.append(fmt(twoPhase)).append("\n```\n\n")
      // exactness on the skewed fixture: two-phase ≡ plain (same dequeue set)
      val plain = CrawlEngine.rankPerHost(mega, cfg.copy(twoPhaseDequeue = false))
        .filter(col("rank_in_host") <= col("budget"))
      val a = twoPhase.select("url", "rank_in_host").collect().map(r => (r.getString(0), r.getInt(1))).toSet
      val b = plain.select("url", "rank_in_host").collect().map(r => (r.getString(0), r.getInt(1))).toSet
      require(a == b, s"two-phase dequeue diverged from plain under skew: ${(a diff b).take(3)}")
      // measured per-task spread of the mega-host under the two partitionings
      def perTask(parted: org.apache.spark.sql.DataFrame): Seq[Long] = parted
        .filter(col("host") === "mega.example.com")
        .select(spark_partition_id().as("pid"))
        .groupBy("pid").count().collect().map(_.getLong(1)).toSeq.sorted.reverse
      // explicit partition counts: AQE would coalesce a 20k-row shuffle to
      // one partition and hide the spread under audit
      val unsalted = perTask(mega.repartition(s, col("host")))
      val salted = perTask(mega.repartition(s, col("host"), pmod(col("url_hash"), lit(s.toLong))))
      sb.append("### measured per-task rows of the mega-host\n\n")
      sb.append(s"- phase-1 exchange keys (host, pmod(url_hash, $s)): " +
        s"${salted.size} tasks, max ${salted.head} rows (${salted.mkString(", ")})\n")
      sb.append(s"- un-salted host exchange: ${unsalted.size} task, ${unsalted.head} rows " +
        "(the whole mega-host on one task)\n\n")
      require(unsalted.size == 1 && unsalted.head == megaN,
        s"unsalted fixture must concentrate on one task: $unsalted")
      require(salted.size >= 4 && salted.head <= megaN / 2,
        s"salted exchange must spread the mega-host: ${salted.size} tasks, max ${salted.head}")
      mega.unpersist()
    }

    // ---- fetch join, at-scale path (pages pre-partitioned, shuffled-hash)
    // audit: ShuffledHashJoin (NOT SortMergeJoin — no sort of the corpus),
    // NO Exchange on the pages side (its cached partitioning satisfies the
    // join), one Exchange of the small dequeued side only.
    val pages = PagesSynth.pages(spark, sfDir)
      .repartition(8, col("url"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pages.count()
    val dequeuedStandIn = catalog.readFrontier(2)
      .select(col("url"), col("url_hash"), col("host"))
      .withColumn("rank_in_host", lit(1)).withColumn("crawl_delay_ms", lit(1000L))
    val fetchPlan = pages
      .join(dequeuedStandIn.hint("shuffle_hash"), Seq("url"), "inner")
      .withColumn("page", graft.spider.expr.SpiderFunctions.extract_page(col("html"), col("host")))
      .select(col("url"), col("page.text"))
    sb.append("## fetch join (shuffled-hash, pages pre-partitioned by url)\n\n```\n")
    sb.append(fmt(fetchPlan)).append("\n```\n\n")

    // ---- fetch join over the CorpusStore bucketed table (r3) ----
    // audit: same join shape with the corpus coming from STORAGE, not the
    // block manager — the bucketed FileScan reports HashPartitioning(url),
    // so the only Exchange belongs to the dequeued side and the scan line
    // shows `Bucketed: true`. This is the 100-TB posture: nothing cached,
    // corpus streamed per round from a bucket-partitioned table.
    val corpusDir = java.nio.file.Files.createTempDirectory("graft-audit-corpus-").toString
    graft.spider.synth.CorpusStore.write(spark, PagesSynth.pages(spark, sfDir), corpusDir, 8)
    val pagesBucketed = graft.spider.synth.CorpusStore.open(spark, corpusDir)
    val fetchPlanBucketed = pagesBucketed
      .join(dequeuedStandIn.hint("shuffle_hash"), Seq("url"), "inner")
      .withColumn("page", graft.spider.expr.SpiderFunctions.extract_page(col("html"), col("host")))
      .select(col("url"), col("page.text"))
    sb.append("## fetch join (shuffled-hash, CorpusStore bucketed table — corpus streamed from storage)\n\n```\n")
    sb.append(fmt(fetchPlanBucketed)).append("\n```\n\n")
    require(fetchPlanBucketed.queryExecution.executedPlan.toString.contains("Bucketed: true"),
      "bucketed corpus audit failed: scan not bucketed")

    // ---- long-crawl compaction audit: probe-plan branch count BOUNDED ----
    // 10 rounds with compactSeenEvery=4: the seen input after round 10 must
    // union base(r8) + deltas r9..r10 → 3 scan branches, not 11. Without
    // compaction the probe plan grows one branch per round (the r2 gap).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    val longCfg = CrawlConfig(rounds = 10, compactSeenEvery = 4)
    val longState = java.nio.file.Files.createTempDirectory("graft-audit-long-").toString
    CrawlDriver.crawlFromSf(spark, sfDir, longCfg, longState)
    val longCat = new CrawlCatalog(longState, spark)
    def scanBranches(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.toString.linesIterator
        .count(l => l.contains("Scan parquet") || l.contains("FileScan"))
    val compactedSeen = longCat.readSeenBucketed(10)
    val uncompacted = (0 to 10).flatMap { r =>
      val t = longCat.manifest(r).get("tables").get("seen")
      if (t.get("rows").asLong() == 0L) None
      else Some(spark.read.parquet(t.get("path").asText()))
    }.reduce(_.unionByName(_))
    val nCompacted = scanBranches(compactedSeen)
    val nPlain = scanBranches(uncompacted)
    sb.append("## seen input after a 10-round crawl (compactSeenEvery=4)\n\n")
    sb.append(s"- probe input scan branches WITH compaction (base r8 + deltas r9,r10): **$nCompacted**\n")
    sb.append(s"- same history as raw per-round deltas (the r2 design): **$nPlain**\n")
    sb.append(s"- per-bucket file count: base is one file per bucket regardless of round count\n\n")
    require(nCompacted <= 3 && nPlain >= 10,
      s"compaction audit failed: $nCompacted vs $nPlain branches")

    // ---- snapshot expiration audit: metadata bounded by retention ----
    // expire with keepLast=2 on the same 10-round catalog (anchor = the
    // round-8 compaction → horizon 7): manifest count drops to the retention
    // window, crawled output stays byte-complete.
    val crawledBefore = longCat.readCrawled(10).count()
    def manifestCount(): Long = {
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(longState, "snapshots"))
      try s.iterator().asScala.count(_.getFileName.toString.startsWith("snapshot-"))
      finally s.close()
    }
    val manifestsBefore = manifestCount()
    val horizon = longCat.expireSnapshots(keepLast = 2)
    val manifestsAfter = manifestCount()
    val crawledAfter = longCat.readCrawled(10).count()
    sb.append("## snapshot expiration after the same 10-round crawl (keepLast=2)\n\n")
    sb.append(s"- expired through round: **${horizon.getOrElse(-1)}**\n")
    sb.append(s"- snapshot manifests: $manifestsBefore → **$manifestsAfter** (bounded by retention, not round count)\n")
    sb.append(s"- crawled rows through round 10: $crawledBefore → $crawledAfter (identical — output survives in the rollup)\n\n")
    require(horizon.contains(7) && manifestsAfter == 3 && crawledAfter == crawledBefore,
      s"expiration audit failed: horizon=$horizon manifests=$manifestsAfter crawled=$crawledAfter/$crawledBefore")

    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), sb.toString)
    println(s"wrote $outFile")
    spark.stop()
  }
}
