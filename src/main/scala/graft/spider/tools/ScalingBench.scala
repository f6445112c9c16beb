package graft.spider.tools

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.spider.CrawlDriver
import graft.spider.core.CrawlConfig
import graft.spider.state.CrawlCatalog
import graft.spider.synth.{CorpusStore, PagesSynth}

/** Two-cluster-size scaling evidence (BASELINE.md protocol): run the SAME
  * crawl on the SAME input at two parallelism levels (local[N] vs local[4N])
  * and report throughput at both plus efficiency = tput(4N) / (4·tput(N)).
  *
  *   runMain graft.spider.tools.ScalingBench <sfDir> <replicate> <rounds> <cpusCsv>
  *
  * Per level: fresh SparkSession, P = max(64, 2·cpus) shuffle partitions,
  * one discarded warmup crawl (JIT), then the timed crawl.
  */
object ScalingBench {

  case class LevelResult(cpus: Int, fetched: Long, secs: Double, probeGibs: Double,
      taskSecs: Double, deserSecs: Double, tasks: Long,
      fetchWaitSecs: Double, gcSecs: Double, cpuSecs: Double) {
    def urlsPerSec: Double = fetched / secs
    // fixed-cost decomposition (see TaskTimeMeter): the share of wall that is
    // ideally-parallel executor work vs the level-constant serial floor
    def workSecs: Double = taskSecs / cpus
    def floorSecs: Double = secs - workSecs
  }

  /** Memory-bandwidth microprobe: `threads` private streaming long-sum
    * scans, run immediately before the timed crawl. Co-tenant drift on this
    * box shows up as a proportional swing in this number (BENCH/BASELINE.md
    * "the box is not the limiter"), so the reporter can normalize each
    * run's wall time by its own probe — the drift-robust estimator VERDICT
    * r2 task #1 asks for. Returns aggregate GiB/s. */
  def bandwidthProbe(threads: Int, mibPerThread: Int = 1024, passes: Int = 3): Double = {
    val n = mibPerThread * 1024 * 1024 / 8
    @volatile var sink = 0L
    val arrays = Array.fill(threads)(new Array[Long](n))
    arrays.foreach { a => var i = 0; while (i < n) { a(i) = i; i += 64 } } // pretouch
    val t0 = System.nanoTime()
    val ts = arrays.map { a =>
      val t = new Thread {
        override def run(): Unit = {
          var s = 0L; var p = 0
          while (p < passes) { var i = 0; while (i < n) { s += a(i); i += 1 }; p += 1 }
          sink += s
        }
      }
      t.start(); t
    }
    ts.foreach(_.join())
    val secs = (System.nanoTime() - t0) / 1e9
    val gib = threads.toDouble * mibPerThread / 1024 * passes
    gib / secs
  }

  def runAt(cpus: Int, sfDir: String, replicate: Int, rounds: Int,
      noiseLen: Int, perReplicaDocs: Int): LevelResult = {
    // GRAFT_MASTER overrides the local[cpus] master — the standalone-cluster
    // campaign (spark-submit against a real master with separate executor
    // JVMs: serialization, shuffle transport, driver/executor boundary all
    // real) submits with --master and sets this to "submit"; `cpus` then
    // only sizes shuffle partitions and the probe/labels.
    val masterOverride = sys.env.get("GRAFT_MASTER").filter(_.nonEmpty)
    val b0 = SparkSession.builder()
    val spark = masterOverride.fold(b0.master(s"local[$cpus]")) {
      case "submit" => b0 // master comes from spark-submit
      case m        => b0.master(m)
    }
      .appName(s"graft-scaling-$cpus")
      // partitions sized to the parallelism level; AQE coalesces the many
      // small crawl-state shuffles (a fixed large P anti-scales: 64 tiny
      // write/shuffle tasks × 32 threads contend on the local FS/scheduler).
      // GRAFT_PARTS_MULT / GRAFT_AQE are protocol-experiment overrides.
      .config("spark.sql.shuffle.partitions",
        (cpus * sys.env.getOrElse("GRAFT_PARTS_MULT", "2").toInt).toString)
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("GRAFT_AQE", "true"))
      // Listener events carry a physical-plan description built EAGERLY per
      // action; with nested InMemoryRelation trees that string is MBs and
      // costs driver seconds per job. Truncate it — nothing consumes it
      // here (UI off, no event log).
      .config("spark.sql.maxPlanStringLength", "8192")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .config("spark.driver.bindAddress", "127.0.0.1")
      // bench I/O on tmpfs when provided: the sandbox's virtualized disk has
      // sporadic multi-second stalls unrelated to the engine (BENCH notes)
      .config("spark.local.dir", sys.env.getOrElse("GRAFT_LOCAL_DIR", "/tmp"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val meter = new TaskTimeMeter
    spark.sparkContext.addSparkListener(meter)
    try {
      // discarded warmup (JIT + codegen caches) on the small unreplicated
      // corpus, but over THREE rounds with the classic seen join forced:
      // rounds ≥2 exercise the pipelined-commit finalize and the DSv2
      // storage-partitioned membership join (the timed crawl's steady-state
      // paths) — a 1-round warmup left those to JIT inside timed round 2.
      CrawlDriver.crawlFromSf(spark, sfDir,
        CrawlConfig(rounds = 3, fetchBroadcastMax = 0L,
          seenFlipRatio = Double.MaxValue),
        java.nio.file.Files.createTempDirectory("graft-warm-").toString)

      // fetchBroadcastMax=0: always the shuffled-hash fetch join — the only
      // strategy that exists at a 10^10-URL frontier (a broadcast build is
      // driver-serial; the bench measures the at-scale path at every round).
      //
      // GRAFT_COMPACT_EVERY / GRAFT_EXPIRE_EVERY / GRAFT_EXPIRE_KEEP force
      // the maintenance cadence so a campaign can measure the in-loop cost
      // of incremental compaction + snapshot expiration (campaign J): at
      // the defaults a 4-round run never fires either (compactSeenEvery=8,
      // expiration off), so their steady-state overhead needs its own
      // campaign with the cadence dialed down into the run's round count.
      // GRAFT_MAX_NEW_PER_HOST forces the crawl-trap guard (per-host
      // admission cap) into the timed loop, so a campaign can measure the
      // row_number admission window's scaling cost.
      val cfg = CrawlConfig(rounds = rounds, roundLenMs = 60000L, verbose = true,
        fetchBroadcastMax = 0L,
        compactSeenEvery = sys.env.getOrElse("GRAFT_COMPACT_EVERY", "8").toInt,
        expireEveryRounds = sys.env.getOrElse("GRAFT_EXPIRE_EVERY", "0").toInt,
        expireKeepLast = sys.env.getOrElse("GRAFT_EXPIRE_KEEP", "0").toInt,
        maxNewPerHost = sys.env.getOrElse("GRAFT_MAX_NEW_PER_HOST", "0").toInt)
      // Corpus layout, two modes:
      //
      // GRAFT_CORPUS_DIR set (the round-3 campaign default): the corpus is a
      // url-BUCKETED parquet table (CorpusStore) written ONCE — by
      // CorpusBuild at full parallelism — and opened read-only by every
      // run at every level. The bucketed scan reports HashPartitioning(url),
      // so per-round fetch joins shuffle only the dequeued side and stream
      // the corpus from tmpfs storage with the vectorized reader: the
      // design-honest 100-TB posture (bucketed table, nothing pinned in the
      // block manager), identical input BYTES across all runs/levels, and
      // no per-run single-threaded synthesis at local[1].
      //
      // Unset (legacy / self-contained): synthesize in-JVM, pre-partition by
      // url, persist. NOTE: persist (columnar cache, partitioning visible to
      // Catalyst), NOT localCheckpoint — a LogicalRDD leaf loses the hash
      // partitioning and every round re-exchanges the multi-GB corpus
      // (measured). GRAFT_PAGES_STORAGE default DISK_ONLY: tmpfs-backed,
      // keeps the corpus out of the executor heap (heap-cached corpus at
      // local[1] hit eviction churn at large replicate — round-2 cliffs).
      val corpusDir = sys.env.get("GRAFT_CORPUS_DIR").filter(_.nonEmpty)
      val pages = corpusDir match {
        case Some(dir) =>
          if (!CorpusStore.exists(dir)) {
            System.err.println(s"[scaling] corpus at $dir missing — synthesizing")
            CorpusStore.write(spark,
              PagesSynth.pages(spark, sfDir, replicate, spreadHosts = true,
                noiseLen = noiseLen),
              dir, sys.env.getOrElse("GRAFT_CORPUS_BUCKETS", "16").toInt)
          }
          val t = CorpusStore.open(spark, dir)
          // Guard against a stale dir silently changing the workload: the
          // opened table must be exactly this run's (sfDir, replicate) shape.
          val expectRows = PagesSynth.documents(spark, sfDir).count() * replicate
          require(CorpusStore.rowCount(dir) == expectRows,
            s"corpus at $dir has ${CorpusStore.rowCount(dir)} rows; " +
              s"this run expects $expectRows ($sfDir × $replicate) — stale dir?")
          // decode-warm the vectorized reader on ONE part file (JIT for the
          // timed scans without a full pre-timed pass over the corpus)
          val ls = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
          val one =
            try ls.iterator().asScala.map(_.toString)
              .filter(f => f.contains("part-") && f.endsWith(".parquet")).take(1).toSeq
            finally ls.close()
          one.foreach(f => spark.read.parquet(f)
            .agg(sum(length(col("html")))).collect())
          t
        case None =>
          val pagesStorage = org.apache.spark.storage.StorageLevel.fromString(
            sys.env.getOrElse("GRAFT_PAGES_STORAGE", "DISK_ONLY"))
          val p = PagesSynth.pages(spark, sfDir, replicate, spreadHosts = true,
              noiseLen = noiseLen)
            .repartition(cpus * 2, col("url"))
            .persist(pagesStorage)
          p.count()
          p
      }
      val nPages = corpusDir.map(CorpusStore.rowCount).getOrElse(pages.count())
      val robots = PagesSynth.robotsFor(spark,
        pages.select(graft.spider.expr.SpiderFunctions.url_host(col("url")).as("host"))
          .distinct())
      // seeds spread over every replica's host namespace
      val seeds = PagesSynth.seedsFromPages(spark, pages, perReplicaDocs, cfg)
      val stateBase = java.nio.file.Paths.get(
        sys.env.getOrElse("GRAFT_STATE_DIR", System.getProperty("java.io.tmpdir")))
      java.nio.file.Files.createDirectories(stateBase)
      val state = java.nio.file.Files.createTempDirectory(stateBase, "graft-scale-").toString

      // Concurrent-pair barrier (GRAFT_BARRIER=<path>,<nParties>): after
      // warmup + corpus synthesis, wait until every party arrives, so the
      // TIMED regions of both JVMs overlap and sample the same machine
      // phase (the sandbox's speed swings 2-3x between minutes; see
      // BENCH/BASELINE.md "environment findings").
      sys.env.get("GRAFT_BARRIER").foreach { spec =>
        val Array(path, n) = spec.split(",")
        val me = java.nio.file.Paths.get(s"$path.$cpus")
        java.nio.file.Files.write(me, Array[Byte]())
        def arrived: Long = {
          val dir = me.getParent
          val prefix = me.getFileName.toString.takeWhile(_ != '.')
          val s = java.nio.file.Files.list(dir)
          try s.iterator().asScala.count(_.getFileName.toString.startsWith(prefix))
          finally s.close()
        }
        System.err.println(s"[scaling] at barrier ($arrived/${n.toInt})")
        // Timeout: a partner JVM that dies before the barrier (e.g. OOM in
        // warmup) must abort the pair, not hang the survivor forever.
        val deadline = System.nanoTime() + 15L * 60 * 1000 * 1000 * 1000
        while (arrived < n.toInt) {
          require(System.nanoTime() < deadline,
            s"barrier timeout: only $arrived/${n.toInt} parties after 15 min")
          Thread.sleep(200)
        }
        System.err.println(s"[scaling] barrier released")
      }

      // drift probe immediately before the timed region (see bandwidthProbe).
      // GRAFT_PROBE_MIB sizes the per-thread scan: the default 1 GiB/thread
      // assumes the big local-mode driver heap; a spark-submit driver
      // (cluster campaign, 12-16g heap) must dial it down or 16 threads of
      // probe alone exhaust the heap (measured: trial pair T0 OOM'd here).
      val probe = bandwidthProbe(cpus,
        sys.env.getOrElse("GRAFT_PROBE_MIB", "1024").toInt)
      System.err.println(f"[scaling] bandwidth probe: $probe%.2f GiB/s aggregate at $cpus threads")

      meter.reset()
      val t0 = System.nanoTime()
      val catalog = CrawlDriver.run(spark, pages, seeds, robots, cfg, state)
      val secs = (System.nanoTime() - t0) / 1e9
      meter.drain(spark.sparkContext)
      val fetched = (1 to rounds).map(r => catalog.countersOf(r).fetched).sum
      System.err.println(s"[scaling] cpus=$cpus pages=$nPages fetched=$fetched secs=$secs " +
        f"task_secs=${meter.taskSecs}%.1f deser_secs=${meter.deserSecs}%.1f tasks=${meter.tasks.sum()} " +
        f"fetch_wait=${meter.fetchWaitSecs}%.1f gc=${meter.gcSecs}%.1f")
      LevelResult(cpus, fetched, secs, probe, meter.taskSecs, meter.deserSecs, meter.tasks.sum(),
        meter.fetchWaitSecs, meter.gcSecs, meter.cpuSecs)
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val replicate = if (args.length > 1) args(1).toInt else 20
    val rounds = if (args.length > 2) args(2).toInt else 4
    val cpusList = (if (args.length > 3) args(3) else "8,32").split(",").map(_.trim.toInt)
    val noiseLen = if (args.length > 4) args(4).toInt else 0
    val perReplicaDocs = if (args.length > 5) args(5).toInt else 50

    // NOTE: run ONE parallelism level per JVM (a second SparkContext in the
    // same JVM stalls sporadically in this sandbox; see BENCH/BASELINE.md).
    val results = cpusList.map(c => runAt(c, sfDir, replicate, rounds, noiseLen, perReplicaDocs))
    val parts = results.map { r =>
      f""""local[${r.cpus}]":{"fetched":${r.fetched},"secs":${r.secs}%.2f,"urls_per_sec":${r.urlsPerSec}%.1f,"probe_gibs":${r.probeGibs}%.2f,""" +
        f""""task_secs":${r.taskSecs}%.1f,"work_secs":${r.workSecs}%.1f,"floor_secs":${r.floorSecs}%.1f,""" +
        f""""deser_secs":${r.deserSecs}%.1f,"fetch_wait_secs":${r.fetchWaitSecs}%.1f,""" +
        f""""gc_secs":${r.gcSecs}%.1f,"cpu_secs":${r.cpuSecs}%.1f,"tasks":${r.tasks}}"""
    }
    val eff =
      if (results.length >= 2 && results.last.cpus == results.head.cpus * 4)
        results.last.urlsPerSec / (4.0 * results.head.urlsPerSec)
      else Double.NaN
    println(s"""{"bench":"scaling","sf":"$sfDir","replicate":$replicate,"rounds":$rounds,${parts.mkString(",")},"efficiency":$eff}""")
  }
}
