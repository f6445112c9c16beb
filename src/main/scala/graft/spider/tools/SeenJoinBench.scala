package graft.spider.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.spider.CrawlEngine
import graft.spider.core.{CrawlConfig, RoundCounters}
import graft.spider.state.{CrawlCatalog, SketchParams}

/** Measure the seen-membership join strategies against one committed
  * bucketed history at several candidate volumes (VERDICT r3 task #9):
  *
  *   - `flip`      — scan seen once, semi-join the broadcast candidate keys,
  *                   anti-join the hit set (the small-round path; its cost is
  *                   the history scan + a driver-serial key broadcast, so it
  *                   should NOT win at large candidate volumes)
  *   - `classicV2` — the classic join over the DSv2 bucket-reporting reader:
  *                   storage-partitioned, only the candidate side shuffles
  *                   into the bucket grouping (the at-scale path)
  *   - `classicPq` — the same classic join over plain parquet (no reported
  *                   partitioning): pays the full-history exchange every time
  *                   (the r2 design this measures AGAINST)
  *
  * Strategy is forced per cell (not left to the cfg thresholds), so the
  * numbers measure the join shapes themselves. Candidates are half
  * hits / half new. Prints one JSON line per (volume, strategy) with the
  * median of `reps` timed runs, plus a summary table to stderr.
  *
  *   tools/run_bench.sh graft.spider.tools.SeenJoinBench [seenRows]
  */
object SeenJoinBench {
  def main(args: Array[String]): Unit = {
    val seenRows = if (args.length > 0) args(0).toLong else 8000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("GRAFT_SEENBENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus.toInt * 2).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .config("spark.driver.bindAddress", "127.0.0.1")
      .config("spark.local.dir", sys.env.getOrElse("GRAFT_LOCAL_DIR", "/tmp"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")

    // Shuffle-volume meter: wall time at sandbox volume under-weights the
    // exchange (8M narrow rows shuffle in ~a second); the SCALE claim is
    // about bytes moved — classicPq shuffles O(history) per round while
    // classicV2 shuffles O(candidates) — so measure it directly.
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        ()
      }
    })

    val cfg = CrawlConfig(seenBuckets = 64)
    val params = SketchParams(cfg.seenBuckets, cfg.bloomShards,
      cfg.bloomExpectedItems, cfg.bloomFpp)
    val state = java.nio.file.Files.createTempDirectory("graft-seenbench-").toString
    val catalog = new CrawlCatalog(state, spark)

    // committed history: 4 delta rounds + a compaction (the steady-state
    // layout a long crawl's probe actually reads)
    val rounds = 4
    val perRound = seenRows / rounds
    (0 until rounds).foreach { r =>
      val delta = spark.range(r * perRound, (r + 1) * perRound)
        .select(xxhash64(col("id")).as("url_hash"),
          concat(lit("https://h"), pmod(col("id"), lit(1000L)),
            lit(".example.com/doc/"), col("id")).as("url"))
        .withColumn("seen_bucket",
          CrawlEngine.seenBucketCol(col("url_hash"), cfg.seenBuckets))
      val pc = catalog.beginCommit(r)
      pc.stage("seen", delta)
      if (r == rounds - 1) pc.stageSeenCompaction(cfg.compactMaxFilesPerBucket)
      pc.finalizeCommit(None, params, RoundCounters(r, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0))
    }
    val last = rounds - 1
    val seenPlain = catalog.readSeenBucketed(last)
    val seenV2 = catalog.readSeenV2(last, cfg.seenBuckets)

    def candidates(n: Long): DataFrame = {
      // half hits (ids inside the seen id space), half new (ids beyond it)
      val hits = spark.range(0, n / 2)
        .select((col("id") * lit(seenRows / (n / 2))).as("id"))
      val fresh = spark.range(seenRows, seenRows + n - n / 2).select(col("id"))
      hits.unionByName(fresh)
        .select(xxhash64(col("id")).as("url_hash"),
          concat(lit("https://c"), col("id")).as("url"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

    def timeOnce(cand: DataFrame, strategy: String): (Double, Long, Long) = {
      val seen = strategy match {
        case "flip"      => CrawlEngine.SeenInput.plain(seenPlain)
        case "classicV2" => CrawlEngine.SeenInput(seenPlain, Some(seenV2), None)
        case "classicPq" => CrawlEngine.SeenInput.plain(seenPlain)
      }
      val sh0 = shuffleBytes.get()
      val t0 = System.nanoTime()
      val newN = CrawlEngine.flagAgainstSeen(cand, seen, None, cfg,
          flip = strategy == "flip")
        .filter(col("is_new")).count()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the async listener bus drain task-end events
      (secs, newN, shuffleBytes.get() - sh0)
    }

    val volumes = Seq(250000L, 1000000L, 4000000L)
    val probe = ScalingBench.bandwidthProbe(4, 512, 3)
    System.err.println(f"[seenbench] seen=$seenRows cpus=$cpus probe=$probe%.1f GiB/s")
    val rowsOut = volumes.flatMap { n =>
      val cand = candidates(n)
      cand.count() // materialize outside the timed region
      Seq("flip", "classicV2", "classicPq").map { strat =>
        val runs = (1 to reps).map(_ => timeOnce(cand, strat))
        val secs = runs.map(_._1).sorted.apply(reps / 2)
        val newN = runs.head._2
        val shuffleMb = runs.map(_._3).min / 1e6 // min: reuse-free lower bound
        require(runs.map(_._2).distinct.size == 1, s"nondeterministic result: $runs")
        System.err.println(
          f"[seenbench] cand=$n strat=$strat median=$secs%.2fs new=$newN shuffle=$shuffleMb%.1fMB")
        println(s"""{"bench":"seen_join","cand":$n,"strategy":"$strat",""" +
          f""""median_secs":$secs%.3f,"shuffle_mb":$shuffleMb%.1f,""" +
          f""""new_rows":$newN,"seen_rows":$seenRows,"probe_gibs":$probe%.2f}""")
        (n, strat, secs, newN)
      } ++ { cand.unpersist(); Nil }
    }
    // consistency: all three strategies agree on the new-row count per volume
    rowsOut.groupBy(_._1).foreach { case (n, rs) =>
      require(rs.map(_._4).distinct.size == 1, s"strategies disagree at $n: $rs")
    }
    spark.stop()
  }
}
