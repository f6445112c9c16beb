package graft.spider

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.spider.core._
import graft.spider.sketch.Sketches
import graft.spider.state.{CrawlCatalog, SketchParams}

/** Multi-round crawl driver (SURVEY.md §3.2): opens-or-resumes the IceLite
  * catalog, then runs rounds r0+1..R, committing a snapshot per round.
  *
  * Snapshot commits run a DEPTH-1 PIPELINE (default `pipelinedCommits=true`):
  * round r+1 consumes round r's in-memory state frames — `localCheckpoint`
  * leaves, which cache the blocks AND truncate Catalyst lineage (no
  * unbounded iterative plans) — while round r's table writes drain on pool
  * threads; round r's manifest rename (the single atomic commit point)
  * happens after its writes land and before round r+1's. With
  * `pipelinedCommits=false`, or on the first round after a resume, state is
  * instead read back from the committed snapshot (lineage truncation then
  * comes from the files). Either way kill/resume replays identically: a
  * killed run restarts from the last committed manifest and, because every
  * ordering the contract depends on is a pure function of (state, round),
  * reaches the same crawl ordering and URL-seen set as an uninterrupted run
  * (pipelining only bounds the loss at ≤2 rounds of work instead of 1).
  */
object CrawlDriver {

  private def sketchParamsOf(cfg: CrawlConfig): SketchParams =
    SketchParams(cfg.seenBuckets, cfg.bloomShards, cfg.bloomExpectedItems, cfg.bloomFpp)

  private def perShard(cfg: CrawlConfig): Long =
    math.max(1024L, cfg.bloomExpectedItems / cfg.bloomShards)

  /** Run (or resume) a crawl; returns the catalog positioned at cfg.rounds. */
  def run(
      spark: SparkSession,
      pages: DataFrame,
      seeds: Dataset[FrontierEntry],
      robots: Dataset[RobotsRule],
      cfg: CrawlConfig,
      stateDir: String,
      /** Snapshot-store factory — the Iceberg swap seam: any CrawlCatalog
        * subclass overriding the manifest-persistence methods (e.g.
        * [[graft.spider.state.SingleFileCatalog]]) drops in here; the
        * conformance spec pins identical crawl results across stores. */
      catalogFor: (String, SparkSession) => CrawlCatalog =
        (d, s) => new CrawlCatalog(d, s)): CrawlCatalog = {

    val catalog = catalogFor(stateDir, spark)
    val params = sketchParamsOf(cfg)
    // In-crawl expiration deletes below the newest compaction anchor at or
    // before latest-keepLast+1; the deepest in-flight reader under commit
    // pipelining resolves its seen history at round r-2 (the current round's
    // async discovery aggregate), so keepLast must keep the anchor at or
    // below that (>= 2), +1 margin.
    // Only the ACTIVE combination is constrained: expireEveryRounds with
    // expireKeepLast == 0 is inert (the loop never fires expiration), so it
    // is not rejected.
    require(cfg.expireEveryRounds == 0 || cfg.expireKeepLast == 0 ||
        cfg.expireKeepLast >= 3,
      s"expireEveryRounds=${cfg.expireEveryRounds} requires expireKeepLast >= 3 " +
        s"(got ${cfg.expireKeepLast}): in-flight pipelined readers reach two rounds back")
    // timed re-crawl reads the source round's COMMITTED crawl log inside
    // round r (r0 = r+1-recrawlEvery): under depth-1 commit pipelining the
    // newest final manifest at round r's start is r-2, so the cadence must
    // reach at least that far back (one less without pipelining).
    require(cfg.recrawlEvery == 0 ||
        cfg.recrawlEvery >= (if (cfg.pipelinedCommits) 3 else 2),
      s"recrawlEvery=${cfg.recrawlEvery} must be >= " +
        s"${if (cfg.pipelinedCommits) 3 else 2} (commit-pipeline depth): " +
        "the source round's manifest must be final when its crawl log is re-read")
    // the hostRank signal re-reads the hostedges manifests of rounds
    // 1..hostRankFromRound on every resume; expiration deletes manifests
    require(cfg.hostRankFromRound == 0 || cfg.expireKeepLast == 0,
      "hostRankFromRound does not compose with snapshot expiration " +
        "(expired rounds drop the hostedges manifests the rank re-reads on resume)")
    // storage-partitioned join over the DSv2 seen reader: group by the
    // reported bucket partitioning and allow shuffling the (small)
    // candidate side into it. Session-global planner settings — saved here
    // and restored in the finally below so the crawl does not leak them
    // into the caller's unrelated queries.
    val bucketingKeys = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.shuffle.enabled")
    val priorBucketing = bucketingKeys.map(k => k -> spark.conf.getOption(k))
    if (cfg.seenDsv2) bucketingKeys.foreach(spark.conf.set(_, "true"))
    try {
    val robotsDf = robots.toDF().persist()
    // materialize once; the exact count picks broadcast vs host-shuffle for
    // the per-round robots gate
    val robotsRows = robotsDf.count()

    // (startRound, sketch blob) — resume validates the storage layout and
    // rebuilds the Bloom when the stored params are incompatible with cfg
    // (filters built under different (shards, n, fpp) cannot be merged).
    val (startRound, bloom0) = catalog.latestRound match {
      case Some(r) =>
        val stored = catalog.sketchParams(r).getOrElse(throw new IllegalStateException(
          s"catalog at $stateDir has no sketch_params manifest entry; " +
            "it was written by an incompatible engine version"))
        require(stored.seenBuckets == cfg.seenBuckets,
          s"cannot resume: catalog seen table is bucketed ${stored.seenBuckets}-way " +
            s"but cfg.seenBuckets=${cfg.seenBuckets} (the bucket layout is fixed per catalog)")
        val bloomCompatible = stored.bloomShards == cfg.bloomShards &&
          stored.bloomExpectedItems == cfg.bloomExpectedItems &&
          stored.bloomFpp == cfg.bloomFpp
        val blob =
          if (!cfg.bloomPrefilter) None
          else (catalog.readBloom(r), bloomCompatible) match {
            case (b @ Some(_), true) => b
            case _ => // params changed, or the prior run had the sketch off
              System.err.println(s"[crawl] rebuilding seen Bloom from catalog " +
                s"(stored params $stored incompatible with cfg)")
              Some(catalog.readSeen(r)
                .agg(Sketches.shardedBloomAgg(col("url_hash"), cfg.bloomShards,
                  perShard(cfg), cfg.bloomFpp))
                .head().getAs[Array[Byte]](0))
          }
        (r, blob)
      case None =>
        val seedsDf = seeds.toDF().persist()
        val nSeeds = seedsDf.count()
        val blob =
          if (!cfg.bloomPrefilter) None
          else Some(seedsDf.agg(
            Sketches.shardedBloomAgg(col("url_hash"), cfg.bloomShards,
              perShard(cfg), cfg.bloomFpp))
            .head().getAs[Array[Byte]](0))
        import spark.implicits._
        val emptyHostState = spark.emptyDataset[HostState].toDF()
        val seenDelta = seedsDf.select(col("url_hash"), col("url"))
          .withColumn("seen_bucket", CrawlEngine.seenBucketCol(col("url_hash"), cfg.seenBuckets))
        catalog.commitRound(0, seedsDf, seenDelta, emptyHostState, None, blob, params,
          RoundCounters(0, 0, 0, 0, 0, 0, 0, nSeeds, 0, nSeeds, nSeeds))
        seedsDf.unpersist()
        (0, blob)
    }

    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global

    def mergeBloom(prev: Option[Array[Byte]], delta: Option[Array[Byte]]): Option[Array[Byte]] =
      (prev, delta) match {
        case (Some(p), Some(d)) => Some(Sketches.mergeShardedBlobs(p, d))
        case (None, d @ Some(_)) => d
        case (p, None)           => p
      }

    // Cross-round state rides a Future chain: each round's discovery
    // aggregate (candN/enqueuedN/Bloom delta) completes during the NEXT
    // round's fetch phase; the chain assembles exact manifest counters, the
    // merged Bloom, and the cumulative seen-row count without any of them
    // blocking a round boundary. Seed values are exact (manifest metadata).
    case class Chain(bloom: Option[Array[Byte]], seenRows: Long, frontierOut: Long)
    val seenRows0: Long = catalog.seenRowsThrough(startRound)
    val frontierOut0: Long =
      catalog.manifest(startRound).get("tables").get("frontier").get("rows").asLong()
    var chainF: Future[Chain] = Future.successful(Chain(bloom0, seenRows0, frontierOut0))

    // Depth-1 commit pipeline: `pending` is the previous round, its table
    // writes draining on pool threads while this round computes over its
    // persisted state frames; it finalizes (manifest rename) right after
    // this round's compute, preserving manifest order. `retired` frames are
    // unpersisted two rounds back — the current round's background writes
    // may still read the previous round's caches (hoststate chains one
    // round), so frames live for two rounds after their own.
    case class Pend(round: Int, pc: CrawlCatalog#PendingCommit,
        out: CrawlEngine.RoundOutput,
        roundF: Future[(RoundCounters, Option[Array[Byte]], Chain)])
    var pending: Option[Pend] = None
    var retired: Option[CrawlEngine.RoundOutput] = None

    // hostRank priority signal (cfg.hostRankFromRound = K): computed ONCE
    // per run — at the first round ≥ K+2, when round K's manifest is final
    // even under depth-1 commit pipelining — from the committed hostedges
    // graph of rounds 1..K. Pure function of committed state ⇒ a resumed
    // run recomputes the identical table. The boost is a per-row function
    // of (rank, n): quantize rank·n·4 to a long, integer log2 via bit
    // length (bin()), clamp to [0, 9]; only boost ≥ 1 rows are kept (0 is
    // the join default), and the side is broadcast while small.
    var hostBoostCache: Option[DataFrame] = None
    // the checkpointed frame behind the (possibly broadcast-hinted) boost —
    // kept so its blocks can be freed when the run ends (the hint wrapper
    // shares the same underlying LogicalRDD)
    var hostBoostCkpt: Option[DataFrame] = None
    def hostBoost(r: Int): Option[DataFrame] = {
      if (cfg.hostRankFromRound == 0 || r < cfg.hostRankFromRound + 2) None
      else {
        if (hostBoostCache.isEmpty) {
          // per-round frames are distinct but their UNION is not (an edge
          // rediscovered every round) — the rank is over the edge SET
          val edges = catalog.readHostEdges(cfg.hostRankFromRound).distinct()
          val ranked = graft.datapipe.LinkRank.hostRank(
            edges, "src_host", "dst_host", cfg.hostRankIters).persist()
          val n = ranked.count() // = |vertices|: hostRank emits every vertex
          val boost = ranked.select(col("host"),
            graft.datapipe.LinkRank.rankTier(col("rank"), n).as("boost"))
            .filter(col("boost") >= 1)
            .localCheckpoint(true)
          ranked.unpersist()
          val bn = boost.count()
          hostBoostCkpt = Some(boost)
          hostBoostCache = Some(
            if (bn <= cfg.cutoffBroadcastMax) broadcast(boost) else boost)
          if (cfg.verbose) System.err.println(
            s"[crawl] hostRank signal ready: $n hosts ranked, $bn boosted")
        }
        hostBoostCache
      }
    }
    def cleanup(out: CrawlEngine.RoundOutput): Unit = {
      out.persisted.foreach(_.unpersist())
      // localCheckpoint-backed frames are NOT in the CacheManager, so the
      // Dataset.unpersist above is a no-op for them — free their blocks
      // explicitly instead of waiting out the ContextCleaner's GC pace.
      // (May log a few benign "non-existent accumulator" task-end messages:
      // dropped metric updates for already-finished overlapping jobs.)
      out.ckptRdds.foreach(_.unpersist(blocking = false))
      out.broadcasts.foreach(_.destroy())
    }

    // ADVICE r5: frames that live across rounds (retired round outputs, the
    // run-long hostRank checkpoint) are freed in a finally so a mid-crawl
    // exception after the boost is built cannot leak their blocks for the
    // session's lifetime.
    try {
    for (r <- (startRound + 1) to cfg.rounds) {
      val tR = System.nanoTime()
      // Inputs: from the previous round's in-memory frames when pipelining
      // (identical content to its in-flight files), else from the snapshot.
      def seenInput(committedRound: Int, extra: Option[DataFrame]) =
        CrawlEngine.SeenInput(
          catalog.readSeenBucketed(committedRound),
          if (cfg.seenDsv2) Some(catalog.readSeenV2(committedRound, cfg.seenBuckets)) else None,
          extra)
      val (frontier, seen, hostState, frontierInBound, prevLinksN, prebuilt) = pending match {
        case Some(p) =>
          // dequeue frames for this round were Catalyst-analyzed on a pool
          // thread during the previous round — ready by now in the steady
          // state, so this await is ~instant
          val pre = Await.result(p.out.nextDequeueF, Duration.Inf)
          (p.out.frontierNext, seenInput(p.round - 1, Some(p.out.seenDelta)),
            p.out.hostStateNext, p.out.frontierOutBound, p.out.linksN, pre)
        case None =>
          // Exact |frontier| from round r-1's committed manifest — NOT the
          // startRound value, which goes stale after the first un-pipelined
          // round and could under-report the bound (an underestimate can
          // flip a strategy toward broadcast of a frontier-scale side).
          // prev links (the flip-strategy signal) is exact from the
          // manifest counters; 0 for a seed-only round-0 parent.
          val bound = catalog.manifest(r - 1)
            .get("tables").get("frontier").get("rows").asLong()
          (catalog.readFrontier(r - 1), seenInput(r - 1, None),
            catalog.readHostState(r - 1), bound,
            catalog.countersOf(r - 1).links_extracted, None)
      }
      // timed re-crawl source: the committed crawl log of round r0 (final
      // by construction — the recrawlEvery >= pipeline-depth+1 require
      // above), plus its exact row count from the committed counters
      val (recrawlSrc, recrawlN) = {
        val r0 = r + 1 - cfg.recrawlEvery
        if (cfg.recrawlEvery > 0 && r0 >= 1)
          (catalog.readCrawledRound(r0), catalog.countersOf(r0).fetched)
        else (None, 0L)
      }
      val prevF = chainF
      val pc = catalog.beginCommit(r)
      val out = CrawlEngine.runRound(spark, pages, robotsDf, frontier, seen,
        hostState, r, cfg, prevF.map(c => (c.bloom, c.seenRows)),
        frontierInBound, pc.stage, robotsRows, prevLinksN, prebuilt,
        recrawlSrc, recrawlN, hostBoost(r))
      val tCompute = (System.nanoTime() - tR) / 1e9

      // Exact counters + incremental sketch: bloom(r) = bloom(r-1) ⊎ delta
      // per shard; frontier_in(r) = frontier_out(r-1) from the chain.
      val roundF: Future[(RoundCounters, Option[Array[Byte]], Chain)] = for {
        prev <- prevF
        (candN, enqueuedN, delta) <- out.rawStatsF
      } yield {
        val merged = mergeBloom(prev.bloom, delta)
        val frontierOut = (out.eligibleN - out.dequeuedN) + enqueuedN + out.recrawlN
        val counters = RoundCounters(r, prev.frontierOut,
          prev.frontierOut - out.eligibleN, out.dequeuedN, out.fetchedN,
          out.dequeuedN - out.fetchedN, out.linksN, candN, candN - enqueuedN,
          enqueuedN, frontierOut)
        (counters, merged, Chain(merged, prev.seenRows + enqueuedN, frontierOut))
      }
      chainF = roundF.map(_._3)

      val tC = System.nanoTime()
      // Finalize the previous round (its writes drained during our compute),
      // then retire frames two rounds back.
      pending.foreach { p =>
        val (counters, bloomAfter, _) = Await.result(p.roundF, Duration.Inf)
        p.pc.finalizeCommit(bloomAfter, params, counters)
        retired.foreach(cleanup)
        retired = Some(p.out)
      }
      // Periodic INCREMENTAL seen compaction rides this round's commit:
      // staged only now — after the previous round's manifest landed —
      // because the compaction planner reads committed lineage through
      // round r-1; it folds this round's delta by chaining off its staged
      // write and drains on a pool thread like the other table writes.
      if (cfg.compactSeenEvery > 0 && r % cfg.compactSeenEvery == 0)
        pc.stageSeenCompaction(cfg.compactMaxFilesPerBucket)
      if (cfg.pipelinedCommits && r < cfg.rounds) {
        pending = Some(Pend(r, pc, out, roundF))
      } else {
        val (counters, bloomAfter, _) = Await.result(roundF, Duration.Inf)
        pc.finalizeCommit(bloomAfter, params, counters)
        pending = None
        retired.foreach(cleanup)
        retired = Some(out)
      }
      // In-crawl expiration (VERDICT r3 task #2): bound the live manifest /
      // state-file count every K rounds instead of only after the crawl.
      // Runs after this round's commit block, so the newest committed
      // manifest is r-1 (pipelined) or r; the horizon lands below the
      // newest compaction anchor inside the retention window, which every
      // in-flight reader's seen resolution already sits above.
      if (cfg.expireKeepLast > 0 && cfg.expireEveryRounds > 0 &&
          r % cfg.expireEveryRounds == 0)
        catalog.expireSnapshots(cfg.expireKeepLast)
      if (cfg.verbose) System.err.println(
        f"[crawl] round $r compute=$tCompute%.1fs commit-drain=${(System.nanoTime() - tC) / 1e9}%.1fs " +
          s"fetched=${out.fetchedN}")
    }
    } finally {
      retired.foreach(cleanup)
      // The hostRank boost lives for the whole run (it joins every boosted
      // round); free its checkpoint blocks now — Dataset.unpersist is a no-op
      // on checkpoint-backed frames, so go through the bridge like cleanup().
      hostBoostCkpt.foreach(b => org.apache.spark.sql.GraftColumnBridge
        .checkpointRdd(b).foreach(_.unpersist(blocking = false)))
    }
    // Post-crawl table maintenance (all commits final by here): bound the
    // catalog's metadata/state-file count by the retention window.
    if (cfg.expireKeepLast > 0) catalog.expireSnapshots(cfg.expireKeepLast)
    catalog
    } finally {
      priorBucketing.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
  }

  /** Convenience: synthesize the corpus fixtures from `sfDir`, crawl, return
    * the crawled table through the final round. */
  def crawlFromSf(spark: SparkSession, sfDir: String, cfg: CrawlConfig,
      stateDir: String, replicate: Int = 1, spreadHosts: Boolean = false): DataFrame = {
    import graft.spider.synth.PagesSynth
    // r6: choose the corpus cache's partition layout before persisting —
    // a sandbox-scale documents file scans as ONE split (4 MB openCost
    // floor) and the replicate crossJoin inherits ≤ replicate non-empty
    // partitions, serializing the html-synth and fetch-join scan stages.
    // No-op when the scan already meets the session parallelism (the
    // production case), so nothing is tuned to the local core count.
    val pages0 = PagesSynth.pages(spark, sfDir, replicate, spreadHosts)
    val par = spark.sparkContext.defaultParallelism
    val pages = (if (pages0.rdd.getNumPartitions < par) pages0.repartition(par)
                 else pages0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pages.count() // materialize once; every round re-joins against it
    val robots =
      if (spreadHosts)
        PagesSynth.robotsFor(spark, pages
          .select(graft.spider.expr.SpiderFunctions.url_host(col("url")).as("host"))
          .distinct())
      else PagesSynth.robots(spark, sfDir)
    val catalog = run(spark, pages, PagesSynth.seeds(spark, sfDir, cfg),
      robots, cfg, stateDir)
    // the crawled table is committed files — the corpus cache can go
    // (matters when a caller runs several crawls in one session, e.g. the
    // bench's fetch-join A/B)
    pages.unpersist()
    catalog.readCrawled(cfg.rounds)
  }
}
