package graft.spider

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.spider.core._
import graft.spider.sketch.Sketches
import graft.spider.state.CrawlCatalog

/** Multi-round crawl driver (SURVEY.md §3.2): opens-or-resumes the IceLite
  * catalog, then runs rounds r0+1..R, committing a snapshot per round.
  *
  * Every round's state is read back from the committed snapshot before the
  * next round — this truncates Catalyst lineage (no unbounded iterative
  * plans) AND makes kill/resume trivial: a killed run restarts from the last
  * committed manifest and, because every ordering the contract depends on is
  * a pure function of (state, round), replays to the same crawl ordering and
  * URL-seen set as an uninterrupted run.
  */
object CrawlDriver {

  /** Run (or resume) a crawl; returns the catalog positioned at cfg.rounds. */
  def run(
      spark: SparkSession,
      pages: DataFrame,
      seeds: Dataset[FrontierEntry],
      robots: Dataset[RobotsRule],
      cfg: CrawlConfig,
      stateDir: String): CrawlCatalog = {

    val catalog = new CrawlCatalog(stateDir, spark)
    val robotsDf = robots.toDF().persist()
    robotsDf.count() // materialize once; broadcast-joined every round

    val startRound = catalog.latestRound match {
      case Some(r) => r
      case None =>
        val seedsDf = seeds.toDF().repartition(col("host_hash"))
          .persist()
        val nSeeds = seedsDf.count()
        val bloom0 = seedsDf.agg(
          Sketches.bloomAgg(col("url_hash"), cfg.bloomExpectedItems, cfg.bloomFpp))
          .head().getAs[Array[Byte]](0)
        import spark.implicits._
        val emptyHostState = spark.emptyDataset[HostState].toDF()
        catalog.commitRound(0, seedsDf, seedsDf.select("url_hash", "url"),
          emptyHostState, None, Some(bloom0),
          RoundCounters(0, 0, 0, 0, 0, 0, 0, nSeeds, 0, nSeeds, nSeeds))
        seedsDf.unpersist()
        0
    }

    for (r <- (startRound + 1) to cfg.rounds) {
      val tR = System.nanoTime()
      val frontier = catalog.readFrontier(r - 1)
      val seen = catalog.readSeen(r - 1)
      val hostState = catalog.readHostState(r - 1)
      val prevBloom = catalog.readBloom(r - 1)

      val frontierIn = catalog.manifest(r - 1)
        .get("tables").get("frontier").get("rows").asLong()
      val out = CrawlEngine.runRound(spark, pages, robotsDf, frontier, seen,
        hostState, r, cfg, prevBloom, frontierIn)
      val tCompute = (System.nanoTime() - tR) / 1e9

      // Incremental sketch maintenance: bloom(r) = bloom(r-1) ⊎ bloom(delta)
      // (the delta filter was built inside the round's enqueued-count job).
      val newBloom = (prevBloom, out.bloomDelta) match {
        case (Some(prev), Some(delta)) =>
          val merged = Sketches.bloomFrom(prev)
          merged.mergeInPlace(Sketches.bloomFrom(delta))
          Some(Sketches.bloomBytes(merged))
        case (None, d @ Some(_)) => d
        case (prev, None)        => prev
      }

      val tC = System.nanoTime()
      catalog.commitRound(r,
        out.frontierNext.repartition(col("host_hash")), // AQE sizes the partition count
        out.seenDelta, out.hostStateNext, Some(out.crawledDelta), newBloom,
        out.counters)
      out.persisted.foreach(_.unpersist())
      if (cfg.verbose) System.err.println(
        f"[crawl] round $r compute=$tCompute%.1fs commit=${(System.nanoTime() - tC) / 1e9}%.1fs " +
          s"fetched=${out.counters.fetched} frontier_out=${out.counters.frontier_out}")
    }
    catalog
  }

  /** Convenience: synthesize the corpus fixtures from `sfDir`, crawl, return
    * the crawled table through the final round. */
  def crawlFromSf(spark: SparkSession, sfDir: String, cfg: CrawlConfig,
      stateDir: String, replicate: Int = 1, spreadHosts: Boolean = false): DataFrame = {
    import graft.spider.synth.PagesSynth
    val pages = PagesSynth.pages(spark, sfDir, replicate, spreadHosts)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pages.count() // materialize once; every round re-joins against it
    val robots =
      if (spreadHosts)
        PagesSynth.robotsFor(spark, pages
          .select(graft.spider.expr.SpiderFunctions.url_host(
            org.apache.spark.sql.functions.col("url")).as("host"))
          .distinct())
      else PagesSynth.robots(spark, sfDir)
    val catalog = run(spark, pages, PagesSynth.seeds(spark, sfDir, cfg),
      robots, cfg, stateDir)
    catalog.readCrawled(cfg.rounds)
  }
}
