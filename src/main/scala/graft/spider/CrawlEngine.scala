package graft.spider

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.spider.core.{Corpus, CrawlConfig, RoundCounters}
import graft.spider.expr.SpiderFunctions._

/** One crawl round as a typed Dataset/DataFrame job (SURVEY.md §3.2).
  *
  * Stage structure (each a declarative Catalyst plan; the exchanges on
  * host / url_hash are the explicit node boundaries):
  *
  *   1 dequeue:  frontier ⨝ broadcast(robots) → robots gate (F1/E7)
  *               → per-host rank by (priority desc, warc_ts, url_hash, url)
  *               (O1/W1: the window's hash exchange on host IS the explicit
  *               host partitioning; the window sort is the within-partition
  *               sort; trailing keys make the order total ⇒ replayable)
  *   2 fetch:    pages ⨝ broadcast(dequeued) on url (J1) — the dequeued side
  *               is politeness-budget-bounded (≤ budget rows per host), so it
  *               is always the broadcast side; no shuffle of the fat corpus
  *   3 extract:  extract_text / extract_outlinks (E5/E6, Catalyst exprs)
  *   4 discover: explode (G1) → url_canonicalize (E1) → xxhash64 (E3)
  *               → in-batch dedup (groupBy url, min parent warc_ts)
  *               → Bloom prefilter split (F2) → exact anti-join vs seen (J3)
  *   5 commit:   handled by CrawlDriver via the IceLite catalog
  *
  * The Bloom prefilter splits candidates into definitely-new (bloom says
  * absent — a Bloom filter has no false negatives, so these skip the exact
  * anti-join entirely) and maybe-seen (bloom says present — only these pay
  * the anti-join, which resolves false positives exactly). The seen-set
  * SEMANTICS are always the exact anti-join; the sketch only saves work.
  */
object CrawlEngine {

  case class RoundOutput(
      crawledDelta: DataFrame,
      frontierNext: DataFrame,
      seenDelta: DataFrame,
      hostStateNext: DataFrame,
      counters: RoundCounters,
      bloomDelta: Option[Array[Byte]],
      persisted: Seq[DataFrame])

  private val frontierCols =
    Seq("url", "url_hash", "host", "host_hash", "priority", "discovered_round", "warc_ts")

  def runRound(
      spark: SparkSession,
      pages: DataFrame,
      robots: DataFrame,
      frontier: DataFrame,
      seenAll: DataFrame,
      hostStatePrev: DataFrame,
      round: Int,
      cfg: CrawlConfig,
      bloomBytes: Option[Array[Byte]],
      frontierIn: Long): RoundOutput = {

    val t0 = System.nanoTime()
    val defaultDelayMs = 1000L

    // ---- 1 dequeue: robots gate + per-host politeness budget top-k ----
    // frontierIn comes from the previous snapshot manifest (no extra count).
    if (cfg.verbose) System.err.println(s"[round $round] start")
    val gated = frontier
      .join(broadcast(robots), Seq("host"), "left_outer")
      .withColumn("crawl_delay_ms", coalesce(col("crawl_delay_ms"), lit(defaultDelayMs)))
      .withColumn("allowed",
        coalesce(robots_allows(col("url"), col("disallow_prefixes")), lit(true)))

    val eligible = gated.filter(col("allowed"))
      .withColumn("budget", greatest(lit(1L), floor(lit(cfg.roundLenMs) / col("crawl_delay_ms"))))

    val ranked = rankPerHost(eligible, cfg).persist(StorageLevel.MEMORY_AND_DISK)
    val dequeued = ranked.filter(col("rank_in_host") <= col("budget"))
    // Two-phase ranking drops phase-1 losers from `ranked`, so the residual
    // must be computed against the full eligible set in that mode.
    val residual =
      if (cfg.twoPhaseDequeue)
        eligible.join(dequeued.select("url_hash"), Seq("url_hash"), "left_anti")
          .select(frontierCols.map(col): _*)
      else
        ranked.filter(col("rank_in_host") > col("budget"))
          .select(frontierCols.map(col): _*)
    // one job: eligible + dequeued counts (robots-blocked = frontierIn - eligible)
    val s1 = ranked.agg(count(lit(1)),
      sum(when(col("rank_in_host") <= col("budget"), 1L).otherwise(0L))).head()
    val dequeuedN = if (s1.isNullAt(1)) 0L else s1.getLong(1)
    // two-phase ranking drops phase-1 losers from `ranked`, so count the
    // full eligible set separately in that mode
    val eligibleN =
      if (cfg.twoPhaseDequeue) eligible.count() else s1.getLong(0)
    val blocked = frontierIn - eligibleN
    if (cfg.verbose) System.err.println(s"[round $round] dequeue done: $dequeuedN @${(System.nanoTime() - t0) / 1e9}")

    // ---- 2/3 fetch-simulation + extraction ----
    val fetchTs = timestamp_micros(
      lit(Corpus.FetchBaseMicros + round.toLong * cfg.roundLenMs * 1000L) +
        (col("rank_in_host") - 1).cast("long") * col("crawl_delay_ms") * lit(1000L))

    // J1 strategy: broadcast the dequeued side while it is small (no pages
    // movement, but the broadcast build is driver-serial); once a round
    // dequeues more than fetchBroadcastMax URLs, switch to a shuffled hash
    // join — if `pages` was pre-partitioned by url (CrawlDriver does this),
    // only the small dequeued side shuffles and the probe is fully parallel.
    // This is the strategy that survives scale: a 10^10-URL frontier round
    // can never broadcast its dequeued set.
    val dequeuedSel = dequeued.select("url", "url_hash", "host", "rank_in_host", "crawl_delay_ms")
    val fetchSide =
      if (dequeuedN <= cfg.fetchBroadcastMax) broadcast(dequeuedSel)
      else dequeuedSel.hint("shuffle_hash")
    val extracted = pages
      .join(fetchSide, Seq("url"), "inner")
      .withColumn("page", extract_page(col("html"))) // ONE html decode (E5+E6 fused)
      .withColumn("outlinks", col("page.outlinks"))
      .withColumn("etext", col("page.text"))
      .withColumn("n_links", size(col("outlinks")).cast("int"))
      .withColumn("fetch_ts", fetchTs)
      .drop("page", "html")
      .persist(StorageLevel.MEMORY_AND_DISK)

    val s2 = extracted.agg(count(lit(1)), coalesce(sum("n_links"), lit(0L))).head()
    val fetchedN = s2.getLong(0)
    val linksN = s2.getLong(1)
    if (cfg.verbose) System.err.println(s"[round $round] fetch+extract done: $fetchedN @${(System.nanoTime() - t0) / 1e9}")
    val missingN = dequeuedN - fetchedN

    val crawledDelta = extracted.select(
      col("url"), col("url_hash"), col("host"), lit(round).as("round"),
      col("rank_in_host"), col("fetch_ts"), col("etext").as("text"),
      col("lang"), col("n_links"))

    // ---- 4 discover: canonicalize, hash, dedup (in-batch + vs seen) ----
    val scoped = cfg.scopeHosts match {
      case Some(hs) => (df: DataFrame) => df.filter(col("host").isin(hs.toSeq: _*))
      case None     => (df: DataFrame) => df
    }
    val cand = scoped(
      extracted
        .select(col("warc_ts").as("parent_ts"), explode(col("outlinks")).as("raw_url"))
        .withColumn("url", url_canonicalize(col("raw_url")))
        // E2 via the shared core (UrlCanonical.host), NOT parse_url: the
        // built-in nulls out URLs java.net.URI rejects, which would drop
        // candidates the oracle keeps (engine≡oracle would diverge).
        .withColumn("host", url_host(col("url")))
        .filter(col("host").isNotNull))
      .groupBy("url")
      .agg(min(col("parent_ts")).as("warc_ts"), min(col("host")).as("host"))
      .withColumn("url_hash", xxhash64(col("url")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val candN = cand.count()
    if (cfg.verbose) System.err.println(s"[round $round] candidates done: $candN @${(System.nanoTime() - t0) / 1e9}")

    val seenKeys = seenAll.select("url_hash")
    val newUrls = bloomBytes match {
      case Some(b) if cfg.bloomPrefilter =>
        val mc = bloom_might_contain(lit(b), col("url_hash"))
        cand.filter(!mc) // bloom-absent ⇒ provably unseen: skip the anti-join
          .unionByName(cand.filter(mc).join(seenKeys, Seq("url_hash"), "left_anti"))
      case _ =>
        cand.join(seenKeys, Seq("url_hash"), "left_anti")
    }

    val newEntries = newUrls.select(
      col("url"), col("url_hash"), col("host"),
      xxhash64(col("host")).as("host_hash"),
      lit(Corpus.priorityAtRound(round)).as("priority"),
      lit(round).as("discovered_round"),
      col("warc_ts"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // one job: enqueued count + the seen-delta Bloom (merged by the driver)
    val (enqueuedN, bloomDelta) =
      if (cfg.bloomPrefilter) {
        val s3 = newEntries.agg(count(lit(1)),
          graft.spider.sketch.Sketches.bloomAgg(col("url_hash"),
            cfg.bloomExpectedItems, cfg.bloomFpp)).head()
        (s3.getLong(0), if (s3.getLong(0) > 0) Some(s3.getAs[Array[Byte]](1)) else None)
      } else (newEntries.count(), None)
    if (cfg.verbose) System.err.println(s"[round $round] antijoin done: $enqueuedN @${(System.nanoTime() - t0) / 1e9}")

    val frontierNext = residual.unionByName(newEntries)
    val seenDelta = newEntries.select(col("url_hash"), col("url"))

    // ---- per-host politeness clocks ----
    val roundHost = extracted.groupBy("host").agg(
      count(lit(1)).as("n"),
      max(col("fetch_ts")).as("last_fetch_ts"),
      first(col("crawl_delay_ms")).as("delay"))
    val hostStateNext = hostStatePrev
      .select(col("host"), col("next_allowed_ts").as("prev_ts"),
        col("crawl_delay_ms").as("prev_delay"), col("fetched_total").as("prev_total"))
      .join(roundHost, Seq("host"), "full_outer")
      .select(
        col("host"),
        xxhash64(col("host")).as("host_hash"),
        coalesce(
          timestamp_micros(unix_micros(col("last_fetch_ts")) + col("delay") * lit(1000L)),
          col("prev_ts")).as("next_allowed_ts"),
        coalesce(col("delay"), col("prev_delay")).as("crawl_delay_ms"),
        (coalesce(col("prev_total"), lit(0L)) + coalesce(col("n"), lit(0L))).as("fetched_total"))

    val counters = RoundCounters(round, frontierIn, blocked, dequeuedN, fetchedN,
      missingN, linksN, candN, candN - enqueuedN, enqueuedN,
      (eligibleN - dequeuedN) + enqueuedN)

    RoundOutput(crawledDelta, frontierNext, seenDelta, hostStateNext, counters,
      bloomDelta, Seq(ranked, extracted, cand, newEntries))
  }

  /** O1/W1: canonical per-host dequeue ranking. Plain single window by
    * default; a two-phase (salted pre-rank, then exact re-rank) variant for
    * mega-host skew (J4): per-(host,salt) top-budget is a superset of the
    * per-host top-budget, so phase 2 over the ~S·budget survivors per host is
    * exact while phase 1 spreads a hot host over S tasks. */
  private[spider] def rankPerHost(eligible: DataFrame, cfg: CrawlConfig): DataFrame = {
    val order = Seq(col("priority").desc, col("warc_ts").asc,
      col("url_hash").asc, col("url").asc)
    val w = Window.partitionBy("host").orderBy(order: _*)
    if (!cfg.twoPhaseDequeue) {
      eligible.withColumn("rank_in_host", row_number().over(w))
    } else {
      val s = math.max(2, cfg.saltFactor)
      val wSalt = Window.partitionBy(col("host"), pmod(col("url_hash"), lit(s.toLong)))
        .orderBy(order: _*)
      eligible
        .withColumn("presel_rank", row_number().over(wSalt))
        .filter(col("presel_rank") <= col("budget"))
        .drop("presel_rank")
        .withColumn("rank_in_host", row_number().over(w))
    }
  }
}
