package graft.spider.core

import java.time.Instant

/** Engine schemas (SURVEY.md §1.2) as typed Dataset row classes. Column
  * names are normative — the checkpoint layout, the oracle comparison and
  * the SparkEntry demo queries all key on them. */

/** Input corpus row — exactly the BASELINE.json input_hint shape. */
case class PageRow(
    url: String,
    warc_ts: Instant,
    html: Array[Byte],
    text: String,
    lang: String)

/** Crawl frontier entry (checkpointed per round). */
case class FrontierEntry(
    url: String,
    url_hash: Long,
    host: String,
    host_hash: Long,
    priority: Int,
    discovered_round: Int,
    warc_ts: Instant)

/** Output record — one fetched+extracted page. */
case class CrawledPage(
    url: String,
    url_hash: Long,
    host: String,
    round: Int,
    rank_in_host: Int,
    fetch_ts: Instant,
    text: String,
    lang: String,
    n_links: Int)

/** Exact URL-seen set row (everything ever enqueued). */
case class SeenUrl(url_hash: Long, url: String)

/** Per-host politeness state. */
case class HostState(
    host: String,
    host_hash: Long,
    next_allowed_ts: Instant,
    crawl_delay_ms: Long,
    fetched_total: Long)

/** Per-host robots rules. */
case class RobotsRule(host: String, disallow_prefixes: Seq[String], crawl_delay_ms: Long)

/** Crawl parameters — everything the ordering contract depends on. */
case class CrawlConfig(
    rounds: Int = 3,
    roundLenMs: Long = 4000L,
    nSeeds: Int = 10,
    seedPriority: Int = 100,
    /** restrict crawl to these hosts; None = hosts present in the corpus */
    scopeHosts: Option[Set[String]] = None,
    /** hosts holding more than this share of the dequeued round are salted (J4) */
    skewHostShare: Double = 0.25,
    saltFactor: Int = 16,
    /** salted two-phase dequeue ranking for mega-host skew (J4/W1) */
    twoPhaseDequeue: Boolean = false,
    bloomPrefilter: Boolean = true,
    /** dequeued rows above this switch the fetch join from broadcast to
      * shuffled-hash (pages side pre-partitioned by url stays in place) */
    fetchBroadcastMax: Long = 100000L,
    /** per-round phase timing to stderr */
    verbose: Boolean = false,
    bloomExpectedItems: Long = 1L << 20,
    bloomFpp: Double = 0.03)

/** Per-round counters → snapshot manifest (SURVEY.md §4.4). */
case class RoundCounters(
    round: Int,
    frontier_in: Long,
    robots_blocked: Long,
    dequeued: Long,
    fetched: Long,
    fetch_missing: Long,
    links_extracted: Long,
    candidates_new: Long,
    deduped_seen: Long,
    enqueued: Long,
    frontier_out: Long)
