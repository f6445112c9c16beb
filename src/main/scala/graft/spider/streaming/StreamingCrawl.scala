package graft.spider.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.spider.expr.SpiderFunctions._

/** Structured Streaming analog of the batch crawl rounds (SURVEY.md §2.10).
  *
  * The batch-rounds engine stays the default (deterministic replay is the
  * correctness contract); this module maps each crawl concept onto the
  * streaming runtime for continuous operation:
  *
  *   ingestion      → file source over page drops, Trigger.AvailableNow
  *   URL dedup      → withWatermark + dropDuplicatesWithinWatermark(url_hash)
  *   extraction     → same Catalyst expressions (E1/E5/E6)
  *   politeness     → flatMapGroupsWithState keyed by host: the GroupState is
  *                    the per-host clock + fetch budget (HostState analog)
  *   reporting      → windowed aggregation with watermark
  */
object StreamingCrawl {

  val pageSchema: StructType = StructType(Seq(
    StructField("url", StringType), StructField("warc_ts", TimestampType),
    StructField("html", BinaryType), StructField("text", StringType),
    StructField("lang", StringType)))

  /** Continuous ingest: watch `pagesDir`, dedup by url hash within the
    * watermark, extract text + outlink count, append to `outDir`. */
  def ingest(spark: SparkSession, pagesDir: String, checkpointDir: String,
      outDir: String): StreamingQuery = {
    spark.readStream.schema(pageSchema).parquet(pagesDir)
      .withColumn("url", url_canonicalize(col("url")))
      .withColumn("url_hash", xxhash64(col("url")))
      .withWatermark("warc_ts", "1 hour")
      .dropDuplicatesWithinWatermark("url_hash")
      .select(col("url"), col("url_hash"),
        expr("parse_url(url, 'HOST')").as("host"), col("warc_ts"),
        extract_text(col("html")).as("text"),
        size(extract_outlinks(col("html"))).as("n_links"), col("lang"))
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  case class HostClock(host: String, fetched_total: Long, next_allowed_ms: Long)
  case class FetchEvent(host: String, url: String, ts_ms: Long)
  case class Admission(host: String, url: String, admitted: Boolean,
      scheduled_ms: Long, fetched_total: Long)

  /** Per-host politeness clock as streaming state: each incoming fetch
    * request is admitted at max(request ts, clock) and advances the clock by
    * the host's crawl delay — the GroupState is exactly the batch engine's
    * HostState row. */
  def politenessClock(events: Dataset[FetchEvent], delayMs: Long)
      : Dataset[Admission] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.host)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout())(
        (host: String, batch: Iterator[FetchEvent], state: GroupState[HostClock]) => {
          var clock = state.getOption.getOrElse(HostClock(host, 0L, 0L))
          val out = batch.toSeq.sortBy(e => (e.ts_ms, e.url)).map { e =>
            val sched = math.max(e.ts_ms, clock.next_allowed_ms)
            clock = HostClock(host, clock.fetched_total + 1, sched + delayMs)
            Admission(host, e.url, admitted = true, sched, clock.fetched_total)
          }
          state.update(clock)
          out.iterator
        })
  }

  /** Windowed per-host crawl report with late-data handling. */
  def windowedHostReport(pages: DataFrame): DataFrame =
    pages
      .withWatermark("warc_ts", "10 minutes")
      .groupBy(window(col("warc_ts"), "10 minutes"),
        expr("parse_url(url, 'HOST')").as("host"))
      .agg(count(lit(1)).as("n_pages"))
      .select(col("window.start").as("window_start"), col("host"), col("n_pages"))

  // ------------------------------------------------------------------
  // Continuous discovery loop (SURVEY §2.10 stretch, VERDICT r1 gap #2):
  // frontier discovery as a CHAINED streaming pipeline over file sources.
  // Each stage's checkpoint tracks processed files, so re-triggering with
  // Trigger.AvailableNow drains exactly the increment — repeated waves
  // form the continuous crawl loop without any batch-driver orchestration:
  //
  //   fetchedDir  --discover-->  frontierDir  --fetchJoin(corpus)-->  fetchedDir
  //
  // Politeness/ordering stay the batch engine's contract; the streaming
  // loop's contract is REACHABILITY: after k waves the fetched set equals
  // the k-step BFS closure of the seeds over the corpus link graph
  // (asserted against a batch BFS in StreamingCrawlSpec).
  // ------------------------------------------------------------------

  /** Stage 1: watch fetched pages, explode + canonicalize their outlinks
    * into frontier candidates (in-stream dedup within the watermark; the
    * exact cross-wave dedup is the fetch join's anti-join below). */
  def discover(spark: SparkSession, fetchedDir: String, checkpointDir: String,
      frontierDir: String): StreamingQuery = {
    spark.readStream.schema(pageSchema).parquet(fetchedDir)
      .select(col("warc_ts").as("parent_ts"),
        explode(extract_outlinks(col("html"))).as("raw_url"))
      .withColumn("url", url_canonicalize(col("raw_url")))
      .withColumn("url_hash", xxhash64(col("url")))
      .withColumn("host", url_host(col("url")))
      .filter(col("host").isNotNull)
      // Event time for dedup state = DISCOVERY time (the batch timestamp):
      // monotone across waves, like fetch time in a real crawl. The page's
      // warc_ts is corpus metadata and NOT monotone — watermarking on it
      // would drop later waves' candidates as late data.
      .withColumn("crawl_ts", current_timestamp())
      .withWatermark("crawl_ts", "1 hour")
      .dropDuplicatesWithinWatermark("url_hash")
      .select("url", "url_hash", "host", "parent_ts")
      .writeStream
      .format("parquet")
      .option("path", frontierDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Stage 2: fetch-simulation — stream the frontier, inner-join the STATIC
    * page corpus on url (stream-static join: no state store, the corpus
    * side is a plain scan each microbatch), drop urls already fetched
    * (stream-static anti-join against the fetched dir), append the newly
    * fetched pages back to `fetchedDir` — closing the loop. */
  def fetchWave(spark: SparkSession, corpus: DataFrame, frontierDir: String,
      checkpointDir: String, fetchedDir: String): StreamingQuery = {
    val frontierSchema = StructType(Seq(
      StructField("url", StringType), StructField("url_hash", LongType),
      StructField("host", StringType), StructField("parent_ts", TimestampType)))
    val stream = spark.readStream.schema(frontierSchema).parquet(frontierDir)
      .select("url")
    stream
      .join(corpus, Seq("url"), "inner")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // exact cross-wave seen check: static read of everything fetched so
        // far (file-source checkpoints dedup the FRONTIER increment; this
        // anti-join dedups across waves exactly, mirroring the batch J3)
        val spark2 = batch.sparkSession
        val already =
          try spark2.read.schema(pageSchema).parquet(fetchedDir).select("url")
          catch { case _: Throwable => spark2.emptyDataFrame.withColumn("url", lit("")) }
        batch.join(already, Seq("url"), "left_anti")
          .select("url", "warc_ts", "html", "text", "lang")
          .write.mode("append").parquet(fetchedDir)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Run `waves` discovery→fetch cycles over a CLOSED static corpus, seeded
    * by dropping the seed pages into `fetchedDir` first. Returns the fetched
    * corpus after the last wave. Each wave drains exactly the increment the
    * previous wave appended (file-source offsets in the checkpoints). */
  def discoveryLoop(spark: SparkSession, corpus: DataFrame, workDir: String,
      waves: Int): DataFrame = {
    val fetchedDir = s"$workDir/fetched"
    val frontierDir = s"$workDir/frontier"
    for (_ <- 1 to waves) {
      discover(spark, fetchedDir, s"$workDir/ckpt-discover", frontierDir)
        .awaitTermination()
      fetchWave(spark, corpus, frontierDir, s"$workDir/ckpt-fetch", fetchedDir)
        .awaitTermination()
    }
    spark.read.schema(pageSchema).parquet(fetchedDir)
  }

  // ------------------------------------------------------------------
  // FUSED loop (VERDICT r2 task #10): frontier + politeness in ONE
  // stateful streaming query. The per-host GroupState carries the batch
  // engine's whole per-host crawl state — politeness clock, pending
  // frontier queue, and the host's URL-seen set — so each trigger admits
  // exactly the politeness-budget top-k in the batch dequeue order and
  // retains the residual, replicating batch rounds wave-for-wave (asserted
  // in StreamingCrawlSpec: same (wave, host, rank, url) tuples as
  // CrawlDriver rounds under the same seeds + uniform budget).
  //
  // State-size note for real scale: pending+seen grow with the host's
  // frontier/history (exactly the state the batch engine keeps in IceLite
  // tables). A production continuous crawl would bound the in-state queue
  // and spill overflow to a re-queue topic/table; the sandbox loop keeps
  // it in state, matching the closed-corpus test sizes.
  // ------------------------------------------------------------------

  case class RawCand(url: String, url_hash: Long, host: String, parent_ts_us: Long,
      wave: Long)
  case class PendingUrl(url: String, url_hash: Long, warc_ts_us: Long, wave: Long)
  case class HostCrawlState(next_allowed_ms: Long, fetched_total: Long,
      pending: List[PendingUrl], seen: Set[Long])
  case class AdmittedFetch(host: String, url: String, url_hash: Long, wave: Long,
      rank_in_host: Int, sched_ms: Long)

  /** Sentinel url_hash for per-host tick rows: the re-trigger analog of a
    * GroupStateTimeout — with Trigger.AvailableNow a stateful group only
    * fires when it has input, so the loop driver appends one tick per known
    * host each wave, guaranteeing hosts with a non-empty pending queue get
    * their admission pass even when nothing new was discovered for them. */
  val TickHash: Long = Long.MinValue

  /** The fused admit function: in-wave exact dedup (min parent ts per url —
    * the batch `groupBy(url).agg(min warc_ts)`), cross-wave dedup against
    * the in-state seen set (the batch J3 anti-join), merge into the pending
    * queue, admit the top-`budget` in the batch dequeue order
    * (discovered-wave asc ≙ priority desc, then warc_ts, url_hash, url),
    * advance the politeness clock per admission. */
  private[streaming] def admitFn(budget: Int, delayMs: Long)(
      host: String, batch: Iterator[RawCand], state: GroupState[HostCrawlState])
      : Iterator[AdmittedFetch] = {
    val st0 = state.getOption.getOrElse(HostCrawlState(0L, 0L, Nil, Set.empty))
    val (ticks, cands) = batch.toSeq.partition(_.url_hash == TickHash)
    // current wave: ticks and candidates are both stamped with the wave
    // whose trigger drains them
    val wave = (ticks.map(_.wave) ++ cands.map(_.wave)).max
    // in-wave exact dedup: min parent_ts per url_hash (earliest wave
    // first). A candidate drained at wave w came from a page fetched at
    // wave w-1, so its batch discovered_round analog is w-1.
    val arrivals = cands
      .groupBy(_.url_hash)
      .map { case (_, xs) =>
        val first = xs.minBy(c => (c.wave, c.parent_ts_us, c.url))
        PendingUrl(first.url, first.url_hash,
          xs.filter(_.wave == first.wave).map(_.parent_ts_us).min, first.wave - 1)
      }
      .filterNot(p => st0.seen.contains(p.url_hash))
      .toSeq
    val pending = (st0.pending ++ arrivals)
      .sortBy(p => (p.wave, p.warc_ts_us, p.url_hash, p.url))
    val (admit, residual) = pending.splitAt(budget)
    var clock = st0.next_allowed_ms
    var total = st0.fetched_total
    val out = admit.zipWithIndex.map { case (p, i) =>
      val sched = clock
      clock += delayMs
      total += 1
      AdmittedFetch(host, p.url, p.url_hash, wave, i + 1, sched)
    }
    state.update(HostCrawlState(clock, total, residual,
      st0.seen ++ arrivals.map(_.url_hash)))
    out.iterator
  }

  /** Raw discovery for the fused loop: explode + canonicalize outlinks of
    * newly fetched pages, NO stream-side dedup — the fused stage's state
    * does all dedup exactly. Carries the wave number for ordering. */
  def discoverRaw(spark: SparkSession, fetchedDir: String, checkpointDir: String,
      frontierDir: String, wave: Long): StreamingQuery = {
    spark.readStream.schema(pageSchema).parquet(fetchedDir)
      .select(unix_micros(col("warc_ts")).as("parent_ts_us"),
        explode(extract_outlinks(col("html"))).as("raw_url"))
      .withColumn("url", url_canonicalize(col("raw_url")))
      .withColumn("url_hash", xxhash64(col("url")))
      .withColumn("host", url_host(col("url")))
      .filter(col("host").isNotNull)
      .withColumn("wave", lit(wave))
      .select("url", "url_hash", "host", "parent_ts_us", "wave")
      .writeStream
      // plain batch append, NOT the streaming parquet sink: the sink's
      // _spark_metadata log would make downstream readers ignore the loop
      // driver's tick files (batch appends into the same dir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(frontierDir)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** The fused stage: ONE stateful streaming query from raw candidates to
    * fetched pages — per-host frontier + seen + politeness in GroupState
    * (initialized from the seeds, mirroring the batch round-0 commit),
    * admitted URLs fetch-joined against the static corpus in foreachBatch
    * and appended back to `fetchedDir` to feed the next wave. */
  def fusedAdmitFetch(spark: SparkSession, corpus: DataFrame, frontierDir: String,
      checkpointDir: String, fetchedDir: String, admittedDir: String,
      seedsByHost: Dataset[(String, HostCrawlState)], budget: Int,
      delayMs: Long): StreamingQuery = {
    import spark.implicits._
    val candSchema = StructType(Seq(
      StructField("url", StringType), StructField("url_hash", LongType),
      StructField("host", StringType), StructField("parent_ts_us", LongType),
      StructField("wave", LongType)))
    spark.readStream.schema(candSchema).parquet(frontierDir)
      .as[RawCand]
      .groupByKey(_.host)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout(),
        seedsByHost.groupByKey(_._1).mapValues(_._2))(
        (host, batch, state: GroupState[HostCrawlState]) =>
          admitFn(budget, delayMs)(host, batch, state))
      .writeStream
      .foreachBatch { (admitted: Dataset[AdmittedFetch], _: Long) =>
        val s2 = admitted.sparkSession
        val adm = admitted.toDF()
        adm.write.mode("append").parquet(admittedDir)
        adm.select("url")
          .join(corpus, Seq("url"), "inner")
          .select("url", "warc_ts", "html", "text", "lang")
          .write.mode("append").parquet(fetchedDir)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Drive `waves` fused cycles; returns the admitted log (wave, host,
    * rank_in_host, url — the tuples the batch-equivalence spec compares
    * against CrawlDriver rounds).
    *
    * Wave 0 ≙ the batch round-0 seed commit: per-host GroupState starts
    * with the seeds in PENDING (discovered wave 0) and in `seen`, so wave 1
    * admits the politeness-top-k of the seeds exactly like batch round 1
    * dequeues them (over-budget seeds stay pending — same residual
    * semantics). fetchedDir starts empty; admitted URLs fetch-join the
    * corpus and append there, feeding the next wave's discovery. */
  def fusedLoop(spark: SparkSession, corpus: DataFrame, workDir: String,
      seeds: DataFrame, budget: Int, delayMs: Long, waves: Int): DataFrame = {
    import spark.implicits._
    val fetchedDir = s"$workDir/fetched"
    val frontierDir = s"$workDir/frontier"
    val admittedDir = s"$workDir/admitted"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(fetchedDir))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(frontierDir))

    val seedRows = seeds
      .select(col("host"), col("url"), col("url_hash"),
        unix_micros(col("warc_ts")).as("warc_ts_us"))
      .as[(String, String, Long, Long)].collect()
    val seedStates = seedRows.groupBy(_._1).map { case (h, xs) =>
      (h, HostCrawlState(0L, 0L,
        xs.map(x => PendingUrl(x._2, x._3, x._4, 0L)).toList,
        xs.map(_._3).toSet))
    }.toSeq.toDS()
    val knownHosts = scala.collection.mutable.Set[String](seedRows.map(_._1): _*)

    for (w <- 1L to waves.toLong) {
      discoverRaw(spark, fetchedDir, s"$workDir/ckpt-discover", frontierDir, w)
        .awaitTermination()
      // tick every known host (hosts can also ARRIVE this wave — collect
      // them from the frontier dir so next wave ticks them too)
      knownHosts ++= spark.read.schema(StructType(Seq(
          StructField("url", StringType), StructField("url_hash", LongType),
          StructField("host", StringType), StructField("parent_ts_us", LongType),
          StructField("wave", LongType))))
        .parquet(frontierDir)
        .select("host").distinct().as[String].collect()
      knownHosts.toSeq.sorted
        .map(h => (null.asInstanceOf[String], TickHash, h, 0L, w))
        .toDF("url", "url_hash", "host", "parent_ts_us", "wave")
        .write.mode("append").parquet(frontierDir)
      fusedAdmitFetch(spark, corpus, frontierDir, s"$workDir/ckpt-fused",
        fetchedDir, admittedDir, seedStates, budget, delayMs)
        .awaitTermination()
    }
    spark.read.parquet(admittedDir)
  }
}
