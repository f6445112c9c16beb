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
      .withColumn("host", expr("parse_url(url, 'HOST')"))
      .select(col("url"), col("url_hash"), col("host"), col("warc_ts"),
        extract_text(col("html"), col("host")).as("text"),
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
      frontierDir: String, wave: Long): StreamingQuery = {
    spark.readStream.schema(pageSchema).parquet(fetchedDir)
      .select(col("warc_ts").as("parent_ts"),
        explode(extract_outlinks(col("html"))).as("raw_url"))
      .withColumn("url", url_canonicalize(col("raw_url")))
      .withColumn("url_hash", xxhash64(col("url")))
      .withColumn("host", url_host(col("url")))
      .filter(col("host").isNotNull)
      // Event time for dedup state = the WAVE NUMBER as an epoch-seconds
      // timestamp: monotone across waves (like fetch time in a real crawl)
      // and DETERMINISTIC — the engine's rule forbids wall-clock reads in
      // any data path (`discoverRaw` stamps waves the same way). The page's
      // warc_ts is corpus metadata and NOT monotone — watermarking on it
      // would drop later waves' candidates as late data.
      .withColumn("crawl_ts", timestamp_seconds(lit(wave)))
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
    for (w <- 1 to waves) {
      discover(spark, fetchedDir, s"$workDir/ckpt-discover", frontierDir, w.toLong)
        .awaitTermination()
      fetchWave(spark, corpus, frontierDir, s"$workDir/ckpt-fetch", fetchedDir)
        .awaitTermination()
    }
    spark.read.schema(pageSchema).parquet(fetchedDir)
  }

  // ------------------------------------------------------------------
  // FUSED loop (VERDICT r2 task #10; state BOUNDED per VERDICT r3 task #4):
  // frontier + politeness in ONE stateful streaming query. The per-host
  // GroupState carries the politeness clock plus a CAPPED pending queue;
  // each trigger admits exactly the politeness-budget top-k in the batch
  // dequeue order, keeps at most `maxPending` residuals in state, and
  // SPILLS the overflow to a re-queue parquet dir that is drained (as a
  // second stream source) next wave — so state size is O(maxPending) per
  // host no matter how large the host's frontier grows. The URL-seen set
  // is NOT in state either: exact cross-wave dedup is a stream-static
  // anti-join against the append-only enqueued log (the batch J3 analog),
  // fronted by the engine's sharded Bloom as a broadcast prefilter (the
  // batch F2 analog — false positives only cost the exact join the work it
  // would have done; false "new" is impossible for logged hashes). The
  // replicated batch semantics are asserted in StreamingCrawlSpec: same
  // (wave, host, rank, url) tuples as CrawlDriver rounds under the same
  // seeds + uniform budget — including with a forced-zero cap, where every
  // residual cycles through the spill path every wave.
  //
  // At real scale the enqueued log is the engine's bucketed seen table
  // (the anti-join then runs storage-partitioned, like batch J3); the
  // sandbox keeps it as one flat parquet dir.
  // ------------------------------------------------------------------

  case class RawCand(url: String, url_hash: Long, host: String, parent_ts_us: Long,
      wave: Long)
  /** A raw candidate tagged with its dedup provenance: `requeue` rows come
    * from the spill dir (already in the enqueued log — they must BYPASS the
    * anti-join and must not be re-logged). */
  case class FusedCand(url: String, url_hash: Long, host: String,
      parent_ts_us: Long, wave: Long, requeue: Boolean)
  case class PendingUrl(url: String, url_hash: Long, warc_ts_us: Long, wave: Long)
  case class HostCrawlState(next_allowed_ms: Long, fetched_total: Long,
      pending: List[PendingUrl])
  /** The fused stage's tagged output: `admit` rows feed the fetch join and
    * the admitted log, `enq` rows append to the enqueued (seen) log and the
    * hosts table, `spill` rows re-queue for the next wave. */
  case class FusedOut(kind: String, host: String, url: String, url_hash: Long,
      wave: Long, rank_in_host: Int, sched_ms: Long, warc_ts_us: Long,
      disc_wave: Long)

  /** Sentinel url_hash for per-host tick rows: the re-trigger analog of a
    * GroupStateTimeout — with Trigger.AvailableNow a stateful group only
    * fires when it has input, so the loop driver appends one tick per known
    * host each wave, guaranteeing hosts with a non-empty pending queue get
    * their admission pass even when nothing new was discovered for them. */
  val TickHash: Long = Long.MinValue

  /** The fused admit function: in-wave exact dedup (min parent ts per url —
    * the batch `groupBy(url).agg(min warc_ts)`; cross-wave dedup already
    * happened upstream via the enqueued-log anti-join, so a candidate that
    * reaches this function is either genuinely new or a spill re-queue),
    * merge into the pending queue, admit the top-`budget` in the batch
    * dequeue order (discovered-wave asc ≙ priority desc, then warc_ts,
    * url_hash, url), advance the politeness clock per admission, keep at
    * most `maxPending` residuals in state and spill the rest. Spilled rows
    * preserve their PendingUrl fields, so a URL can cycle through the spill
    * path any number of waves without its dequeue-order key changing. */
  private[streaming] def admitFn(budget: Int, delayMs: Long, maxPending: Int)(
      host: String, batch: Iterator[FusedCand], state: GroupState[HostCrawlState])
      : Iterator[FusedOut] = {
    val st0 = state.getOption.getOrElse(HostCrawlState(0L, 0L, Nil))
    val (ticks, cands) = batch.toSeq.partition(_.url_hash == TickHash)
    // current wave: ticks and candidates are both stamped with the wave
    // whose trigger drains them
    val wave = (ticks.map(_.wave) ++ cands.map(_.wave)).max
    // in-wave exact dedup: min parent_ts per url_hash (earliest wave
    // first). A candidate drained at wave w came from a page fetched at
    // wave w-1, so its batch discovered_round analog is w-1; a re-queued
    // spill row was written with wave = its original disc_wave + 1, so the
    // same formula restores its original dequeue-order key.
    val arrivalsTagged = cands
      .groupBy(_.url_hash)
      .map { case (_, xs) =>
        val first = xs.minBy(c => (c.wave, c.parent_ts_us, c.url))
        (PendingUrl(first.url, first.url_hash,
          xs.filter(_.wave == first.wave).map(_.parent_ts_us).min, first.wave - 1),
          xs.forall(_.requeue))
      }
      .toSeq
    val arrivals = arrivalsTagged.map(_._1)
    val pending = (st0.pending ++ arrivals)
      .sortBy(p => (p.wave, p.warc_ts_us, p.url_hash, p.url))
    val (admit, rest) = pending.splitAt(budget)
    val (keep, spill) = rest.splitAt(maxPending)
    var clock = st0.next_allowed_ms
    var total = st0.fetched_total
    val admitted = admit.zipWithIndex.map { case (p, i) =>
      val sched = clock
      clock += delayMs
      total += 1
      FusedOut("admit", host, p.url, p.url_hash, wave, i + 1, sched, 0L, 0L)
    }
    // log only FRESH arrivals (re-queued rows are already in the log)
    val enqueued = arrivalsTagged.collect { case (p, false) =>
      FusedOut("enq", host, p.url, p.url_hash, wave, 0, 0L, p.warc_ts_us, p.wave)
    }
    val spilled = spill.map(p =>
      FusedOut("spill", host, p.url, p.url_hash, wave, 0, 0L, p.warc_ts_us, p.wave))
    state.update(HostCrawlState(clock, total, keep))
    (admitted ++ enqueued ++ spilled).iterator
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

  private val candSchema = StructType(Seq(
    StructField("url", StringType), StructField("url_hash", LongType),
    StructField("host", StringType), StructField("parent_ts_us", LongType),
    StructField("wave", LongType)))

  // enqueued-log Bloom prefilter layout (fixed; the log is sandbox-sized)
  private val BloomShards = 16
  private val BloomPerShard = 65536L
  private val BloomFpp = 0.03

  /** The fused stage: ONE stateful streaming query from raw candidates to
    * fetched pages. Two stream sources union — fresh candidates (exact-
    * deduped against the static enqueued log behind the sharded-Bloom
    * prefilter, the batch F2→J3 shape) and spill re-queues (already
    * logged, so they bypass the dedup). Per-host GroupState (initialized
    * from the seeds, mirroring the batch round-0 commit) admits the
    * politeness top-k; foreachBatch fans the tagged output to the admitted
    * log + fetch join, the enqueued log + hosts table, and the re-queue
    * dir — closing the loop for the next wave. */
  def fusedAdmitFetch(spark: SparkSession, corpus: DataFrame, frontierDir: String,
      requeueDir: String, enqueuedDir: String, hostsDir: String,
      checkpointDir: String, fetchedDir: String, admittedDir: String,
      seedsByHost: Dataset[(String, HostCrawlState)], budget: Int,
      delayMs: Long, maxPending: Int,
      bloomBlob: Array[Byte], bloomDeltaOut: java.util.concurrent.atomic.AtomicReference[Array[Byte]])
      : StreamingQuery = {
    import spark.implicits._
    import graft.spider.sketch.Sketches
    val enqLog = spark.read.schema(StructType(Seq(
      StructField("url_hash", LongType)))).parquet(enqueuedDir)
      .withColumn("__hit", lit(true))
    val freshSrc = spark.readStream.schema(candSchema).parquet(frontierDir)
    // batch F2 analog: definitely-new hashes skip the exact anti-join; only
    // the maybe-seen slice pays the stream-static join against the log.
    // A Bloom false positive costs the join the work it would have done; a
    // false "new" is impossible for hashes actually logged. Tick rows pass
    // either branch (TickHash is never logged).
    val bloomBc = spark.sparkContext.broadcast(Sketches.shardedFrom(bloomBlob))
    val mc = graft.spider.expr.SpiderFunctions
      .bloom_sharded_might_contain(bloomBc, col("url_hash"))
    val fresh = freshSrc.filter(!mc)
      .unionByName(
        // left_outer + null-filter ≙ left_anti (the stream-static shape the
        // batch classic join uses); duplicate log rows cannot multiply
        // output because only match-less rows survive
        freshSrc.filter(mc)
          .join(enqLog, Seq("url_hash"), "left_outer")
          .filter(col("__hit").isNull).drop("__hit"))
      .withColumn("requeue", lit(false))
    val requeued = spark.readStream.schema(candSchema).parquet(requeueDir)
      .withColumn("requeue", lit(true))
    fresh.unionByName(requeued)
      .as[FusedCand]
      .groupByKey(_.host)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout(),
        seedsByHost.groupByKey(_._1).mapValues(_._2))(
        (host, batch, state: GroupState[HostCrawlState]) =>
          admitFn(budget, delayMs, maxPending)(host, batch, state))
      .writeStream
      .foreachBatch { (out: Dataset[FusedOut], _: Long) =>
        val s2 = out.sparkSession
        val o = out.toDF().persist()
        try {
          val enq = o.filter(col("kind") === "enq")
          enq.select("url_hash").write.mode("append").parquet(enqueuedDir)
          // hosts table: append only hosts not yet known — a distributed
          // anti-join, no driver collect (VERDICT r3 task #4c). Reading and
          // appending the same dir is safe: the listing resolves before the
          // write lands new files (same pattern as fetchWave above).
          enq.select("host").distinct()
            .join(s2.read.schema(StructType(Seq(StructField("host", StringType))))
              .parquet(hostsDir), Seq("host"), "left_anti")
            .write.mode("append").parquet(hostsDir)
          // the wave's Bloom delta (one blob to the driver — it IS the next
          // wave's broadcast prefilter model, the batch A1 shape).
          // ACCUMULATE across micro-batches, don't replace: AvailableNow
          // runs one batch per wave today, but under any future rate limit
          // (maxFilesPerTrigger) a replaced earlier batch's hashes would
          // vanish from the cross-wave Bloom — and rows failing
          // might_contain bypass the exact anti-join entirely, so a lost
          // hash re-admits an already-logged URL (ADVICE r4 #1).
          val delta = enq.agg(Sketches.shardedBloomAgg(col("url_hash"),
            BloomShards, BloomPerShard, BloomFpp)).head().getAs[Array[Byte]](0)
          bloomDeltaOut.getAndUpdate(prev =>
            if (prev == null) delta else Sketches.mergeShardedBlobs(prev, delta))
          val adm = o.filter(col("kind") === "admit")
          adm.select("host", "url", "url_hash", "wave", "rank_in_host", "sched_ms")
            .write.mode("append").parquet(admittedDir)
          adm.select("url")
            .join(corpus, Seq("url"), "inner")
            .select("url", "warc_ts", "html", "text", "lang")
            .write.mode("append").parquet(fetchedDir)
          // spill re-queue: original dequeue-order key preserved (wave is
          // written +1 so admitFn's wave-1 restores disc_wave)
          o.filter(col("kind") === "spill")
            .select(col("url"), col("url_hash"), col("host"),
              col("warc_ts_us").as("parent_ts_us"),
              (col("disc_wave") + 1L).as("wave"))
            .write.mode("append").parquet(requeueDir)
        } finally { o.unpersist(); () }
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
    * with the seeds in PENDING (discovered wave 0); the seeds also
    * initialize the enqueued log + its Bloom (the batch round-0 seen
    * commit) and the hosts table. Hosts are ticked from the hosts table —
    * a distributed append, never a driver collect; a host first appearing
    * in a wave needs no tick that wave (its group fires on its own
    * candidate input) and is in the table for every later wave.
    * `maxPending` bounds the per-host in-state queue; overflow spills to
    * the re-queue dir and re-enters next wave (0 = nothing stays in state
    * beyond the politeness clock). */
  def fusedLoop(spark: SparkSession, corpus: DataFrame, workDir: String,
      seeds: DataFrame, budget: Int, delayMs: Long, waves: Int,
      maxPending: Int = Int.MaxValue): DataFrame = {
    import spark.implicits._
    import graft.spider.sketch.Sketches
    val fetchedDir = s"$workDir/fetched"
    val frontierDir = s"$workDir/frontier"
    val admittedDir = s"$workDir/admitted"
    val requeueDir = s"$workDir/requeue"
    val enqueuedDir = s"$workDir/enqueued"
    val hostsDir = s"$workDir/hosts"
    Seq(fetchedDir, frontierDir, requeueDir).foreach(d =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d)))

    val seedSel = seeds.select(col("host"), col("url"), col("url_hash"),
      unix_micros(col("warc_ts")).as("warc_ts_us"))
    // distributed seed state build — no driver collect (task #4c)
    val seedStates: Dataset[(String, HostCrawlState)] = seedSel
      .as[(String, String, Long, Long)]
      .groupByKey(_._1)
      .mapGroups { (h, it) =>
        (h, HostCrawlState(0L, 0L,
          it.map(x => PendingUrl(x._2, x._3, x._4, 0L)).toList))
      }
    // seeds ≙ batch round-0 seen commit: enqueued log + hosts table + Bloom
    seedSel.select("url_hash").write.mode("overwrite").parquet(enqueuedDir)
    seedSel.select("host").distinct().write.mode("overwrite").parquet(hostsDir)
    var bloomBlob = seedSel.agg(Sketches.shardedBloomAgg(col("url_hash"),
      BloomShards, BloomPerShard, BloomFpp)).head().getAs[Array[Byte]](0)
    val bloomDelta = new java.util.concurrent.atomic.AtomicReference[Array[Byte]]()

    for (w <- 1L to waves.toLong) {
      discoverRaw(spark, fetchedDir, s"$workDir/ckpt-discover", frontierDir, w)
        .awaitTermination()
      // tick every host in the hosts table (distributed append)
      spark.read.schema(StructType(Seq(StructField("host", StringType))))
        .parquet(hostsDir)
        .select(lit(null).cast(StringType).as("url"), lit(TickHash).as("url_hash"),
          col("host"), lit(0L).as("parent_ts_us"), lit(w).as("wave"))
        .write.mode("append").parquet(frontierDir)
      bloomDelta.set(null)
      fusedAdmitFetch(spark, corpus, frontierDir, requeueDir, enqueuedDir,
        hostsDir, s"$workDir/ckpt-fused", fetchedDir, admittedDir, seedStates,
        budget, delayMs, maxPending, bloomBlob, bloomDelta)
        .awaitTermination()
      Option(bloomDelta.get()).foreach(d =>
        bloomBlob = Sketches.mergeShardedBlobs(bloomBlob, d))
    }
    spark.read.parquet(admittedDir)
  }
}
