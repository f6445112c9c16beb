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
}
