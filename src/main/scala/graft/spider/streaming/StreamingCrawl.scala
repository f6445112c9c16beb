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
}
