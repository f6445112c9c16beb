package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.spider.CrawlDriver
import graft.spider.core.CrawlConfig

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * one full crawl round (dequeue → robots gate → politeness top-k →
    * fetch-simulation → extraction → discovery/dedup) over the synthesized
    * Common-Crawl-style corpus. */
  def entry(spark: SparkSession): DataFrame =
    CrawlDriver.crawlFromSf(spark, "/root/testdata/sf0.001",
      CrawlConfig(rounds = 1),
      java.nio.file.Files.createTempDirectory("graft-entry-").toString)

  /** One entry per implemented operator from SURVEY.md §2 (+ the
    * training-data pipeline operators). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Demos.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables — complete as of r5 (63/63). Ops without a
    * from-scratch SQL semantics use materialized state/expected fixtures:
    * hash/index state the oracle re-derives the result from (minhash,
    * simhash, LSH/IVF buckets), single-threaded oracle replays (crawl log,
    * multimodal kernels), or deterministic sketch contracts (bloom/cuckoo
    * no-false-negative, bounded-error bounds). */
  def oracleSql: Map[String, String] = graft.queries.Demos.oracleSql
}
