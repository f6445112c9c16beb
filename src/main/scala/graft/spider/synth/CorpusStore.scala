package graft.spider.synth

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed on-disk corpus layout (SURVEY.md §2.1 S2 at scale).
  *
  * The crawl's fetch join probes the corpus by `url` every round
  * (`CrawlEngine.buildDequeue`). At design scale the corpus is a ~100-TB
  * table that must NOT be exchanged per round, and must NOT live in executor
  * memory — it streams from storage, hash-clustered on the join key, exactly
  * like an Iceberg/Hive table bucketed on `url`. This module materializes
  * that layout with Spark's native bucketing:
  *
  *   - `write`: one-time `bucketBy(buckets, "url")` parquet write. The
  *     pre-`repartition` on the same key with a partition count that is a
  *     multiple of `buckets` co-aligns shuffle partitions with bucket ids
  *     (both are `pmod(murmur3(url), n)`, and `n % buckets == 0` makes the
  *     task→bucket map single-valued), so every write task emits exactly one
  *     well-sized file instead of up to `buckets` small ones.
  *   - `open`: registers the written files as an external bucketed table in
  *     the session catalog (plain DDL — no Hive metastore needed) and
  *     returns its scan. `FileSourceScanExec` then reports
  *     `HashPartitioning(url, buckets)`, so the per-round fetch join
  *     shuffles only the (round-sized) dequeued side into the bucket
  *     grouping: NO Exchange above the corpus scan, vectorized parquet
  *     decode, nothing pinned in the block manager.
  *
  * A `_graft_corpus.json` sidecar records the bucket count + row count so
  * `open` in a later session (the scaling bench runs one JVM per
  * parallelism level) redeclares the identical layout; a mismatched
  * redeclaration would silently mis-bucket the join, so `open` has no
  * bucket-count parameter at all.
  */
object CorpusStore {

  val TableName = "graft_pages_corpus"
  val MetaFile = "_graft_corpus.json"

  /** Write `pages` as a url-bucketed external parquet table at `dir`.
    * Returns the row count (from the shuffled write input, no extra job). */
  def write(spark: SparkSession, pages: DataFrame, dir: String, buckets: Int): Long = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val par = spark.sparkContext.defaultParallelism
    val parts = buckets * math.max(1, par / buckets)
    pages.repartition(parts, col("url"))
      .write.format("parquet")
      .bucketBy(buckets, "url")
      .mode("overwrite")
      .option("path", dir)
      .saveAsTable(TableName)
    val rows = spark.table(TableName).count() // parquet metadata count — cheap
    val meta = s"""{"buckets":$buckets,"rows":$rows}"""
    Files.write(Paths.get(dir, MetaFile), meta.getBytes(StandardCharsets.UTF_8))
    rows
  }

  def exists(dir: String): Boolean = Files.exists(Paths.get(dir, MetaFile))

  private def metaOf(dir: String): (Int, Long) = {
    val txt = new String(Files.readAllBytes(Paths.get(dir, MetaFile)), StandardCharsets.UTF_8)
    def field(k: String): Long = {
      val m = s""""$k":\\s*(\\d+)""".r.findFirstMatchIn(txt)
      m.getOrElse(throw new IllegalStateException(s"$MetaFile at $dir missing '$k'"))
        .group(1).toLong
    }
    (field("buckets").toInt, field("rows"))
  }

  /** Register the layout written by `write` (possibly by another JVM) as an
    * external bucketed table and return its scan. Idempotent per session. */
  def open(spark: SparkSession, dir: String): DataFrame = {
    val (buckets, _) = metaOf(dir)
    // Schema from the parquet footers themselves — the DDL must match the
    // files exactly or the scan misreads, so never hardcode it here.
    val schemaDdl = spark.read.parquet(dir).schema.toDDL
    spark.sql(s"DROP TABLE IF EXISTS $TableName")
    spark.sql(
      s"""CREATE TABLE $TableName ($schemaDdl)
         |USING parquet
         |CLUSTERED BY (url) INTO $buckets BUCKETS
         |LOCATION '$dir'""".stripMargin)
    spark.table(TableName)
  }

  /** `rows` recorded at write time (cheaper than re-counting a cold table). */
  def rowCount(dir: String): Long = metaOf(dir)._2
}
