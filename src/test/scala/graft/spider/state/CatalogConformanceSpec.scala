package graft.spider.state

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.spider.{CrawlDriver, SparkTestBase}
import graft.spider.core.CrawlConfig
import graft.spider.synth.PagesSynth

/** The Iceberg-swap-seam proof (VERDICT r4 "smaller" task): the SAME crawl —
  * compaction firing in-loop, kill/resume, in-crawl expiration — must produce
  * identical results whether snapshot manifests live one-file-per-round
  * (CrawlCatalog) or in a single atomically-replaced metadata document
  * (SingleFileCatalog, the Iceberg metadata.json model). Everything but the
  * six manifest-persistence methods is shared, so agreement here pins the
  * engine ↔ snapshot-store interface, not a coincidence of two codebases. */
class CatalogConformanceSpec extends AnyFunSuite with SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def tmpState(): String =
    Files.createTempDirectory("graft-cat-conf-").toString

  private val singleFile: (String, org.apache.spark.sql.SparkSession) => CrawlCatalog =
    (d, s) => new SingleFileCatalog(d, s)

  private lazy val pagesDf = {
    val df = PagesSynth.pages(spark, sfDir).persist()
    df.count()
    df
  }

  private def crawl(cfg: CrawlConfig, stateDir: String,
      factory: (String, org.apache.spark.sql.SparkSession) => CrawlCatalog): CrawlCatalog =
    CrawlDriver.run(spark, pagesDf, PagesSynth.seeds(spark, sfDir, cfg),
      PagesSynth.robots(spark, sfDir), cfg, stateDir, factory)

  private def crawledKey(c: CrawlCatalog, round: Int) =
    c.readCrawled(round)
      .select(col("round"), col("host"), col("rank_in_host"), col("url"),
        unix_micros(col("fetch_ts")), col("text"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2), r.getString(3),
        r.getLong(4), r.getString(5)))
      .sortBy(t => (t._1, t._2, t._3)).toSeq

  private def seenKey(c: CrawlCatalog, round: Int): Set[Long] =
    c.readSeen(round).select("url_hash").collect().map(_.getLong(0)).toSet

  test("same crawl (compaction in-loop) over both manifest stores: " +
      "identical crawled/seen/frontier/counters; single-file store really " +
      "keeps ONE metadata document") {
    val cfg = CrawlConfig(rounds = 5, compactSeenEvery = 2)
    val perRound = crawl(cfg, tmpState(), (d, s) => new CrawlCatalog(d, s))
    val oneDoc = crawl(cfg, tmpState(), singleFile)
    assert(crawledKey(perRound, 5) == crawledKey(oneDoc, 5))
    assert(seenKey(perRound, 5) == seenKey(oneDoc, 5))
    (1 to 5).foreach(r => assert(perRound.countersOf(r) == oneDoc.countersOf(r)))
    assert(perRound.readFrontier(5).count() == oneDoc.readFrontier(5).count())
    // the stores really differ: per-round files vs one metadata.json
    def snapFiles(c: CrawlCatalog): Set[String] = {
      val s = Files.list(Paths.get(c.root, "snapshots"))
      try s.iterator().asScala.map(_.getFileName.toString).toSet finally s.close()
    }
    assert(snapFiles(perRound).count(_.startsWith("snapshot-")) == 6) // r0..r5
    assert(snapFiles(oneDoc) == Set("metadata.json"))
    // and both agree on the manifest CONTENT surface (seen_base lineage)
    assert(perRound.manifest(4).get("seen_base").get("rows").asLong() ==
      oneDoc.manifest(4).get("seen_base").get("rows").asLong())
  }

  test("kill/resume over the single-file store ≡ uninterrupted " +
      "(a fresh instance re-reads the metadata document)") {
    val cfg = CrawlConfig(rounds = 4, compactSeenEvery = 2)
    val dir = tmpState()
    crawl(cfg.copy(rounds = 2), dir, singleFile) // "killed" after round 2
    val resumed = crawl(cfg, dir, singleFile)
    val fresh = crawl(cfg, tmpState(), singleFile)
    assert(crawledKey(resumed, 4) == crawledKey(fresh, 4))
    assert(seenKey(resumed, 4) == seenKey(fresh, 4))
    (1 to 4).foreach(r => assert(resumed.countersOf(r) == fresh.countersOf(r)))
  }

  test("expiration over the single-file store: horizon honored, crawled " +
      "output survives, expired manifests removed from the document") {
    val cfg = CrawlConfig(rounds = 6, compactSeenEvery = 2)
    val c = crawl(cfg, tmpState(), singleFile)
    val before = crawledKey(c, 6)
    val horizon = c.expireSnapshots(keepLast = 2)
    assert(horizon.exists(_ >= 1))
    // crawled data is live output — identical through the same instance…
    assert(crawledKey(c, 6) == before)
    // …and through a FRESH instance over the swept store (rollup read back)
    val re = new SingleFileCatalog(c.root, spark)
    assert(crawledKey(re, 6) == before)
    assert(re.countersOf(1).round == 1) // rollup counters survive
    intercept[IllegalStateException](re.manifest(horizon.get))
  }
}
