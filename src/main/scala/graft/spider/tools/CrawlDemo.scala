package graft.spider.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.spider.CrawlDriver
import graft.spider.core.CrawlConfig
import graft.spider.state.CrawlCatalog

/** CLI surface: run (or resume) a crawl over the synthetic corpus.
  *
  *   runMain graft.spider.tools.CrawlDemo <sfDir> <stateDir> <rounds> [replicate]
  *
  * Prints the per-round counters from the committed snapshot manifests and
  * the head of the canonical crawl log.
  */
object CrawlDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val stateDir = if (args.length > 1) args(1) else "/tmp/graft-crawl-demo"
    val rounds = if (args.length > 2) args(2).toInt else 3
    val replicate = if (args.length > 3) args(3).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-crawl-demo")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .config("spark.driver.bindAddress", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cfg = CrawlConfig(rounds = rounds)
    val t0 = System.nanoTime()
    CrawlDriver.crawlFromSf(spark, sfDir, cfg, stateDir, replicate)
    val secs = (System.nanoTime() - t0) / 1e9

    val catalog = new CrawlCatalog(stateDir, spark)
    println(f"== crawl complete: rounds=$rounds state=$stateDir (${secs}%.1fs) ==")
    (1 to rounds).foreach { r =>
      val c = catalog.countersOf(r)
      println(s"round $r: frontier_in=${c.frontier_in} blocked=${c.robots_blocked} " +
        s"dequeued=${c.dequeued} fetched=${c.fetched} links=${c.links_extracted} " +
        s"enqueued=${c.enqueued} frontier_out=${c.frontier_out}")
    }
    val crawled = catalog.readCrawled(rounds)
    println(s"total crawled: ${crawled.count()}; seen set: " +
      s"${catalog.readSeen(rounds).count()} urls")
    println("crawl log head (round, host, rank, url, text[0:40]):")
    crawled.orderBy("round", "host", "rank_in_host")
      .select(col("round"), col("host"), col("rank_in_host"), col("url"),
        substring(col("text"), 1, 40).as("text_head"))
      .show(12, truncate = false)
    spark.stop()
  }
}
