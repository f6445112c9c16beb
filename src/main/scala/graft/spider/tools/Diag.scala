package graft.spider.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.spider.CrawlDriver
import graft.spider.core.CrawlConfig
import graft.spider.synth.PagesSynth

/** Scaling-bottleneck bisection harness:
  *   runMain graft.spider.tools.Diag <cpus> <shufflePartitions> <aqe> <bloom> <rounds> <replicate>
  */
object Diag {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val parts = args(1).toInt
    val aqe = args(2).toBoolean
    val bloom = args(3).toBoolean
    val rounds = args(4).toInt
    val replicate = args(5).toInt

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-diag")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.adaptive.enabled", aqe.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .config("spark.driver.bindAddress", "127.0.0.1")
      .config("spark.local.dir",
        sys.env.getOrElse("GRAFT_LOCAL_DIR", "/tmp"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    CrawlDriver.crawlFromSf(spark, "/root/testdata/sf0.1", CrawlConfig(rounds = 1),
      java.nio.file.Files.createTempDirectory("graft-warm-").toString) // JIT warmup

    val cfg = CrawlConfig(rounds = rounds, roundLenMs = 60000L, nSeeds = 1000,
      bloomPrefilter = bloom, verbose = true)
    val pages = PagesSynth.pages(spark, "/root/testdata/sf0.1", replicate, spreadHosts = true)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pages.count()
    val robots = PagesSynth.robotsFor(spark,
      pages.select(graft.spider.expr.SpiderFunctions.url_host(col("url")).as("host")).distinct())
    val t0 = System.nanoTime()
    CrawlDriver.run(spark, pages, PagesSynth.seeds(spark, "/root/testdata/sf0.1", cfg),
      robots, cfg, java.nio.file.Files.createTempDirectory("graft-diag-").toString)
    println(f"[diag] cpus=$cpus parts=$parts aqe=$aqe bloom=$bloom rounds=$rounds " +
      f"secs=${(System.nanoTime() - t0) / 1e9}%.1f")
    spark.stop()
  }
}
