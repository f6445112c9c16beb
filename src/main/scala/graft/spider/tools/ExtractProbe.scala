package graft.spider.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.spider.expr.SpiderFunctions._
import graft.spider.synth.PagesSynth

/** Codegen-policy measurement (BENCH/BASELINE.md, VERDICT r2 task #9):
  * what fraction of wall time does the CodegenFallback `extract_page`
  * expression cost at bench page sizes? Times, over the same noise-padded
  * corpus at the same parallelism, (a) a pure column scan, (b) scan +
  * extract_page, (c) scan + extract_text. The extract cost per page is
  * (b) - (a).
  *   runMain graft.spider.tools.ExtractProbe <sfDir> <replicate> <noise> <cpus>
  */
object ExtractProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val replicate = if (args.length > 1) args(1).toInt else 20
    val noise = if (args.length > 2) args(2).toInt else 17000
    val cpus = if (args.length > 3) args(3).toInt else 4
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus * 2).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .config("spark.driver.bindAddress", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val pages = PagesSynth.pages(spark, sfDir, replicate, spreadHosts = true,
        noiseLen = noise)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = pages.count()

    def time(label: String)(f: => Long): Double = {
      f // warm
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label: $s%.2f s (${n / s}%.0f pages/s)")
      s
    }
    // NOTE: aggregate the DERIVED column — an unreferenced projection is
    // pruned away and times nothing
    val scan = time("scan only      ")(pages.select(octet_length(col("html")).as("n"))
      .agg(sum(col("n"))).head().getLong(0))
    val page = time("scan + extract_page")(pages
      .select(extract_page(col("html"), url_host(col("url"))).as("p"))
      .select((size(col("p.outlinks")) + length(col("p.text"))).as("n"))
      .agg(sum(col("n"))).head().getLong(0))
    val text = time("scan + extract_text")(pages
      .select(length(extract_text(col("html"), url_host(col("url")))).as("n"))
      .agg(sum(col("n"))).head().getLong(0))
    println(f"extract_page marginal cost: ${(page - scan) * 1e9 / n}%.0f ns/page " +
      f"(${page - scan}%.2f s over $n pages at local[$cpus])")
    println(f"extract_text marginal cost: ${(text - scan) * 1e9 / n}%.0f ns/page")
    spark.stop()
  }
}
