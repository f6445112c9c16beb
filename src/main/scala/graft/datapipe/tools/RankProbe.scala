package graft.datapipe.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.datapipe.LinkRank
import graft.spider.expr.SpiderFunctions._

/** r6 cost attribution for link_rank: edge derivation vs the 10-iteration
  * power loop at several checkpoint cadences (output is identical for any
  * cadence — it only changes materialization scheduling).
  *   runMain graft.datapipe.tools.RankProbe <sfDir>
  */
object RankProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .config("spark.driver.bindAddress", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    graft.queries.Demos.prewarm(spark, sfDir)
    val pages = graft.spider.synth.PagesSynth.pages(spark, sfDir)

    def edges = pages.select(url_host(col("url")).as("src_host"),
        explode(extract_outlinks(col("html"))).as("out"))
      .select(col("src_host"), url_host(col("out")).as("dst_host"))

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name%-28s secs=${(System.nanoTime() - t0) / 1e9}%.2f")
    }

    for (rep <- 1 to 2) {
      println(s"--- rep $rep")
      time("edges noop") {
        edges.write.format("noop").mode("overwrite").save()
      }
      time("edges hashed distinct ids") {
        val e = edges.filter(col("src_host") =!= col("dst_host"))
        e.select(col("src_host").as("host")).union(e.select(col("dst_host")))
          .distinct().select(xxhash64(col("host"))).count()
      }
      for (ce <- Seq(1, 4, 10))
        time(s"pageRank cpEvery=$ce") {
          val e0 = edges.filter(col("src_host") =!= col("dst_host"))
          LinkRank.pageRank(
            e0.select(xxhash64(col("src_host")).as("src"),
              xxhash64(col("dst_host")).as("dst")),
            iterations = 10, checkpointEvery = ce).count()
        }
      time("full hostRank (query shape)") {
        LinkRank.hostRank(edges).withColumn("rank", round(col("rank"), 9))
          .orderBy("host").count()
      }
    }
    spark.stop()
  }
}
