package graft.spider.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.datapipe.Dedup

/** One-off cost attribution for the dedup_minhash demo: same query, with
  * and without persisting the shingle frame, back-to-back in one JVM.
  *   runMain graft.spider.tools.MinhashProbe <sfDir> <reps>
  */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .config("spark.driver.bindAddress", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val d = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val near = d.withColumn("doc_id", col("doc_id") + 100000)
      .withColumn("text", concat(col("text"), lit(" tail marker extra")))
    val input = d.unionByName(near)
    input.persist().count()

    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = Dedup.minhashPairs(input, "doc_id", "text",
        k = 3, numHashes = 64, bands = 16, threshold = 0.5).count()
      println(f"rep $r: pairs=$n secs=${(System.nanoTime() - t0) / 1e9}%.1f")
    }
    spark.stop()
  }
}
