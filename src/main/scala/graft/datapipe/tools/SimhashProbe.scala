package graft.datapipe.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.datapipe.Dedup

/** r6 stage-cost attribution for dedup_simhash (fingerprint table →
  * collapse → banding → candidates → verified pairs).
  *   runMain graft.datapipe.tools.SimhashProbe <sfDir>
  */
object SimhashProbe {
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

    val d = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val near = d.withColumn("doc_id", col("doc_id") + 100000)
      .withColumn("text", concat(col("text"), lit(" zz")))
    val input = d.unionByName(near)
    input.persist().count()

    def step(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s rows=$n%-8d secs=${(System.nanoTime() - t0) / 1e9}%.2f")
    }

    for (rep <- 1 to 2) {
      println(s"--- rep $rep")
      step("simhashTable noop") {
        Dedup.simhashTable(input, "doc_id", "text")
          .write.format("noop").mode("overwrite").save(); 0L
      }
      step("candidates") {
        val (cand, _) = Dedup.simhashCandidates(input, "doc_id", "text", 3)
        cand.count()
      }
      step("full simhashPairs") {
        Dedup.simhashPairs(input, "doc_id", "text", 3).count()
      }
      Dedup.releaseLshState()
    }
    spark.stop()
  }
}
