package graft.spider.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dump `.explain("formatted")` for selected demo queries — the plan-quality
  * audit trail (broadcasts where expected, pushdown/pruning visible,
  * whole-stage codegen spans).
  *
  *   runMain graft.spider.tools.ExplainPlans <sfDir> <outFile> [keysCsv]
  */
object ExplainPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outFile = if (args.length > 1) args(1) else "/tmp/plans.md"
    val keys: Seq[String] =
      if (args.length > 2) args(2).split(",").toSeq
      else Seq("fetch_join", "politeness_topk", "seen_antijoin", "skew_salted_join",
        "host_agg", "dedup_minhash", "embed_cosine_topk", "pages_text_bytes")

    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .config("spark.driver.bindAddress", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sb = new StringBuilder
    sb.append(s"# Physical plans (sf=$sfDir)\n\n")
    keys.foreach { k =>
      SparkEntry.queries.get(k).foreach { fn =>
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        sb.append(s"## $k\n\n```\n$plan\n```\n\n")
      }
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), sb.toString)
    println(s"wrote $outFile")
    spark.stop()
  }
}
