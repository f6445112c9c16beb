package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for a set of declared queries, one file per
  * key, for the plans/r06 audit trail (one _before.txt / _after.txt pair per
  * touched query). Same session shape as graft.Bench (local[$cpus], prewarmed
  * caches) so the dumped plan is the one the bench actually runs.
  *
  *   PlanFiles <outDir> <suffix> [keysCsv]
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as Bench). */
object PlanFiles {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = args(0)
    val suffix = args(1)
    val keys: Seq[String] =
      if (args.length > 2) args(2).split(",").toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", math.max(32, cpus.toInt * 2).toString)
      .config("spark.sql.maxPlanStringLength", "1048576")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .config("spark.driver.bindAddress", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    graft.queries.Demos.prewarm(spark, sfDir)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    keys.foreach { k =>
      graft.SparkEntry.queries.get(k).foreach { fn =>
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"${k}_$suffix.txt"), plan)
        println(s"wrote $outDir/${k}_$suffix.txt")
      }
    }
    spark.stop()
  }
}
