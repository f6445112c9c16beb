package graft.tools

import org.apache.spark.sql.SparkSession

/** r6 isolation harness (spark_optimization_guide §1.4): time a SUBSET of
  * the declared queries, each labelled, with both the frozen harness's
  * action (`count()`, comparable to graft.Bench numbers) and a `noop`-sink
  * write (times every column of every row, so expression-heavy plans are
  * not flattered by count-side pruning). The frozen `graft.Bench` is NOT
  * touched — this main exists so optimization iterations can measure one
  * operator in ~a minute instead of a full 7-minute sweep.
  *
  *   BenchExtra <keysCsv> [reps=2] [action=count|noop|both]
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as Bench).
  * LSH state is dropped between reps (cold builds, like Bench). */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val keys: Seq[String] =
      if (args.nonEmpty) args(0).split(",").toSeq
      else Seq("dedup_minhash", "link_rank")
    val reps = if (args.length > 1) args(1).toInt else 2
    val action = if (args.length > 2) args(2) else "count"

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", math.max(32, cpus.toInt * 2).toString)
      .config("spark.sql.maxPlanStringLength", "8192")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .config("spark.driver.bindAddress", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    graft.queries.Demos.prewarm(spark, sfDir)

    def timeOne(name: String, what: String, run: () => Unit): Unit = {
      spark.sparkContext.setJobDescription(s"bench-extra: $name ($what)")
      val t0 = System.nanoTime()
      try run() catch { case e: Throwable =>
        println(f"""{"key":"$name","action":"$what","error":"${e.getClass.getSimpleName}"}""")
        return
      }
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"""{"key":"$name","action":"$what","secs":$secs%.3f}""")
    }

    (1 to reps).foreach { r =>
      keys.foreach { k =>
        val fn = graft.SparkEntry.queries(k)
        if (action == "count" || action == "both")
          timeOne(s"$k#$r", "count", () => { fn(spark, sfDir).count(); () })
        if (action == "noop" || action == "both")
          timeOne(s"$k#$r", "noop", () =>
            fn(spark, sfDir).write.format("noop").mode("overwrite").save())
      }
      graft.datapipe.Dedup.releaseLshState()
    }
    spark.stop()
  }
}
