package graft.datapipe.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.spider.tools.TaskTimeMeter

import graft.datapipe.LinkRank

/** Volume + scaling measurement for [[LinkRank.pageRank]]: 10 power
  * iterations over a deterministic host-graph-shaped edge list (xxhash64-
  * derived, skewed in-degree: dst drawn from a quadratic transform so a few
  * "hub" ids collect a large share of inlinks — the real web-host shape the
  * contribution aggregation's map-side combine must absorb).
  *
  * Besides wall clock, reports the fixed-cost decomposition the two-level
  * protocol needs (VERDICT r4 task #3): a TaskEnd listener sums executor
  * task run time over the timed region, so each level derives
  *
  *   work_secs  = task_secs / cpus   (ideal parallel wall for executor work)
  *   floor_secs = secs - work_secs   (driver actions, scheduling gaps,
  *                                    single-threaded planning — everything
  *                                    task execution cannot parallelize)
  *
  * Executor-work scaling efficiency between levels is then
  * task_secs(N) / task_secs(4N) — 1.0 when the same total work runs at both
  * levels with no contention inflation — separating "the work scales" from
  * "the sandbox floor does not shrink", which wall-clock efficiency alone
  * conflates at volumes where floor_secs is a visible share of secs.
  *
  *   runMain graft.datapipe.tools.RankBench [nEdges] [nVerts] [iters] [cpus]
  */
object RankBench {

  def main(args: Array[String]): Unit = {
    val nEdges = if (args.length > 0) args(0).toLong else 10000000L
    val nVerts = if (args.length > 1) args(1).toLong else 2000000L
    val iters = if (args.length > 2) args(2).toInt else 10
    val cpus = if (args.length > 3) args(3).toInt else 4

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-rank-bench")
      .config("spark.sql.shuffle.partitions", (2 * cpus).toString)
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "60g"))
      .config("spark.local.dir", sys.env.getOrElse("GRAFT_LOCAL_DIR", "/tmp"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val meter = new TaskTimeMeter
    spark.sparkContext.addSparkListener(meter)
    try {
      // skewed dst: square a uniform draw so low ids are hubs
      // (id 0 collects ~1/sqrt(nVerts) of all inlinks)
      val edges = spark.range(nEdges).select(
        pmod(xxhash64(col("id")), lit(nVerts)).as("src"),
        (pmod(xxhash64(col("id"), lit(1)), lit(nVerts)) *
          pmod(xxhash64(col("id"), lit(2)), lit(nVerts)) / lit(nVerts))
          .cast("long").as("dst"))

      // discarded warmup
      LinkRank.pageRank(
        spark.range(1000).select(col("id").as("src"), (col("id") + 1).as("dst")),
        iterations = 2).count()

      meter.reset()
      val t0 = System.nanoTime()
      val ranks = LinkRank.pageRank(edges, iterations = iters)
      val stats = ranks.agg(count(lit(1)), sum("rank"), max("rank")).head()
      val secs = (System.nanoTime() - t0) / 1e9
      meter.drain(spark.sparkContext)
      val work = nEdges * iters // edge-traversals, the scalable term
      val taskSecs = meter.taskSecs
      val workSecs = taskSecs / cpus
      println(s"""{"bench":"rank","edges":$nEdges,"iters":$iters,""" +
        s""""verts":${stats.getLong(0)},""" +
        f""""rank_sum":${stats.getDouble(1)}%.6f,"top_rank":${stats.getDouble(2)}%.6f,""" +
        f""""secs":$secs%.2f,"edge_traversals_per_sec":${work / secs}%.0f,"cpus":$cpus,""" +
        f""""task_secs":$taskSecs%.1f,"task_cpu_secs":${meter.cpuSecs}%.1f,""" +
        f""""tasks":${meter.tasks.sum()},"work_secs":$workSecs%.1f,""" +
        f""""floor_secs":${secs - workSecs}%.1f}""")
    } finally spark.stop()
  }
}
