package graft.spider.tools

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** AQE skewJoin vs manual salting — the standing SURVEY §4.2 comparison
  * (VERDICT r4 task #6). One skewed equi-join workload, three strategies:
  *
  *   - `plain`:  sort-merge join, AQE skew handling OFF — the baseline that
  *     shows the skew (one reducer drags the stage);
  *   - `aqe`:    AQE `skewJoin` ON — runtime splitting of the oversized
  *     partition (no plan change on our side);
  *   - `salted`: the engine's explicit J4 pattern — big side salted with
  *     pmod(xxhash64(url), S), small side replicated ×S via
  *     explode(sequence), join on (host, salt).
  *
  * Fixture: hostA carries `skewShare` of the big side (the mega-host shape
  * J4 exists for); the dim side has one row per host, broadcast DISABLED so
  * the shuffle-join path under test is the one that exists at a 10^10-URL
  * frontier. A TaskEnd listener records per-task shuffle-read row counts,
  * so each strategy reports its measured per-task spread (max vs mean), not
  * just wall clock.
  *
  *   runMain graft.spider.tools.SkewBench [rows] [hosts] [skewShare] [salt] [cpus]
  */
object SkewBench {

  private class TaskMeter extends SparkListener {
    val records = ArrayBuffer[Long]()
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = synchronized {
      if (te.taskMetrics != null) {
        val n = te.taskMetrics.shuffleReadMetrics.recordsRead
        if (n > 0) records += n
      }
    }
    def reset(): Unit = synchronized { records.clear() }
    def maxRec: Long = synchronized { if (records.isEmpty) 0L else records.max }
    def meanRec: Long = synchronized {
      if (records.isEmpty) 0L else records.sum / records.length
    }
    def nTasks: Int = synchronized { records.length }
  }

  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 20000000L
    val hosts = if (args.length > 1) args(1).toInt else 200
    val skewShare = if (args.length > 2) args(2).toDouble else 0.9
    val salt = if (args.length > 3) args(3).toInt else 16
    val cpus = if (args.length > 4) args(4).toInt else 4

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-skew-bench")
      .config("spark.sql.shuffle.partitions", (2 * cpus).toString)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle joins
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "40g"))
      .config("spark.local.dir", sys.env.getOrElse("GRAFT_LOCAL_DIR", "/tmp"))
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .config("spark.driver.bindAddress", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel(sys.env.getOrElse("GRAFT_LOG", "WARN"))
    // OptimizeSkewedJoin logs its split/decline decisions at DEBUG; raise
    // just the adaptive package (root stays at WARN) so the decision trail
    // is readable: GRAFT_AQE_LOG=DEBUG tools/run_bench.sh ... 2>trail.log
    sys.env.get("GRAFT_AQE_LOG").foreach { lvl =>
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.execution.adaptive",
        org.apache.logging.log4j.Level.toLevel(lvl))
    }
    val meter = new TaskMeter
    spark.sparkContext.addSparkListener(meter)

    try {
      // hostA holds skewShare of all rows; the rest spread uniformly
      val big = spark.range(rows).select(
          col("id"),
          when(pmod(xxhash64(col("id")), lit(10000L)) < lit((skewShare * 10000).toLong),
            lit("hostA"))
            .otherwise(concat(lit("h"), pmod(xxhash64(col("id"), lit(1)), lit(hosts.toLong))))
            .as("host"))
        .withColumn("url_hash", xxhash64(col("id")))
      val dim = spark.range(hosts + 1).select(
          when(col("id") === 0, lit("hostA"))
            .otherwise(concat(lit("h"), col("id") - 1)).as("host"),
          (col("id") * 100 + 7).as("budget"))

      def run(label: String, aqe: Boolean, skewJoin: Boolean)(join: => DataFrame): Unit = {
        spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewJoin.toString)
        // make the skew splitter fire at bench volume, not only at 256 MB+.
        // GRAFT_SKEW_THRESHOLD overrides the byte floor: the r5 DEBUG trail
        // showed the 18M-row hostA partition compresses to 5.9 MB once
        // column-pruned to the constant join key, so byte thresholds ≥ 8 MB
        // see "0 skewed partitions" while the row spread is 8×.
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
          sys.env.getOrElse("GRAFT_SKEW_THRESHOLD", "8m"))
        // advisory also gates the split: createSkewPartitionSpecs abandons a
        // split that would yield a single ≥-advisory-sized part, so advisory
        // must sit BELOW the compressed hot-partition size for a split
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
          sys.env.getOrElse("GRAFT_ADVISORY", "8m"))
        // warmup (JIT) on a slice, then the timed run
        join.limit(1).count()
        meter.reset()
        val t0 = System.nanoTime()
        val n = join.agg(count(lit(1)), sum(col("budget"))).head().getLong(0)
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"""{"bench":"skew","strategy":"$label","rows":$n,"secs":$secs%.2f,""" +
          s""""tasks":${meter.nTasks},"max_task_rows":${meter.maxRec},""" +
          s""""mean_task_rows":${meter.meanRec},""" +
          f""""spread":${meter.maxRec.toDouble / math.max(1L, meter.meanRec)}%.1f}""")
      }

      val plainJoin = big.join(dim, Seq("host"))
      run("plain_smj", aqe = false, skewJoin = false)(plainJoin)
      run("aqe_skewjoin", aqe = true, skewJoin = true)(plainJoin)

      // the engine's explicit J4 salting (exactness proven in the J4 specs):
      // big side gets salt ∈ [0,S); small side replicated ×S
      val bigSalted = big.withColumn("salt", pmod(col("url_hash"), lit(salt.toLong)))
      val dimSalted = dim.withColumn("salt",
        explode(sequence(lit(0L), lit(salt.toLong - 1))))
      run("manual_salted", aqe = false, skewJoin = false)(
        bigSalted.join(dimSalted, Seq("host", "salt")))
      // and salted WITH AQE on (the combination a production conf would run)
      run("salted_plus_aqe", aqe = true, skewJoin = true)(
        bigSalted.join(dimSalted, Seq("host", "salt")))
    } finally spark.stop()
  }
}
