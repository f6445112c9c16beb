package graft.spider.tools

import org.apache.spark.sql.SparkSession

import graft.spider.synth.{CorpusStore, PagesSynth}

/** One-time builder for the scaling campaign's shared bucketed corpus
  * (CorpusStore layout): synthesize at FULL parallelism, write once, then
  * every ScalingBench run at every level opens it read-only — the local[1]
  * runs stop paying a single-threaded multi-GB synthesis per run (the cost
  * that forced round 3's first 17-KB-page campaign down to 8-KB pages).
  *
  *   runMain graft.spider.tools.CorpusBuild <dir> [sfDir replicate noiseLen buckets]
  */
object CorpusBuild {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val replicate = if (args.length > 2) args(2).toInt else 200
    val noiseLen = if (args.length > 3) args(3).toInt else 17000
    val buckets = if (args.length > 4) args(4).toInt else 16

    val spark = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors()}]")
      .appName("graft-corpus-build")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .config("spark.driver.bindAddress", "127.0.0.1")
      .config("spark.local.dir", sys.env.getOrElse("GRAFT_LOCAL_DIR", "/tmp"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      if (CorpusStore.exists(dir)) {
        System.err.println(s"[corpus] $dir already built (${CorpusStore.rowCount(dir)} rows) — nothing to do")
      } else {
        val t0 = System.nanoTime()
        val rows = CorpusStore.write(spark,
          PagesSynth.pages(spark, sfDir, replicate, spreadHosts = true, noiseLen = noiseLen),
          dir, buckets)
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"""{"bench":"corpus_build","dir":"$dir","rows":$rows,"buckets":$buckets,"noise":$noiseLen,"replicate":$replicate,"secs":$secs%.1f}""")
      }
    } finally spark.stop()
  }
}
