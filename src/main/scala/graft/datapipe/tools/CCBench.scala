package graft.datapipe.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.datapipe.Dedup

/** Scale measurement for [[Dedup.connectedComponents]]: contracts a
  * deterministic adversarial graph — a sparse random graph (the shape of a
  * near-dup pair set: many small components) PLUS a long chain (worst case
  * for label-propagation-style algorithms, exercises multi-round star
  * contraction depth) PLUS a mega-star hub (the boilerplate-template
  * mega-component; exercises the no-neighbor-list-collection property) —
  * and reports wall time + component stats as one JSON line.
  *
  *   runMain graft.datapipe.tools.CCBench [nEdgesRandom] [nVerts] [chainLen] [starLen] [cpus]
  *
  * Defaults: 10M random edges over 20M vertices + 1M-vertex chain +
  * 1M-spoke star, local[4]. Edge construction is xxhash64-derived
  * (deterministic, no Random).
  */
object CCBench {
  def main(args: Array[String]): Unit = {
    val nRandom = if (args.length > 0) args(0).toLong else 10000000L
    val nVerts = if (args.length > 1) args(1).toLong else 20000000L
    val chainLen = if (args.length > 2) args(2).toLong else 1000000L
    val starLen = if (args.length > 3) args(3).toLong else 1000000L
    val cpus = if (args.length > 4) args(4).toInt else 4

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-cc-bench")
      .config("spark.sql.shuffle.partitions", (2 * cpus).toString)
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "60g"))
      .config("spark.local.dir", sys.env.getOrElse("GRAFT_LOCAL_DIR", "/tmp"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // vertex id spaces kept disjoint: random graph in [0, nVerts),
      // chain in [C, C+chainLen), star in [S, S+starLen].
      val C = 1000000000L
      val S = 2000000000L
      val random = spark.range(nRandom).select(
        pmod(xxhash64(col("id")), lit(nVerts)).as("src"),
        pmod(xxhash64(col("id"), lit(1)), lit(nVerts)).as("dst"))
      val chain = spark.range(chainLen - 1)
        .select((col("id") + C).as("src"), (col("id") + C + 1).as("dst"))
      val star = spark.range(starLen)
        .select(lit(S).as("src"), (col("id") + S + 1).as("dst"))
      val edges = random.unionByName(chain).unionByName(star)

      // discarded small warmup (JIT + codegen)
      Dedup.connectedComponents(
        spark.range(1000).select(col("id").as("src"), (col("id") + 1).as("dst")))
        .count()

      val t0 = System.nanoTime()
      val comp = Dedup.connectedComponents(edges)
      val stats = comp.agg(
        count(lit(1)).as("verts"),
        countDistinct(col("component")).as("components")).head()
      val top = comp.groupBy("component").count()
        .orderBy(col("count").desc).limit(2).collect()
      val secs = (System.nanoTime() - t0) / 1e9
      val nEdges = nRandom + (chainLen - 1) + starLen
      println(s"""{"bench":"cc","edges":$nEdges,"touched_verts":${stats.getLong(0)},""" +
        s""""components":${stats.getLong(1)},""" +
        s""""top_component_sizes":[${top.map(_.getLong(1)).mkString(",")}],""" +
        f""""secs":$secs%.2f,"edges_per_sec":${nEdges / secs}%.0f,"cpus":$cpus}""")
    } finally spark.stop()
  }
}
