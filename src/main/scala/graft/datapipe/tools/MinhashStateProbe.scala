package graft.datapipe.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.datapipe.{Dedup, HotPathFunctions}

/** r6 fine-grained attribution of the minhash STATE build: times each
  * incremental column of the signature pipeline with a noop sink.
  *   runMain graft.datapipe.tools.MinhashStateProbe <sfDir>
  */
object MinhashStateProbe {
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
      .withColumn("text", concat(col("text"), lit(" tail marker extra")))
    val input = d.unionByName(near)
      .select(col("doc_id").as("id"), col("text"))
    input.persist().count()

    def noop(name: String, df: DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$name%-30s secs=${(System.nanoTime() - t0) / 1e9}%.2f")
    }

    val toks = Dedup.tokensCol(col("text"))
    for (rep <- 1 to 2) {
      println(s"--- rep $rep")
      noop("tokens", input.select(col("id"), toks.as("t")))
      noop("shingles", input.select(col("id"),
        Dedup.shinglesCol(toks, 3).as("sh")))
      noop("shingles_distinct", input.select(col("id"),
        array_distinct(Dedup.shinglesCol(toks, 3)).as("sh")))
      val sh = input.select(col("id"),
        array_distinct(Dedup.shinglesCol(toks, 3)).as("sh"))
      noop("sh_hashes", sh.select(col("id"),
        transform(col("sh"), s => xxhash64(s)).as("shh")))
      val shh = sh.select(col("id"), col("sh"),
        transform(col("sh"), s => xxhash64(s)).as("shh"))
      noop("sig_fused(66)", shh.select(col("id"),
        HotPathFunctions.minhash_minima(col("shh"),
          Dedup.minhashSalts(66)).as("sig")))
      noop("full_state_cols", shh
        .withColumn("sig", HotPathFunctions.minhash_minima(col("shh"),
          Dedup.minhashSalts(64))))
      // the banding over a precomputed sig (no state reuse)
      val withSig = shh.withColumn("sig",
        HotPathFunctions.minhash_minima(col("shh"), Dedup.minhashSalts(64)))
      noop("banding_over_sig", withSig.select(col("id"),
        posexplode(transform(sequence(lit(0), lit(15)),
          j => xxhash64(concat_ws(",",
            transform(slice(col("sig"), j * 4 + 1, lit(4)), x => x.cast("string"))))))))
    }
    spark.stop()
  }
}
