package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * Baseline: brute-force cosine top-k — exact, one broadcast of the query
  * set, no shuffle of the corpus (scales linearly with corpus size; the
  * right choice when |queries| is small). Scale path: random-hyperplane LSH
  * bucketing — the corpus is hashed once into buckets (one narrow column),
  * candidates come from the query's bucket only, then exact cosine re-ranks.
  * Both are pure Catalyst plans (zip_with / aggregate built-ins), no UDFs.
  *
  * Near-duplicate-by-embedding is the same kernel with a threshold instead
  * of top-k.
  */
object Similarity {

  /** Cosine similarity of two array<float|double> columns. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (acc, x) => acc + x))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0d), (acc, x) => acc + x))
    dot / (na * nb)
  }

  /** Exact brute-force cosine top-k. `queries` must be small (broadcast). */
  def bruteTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String, k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col(qidCol) =!= col(idCol))
      .withColumn("cosine", cosine(col(vecCol), col(qvecCol)))
    val w = Window.partitionBy(qidCol)
      .orderBy(col("cosine").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qidCol).as("query_id"), col(idCol).as("neighbor_id"),
        col("cosine"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplanes (seeded splitmix; no wall
    * clock / Random in the data path). */
  private def planes(nPlanes: Int, dim: Int): Seq[Seq[Double]] = {
    def mix(x0: Long): Long = {
      var x = x0 + 0x9e3779b97f4a7c15L
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      x ^ (x >>> 31)
    }
    (0 until nPlanes).map { p =>
      (0 until dim).map { d =>
        // uniform in [-1, 1): fine for sign-projection hyperplanes
        mix(p.toLong * 131071 + d).toDouble / Long.MaxValue.toDouble
      }
    }
  }

  /** Random-hyperplane LSH bucket id (int of nPlanes sign bits). */
  def lshBucket(vec: Column, nPlanes: Int, dim: Int): Column = {
    val ps = planes(nPlanes, dim)
    val bits = ps.zipWithIndex.map { case (plane, i) =>
      val dot = aggregate(zip_with(vec, typedLit(plane), (x, y) => x * y),
        lit(0.0d), (acc, x) => acc + x)
      when(dot > 0, lit(1 << i)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }

  /** Approximate top-k: candidates share the query's LSH bucket, then exact
    * cosine re-ranks. Trades recall for touching ~corpus/2^nPlanes rows per
    * query; raise recall with fewer planes or multi-probe. */
  def lshTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String, k: Int,
      nPlanes: Int = 8, dim: Int = 64): DataFrame = {
    val cb = corpus.withColumn("bucket", lshBucket(col(vecCol), nPlanes, dim))
    val qb = queries.withColumn("bucket", lshBucket(col(qvecCol), nPlanes, dim))
    val scored = cb.join(broadcast(qb), Seq("bucket"))
      .filter(col(qidCol) =!= col(idCol))
      .withColumn("cosine", cosine(col(vecCol), col(qvecCol)))
    val w = Window.partitionBy(qidCol)
      .orderBy(col("cosine").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qidCol).as("query_id"), col(idCol).as("neighbor_id"),
        col("cosine"), col("rank"))
  }

  /** Embedding near-duplicate pairs: same LSH bucket AND cosine ≥ threshold.
    * Exact within-bucket; recall grows with fewer planes. */
  def embeddingNearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nPlanes: Int = 8, dim: Int = 64): DataFrame = {
    val cb = corpus.withColumn("bucket", lshBucket(col(vecCol), nPlanes, dim))
    val a = cb.select(col("bucket"), col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = cb.select(col("bucket"), col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
