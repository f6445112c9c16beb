package graft.datapipe

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.spider.SparkTestBase

class SimilaritySpec extends AnyFunSuite with SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  private lazy val vecs: Map[Long, Array[Double]] =
    emb.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(_.toDouble).toArray).toMap

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("bruteTopK == plain-Scala brute force (ids, ranks, cosines)") {
    val q = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val got = Similarity.bruteTopK(emb, "vec_id", "embedding", q, "qid", "qvec", 5)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2))
    val want = (0L until 3L).flatMap { qid =>
      vecs.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, cosine(vecs(qid), v)) }
        .sortBy { case (id, c) => (-c, id) }.take(5).zipWithIndex
        .map { case ((id, c), i) => (qid, i + 1, id, c) }
    }
    assert(got.length == want.length)
    got.zip(want).foreach { case ((gq, gr, gid, gc), (wq, wr, wid, wc)) =>
      assert(gq == wq && gr == wr && gid == wid, s"got=($gq,$gr,$gid) want=($wq,$wr,$wid)")
      assert(math.abs(gc - wc) < 1e-6)
    }
  }

  test("LSH buckets: identical vectors always collide → exact-copy recall is 1.0") {
    val dup = emb.select(col("vec_id"), col("embedding"))
      .withColumn("vec_id", col("vec_id") + 100000)
    val pairs = Similarity.embeddingNearDupPairs(
      emb.select("vec_id", "embedding").unionByName(dup),
      "vec_id", "embedding", threshold = 0.999, nPlanes = 6, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = vecs.keySet.map(i => (i, i + 100000))
    assert(expected.subsetOf(pairs), s"missing ${(expected -- pairs).take(3)}")
  }

  test("lshTopK returns correctly-scored, correctly-ranked same-bucket candidates") {
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val got = Similarity.lshTopK(emb, "vec_id", "embedding", q, "qid", "qvec", 5,
      nPlanes = 6, dim = 64).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val c = cosine(vecs(r.getLong(0)), vecs(r.getLong(1)))
      assert(math.abs(c - r.getDouble(2)) < 1e-6)
    }
    // ranks are 1..k and strictly by descending cosine within a query
    got.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq == (1 to sorted.length))
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a.getDouble(2) >= b.getDouble(2); case _ => true })
    }
  }
}
