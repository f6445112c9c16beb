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

  test("exact-copy recall stays 1.0 when oversized buckets are sub-split (bucket cap)") {
    // maxBucket = 1 forces EVERY bucket through the level-2 sub-split:
    // identical vectors share both levels, so no exact-copy pair is lost.
    val dup = emb.select(col("vec_id"), col("embedding"))
      .withColumn("vec_id", col("vec_id") + 100000)
    val pairs = Similarity.embeddingNearDupPairs(
      emb.select("vec_id", "embedding").unionByName(dup),
      "vec_id", "embedding", threshold = 0.999, nPlanes = 4, dim = 64,
      maxBucket = 1L, extraPlanes = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = vecs.keySet.map(i => (i, i + 100000))
    assert(expected.subsetOf(pairs), s"missing ${(expected -- pairs).take(3)}")
  }

  test("multi-probe lifts lshTopK recall vs brute (and never hurts it)") {
    val q = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val nPlanes = Similarity.planesFor(vecs.size.toLong, targetBucket = 64)
    def recallOf(multiProbe: Int): Double = {
      val got = Similarity.lshTopK(emb, "vec_id", "embedding", q, "qid", "qvec", 5,
        nPlanes = nPlanes, dim = 64, multiProbe = multiProbe)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = (0L until 20L).flatMap { qid =>
        vecs.toSeq.filter(_._1 != qid)
          .map { case (id, v) => (id, cosine(vecs(qid), v)) }
          .sortBy { case (id, c) => (-c, id) }.take(5).map { case (id, _) => (qid, id) }
      }.toSet
      brute.count(got).toDouble / brute.size
    }
    val r0 = recallOf(0)
    val r1 = recallOf(1)
    info(f"lshTopK recall@5: single-probe $r0%.2f, multi-probe $r1%.2f (nPlanes=$nPlanes)")
    assert(r1 >= r0, s"multi-probe must not lose candidates: $r1 < $r0")
    // The fixture vectors are ~uniform random — the ANN worst case (top-5
    // "neighbors" of a uniform point sit barely above the cosine noise
    // floor, so sign-LSH carries little signal). Multi-probe still roughly
    // quadruples recall here; the clustered-corpus test below checks the
    // regime LSH is actually built for.
    assert(r1 >= 0.4, s"multi-probe recall too low even for uniform vectors: $r1")
  }

  test("lshTopK recall ≥ 0.9 on a clustered corpus (the regime ANN serves)") {
    import spark.implicits._
    // 50 deterministic cluster centers × 10 members with small perturbation:
    // a member's true top-5 are its cluster siblings.
    def mix(x0: Long): Long = {
      var x = x0 + 0x9e3779b97f4a7c15L
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      x ^ (x >>> 31)
    }
    def unit(seed: Long, dim: Int, scale: Double): Array[Float] =
      (0 until dim).map(d => (mix(seed * 8191 + d).toDouble / Long.MaxValue * scale).toFloat).toArray
    val dim = 64
    val rows = for (c <- 0 until 50; m <- 0 until 10) yield {
      val center = unit(c.toLong + 1, dim, 1.0)
      val noise = unit(c.toLong * 1000 + m + 7, dim, 0.05)
      ((c * 10 + m).toLong, center.zip(noise).map { case (a, b) => a + b })
    }
    val df = rows.toDF("vec_id", "embedding")
    val local = rows.map { case (id, v) => id -> v.map(_.toDouble) }.toMap
    val q = df.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val nPlanes = Similarity.planesFor(500L, targetBucket = 64)
    val got = Similarity.lshTopK(df, "vec_id", "embedding", q, "qid", "qvec", 5,
      nPlanes = nPlanes, dim = dim, multiProbe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = local.keys.filter(_ % 10 == 0).flatMap { qid =>
      local.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, cosine(local(qid), v)) }
        .sortBy { case (id, c) => (-c, id) }.take(5).map { case (id, _) => (qid, id) }
    }.toSet
    val recall = brute.count(got).toDouble / brute.size
    info(f"clustered recall@5 = $recall%.3f (nPlanes=$nPlanes)")
    assert(recall >= 0.9, s"clustered-corpus recall $recall")
  }

  test("ivfTopK recall ≥ 0.9 on a clustered corpus; training is deterministic") {
    import spark.implicits._
    // same 50-cluster fixture as the LSH clustered test — IVF's home regime:
    // the quantizer should discover the clusters and a member's true top-5
    // (its siblings) land in the member's own list.
    def mix(x0: Long): Long = {
      var x = x0 + 0x9e3779b97f4a7c15L
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      x ^ (x >>> 31)
    }
    def unit(seed: Long, dim: Int, scale: Double): Array[Float] =
      (0 until dim).map(d => (mix(seed * 8191 + d).toDouble / Long.MaxValue * scale).toFloat).toArray
    val dim = 64
    val rows = for (c <- 0 until 50; m <- 0 until 10) yield {
      val center = unit(c.toLong + 1, dim, 1.0)
      val noise = unit(c.toLong * 1000 + m + 7, dim, 0.05)
      ((c * 10 + m).toLong, center.zip(noise).map { case (a, b) => a + b })
    }
    val df = rows.toDF("vec_id", "embedding")
    val local = rows.map { case (id, v) => id -> v.map(_.toDouble) }.toMap
    val nList = Similarity.listsFor(500L, targetList = 32) // ~16 lists
    val cents = Similarity.ivfTrain(df, "vec_id", "embedding", nList)
    assert(cents == Similarity.ivfTrain(df, "vec_id", "embedding", nList),
      "training must be deterministic (seeded hash sample, no Random)")
    val q = df.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val got = Similarity.ivfTopK(df, "vec_id", "embedding", q, "qid", "qvec", 5,
      cents, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = local.keys.filter(_ % 10 == 0).flatMap { qid =>
      local.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, cosine(local(qid), v)) }
        .sortBy { case (id, c) => (-c, id) }.take(5).map { case (id, _) => (qid, id) }
    }.toSet
    val recall = brute.count(got).toDouble / brute.size
    info(f"IVF clustered recall@5 = $recall%.3f (nList=$nList, nProbe=4)")
    assert(recall >= 0.9, s"clustered-corpus IVF recall $recall")
  }

  test("ivfTopK candidates are correctly scored and every neighbor shares a probed list") {
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val cents = Similarity.ivfTrain(emb, "vec_id", "embedding", nList = 8)
    val got = Similarity.ivfTopK(emb, "vec_id", "embedding", q, "qid", "qvec", 5,
      cents, nProbe = 3).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val c = cosine(vecs(r.getLong(0)), vecs(r.getLong(1)))
      assert(math.abs(c - r.getDouble(2)) < 1e-6)
    }
    got.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq == (1 to sorted.length))
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a.getDouble(2) >= b.getDouble(2); case _ => true })
    }
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
