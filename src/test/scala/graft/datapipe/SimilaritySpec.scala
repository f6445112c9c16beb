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

  private def mix2(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }
  private def unit2(seed: Long, dim: Int, scale: Double): Array[Float] =
    (0 until dim).map(d =>
      (mix2(seed * 8191 + d).toDouble / Long.MaxValue * scale).toFloat).toArray

  /** The HARD ANN fixture (VERDICT r3 task #7): OVERLAPPING clusters — 10
    * parent directions, 5 child clusters each perturbed only 0.35 off the
    * parent, members 0.12 off their child. A member's true top-5 can span
    * sibling child clusters, and the coarse structures (IVF lists, LSH
    * buckets) split sibling children across cells — single-probe recall is
    * poor by construction and the probe count is the recovery lever. */
  private lazy val overlapRows: Seq[(Long, Array[Float])] = {
    val dim = 64
    for (p <- 0 until 10; c <- 0 until 5; m <- 0 until 10) yield {
      val parent = unit2(p.toLong + 1, dim, 1.0)
      val child = unit2(p.toLong * 131 + c + 3, dim, 0.35)
      val noise = unit2((p * 50 + c * 10 + m).toLong + 100000, dim, 0.12)
      ((p * 50 + c * 10 + m).toLong,
        parent.indices.map(i => parent(i) + child(i) + noise(i)).toArray)
    }
  }
  private lazy val overlapLocal: Map[Long, Array[Double]] =
    overlapRows.map { case (id, v) => id -> v.map(_.toDouble) }.toMap
  private def overlapBrute(queryIds: Seq[Long], k: Int): Set[(Long, Long)] =
    queryIds.flatMap { qid =>
      overlapLocal.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, cosine(overlapLocal(qid), v)) }
        .sortBy { case (id, c) => (-c, id) }.take(k).map { case (id, _) => (qid, id) }
    }.toSet

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

  test("hamming-2 multi-probe: recall monotone in probe radius, ≥ 0.9 on the overlapping corpus") {
    import spark.implicits._
    val df = overlapRows.toDF("vec_id", "embedding")
    val queryIds = overlapLocal.keys.filter(_ % 25 == 0).toSeq.sorted
    val q = df.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    // 8 planes = 256 buckets over 500 vectors: fine enough that hamming-1
    // probing still misses neighbors two sign-flips away — the radius-2
    // regime (at the corpus-scaled 4 planes the lever saturates at radius 1)
    val nPlanes = 8
    val brute = overlapBrute(queryIds, 5)
    def recallOf(p: Int): Double = {
      val got = Similarity.lshTopK(df, "vec_id", "embedding", q, "qid", "qvec", 5,
        nPlanes = nPlanes, dim = 64, multiProbe = p)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      brute.count(got).toDouble / brute.size
    }
    val (r0, r1, r2) = (recallOf(0), recallOf(1), recallOf(2))
    info(f"overlapping-corpus lshTopK recall@5: p0=$r0%.3f p1=$r1%.3f p2=$r2%.3f (nPlanes=$nPlanes)")
    // probe sets are nested (H0 ⊂ H0∪H1 ⊂ H0∪H1∪H2) → recall non-decreasing
    assert(r1 >= r0 && r2 >= r1, s"probe-radius monotonicity violated: $r0 / $r1 / $r2")
    assert(r2 >= 0.9, s"hamming-2 recall on the overlapping corpus: $r2")
  }

  test("IVF nProbe sweep on the overlapping corpus: nested recall, ≥ 0.9 at nProbe=8") {
    import spark.implicits._
    val df = overlapRows.toDF("vec_id", "embedding")
    val queryIds = overlapLocal.keys.filter(_ % 25 == 0).toSeq.sorted
    val q = df.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    // finer lists than child clusters (125 lists vs 50 children): a child's
    // members straddle list boundaries, so single-probe misses same-child
    // neighbors that landed one centroid over — the regime nProbe recovers
    val nList = Similarity.listsFor(overlapRows.size.toLong, targetList = 4)
    val cents = Similarity.ivfTrain(df, "vec_id", "embedding", nList)
    val brute = overlapBrute(queryIds, 5)
    val sweep = Seq(1, 2, 4, 8).map { nProbe =>
      val got = Similarity.ivfTopK(df, "vec_id", "embedding", q, "qid", "qvec", 5,
        cents, nProbe = nProbe)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      nProbe -> (brute.count(got).toDouble / brute.size)
    }
    info(s"overlapping-corpus IVF recall@5 vs nProbe (nList=$nList): " +
      sweep.map { case (p, r) => f"$p->$r%.3f" }.mkString(", "))
    // probed-list sets are nested prefixes of the centroid ranking →
    // candidates, hence recall, are non-decreasing in nProbe
    sweep.sliding(2).foreach {
      case Seq((_, a), (_, b)) => assert(b >= a, s"nProbe recall not nested: $sweep")
      case _ =>
    }
    assert(sweep.last._2 >= 0.9, s"nProbe=8 recall on the overlapping corpus: ${sweep.last._2}")
    // the sweep must exercise the hard regime: single-probe alone should NOT
    // already saturate (otherwise the fixture is not testing the lever)
    assert(sweep.head._2 < 0.95, s"fixture too easy: nProbe=1 recall ${sweep.head._2}")
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
