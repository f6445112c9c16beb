package graft.datapipe

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.spider.SparkTestBase

class LinkRankSpec extends AnyFunSuite with SparkTestBase {

  /** Sequential power-method reference, same dangling handling. */
  private def refPageRank(
      edges: Seq[(Long, Long)], iters: Int, d: Double): Map[Long, Double] = {
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = verts.size
    val out = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toDouble }
    var rank = verts.map(_ -> 1.0 / n).toMap
    (0 until iters).foreach { _ =>
      val dangling = verts.filterNot(out.contains).map(rank).sum
      val contrib = scala.collection.mutable.Map[Long, Double]().withDefaultValue(0.0)
      edges.foreach { case (s, t) => contrib(t) += rank(s) / out(s) }
      val base = (1 - d) / n + d * dangling / n
      rank = verts.map(v => v -> (base + d * contrib(v))).toMap
    }
    rank
  }

  private def run(edges: Seq[(Long, Long)], iters: Int = 10): Map[Long, Double] = {
    import spark.implicits._
    LinkRank.pageRank(edges.toDF("src", "dst"), iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  test("pageRank matches the sequential reference on a seeded random graph") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(500)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter(e => e._1 != e._2).distinct
    val got = run(edges)
    val want = refPageRank(edges, 10, 0.85)
    assert(got.keySet == want.keySet)
    got.foreach { case (v, r) =>
      assert(math.abs(r - want(v)) < 1e-9, s"vertex $v: $r vs ${want(v)}")
    }
    assert(math.abs(got.values.sum - 1.0) < 1e-9) // mass conserved
  }

  test("ring: uniform ranks; chain endpoint dangling handled") {
    val ring = (0L until 10L).map(i => (i, (i + 1) % 10))
    val got = run(ring)
    got.values.foreach(r => assert(math.abs(r - 0.1) < 1e-12))
    // chain: vertex 9 is dangling; still sums to 1 and matches reference
    val chain = (0L until 9L).map(i => (i, i + 1))
    val gc = run(chain)
    val want = refPageRank(chain, 10, 0.85)
    gc.foreach { case (v, r) => assert(math.abs(r - want(v)) < 1e-9, s"vertex $v") }
    assert(math.abs(gc.values.sum - 1.0) < 1e-9)
  }

  test("star: hub outranks spokes; empty graph returns empty") {
    import spark.implicits._
    val star = (1L to 20L).map(i => (i, 0L)) // 20 spokes endorse the hub
    val got = run(star)
    assert(got(0L) > got(1L) * 5, s"hub=${got(0L)} spoke=${got(1L)}")
    assert(LinkRank.pageRank(Seq.empty[(Long, Long)].toDF("src", "dst")).isEmpty)
  }

  test("hostRank: self-edges dropped, values match the reference graph") {
    import spark.implicits._
    // b,c,d all endorse a; self-links on b are noise that must not count
    // (if they did, b's out-degree would be 3 and its rank would inflate).
    // NOTE the a↔b 2-cycle makes ranks oscillate between iterations, so
    // assert exact reference values, not "a is max at iteration 10".
    val e = Seq(("b", "a"), ("c", "a"), ("d", "a"), ("a", "b"),
      ("b", "b"), ("b", "b")).toDF("src_host", "dst_host")
    val got = LinkRank.hostRank(e, iterations = 10).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set("a", "b", "c", "d"))
    // same graph on ids: a=0 b=1 c=2 d=3, self-edges already removed
    val want = refPageRank(Seq((1L, 0L), (2L, 0L), (3L, 0L), (0L, 1L)), 10, 0.85)
    val byId = Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 3L)
    got.foreach { case (h, r) =>
      assert(math.abs(r - want(byId(h))) < 1e-9, s"host $h")
    }
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    // and at 51 iterations the oscillation has decayed: a is the hub
    val deep = LinkRank.hostRank(e, iterations = 51).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(deep("a") == deep.values.max)
  }
}
