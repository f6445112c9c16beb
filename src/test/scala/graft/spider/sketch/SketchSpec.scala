package graft.spider.sketch

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.spider.SparkTestBase
import graft.spider.core.Hash64

class SketchSpec extends AnyFunSuite with SparkTestBase {

  private def keys(n: Int, salt: String): Seq[Long] =
    (0 until n).map(i => Hash64.string(s"$salt-$i"))

  test("cuckoo: no false negatives, bounded FPR, delete, serde round-trip") {
    val ins = keys(50000, "in")
    val cf = CuckooFilter.create(60000)
    ins.foreach(cf.put)
    assert(ins.forall(cf.mightContain), "false negative!")
    val probe = keys(50000, "out")
    val fpr = probe.count(cf.mightContain).toDouble / probe.size
    assert(fpr < 0.02, s"fpr=$fpr")
    // delete
    assert(cf.delete(ins.head))
    // round-trip
    val back = CuckooFilter.deserialize(cf.serialize())
    assert(ins.tail.forall(back.mightContain))
    assert(back.cardinality == cf.cardinality)
  }

  test("cuckoo: merge(a,b) contains a ∪ b") {
    val a = CuckooFilter.create(8192); val b = CuckooFilter.create(8192)
    val ka = keys(3000, "a"); val kb = keys(3000, "b")
    ka.foreach(a.put); kb.foreach(b.put)
    a.mergeInPlace(b)
    assert((ka ++ kb).forall(a.mightContain))
  }

  test("BloomAgg == treeAggBloom membership; merge across partitions correct") {
    import spark.implicits._
    val hashes = keys(20000, "x")
    val ds = hashes.toDS().repartition(7)
    val aggBytes = ds.toDF("h").agg(Sketches.bloomAgg(col("h"), 30000, 0.01))
      .head().getAs[Array[Byte]](0)
    val aggBf = Sketches.bloomFrom(aggBytes)
    val treeBf = Sketches.treeAggBloom(ds, 30000, 0.01)
    // identical construction parameters + same items ⇒ identical bit sets
    assert(hashes.forall(aggBf.mightContainLong), "BloomAgg false negative")
    assert(hashes.forall(treeBf.mightContainLong), "treeAgg false negative")
    val probe = keys(20000, "y")
    assert(probe.count(aggBf.mightContainLong) < 600) // ~1% nominal, allow 3x
    assert(probe.forall(h => aggBf.mightContainLong(h) == treeBf.mightContainLong(h)),
      "agg variants disagree — merge is not deterministic")
  }

  test("CuckooAgg builds over a DataFrame") {
    import spark.implicits._
    val hashes = keys(5000, "z")
    val bytes = hashes.toDS().toDF("h").repartition(5)
      .agg(Sketches.cuckooAgg(col("h"), 20000)).head().getAs[Array[Byte]](0)
    val cf = CuckooFilter.deserialize(bytes)
    assert(hashes.forall(cf.mightContain), "CuckooAgg false negative")
    assert(cf.cardinality == 5000L)
  }
}
