package graft.spider.state

import java.nio.file.attribute.BasicFileAttributes
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.spider.SparkTestBase
import graft.spider.core.RoundCounters

/** Incremental (per-bucket) seen compaction — VERDICT r3 task #1: the base
  * written at a compaction round must be complete (readers unchanged), but
  * only buckets whose file count crossed the threshold pay a rewrite; cold
  * buckets carry their files forward by hard link (same inode — zero data
  * I/O), and a bucket that stops receiving deltas is never rewritten again.
  */
class CompactionSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val params = SketchParams(seenBuckets = 4, bloomShards = 16,
    bloomExpectedItems = 1L << 20, bloomFpp = 0.03)

  /** Round r's delta: 10 rows into bucket 0 (hot) every round; one row into
    * bucket 1 (cold) at round 0 only. */
  private def delta(r: Int): DataFrame = {
    val hot = (0 until 10).map(i => (r * 100L + i * 4L, s"u$r-$i"))
    val cold = if (r == 0) Seq((1L, "cold0")) else Nil
    (hot ++ cold).toDF("url_hash", "url")
      .withColumn("seen_bucket", pmod(col("url_hash"), lit(4L)).cast("int"))
  }

  private def commit(catalog: CrawlCatalog, r: Int, compact: Boolean,
      maxFiles: Int): Unit = {
    val pc = catalog.beginCommit(r)
    pc.stage("seen", delta(r))
    if (compact) pc.stageSeenCompaction(maxFiles)
    pc.finalizeCommit(None, params, RoundCounters(r, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0))
  }

  private def partFiles(dir: Path): Seq[Path] = {
    if (!Files.isDirectory(dir)) return Nil
    val s = Files.list(dir)
    try s.iterator().asScala.filter(_.getFileName.toString.startsWith("part-")).toSeq
    finally s.close()
  }

  private def fileKey(p: Path): AnyRef =
    Files.readAttributes(p, classOf[BasicFileAttributes]).fileKey()

  test("hot buckets bin-pack; cold buckets carry forward as links, forever") {
    val root = Files.createTempDirectory("graft-compact-").toString
    val catalog = new CrawlCatalog(root, spark)
    (0 to 2).foreach(r => commit(catalog, r, compact = false, maxFiles = 3))
    val coldOrig = partFiles(Paths.get(root, "seen", "data", "r00000", "seen_bucket=1"))
    assert(coldOrig.size == 1)
    val coldKey = fileKey(coldOrig.head)

    // compaction at r3: bucket 0 has 4 files (>= 3) -> rewritten to one;
    // bucket 1 has 1 file (< 3) -> hard-linked, same inode as the original
    commit(catalog, 3, compact = true, maxFiles = 3)
    val base3 = Paths.get(root, "seen_base", "data", "r00003")
    assert(partFiles(base3.resolve("seen_bucket=0")).size == 1, "hot bucket bin-packed")
    val cold3 = partFiles(base3.resolve("seen_bucket=1"))
    assert(cold3.size == 1 && fileKey(cold3.head) == coldKey,
      "cold bucket carried by link (same inode), not rewritten")

    // the base is complete: readers see exactly the union of all deltas
    def seenSet(r: Int): Set[Long] =
      catalog.readSeen(r).select("url_hash").as[Long].collect().toSet
    val expect3 = (0 to 3).flatMap(r =>
      delta(r).select("url_hash").as[Long].collect()).toSet
    assert(seenSet(3) == expect3)
    assert(catalog.seenRowsThrough(3) == expect3.size.toLong)
    // probe input = one base dir only (delta rounds all folded)
    assert(catalog.seenPathsThrough(3) == Seq(s"$root/seen_base/data/r00003"))

    // rounds 4-6, compaction at 7: hot bucket 0 again over threshold
    // (1 base + 4 deltas); cold bucket 1 still one file -> STILL the
    // round-0 inode after a second compaction generation
    (4 to 6).foreach(r => commit(catalog, r, compact = false, maxFiles = 3))
    commit(catalog, 7, compact = true, maxFiles = 3)
    val base7 = Paths.get(root, "seen_base", "data", "r00007")
    assert(partFiles(base7.resolve("seen_bucket=0")).size == 1)
    val cold7 = partFiles(base7.resolve("seen_bucket=1"))
    assert(cold7.size == 1 && fileKey(cold7.head) == coldKey,
      "cold bucket survives a second compaction without a rewrite")
    val expect7 = (0 to 7).flatMap(r =>
      delta(r).select("url_hash").as[Long].collect()).toSet
    assert(seenSet(7) == expect7)
    assert(catalog.seenPathsThrough(7) == Seq(s"$root/seen_base/data/r00007"))
  }

  test("threshold 1 reproduces the full rewrite; base lineage counts per bucket") {
    val root = Files.createTempDirectory("graft-compact-full-").toString
    val catalog = new CrawlCatalog(root, spark)
    (0 to 1).foreach(r => commit(catalog, r, compact = false, maxFiles = 1))
    commit(catalog, 2, compact = true, maxFiles = 1)
    val base = Paths.get(root, "seen_base", "data", "r00002")
    // every non-empty bucket rewritten to exactly one file, none linked
    assert(partFiles(base.resolve("seen_bucket=0")).size == 1)
    assert(partFiles(base.resolve("seen_bucket=1")).size == 1)
    val m = catalog.manifest(2).get("seen_base")
    assert(m.get("through").asInt() == 2)
    val perBucket = m.get("partitions").elements().asScala
      .map(p => p.get("pid").asInt() -> p.get("rows").asLong()).toMap
    assert(perBucket == Map(0 -> 30L, 1 -> 1L))
    assert(m.get("rows").asLong() == 31L)
  }
}
