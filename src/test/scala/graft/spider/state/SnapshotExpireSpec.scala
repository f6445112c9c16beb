package graft.spider.state

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.spider.{CrawlDriver, SparkTestBase}
import graft.spider.core.CrawlConfig

/** Snapshot expiration (the Iceberg `expire_snapshots` analog): old
  * manifests and superseded state go, every retained reader stays exact,
  * resume replays identically, and re-expiration is idempotent. */
class SnapshotExpireSpec extends AnyFunSuite with SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def crawl(rounds: Int, expireKeep: Int, state: String): CrawlCatalog = {
    val cfg = CrawlConfig(rounds = rounds, compactSeenEvery = 4,
      expireKeepLast = expireKeep)
    CrawlDriver.crawlFromSf(spark, sfDir, cfg, state)
    new CrawlCatalog(state, spark)
  }

  private def rowsOf(df: DataFrame): Seq[String] =
    df.select("url", "round").collect()
      .map(r => s"${r.getString(0)}@${r.getInt(1)}").sorted.toSeq

  private def seenOf(c: CrawlCatalog, r: Int): Set[Long] =
    c.readSeen(r).select("url_hash").collect().map(_.getLong(0)).toSet

  // reference: same 10-round crawl, nothing expired
  private lazy val ref: CrawlCatalog =
    crawl(10, 0, Files.createTempDirectory("graft-exp-ref-").toString)

  // under test: identical crawl + expireKeepLast=2 → latest=10, retention
  // point 9, newest compaction ≤ 9 is round 8 → horizon 7
  private lazy val (expDir, exp): (String, CrawlCatalog) = {
    val d = Files.createTempDirectory("graft-exp-").toString
    (d, crawl(10, 2, d))
  }

  test("expires below the anchor compaction; retained readers stay exact") {
    assert(exp.expiredThrough == 7)
    (0 to 7).foreach { r =>
      assert(!Files.exists(Paths.get(expDir, "snapshots", f"snapshot-$r%05d.json")),
        s"manifest $r should be expired")
      assert(!Files.exists(Paths.get(expDir, "frontier", "data", f"r$r%05d")),
        s"frontier state $r should be deleted")
      assert(!Files.exists(Paths.get(expDir, "seen", "data", f"r$r%05d")),
        s"seen delta $r should be deleted")
    }
    // the superseded round-4 base is gone, the anchor base at 8 remains
    assert(!Files.exists(Paths.get(expDir, "seen_base", "data", "r00004")))
    assert(Files.exists(Paths.get(expDir, "seen_base", "data", "r00008")))
    (8 to 10).foreach { r =>
      assert(Files.exists(Paths.get(expDir, "snapshots", f"snapshot-$r%05d.json")))
    }
    // crawled data + counters from expired rounds survive via the rollup
    assert(rowsOf(exp.readCrawled(10)) == rowsOf(ref.readCrawled(10)))
    assert(seenOf(exp, 10) == seenOf(ref, 10))
    assert(exp.countersOf(3) == ref.countersOf(3))
    assert(exp.countersOf(10) == ref.countersOf(10))
    // time travel below the horizon fails loudly
    val e = intercept[IllegalStateException](exp.readFrontier(5))
    assert(e.getMessage.contains("expired"))
  }

  test("crash between rollup commit and deletes: readers exact, re-run sweeps the garbage") {
    // Build the crash state directly: crawl, back up, expire for real, then
    // restore the deleted manifests + state dirs from the backup — exactly
    // what a kill after the rollup's ATOMIC_MOVE leaves behind.
    val dir = Files.createTempDirectory("graft-exp-crash-").toString
    val cat = crawl(10, 0, dir)
    val backup = Files.createTempDirectory("graft-exp-crash-bak-").toString
    def copyTree(from: String, to: String): Unit = {
      val src = Paths.get(from)
      val s = Files.walk(src)
      try s.forEach { p =>
        val t = Paths.get(to).resolve(src.relativize(p))
        if (Files.isDirectory(p)) Files.createDirectories(t)
        else { Files.createDirectories(t.getParent); Files.copy(p, t) }
      } finally s.close()
    }
    copyTree(dir, backup)
    assert(cat.expireSnapshots(2).contains(7))
    // restore everything the sweep deleted (rollup stays) = the crash state
    (0 to 7).foreach { r =>
      val m = f"snapshots/snapshot-$r%05d.json"
      Files.copy(Paths.get(backup, m), Paths.get(dir, m))
      Seq("frontier", "hoststate", "seen").foreach { t =>
        val d = f"$t/data/r$r%05d"
        if (Files.exists(Paths.get(backup, d))) copyTree(s"$backup/$d", s"$dir/$d")
      }
    }
    // readers must not double-read rounds below the committed horizon
    assert(cat.expiredThrough == 7)
    assert(rowsOf(cat.readCrawled(10)) == rowsOf(ref.readCrawled(10)))
    assert(seenOf(cat, 10) == seenOf(ref, 10))
    // a re-run advances nothing but sweeps the stale garbage
    assert(cat.expireSnapshots(2).isEmpty)
    (0 to 7).foreach { r =>
      assert(!Files.exists(Paths.get(dir, f"snapshots/snapshot-$r%05d.json")))
      assert(!Files.exists(Paths.get(dir, f"seen/data/r$r%05d")))
    }
    assert(rowsOf(cat.readCrawled(10)) == rowsOf(ref.readCrawled(10)))
  }

  test("in-crawl expiration bounds live manifests mid-crawl; resume across it replays identically") {
    // VERDICT r3 task #2: expiration runs INSIDE the loop (every 3 rounds
    // here), so the manifest/state-file count is bounded while the crawl
    // runs — rounds ≫ keepLast must never accumulate unbounded metadata.
    def manifests(dir: String): Seq[Int] = {
      val s = Files.list(Paths.get(dir, "snapshots"))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .collect { case n if n.startsWith("snapshot-") =>
            n.stripPrefix("snapshot-").stripSuffix(".json").toInt }
          .toSeq.sorted
      } finally s.close()
    }
    val cfgIn = CrawlConfig(rounds = 6, compactSeenEvery = 3,
      expireKeepLast = 3, expireEveryRounds = 3)
    val dir = Files.createTempDirectory("graft-exp-incrawl-").toString
    CrawlDriver.crawlFromSf(spark, sfDir, cfgIn, dir)
    val mid = new CrawlCatalog(dir, spark)
    // expiration fired at rounds 3 and 6: at 6, latest=6, retention point 4,
    // anchor = base at 3 → horizon 2; only manifests 3..6 remain MID-crawl
    assert(mid.expiredThrough == 2)
    assert(manifests(dir) == Seq(3, 4, 5, 6), "live manifests bounded mid-crawl")
    (0 to 2).foreach { r =>
      assert(!Files.exists(Paths.get(dir, "seen", "data", f"r$r%05d")),
        s"seen delta $r swept mid-crawl")
    }

    // resume the half-done crawl across the expiration horizon to 12 rounds
    // (expiration keeps firing at 9 and 12); ≡ an uninterrupted 12-round
    // crawl with expiration off (expiration + compaction are layout-only)
    val ref12 = {
      val d = Files.createTempDirectory("graft-exp-incrawl-ref-").toString
      CrawlDriver.crawlFromSf(spark, sfDir,
        CrawlConfig(rounds = 12, compactSeenEvery = 3), d)
      new CrawlCatalog(d, spark)
    }
    CrawlDriver.crawlFromSf(spark, sfDir, cfgIn.copy(rounds = 12), dir)
    val fin = new CrawlCatalog(dir, spark)
    // at 12: latest=12, retention point 10, anchor = base at 9 → horizon 8
    assert(fin.expiredThrough == 8)
    assert(manifests(dir) == Seq(9, 10, 11, 12), "live manifests bounded at end")
    assert(rowsOf(fin.readCrawled(12)) == rowsOf(ref12.readCrawled(12)))
    assert(seenOf(fin, 12) == seenOf(ref12, 12))
    // counters from rounds expired mid-crawl survive via the rollup
    assert(fin.countersOf(2) == ref12.countersOf(2))
    assert(fin.countersOf(7) == ref12.countersOf(7))
  }

  test("resume after expiration replays identically; re-expiration is idempotent") {
    exp.expiredThrough // force the lazy first crawl + expiration
    // nothing more to expire at the same retention (anchor unchanged)
    assert(exp.expireSnapshots(2).isEmpty)

    // resume the EXPIRED catalog to 12 rounds; compare against an
    // uninterrupted unexpired 12-round crawl
    val ref12 = crawl(12, 0, Files.createTempDirectory("graft-exp-ref12-").toString)
    val exp12 = crawl(12, 0, expDir) // resume in place, no further expiration
    assert(rowsOf(exp12.readCrawled(12)) == rowsOf(ref12.readCrawled(12)))
    assert(seenOf(exp12, 12) == seenOf(ref12, 12))

    // a later expiration moves the horizon up to the newest eligible base
    // (round 12 compacted; keepLast=1 → anchor 12 → horizon 11) and the
    // rollup still carries every expired round's crawled output
    assert(exp12.expireSnapshots(1).contains(11))
    assert(exp12.expiredThrough == 11)
    assert(rowsOf(exp12.readCrawled(12)) == rowsOf(ref12.readCrawled(12)))
    assert(exp12.countersOf(9) == ref12.countersOf(9))
  }
}
