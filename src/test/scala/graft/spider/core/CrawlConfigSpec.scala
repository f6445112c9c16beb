package graft.spider.core

import org.scalatest.funsuite.AnyFunSuite

/** Layout auto-sizing (seen buckets / bloom shards from expected URL
  * volume): sandbox defaults unchanged, monotonic growth, design-scale
  * values match the BENCH/BASELINE.md sharding math. */
class CrawlConfigSpec extends AnyFunSuite {

  test("sandbox default (2^20 items) reproduces the hand-picked 16/16 layout") {
    val c = CrawlConfig.autoSized(1L << 20)
    assert(c.seenBuckets == 16)
    assert(c.bloomShards == 16)
    assert(c.bloomExpectedItems == (1L << 20))
  }

  test("10^10-URL catalog: 4096 buckets, 256 shards (~9.1 GB filter / ≤64 MB per shard)") {
    val c = CrawlConfig.autoSized(10000000000L)
    assert(c.seenBuckets == 4096)
    assert(c.bloomShards == 256)
    // shard payload check: total filter bytes / shards ≤ 64 MB
    val bitsPerItem = math.log(1.0 / c.bloomFpp) / (math.log(2.0) * math.log(2.0))
    val perShard = c.bloomExpectedItems * bitsPerItem / 8.0 / c.bloomShards
    assert(perShard <= (64L << 20))
  }

  test("monotonic in volume; always powers of two within clamps") {
    val vols = Seq(1L, 1L << 16, 1L << 20, 1L << 24, 1L << 30, 10000000000L, 1L << 36)
    val cfgs = vols.map(CrawlConfig.autoSized(_))
    cfgs.sliding(2).foreach { case Seq(a, b) =>
      assert(a.seenBuckets <= b.seenBuckets)
      assert(a.bloomShards <= b.bloomShards)
    }
    cfgs.foreach { c =>
      assert(Integer.bitCount(c.seenBuckets) == 1 && c.seenBuckets >= 16 && c.seenBuckets <= 4096)
      assert(Integer.bitCount(c.bloomShards) == 1 && c.bloomShards >= 16 && c.bloomShards <= 4096)
    }
  }
}
