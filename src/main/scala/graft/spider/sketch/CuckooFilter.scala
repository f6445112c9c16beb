package graft.spider.sketch

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable.ArrayBuffer

/** Bucketed cuckoo filter over 64-bit keys (SURVEY.md §2.5 A2).
  *
  * 4 slots per bucket, 16-bit fingerprints, power-of-two bucket count,
  * partial-key cuckoo hashing (alt bucket = bucket XOR hash(fingerprint)).
  * Unlike a Bloom filter it supports deletion (frontier retraction) and
  * merge of same-shaped filters. Displaced items that exceed the kick limit
  * go to a small exact overflow list, so `mightContain` NEVER returns a
  * false negative for an inserted key — the invariant the URL-seen prefilter
  * depends on. False-positive rate ~ 4·2/2^16 per lookup at full load.
  */
final class CuckooFilter private (
    val numBuckets: Int,
    private val slots: Array[Short],
    private val overflow: ArrayBuffer[Short],
    private var count: Long) extends Serializable {

  import CuckooFilter._

  def cardinality: Long = count

  private def slotBase(bucket: Int): Int = bucket * SlotsPerBucket

  private def indexOf(h: Long): Int = (spread(h) & (numBuckets - 1)).toInt

  private def altIndex(bucket: Int, fp: Short): Int =
    (bucket ^ (spread(fp.toLong & 0xffffL) & (numBuckets - 1)).toInt) & (numBuckets - 1)

  private def tryPlace(bucket: Int, fp: Short): Boolean = {
    val base = slotBase(bucket)
    var s = 0
    while (s < SlotsPerBucket) {
      if (slots(base + s) == EmptySlot) { slots(base + s) = fp; return true }
      s += 1
    }
    false
  }

  /** Insert; always succeeds (overflow list as last resort). */
  def put(h: Long): Unit = {
    val fp = fingerprint(h)
    val i1 = indexOf(h)
    putFp(i1, fp)
  }

  private def putFp(startBucket: Int, fp0: Short): Unit = {
    count += 1
    var fp = fp0
    var bucket = startBucket
    if (tryPlace(bucket, fp)) return
    bucket = altIndex(bucket, fp)
    if (tryPlace(bucket, fp)) return
    // cuckoo kicks (deterministic victim slot rotation: kick index mod slots)
    var kicks = 0
    while (kicks < MaxKicks) {
      val base = slotBase(bucket)
      val victimSlot = base + (kicks % SlotsPerBucket)
      val victim = slots(victimSlot)
      slots(victimSlot) = fp
      fp = victim
      bucket = altIndex(bucket, fp)
      if (tryPlace(bucket, fp)) return
      kicks += 1
    }
    overflow += fp // exact fallback: no false negatives, ever
  }

  def mightContain(h: Long): Boolean = {
    val fp = fingerprint(h)
    val i1 = indexOf(h)
    bucketHas(i1, fp) || bucketHas(altIndex(i1, fp), fp) || overflow.contains(fp)
  }

  /** Remove one occurrence; true if something was removed. */
  def delete(h: Long): Boolean = {
    val fp = fingerprint(h)
    val i1 = indexOf(h)
    if (removeFrom(i1, fp) || removeFrom(altIndex(i1, fp), fp)) { count -= 1; true }
    else {
      val k = overflow.indexOf(fp)
      if (k >= 0) { overflow.remove(k); count -= 1; true } else false
    }
  }

  private def bucketHas(bucket: Int, fp: Short): Boolean = {
    val base = slotBase(bucket)
    var s = 0
    while (s < SlotsPerBucket) {
      if (slots(base + s) == fp) return true
      s += 1
    }
    false
  }

  private def removeFrom(bucket: Int, fp: Short): Boolean = {
    val base = slotBase(bucket)
    var s = 0
    while (s < SlotsPerBucket) {
      if (slots(base + s) == fp) { slots(base + s) = EmptySlot; return true }
      s += 1
    }
    false
  }

  /** Merge another same-shaped filter into this one (partial→final agg). */
  def mergeInPlace(other: CuckooFilter): CuckooFilter = {
    require(other.numBuckets == numBuckets, "cuckoo merge requires equal shapes")
    var b = 0
    while (b < other.numBuckets) {
      val base = other.slotBase(b)
      var s = 0
      while (s < SlotsPerBucket) {
        val fp = other.slots(base + s)
        if (fp != EmptySlot) putFp(b, fp) // bucket index is position-derived, reuse it
        s += 1
      }
      b += 1
    }
    other.overflow.foreach { fp => overflow += fp; count += 1 }
    this
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream(numBuckets * SlotsPerBucket * 2 + 64)
    val out = new DataOutputStream(bos)
    out.writeInt(numBuckets)
    out.writeLong(count)
    var i = 0
    while (i < slots.length) { out.writeShort(slots(i)); i += 1 }
    out.writeInt(overflow.length)
    overflow.foreach(out.writeShort(_))
    out.flush()
    bos.toByteArray
  }
}

object CuckooFilter {
  final val SlotsPerBucket = 4
  final val MaxKicks = 500
  final val EmptySlot: Short = 0

  /** 64→64 finalizer (splitmix64 avalanche) — decorrelates bucket index,
    * alt index and fingerprint bits. */
  private def spread(h0: Long): Long = {
    var h = h0 + 0x9e3779b97f4a7c15L
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  private def fingerprint(h: Long): Short = {
    val f = (spread(h ^ 0x5851f42d4c957f2dL) & 0xffffL).toShort
    if (f == EmptySlot) 1.toShort else f
  }

  def create(expectedItems: Long): CuckooFilter = {
    // 4 slots/bucket at 95% target load
    val needed = math.max(1L, math.ceil(expectedItems / (SlotsPerBucket * 0.95)).toLong)
    var nb = 1
    while (nb < needed && nb < (1 << 28)) nb <<= 1
    new CuckooFilter(nb, Array.fill[Short](nb * SlotsPerBucket)(EmptySlot),
      new ArrayBuffer[Short](), 0L)
  }

  def deserialize(bytes: Array[Byte]): CuckooFilter = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val nb = in.readInt()
    val count = in.readLong()
    val slots = new Array[Short](nb * SlotsPerBucket)
    var i = 0
    while (i < slots.length) { slots(i) = in.readShort(); i += 1 }
    val ovN = in.readInt()
    val ov = new ArrayBuffer[Short](ovN)
    var k = 0
    while (k < ovN) { ov += in.readShort(); k += 1 }
    new CuckooFilter(nb, slots, ov, count)
  }
}
