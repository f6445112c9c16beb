package graft.spider.sketch

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, Dataset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Distributed URL-seen sketches (SURVEY.md §2.5 A1/A2).
  *
  * Partition-local filters merged to one — realized Catalyst-natively as
  * `TypedImperativeAggregate`s so the partial/final merge rides the normal
  * aggregate exchange exactly like a built-in (partial aggregation is pushed
  * map-side; the final merge is the tree merge). A literal `treeAggregate`
  * RDD variant is kept alongside (north-star wording) and benched against it.
  */

/** A1(b): groupBy-free `bloom_agg(url_hash)` → serialized BloomFilter bytes. */
case class BloomAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] with UnaryLike[Expression] {

  override def prettyName: String = "bloom_agg"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buffer.putLong(v.asInstanceOf[Long])
    buffer
  }

  override def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
    a.mergeInPlace(b); a
  }

  override def eval(buffer: BloomFilter): Any = serialize(buffer)

  override def serialize(buffer: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    buffer.writeTo(bos)
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(offset: Int): BloomAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
}

/** A1(c): sharded Bloom build — one aggregation producing `shards`
  * independent filters keyed by pmod(hash, shards). The serialized blob is
  * shipped to tasks via `SparkContext.broadcast` (not an expression-tree
  * literal), and each shard merges independently round-over-round, so the
  * seen sketch at 10^10 URLs is a set of bounded filters instead of one
  * monolithic gigabyte blob in the task binary. */
case class ShardedBloomAgg(
    child: Expression,
    shards: Int,
    expectedItemsPerShard: Long,
    fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[BloomFilter]] with UnaryLike[Expression] {

  override def prettyName: String = "sharded_bloom_agg"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[BloomFilter] =
    Array.fill(shards)(BloomFilter.create(expectedItemsPerShard, fpp))

  override def update(buffer: Array[BloomFilter], input: InternalRow): Array[BloomFilter] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      buffer(Sketches.shardOf(h, shards)).putLong(h)
    }
    buffer
  }

  override def merge(a: Array[BloomFilter], b: Array[BloomFilter]): Array[BloomFilter] = {
    var i = 0
    while (i < a.length) { a(i).mergeInPlace(b(i)); i += 1 }
    a
  }

  override def eval(buffer: Array[BloomFilter]): Any = serialize(buffer)

  override def serialize(buffer: Array[BloomFilter]): Array[Byte] =
    Sketches.shardedBytes(buffer.map(Sketches.bloomBytes))

  override def deserialize(bytes: Array[Byte]): Array[BloomFilter] =
    Sketches.shardedFrom(bytes).map(Sketches.bloomFrom)

  override def withNewMutableAggBufferOffset(offset: Int): ShardedBloomAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ShardedBloomAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): ShardedBloomAgg =
    copy(child = newChild)
}

/** A2: same harness over the custom cuckoo filter (supports deletion). */
case class CuckooAgg(
    child: Expression,
    expectedItems: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CuckooFilter] with UnaryLike[Expression] {

  override def prettyName: String = "cuckoo_agg"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): CuckooFilter = CuckooFilter.create(expectedItems)

  override def update(buffer: CuckooFilter, input: InternalRow): CuckooFilter = {
    val v = child.eval(input)
    if (v != null) buffer.put(v.asInstanceOf[Long])
    buffer
  }

  override def merge(a: CuckooFilter, b: CuckooFilter): CuckooFilter = a.mergeInPlace(b)

  override def eval(buffer: CuckooFilter): Any = buffer.serialize()

  override def serialize(buffer: CuckooFilter): Array[Byte] = buffer.serialize()

  override def deserialize(bytes: Array[Byte]): CuckooFilter = CuckooFilter.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): CuckooAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CuckooAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): CuckooAgg =
    copy(child = newChild)
}

object Sketches {
  private def agg(e: Expression): Column =
    GraftColumnBridge.column(e.asInstanceOf[TypedImperativeAggregate[_]]
      .toAggregateExpression(isDistinct = false))

  /** Column form: `df.agg(bloomAgg($"url_hash", n, fpp))` → binary. */
  def bloomAgg(c: Column, expectedItems: Long, fpp: Double): Column =
    agg(BloomAgg(GraftColumnBridge.expression(c), expectedItems, fpp))

  def cuckooAgg(c: Column, expectedItems: Long): Column =
    agg(CuckooAgg(GraftColumnBridge.expression(c), expectedItems))

  /** `df.agg(shardedBloomAgg($"url_hash", 16, nPerShard, fpp))` → one blob of
    * `shards` serialized filters (see [[shardedBytes]]). */
  def shardedBloomAgg(c: Column, shards: Int, expectedItemsPerShard: Long,
      fpp: Double): Column =
    agg(ShardedBloomAgg(GraftColumnBridge.expression(c), shards,
      expectedItemsPerShard, fpp))

  /** Shard index of a 64-bit hash — MUST agree with Spark's `pmod`. */
  def shardOf(h: Long, shards: Int): Int = {
    val m = h % shards
    (if (m < 0) m + shards else m).toInt
  }

  /** Multi-shard blob: int shard-count, then per shard int length + bytes. */
  def shardedBytes(shards: Array[Array[Byte]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(shards.length)
    shards.foreach { b => out.writeInt(b.length); out.write(b) }
    out.flush()
    bos.toByteArray
  }

  def shardedFrom(bytes: Array[Byte]): Array[Array[Byte]] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    Array.fill(n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      b
    }
  }

  /** Per-shard incremental merge: sketch(r) = sketch(r-1) ⊎ sketch(delta). */
  def mergeShardedBlobs(prev: Array[Byte], delta: Array[Byte]): Array[Byte] = {
    val a = shardedFrom(prev).map(bloomFrom)
    val b = shardedFrom(delta).map(bloomFrom)
    require(a.length == b.length,
      s"bloom shard count mismatch: ${a.length} vs ${b.length}")
    var i = 0
    while (i < a.length) { a(i).mergeInPlace(b(i)); i += 1 }
    shardedBytes(a.map(bloomBytes))
  }

  /** A1(a): the literal north-star variant — partition-local filters merged
    * via `RDD.treeAggregate`. Kept for the bench comparison with BloomAgg. */
  def treeAggBloom(hashes: Dataset[Long], expectedItems: Long, fpp: Double,
      depth: Int = 2): BloomFilter =
    hashes.rdd.treeAggregate(BloomFilter.create(expectedItems, fpp))(
      seqOp = (bf, h) => { bf.putLong(h); bf },
      combOp = (a, b) => { a.mergeInPlace(b); a },
      depth = depth)

  def bloomBytes(bf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  def bloomFrom(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
}
