package graft.spider.core

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.Platform

/** 64-bit hashing shared by the oracle and the engine.
  *
  * Delegates to Spark's XXH64 with seed 42 so that a plain-Scala call
  * (oracle side) and the built-in `xxhash64(col)` Catalyst expression
  * (engine side) produce identical values for the same string — the
  * URL-seen set is keyed on these hashes, so the two executions MUST agree.
  */
object Hash64 {
  final val Seed = 42L

  /** Equals Spark SQL `xxhash64(s)` for a non-null string column. */
  def string(s: String): Long = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, Seed)
  }

  /** Equals Spark SQL `xxhash64(b)` for a non-null binary column. */
  def bytes(b: Array[Byte]): Long =
    XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, Seed)

  /** Floor-mod into [0, m). */
  def pmod(h: Long, m: Long): Long = { val r = h % m; if (r < 0) r + m else r }
}
