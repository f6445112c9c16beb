package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column ↔ Expression converters of the
  * classic (non-connect) API, so the engine's custom Catalyst expressions
  * can be exposed as `Column`s. Same technique many Spark extension
  * libraries use; confined to this one file. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** The persisted RDD behind a `localCheckpoint`ed Dataset. `Dataset
    * .unpersist()` is a no-op on checkpoint-backed frames (their blocks are
    * not in the CacheManager), so explicit cleanup must unpersist the
    * underlying `LogicalRDD`'s RDD — this resolves it. */
  def checkpointRdd(ds: Dataset[_]): Option[org.apache.spark.rdd.RDD[_]] =
    ds.queryExecution.analyzed match {
      case lr: execution.LogicalRDD => Some(lr.rdd)
      case _ => None
    }
}
