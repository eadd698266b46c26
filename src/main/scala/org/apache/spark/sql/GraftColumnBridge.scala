package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to the package-private Column <-> Expression
  * converters, so graft's native Catalyst expressions can be exposed as
  * Columns (the standard pattern for Spark extension libraries).
  */
object GraftColumnBridge {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  /** Free the block-manager storage behind a `localCheckpoint`ed
    * Dataset. `Dataset.unpersist` only talks to the CacheManager and is
    * a no-op for checkpoints; the data actually lives in the persisted
    * RDD inside the plan's `LogicalRDD` leaf. Iterative algorithms that
    * checkpoint per round (connected components) must free superseded
    * rounds eagerly — the GC-driven ContextCleaner is too lazy for a
    * long-lived session running many labelings. Safe ONLY for datasets
    * whose data is no longer needed: a localCheckpoint cannot be
    * recomputed once its blocks are gone. */
  def unpersistCheckpoint(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.foreach {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        r.rdd.unpersist(blocking = false)
      case _ =>
    }
}
