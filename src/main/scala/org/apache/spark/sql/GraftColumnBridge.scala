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

  /** Run a per-row transform ACROSS A SERIALIZED-ARROW BOUNDARY: each
    * partition's rows are encoded into Arrow record batches
    * (`maxRecordsPerBatch` rows each), the transform consumes rows
    * DESERIALIZED FROM THOSE BYTES and its outputs are re-encoded to
    * Arrow before becoming the result DataFrame.
    *
    * This is the exact data path of PySpark's `mapInArrow`/`mapInPandas`
    * (whose Scala-side plumbing is likewise private): the bytes handed
    * to `rowFn`'s iterator are what a Python codec worker would receive
    * on its socket. graft's multimodal stage uses it so the production
    * swap — replace the in-JVM stub with a real decode worker — changes
    * only the consumer of the batches, not the plumbing
    * (`graft.multimodal.Multimodal.extractFeaturesArrow`;
    * MultimodalSpec asserts arrow-path ≡ row-path equality).
    *
    * Implementation note: `queryExecution.toRdd` + `internalCreateDataFrame`
    * is the same internal seam `ArrowEvalExec` builds on — this is
    * infrastructure-level plumbing, not an operator expressed via RDDs.
    */
  def mapViaArrowBatches(
      df: Dataset[Row],
      outSchema: org.apache.spark.sql.types.StructType,
      maxRecordsPerBatch: Int)(
      rowFn: org.apache.spark.sql.catalyst.InternalRow =>
        org.apache.spark.sql.catalyst.InternalRow): Dataset[Row] = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    val inSchema = df.schema
    val tz = spark.sessionState.conf.sessionLocalTimeZone
    val rdd = df.queryExecution.toRdd.mapPartitions { it =>
      val ctx = org.apache.spark.TaskContext.get()
      // rows → serialized Arrow batches (the worker-bound payload)
      val inBatches = execution.arrow.ArrowConverters.toBatchIterator(
        it, inSchema, maxRecordsPerBatch.toLong, tz,
        true, false, ctx)
      // worker side: decode batches → transform rows → encode batches
      val transformed = execution.arrow.ArrowConverters.fromBatchIterator(
        inBatches, inSchema, tz, true, false, ctx).map(rowFn)
      val outBatches = execution.arrow.ArrowConverters.toBatchIterator(
        transformed, outSchema, maxRecordsPerBatch.toLong, tz,
        true, false, ctx)
      // engine side: decode the worker's batches back to rows
      execution.arrow.ArrowConverters.fromBatchIterator(
        outBatches, outSchema, tz, true, false, ctx)
    }
    spark.internalCreateDataFrame(rdd, outSchema)
  }

  /** Free the block-manager storage behind a `localCheckpoint`ed
    * Dataset. `Dataset.unpersist` only talks to the CacheManager and is
    * a no-op for checkpoints; the data actually lives in the persisted
    * RDD inside the plan's `LogicalRDD` leaf. Iterative algorithms that
    * checkpoint per round (connected components) must free superseded
    * rounds eagerly — the GC-driven ContextCleaner is too lazy for a
    * long-lived session running many labelings. Safe ONLY for datasets
    * whose data is no longer needed: a localCheckpoint cannot be
    * recomputed once its blocks are gone.
    *
    * The argument must be a directly-localCheckpointed Dataset or a pure
    * projection of one — a plan with a SINGLE LogicalRDD leaf. The
    * requirement is ENFORCED (not just documented): a derived plan (e.g.
    * a join with another still-live checkpoint) would otherwise silently
    * free every reachable checkpoint, including ones the caller still
    * needs (r4 ADVICE #2). */
  def unpersistCheckpoint(df: Dataset[_]): Unit = {
    val leaves = df.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r
    }
    require(leaves.size == 1,
      s"unpersistCheckpoint expects a plan with exactly one LogicalRDD " +
        s"leaf (a localCheckpointed Dataset or a pure projection of one); " +
        s"got ${leaves.size} — freeing all of them could destroy " +
        "checkpoints other datasets still depend on")
    leaves.head.rdd.unpersist(blocking = false)
  }
}
