package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Deterministic context-window packing plan — the step between a
  * cleaned corpus and a training run: fix a global document order,
  * take the running token total, and assign every document the range of
  * fixed-capacity context windows ("bins") its tokens will occupy when
  * the corpus is concatenated and cut every `capacity` tokens
  * (GPT-style packing; documents may straddle bin boundaries, which is
  * exactly what `bin_first < bin_last` records).
  *
  * The order is the engine's standard content-independent 60-bit hash
  * of the document key ([[MixtureSampler.u60]], its own salt) with the
  * key as tie-break — a deterministic global shuffle: replayable
  * (`ORDER BY h, key` in any SQL engine reproduces the exact order,
  * q62), stable across reruns, and uncorrelated with mixture sampling
  * and split assignment.
  *
  * The running total is the textbook scale-killer: Spark's
  * `sum().over(Window.orderBy(...))` with no partition key moves the
  * ENTIRE corpus into one task. This operator is the distributed
  * prefix-sum instead:
  *
  *  1. shard monotonically in hash order — `shard = h div (2^60 /
  *     nShards)` — so shard boundaries respect the global order without
  *     a sampled range partitioner (no RangePartitioner: its reservoir
  *     sampling makes boundaries run-dependent, and this operator needs
  *     the two passes below to agree);
  *  2. one tiny aggregate: per-shard token/row totals (≤ nShards rows,
  *     collected driver-side — bounded by construction), prefix-summed
  *     into per-shard offsets;
  *  3. one window pass PARTITIONED BY shard, ordered by (h, key),
  *     plus the broadcast shard offset — every task owns one shard's
  *     contiguous hash range, so parallelism = nShards while the
  *     result equals the single-partition window exactly (PackingSpec
  *     asserts equality; PlanSpec asserts the exchange is
  *     hashpartitioning, not SinglePartition).
  *
  * Cost: two scans of the input (the totals pass and the window pass —
  * both scan-local up to their exchanges) and one hash shuffle on the
  * shard id. All arithmetic is integer (exact, order-independent).
  *
  * CORRECTNESS REQUIREMENT — deterministic input: the two passes must
  * observe the same rows, so `df` must be stable across re-execution
  * (committed files, a localCheckpoint, or a deterministic plan). A
  * nondeterministic upstream (a fractional sample, a limit, a
  * shuffle-order-dependent dedup survivor choice) can yield different
  * rows per scan, corrupting the shard offsets and the global prefix
  * sum with no failure signal — eagerly checkpoint such inputs first
  * (the same snapshot rationale as DedupStore.append). Persisting the
  * input upstream also removes the double-scan cost when scans are
  * expensive.
  *
  * Output columns: `seq` (1-based global position), `cum_tokens`
  * (inclusive running total), `bin_first`/`bin_last` (0-based window
  * ids the document occupies). Zero-token documents are dropped (they
  * occupy no window).
  */
object Packing {

  private val HashBits = 60

  def pack(
      df: DataFrame,
      keyCol: String,
      tokensCol: String,
      capacity: Long,
      nShards: Int = 64,
      salt: String = "graft-pack"): DataFrame = {
    require(capacity > 0, s"capacity must be positive: $capacity")
    require(nShards > 0 && nShards <= 100000,
      s"nShards must be in [1, 100000]: $nShards")

    val shardWidth = (1L << HashBits) / nShards
    val base = df
      .filter(col(tokensCol) > 0L)
      .withColumn("__h", MixtureSampler.u60(col(keyCol), salt))
      // monotone in __h (floor of integer division), clamped for the
      // non-power-of-two remainder range
      .withColumn("__shard",
        least(expr(s"__h div ${shardWidth}L"), lit(nShards - 1L)).cast("int"))

    // pass 1: per-shard totals — map-side-combined to ≤ nShards rows
    val totals = base.groupBy(col("__shard"))
      .agg(sum(col(tokensCol).cast("long")).as("tok"), count(lit(1)).as("cnt"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)

    // exclusive prefix offsets per shard, driver-side (nShards entries)
    var tokOff = 0L
    var rowOff = 0L
    val offRows = totals.map { case (shard, tok, cnt) =>
      val r = Row(shard, tokOff, rowOff)
      tokOff += tok
      rowOff += cnt
      r
    }
    val spark = df.sparkSession
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows.toSeq, 1),
      StructType(Seq(
        StructField("__shard", IntegerType, nullable = false),
        StructField("__tok_off", LongType, nullable = false),
        StructField("__row_off", LongType, nullable = false))))

    // pass 2: per-shard window + broadcast offset = global prefix sum
    val w = Window.partitionBy(col("__shard")).orderBy(col("__h"), col(keyCol))
    base
      .join(broadcast(offDf), Seq("__shard"))
      .withColumn("seq", row_number().over(w).cast("long") + col("__row_off"))
      .withColumn("cum_tokens",
        sum(col(tokensCol).cast("long")).over(w) + col("__tok_off"))
      .withColumn("bin_first", expr(s"(cum_tokens - $tokensCol) div ${capacity}L"))
      .withColumn("bin_last", expr(s"(cum_tokens - 1) div ${capacity}L"))
      .drop("__h", "__shard", "__tok_off", "__row_off")
  }
}
