package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.features.{TranscriptFeatures, Turn}

/** Structured Streaming versions of the feature pipeline (SURVEY §2.1 S4/
  * S7: the reference registers Kafka sources but executes nothing; this
  * is the native streaming path — `readStream` → transforms →
  * `writeStream`).
  *
  * All operators are watermark-bounded so state is dropped at scale:
  *  - [[sessionAggregates]] — gap-based sessions via the built-in
  *    `session_window` (state = open sessions only).
  *  - [[windowedTurnStats]] — tumbling event-time windows per
  *    conversation.
  *  - [[runningFeatures]] — per-turn cumulative features via
  *    `flatMapGroupsWithState` (the streaming analog of
  *    [[TranscriptFeatures.cumulativeTurnFeatures]]), with processing-
  *    time timeout to expire idle conversations.
  */
object StreamingFeatures {

  /** Gap-based sessionization on a stream: one row per closed session
    * (conv_id, session start/end, turns, tokens). */
  def sessionAggregates(
      turns: DataFrame,
      gapSeconds: Long = 1800L,
      watermark: String = "1 hour"): DataFrame =
    turns
      .withWatermark("ts", watermark)
      .groupBy(
        col("conv_id"),
        session_window(col("ts"), s"$gapSeconds seconds"))
      .agg(
        count(lit(1)).as("turns"),
        sum(TranscriptFeatures.tokenCount(col("text"))).cast("long").as("tokens"),
        sum(TranscriptFeatures.toolUsed(col("tool"))).cast("long").as("tool_turns"))
      .select(
        col("conv_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("turns"), col("tokens"), col("tool_turns"))

  /** Tumbling-window per-conversation stats (e.g. 5-minute activity). */
  def windowedTurnStats(
      turns: DataFrame,
      windowLen: String = "5 minutes",
      watermark: String = "1 hour"): DataFrame =
    turns
      .withWatermark("ts", watermark)
      .groupBy(col("conv_id"), window(col("ts"), windowLen))
      .agg(
        count(lit(1)).as("turns"),
        sum(TranscriptFeatures.tokenCount(col("text"))).cast("long").as("tokens"))
      .select(
        col("conv_id"),
        col("window.start").as("window_start"),
        col("turns"), col("tokens"))

  /** Streaming exact dedup on normalized content: keep the first
    * occurrence of each fingerprint, drop later duplicates, with
    * watermark-bounded state (fingerprints older than the watermark are
    * evicted — the standard pattern for unbounded-stream dedup; an
    * ingest pipeline at 100 TB/day cannot keep every fingerprint ever
    * seen in state). Content hashing matches the batch path
    * ([[graft.text.TextAnalysis.fingerprint]]), so batch backfill and
    * streaming ingest agree on what is a duplicate.
    */
  def streamingDedup(
      docs: DataFrame,
      textCol: String,
      tsCol: String = "ts",
      watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("_fp", graft.text.TextAnalysis.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("_fp")
      .drop("_fp")

  /** Streaming NEAR-duplicate dedup: keep the first document per 64-bit
    * SimHash signature ([[graft.functions.SimHash64]] — the batch
    * pipeline's native scan scalar), watermark-bounded state.
    *
    * Collapses the signature-identical near-dup class DETERMINISTICALLY:
    * SimHash here is a majority vote over DISTINCT normalized tokens, so
    * exact copies plus every token-permutation / token-repetition /
    * case / whitespace mutation of a document share one signature —
    * mutations the exact-fingerprint [[streamingDedup]] misses
    * (StreamingFeaturesSpec proves both the collapse and the batch
    * equivalence). Hamming-radius matching (the batch path's 4×16-bit
    * pigeonhole blocking, [[graft.dedup.Dedup.simhashPairs]]) needs
    * OR-semantics across four band state stores — not expressible as a
    * single watermarked dropDuplicates; run the batch near-dup pass over
    * the landed corpus for that class. State cost: one long key per
    * in-watermark signature, same as exact dedup.
    */
  def streamingNearDupDedup(
      docs: DataFrame,
      textCol: String,
      tsCol: String = "ts",
      watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("_sig", graft.functions.SimHash64(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("_sig")
      .drop("_sig")

  /** Running per-conversation state carried across micro-batches. */
  case class ConvState(turns: Long, tokens: Long, toolTurns: Long)

  /** Per-turn cumulative feature row emitted by [[runningFeatures]]. */
  case class TurnFeature(
      conv_id: String,
      turn_idx: Int,
      ts: java.sql.Timestamp,
      turns_so_far: Long,
      tokens_so_far: Long,
      tool_turns_so_far: Long)

  /** Streaming analog of cumulativeTurnFeatures: custom keyed state via
    * flatMapGroupsWithState. Within a micro-batch, turns of a
    * conversation are folded in (ts, turn_idx) order; state persists
    * across batches and expires after `idleTimeout` of processing time.
    */
  def runningFeatures(
      turns: Dataset[Turn],
      idleTimeout: Option[String] = None): Dataset[TurnFeature] = {
    import turns.sparkSession.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    turns
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf) {
        (convId: String, rows: Iterator[Turn], state: GroupState[ConvState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(ConvState(0L, 0L, 0L))
            // Buffers ONE group's rows of ONE micro-batch to sort by
            // event time (cumulative features need in-order turns).
            // Bounded by (per-conversation arrival rate × trigger
            // interval), not by conversation length — acceptable for
            // transcript-shaped streams; a conversation hot enough to
            // overflow a micro-batch buffer should be routed through the
            // watermarked windowed path instead.
            val out = rows.toSeq.sortBy(t => (t.ts.getTime, t.turn_idx)).map { t =>
              val toks =
                if (t.text == null) 0
                else t.text.split("\\s+").count(_.nonEmpty)
              val tool = if (t.tool != null && t.tool.nonEmpty) 1L else 0L
              st = ConvState(st.turns + 1, st.tokens + toks, st.toolTurns + tool)
              TurnFeature(convId, t.turn_idx, t.ts, st.turns, st.tokens, st.toolTurns)
            }
            state.update(st)
            idleTimeout.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }
}
