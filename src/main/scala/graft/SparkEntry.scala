package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.asof.AsOfJoin
import graft.datagen.TranscriptGen
import graft.features.TranscriptFeatures

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the full point-in-time feature pipeline on a synthesized
    * transcript table (BASELINE input_hint shape) — cumulative per-turn
    * features, then backward as-of retrieval at generated probe
    * timestamps. Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val turns = TranscriptGen.turns(spark, nConvs = 200, avgTurns = 12,
      hotConvs = 2, hotFactor = 20, seed = 42L).toDF()
    val feats = TranscriptFeatures
      .cumulativeTurnFeatures(turns)
      .select("conv_id", "ts", "turn_idx", "turns_so_far", "tokens_so_far",
        "tool_turns_so_far", "tool_rate_so_far")
    val probes = TranscriptGen.probes(spark, turns.as[graft.features.Turn](
      org.apache.spark.sql.Encoders.product[graft.features.Turn]))
      .withColumnRenamed("ts", "probe_ts")
    AsOfJoin.backward(
      probes, feats,
      keys = Seq("conv_id"), probeTsCol = "probe_ts", featTsCol = "ts",
      ttlSeconds = Some(30L * 86400L), tieBreak = Seq("turn_idx"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all ++ QueriesExtra.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Queries.oracles ++ QueriesExtra.oracles
}
