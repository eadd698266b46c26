package graft.features

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.datagen.TranscriptGen

class SaltedAggSpec extends SparkTestBase {
  import spark.implicits._

  test("salted two-phase conv aggregation equals the direct aggregation, incl. hot keys") {
    val turns = TranscriptGen.turns(spark, nConvs = 30, avgTurns = 10,
      hotConvs = 2, hotFactor = 40, seed = 9L).toDF()

    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(
        $"conv_id", $"n_turns", $"last_ts", $"first_ts", $"tool_turns",
        round($"tool_rate", 9).as("tool_rate"), $"total_tokens",
        $"role_user_tokens", $"role_assistant_tokens",
        $"role_system_turns", $"role_tool_turns")
      .collect().map(_.toString).sorted.toSeq

    val direct = canon(TranscriptFeatures.convAggregates(turns))
    val salted = canon(TranscriptFeatures.convAggregatesSalted(turns, salt = 16))
    assert(salted === direct)
    assert(direct.nonEmpty)
  }
}
