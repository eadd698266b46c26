package graft.features

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TranscriptFeaturesSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("tokenCount: whitespace tokens, blank/empty → 0") {
    val df = Seq("one two  three", "", "  ", "solo", "a\tb\nc")
      .toDF("text")
      .select(TranscriptFeatures.tokenCount($"text").as("n"))
    assert(df.as[Int].collect().toSeq === Seq(3, 0, 0, 1, 3))
  }

  test("sessionize: new session when gap strictly exceeds threshold") {
    val df = Seq(
      ("c1", 0, ts("2024-01-01 00:00:00")),
      ("c1", 1, ts("2024-01-01 00:10:00")),
      ("c1", 2, ts("2024-01-01 00:40:00")), // gap == 1800s → same session
      ("c1", 3, ts("2024-01-01 01:10:01")), // gap 1801s → new session
      ("c2", 0, ts("2024-01-01 00:00:00"))
    ).toDF("conv_id", "turn_idx", "ts")
    val got = TranscriptFeatures
      .sessionize(df, Seq("conv_id"), "ts", 1800L, Seq($"ts", $"turn_idx"))
      .select($"conv_id", $"turn_idx", $"session_id")
      .as[(String, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got === Seq(
      ("c1", 0, 0L), ("c1", 1, 0L), ("c1", 2, 0L), ("c1", 3, 1L), ("c2", 0, 0L)))
  }

  test("lag/lead per conversation ordered by turn_idx") {
    val df = Seq(
      ("c1", 0, 10.0), ("c1", 1, 20.0), ("c1", 2, 30.0), ("c2", 0, 5.0)
    ).toDF("conv_id", "turn_idx", "v")
    val got = TranscriptFeatures
      .withLagLead(df, Seq("conv_id"), Seq($"turn_idx"), Seq("v"))
      .select($"conv_id", $"turn_idx", $"v_lag1", $"v_lead1")
      .as[(String, Int, Option[Double], Option[Double])]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got === Seq(
      ("c1", 0, None, Some(20.0)),
      ("c1", 1, Some(10.0), Some(30.0)),
      ("c1", 2, Some(20.0), None),
      ("c2", 0, None, None)))
  }

  test("rollingTurnCount: RANGE frame over trailing event-time window") {
    val df = Seq(
      ("c1", ts("2024-01-01 00:00:00")),
      ("c1", ts("2024-01-01 00:00:30")),
      ("c1", ts("2024-01-01 00:01:00")), // 60s window: includes all 3
      ("c1", ts("2024-01-01 00:05:00"))  // only itself
    ).toDF("conv_id", "ts")
    val got = TranscriptFeatures
      .rollingTurnCount(df, Seq("conv_id"), "ts", 60L)
      .select($"rolling_turns").as[Long].collect().toSeq.sorted
    assert(got === Seq(1L, 1L, 2L, 3L))
  }

  test("convAggregates: counts, tool rate, per-role token stats") {
    val df = Seq(
      ("c1", 0, "user", "hello there", "", ts("2024-01-01 00:00:00")),
      ("c1", 1, "assistant", "hi how are you", "search", ts("2024-01-01 00:00:10")),
      ("c1", 2, "user", "good", "", ts("2024-01-01 00:00:20"))
    ).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val row = TranscriptFeatures.convAggregates(df).collect().head
    assert(row.getAs[Long]("n_turns") === 3L)
    assert(row.getAs[Long]("tool_turns") === 1L)
    assert(math.abs(row.getAs[Double]("tool_rate") - 1.0 / 3.0) < 1e-12)
    assert(row.getAs[Long]("role_user_tokens") === 3L)
    assert(row.getAs[Long]("role_assistant_tokens") === 4L)
    assert(row.getAs[Long]("total_tokens") === 7L)
    assert(row.getAs[Timestamp]("first_ts") === ts("2024-01-01 00:00:00"))
    assert(row.getAs[Timestamp]("last_ts") === ts("2024-01-01 00:00:20"))
  }
}
