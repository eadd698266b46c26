package graft.features

import graft.SparkTestBase
import graft.datagen.TranscriptGen
import graft.materialize.Materializer

/** BASELINE per-row invariant: "per-turn text equality under stable
  * (conv_id, turn_idx) ordering" — the feature pipeline and the
  * materialization round-trip must never mutate, drop or reorder turn
  * text.
  */
class TextEqualitySpec extends SparkTestBase {
  import spark.implicits._

  test("per-turn text equality survives the feature pipeline and materialization") {
    val turns = TranscriptGen.turns(spark, nConvs = 25, avgTurns = 10,
      hotConvs = 1, hotFactor = 15, seed = 33L).toDF()

    val original = turns
      .select($"conv_id", $"turn_idx", $"text")
      .as[(String, Int, String)].collect().sortBy(r => (r._1, r._2)).toSeq

    // through the full (wide) feature pipeline
    val throughFeatures = TranscriptFeatures.cumulativeTurnFeatures(turns)
      .select($"conv_id", $"turn_idx", $"text")
      .as[(String, Int, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(throughFeatures === original)

    // through checkpointed materialization and back
    val out = java.nio.file.Files.createTempDirectory("graft-texteq").toString + "/o"
    Materializer.materialize(
      spark, TranscriptFeatures.cumulativeTurnFeatures(turns), "ts", out)
    val roundTripped = Materializer.read(spark, out)
      .select($"conv_id", $"turn_idx", $"text")
      .as[(String, Int, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(roundTripped === original)
  }
}
