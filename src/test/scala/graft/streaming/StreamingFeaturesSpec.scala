package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase
import graft.datagen.TranscriptGen
import graft.features.{TranscriptFeatures, Turn}

case class DedupDoc(doc_id: Long, text: String, ts: java.sql.Timestamp)

class StreamingFeaturesSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val turns: Seq[Turn] =
    TranscriptGen.turns(spark, nConvs = 20, avgTurns = 8, seed = 21L).collect().toSeq

  test("streaming runningFeatures equals batch cumulativeTurnFeatures") {
    val input = MemoryStream[Turn](spark)
    val out = StreamingFeatures.runningFeatures(input.toDS())
    val q = out.writeStream
      .format("memory").queryName("running_feats")
      .outputMode("append").start()
    // two micro-batches to prove state carries across batches
    val (b1, b2) = turns.sortBy(t => (t.conv_id, t.turn_idx))
      .partition(_.turn_idx < 3)
    input.addData(b1)
    input.addData(b2)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("running_feats")
      .select($"conv_id", $"turn_idx", $"turns_so_far", $"tokens_so_far", $"tool_turns_so_far")
      .as[(String, Int, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq

    val want = TranscriptFeatures.cumulativeTurnFeatures(turns.toDF())
      .select($"conv_id", $"turn_idx", $"turns_so_far", $"tokens_so_far", $"tool_turns_so_far")
      .as[(String, Int, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq

    assert(got === want)
    assert(got.nonEmpty)
  }

  test("session_window aggregation closes sessions at the gap") {
    val data = Seq(
      Turn("c1", 0, "user", "a b c", "", ts("2024-01-01 00:00:00")),
      Turn("c1", 1, "assistant", "d e", "search", ts("2024-01-01 00:05:00")),
      // > 30 min gap → new session
      Turn("c1", 2, "user", "f", "", ts("2024-01-01 01:00:00")),
      Turn("c2", 0, "user", "g h", "", ts("2024-01-01 00:00:00")))
    val input = MemoryStream[Turn](spark)
    val out = StreamingFeatures.sessionAggregates(input.toDF(), gapSeconds = 1800L)
    val q = out.writeStream
      .format("memory").queryName("sessions")
      .outputMode("complete").start()
    input.addData(data)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sessions")
      .select($"conv_id", $"turns", $"tokens", $"tool_turns")
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got === Seq(("c1", 1L, 1L, 0L), ("c1", 2L, 5L, 1L), ("c2", 1L, 2L, 0L)))
  }

  test("streaming dedup drops in-watermark duplicates, keeps first occurrence") {
    val data = Seq(
      DedupDoc(1L, "the quick brown fox", ts("2024-01-01 00:00:00")),
      DedupDoc(2L, "a completely different document", ts("2024-01-01 00:01:00")),
      // duplicate of doc 1 after normalization (case + whitespace)
      DedupDoc(3L, "  THE QUICK   BROWN FOX ", ts("2024-01-01 00:02:00")),
      DedupDoc(4L, "the quick brown fox", ts("2024-01-01 00:03:00")))
    val input = MemoryStream[DedupDoc](spark)
    val out = StreamingFeatures.streamingDedup(input.toDF(), "text")
    val q = out.writeStream
      .format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    // forced batch boundary: the duplicates must test committed state,
    // not shuffle-order-dependent intra-batch survivor choice
    input.addData(data.take(2))
    q.processAllAvailable()
    input.addData(data.drop(2))
    q.processAllAvailable()
    q.stop()

    val kept = spark.table("dedup_stream")
      .select($"doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L))
  }

  test("streaming near-dup dedup collapses signature-identical mutations, " +
       "identically to the batch path") {
    import org.apache.spark.sql.functions.{col, min => smin, row_number}
    val data = Seq(
      DedupDoc(1L, "the quick brown fox jumps over dog", ts("2024-01-01 00:00:00")),
      DedupDoc(2L, "an entirely unrelated document here", ts("2024-01-01 00:01:00")),
      // token PERMUTATION + case/whitespace mutation of doc 1 — a
      // near-dup the exact fingerprint would NOT catch
      DedupDoc(3L, "dog  over JUMPS fox brown quick the", ts("2024-01-01 00:02:00")),
      // token REPETITION mutation of doc 2 (distinct-token set unchanged)
      DedupDoc(4L, "an an entirely unrelated document here here", ts("2024-01-01 00:03:00")),
      DedupDoc(5L, "a third genuinely novel text", ts("2024-01-01 00:04:00")))

    // precondition: these mutations are invisible to exact dedup
    val fps = data.toDF().select(
      graft.text.TextAnalysis.fingerprint(col("text"))).as[String].collect()
    assert(fps.distinct.length === 5, "mutations must not be exact duplicates")

    val input = MemoryStream[DedupDoc](spark)
    val out = StreamingFeatures.streamingNearDupDedup(input.toDF(), "text")
    val q = out.writeStream
      .format("memory").queryName("neardup_stream")
      .outputMode("append").start()
    // two micro-batches: doc 3's duplicate state must carry across —
    // the boundary must be FORCED (back-to-back addData coalesces into
    // one batch, and intra-batch survivor order is shuffle-dependent)
    input.addData(data.take(2))
    q.processAllAvailable()
    input.addData(data.drop(2))
    q.processAllAvailable()
    q.stop()

    val kept = spark.table("neardup_stream")
      .select($"doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 5L))

    // batch equivalence: first row per SimHash64 signature over the same data
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_sig")).orderBy(col("ts").asc, col("doc_id").asc)
    val batchKept = data.toDF()
      .withColumn("_sig", graft.functions.SimHash64(col("text")))
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .select($"doc_id").as[Long].collect().toSet
    assert(batchKept === kept)
  }

  test("tumbling windowed stats") {
    val data = Seq(
      Turn("c1", 0, "user", "a b", "", ts("2024-01-01 00:01:00")),
      Turn("c1", 1, "user", "c", "", ts("2024-01-01 00:03:00")),
      Turn("c1", 2, "user", "d e f", "", ts("2024-01-01 00:07:00")))
    val input = MemoryStream[Turn](spark)
    val out = StreamingFeatures.windowedTurnStats(input.toDF(), windowLen = "5 minutes")
    val q = out.writeStream
      .format("memory").queryName("windows")
      .outputMode("complete").start()
    input.addData(data)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("windows")
      .select($"conv_id", $"turns", $"tokens")
      .as[(String, Long, Long)].collect().sortBy(_._2).toSeq
    assert(got === Seq(("c1", 1L, 3L), ("c1", 2L, 3L)))
  }
}
