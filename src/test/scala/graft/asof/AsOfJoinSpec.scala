package graft.asof

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // (key, ts, value, seq) feature rows — includes equal-ts tie and a null value
  private lazy val feats: DataFrame = Seq(
    ("a", ts("2024-01-01 00:00:00"), Some(1.0), 1L),
    ("a", ts("2024-01-01 01:00:00"), Some(2.0), 2L),
    ("a", ts("2024-01-01 01:00:00"), Some(3.0), 3L), // tie: seq 3 wins
    ("a", ts("2024-01-01 05:00:00"), None, 4L),      // null payload still matches
    ("b", ts("2024-01-01 02:00:00"), Some(9.0), 5L)
  ).toDF("k", "fts", "v", "seq")

  // probes: before-first, exactly-on, between, after-all, unknown key
  private lazy val probes: DataFrame = Seq(
    ("a", ts("2023-12-31 23:00:00"), 100L),
    ("a", ts("2024-01-01 01:00:00"), 101L),
    ("a", ts("2024-01-01 03:30:00"), 102L),
    ("a", ts("2024-01-01 23:00:00"), 103L),
    ("b", ts("2024-01-01 02:00:00"), 104L),
    ("c", ts("2024-01-01 02:00:00"), 105L)
  ).toDF("k", "pts", "pid")

  private def runBoth(ttl: Option[Long]): (Seq[(Long, Option[Timestamp], Option[Double])], Seq[(Long, Option[Timestamp], Option[Double])]) = {
    def shape(df: DataFrame) = df
      .select($"pid", $"matched_ts", $"v")
      .as[(Long, Option[Timestamp], Option[Double])]
      .collect().sortBy(_._1).toSeq
    val a = AsOfJoin.backward(probes, feats, Seq("k"), "pts", "fts", ttl, Seq("seq"))
    val b = AsOfJoin.backwardBroadcast(probes, feats, Seq("k"), "pts", "fts", ttl, Seq("seq"))
    (shape(a), shape(b))
  }

  test("backward as-of join: latest row <= probe ts, ties by greatest tieBreak, left outer") {
    val (got, gotB) = runBoth(None)
    val want = Seq(
      (100L, None, None),                                      // before first
      (101L, Some(ts("2024-01-01 01:00:00")), Some(3.0)),      // tie → seq 3
      (102L, Some(ts("2024-01-01 01:00:00")), Some(3.0)),      // between
      (103L, Some(ts("2024-01-01 05:00:00")), None),           // null payload row wins
      (104L, Some(ts("2024-01-01 02:00:00")), Some(9.0)),      // exactly-on, other key
      (105L, None, None))                                      // unknown key
    assert(got === want)
    assert(gotB === want)
  }

  test("TTL drops matches older than probe_ts - ttl") {
    val (got, gotB) = runBoth(Some(2L * 3600L)) // 2h TTL
    val want = Seq(
      (100L, None, None),
      (101L, Some(ts("2024-01-01 01:00:00")), Some(3.0)),
      (102L, None, None),                                 // latest is 2.5h old
      (103L, None, None),                                 // 18h old
      (104L, Some(ts("2024-01-01 02:00:00")), Some(9.0)),
      (105L, None, None))
    assert(got === want)
    assert(gotB === want)
  }

  test("matches naive per-probe oracle on generated transcripts (incl. leakage)") {
    import graft.datagen.TranscriptGen
    import graft.features.TranscriptFeatures

    val turns = TranscriptGen.turns(spark, nConvs = 30, avgTurns = 10,
      hotConvs = 1, hotFactor = 10, seed = 7L)
    val feats = TranscriptFeatures.cumulativeTurnFeatures(turns.toDF())
      .select($"conv_id", $"ts", $"turn_idx", $"tokens_so_far")
    val probes = TranscriptGen.probes(spark, turns)
      .withColumnRenamed("ts", "probe_ts")

    val ttl = 86400L
    val got = AsOfJoin.backward(probes, feats, Seq("conv_id"), "probe_ts", "ts",
        Some(ttl), Seq("turn_idx"))
      .select($"conv_id", $"probe_ts", $"tokens_so_far")
      .as[(String, Timestamp, Option[Long])].collect()
      .sortBy(r => (r._1, r._2.getTime)).toSeq

    // naive oracle: per-probe scan over the collected feature rows
    val fRows = feats.as[(String, Timestamp, Int, Long)].collect()
    val pRows = probes.as[(String, Timestamp)].collect()
    val want = pRows.map { case (k, pt) =>
      val cand = fRows.filter { case (fk, ft, _, _) =>
        fk == k && !ft.after(pt) &&
          ft.getTime >= pt.getTime - ttl * 1000L
      }
      val best =
        if (cand.isEmpty) None
        else Some(cand.maxBy(r => (r._2.getTime, r._3))._4)
      (k, pt, best)
    }.sortBy(r => (r._1, r._2.getTime)).toSeq
    assert(got === want)

  }

  test("zero temporal leakage: deleting all turns after a cutoff leaves " +
       "features at probes <= cutoff unchanged") {
    import graft.datagen.TranscriptGen
    import graft.features.TranscriptFeatures

    val turns = TranscriptGen.turns(spark, nConvs = 25, avgTurns = 12,
      hotConvs = 1, hotFactor = 10, seed = 11L).toDF()
    val cutoff = turns.selectExpr("percentile(cast(ts as double), 0.5)")
      .as[Double].head()
    val cutoffTs = new Timestamp((cutoff * 1000).toLong)

    def retrieved(src: DataFrame): Seq[(String, Timestamp, Option[Long], Option[Long])] = {
      val f = TranscriptFeatures.cumulativeTurnFeatures(src)
        .select($"conv_id", $"ts", $"turn_idx", $"tokens_so_far", $"turns_so_far")
      val p = TranscriptGen.probes(spark, turns.as[graft.features.Turn])
        .withColumnRenamed("ts", "probe_ts")
        .filter($"probe_ts" <= lit(cutoffTs))
      AsOfJoin.backward(p, f, Seq("conv_id"), "probe_ts", "ts", None, Seq("turn_idx"))
        .select($"conv_id", $"probe_ts", $"tokens_so_far", $"turns_so_far")
        .as[(String, Timestamp, Option[Long], Option[Long])]
        .collect().sortBy(r => (r._1, r._2.getTime)).toSeq
    }

    val full = retrieved(turns)
    val truncated = retrieved(turns.filter($"ts" <= lit(cutoffTs)))
    assert(full === truncated)
    assert(full.nonEmpty)
  }
}
