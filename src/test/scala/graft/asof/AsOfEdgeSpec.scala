package graft.asof

import java.sql.Timestamp

import graft.SparkTestBase

class AsOfEdgeSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("empty feature table: all probes survive with null features") {
    val probes = Seq(("a", ts("2024-01-01 00:00:00"), 1L)).toDF("k", "pts", "pid")
    val feats = Seq.empty[(String, Timestamp, Double)].toDF("k", "fts", "v")
    val out = AsOfJoin.backward(probes, feats, Seq("k"), "pts", "fts", Some(3600L))
      .select($"pid", $"v").as[(Long, Option[Double])].collect().toSeq
    assert(out === Seq((1L, None)))
    val outB = AsOfJoin.backwardBroadcast(probes, feats, Seq("k"), "pts", "fts", Some(3600L))
      .select($"pid", $"v").as[(Long, Option[Double])].collect().toSeq
    assert(outB === Seq((1L, None)))
  }

  test("empty probe table: empty result, schema intact") {
    val probes = Seq.empty[(String, Timestamp, Long)].toDF("k", "pts", "pid")
    val feats = Seq(("a", ts("2024-01-01 00:00:00"), 1.0)).toDF("k", "fts", "v")
    val out = AsOfJoin.backward(probes, feats, Seq("k"), "pts", "fts", None)
    assert(out.count() === 0)
    assert(out.columns.toSeq === Seq("k", "pts", "pid", "matched_ts", "v"))
  }

  test("zero TTL matches only exact-timestamp rows") {
    val probes = Seq(
      ("a", ts("2024-01-01 00:00:00"), 1L),
      ("a", ts("2024-01-01 00:00:01"), 2L)).toDF("k", "pts", "pid")
    val feats = Seq(("a", ts("2024-01-01 00:00:00"), 7.0)).toDF("k", "fts", "v")
    val out = AsOfJoin.backward(probes, feats, Seq("k"), "pts", "fts", Some(0L))
      .select($"pid", $"v").as[(Long, Option[Double])].collect().sortBy(_._1).toSeq
    assert(out === Seq((1L, Some(7.0)), (2L, None)))
  }
}
