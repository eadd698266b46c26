package graft.engine

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Multi-view feature-service retrieval (the reference's actual product
  * shape: a service bundling several views, reference
  * customer_metrics.py:127-130 / tests/test_feature_services.py:135-159):
  * semantic equality with the per-view fold, per-view TTL and created-ts
  * tie-break behavior, and the one-exchange plan gate of
  * [[graft.asof.AsOfJoin.backwardMulti]].
  */
class MultiViewRetrieveSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // two file sources: clicks (with a created-ts tie-break column and
  // duplicate equal-ts rows) and scores (no created column, shorter TTL)
  private val dataDir = {
    val d = java.nio.file.Files.createTempDirectory("graft_mv").toString
    Seq(
      ("u1", ts("2024-01-01 10:00:00"), 1.0, ts("2024-01-01 10:00:01")),
      ("u1", ts("2024-01-01 10:00:00"), 2.0, ts("2024-01-01 10:00:05")), // created wins
      ("u1", ts("2024-01-03 09:00:00"), 3.0, ts("2024-01-03 09:00:00")),
      ("u2", ts("2024-01-01 08:00:00"), 9.0, ts("2024-01-01 08:00:00"))
    ).toDF("user_id", "ts", "clicks", "created")
      .write.mode("overwrite").parquet(s"$d/clicks.parquet")
    Seq(
      ("u1", ts("2024-01-02 12:00:00"), 0.5),
      ("u2", ts("2024-01-01 07:00:00"), 0.9),
      ("u3", ts("2024-01-04 06:00:00"), 0.1)
    ).toDF("user_id", "ts", "score")
      .write.mode("overwrite").parquet(s"$d/scores.parquet")
    d
  }

  private def engineWithService(): FeatureEngine = {
    val e = new FeatureEngine(spark)
    e.applyConfig(Map(
      "entities" -> Seq(Map("name" -> "user", "join_key" -> "user_id",
        "description" -> "test user")),
      "data_sources" -> Map(
        "clicks_src" -> Map(
          "type" -> "file", "path" -> s"$dataDir/clicks.parquet",
          "timestamp_field" -> "ts", "created_timestamp_column" -> "created"),
        "scores_src" -> Map(
          "type" -> "file", "path" -> s"$dataDir/scores.parquet",
          "timestamp_field" -> "ts"))))
    e.createFromYamlText(
      """feature_views:
        |  clicks_view:
        |    source_name: clicks_src
        |    entities: [user]
        |    ttl_days: 7
        |    schema:
        |      - name: clicks
        |        dtype: FLOAT
        |  scores_view:
        |    source_name: scores_src
        |    entities: [user]
        |    ttl_days: 1
        |    schema:
        |      - name: score
        |        dtype: FLOAT
        |feature_services:
        |  both_svc:
        |    features: [clicks_view, scores_view]""".stripMargin)
    e
  }

  private def probes: DataFrame = Seq(
    ("u1", ts("2024-01-01 10:00:00")), // equal-ts: created tie-break on clicks
    ("u1", ts("2024-01-04 00:00:00")), // scores row from Jan 2 is out of 1-day TTL
    ("u2", ts("2024-01-01 12:00:00")),
    ("u3", ts("2024-01-04 18:00:00")), // in score TTL; no clicks row at all
    ("u4", ts("2024-01-05 00:00:00"))  // unknown entity: all-null features
  ).toDF("user_id", "event_timestamp")

  private def collected(df: DataFrame) =
    df.select($"user_id", $"event_timestamp", $"clicks", $"score")
      .as[(String, Timestamp, Option[Double], Option[Double])]
      .collect().sortBy(r => (r._1, r._2.getTime)).toSeq

  test("multi-view retrieve: per-view TTL, tie-break, and null semantics") {
    val got = collected(engineWithService().retrieve(probes, "both_svc"))
    assert(got === Seq(
      ("u1", ts("2024-01-01 10:00:00"), Some(2.0), None), // created 10:00:05 wins; no score yet
      ("u1", ts("2024-01-04 00:00:00"), Some(3.0), None), // score out of 1-day TTL
      ("u2", ts("2024-01-01 12:00:00"), Some(9.0), Some(0.9)),
      ("u3", ts("2024-01-04 18:00:00"), None, Some(0.1)), // score in TTL, no clicks
      ("u4", ts("2024-01-05 00:00:00"), None, None)))
  }

  test("multi-view path equals the per-view fold") {
    val e = engineWithService()
    val multi = collected(e.retrieve(probes, "both_svc"))
    val fold = collected(
      e.retrieveView(e.retrieveView(probes, "clicks_view"), "scores_view"))
    assert(multi === fold)
  }

  test("fullFeatureNames prefixes per view in the multi path") {
    val df = engineWithService().retrieve(probes, "both_svc", fullFeatureNames = true)
    assert(df.columns.contains("clicks_view__clicks"))
    assert(df.columns.contains("scores_view__score"))
  }

  test("V=2 service retrieval is exactly ONE hash exchange and ONE window pass") {
    // pre-execution plan (the AQE-executed string prints the initial
    // plan too, double-counting every exchange)
    val p = engineWithService().retrieve(probes, "both_svc")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges === 1,
      s"multi-view retrieval must shuffle exactly once, got $exchanges:\n$p")
    // both views' carries must collapse into one Window operator — a
    // window (and sort) per view would re-sort the union V times
    val windows = "\\bWindow \\[".r.findAllIn(p).length
    assert(windows === 1, s"expected ONE Window operator, got $windows:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("views with DIFFERENT entity keys fall back to the per-view fold") {
    val e = engineWithService()
    e.registry.applyEntity(graft.spec.EntitySpec("other", "other_id", ""))
    Seq(("x", ts("2024-01-01 00:00:00"), 1.0)).toDF("other_id", "ts", "extra")
      .write.mode("overwrite").parquet(s"$dataDir/extra.parquet")
    e.applyConfig(Map("data_sources" -> Map("extra_src" -> Map(
      "type" -> "file", "path" -> s"$dataDir/extra.parquet",
      "timestamp_field" -> "ts"))))
    // service validation is per-YAML, so re-declare both member views here
    e.createFromYamlText(
      """feature_views:
        |  clicks_view:
        |    source_name: clicks_src
        |    entities: [user]
        |    ttl_days: 7
        |    schema:
        |      - name: clicks
        |        dtype: FLOAT
        |  extra_view:
        |    source_name: extra_src
        |    entities: [other]
        |    ttl_days: 7
        |    schema:
        |      - name: extra
        |        dtype: FLOAT
        |feature_services:
        |  mixed_svc:
        |    features: [clicks_view, extra_view]""".stripMargin)
    val mixedProbes = probes.withColumn("other_id", lit("x"))
    val out = e.retrieve(mixedProbes, "mixed_svc")
    assert(out.columns.contains("clicks") && out.columns.contains("extra"))
    assert(out.count() === probes.count())
  }
}
