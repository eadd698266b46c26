package graft.engine

import java.sql.Timestamp

import graft.SparkTestBase

class MaterializeViewSpec extends SparkTestBase {
  import spark.implicits._

  test("engine.materializeView: resumable backfill with per-view lineage") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-matview").toString
    val day0 = Timestamp.valueOf("2024-03-01 00:00:00").getTime
    (0 until 10).flatMap { d =>
      Seq(1L, 2L).map { c =>
        (new Timestamp(day0 + d * 86400000L), c, d.toDouble, d.toLong)
      }
    }.toDF("event_timestamp", "customer_id", "score", "cnt")
      .write.mode("overwrite").parquet(s"$tmp/src.parquet")

    val e = new FeatureEngine(spark)
    e.applyConfig(Map(
      "entities" -> Seq(Map("name" -> "customer", "join_key" -> "customer_id")),
      "data_sources" -> Map("src" -> Map(
        "type" -> "file", "path" -> s"$tmp/src.parquet",
        "timestamp_field" -> "event_timestamp"))))
    e.createFromYamlText(
      """feature_views:
        |  v1:
        |    source_name: src
        |    entities: [customer]
        |    ttl_days: 30
        |    schema:
        |      - name: score
        |        dtype: FLOAT
        |      - name: cnt
        |        dtype: INT64""".stripMargin)

    val r1 = e.materializeView("v1", s"$tmp/out")
    assert(r1.totalRows === 20L)
    assert(r1.buckets.size === 10)
    assert(r1.skipped === 0)

    // rerun resumes every bucket
    val r2 = e.materializeView("v1", s"$tmp/out")
    assert(r2.skipped === 10)
    assert(r2.totalRows === 20L)

    // per-view lineage recorded
    val lineage = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$tmp/out/_lineage.json")))
    assert(lineage.contains("\"feature_view\": \"v1\""))
    assert(lineage.contains("\"schema\": \"score:FLOAT,cnt:INT64\""))
  }
}
