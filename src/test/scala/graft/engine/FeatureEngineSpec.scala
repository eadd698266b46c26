package graft.engine

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.registry.FeatureRegistry
import graft.spec._

/** Engine lifecycle replay (reference: tests/test_sous_chef.py,
  * tests/test_feature_services.py) + end-to-end point-in-time retrieval
  * against real parquet.
  */
class FeatureEngineSpec extends SparkTestBase {
  import spark.implicits._

  private def fixture(p: String): String =
    getClass.getResource(p).getPath

  private def newEngine(): FeatureEngine = new FeatureEngine(spark)

  private val driverStatsYaml =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      fixture("/fixtures/features/driver_stats.yaml"))))

  private def engineWithDriverSource(): FeatureEngine = {
    val e = newEngine()
    e.applyConfig(Map(
      "entities" -> Seq(Map("name" -> "driver_id", "join_key" -> "driver_id",
        "description" -> "test driver")),
      "data_sources" -> Map("driver_source" -> Map(
        "type" -> "file", "path" -> "data/test.parquet",
        "timestamp_field" -> "event_timestamp"))))
    e
  }

  test("EP1: entities and sources registered; source params filtered per type") {
    val e = engineWithDriverSource()
    assert(e.registry.getEntity("driver_id").exists(_.joinKey === "driver_id"))
    assert(e.registry.getSource("driver_source").exists(_.sourceType === "file"))

    // invalid_param must be dropped (reference: tests/test_sous_chef.py:111-117
    // with fixtures/config/source_configs.yaml)
    val e2 = newEngine()
    e2.applyConfig(Map("data_sources" -> Map("file_source" -> Map(
      "type" -> "file", "path" -> "test.parquet",
      "timestamp_field" -> "event_ts", "invalid_param" -> "value"))))
    val src = e2.registry.getSource("file_source").get
    assert(!src.params.contains("invalid_param"))
    assert(src.params.keySet === Set("path", "timestamp_field"))
  }

  test("EP1: unsupported source type raises reference error") {
    val ex = intercept[IllegalArgumentException] {
      newEngine().applyConfig(Map("data_sources" ->
        Map("x" -> Map("type" -> "nope", "path" -> "p"))))
    }
    assert(ex.getMessage.startsWith("Source type 'nope' is not supported"))
  }

  test("EP2: driver_stats fixture creates the view with ttl and schema") {
    val e = engineWithDriverSource()
    val created = e.createFromYamlText(driverStatsYaml)
    val view = created("driver_stats").asInstanceOf[FeatureViewSpec]
    assert(view.entities === Seq("driver_id"))
    assert(view.ttlDays === 1)
    assert(view.schema === Seq(
      FieldSpec("trips_today", "INT64"), FieldSpec("rating", "FLOAT")))
    assert(e.registry.getView("driver_stats").isDefined)
  }

  test("EP2: dry run validates but does not apply") {
    val e = engineWithDriverSource()
    val created = e.createFromYamlText(driverStatsYaml, dryRun = true)
    assert(created.contains("driver_stats"))
    assert(e.registry.getView("driver_stats").isEmpty)
  }

  test("EP2: missing feature_views section / unknown source / unknown dtype") {
    val e = engineWithDriverSource()
    val noViews = intercept[IllegalArgumentException](
      e.createFromYamlText("entities: []"))
    assert(noViews.getMessage === "No feature_views section found in YAML")

    val badSource = intercept[IllegalArgumentException](e.createFromYamlText(
      """feature_views:
        |  v1:
        |    source_name: nope_source
        |    entities: [driver_id]
        |    schema:
        |      - name: f
        |        dtype: FLOAT""".stripMargin))
    assert(badSource.getMessage === "Data source 'nope_source' not found")

    intercept[NoSuchElementException](e.createFromYamlText(
      """feature_views:
        |  v1:
        |    source_name: driver_source
        |    entities: [driver_id]
        |    schema:
        |      - name: f
        |        dtype: BOGUS""".stripMargin))
  }

  test("EP2: dangling service view fails validation with reference message") {
    val e = engineWithDriverSource()
    val ex = intercept[IllegalArgumentException](e.createFromYamlText(
      driverStatsYaml +
        "\nfeature_services:\n  svc:\n    features: [nonexistent_view]\n"))
    assert(ex.getMessage.startsWith("Configuration validation failed:"))
    assert(ex.getMessage.contains(
      "Feature service 'svc' references non-existent feature view: nonexistent_view"))
    // the same failure carries the structured CI contract
    val ge = ex.asInstanceOf[GraftError]
    assert(ge.errors.exists(e =>
      e.code == ValidationCodes.UnknownReference &&
        e.path == "feature_services.svc.features" &&
        e.context.get("view").contains("nonexistent_view")))
    assert(ge.toJson.contains(""""code": "UNKNOWN_REFERENCE""""))
  }

  test("EP2: complex unicode fixture preserved byte-for-byte in tags") {
    val e = newEngine()
    e.applyConfig(Map(
      "entities" -> Seq(Map("name" -> "customer_id", "join_key" -> "customer_id")),
      "data_sources" -> Map("customer_source" -> Map(
        "type" -> "file", "path" -> "data/c.parquet", "timestamp_field" -> "ts"))))
    val created = e.createFromYamlText(
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        fixture("/fixtures/features/complex_features.yaml"))),
        java.nio.charset.StandardCharsets.UTF_8))
    val view = created("customer_360").asInstanceOf[FeatureViewSpec]
    val desc = view.tags("description")
    assert(desc.contains("🚀 Enhanced Customer Analytics Suite v2.0 🎯"))
    assert(desc.contains("© 2024 DataCo™ — All Rights Reserved®"))
    assert(desc.contains("Patent Pending № 123456789"))
    val featDesc = view.schema.head.tags("description")
    assert(featDesc.contains("∑(transactions) × π × e^(loyalty_factor)"))
    val svc = created("premium_insights").asInstanceOf[FeatureServiceSpec]
    assert(svc.features === Seq("customer_360"))
    assert(svc.tags("SLA") === "99.9%")
  }

  test("EP3: end-to-end point-in-time retrieval matches reference example semantics") {
    // reference: examples/customer_analytics_demo/customer_metrics.py —
    // daily rows per customer, probe at 2024-01-15, ttl 90 days
    val tmp = java.nio.file.Files.createTempDirectory("graft-engine").toString
    val data = (0 until 100).flatMap { d =>
      Seq(1L, 2L, 3L).map { c =>
        (new Timestamp(Timestamp.valueOf("2024-01-01 00:00:00").getTime + d * 86400000L),
          c, (c * 100 + d).toDouble, (d + 1).toLong)
      }
    }.toDF("event_timestamp", "customer_id", "total_purchases", "purchase_count")
    data.write.mode("overwrite").parquet(s"$tmp/customer_data.parquet")

    val e = newEngine()
    e.applyConfig(Map(
      "entities" -> Seq(Map("name" -> "customer", "join_key" -> "customer_id")),
      "data_sources" -> Map("customer_source" -> Map(
        "type" -> "file", "path" -> s"$tmp/customer_data.parquet",
        "timestamp_field" -> "event_timestamp"))))
    e.createFromYamlText(
      """feature_views:
        |  customer_metrics:
        |    source_name: customer_source
        |    entities: [customer]
        |    ttl_days: 90
        |    schema:
        |      - name: total_purchases
        |        dtype: FLOAT
        |      - name: purchase_count
        |        dtype: INT64
        |feature_services:
        |  customer_insights:
        |    features: [customer_metrics]""".stripMargin)

    val probe = Seq(1L, 2L, 3L)
      .map(c => (c, Timestamp.valueOf("2024-01-15 00:00:00")))
      .toDF("customer_id", "event_timestamp")
    val out = e.retrieve(probe, "customer_insights")
      .select($"customer_id", $"total_purchases", $"purchase_count")
      .as[(Long, Double, Long)].collect().sortBy(_._1).toSeq
    // latest row <= 01-15 is day index 14 → purchases = c*100+14, count = 15
    assert(out === Seq((1L, 114.0, 15L), (2L, 214.0, 15L), (3L, 314.0, 15L)))

    // probe before data → nulls (left outer)
    val early = Seq((1L, Timestamp.valueOf("2023-12-01 00:00:00")))
      .toDF("customer_id", "event_timestamp")
    val earlyOut = e.retrieveView(early, "customer_metrics")
      .select($"total_purchases").as[Option[Double]].collect()
    assert(earlyOut.toSeq === Seq(None))

    // fullFeatureNames prefixes view name
    val named = e.retrieve(probe, "customer_insights", fullFeatureNames = true)
    assert(named.columns.contains("customer_metrics__total_purchases"))

    // materializeLatest: one row per key, the newest
    val latest = e.materializeLatest("customer_metrics")
      .select($"customer_id", $"purchase_count")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(latest === Seq((1L, 100L), (2L, 100L), (3L, 100L)))
  }

  test("field_mapping renames source columns before compilation") {
    // reference: sous_chef.py:41-42 — field_mapping on file sources;
    // Feast renames source columns, so the view schema sees mapped names
    val tmp = java.nio.file.Files.createTempDirectory("graft-fm").toString
    Seq(
      (1L, Timestamp.valueOf("2024-02-01 00:00:00"), 10.0),
      (1L, Timestamp.valueOf("2024-02-02 00:00:00"), 20.0))
      .toDF("cust", "raw_ts", "raw_score")
      .write.mode("overwrite").parquet(s"$tmp/src.parquet")

    val e = newEngine()
    e.applyConfig(Map(
      "entities" -> Seq(Map("name" -> "customer", "join_key" -> "customer_id")),
      "data_sources" -> Map("mapped_source" -> Map(
        "type" -> "file", "path" -> s"$tmp/src.parquet",
        "timestamp_field" -> "event_timestamp",
        "field_mapping" -> Map(
          "cust" -> "customer_id",
          "raw_ts" -> "event_timestamp",
          "raw_score" -> "score")))))
    assert(e.registry.getSource("mapped_source").get.fieldMapping ===
      Map("cust" -> "customer_id", "raw_ts" -> "event_timestamp", "raw_score" -> "score"))

    e.createFromYamlText(
      """feature_views:
        |  mapped_view:
        |    source_name: mapped_source
        |    entities: [customer]
        |    ttl_days: 30
        |    schema:
        |      - name: score
        |        dtype: FLOAT""".stripMargin)

    val probe = Seq((1L, Timestamp.valueOf("2024-02-03 00:00:00")))
      .toDF("customer_id", "event_timestamp")
    val out = e.retrieveView(probe, "mapped_view")
      .select($"score").as[Double].collect().toSeq
    assert(out === Seq(20.0))

    // mapping a missing column fails loudly, not silently
    val e2 = newEngine()
    e2.applyConfig(Map(
      "entities" -> Seq(Map("name" -> "customer", "join_key" -> "customer_id")),
      "data_sources" -> Map("bad_source" -> Map(
        "type" -> "file", "path" -> s"$tmp/src.parquet",
        "timestamp_field" -> "event_timestamp",
        "field_mapping" -> Map("nope" -> "customer_id")))))
    val ex = intercept[IllegalArgumentException](
      e2.sourceDF(e2.registry.getSource("bad_source").get))
    assert(ex.getMessage.contains("maps missing column 'nope'"))
  }

  test("created_timestamp_column breaks equal event-timestamp ties (greatest wins)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cts").toString
    val ts = Timestamp.valueOf("2024-02-01 00:00:00")
    // two rows with the SAME event ts; the later-created row must win
    Seq(
      (1L, ts, Timestamp.valueOf("2024-02-01 05:00:00"), 111.0),
      (1L, ts, Timestamp.valueOf("2024-02-01 09:00:00"), 222.0))
      .toDF("customer_id", "event_timestamp", "created_at", "score")
      .write.mode("overwrite").parquet(s"$tmp/src.parquet")

    val e = newEngine()
    e.applyConfig(Map(
      "entities" -> Seq(Map("name" -> "customer", "join_key" -> "customer_id")),
      "data_sources" -> Map("cts_source" -> Map(
        "type" -> "file", "path" -> s"$tmp/src.parquet",
        "timestamp_field" -> "event_timestamp",
        "created_timestamp_column" -> "created_at"))))
    e.createFromYamlText(
      """feature_views:
        |  cts_view:
        |    source_name: cts_source
        |    entities: [customer]
        |    ttl_days: 30
        |    schema:
        |      - name: score
        |        dtype: FLOAT""".stripMargin)

    val probe = Seq((1L, Timestamp.valueOf("2024-02-02 00:00:00")))
      .toDF("customer_id", "event_timestamp")
    val got = e.retrieveView(probe, "cts_view")
    assert(!got.columns.contains("_created_ts"))
    assert(got.select($"score").as[Double].collect().toSeq === Seq(222.0))

    // materializeLatest uses the same tie-break
    val latest = e.materializeLatest("cts_view")
      .select($"score").as[Double].collect().toSeq
    assert(latest === Seq(222.0))
  }

  test("registry save/load roundtrip") {
    val e = engineWithDriverSource()
    e.createFromYamlText(driverStatsYaml)
    val path = java.nio.file.Files.createTempDirectory("graft-reg").toString + "/registry.json"
    e.registry.save(path)
    val r2 = new FeatureRegistry
    r2.load(path)
    assert(r2.getView("driver_stats") === e.registry.getView("driver_stats"))
    assert(r2.getEntity("driver_id") === e.registry.getEntity("driver_id"))
    assert(r2.getSource("driver_source") === e.registry.getSource("driver_source"))
  }

  test("registry loads pre-fieldMapping JSON (backward compatibility)") {
    // a round-1 registry.json has no fieldMapping key; the default must
    // apply on load rather than failing extraction
    val old =
      """{
        | "entities":[{"name":"e","joinKey":"k","description":""}],
        | "sources":[{"name":"s","sourceType":"file",
        |             "params":{"path":"p","timestamp_field":"ts"}}],
        | "views":[], "services":[]
        |}""".stripMargin
    val p = java.nio.file.Files.createTempFile("graft-reg-old", ".json")
    java.nio.file.Files.write(p, old.getBytes("UTF-8"))
    val r = new FeatureRegistry
    r.load(p.toString)
    val src = r.getSource("s").get
    assert(src.fieldMapping === Map.empty)
    assert(src.path === Some("p"))
  }
}
