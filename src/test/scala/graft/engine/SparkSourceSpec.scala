package graft.engine

import java.sql.Timestamp

import graft.SparkTestBase

/** S2: spark catalog-table and SQL-query sources (SURVEY §2.1; the
  * Iceberg swap-in point — format/catalog config, not code). */
class SparkSourceSpec extends SparkTestBase {
  import spark.implicits._

  test("feature view over a spark `table` source and a spark `query` source") {
    Seq(
      (Timestamp.valueOf("2024-01-01 00:00:00"), 1L, 10.0),
      (Timestamp.valueOf("2024-01-02 00:00:00"), 1L, 20.0),
      (Timestamp.valueOf("2024-01-01 12:00:00"), 2L, 5.0)
    ).toDF("event_timestamp", "customer_id", "score")
      .createOrReplaceTempView("raw_scores")

    val e = new FeatureEngine(spark)
    e.applyConfig(Map(
      "entities" -> Seq(Map("name" -> "customer", "join_key" -> "customer_id")),
      "data_sources" -> Map(
        "tbl_src" -> Map(
          "type" -> "spark", "table" -> "raw_scores",
          "timestamp_field" -> "event_timestamp"),
        "qry_src" -> Map(
          "type" -> "spark",
          "query" -> ("SELECT customer_id, event_timestamp, " +
            "score * 2 AS score2 FROM raw_scores"),
          "timestamp_field" -> "event_timestamp"))))
    e.createFromYamlText(
      """feature_views:
        |  from_table:
        |    source_name: tbl_src
        |    entities: [customer]
        |    ttl_days: 30
        |    schema:
        |      - name: score
        |        dtype: FLOAT
        |  from_query:
        |    source_name: qry_src
        |    entities: [customer]
        |    ttl_days: 30
        |    schema:
        |      - name: score2
        |        dtype: FLOAT""".stripMargin)

    val probe = Seq((1L, Timestamp.valueOf("2024-01-03 00:00:00")))
      .toDF("customer_id", "event_timestamp")
    val a = e.retrieveView(probe, "from_table")
      .select($"score").as[Double].collect().toSeq
    assert(a === Seq(20.0))
    val b = e.retrieveView(probe, "from_query")
      .select($"score2").as[Double].collect().toSeq
    assert(b === Seq(40.0))
  }

  test("schema reconciliation rejects dtype drift between spec and analyzed plan") {
    spark.sql("SELECT CAST(1 AS BIGINT) AS customer_id, " +
      "TIMESTAMP '2024-01-01 00:00:00' AS event_timestamp, 'oops' AS score")
      .createOrReplaceTempView("bad_scores")
    val e = new FeatureEngine(spark)
    e.applyConfig(Map(
      "entities" -> Seq(Map("name" -> "customer", "join_key" -> "customer_id")),
      "data_sources" -> Map("bad" -> Map(
        "type" -> "spark", "table" -> "bad_scores",
        "timestamp_field" -> "event_timestamp"))))
    e.createFromYamlText(
      """feature_views:
        |  bad_view:
        |    source_name: bad
        |    entities: [customer]
        |    schema:
        |      - name: score
        |        dtype: FLOAT""".stripMargin)
    val ex = intercept[IllegalArgumentException](
      e.retrieveView(
        Seq((1L, Timestamp.valueOf("2024-01-02 00:00:00")))
          .toDF("customer_id", "event_timestamp"),
        "bad_view"))
    assert(ex.getMessage.contains("Schema reconciliation failed"))
    assert(ex.getMessage.contains(
      "Feature 'score' dtype mismatch: declared FLOAT, source yields STRING"))
  }
}
