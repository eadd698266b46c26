package graft.examples

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession

import graft.core.GraftSession
import graft.engine.FeatureEngine
import graft.spec.{ConfigValidator, MetadataRules, YamlLoader}

/** End-to-end mirror of the reference's retail feature-store example
  * (reference: examples/retail_feature_store/retail_analytics.py +
  * feature_repo/features.yaml): one YAML carries entities, data sources,
  * a governed feature view and a feature service; retrieval probes two
  * customers at 2024-01-15 with a 90-day TTL.
  *
  * Run: sbt "runMain graft.examples.RetailAnalyticsDemo"
  */
object RetailAnalyticsDemo {

  // custom rules from the reference example (domain globally required)
  private val retailRules = MetadataRules(
    requiredTags = Map(
      "global" -> Seq("owner", "version", "domain"),
      "feature_view" -> Seq("team", "data_quality"),
      "feature" -> Seq("description", "data_quality"),
      "feature_service" -> Seq("status", "SLA")),
    optionalTags = ConfigValidator.DefaultRules.optionalTags)

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt, "retail-demo")
    run(spark)
    spark.stop()
  }

  def featuresYaml(dataPath: String): String =
    s"""entities:
       |  - name: customer
       |    join_key: customer_id
       |
       |data_sources:
       |  retail_transactions:
       |    type: file
       |    path: $dataPath
       |    timestamp_field: event_timestamp
       |
       |feature_views:
       |  customer_features:
       |    source_name: retail_transactions
       |    entities: [customer]
       |    ttl_days: 90
       |    schema:
       |      - name: total_purchases
       |        dtype: FLOAT
       |        tags:
       |          owner: retail_analytics
       |          version: '1.0'
       |          description: Total purchase amount
       |          data_quality: verified
       |          domain: retail
       |      - name: purchase_frequency
       |        dtype: FLOAT
       |        tags:
       |          owner: retail_analytics
       |          version: '1.0'
       |          description: Purchase frequency
       |          data_quality: verified
       |          domain: retail
       |      - name: customer_segment
       |        dtype: INT64
       |        tags:
       |          owner: retail_analytics
       |          version: '1.0'
       |          description: Customer segment code
       |          data_quality: verified
       |          domain: retail
       |    tags:
       |      owner: retail_analytics
       |      version: '1.0'
       |      team: customer_insights
       |      domain: retail
       |      data_quality: verified
       |
       |feature_services:
       |  customer_insights:
       |    features: [customer_features]
       |    description: Customer behavior analysis service
       |    tags:
       |      owner: retail_analytics
       |      version: '1.0'
       |      status: production
       |      SLA: T+1
       |      domain: retail""".stripMargin

  def run(spark: SparkSession): FeatureEngine = {
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("retail_demo").toString
    // deterministic stand-in for the reference's np.random daily rows
    // (reference: retail_analytics.py:30-44)
    val day0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rng = new scala.util.Random(1001L)
    (for {
      c <- Seq(1001L, 1002L)
      d <- 0 until 100
    } yield (
      new Timestamp(day0 + d * 86400000L), c,
      (50 + rng.nextInt(150)).toDouble,
      (1 + rng.nextInt(4)).toDouble,
      (1 + rng.nextInt(3)).toLong
    )).toDF("event_timestamp", "customer_id", "total_purchases",
        "purchase_frequency", "customer_segment")
      .write.mode("overwrite").parquet(s"$dir/retail_data.parquet")

    val yaml = featuresYaml(s"$dir/retail_data.parquet")
    val engine = new FeatureEngine(spark, metadataRules = retailRules)
    engine.applyConfig(YamlLoader.loadMap(yaml))
    engine.createFromYamlText(yaml)

    val probes = Seq(1001L, 1002L)
      .map(c => (c, Timestamp.valueOf("2024-01-15 00:00:00")))
      .toDF("customer_id", "event_timestamp")

    println("=== retail point-in-time retrieval @ 2024-01-15 ===")
    engine.retrieve(probes, "customer_insights").orderBy("customer_id").show()
    engine
  }
}
