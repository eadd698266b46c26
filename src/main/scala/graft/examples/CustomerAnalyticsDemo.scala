package graft.examples

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession

import graft.core.GraftSession
import graft.engine.FeatureEngine

/** End-to-end engine demo mirroring the reference's customer-analytics
  * example (reference: examples/customer_analytics_demo/customer_metrics
  * .py): generate daily customer rows, register entity + file source,
  * create a feature view + service from YAML, retrieve point-in-time
  * features for probes at 2024-01-15, print the result.
  *
  * Run: sbt "runMain graft.examples.CustomerAnalyticsDemo"
  */
object CustomerAnalyticsDemo {

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt, "customer-analytics-demo")
    run(spark)
    spark.stop()
  }

  def run(spark: SparkSession): Unit = {
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("customer_demo").toString
    // 100 daily rows for customers 1..3 from 2024-01-01 (reference
    // customer_metrics.py:22-32)
    val day0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    (0 until 100).flatMap { d =>
      Seq(1L, 2L, 3L).map { c =>
        (new Timestamp(day0 + d * 86400000L), c, (c * 100 + d).toFloat, (d + 1).toLong)
      }
    }.toDF("event_timestamp", "customer_id", "total_purchases", "purchase_count")
      .write.mode("overwrite").parquet(s"$dir/customer_data.parquet")

    val engine = new FeatureEngine(spark)
    engine.applyConfig(Map(
      "entities" -> Seq(Map(
        "name" -> "customer", "join_key" -> "customer_id",
        "description" -> "Customer entity")),
      "data_sources" -> Map("customer_source" -> Map(
        "type" -> "file",
        "path" -> s"$dir/customer_data.parquet",
        "timestamp_field" -> "event_timestamp"))))

    engine.createFromYamlText(
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

    val probes = Seq(1L, 2L, 3L)
      .map(c => (c, Timestamp.valueOf("2024-01-15 00:00:00")))
      .toDF("customer_id", "event_timestamp")

    println("=== point-in-time retrieval @ 2024-01-15 ===")
    engine.retrieve(probes, "customer_insights").orderBy("customer_id").show()

    println("=== latest per customer (online-store materialization) ===")
    engine.materializeLatest("customer_metrics").orderBy("customer_id").show()

    val reg = s"$dir/registry.json"
    engine.registry.save(reg)
    println(s"registry persisted: $reg")
  }
}
