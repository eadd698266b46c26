package graft.examples

import graft.SparkTestBase

/** The reference's two example workflows, run end-to-end in CI. */
class DemosSpec extends SparkTestBase {

  test("customer analytics demo runs end-to-end") {
    CustomerAnalyticsDemo.run(spark)
  }

  test("retail demo: governed YAML registers and retrieves point-in-time rows") {
    val engine = RetailAnalyticsDemo.run(spark)
    assert(engine.registry.getView("customer_features").isDefined)
    assert(engine.registry.getService("customer_insights").isDefined)
    import spark.implicits._
    val probes = Seq(1001L, 1002L)
      .map(c => (c, java.sql.Timestamp.valueOf("2024-01-15 00:00:00")))
      .toDF("customer_id", "event_timestamp")
    val out = engine.retrieve(probes, "customer_insights")
    assert(out.count() === 2)
    assert(out.filter($"total_purchases".isNull).count() === 0)
  }
}
