package graft.features

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Error-bound evidence for the opt-in approximate aggregates
  * ([[ApproxAggregates.eventTypeStats]]) on KNOWN deterministic
  * distributions — the at-scale contract the q56 gate (which plants a
  * cardinality where approx == exact) deliberately does not exercise.
  */
class ApproxAggregatesSpec extends SparkTestBase {

  /** `rows` events of one type; user_id cycles over `users` distinct
    * values; value = row index as double (all ranks distinct, so the
    * rank of any returned percentile value is exactly value + 1). */
  private def mkEvents(rows: Long, users: Int, etype: String): DataFrame =
    spark.range(rows).select(
      lit(etype).as("event_type"),
      (col("id") % users).as("user_id"),
      col("id").cast("double").as("value"))

  test("q56 doctrine: at planted small cardinality approx == exact (counts), percentiles within one order statistic") {
    val ev = mkEvents(5000, users = 40, "click")
    val exact = ApproxAggregates.eventTypeStats(ev, approx = false).collect().head
    val approx = ApproxAggregates.eventTypeStats(ev, approx = true).collect().head
    assert(approx.getAs[Long]("n_events") === exact.getAs[Long]("n_events"))
    assert(approx.getAs[Long]("distinct_users") === exact.getAs[Long]("distinct_users"))
    // exact `percentile` interpolates (2499.5 on 0..4999); approx returns
    // a real sample — adjacent order statistics bound the difference.
    assert(math.abs(approx.getAs[Double]("p50_value") - exact.getAs[Double]("p50_value")) <= 1.0)
    assert(math.abs(approx.getAs[Double]("p90_value") - exact.getAs[Double]("p90_value")) <= 1.0)
    // Schema is mode-invariant so pipelines can flip the switch.
    assert(ApproxAggregates.eventTypeStats(ev, approx = true).schema ===
      ApproxAggregates.eventTypeStats(ev, approx = false).schema)
  }

  test("HLL++ distinct-user estimate lands within 4*rsd at 10k true cardinality") {
    val rsd = 0.005
    val ev = mkEvents(200000, users = 10000, "view")
    val est = ApproxAggregates.eventTypeStats(ev, approx = true, rsd = rsd)
      .collect().head.getAs[Long]("distinct_users")
    val relErr = math.abs(est - 10000.0) / 10000.0
    // Spark's HLL++ is seedless and the input is deterministic, so this
    // is a fixed number, asserted inside the 4-sigma design envelope.
    assert(relErr <= 4 * rsd, s"estimate $est relErr $relErr")
  }

  test("GK percentile honors the 1/accuracy rank-error bound at accuracy=100") {
    val n = 50000L
    val ev = mkEvents(n, users = 1000, "buy")
    val row = ApproxAggregates
      .eventTypeStats(ev, approx = true, percentileAccuracy = 100)
      .collect().head
    // value == rank-1 by construction, so rank error is directly readable.
    def rankErr(v: Double, q: Double): Double = math.abs((v + 1) / n - q)
    assert(rankErr(row.getAs[Double]("p50_value"), 0.5) <= 0.01 + 1.0 / n)
    assert(rankErr(row.getAs[Double]("p90_value"), 0.9) <= 0.01 + 1.0 / n)
  }

  test("quantileThresholdFilter: exact p75 cut below compression, threshold attached") {
    val ev = mkEvents(1000, users = 10, "load") // values 0..999, distinct
    val kept = ApproxAggregates.quantileThresholdFilter(ev, "value", 0.75)
    val rows = kept.collect()
    // exact order statistic at n=1000 << accuracy: p75 = value 749
    assert(rows.forall(_.getAs[Double]("threshold") === 749.0))
    assert(rows.length === 251) // values 749..999 inclusive
    assert(rows.forall(_.getAs[Double]("value") >= 749.0))
    assert(intercept[IllegalArgumentException](
      ApproxAggregates.quantileThresholdFilter(ev, "value", 1.5))
      .getMessage.contains("quantile"))
  }

  test("GK retains every sample below the compression threshold: exact order statistic") {
    val n = 5000L
    val ev = mkEvents(n, users = 40, "cart")
    val row = ApproxAggregates
      .eventTypeStats(ev, approx = true, percentileAccuracy = 100000)
      .collect().head
    // n << accuracy => no compression => exact discrete quantiles of 0..4999.
    assert(row.getAs[Double]("p50_value") === 2499.0)
    assert(row.getAs[Double]("p90_value") === 4499.0)
  }
}
