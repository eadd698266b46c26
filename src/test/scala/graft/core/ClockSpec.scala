package graft.core

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ClockSpec extends SparkTestBase {
  import spark.implicits._

  test("pinned clock makes current_date features deterministic (F14)") {
    spark.conf.set(Clock.PinConf, "2024-03-15")
    try {
      val got = Seq("2024-03-10", "2024-03-15", "2024-02-14").toDF("d")
        .select(to_date($"d").as("d"))
        .select(
          Clock.daysSince(spark, $"d").as("age"),
          Clock.withinLastDays(spark, $"d", 7).as("recent"))
        .as[(Int, Boolean)].collect().toSeq
      assert(got === Seq((5, true), (0, true), (30, false)))

      assert(Seq(1).toDF("x")
        .select(Clock.currentDate(spark).cast("string")).as[String].head()
        === "2024-03-15")
    } finally spark.conf.unset(Clock.PinConf)
  }

  test("unpinned clock falls through to current_date()") {
    spark.conf.unset(Clock.PinConf)
    val before = java.time.LocalDate.now(java.time.ZoneOffset.UTC).toString
    val got = Seq(1).toDF("x")
      .select(Clock.currentDate(spark).cast("string")).as[String].head()
    val after = java.time.LocalDate.now(java.time.ZoneOffset.UTC).toString
    assert(got === before || got === after)
  }
}
