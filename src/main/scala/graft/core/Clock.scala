package graft.core

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Wall-clock access for features (SURVEY §2.6 F14 CURRENT_DATE):
  * `current_date()`-shaped features are nondeterministic by nature, so
  * the engine routes them through a session-pinnable clock — set
  * `graft.clock.current_date` (e.g. "2024-03-15") on the session to make
  * backfills and tests reproducible; unset, it falls through to Spark's
  * `current_date()` (itself fixed per query execution).
  */
object Clock {

  val PinConf = "graft.clock.current_date"

  /** Today's date: the pinned date when configured, else current_date().
    *
    * NOTE: the conf is read at COLUMN-CONSTRUCTION time — the pin is
    * baked into the plan when the feature DataFrame is BUILT, so setting
    * or unsetting `graft.clock.current_date` afterwards does not affect
    * already-built plans. In a long-lived session, pin first, then build
    * (rebuild the DataFrame to pick up a changed pin). */
  def currentDate(spark: SparkSession): Column =
    spark.conf.getOption(PinConf)
      .map(d => to_date(lit(d)))
      .getOrElse(current_date())

  /** Days elapsed from `ts` to the (pinnable) current date — the
    * standard freshness/recency feature shape. */
  def daysSince(spark: SparkSession, ts: Column): Column =
    datediff(currentDate(spark), to_date(ts))

  /** True when `ts` falls within the trailing `days`-day window ending
    * at the (pinnable) current date. */
  def withinLastDays(spark: SparkSession, ts: Column, days: Int): Column =
    to_date(ts) >= date_sub(currentDate(spark), days) &&
      to_date(ts) <= currentDate(spark)
}
