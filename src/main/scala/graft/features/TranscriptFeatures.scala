package graft.features

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** A single transcript turn — the engine's canonical input row
  * (BASELINE.json input_hint).
  */
case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: java.sql.Timestamp)

/** Windowed feature-engineering operators over transcript tables:
  * lag/lead, gap-based sessionization, rolling counts, tool-usage rates,
  * per-role token stats (SURVEY.md §2.3 A10, §2.4 W3/W5/W8).
  *
  * All are single-shuffle plans: one hash partition by the entity key,
  * then window scans — no RDDs, no driver-side loops. At cluster scale the
  * entity key (`conv_id`) hash-distributes; a hot conversation stays in
  * one task by necessity (order-dependent windows can't be split) but its
  * cost is linear in its own length.
  */
object TranscriptFeatures {

  /** Whitespace token count (= number of non-empty `\s+`-separated
    * pieces; blank/empty → 0). Implemented as the native codegen'd
    * single-pass expression [[graft.functions.WhitespaceTokenCount]] —
    * no regex, no array materialization on the hot path. */
  def tokenCount(text: Column): Column =
    graft.functions.WhitespaceTokenCount(text)

  /** Tool-usage flag: a non-empty `tool` column. */
  def toolUsed(tool: Column): Column =
    (tool.isNotNull && tool =!= "").cast("int")

  private def orderedWindow(key: Seq[String], order: Seq[Column]): WindowSpec =
    Window.partitionBy(key.map(col): _*).orderBy(order: _*)

  /** lag/lead of `cols` by `n` over (key, order) — W3. */
  def withLagLead(
      df: DataFrame,
      key: Seq[String],
      order: Seq[Column],
      cols: Seq[String],
      n: Int = 1): DataFrame = {
    val w = orderedWindow(key, order)
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(s"${c}_lag$n", lag(col(c), n).over(w))
        .withColumn(s"${c}_lead$n", lead(col(c), n).over(w))
    }
  }

  /** Gap-based sessionization — W8: a new session starts when the gap to
    * the previous row (per key, in `order`) exceeds `gapSeconds`. Adds an
    * integer `session_id` (0-based per key).
    */
  def sessionize(
      df: DataFrame,
      key: Seq[String],
      tsCol: String,
      gapSeconds: Long,
      order: Seq[Column],
      out: String = "session_id"): DataFrame = {
    val w = orderedWindow(key, order)
    val prevTs = lag(col(tsCol), 1).over(w)
    // exact integer µs arithmetic — no float-boundary ambiguity at the gap;
    // cast handles TIMESTAMP_NTZ inputs (session TZ is pinned to UTC)
    val isNew = when(
      prevTs.isNull ||
        unix_micros(col(tsCol).cast("timestamp")) -
          unix_micros(prevTs.cast("timestamp")) > gapSeconds * 1000000L,
      1).otherwise(0)
    df.withColumn("_new_session", isNew)
      .withColumn(
        out,
        sum(col("_new_session"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long") - 1)
      .drop("_new_session")
  }

  /** Rolling turn count over the trailing `windowSeconds` of event time —
    * A10 "rolling turn counts". RANGE frame on the epoch so variable gaps
    * are honored.
    */
  def rollingTurnCount(
      df: DataFrame,
      key: Seq[String],
      tsCol: String,
      windowSeconds: Long,
      out: String = "rolling_turns"): DataFrame = {
    val w = Window
      .partitionBy(key.map(col): _*)
      .orderBy(unix_micros(col(tsCol).cast("timestamp")))
      .rangeBetween(-windowSeconds * 1000000L, 0L)
    df.withColumn(out, count(lit(1)).over(w))
  }

  /** Per-conversation aggregate feature vector — A10: turn counts,
    * tool-usage rate, per-role token statistics. `tsCol` doubles as the
    * feature event-time (max turn ts) so the result is as-of joinable.
    */
  def convAggregates(
      df: DataFrame,
      key: String = "conv_id",
      tsCol: String = "ts",
      textCol: String = "text",
      roleCol: String = "role",
      toolCol: String = "tool",
      roles: Seq[String] = Seq("user", "assistant", "system", "tool")): DataFrame = {
    val toks = tokenCount(col(textCol))
    // role_-prefixed so role "tool" can't collide with the tool_turns
    // usage counter below
    val perRole = roles.flatMap { r =>
      Seq(
        sum(when(col(roleCol) === r, toks).otherwise(lit(0)))
          .cast("long").as(s"role_${r}_tokens"),
        sum(when(col(roleCol) === r, 1).otherwise(0))
          .cast("long").as(s"role_${r}_turns"))
    }
    val aggs = Seq(
      max(col(tsCol)).as("last_ts"),
      min(col(tsCol)).as("first_ts"),
      sum(toolUsed(col(toolCol))).cast("long").as("tool_turns"),
      avg(toolUsed(col(toolCol)).cast("double")).as("tool_rate"),
      sum(toks).cast("long").as("total_tokens")) ++ perRole
    df.groupBy(col(key))
      .agg(count(lit(1)).as("n_turns"), aggs: _*)
  }

  /** Salted two-phase per-conversation aggregation — the skew path for
    * hot conversations (north_star: "salted repartitioning"). Phase 1
    * aggregates (conv_id, salt) partials — hot keys split across `salt`
    * reducers; phase 2 merges partials per conv_id. Order-dependent
    * windows (lag/lead, sessionization) can't be salted; this covers the
    * commutative aggregate features (counts, sums, rates, bounds).
    * Result is identical to [[convAggregates]] minus tool_rate being
    * derived (sum/count) rather than avg'd — same value.
    */
  def convAggregatesSalted(
      df: DataFrame,
      salt: Int = 16,
      key: String = "conv_id",
      tsCol: String = "ts",
      textCol: String = "text",
      roleCol: String = "role",
      toolCol: String = "tool",
      roles: Seq[String] = Seq("user", "assistant", "system", "tool")): DataFrame = {
    val toks = tokenCount(col(textCol))
    val rolePartials = roles.flatMap { r =>
      Seq(
        sum(when(col(roleCol) === r, toks).otherwise(lit(0)))
          .cast("long").as(s"_p_role_${r}_tokens"),
        sum(when(col(roleCol) === r, 1).otherwise(0))
          .cast("long").as(s"_p_role_${r}_turns"))
    }
    val phase1Aggs = Seq(
      max(col(tsCol)).as("_p_last"),
      min(col(tsCol)).as("_p_first"),
      sum(toolUsed(col(toolCol))).cast("long").as("_p_tool"),
      sum(toks).cast("long").as("_p_tokens")) ++ rolePartials
    val phase1 = df
      .withColumn("_salt", pmod(hash(col(tsCol), col(textCol)), lit(salt)))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_p_n"), phase1Aggs: _*)
    val roleFinals = roles.flatMap { r =>
      Seq(
        sum(col(s"_p_role_${r}_tokens")).cast("long").as(s"role_${r}_tokens"),
        sum(col(s"_p_role_${r}_turns")).cast("long").as(s"role_${r}_turns"))
    }
    phase1.groupBy(col(key))
      .agg(
        sum(col("_p_n")).cast("long").as("n_turns"),
        (Seq(
          max(col("_p_last")).as("last_ts"),
          min(col("_p_first")).as("first_ts"),
          sum(col("_p_tool")).cast("long").as("tool_turns"),
          (sum(col("_p_tool")).cast("double") / sum(col("_p_n"))).as("tool_rate"),
          sum(col("_p_tokens")).cast("long").as("total_tokens")) ++ roleFinals): _*)
  }

  /** Narrow feature materialization: token/tool metrics are computed
    * map-side BEFORE the window exchange and the wide `text` column is
    * dropped, so the shuffle moves ~40 bytes/row instead of the full
    * transcript — the difference between bandwidth-bound and CPU-bound
    * at cluster scale. Output: key, order cols, role + cumulative
    * features (joinable back to text by (conv_id, turn_idx) if needed).
    */
  def turnFeaturesNarrow(
      df: DataFrame,
      key: String = "conv_id",
      orderCols: Seq[Column] = Seq(col("ts"), col("turn_idx"))): DataFrame = {
    val narrow = df.select(
      col(key), col("ts"), col("turn_idx"), col("role"),
      tokenCount(col("text")).as("_tk"),
      toolUsed(col("tool")).as("_tu"))
    val w = Window.partitionBy(col(key)).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    narrow
      .withColumn("turns_so_far", count(lit(1)).over(w))
      .withColumn("tokens_so_far", sum(col("_tk")).over(w).cast("long"))
      .withColumn("tool_turns_so_far", sum(col("_tu")).over(w).cast("long"))
      .withColumn("tool_rate_so_far",
        col("tool_turns_so_far").cast("double") / col("turns_so_far"))
      .withColumn("user_tokens_so_far",
        sum(when(col("role") === "user", col("_tk")).otherwise(lit(0))).over(w).cast("long"))
      .withColumn("assistant_tokens_so_far",
        sum(when(col("role") === "assistant", col("_tk")).otherwise(lit(0))).over(w).cast("long"))
      .drop("_tk", "_tu")
  }

  /** Cumulative (point-in-time safe) per-turn features: everything here
    * observes only rows with ts <= the current row's ts — the zero-leakage
    * invariant (BASELINE north_star). Emitted per turn so an as-of join at
    * any probe ts picks up exactly the history-to-date feature vector.
    * Carries ALL input columns (incl. text) — for narrow scale-path
    * materialization use [[turnFeaturesNarrow]].
    */
  def cumulativeTurnFeatures(
      df: DataFrame,
      key: String = "conv_id",
      orderCols: Seq[Column] = Seq(col("ts"), col("turn_idx"))): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // token/tool columns materialized ONCE before the window so the regex
    // split runs one time per row, not once per referencing aggregate
    val toks = col("_tk")
    df.withColumn("_tk", tokenCount(col("text")))
      .withColumn("_tu", toolUsed(col("tool")))
      .withColumn("turns_so_far", count(lit(1)).over(w))
      .withColumn("tokens_so_far", sum(toks).over(w).cast("long"))
      .withColumn("tool_turns_so_far", sum(col("_tu")).over(w).cast("long"))
      .withColumn(
        "tool_rate_so_far",
        col("tool_turns_so_far").cast("double") / col("turns_so_far"))
      .withColumn(
        "user_tokens_so_far",
        sum(when(col("role") === "user", toks).otherwise(lit(0))).over(w).cast("long"))
      .withColumn(
        "assistant_tokens_so_far",
        sum(when(col("role") === "assistant", toks).otherwise(lit(0))).over(w).cast("long"))
      .drop("_tk", "_tu")
  }
}
