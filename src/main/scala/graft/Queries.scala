package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.asof.AsOfJoin
import graft.features.TranscriptFeatures

/** Driver-contract queries (SparkEntry.queries) with DuckDB oracle SQL.
  *
  * Each entry exercises one operator family from SURVEY.md §2 over the
  * read-only `/root/testdata/sf*` tables. Conventions for hash-stable
  * comparison against the DuckDB oracle:
  *  - every computed column is aliased identically on both sides;
  *  - SUMs of doubles go through DECIMAL(18,2) (exact, order-independent)
  *    and are cast back to DOUBLE at the end;
  *  - window orderings always carry a unique tie-break key.
  */
object Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  // ---------------------------------------------------------------- A1/A3
  /** Multi-aggregate group-by (SURVEY §2.3 A1, A3; reference whitelist
    * validators.py:15). */
  def q01AggBasic(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      | MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price
      |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin

  // ------------------------------------------------------------------- A2
  /** COUNT(DISTINCT) (SURVEY §2.3 A2; test_snowflake_sources.py:10). */
  def q02CountDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n_orders"))

  val q02Sql: String =
    """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust,
      | COUNT(*) AS n_orders
      |FROM orders GROUP BY o_orderstatus""".stripMargin

  // --------------------------------------------------------------- J2/A8
  /** Multi-way equi join + aggregate over the joined input (SURVEY §2.2
    * J2, §2.3 A8). `nation` is dimension-sized at any SF → broadcast. */
  def q03JoinAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("revenue"))

  val q03Sql: String =
    """SELECT n.n_name AS nation, COUNT(*) AS n_orders,
      | CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders o
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |GROUP BY n.n_name""".stripMargin

  // ------------------------------------------------------------------- W1
  /** RANK over partition (SURVEY §2.4 W1; test_teradata_sources.py:26). */
  def q04WindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    t(s, dir, "customer")
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"))
      .withColumn("rnk", rank().over(w))
      .filter(col("rnk") <= 5)
  }

  val q04Sql: String =
    """SELECT * FROM (
      | SELECT c_mktsegment, c_custkey, c_acctbal,
      |  RANK() OVER (PARTITION BY c_mktsegment
      |               ORDER BY c_acctbal DESC, c_custkey) AS rnk
      | FROM customer) r
      |WHERE rnk <= 5""".stripMargin

  // ------------------------------------------------------------------- W2
  /** Top-k per group via ROW_NUMBER (QUALIFY pattern, SURVEY §2.4 W2;
    * test_snowflake_sources.py:43). */
  def q05TopkPerGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
  }

  val q05Sql: String =
    """SELECT * FROM (
      | SELECT o_custkey, o_orderkey, o_totalprice,
      |  ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                     ORDER BY o_totalprice DESC, o_orderkey) AS rn
      | FROM orders) r
      |WHERE rn <= 3""".stripMargin

  // ------------------------------------------------------------------- W3
  /** LAG / LEAD over event time (SURVEY §2.4 W3; north_star lag/lead). */
  def q06LagLead(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("value"), col("ts"))
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .withColumn("next_value", lead(col("value"), 1).over(w))
      .drop("ts")
  }

  val q06Sql: String =
    """SELECT event_id, user_id, value,
      | LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
      | LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value
      |FROM events""".stripMargin

  // ------------------------------------------------------------------- W5
  /** Moving aggregate with an explicit ROWS frame (SURVEY §2.4 W5;
    * test_teradata_sources.py:60-69). */
  def q07Rolling(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-10, 0)
    t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("rolling_sum", sum(dec(col("value"))).over(w).cast("double"))
      .withColumn("rolling_n", count(lit(1)).over(w))
      .drop("ts", "value")
  }

  val q07Sql: String =
    """SELECT user_id, event_id,
      | CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
      |   PARTITION BY user_id ORDER BY ts, event_id
      |   ROWS BETWEEN 10 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling_sum,
      | COUNT(*) OVER (
      |   PARTITION BY user_id ORDER BY ts, event_id
      |   ROWS BETWEEN 10 PRECEDING AND CURRENT ROW) AS rolling_n
      |FROM events""".stripMargin

  // ------------------------------------------------------------------- W8
  /** Gap-based sessionization, 30-minute gap (SURVEY §2.4 W8;
    * BASELINE.json north_star). */
  def q08Sessionize(s: SparkSession, dir: String): DataFrame =
    TranscriptFeatures.sessionize(
      t(s, dir, "events").select(col("user_id"), col("event_id"), col("ts")),
      key = Seq("user_id"), tsCol = "ts", gapSeconds = 1800L,
      order = Seq(col("ts"), col("event_id")))
      .select(col("user_id"), col("event_id"), col("session_id"))

  val q08Sql: String =
    """WITH g AS (
      | SELECT user_id, event_id, ts,
      |  CASE WHEN LAG(ts) OVER w IS NULL
      |        OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
      |       THEN 1 ELSE 0 END AS is_new
      | FROM events
      | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT user_id, event_id,
      | CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - 1
      |  AS session_id
      |FROM g""".stripMargin

  // ------------------------------------------------------------------- J1
  /** THE core operator: backward as-of join with TTL (SURVEY §2.2 J1;
    * reference get_historical_features, customer_metrics.py:127-130).
    * Probes = signup events; features = purchase events; TTL 7 days;
    * equal-ts ties broken by greatest feature event_id. */
  def q09AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val probes = e.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("probe_ts"), col("event_id").as("probe_event_id"))
    val feats = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"), col("event_id").as("feat_event_id"))
    AsOfJoin.backward(
      probes, feats,
      keys = Seq("user_id"), probeTsCol = "probe_ts", featTsCol = "ts",
      ttlSeconds = Some(7L * 86400L), tieBreak = Seq("feat_event_id"))
  }

  val q09Sql: String =
    """WITH p AS (
      |  SELECT user_id, ts AS probe_ts, event_id AS probe_event_id
      |  FROM events WHERE event_type = 'signup'),
      | f AS (
      |  SELECT user_id, ts, value, event_id AS feat_event_id
      |  FROM events WHERE event_type = 'purchase'),
      | j AS (
      |  SELECT p.user_id, p.probe_ts, p.probe_event_id,
      |   f.ts AS matched_ts, f.value, f.feat_event_id,
      |   ROW_NUMBER() OVER (PARTITION BY p.probe_event_id
      |     ORDER BY f.ts DESC, f.feat_event_id DESC) AS rn
      |  FROM p LEFT JOIN f
      |    ON f.user_id = p.user_id
      |   AND f.ts <= p.probe_ts
      |   AND f.ts >= p.probe_ts - INTERVAL 7 DAY)
      |SELECT user_id, probe_ts, probe_event_id, matched_ts, value, feat_event_id
      |FROM j WHERE rn = 1""".stripMargin

  // ------------------------------------------------------------------ A10
  /** Per-entity feature vector: counts, conditional aggregates, distinct
    * cardinality, time bounds (SURVEY §2.3 A10 analog over events). */
  def q10EntityAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        sum(dec(col("value"))).cast("double").as("total_value"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"),
        sum(when(col("event_type") === "error", 1).otherwise(0))
          .cast("long").as("error_events"))

  val q10Sql: String =
    """SELECT user_id, COUNT(*) AS n_events,
      | COUNT(DISTINCT event_type) AS n_types,
      | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
      | MIN(ts) AS first_ts, MAX(ts) AS last_ts,
      | CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
      |   AS error_events
      |FROM events GROUP BY user_id""".stripMargin

  // --------------------------------------------------------------- A5/A6
  /** LISTAGG(DISTINCT .. ORDER BY ..) ≡ sorted collect_set (SURVEY §2.3
    * A5/A6; test_snowflake_sources.py:23,76). */
  def q11ListaggDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(concat_ws(",", array_sort(collect_set(col("event_type")))).as("types"))

  val q11Sql: String =
    """SELECT user_id,
      | STRING_AGG(DISTINCT event_type, ',' ORDER BY event_type) AS types
      |FROM events GROUP BY user_id""".stripMargin

  // --------------------------------------------------- O3/J3/F4/F6-F11
  /** Date spine × left join with zero-fill (SURVEY §2.5 O3, §2.2 J3,
    * §2.6 F4/F8/F10; test_teradata_sources.py:16-33 date-spine build). */
  def q12DateSpine(s: SparkSession, dir: String): DataFrame = {
    val spine = s.range(0, 30)
      .select(date_add(lit("2024-01-01").cast(DateType), col("id").cast("int")).as("day"))
    val daily = t(s, dir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    spine.join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("n"), lit(0L)).as("n_events"))
  }

  val q12Sql: String =
    """WITH spine AS (
      |  SELECT CAST(g.generate_series AS DATE) AS day
      |  FROM generate_series(DATE '2024-01-01', DATE '2024-01-30',
      |                       INTERVAL 1 DAY) g),
      | e AS (
      |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
      |  FROM events GROUP BY 1)
      |SELECT s.day, COALESCE(e.n, 0) AS n_events
      |FROM spine s LEFT JOIN e ON s.day = e.day""".stripMargin

  // --------------------------------------------------------- F1/F3/F4/F5
  /** CASE WHEN tiering + NULLIF/COALESCE (SURVEY §2.6 F1/F3/F4). */
  def q13CaseWhen(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(
        col("event_id"), col("user_id"),
        when(col("value") >= 15, "high")
          .when(col("value") >= 5, "mid")
          .otherwise("low").as("tier"),
        coalesce(nullif(col("event_type"), lit("error")), lit("none")).as("etype"))

  val q13Sql: String =
    """SELECT event_id, user_id,
      | CASE WHEN value >= 15 THEN 'high'
      |      WHEN value >= 5 THEN 'mid'
      |      ELSE 'low' END AS tier,
      | COALESCE(NULLIF(event_type, 'error'), 'none') AS etype
      |FROM events""".stripMargin

  // ------------------------------------------------------ dedup (exact)
  /** Exact deduplication: canonical representative + duplicate count per
    * normalized key (training-data pipeline op; hash-groupBy dedup). */
  def q14DedupExact(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(substring(col("text"), 1, 40).as("k"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_count"))

  val q14Sql: String =
    """SELECT SUBSTR(text, 1, 40) AS k, MIN(doc_id) AS keep_id,
      | COUNT(*) AS dup_count
      |FROM documents GROUP BY 1""".stripMargin

  // -------------------------------------------------------- text stats
  /** Token counting + per-language stats (training-data text analysis). */
  def q15TokenStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ", -1))).cast("long").as("total_tokens"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))

  val q15Sql: String =
    """SELECT lang, COUNT(*) AS n_docs,
      | CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS total_tokens,
      | MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
      |FROM documents GROUP BY lang""".stripMargin

  /** All (name → query) pairs exposed through SparkEntry. */
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg_basic" -> (q01AggBasic _),
    "q02_count_distinct" -> (q02CountDistinct _),
    "q03_join_agg" -> (q03JoinAgg _),
    "q04_window_rank" -> (q04WindowRank _),
    "q05_topk_per_group" -> (q05TopkPerGroup _),
    "q06_lag_lead" -> (q06LagLead _),
    "q07_rolling" -> (q07Rolling _),
    "q08_sessionize" -> (q08Sessionize _),
    "q09_asof_join" -> (q09AsofJoin _),
    "q10_entity_agg" -> (q10EntityAgg _),
    "q11_listagg_distinct" -> (q11ListaggDistinct _),
    "q12_date_spine" -> (q12DateSpine _),
    "q13_case_when" -> (q13CaseWhen _),
    "q14_dedup_exact" -> (q14DedupExact _),
    "q15_token_stats" -> (q15TokenStats _))

  val oracles: Map[String, String] = Map(
    "q01_agg_basic" -> q01Sql,
    "q02_count_distinct" -> q02Sql,
    "q03_join_agg" -> q03Sql,
    "q04_window_rank" -> q04Sql,
    "q05_topk_per_group" -> q05Sql,
    "q06_lag_lead" -> q06Sql,
    "q07_rolling" -> q07Sql,
    "q08_sessionize" -> q08Sql,
    "q09_asof_join" -> q09Sql,
    "q10_entity_agg" -> q10Sql,
    "q11_listagg_distinct" -> q11Sql,
    "q12_date_spine" -> q12Sql,
    "q13_case_when" -> q13Sql,
    "q14_dedup_exact" -> q14Sql,
    "q15_token_stats" -> q15Sql)
}
