package graft.features

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-aggregate variants of the metric rollups (SURVEY §2.3 A2
  * anticipated this; r4 VERDICT Missing #3): the EXACT forms —
  * `COUNT(DISTINCT)` and the full-map `percentile` buffer q26 uses —
  * are what the DuckDB oracle can replay, but at 100× with adversarial
  * group cardinality they are OOM shapes (the percentile buffer holds a
  * per-group value-count map; count-distinct holds the value set).
  * These opt-in variants bound state per group at a few KB:
  *
  *  - `hll_sketch_agg` (DataSketches HLL) — 2^lgK registers per group
  *    sized from `rsd`; memory is CONSTANT in the value count and the
  *    buffer is ONE binary object (Spark's `approx_count_distinct`
  *    HLL++ materializes each register word as its own agg-buffer
  *    attribute — thousands of plan columns at tight rsd, measured as
  *    ~1 s of planning/codegen per execution in the r6 optimization
  *    pass). Below dense-mode promotion the sketch stores exact coupons
  *    so tiny cardinalities are EXACT counts (the q56 gate leans on
  *    exactly this, at a planted cardinality where the deterministic
  *    seedless hash makes it conclusive; ApproxAggregatesSpec carries
  *    the error-bound evidence at scale).
  *  - `percentile_approx` — Greenwald-Khanna summaries with relative
  *    rank error 1/accuracy; for groups SMALLER than the compression
  *    threshold every sample is retained and the answer is an exact
  *    order statistic.
  *
  * The switch ships as one function with `approx: Boolean` so call
  * sites opt in per rollup, not per fork of the code.
  */
object ApproxAggregates {

  /** Corpus-relative threshold filtering: keep rows whose `valueCol` is
    * at or above the corpus's q-quantile (e.g. "keep the top 25% of
    * documents by quality score" — thresholds that adapt to the corpus
    * instead of a hand-tuned constant). Two bounded passes:
    *
    *  1. ONE approximate-percentile aggregation over the whole corpus —
    *     GK summary state is O(accuracy), constant in corpus size, and
    *     the result collected to the driver is a single scalar (a
    *     bounded collect, like the IVF centroid reads);
    *  2. a scan-local `>= threshold` filter with the scalar baked into
    *     the plan as a literal — pushes down to the source like any
    *     constant predicate.
    *
    * Below the GK compression threshold (n ≤ accuracy) the quantile is
    * an exact order statistic, which is what lets q60 gate this against
    * DuckDB's `quantile_disc` exactly at gate scale; at 100 TB the same
    * call degrades gracefully to a 1/accuracy rank-error threshold.
    * The chosen threshold is attached as a literal `threshold` column
    * for auditability. */
  def quantileThresholdFilter(
      df: DataFrame,
      valueCol: String,
      q: Double,
      accuracy: Int = 100000): DataFrame = {
    require(q > 0.0 && q < 1.0, s"quantile must be in (0,1): $q")
    val row = df.agg(
      percentile_approx(col(valueCol).cast("double"), lit(q), lit(accuracy)).as("t"))
      .collect().head
    // empty input (or all-null value column) yields a null percentile —
    // fail with the cause, not a bare NullPointerException downstream
    require(!row.isNullAt(0),
      s"quantileThresholdFilter: no non-null '$valueCol' values to take " +
        s"the $q-quantile of (empty corpus, or the column is all null)")
    val thr = row.getDouble(0)
    // Compare in the column's NATIVE type: `longCol >= doubleLit` wraps
    // the column in a cast, which blocks parquet predicate pushdown
    // (caught by the PlanSpec q60 gate — the scan kept only IsNotNull).
    // For an integral column, x >= thr  <=>  x >= ceil(thr) as a long.
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val pred = df.schema(valueCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        col(valueCol) >= lit(math.ceil(thr).toLong)
      case _ => col(valueCol) >= lit(thr)
    }
    df.filter(pred).withColumn("threshold", lit(thr))
  }

  /** Per-event-type metric rollup: row count, distinct users, p50/p90
    * of the metric column. `approx = false` is the oracle-exact form;
    * `approx = true` is the bounded-state form for 100 TB groups.
    *
    * Output: (event_type, n_events, distinct_users, p50_value,
    * p90_value) — identical schema in both modes so a pipeline can flip
    * the switch without downstream changes.
    */
  def eventTypeStats(
      events: DataFrame,
      approx: Boolean,
      rsd: Double = 0.005,
      percentileAccuracy: Int = 100000): DataFrame = {
    // Approx distinct = a DataSketches HLL sketch (hll_sketch_agg) sized
    // so its relative standard error 1.04/sqrt(2^lgK) meets `rsd` — the
    // same register count Spark's HLL++ would pick. NOT
    // approx_count_distinct: Spark's HLL++ lays its registers out as
    // individual agg-buffer attributes, so rsd=0.005 inflates every
    // aggregate buffer and plan to 6,554 long columns — measured ~1 s of
    // planning/codegen per q56 execution and a 52 KB/group/task buffer
    // at scale; the sketch buffer is one binary object updated in place.
    // Exactness at planted-small cardinality is RETAINED (the q56 gate's
    // doctrine): below promotion to dense HLL mode the sketch stores raw
    // coupons and the estimate is the exact count; the sketch hash is
    // seedless-deterministic like HLL++. At-scale error stays spec'd by
    // ApproxAggregatesSpec (within 4·rsd at 10k true cardinality).
    val lgK = math.min(21, math.max(4,
      math.ceil(2.0 * math.log(1.04 / rsd) / math.log(2.0)).toInt))
    val users: Column =
      if (approx) hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(lgK)))
      else countDistinct(col("user_id"))
    val percs: Column =
      if (approx)
        percentile_approx(col("value"), array(lit(0.5), lit(0.9)),
          lit(percentileAccuracy))
      else expr("percentile(value, array(0.5D, 0.9D))")
    events.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        users.as("distinct_users"),
        percs.as("_p"))
      .select(col("event_type"), col("n_events"), col("distinct_users"),
        col("_p").getItem(0).as("p50_value"),
        col("_p").getItem(1).as("p90_value"))
  }
}
