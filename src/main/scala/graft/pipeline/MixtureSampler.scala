package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified mixture sampling — the final stage of a
  * pretraining-data pipeline: mix domains/languages/sources to target
  * proportions by keeping each stratum at its own rate, decided purely
  * by a content-independent hash of the document key (no RNG state, no
  * shuffle, no driver coordination).
  *
  * A row survives iff `u60(md5(key ":" salt)) < floor(rate(stratum) *
  * 2^60)` where u60 is the first 15 hex chars of the md5 digest read as
  * a 60-bit integer. Properties that matter at 100 TB:
  *
  *  - **Scan-local**: the decision is a codegen'd scalar predicate —
  *    no shuffle, no state, embarrassingly parallel, pushes through
  *    column pruning (only key + stratum columns are read if the
  *    caller projects).
  *  - **Exactly replayable**: md5 is engine-independent, so any SQL
  *    engine reproduces the EXACT sample (the q57 DuckDB oracle
  *    replays it row-for-row) — reruns, audits, and incremental
  *    backfills select identical rows.
  *  - **Nested samples**: the threshold form is monotone in `rate`, so
  *    raising a stratum's rate strictly grows the previous sample
  *    (useful for mixture re-tuning without churning the corpus), and
  *    disjoint date partitions sample independently.
  *  - **Unbiased reweighting**: the emitted `sample_weight` = 1/rate
  *    restores stratum totals in expectation for downstream stats.
  *
  * Rates are per-stratum with a default for unlisted strata; rate 0
  * drops the stratum entirely, rate 1 keeps everything (threshold
  * 2^60 > any u60). The tiny rates map compiles to a literal CASE
  * chain — never a join.
  */
object MixtureSampler {

  private val Bits = 60

  /** The 60-bit uniform hash driving the decision (exposed for specs
    * and oracle authoring): first 15 hex chars of md5(key ":" salt). */
  def u60(key: Column, salt: String): Column =
    conv(substring(md5(concat(key.cast("string"), lit(":" + salt))), 1, 15),
      16, 10).cast("long")

  /** Integer survival threshold for `rate` — computed driver-side so
    * the Spark plan and the oracle SQL embed the SAME literal and no
    * float evaluation happens per row. */
  def threshold(rate: Double): Long = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1]: $rate")
    if (rate >= 1.0) 1L << (Bits + 1) else (rate * (1L << Bits)).toLong
  }

  /** Stratified sample of `df`: keep rows of stratum s at rates(s)
    * (defaultRate for unlisted strata), decided by u60(keyCol). Adds
    * `sample_weight` = 1/rate for unbiased downstream aggregation. */
  def sample(
      df: DataFrame,
      stratumCol: String,
      keyCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 0.0,
      salt: String = "graft-mix"): DataFrame = {
    val h = u60(col(keyCol), salt)
    val thr = rates.foldLeft(lit(threshold(defaultRate))) {
      case (acc, (stratum, rate)) =>
        when(col(stratumCol) === stratum, lit(threshold(rate))).otherwise(acc)
    }
    val rate = rates.foldLeft(lit(defaultRate)) {
      case (acc, (stratum, r)) =>
        when(col(stratumCol) === stratum, lit(r)).otherwise(acc)
    }
    df.filter(h < thr)
      .withColumn("sample_weight", lit(1.0) / rate)
  }

  /** Deterministic dataset split assignment: label each row train/val/
    * test (or any named fractions) by the same engine-independent
    * 60-bit hash, with a DIFFERENT salt so split membership is
    * statistically independent of mixture-sampling survival. The
    * decision is a scan-local CASE over cumulative integer thresholds:
    * no shuffle, no RNG, exactly replayable (q58), and stable under
    * corpus growth — a document's split never changes when other
    * documents are added or removed, which is what prevents silent
    * train/test leakage across pipeline re-runs.
    *
    * `splits` is an ordered list of (name, fraction); fractions must
    * sum to ~1 (±1e-9). Rows land in the first split whose cumulative
    * threshold exceeds their hash. */
  def assignSplit(
      df: DataFrame,
      keyCol: String,
      splits: Seq[(String, Double)],
      salt: String = "graft-split",
      splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1: $splits")
    val h = u60(col(keyCol), salt)
    // clamp the cumulative sums: float addition can land at 1.0 + 2 ulp
    val cum = splits.scanLeft(0.0) { case (acc, (_, f)) => acc + f }
      .tail.map(c => math.min(c, 1.0))
    // last split catches everything (avoids a float-edge unassigned row)
    val expr0: Column = lit(splits.last._1)
    val assigned = splits.init.zip(cum.init).reverse
      .foldLeft(expr0) { case (acc, ((name, _), c)) =>
        when(h < threshold(c), lit(name)).otherwise(acc)
      }
    df.withColumn(splitCol, assigned)
  }

  /** Cumulative integer thresholds for `splits` (oracle authoring). */
  def splitThresholds(splits: Seq[(String, Double)]): Seq[(String, Long)] = {
    val cum = splits.scanLeft(0.0) { case (acc, (_, f)) => acc + f }
      .tail.map(c => math.min(c, 1.0))
    splits.map(_._1).zip(cum.map(threshold))
  }

  /** Per-stratum quota cap: keep at most `maxPerStratum` rows of each
    * stratum (the standard per-domain/per-URL-host cap against corpus
    * domination by one source), selected DETERMINISTICALLY — rows are
    * ranked inside each stratum by the content-independent u60 hash
    * (key as tie-break), so the kept set is a uniform, replayable
    * sample of the stratum, not "whatever the scan happened to read
    * first", and is stable under partitioning.
    *
    * Cost: one hash shuffle on the stratum key + a per-partition sort
    * (a single window pass, same shape as top-k-per-group q05). A
    * stratum's rows must sort within one task; for web-scale corpora
    * where one domain can exceed a task, first pre-thin the hot strata
    * with [[sample]] at rate ≈ 2·cap/|stratum| (nested-sample
    * monotonicity keeps the final set identical as long as the
    * pre-thin keeps ≥ cap rows — the window then picks the same lowest
    * hashes), or cap via AQE skew-split-friendly aggregation. */
  def capPerStratum(
      df: DataFrame,
      stratumCol: String,
      keyCol: String,
      maxPerStratum: Int,
      salt: String = "graft-cap"): DataFrame = {
    require(maxPerStratum > 0, "maxPerStratum must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(u60(col(keyCol), salt), col(keyCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= maxPerStratum)
      .drop("__rk")
  }

  /** Realized mixture audit: per-stratum kept count and fraction of the
    * stratum kept — one aggregation over the sample's strata. */
  def realizedMixture(sampled: DataFrame, full: DataFrame,
      stratumCol: String): DataFrame = {
    val kept = sampled.groupBy(col(stratumCol)).agg(count(lit(1)).as("kept"))
    val tot = full.groupBy(col(stratumCol)).agg(count(lit(1)).as("total"))
    tot.join(kept, Seq(stratumCol), "left")
      .select(col(stratumCol), coalesce(col("kept"), lit(0L)).as("kept"),
        col("total"),
        round(coalesce(col("kept"), lit(0L)) / col("total"), 6).as("realized_rate"))
  }
}
