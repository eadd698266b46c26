package graft.asof

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Point-in-time (backward as-of) join with TTL — the core retrieval operator.
  *
  * Semantics follow the reference's Feast-backed historical retrieval
  * (reference: src/sous_chef/sous_chef.py:227 `ttl=timedelta(days=...)`;
  * examples/customer_analytics_demo/customer_metrics.py:127-130
  * `get_historical_features(entity_df, features)`): for each probe row
  * `(keys, t)` return the single latest feature row with
  * `f.ts <= t && f.ts >= t - ttl`, left-outer (probes with no in-range
  * feature row keep null feature columns).
  *
  * Two physical strategies, both pure DataFrame plans (Catalyst/AQE pick
  * the rest):
  *
  *  - [[backward]] — union+window: tag probe and feature rows, union them,
  *    sort once per key by (ts, side), carry the last feature struct
  *    forward, keep probe rows, null out matches older than the TTL.
  *    ONE shuffle (hash by key for the window sort), no range-join row
  *    explosion — O((P+F) log) per partition regardless of TTL width.
  *    This is the scale path for 10^12-row feature tables: the shuffle is
  *    keyed on the entity so both sides co-partition, and AQE coalesces.
  *
  *  - [[backwardBroadcast]] — range join + row_number, with the feature
  *    side broadcast. Right when the feature table is dimension-sized;
  *    avoids shuffling the (large) probe side entirely.
  *
  * Ties: features with equal `ts` are broken by `tieBreak` columns
  * (ascending; the LAST per ordering wins, i.e. greatest tieBreak), so
  * results are deterministic — the reference leaves this to Feast, we pin
  * it (SURVEY.md §7 "Leakage at equal timestamps").
  */
object AsOfJoin {

  /** Union+window backward as-of join.
    *
    * @param probe      probe rows; must contain `keys` and `probeTsCol`
    * @param features   feature rows; must contain `keys` and `featTsCol`
    * @param keys       equi-join entity keys
    * @param probeTsCol event-time column in `probe`
    * @param featTsCol  event-time column in `features`
    * @param ttlSeconds optional TTL: matches older than probeTs - ttl are dropped
    * @param tieBreak   feature columns breaking equal-`ts` ties (greatest wins)
    * @param matchedTsName output column holding the matched feature ts
    */
  def backward(
      probe: DataFrame,
      features: DataFrame,
      keys: Seq[String],
      probeTsCol: String,
      featTsCol: String,
      ttlSeconds: Option[Long] = None,
      tieBreak: Seq[String] = Nil,
      matchedTsName: String = "matched_ts"): DataFrame = {

    val featPayload = features.columns.toSeq
      .filterNot(c => keys.contains(c) || c == featTsCol)
    val probePayload = probe.columns.toSeq.filterNot(keys.contains)

    // Feature rows travel as one struct so that a feature row whose payload
    // is legitimately NULL still "wins" as the latest row (last(ignoreNulls)
    // skips nulls only at the struct level, never inside it).
    val featStructCols =
      col(featTsCol).as("_fts") +: featPayload.map(col)
    val fSide = features.select(
      keys.map(col) ++ Seq(
        col(featTsCol).as("_ts"),
        lit(0).as("_side"),
        struct(featStructCols: _*).as("_feat")) ++
        probePayload.map(c => lit(null).cast(probe.schema(c).dataType).as(c)): _*)

    val featStructType = fSide.schema("_feat").dataType.asInstanceOf[StructType]
    val pSide = probe.select(
      keys.map(col) ++ Seq(
        col(probeTsCol).as("_ts"),
        lit(1).as("_side"),
        lit(null).cast(featStructType).as("_feat")) ++
        probePayload.map(col): _*)

    // Equal ts: feature rows sort before the probe (inclusive f.ts <= p.ts);
    // equal-ts features tie-break ascending so last() takes the greatest.
    val ordering: Seq[Column] =
      col("_ts").asc +: col("_side").asc +: tieBreak.map(c => col("_feat").getField(c).asc)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = fSide.unionByName(pSide)
      .withColumn("_carried", last(col("_feat"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)

    val inTtl: Column = ttlSeconds match {
      case Some(s) =>
        col("_carried").isNotNull &&
          col("_carried").getField("_fts") >= (col("_ts") - expr(s"INTERVAL $s SECONDS"))
      case None => col("_carried").isNotNull
    }
    val gated = carried.withColumn("_match", when(inTtl, col("_carried")))

    gated.select(
      keys.map(col) ++
        probePayload.map(col) ++
        Seq(col("_match").getField("_fts").as(matchedTsName)) ++
        featPayload.map(c => col("_match").getField(c).as(c)): _*)
  }

  /** One member feature table of a [[backwardMulti]] call.
    *
    * @param features   feature rows; must contain the join keys + `featTsCol`
    * @param featTsCol  event-time column in `features`
    * @param ttlSeconds optional per-view TTL
    * @param tieBreak   feature columns breaking equal-ts ties (greatest wins)
    * @param matchedTsName when set, emit the matched feature ts under this name
    * @param outputCols payload columns to emit (default: all non-key,
    *                   non-ts columns) — lets callers keep tie-break-only
    *                   columns (e.g. a created-ts) out of the output
    *                   without post-hoc drops that would collide across
    *                   views
    */
  case class FeatureSide(
      features: DataFrame,
      featTsCol: String,
      ttlSeconds: Option[Long] = None,
      tieBreak: Seq[String] = Nil,
      matchedTsName: Option[String] = None,
      outputCols: Option[Seq[String]] = None)

  /** Multi-view backward as-of join — V feature tables against one probe
    * in ONE shuffle.
    *
    * The naive service retrieval folds [[backward]] per view: V
    * union+window passes, each reshuffling the (growing, widening) probe
    * result — V exchanges of the whole probe for a V-view service. Here
    * all V feature tables and the probe union into ONE tagged stream,
    * ONE window over the shared entity keys carries V `last(struct,
    * ignoreNulls)` columns simultaneously, and per-view TTL gates apply
    * afterwards — so a service of any width costs exactly one hash
    * exchange of (probe + Σ features), the same as a single view.
    * MultiViewPlanSpec gates the one-exchange shape; semantic equality
    * with the per-view fold is FeatureEngineSpec's job.
    *
    * Requires every view to share the same entity `keys` (the engine
    * falls back to the per-view fold otherwise). Per-view equal-ts
    * tie-breaks order only rows of that view: other views' rows hold a
    * null struct there, and `last(ignoreNulls)` never sees them.
    */
  def backwardMulti(
      probe: DataFrame,
      sides: Seq[FeatureSide],
      keys: Seq[String],
      probeTsCol: String): DataFrame = {
    require(sides.nonEmpty, "backwardMulti needs at least one feature side")
    val probePayload = probe.columns.toSeq.filterNot(keys.contains)

    val payloads = sides.map { s =>
      s.features.columns.toSeq.filterNot(c => keys.contains(c) || c == s.featTsCol)
    }
    // per-side struct columns (ts first, as in backward())
    val structTypes = sides.zip(payloads).map { case (s, payload) =>
      s.features.select(
        struct((col(s.featTsCol).as("_fts") +: payload.map(col)): _*).as("_feat"))
        .schema("_feat").dataType.asInstanceOf[StructType]
    }

    def sideRow(i: Int): DataFrame = {
      val s = sides(i)
      val payload = payloads(i)
      s.features.select(
        keys.map(col) ++ Seq(
          col(s.featTsCol).as("_ts"),
          lit(0).as("_side")) ++
          sides.indices.map { j =>
            if (j == i) struct((col(s.featTsCol).as("_fts") +: payload.map(col)): _*).as(s"_feat_$j")
            else lit(null).cast(structTypes(j)).as(s"_feat_$j")
          } ++
          probePayload.map(c => lit(null).cast(probe.schema(c).dataType).as(c)): _*)
    }
    val pSide = probe.select(
      keys.map(col) ++ Seq(
        col(probeTsCol).as("_ts"),
        lit(1).as("_side")) ++
        sides.indices.map(j => lit(null).cast(structTypes(j)).as(s"_feat_$j")) ++
        probePayload.map(col): _*)

    // Total order: (ts, side, then each view's tie-break fields). A
    // view's tie-break fields are null on every other view's rows, so
    // they only order rows WITHIN that view at equal ts — which is the
    // contract (last() ignores the null structs of other views anyway).
    val ordering: Seq[Column] =
      col("_ts").asc +: col("_side").asc +:
        sides.zipWithIndex.flatMap { case (s, j) =>
          s.tieBreak.map(c => col(s"_feat_$j").getField(c).asc)
        }
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val unioned = sides.indices.map(sideRow).reduce(_.unionByName(_)).unionByName(pSide)
    // ONE select carrying every view's struct over the SAME window spec:
    // Catalyst collapses same-spec window expressions into a single
    // Window operator — sequential withColumn would rewrite the ordering
    // expressions differently per step and plan V windows (V extra sorts)
    val carried = unioned.select(
      (unioned.columns.map(col) ++
        sides.indices.map(j =>
          last(col(s"_feat_$j"), ignoreNulls = true).over(w).as(s"_carried_$j"))): _*)
      .filter(col("_side") === 1)

    val gated = sides.zipWithIndex.foldLeft(carried) { case (df, (s, j)) =>
      val inTtl: Column = s.ttlSeconds match {
        case Some(sec) =>
          col(s"_carried_$j").isNotNull &&
            col(s"_carried_$j").getField("_fts") >=
              (col("_ts") - expr(s"INTERVAL $sec SECONDS"))
        case None => col(s"_carried_$j").isNotNull
      }
      df.withColumn(s"_match_$j", when(inTtl, col(s"_carried_$j")))
    }

    gated.select(
      keys.map(col) ++
        probePayload.map(col) ++
        sides.zipWithIndex.flatMap { case (s, j) =>
          val outCols = s.outputCols.getOrElse(payloads(j))
          s.matchedTsName.toSeq.map(n => col(s"_match_$j").getField("_fts").as(n)) ++
            outCols.map(c => col(s"_match_$j").getField(c).as(c))
        }: _*)
  }

  /** Broadcast variant for dimension-sized feature tables: the feature
    * table is collapsed to one sorted array per key (tiny shuffle on the
    * small side only), broadcast, and each probe row picks its match with
    * a vectorized array lookup — the probe side is NEVER shuffled, which
    * is the point at 10^12 probe rows against a small feature dim.
    * Same semantics as [[backward]].
    */
  def backwardBroadcast(
      probe: DataFrame,
      features: DataFrame,
      keys: Seq[String],
      probeTsCol: String,
      featTsCol: String,
      ttlSeconds: Option[Long] = None,
      tieBreak: Seq[String] = Nil,
      matchedTsName: String = "matched_ts"): DataFrame = {

    val featPayload = features.columns.toSeq
      .filterNot(c => keys.contains(c) || c == featTsCol)
    // Sort key = (_fts, tieBreaks...) so the LAST in-range element is the
    // latest feature row with the greatest tie-break — matching backward().
    val rowStruct = struct(
      (col(featTsCol).as("_fts") +: tieBreak.map(col)) ++
        featPayload.filterNot(tieBreak.contains).map(col): _*)
    val packed = features
      .groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(rowStruct)).as("_frows"))

    val joined = probe.join(broadcast(packed), keys, "left")

    val pts = col(probeTsCol)
    val lo: Column = ttlSeconds match {
      case Some(s) => pts - expr(s"INTERVAL $s SECONDS")
      case None    => lit(null)
    }
    val inRange = filter(col("_frows"), x =>
      x.getField("_fts") <= pts &&
        (if (ttlSeconds.isDefined) x.getField("_fts") >= lo else lit(true)))
    val matched = when(size(inRange) > 0, element_at(inRange, size(inRange)))

    probeOut(probe, joined.withColumn("_match", matched),
      featPayload, matchedTsName)
  }

  private def probeOut(
      probe: DataFrame,
      withMatch: DataFrame,
      featPayload: Seq[String],
      matchedTsName: String): DataFrame =
    withMatch.select(
      probe.columns.map(col) ++
        Seq(col("_match").getField("_fts").as(matchedTsName)) ++
        featPayload.map(c => col("_match").getField(c).as(c)): _*)
}
