package graft

import graft.SparkTestBase

/** Physical-plan quality gates: the properties that make these operators
  * scale must survive refactors — pushdown/pruning at the scan,
  * broadcast of dimension tables, single-shuffle as-of join.
  */
class PlanSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q01: aggregate is partial+final with a column-pruned scan") {
    val p = plan("q01_agg_basic")
    assert(p.contains("HashAggregate"))
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double," +
      "l_returnflag:string,l_linestatus:string>"),
      s"scan not pruned to the 4 referenced columns:\n$p")
  }

  test("q03: dimension joins broadcast; join-key filters pushed to the scan") {
    val p = plan("q03_join_agg")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(o_custkey)]"),
      s"join-key null filter not pushed to orders scan:\n$p")
    assert(!p.contains("SortMergeJoin"), s"dimension join degraded to SMJ:\n$p")
  }

  test("q09: backward as-of join is ONE shuffle (union + sort + window), " +
       "with the event_type filters pushed to both scans") {
    val p = plan("q09_asof_join")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges === 1, s"as-of join must shuffle exactly once, got $exchanges:\n$p")
    assert(p.contains("EqualTo(event_type,purchase)"), "feature-side filter not pushed")
    assert(p.contains("EqualTo(event_type,signup)"), "probe-side filter not pushed")
    assert(p.contains("Window"), "expected window-based last-value carry")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "as-of join must not fall back to a product join")
  }

  test("q05: top-k per group stays a single window pass (no join, no extra shuffle)") {
    val p = plan("q05_topk_per_group")
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 1)
    assert(p.contains("RunningWindowFunction") || p.contains("Window"))
  }

  test("q57/q58: sampling and split assignment are scan-local (zero exchanges)") {
    for (q <- Seq("q57_mixture_sample", "q58_split_assign")) {
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q must not shuffle:\n$p")
    }
  }

  test("q59: per-stratum quota cap is a single window pass") {
    val p = plan("q59_quota_cap")
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 1,
      s"quota cap must shuffle exactly once (by stratum):\n$p")
    assert(p.contains("Window"), s"expected a window ranking pass:\n$p")
  }

  test("q60: the quantile threshold becomes a pushed-down scan predicate") {
    // the threshold is collected driver-side and baked in as a literal,
    // so the corpus re-scan must push `n_chars >= thr` into the reader
    val p = plan("q60_quantile_filter")
    assert(p.contains("GreaterThanOrEqual(n_chars,"),
      s"threshold predicate not pushed to the documents scan:\n$p")
  }

  test("q61: the DSIR scoring stage is a codegen'd scan scalar (no UDF, no explode)") {
    // the query's distribution passes run at plan-build time (bounded
    // collects); the RETURNED plan is the scoring scan — no data-moving
    // shuffle (the single RoundRobin exchange is Dedup.spread's
    // intentional split of the one-file input), no explode, and the
    // native score expression inside a codegen span (AQE-final plan,
    // so execute first — see CLAUDE.md)
    val df = SparkEntry.queries("q61_importance_weights")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning") && !p.contains("rangepartitioning"),
      s"scoring scan must not hash/range shuffle:\n$p")
    assert(!p.contains("Generate"), s"scoring must not explode grams:\n$p")
    // codegen spans print as "*(n)" in the tree; the scoring Project
    // must sit inside one
    assert("""\*\(\d+\) Project \[.*hashedngramratioscore""".r.findFirstIn(p).isDefined,
      s"scoring Project fell out of whole-stage codegen:\n$p")
  }

  test("q62: the packing prefix sum is hash-partitioned, never a single-partition window") {
    val p = plan("q62_pack_bins")
    assert(p.contains("Window"), s"expected the per-shard window pass:\n$p")
    assert(p.contains("hashpartitioning(__shard"),
      s"prefix sum must shard by the hash-derived key:\n$p")
    assert(!p.contains("SinglePartition"),
      s"global-order window collapsed to one partition (the scale-killer " +
        s"this operator exists to avoid):\n$p")
  }

  test("q63: Gumbel top-k compiles to TakeOrderedAndProject, never a global sort") {
    // per-partition bounded heap + one driver merge of k rows — the
    // selection must not range-shuffle the corpus for a full sort
    val df = SparkEntry.queries("q63_importance_resample")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"expected the bounded top-k operator:\n$p")
    assert(!p.contains("rangepartitioning"),
      s"top-k degraded to a global sort exchange:\n$p")
  }

  test("q41: semi/anti execute as existence hash joins, never row-amplifying") {
    val p = plan("q41_semi_anti")
    assert(p.contains("LeftSemi"), s"expected a LeftSemi join:\n$p")
    assert(p.contains("LeftAnti"), s"expected a LeftAnti join:\n$p")
    // existence joins must not degrade to a plan that materializes the
    // match multiplicity (inner join + distinct) or a product join
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"existence join degraded to a product join:\n$p")
    assert(p.contains("GreaterThan(o_totalprice,450000.0)"),
      s"price filter not pushed to the orders scan:\n$p")
  }

  test("whole-stage codegen covers the scan->aggregate hot path") {
    // codegen spans only show in the AQE-final plan, so execute first
    val df = SparkEntry.queries("q01_agg_basic")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // "*(n) Operator" is the WholeStageCodegen span marker in plan strings
    assert(p.contains("*(1)") && p.contains("*(2)"), s"codegen missing:\n$p")
  }

  test("AQE splits skewed partitions on a hot-conversation join") {
    // GraftSession enables skewJoin; prove it actually fires: a
    // TranscriptGen table with 2 conversations at 300x the median turn
    // count, shuffle-joined on conv_id. Thresholds are lowered to make
    // test-scale partitions eligible — the mechanism is the same one a
    // 100TB hot key hits at the default 256MB threshold. Two shape
    // requirements worth knowing at any scale: (1) AQE can only split a
    // reduce partition at MAPPER boundaries, so the hot key must span
    // several input splits (here: a round-robin repartition; at 100TB,
    // thousands of scan tasks); (2) both join children must be plain
    // sort-over-shuffle — an aggregate between shuffle and join blocks
    // the split (it would duplicate rows into the agg).
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4KB")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val turns = graft.datagen.TranscriptGen
        .turns(spark, nConvs = 60, avgTurns = 12, hotConvs = 2,
          hotFactor = 300, seed = 11L)
        .toDF().repartition(8).cache()
      val firstTurns = turns.filter(org.apache.spark.sql.functions.col("turn_idx") < 2)
        .select(org.apache.spark.sql.functions.col("conv_id"),
          org.apache.spark.sql.functions.col("ts").as("first_ts"))
      val joined = turns.join(firstTurns, "conv_id")
      // execute THIS df's queryExecution so the AQE-final plan is visible
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"expected a shuffle join for the skew test:\n$p")
      assert(p.contains("skew=true"),
        s"AQE did not split the hot-conversation partition:\n$p")
      turns.unpersist()
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
