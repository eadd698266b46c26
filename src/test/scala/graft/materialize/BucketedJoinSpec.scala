package graft.materialize

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.datagen.TranscriptGen
import graft.features.TranscriptFeatures

class BucketedJoinSpec extends SparkTestBase {

  test("co-bucketed feature tables equi-join with ZERO exchange") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_bt LOCATION '/tmp/graft_bt_wh'")
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val turns = TranscriptGen.turns(spark, nConvs = 50, avgTurns = 8, seed = 9L).toDF()
      val feats = TranscriptFeatures.cumulativeTurnFeatures(turns)
        .select("conv_id", "turn_idx", "turns_so_far", "tokens_so_far")
      val latest = feats.groupBy("conv_id")
        .agg(max(col("turns_so_far")).as("total_turns"))

      Materializer.writeBucketed(feats, "graft_bt.feats", Seq("conv_id"), 8)
      Materializer.writeBucketed(latest, "graft_bt.latest", Seq("conv_id"), 8)

      val j = spark.table("graft_bt.feats")
        .join(spark.table("graft_bt.latest"), "conv_id")
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"co-bucketed join must not shuffle:\n$plan")

      // and the result is right
      assert(j.count() === feats.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.sql("DROP DATABASE IF EXISTS graft_bt CASCADE")
    }
  }
}
