package graft.tools

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.features.TranscriptFeatures

/** Ad-hoc profiling entry for plan inspection (dev tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "profile")
    import spark.implicits._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val turns = spark.read.parquet("/tmp/graft_bench_turns_sf0.1.parquet")
    println(s"[profile] turns partitions: ${turns.rdd.getNumPartitions}")
    time("count turns")(turns.count())

    val feats = TranscriptFeatures.cumulativeTurnFeatures(turns)
    time("features noop")(feats.write.mode("overwrite").format("noop").save())
    time("features parquet")(feats.write.mode("overwrite")
      .parquet("/tmp/profile_mat"))

    // window only, no token exprs
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"conv_id").orderBy($"ts", $"turn_idx")
      .rowsBetween(Long.MinValue, 0)
    time("bare window count")(
      turns.withColumn("c", count(lit(1)).over(w))
        .write.mode("overwrite").format("noop").save())

    // token expr only, no window
    time("token expr only")(
      turns.withColumn("tk", TranscriptFeatures.tokenCount($"text"))
        .write.mode("overwrite").format("noop").save())

    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    println(s"[profile] docs: ${docs.count()} rows, ${docs.rdd.getNumPartitions} partitions")
    time("q18 original")(graft.QueriesExtra.q18TextQuality(spark, "/root/testdata/sf0.1")
      .write.mode("overwrite").format("noop").save())
    docs.select(split($"text", " ", -1).as("t")).createOrReplaceTempView("vt")
    time("split only")(spark.table("vt")
      .select(size($"t").as("n")).write.mode("overwrite").format("noop").save())
    time("aggregate hof")(spark.table("vt")
      .select(aggregate($"t", lit(0L), (a, x) => a + length(x)).as("s"))
      .write.mode("overwrite").format("noop").save())

    spark.stop()
  }
}
