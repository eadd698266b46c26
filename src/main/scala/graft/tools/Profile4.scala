package graft.tools

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.dedup.Dedup

/** Microbench of the minhash aggregate shapes (dev tool). */
object Profile4 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "profile4")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text"))
    // materialize exploded shingles ONCE to parquet to isolate the agg
    val exploded = Dedup.spread(docs)
      .select(col("doc_id"), explode(Dedup.shingles(col("text"), 3)).as("_s"))
    time("write exploded")(exploded.write.mode("overwrite")
      .parquet("/tmp/profile_shingles"))
    val ex = spark.read.parquet("/tmp/profile_shingles")
    println(s"[profile] exploded rows: ${ex.count()}, parts: ${ex.rdd.getNumPartitions}")

    (1 to 2).foreach { r =>
      time(s"count r$r")(ex.count())
      time(s"1 min agg r$r")(
        ex.groupBy("doc_id").agg(min(xxhash64(col("_s"), lit(0))))
          .write.mode("overwrite").format("noop").save())
      time(s"32 min aggs r$r") {
        val aggs = (0 until 32).map(i => min(xxhash64(col("_s"), lit(i))).as(s"h$i"))
        ex.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
          .write.mode("overwrite").format("noop").save()
      }
      time(s"32 hash proj + 32 min aggs r$r") {
        val proj = ex.select(
          (col("doc_id") +: (0 until 32).map(i => xxhash64(col("_s"), lit(i)).as(s"x$i"))): _*)
        val aggs = (0 until 32).map(i => min(col(s"x$i")).as(s"h$i"))
        proj.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
          .write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
