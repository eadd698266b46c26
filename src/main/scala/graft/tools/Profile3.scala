package graft.tools

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.dedup.Dedup

/** Stage-level timing of the minhash pipeline (dev tool). */
object Profile3 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "profile3")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text"))
    val toks = split(col("text"), " ", -1)
    val mutated = docs.select(
      (col("doc_id") + 100000L).as("doc_id"),
      concat_ws(" ", slice(toks, lit(1), greatest(size(toks) - 2, lit(1)))).as("text"))
    val all = docs.unionByName(mutated)
    println(s"[profile] docs: ${all.count()}")

    time("shingles only")(
      all.select(Dedup.shingles(col("text"), 3).as("s"))
        .write.mode("overwrite").format("noop").save())

    val sigs = Dedup.minhashSignatures(all, "text", "doc_id", 32, 3)
    time("signatures")(sigs.write.mode("overwrite").format("noop").save())

    time("sig agg only")(
      all.select(col("doc_id"), explode(Dedup.shingles(col("text"), 3)).as("_s"))
        .groupBy("doc_id")
        .agg((0 until 32).map(i => min(xxhash64(col("_s"), lit(i))).as(s"h$i")).head,
          (0 until 32).map(i => min(xxhash64(col("_s"), lit(i))).as(s"h$i")).tail: _*)
        .write.mode("overwrite").format("noop").save())

    time("full lsh")(
      Dedup.minhashLsh(all, "text", "doc_id", 32, 8, 3, 0.8)
        .write.mode("overwrite").format("noop").save())

    val sh = Dedup.simhashDF(all, "text", "doc_id")
    time("simhashDF only")(sh.write.mode("overwrite").format("noop").save())
    time("simhash pairs")(
      Dedup.simhashPairs(all, "text", "doc_id", 6)
        .write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
