package graft.dedup

import org.apache.spark.sql.functions._

import graft.core.GraftSession

/** Dev probe: stage-by-stage wall clock of the minhash-LSH pipeline at a
  * chosen SF (optimization-round instrumentation; not part of the driver
  * contract). */
object ProbeParts {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "probe-parts")

    def timed(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        mk.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      val a = once(); val b = once()
      println(f"PROBE $tag%-28s min=${math.min(a, b)}%6.3f  ($a%.3f, $b%.3f)")
    }

    def corpus = {
      val base = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val toks = split(col("text"), " ", -1)
      val mutated = base.select(
        (col("doc_id") + 100000L).as("doc_id"),
        concat_ws(" ", slice(toks, lit(1), greatest(size(toks) - 2, lit(1)))).as("text"))
      base.unionByName(mutated)
    }

    timed("corpus_scan")(corpus)
    timed("shingles_only")(corpus.select(col("doc_id"),
      Dedup.shingles(col("text"), 3).as("sh")))
    timed("signatures")(Dedup.minhashSignatures(corpus, "text", "doc_id", 32, 3))
    timed("band_rows")(Dedup.bandRows(
      Dedup.minhashSignatures(corpus, "text", "doc_id", 32, 3), 32, 16))
    timed("full_lsh")(Dedup.minhashLsh(corpus, "text", "doc_id",
      numHashes = 32, bands = 16, threshold = 0.8))
    spark.stop()
  }
}
