package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.pipeline.PretrainPipeline

/** spark-submit entry for the pretraining-corpus cleaning pipeline
  * (the operable form of [[graft.pipeline.PretrainPipeline.clean]]):
  * reads a documents table, runs exact dedup → minhash near-dup drop →
  * language filter → quality filter with staged intermediate
  * materialization, writes the surviving corpus, and prints ONE JSON
  * line with per-stage counts and wall-clock — the lineage/metrics
  * shape MaterializeJob uses for feature backfills.
  *
  * Metrics cost exactly what they must: the input count rides the
  * staging write via `Dataset.observe` (a CollectMetrics accumulator —
  * at 100 TB a separate `count()` would be a second full corpus scan),
  * the stage count is a zero-column footer scan of the staged parquet,
  * and the output stats are ONE aggregate pass over the (smaller)
  * cleaned corpus.
  *
  * With `resume`, a completed staged exact-dedup from a killed earlier
  * run is reused (manifest-gated, see [[PretrainPipeline.clean]]) — the
  * job restarts past its heaviest shuffle. Resume runs fall back to a
  * plain input count (the staging scan the observation would ride is
  * skipped) and are not throughput records.
  *
  * usage: runMain graft.PipelineJob <docs.parquet> <outDir> [stageDir] [pairdrop|components] [resume]
  */
object PipelineJob {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: PipelineJob <docs.parquet> <outDir> [stageDir] [pairdrop|components] [resume]")
    val (inPath, outDir) = (args(0), args(1))
    val stageDir = args.lift(2).orElse(Some(s"$outDir/_stage"))
    val canon = args.lift(3).getOrElse("pairdrop") match {
      case "components" => PretrainPipeline.Canonicalize.Components
      case _            => PretrainPipeline.Canonicalize.PairDrop
    }
    val resume = args.lift(4).contains("resume")

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val spark = GraftSession.local(cpus, "graft-pipeline")

    val t0 = System.nanoTime()
    val obs = Observation("pipeline_input")
    val docs = spark.read.parquet(inPath)
      .observe(obs, count(lit(1)).as("rows"))

    val (cleaned, stageReused) = PretrainPipeline.cleanDetailed(docs, "text", "doc_id",
      cfg = PretrainPipeline.Config(canonicalize = canon),
      stageDir = stageDir, resume = resume)
    cleaned.write.mode("overwrite").parquet(s"$outDir/clean")

    // when the staging write ran (fresh or invalidated manifest) the
    // observation rode that scan for free — even under resume; only a
    // genuine manifest reuse skipped the scan and must pay for the count
    val inDocs =
      if (stageReused) docs.count()
      else obs.get("rows").asInstanceOf[Long]
    val afterExact = spark.read.parquet(s"${stageDir.get}/exact_dedup").count()
    val stats = spark.read.parquet(s"$outDir/clean").agg(
      count(lit(1)).as("out_docs"),
      round(avg(col("quality")), 6).as("avg_quality"),
      countDistinct(col("lang_pred")).as("n_langs")).collect().head
    val outDocs = stats.getLong(0)
    val wallMs = (System.nanoTime() - t0) / 1000000L

    val docsPerSec = inDocs * 1000.0 / wallMs
    println(
      s"""{"job":"pipeline_clean","in_docs":$inDocs,""" +
      s""""after_exact_dedup":$afterExact,"out_docs":$outDocs,""" +
      s""""dropped_exact":${inDocs - afterExact},""" +
      s""""dropped_neardup_or_filtered":${afterExact - outDocs},""" +
      s""""avg_quality":${stats.get(1)},"n_langs":${stats.getLong(2)},""" +
      s""""out":"$outDir/clean","wall_ms":$wallMs,""" +
      s""""cpus":$cpus,"resume":$resume,"stage_reused":$stageReused,""" +
      s""""docs_per_sec":${f"$docsPerSec%.0f"}}""")
    spark.stop()
  }
}
