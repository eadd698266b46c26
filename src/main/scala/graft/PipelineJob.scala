package graft

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
  * usage: runMain graft.PipelineJob <docs.parquet> <outDir> [stageDir] [pairdrop|components]
  */
object PipelineJob {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: PipelineJob <docs.parquet> <outDir> [stageDir] [pairdrop|components]")
    val (inPath, outDir) = (args(0), args(1))
    val stageDir = args.lift(2).orElse(Some(s"$outDir/_stage"))
    val canon = args.lift(3).getOrElse("pairdrop") match {
      case "components" => PretrainPipeline.Canonicalize.Components
      case _            => PretrainPipeline.Canonicalize.PairDrop
    }

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val spark = GraftSession.local(cpus, "graft-pipeline")

    val t0 = System.nanoTime()
    val docs = spark.read.parquet(inPath)
    val inDocs = docs.count()

    val cleaned = PretrainPipeline.clean(docs, "text", "doc_id",
      cfg = PretrainPipeline.Config(canonicalize = canon),
      stageDir = stageDir)
    cleaned.write.mode("overwrite").parquet(s"$outDir/clean")

    val afterExact = spark.read.parquet(s"${stageDir.get}/exact_dedup").count()
    val out = spark.read.parquet(s"$outDir/clean")
    val outDocs = out.count()
    val stats = out.agg(
      round(avg(col("quality")), 6).as("avg_quality"),
      countDistinct(col("lang_pred")).as("n_langs")).collect().head
    val wallMs = (System.nanoTime() - t0) / 1000000L

    val docsPerSec = inDocs * 1000.0 / wallMs
    println(
      s"""{"job":"pipeline_clean","in_docs":$inDocs,""" +
      s""""after_exact_dedup":$afterExact,"out_docs":$outDocs,""" +
      s""""dropped_exact":${inDocs - afterExact},""" +
      s""""dropped_neardup_or_filtered":${afterExact - outDocs},""" +
      s""""avg_quality":${stats.get(0)},"n_langs":${stats.getLong(1)},""" +
      s""""out":"$outDir/clean","wall_ms":$wallMs,""" +
      s""""cpus":$cpus,"docs_per_sec":${f"$docsPerSec%.0f"}}""")
    spark.stop()
  }
}
