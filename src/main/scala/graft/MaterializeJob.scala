package graft

import org.apache.spark.sql.SparkSession

import graft.core.GraftSession
import graft.features.TranscriptFeatures
import graft.materialize.Materializer

/** spark-submit entry point for resumable feature materialization
  * (north_rule: "materialization runs as a resumable spark-submit batch
  * job with per-partition checkpoint manifests, lineage records, and
  * row-count/latency metrics emitted per feature view").
  *
  * Usage (cluster):
  *   spark-submit --class graft.MaterializeJob app.jar \
  *     <input-transcripts-parquet> <output-dir> [narrow|full]
  *
  * Re-running the same command after a failure resumes: buckets with a
  * complete manifest for the same plan hash are skipped. Metrics and
  * lineage land under "_manifests/" and "_lineage.json" in the output.
  *
  * Local smoke (no real cluster in the sandbox): the same main runs
  * under `sbt runMain` with a local master from SPARK_GRAFT_CPUS.
  */
object MaterializeJob {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: MaterializeJob <input-parquet> <out-dir> [narrow|full]")
    val Array(input, outDir) = args.take(2)
    val mode = args.lift(2).getOrElse("narrow")

    // under spark-submit the master/deploy config comes from the submit
    // command; builder() only sets engine-level confs
    val spark = sys.env.get("SPARK_GRAFT_CPUS") match {
      case Some(c) => GraftSession.local(c.toInt, "graft-materialize")
      case None    => GraftSession.builder("graft-materialize").getOrCreate()
    }
    run(spark, input, outDir, mode)
    spark.stop()
  }

  def run(spark: SparkSession, input: String, outDir: String, mode: String): Unit = {
    val turns = spark.read.parquet(input)
    val feats = mode match {
      case "full" => TranscriptFeatures.cumulativeTurnFeatures(turns)
      case _      => TranscriptFeatures.turnFeaturesNarrow(turns)
    }
    val report = Materializer.materialize(spark, feats, "ts", outDir,
      lineage = Map(
        "input" -> input,
        "mode" -> mode,
        "app_id" -> spark.sparkContext.applicationId))
    println(
      s"""{"job":"materialize","out":"$outDir","spec_hash":"${report.specHash}",""" +
      s""""buckets":${report.buckets.size},"computed":${report.completed},""" +
      s""""resumed":${report.skipped},"rows":${report.totalRows},""" +
      s""""wall_ms":${report.wallMs}}""")
  }
}
