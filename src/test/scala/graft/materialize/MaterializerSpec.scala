package graft.materialize

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.datagen.TranscriptGen
import graft.features.TranscriptFeatures

class MaterializerSpec extends SparkTestBase {
  import spark.implicits._

  private def freshOut(): String =
    java.nio.file.Files.createTempDirectory("graft-mat").toString + "/out"

  private lazy val feats = {
    val turns = TranscriptGen.turns(spark, nConvs = 40, avgTurns = 10, seed = 5L).toDF()
      // spread conversations over ~8 distinct days so bucketing is exercised
      .withColumn("ts",
        col("ts") + expr("make_interval(0, 0, 0, pmod(abs(hash(conv_id)), 8), 0, 0, 0)"))
    TranscriptFeatures.cumulativeTurnFeatures(turns)
  }

  test("full materialization writes per-bucket manifests + lineage and round-trips") {
    val out = freshOut()
    val report = Materializer.materialize(spark, feats, "ts", out,
      lineage = Map("input" -> "transcript-gen seed=5", "view" -> "cumulative"))
    assert(report.totalRows === feats.count())
    assert(report.skipped === 0)
    assert(report.buckets.nonEmpty)

    // manifests exist, one per bucket, marked complete with the spec hash
    val mdir = java.nio.file.Paths.get(out, "_manifests")
    val manifests = java.nio.file.Files.list(mdir).count()
    assert(manifests === report.buckets.size)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(out, "_lineage.json")))

    // output round-trips identically
    val back = Materializer.read(spark, out)
    assert(back.count() === report.totalRows)
    assert(back.columns.toSet === feats.columns.toSet)
  }

  test("resume: crash mid-backfill, rerun skips completed buckets, output identical") {
    val out = freshOut()
    intercept[RuntimeException] {
      Materializer.materialize(spark, feats, "ts", out, failAfter = Some(2))
    }
    val afterCrash = java.nio.file.Files
      .list(java.nio.file.Paths.get(out, "_manifests")).count()
    assert(afterCrash === 2)

    val report = Materializer.materialize(spark, feats, "ts", out)
    assert(report.skipped === 2)
    assert(report.completed === report.buckets.size - 2)
    assert(report.totalRows === feats.count())

    // identical to an un-interrupted run
    val clean = freshOut()
    Materializer.materialize(spark, feats, "ts", clean)
    val a = Materializer.read(spark, out).orderBy("conv_id", "turn_idx")
      .collect().map(_.toString).toSeq
    val b = Materializer.read(spark, clean).orderBy("conv_id", "turn_idx")
      .collect().map(_.toString).toSeq
    assert(a === b)
  }

  test("changed plan (new spec hash) recomputes instead of skipping") {
    val out = freshOut()
    Materializer.materialize(spark, feats, "ts", out)
    val changed = feats.withColumn("extra", lit(1))
    val report = Materializer.materialize(spark, changed, "ts", out)
    assert(report.skipped === 0)
    assert(report.completed === report.buckets.size)
  }
}
