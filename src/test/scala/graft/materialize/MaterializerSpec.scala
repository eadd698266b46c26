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

  test("orphan bucket dirs without a complete manifest are purged; manifested ones kept") {
    val out = freshOut()
    Materializer.materialize(spark, feats, "ts", out)

    // simulate a crashed run's leftovers: a data dir for a date that no
    // longer exists in the source and has NO manifest
    val orphan = java.nio.file.Paths.get(out, "bucket=1999-12-31")
    java.nio.file.Files.createDirectories(orphan)
    java.nio.file.Files.write(orphan.resolve("junk.parquet"), Array[Byte](1, 2, 3))

    val report = Materializer.materialize(spark, feats, "ts", out)
    // all real buckets resumed untouched; the orphan dir is gone — its
    // rows would otherwise be visible to every reader of outDir forever
    assert(report.completed === 0 && report.skipped === report.buckets.size)
    assert(!java.nio.file.Files.exists(orphan),
      "uncommitted orphan bucket dir must be purged")
    assert(Materializer.read(spark, out).count() === feats.count())
  }

  test("late-arriving input data re-materializes only the affected bucket") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-late").toString
    val srcDir = s"$tmp/src.parquet"
    def row(id: Long, ts: String) = (id, java.sql.Timestamp.valueOf(ts), s"v$id")
    Seq(
      row(1, "2024-05-01 08:00:00"), row(2, "2024-05-01 18:00:00"),
      row(3, "2024-05-02 09:00:00"), row(4, "2024-05-02 17:00:00"),
      row(5, "2024-05-03 10:00:00"), row(6, "2024-05-03 16:00:00"))
      .toDF("id", "ts", "v").write.mode("overwrite").parquet(srcDir)
    val out = s"$tmp/out"
    val r1 = Materializer.materialize(spark, spark.read.parquet(srcDir), "ts", out)
    assert(r1.completed === 3 && r1.skipped === 0)

    // the normal lake case: yesterday's partition is back-filled with
    // late events AFTER its bucket completed
    Seq(row(7, "2024-05-02 23:59:00")).toDF("id", "ts", "v")
      .write.mode("append").parquet(srcDir)

    // FRESH read (cross-process shape) — resume must come from manifests
    val r2 = Materializer.materialize(spark, spark.read.parquet(srcDir), "ts", out)
    assert(r2.skipped === 2, "unchanged buckets must still skip")
    assert(r2.completed === 1, "the back-filled bucket must recompute")
    assert(r2.buckets.find(_.bucket == "2024-05-02").exists(b => !b.skipped && b.rows === 3L))
    // the sink serves the late row
    val got = Materializer.read(spark, out)
    assert(got.count() === 7L)
    assert(got.filter($"id" === 7L).count() === 1L)

    // a third run with nothing new skips everything
    val r3 = Materializer.materialize(spark, spark.read.parquet(srcDir), "ts", out)
    assert(r3.skipped === 3 && r3.completed === 0)
  }

  test("refuses to purge a sink holding foreign partitioned data (no _manifests)") {
    val out = freshOut()
    val foreign = java.nio.file.Paths.get(out, "bucket=2020-01-01")
    java.nio.file.Files.createDirectories(foreign)
    java.nio.file.Files.write(foreign.resolve("junk.parquet"), Array[Byte](1, 2, 3))
    val ex = intercept[IllegalStateException] {
      Materializer.materialize(spark, feats, "ts", out)
    }
    assert(ex.getMessage.contains("refusing to manage"))
    assert(java.nio.file.Files.exists(foreign.resolve("junk.parquet")),
      "foreign data must be left untouched")

    // a RETRY must refuse again, not purge: the refused call must not
    // have left a _manifests/ marker behind that would make the sink
    // look managed on the second attempt (r5 review finding #1)
    val ex2 = intercept[IllegalStateException] {
      Materializer.materialize(spark, feats, "ts", out)
    }
    assert(ex2.getMessage.contains("refusing to manage"))
    assert(java.nio.file.Files.exists(foreign.resolve("junk.parquet")),
      "foreign data must survive a retry of the refused call")
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

  test("resume survives manifests with re-ordered keys (parsed, not substring-matched)") {
    val out = freshOut()
    val first = Materializer.materialize(spark, feats, "ts", out)

    // rewrite every manifest with fields in REVERSE order and different
    // whitespace — a resume decision must depend on JSON content only
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val mdir = java.nio.file.Paths.get(out, "_manifests")
    java.nio.file.Files.list(mdir).forEach { p =>
      val node = mapper.readTree(java.nio.file.Files.readAllBytes(p))
      val reordered = mapper.createObjectNode()
      val names = new scala.collection.mutable.ArrayBuffer[String]()
      node.fieldNames().forEachRemaining(n => names += n)
      names.sorted.reverse.foreach(n =>
        reordered.set[com.fasterxml.jackson.databind.JsonNode](n, node.get(n)))
      java.nio.file.Files.write(p, reordered.toString.getBytes("UTF-8"))
    }

    val resumed = Materializer.materialize(spark, feats, "ts", out)
    assert(resumed.skipped === first.buckets.size)
    assert(resumed.completed === 0)
    assert(resumed.totalRows === first.totalRows) // rows read back from manifests
  }

  test("changed plan (new spec hash) recomputes instead of skipping") {
    val out = freshOut()
    Materializer.materialize(spark, feats, "ts", out)
    val changed = feats.withColumn("extra", lit(1))
    val report = Materializer.materialize(spark, changed, "ts", out)
    assert(report.skipped === 0)
    assert(report.completed === report.buckets.size)
  }

  test("null event times land in the explicit __null__ bucket, not lost") {
    val out = freshOut()
    val df = Seq(
      (1L, Some(java.sql.Timestamp.valueOf("2024-05-01 10:00:00")), "a"),
      (2L, None, "b"),
      (3L, None, "c")).toDF("id", "ts", "v")
    val report = Materializer.materialize(spark, df, "ts", out)
    assert(report.totalRows === 3L)
    val nullBucket = report.buckets.find(_.bucket == Materializer.NullBucket)
    assert(nullBucket.map(_.rows) === Some(2L))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(out, "_manifests", "__null__.json")))
    // round-trip keeps all three rows
    assert(Materializer.read(spark, out).count() === 3L)
  }

  test("readRange prunes bucket partitions instead of scanning the sink") {
    val out = freshOut()
    Materializer.materialize(spark, feats, "ts", out)
    val allDays = Materializer.read(spark, out)
      .select(to_date($"ts").cast("string")).distinct()
      .as[String].collect().sorted
    assert(allDays.length >= 5, "test needs a multi-day backfill")
    val (from, to) = (allDays(1), allDays(2))

    val ranged = Materializer.readRange(spark, out, from, to)
    ranged.collect()
    // correct rows: exactly the two days
    val expected = Materializer.read(spark, out)
      .filter(to_date($"ts").cast("string").between(from, to)).count()
    assert(ranged.count() === expected)
    assert(expected > 0)

    // and the plan prunes: the bucket predicate is a PartitionFilter on
    // the scan, not a post-scan Filter
    val plan = ranged.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("bucket"),
      s"bucket range did not become a partition filter:\n$plan")
  }

  test("a multi-bucket backfill scans the source once, not once per bucket") {
    // parquet-backed source so scans of it are observable in plans
    val tmp = java.nio.file.Files.createTempDirectory("graft-scan").toString
    val srcDir = s"$tmp/graft_scan_probe_src.parquet"
    feats.write.mode("overwrite").parquet(srcDir)
    val src = spark.read.parquet(srcDir)

    val scans = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        if (qe.executedPlan.toString.contains("graft_scan_probe_src"))
          scans.incrementAndGet()
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val report = Materializer.materialize(spark, src, "ts", s"$tmp/out")
      assert(report.buckets.size >= 3, "test needs a multi-bucket backfill")
      // listener events are async; give the bus a moment to drain
      Thread.sleep(3000)
      // exactly 2 executions touch the source: bucket enumeration
      // (ts column only) + the single partitionBy write. The old
      // per-bucket loop would show 1 + nBuckets source scans.
      assert(scans.get() <= 2,
        s"source scanned ${scans.get()} times for ${report.buckets.size} buckets")
    } finally spark.listenerManager.unregister(listener)
  }
}
