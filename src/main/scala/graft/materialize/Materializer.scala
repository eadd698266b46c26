package graft.materialize

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Resumable, checkpointed batch materialization (north_rule: "resumable
  * from checkpoint with per-partition lineage + metrics").
  *
  * The reference outsources materialization to Feast entirely; this is
  * engine work the replacement must own (SURVEY.md §4 "Checkpoint/
  * resume"). Design:
  *
  *  - The backfill range is cut into event-time buckets (daily by
  *    default; a null event time lands in the explicit `__null__` bucket
  *    rather than being silently dropped). The bucket is the resume
  *    unit: each gets `out/bucket=<id>/` data plus an atomic manifest
  *    `out/_manifests/<id>.json` with row count, min/max ts, spec hash,
  *    wall-clock and input lineage.
  *  - On resume, buckets with a complete manifest for the SAME spec hash
  *    AND the same per-bucket INPUT FINGERPRINT are skipped without
  *    touching data. A changed plan (different spec hash) invalidates
  *    old manifests per bucket; so does late-arriving data (r4 VERDICT
  *    #1): the enumeration scan records (rows, min ts, max ts) of the
  *    input per bucket, and a completed bucket whose input fingerprint
  *    no longer matches its manifest is re-materialized — a lake source
  *    that back-fills yesterday's partition (late events, upstream
  *    restatements) updates the sink on the next run instead of being
  *    served stale forever. The fingerprint costs nothing extra: it
  *    rides the same ts-column-only enumeration job. Limits: a
  *    same-count in-place UPDATE of non-ts columns is invisible to a
  *    ts-only probe (bump the spec hash or delete the manifest to force
  *    a rewrite), and a bucket whose input rows vanished ENTIRELY is no
  *    longer enumerated, so its committed data stays (incremental
  *    windows legitimately leave old buckets behind — see read()).
  *  - ALL incomplete buckets are written by ONE distributed job
  *    (`partitionBy` + dynamic partition overwrite), so a 90-day
  *    backfill over an unpartitioned lake source scans the input once —
  *    not once per day. Manifests are then derived from the committed
  *    output by ONE grouped stats job over the new bucket dirs (ts
  *    column only, bucket-partition pruned) — not one job per bucket,
  *    which at a 5-year backfill's ~1800 buckets would be ~1800
  *    sequential driver round-trips. Manifest commits themselves are
  *    per-bucket driver-side file IO (the resume unit).
  *
  * At cluster scale the single write is a distributed job whose shuffle-
  * free dynamic-partition commit replaces exactly the written `bucket=`
  * dirs; the driver-side loop is only manifest/checkpoint orchestration.
  * Output is partitioned by the bucket id, so downstream as-of retrieval
  * over a date range prunes too.
  */
object Materializer {

  case class BucketResult(
      bucket: String,
      rows: Long,
      minTs: Option[String],
      maxTs: Option[String],
      wallMs: Long,
      skipped: Boolean)

  case class Report(
      outDir: String,
      specHash: String,
      buckets: Seq[BucketResult],
      totalRows: Long,
      wallMs: Long) {
    def completed: Int = buckets.count(!_.skipped)
    def skipped: Int = buckets.count(_.skipped)
  }

  def specHash(df: DataFrame): String = {
    val plan = df.queryExecution.logical.canonicalized.toString
    MessageDigest.getInstance("SHA-256")
      .digest(plan.getBytes(StandardCharsets.UTF_8))
      .take(8).map("%02x".format(_)).mkString
  }

  /** Bucket id for rows whose event time is null — kept explicit so the
    * rows are neither lost nor invisibly matched against a null literal. */
  val NullBucket = "__null__"

  /** Materialize `df` to `outDir`, bucketed by `date(tsCol)`, resuming
    * past completed buckets. All incomplete buckets are written in ONE
    * source scan; manifests commit per bucket afterwards (the resume
    * unit).
    *
    * `outDir` is a MANAGED, SINGLE-WRITER sink: the materializer owns
    * every `bucket=` dir under it and purges any that lack a complete
    * manifest (crash leftovers). Pointing it at a directory holding
    * pre-existing partitioned data NOT written by this materializer is
    * refused loudly (the purge would destroy it), and two concurrent
    * materialize() calls against one sink are not supported (each would
    * purge the other's in-flight dirs).
    *
    * @param failAfter test hook: abort after N bucket manifests have
    *                  committed (simulates a crash between the data
    *                  commit and checkpoint bookkeeping)
    */
  def materialize(
      spark: SparkSession,
      df: DataFrame,
      tsCol: String,
      outDir: String,
      lineage: Map[String, String] = Map.empty,
      failAfter: Option[Int] = None): Report = {

    val t0 = System.nanoTime()
    val hash = specHash(df)
    val manifestDir = Paths.get(outDir, "_manifests")
    // a sink is "managed" iff its manifest dir already exists — recorded
    // BEFORE creating it, so the purge below can distinguish our own
    // crash leftovers from foreign data (r4 ADVICE #1)
    val sinkWasManaged = Files.exists(manifestDir)
    // The foreign-data refusal must run BEFORE _manifests/ is created:
    // creating it first would make a RETRY of the refused call see a
    // "managed" sink and purge the very data the first call refused to
    // touch (caught in the r5 review).
    if (!sinkWasManaged) {
      val spark0 = df.sparkSession
      val base = new org.apache.hadoop.fs.Path(outDir)
      val fs = base.getFileSystem(spark0.sparkContext.hadoopConfiguration)
      if (fs.exists(base)) {
        val foreign = fs.listStatus(base)
          .find(st => st.isDirectory && st.getPath.getName.startsWith("bucket="))
        foreign.foreach { st =>
          throw new IllegalStateException(
            s"outDir '$outDir' contains partition dir '${st.getPath.getName}' " +
              "but no prior _manifests/ — refusing to manage (and purge " +
              "within) a sink not written by Materializer; choose an " +
              "empty or Materializer-owned directory")
        }
      }
    }
    Files.createDirectories(manifestDir)

    val withBucket = df.withColumn(
      "_bucket", coalesce(to_date(col(tsCol)).cast("string"), lit(NullBucket)))
    // one tiny job enumerates buckets AND their input fingerprints
    // (rows, min ts, max ts) — still scans only the ts column
    val inputStats: Map[String, (Long, Option[String], Option[String])] =
      withBucket
        .groupBy(col("_bucket"))
        .agg(count(lit(1)).as("_n"),
          min(col(tsCol)).cast("string").as("_mn"),
          max(col(tsCol)).cast("string").as("_mx"))
        .collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), Option(r.getString(2)), Option(r.getString(3))))
        .toMap
    val buckets = inputStats.keys.toSeq.sorted

    val incomplete = buckets
      .filterNot(b => isCurrent(manifestDir.resolve(s"$b.json"), hash,
        inputStats(b))).toSet

    // Delete every bucket= data dir that has NO complete manifest before
    // the write — not just dirs of currently-enumerated incomplete
    // buckets. Dynamic partition overwrite only replaces buckets the
    // current write produces rows for, so an uncommitted dir from a
    // crashed run would otherwise survive in two ways: (a) its bucket is
    // enumerated but the new write yields no rows for it → stale stats
    // feed the grouped job and a 'complete' manifest commits stale bytes
    // (r3 ADVICE #1); (b) its date vanished from the source entirely →
    // the orphan rows stay visible to every outDir reader forever.
    // Complete-manifested dirs are never touched (incremental backfills
    // legitimately keep historical buckets outside the current window).
    // After this, "dir exists without manifest" ⇔ "the current write
    // produced rows for it".
    locally {
      val fs = new org.apache.hadoop.fs.Path(outDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val base = new org.apache.hadoop.fs.Path(outDir)
      if (fs.exists(base)) {
        fs.listStatus(base).foreach { st =>
          val name = st.getPath.getName
          if (st.isDirectory && name.startsWith("bucket=")) {
            val b = name.stripPrefix("bucket=")
            val committed = parseManifest(manifestDir.resolve(s"$b.json"))
              .exists(_.path("status").asText() == "complete")
            if (!committed) {
              // an unmanifested bucket dir in a sink WE have written
              // before is a crash leftover — purge it; in a sink with no
              // prior manifest dir it is someone else's data — refuse
              // rather than destroy (managed single-writer contract)
              if (!sinkWasManaged)
                throw new IllegalStateException(
                  s"outDir '$outDir' contains partition dir '$name' but no " +
                    "prior _manifests/ — refusing to manage (and purge " +
                    "within) a sink not written by Materializer; choose an " +
                    "empty or Materializer-owned directory")
              fs.delete(st.getPath, true)
            }
          }
        }
      }
    }

    // ONE distributed job writes every incomplete bucket; dynamic
    // partition overwrite replaces exactly the written bucket= dirs.
    // The source is scanned once per backfill, not once per bucket.
    val writeWallMs = if (incomplete.isEmpty) 0L else {
      val w0 = System.nanoTime()
      withBucket
        .filter(col("_bucket").isin(incomplete.toSeq: _*))
        .withColumnRenamed("_bucket", "bucket")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(outDir)
      (System.nanoTime() - w0) / 1000000L
    }

    // Commit stats for ALL freshly-written buckets in ONE grouped job
    // over the committed output (bucket-dir partition pruning keeps the
    // read to the new dirs, ts column only) — a per-bucket stats job
    // would be N sequential driver round-trips, fatal at a 5-year
    // backfill's ~1800 buckets. Manifests then commit per bucket (the
    // checkpoint/resume unit) as pure driver-side file IO.
    val st0 = System.nanoTime()
    // read only bucket dirs the write actually produced (stale dirs were
    // deleted above): a bucket that yielded no rows has no dir, stays out
    // of statsByBucket, and hits the loud per-bucket refusal below rather
    // than failing the whole stats job on a missing path
    val writtenDirs =
      if (incomplete.isEmpty) Nil
      else {
        val fs = new org.apache.hadoop.fs.Path(outDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        incomplete.toSeq.sorted.map(b => s"$outDir/bucket=$b")
          .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p)))
      }
    val statsByBucket: Map[String, (Long, Option[String], Option[String])] =
      if (writtenDirs.isEmpty) Map.empty
      else spark.read
        // list/read ONLY the freshly written bucket dirs (an incremental
        // run against a years-deep sink must not relist — or infer its
        // schema from — every historical partition); basePath keeps the
        // bucket partition column in scope
        .option("basePath", outDir)
        .parquet(writtenDirs: _*)
        .withColumn("_b", col("bucket").cast("string"))
        .groupBy(col("_b"))
        .agg(count(lit(1)).as("rows"),
          min(col(tsCol)).cast("string").as("min_ts"),
          max(col(tsCol)).cast("string").as("max_ts"))
        .collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), Option(r.getString(2)), Option(r.getString(3))))
        .toMap
    val statsWallMs = (System.nanoTime() - st0) / 1000000L
    // per-bucket share of the single grouped stats job (manifest wall_ms)
    val wallShare = if (incomplete.isEmpty) 0L else statsWallMs / incomplete.size

    var done = 0
    val results = buckets.map { bucket =>
      val manifestPath = manifestDir.resolve(s"$bucket.json")
      if (!incomplete.contains(bucket)) {
        BucketResult(bucket, readRows(manifestPath), None, None, 0L, skipped = true)
      } else {
        failAfter.foreach { n =>
          if (done >= n) throw new RuntimeException(
            s"injected failure after $n buckets (test hook)")
        }
        // fail loudly if the write produced no data for an enumerated
        // bucket (e.g. source changed between enumeration and write) —
        // a silent rows=0 'complete' manifest would permanently skip a
        // bucket that was never materialized
        val (rows, minTs, maxTs) = statsByBucket.getOrElse(bucket,
          throw new IllegalStateException(
            s"bucket '$bucket' was enumerated as incomplete but the write " +
              "produced no rows for it; refusing to commit a manifest " +
              "(source changed mid-backfill?)"))
        // refuse a committed-data/input divergence: the written rows must
        // match what the enumeration fingerprinted (a source mutating
        // MID-backfill between the two jobs would otherwise commit a
        // manifest whose fingerprint never matches its data)
        val (inRows, inMin, inMax) = inputStats(bucket)
        if (rows != inRows) throw new IllegalStateException(
          s"bucket '$bucket' wrote $rows rows but the input scan counted " +
            s"$inRows; refusing to commit (source changed mid-backfill?)")
        writeManifest(manifestPath, Map(
          "bucket" -> bucket,
          "status" -> "complete",
          "spec_hash" -> hash,
          "rows" -> rows,
          "min_ts" -> minTs.orNull,
          "max_ts" -> maxTs.orNull,
          // input fingerprint (from the enumeration scan of the SOURCE):
          // compared on resume so late-arriving data re-materializes
          "input_rows" -> inRows,
          "input_min_ts" -> inMin.orNull,
          "input_max_ts" -> inMax.orNull,
          "wall_ms" -> wallShare) ++ lineage.map { case (k, v) => s"lineage_$k" -> v })
        done += 1
        BucketResult(bucket, rows, minTs, maxTs, wallShare, skipped = false)
      }
    }

    val report = Report(outDir, hash, results, results.map(_.rows).sum,
      (System.nanoTime() - t0) / 1000000L)
    writeManifest(Paths.get(outDir, "_lineage.json"), Map(
      "spec_hash" -> hash,
      "buckets_total" -> buckets.size,
      "buckets_computed" -> report.completed,
      "buckets_resumed" -> report.skipped,
      "write_wall_ms" -> writeWallMs,
      "total_rows" -> report.totalRows,
      "wall_ms" -> report.wallMs) ++ lineage)
    report
  }

  /** Read back a materialized output (all buckets); the `bucket=`
    * partition column is an implementation detail and is dropped.
    *
    * Materialization is INCREMENTAL by event-time range: buckets
    * written by earlier runs (e.g. an earlier backfill window) are
    * preserved and included here — a bucket is only rewritten when the
    * current input covers it and its manifest is missing or from a
    * different spec hash. */
  def read(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir).drop("bucket")

  /** Read a date range of a materialized output with PARTITION PRUNING
    * on the bucket directories — a 3-day feature read over a 5-year
    * backfill touches 3 bucket dirs, not the whole sink. Bounds are
    * inclusive `yyyy-MM-dd` strings; the `__null__` bucket never
    * matches a range. The filter compares against the partition column
    * in its inferred type (DATE when every bucket is a date, STRING
    * when a `__null__` bucket forced string inference), so it stays a
    * partition filter rather than degrading to a post-scan predicate.
    */
  def readRange(
      spark: SparkSession,
      outDir: String,
      fromDate: String,
      toDate: String): DataFrame = {
    val df = spark.read.parquet(outDir)
    val bucketType = df.schema("bucket").dataType
    val (lo, hi) = bucketType match {
      case org.apache.spark.sql.types.DateType =>
        (lit(fromDate).cast("date"), lit(toDate).cast("date"))
      case _ => (lit(fromDate), lit(toDate))
    }
    df.filter(col("bucket") >= lo && col("bucket") <= hi).drop("bucket")
  }

  /** Write `df` as a bucketed + sorted table on `keyCols` — the
    * co-located-join layout: two tables bucketed the same way
    * equi-join with ZERO exchange (each bucket pair sort-merges
    * directly), so a feature table that is joined on its entity key by
    * every downstream consumer pays its shuffle once at write time
    * instead of once per query. At 100 TB this converts the dominant
    * repeated cost of feature serving into a one-time layout decision.
    * Plan shape is gated by BucketedJoinSpec.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      keyCols: Seq[String],
      nBuckets: Int): Unit = {
    require(keyCols.nonEmpty && nBuckets > 0, "need key columns and buckets")
    df.write.mode("overwrite")
      .bucketBy(nBuckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  // ------------------------------------------------------------ manifests

  // Proper JSON parsing (Jackson is on Spark's classpath) rather than
  // substring matching — key order, whitespace, and future fields in a
  // manifest must not affect resume decisions.
  @transient private lazy val jsonMapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  private def parseManifest(
      path: java.nio.file.Path): Option[com.fasterxml.jackson.databind.JsonNode] =
    if (!Files.exists(path)) None
    else try Some(jsonMapper.readTree(Files.readAllBytes(path)))
    catch { case _: java.io.IOException => None } // corrupt manifest = incomplete

  private[graft] def isComplete(path: java.nio.file.Path, hash: String): Boolean =
    parseManifest(path).exists { m =>
      m.path("status").asText() == "complete" &&
        m.path("spec_hash").asText() == hash
    }

  /** Complete + same spec hash + same input fingerprint. A manifest
    * lacking fingerprint fields (written by an older engine version) is
    * treated as stale — correctness over resume speed. */
  private def isCurrent(
      path: java.nio.file.Path,
      hash: String,
      fp: (Long, Option[String], Option[String])): Boolean =
    parseManifest(path).exists { m =>
      def optText(field: String): Option[String] = {
        val n = m.path(field)
        if (n.isMissingNode || n.isNull) None else Some(n.asText())
      }
      m.path("status").asText() == "complete" &&
        m.path("spec_hash").asText() == hash &&
        m.path("input_rows").asLong(-1L) == fp._1 &&
        optText("input_min_ts") == fp._2 &&
        optText("input_max_ts") == fp._3
    }

  private def readRows(path: java.nio.file.Path): Long =
    parseManifest(path).map(_.path("rows").asLong(0L)).getOrElse(0L)

  private[graft] def writeManifest(path: java.nio.file.Path, fields: Map[String, Any]): Unit = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    val json = fields.toSeq.sortBy(_._1).map {
      case (k, v: Long)   => s""""${esc(k)}": $v"""
      case (k, v: Int)    => s""""${esc(k)}": $v"""
      case (k, null)      => s""""${esc(k)}": null"""
      case (k, v)         => s""""${esc(k)}": "${esc(String.valueOf(v))}""""
    }.mkString("{\n  ", ",\n  ", "\n}")
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, path, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }
}
