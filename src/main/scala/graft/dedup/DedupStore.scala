package graft.dedup

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Persisted incremental-dedup store — the daily-crawl-vs-historical-
  * corpus shape: dedup each new increment against everything already
  * accepted WITHOUT re-shuffling (or re-tokenizing) the historical
  * corpus per increment.
  *
  * The reference pipeline dedups a corpus in one batch; at 10^12-doc
  * scale the corpus is accumulated over months of crawls and the batch
  * shape is unusable — re-running LSH over all of history for each
  * daily increment re-pays the full-corpus shuffle every day. The store
  * persists exactly the DIGESTS dedup needs, as bucketed tables:
  *
  *  - `fingerprints` — (fingerprint, keep_id), bucketed+sorted by
  *    fingerprint: the exact-dedup membership set (~50 B/doc).
  *  - `signatures` — (_id, _sig: array<long>), bucketed by _id: MinHash
  *    signatures of every store doc (8·numHashes B/doc).
  *  - `buckets` — (_band, _bucket, _id), bucketed+sorted by
  *    (_band, _bucket): the LSH band index (12·bands B/doc).
  *
  * Scale design: the digest tables total a few hundred bytes/doc vs
  * multi-KB of text — ~5% of corpus bytes — and because they are
  * written as BUCKETED tables their probe joins need no store-side
  * exchange ever: Spark scans the store pre-partitioned and shuffles
  * only the increment (DedupStoreSpec gates zero store-side shuffle).
  * Per-increment cost is therefore one columnar scan of the digests
  * plus shuffles proportional to the INCREMENT, never to history.
  * Store text is never re-read: near-dup verification estimates
  * Jaccard from signature agreement (E[agreement] = J, σ² = J(1−J)/
  * numHashes) instead of re-deriving shingle sets — the standard
  * incremental tradeoff (exact verification would require persisting
  * shingle sets, which IS the corpus). The one-shot exact-verified
  * path remains [[Dedup.minhashLsh]].
  *
  * Catalog contract: bucketed joins resolve through the session
  * catalog, which in this engine is in-memory — [[build]] registers the
  * tables in the building session and [[attach]] re-registers them in a
  * fresh session from the on-disk manifest (tables are EXTERNAL: drops
  * and re-attaches never touch data files). Doc ids are longs and must
  * be unique across store + increments (same contract as
  * [[graft.similarity.IvfIndex]]).
  *
  * SINGLE-WRITER contract (same as [[graft.materialize.Materializer]]'s
  * managed-sink contract): one [[build]]/[[append]]/[[ingest]] writer
  * per store directory at a time. Concurrent appends would interleave
  * metastore inserts and, worse, each would probe a snapshot that
  * misses the other's in-flight admissions — both could accept the
  * same text. Readers ([[newDocs]]/[[nearDups]] in other sessions) are
  * safe concurrently; they observe the store as of their last
  * [[attach]]/refresh.
  */
object DedupStore {

  /** Store parameters, fixed at [[build]] time and persisted in the
    * manifest — probes always use the persisted values (a probe banded
    * differently than the build would silently miss every collision).
    *
    * `maxBucket` guards the build against degenerate LSH buckets
    * (boilerplate text): store buckets with more members are dropped —
    * their members are boilerplate the exact stage already collapses.
    * Appends don't re-check grown buckets (documented drift; rebuild
    * periodically if boilerplate accretes).
    *
    * `nearDup = false` builds an EXACT-ONLY store (fingerprints, no
    * signatures/band index): a third of the digest bytes and build
    * passes for pipelines that only gate on exact duplicates —
    * [[nearDups]] on such a store fails loudly. */
  case class Params(
      numHashes: Int = 32,
      bands: Int = 16,
      shingleWidth: Int = 3,
      nBuckets: Int = 16,
      maxBucket: Int = 128,
      nearDup: Boolean = true)

  /** Handle to an attached store: `dir` holds the data + manifest, the
    * three table names are registered in `spark`'s catalog. */
  case class Store(
      spark: SparkSession,
      dir: String,
      params: Params,
      fpTable: String,
      sigTable: String,
      bucketTable: String) {
    def fingerprints: DataFrame = spark.table(fpTable)
    def signatures: DataFrame = spark.table(sigTable)
    def buckets: DataFrame = spark.table(bucketTable)
  }

  private def tableName(dir: String, which: String): String =
    s"graft_ds_${dir.hashCode & 0x7fffffff}_$which"

  /** Bucketed write with a bounded file count: bucket id and
    * `HashPartitioning` both compute `murmur3(keys) pmod n`, so
    * repartitioning to exactly nBuckets on the bucket keys puts each
    * bucket wholly in one task — nBuckets files per write instead of
    * (tasks × buckets-per-task) small files. Write parallelism equals
    * nBuckets; size `Params.nBuckets` to the cluster (thousands at
    * 10^12 docs), not to the default 16. */
  private def bucketedWrite(
      df: DataFrame,
      dir: String,
      which: String,
      keyCols: Seq[String],
      nBuckets: Int,
      mode: String): Unit =
    df.repartition(nBuckets, keyCols.map(col): _*)
      .write.mode(mode)
      .bucketBy(nBuckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .option("path", s"$dir/$which")
      .format("parquet")
      .saveAsTable(tableName(dir, which))

  /** Build (or rebuild, overwriting) a store at `dir` from the corpus.
    * Signatures/buckets cover EVERY input row, not just exact-canonical
    * ones — near-dup probes must see all accepted content; run
    * [[Dedup.exact]] on the corpus first if it still carries exact
    * duplicates. One pass for fingerprints (hash-shuffle on the 128-bit
    * key), one scan-local signature pass (the native one-pass
    * [[graft.functions.MinHashSignature]] scalar), and one banding pass
    * over the signature files just written (never a second execution of
    * the signature plan); each table lands pre-partitioned in its
    * probe-join layout, so the build pays every probe's shuffle once. */
  def build(
      df: DataFrame,
      textCol: String,
      idCol: String,
      dir: String,
      params: Params = Params()): Store = {
    val spark = df.sparkSession
    val hp = new org.apache.hadoop.fs.Path(dir)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // rebuild only what a previous build created: a non-empty directory
    // without a store.json marker is FOREIGN data — refuse before any
    // destructive step (the Materializer foreign-data lesson: check
    // precedes marker creation, so a refused call leaves no trace and a
    // retry refuses again). An interrupted build is recognizable by its
    // status=building marker, written below before the table writes.
    if (fs.exists(hp)) {
      require(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/store.json")) ||
          fs.listStatus(hp).isEmpty,
        s"DedupStore.build: '$dir' exists, is non-empty, and has no " +
          "store.json marker — refusing to overwrite foreign data")
    }
    Seq("fingerprints", "signatures", "buckets").foreach { w =>
      val t = tableName(dir, w)
      // table names derive from dir.hashCode — before dropping, verify a
      // pre-registered name actually points under THIS directory. On a
      // hashCode collision between two live stores in one session the
      // unguarded DROP would hijack the other store's registration and
      // its handle would silently probe the wrong files (r5 ADVICE #4;
      // attach() has carried the same check since r5).
      if (spark.catalog.tableExists(t)) {
        val loc = spark.sessionState.catalog
          .getTableMetadata(
            org.apache.spark.sql.catalyst.TableIdentifier(t))
          .location.getPath.stripSuffix("/")
        val expected = new org.apache.hadoop.fs.Path(s"$dir/$w")
          .toUri.getPath.stripSuffix("/")
        require(loc == expected,
          s"DedupStore.build: catalog table '$t' points at '$loc', not " +
            s"this store's '$expected' (table-name collision with another " +
            "live store) — refusing to drop it; use a different directory")
      }
      spark.sql(s"DROP TABLE IF EXISTS $t")
    }
    fs.delete(hp, true)
    fs.mkdirs(hp)
    graft.materialize.Materializer.writeManifest(
      Paths.get(dir, "store.json"), Map("status" -> "building"))

    bucketedWrite(
      Dedup.exactGroups(df, textCol, idCol)
        .select(col("fingerprint"), col("keep_id")),
      dir, "fingerprints", Seq("fingerprint"), params.nBuckets, "overwrite")

    if (params.nearDup) {
      val sig = Dedup.minhashSignatures(
        df, textCol, idCol, params.numHashes, params.shingleWidth)
      // signatures are consumed by an id-keyed candidate join; buckets
      // by the (band, bucket) probe join — each bucketed on its own key
      bucketedWrite(sig, dir, "signatures", Seq("_id"), params.nBuckets,
        "overwrite")
      // band from the JUST-WRITTEN signature files: referencing `sig`
      // again would re-execute the whole corpus-wide explode+minhash
      // aggregation a second time (measured: the build paid the corpus
      // signature pass twice); the columnar re-read costs 8·numHashes
      // bytes/doc instead
      val sigOnDisk = spark.read.parquet(s"$dir/signatures")
      val banded = Dedup.bandRows(sigOnDisk, params.numHashes, params.bands)
      val guarded = banded
        .withColumn("_n",
          count(lit(1)).over(Window.partitionBy(col("_band"), col("_bucket"))))
        .filter(col("_n") <= params.maxBucket)
        .drop("_n")
      bucketedWrite(guarded, dir, "buckets", Seq("_band", "_bucket"),
        params.nBuckets, "overwrite")
    }

    graft.materialize.Materializer.writeManifest(Paths.get(dir, "store.json"), Map(
      "status" -> "complete",
      "num_hashes" -> params.numHashes,
      "bands" -> params.bands,
      "shingle_width" -> params.shingleWidth,
      "n_buckets" -> params.nBuckets,
      "max_bucket" -> params.maxBucket,
      "near_dup" -> params.nearDup))
    attach(spark, dir)
  }

  /** Attach a persisted store in (possibly) a fresh session: reads the
    * manifest and re-registers the three external bucketed tables with
    * the EXACT bucket spec they were written with — without the
    * CLUSTERED BY clause Spark would treat the files as unbucketed and
    * silently shuffle the store on every probe. Idempotent when the
    * tables are already registered. */
  def attach(spark: SparkSession, dir: String): Store = {
    val mpath = Paths.get(dir, "store.json")
    require(Files.exists(mpath), s"no dedup store at $dir (missing store.json)")
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Files.readAllBytes(mpath))
    require(m.path("status").asText() == "complete",
      s"dedup store at $dir is incomplete (interrupted build) — rebuild it")
    val params = Params(
      numHashes = m.path("num_hashes").asInt(),
      bands = m.path("bands").asInt(),
      shingleWidth = m.path("shingle_width").asInt(),
      nBuckets = m.path("n_buckets").asInt(),
      maxBucket = m.path("max_bucket").asInt(),
      nearDup = !m.has("near_dup") || m.path("near_dup").asBoolean())

    def register(which: String, schema: String, keys: String): Unit = {
      val t = tableName(dir, which)
      if (!spark.catalog.tableExists(t)) {
        spark.sql(
          s"""CREATE TABLE $t ($schema) USING PARQUET
             |CLUSTERED BY ($keys) SORTED BY ($keys)
             |INTO ${params.nBuckets} BUCKETS
             |LOCATION '$dir/$which'""".stripMargin)
      } else {
        // table names derive from dir.hashCode — a collision (or a
        // stale registration left by another store) would silently
        // probe the WRONG store's files; trust the name only if its
        // registered location is this store's directory
        val loc = spark.sessionState.catalog
          .getTableMetadata(
            org.apache.spark.sql.catalyst.TableIdentifier(t))
          .location.getPath.stripSuffix("/")
        val expected = new org.apache.hadoop.fs.Path(s"$dir/$which")
          .toUri.getPath.stripSuffix("/")
        require(loc == expected,
          s"DedupStore.attach: catalog table '$t' points at '$loc', not " +
            s"this store's '$expected' (name collision or stale " +
            "registration) — drop the table and re-attach")
      }
    }
    register("fingerprints", "fingerprint STRING, keep_id BIGINT",
      "fingerprint")
    if (params.nearDup) {
      register("signatures", "_id BIGINT, _sig ARRAY<BIGINT>", "_id")
      register("buckets", "_id BIGINT, _band INT, _bucket INT",
        "_band, _bucket")
    }
    Store(spark, dir, params,
      tableName(dir, "fingerprints"),
      tableName(dir, "signatures"),
      tableName(dir, "buckets"))
  }

  /** Exact stage: increment rows that are NEW — not an exact duplicate
    * of any store doc, nor of an earlier (min-id) increment row with the
    * same normalized fingerprint. Output = increment columns plus
    * `fingerprint`. The store side is a bucketed scan anti-joined
    * without an exchange; the increment pays ONE fingerprint shuffle —
    * the anti-join runs first and the intra-increment window rides its
    * output partitioning (anti-join output is clustered by fingerprint,
    * so the window adds a sort but no second exchange). */
  def newDocs(
      store: Store,
      increment: DataFrame,
      textCol: String,
      idCol: String): DataFrame = {
    val w = Window.partitionBy(col("fingerprint")).orderBy(col(idCol).asc)
    increment
      .withColumn("fingerprint", TextAnalysis.fingerprint(col(textCol)))
      .join(store.fingerprints.select(col("fingerprint")),
        Seq("fingerprint"), "left_anti")
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Near-dup stage: (inc_id, store_id, sig_agreement) for every
    * increment doc that shares an LSH band bucket with a store doc and
    * whose signatures agree on ≥ `threshold` of the minhash rows
    * (agreement estimates Jaccard unbiasedly; exact copies agree on
    * every row, so threshold semantics are deterministic for them).
    * The band probe and the store-signature fetch both run against
    * bucketed store scans — the only shuffles are increment-sized. */
  def nearDups(
      store: Store,
      increment: DataFrame,
      textCol: String,
      idCol: String,
      threshold: Double = 0.9): DataFrame = {
    val p = store.params
    require(p.nearDup,
      s"store at ${store.dir} was built exact-only (Params.nearDup=false) " +
        "— it has no signature/band index; rebuild with nearDup=true")
    val sig = Dedup.minhashSignatures(
      increment, textCol, idCol, p.numHashes, p.shingleWidth)
    val cand = Dedup.bandRows(sig, p.numHashes, p.bands)
      .join(store.buckets.select(
          col("_band"), col("_bucket"), col("_id").as("store_id")),
        Seq("_band", "_bucket"))
      .select(col("_id").as("inc_id"), col("store_id"))
      .dropDuplicates("inc_id", "store_id")
    cand
      .join(sig.select(col("_id").as("inc_id"), col("_sig").as("_sig_a")),
        Seq("inc_id"))
      .join(store.signatures.select(
          col("_id").as("store_id"), col("_sig").as("_sig_b")),
        Seq("store_id"))
      .withColumn("sig_agreement",
        aggregate(
          zip_with(col("_sig_a"), col("_sig_b"),
            (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / p.numHashes)
      .filter(col("sig_agreement") >= threshold)
      .select(col("inc_id"), col("store_id"), col("sig_agreement"))
  }

  /** Compact a store in place. Every [[append]] adds nBuckets files
    * per table and can (a) accumulate duplicate fingerprint keys
    * (membership-harmless but scan-wasteful), (b) re-add ids on
    * at-least-once replay, and (c) grow band buckets past `maxBucket`
    * (the documented append drift). Compaction rewrites each digest
    * table into a fresh nBuckets-file bucketed layout — duplicate
    * fingerprints collapse to min keep_id, replayed ids dedup, and the
    * maxBucket guard is re-applied — then swaps directories
    * (old → `_old_*` → delete, so a crash mid-swap leaves one of the
    * two copies on disk for manual recovery; the swap itself is two
    * renames, not atomic). Single-writer: run in the writer's slot. */
  def compact(store: Store): Store = {
    val spark = store.spark
    val p = store.params
    val conf = spark.sparkContext.hadoopConfiguration

    def swap(which: String, df: DataFrame, keys: Seq[String]): Unit = {
      val fs = new org.apache.hadoop.fs.Path(store.dir).getFileSystem(conf)
      def pth(s: String) = new org.apache.hadoop.fs.Path(s"${store.dir}/$s")
      val tmpTable = tableName(store.dir, s"${which}_compact")
      spark.sql(s"DROP TABLE IF EXISTS $tmpTable")
      fs.delete(pth(s"_compact_$which"), true)
      df.repartition(p.nBuckets, keys.map(col): _*)
        .write.mode("overwrite")
        .bucketBy(p.nBuckets, keys.head, keys.tail: _*)
        .sortBy(keys.head, keys.tail: _*)
        .option("path", s"${store.dir}/_compact_$which")
        .format("parquet")
        .saveAsTable(tmpTable)
      spark.sql(s"DROP TABLE IF EXISTS $tmpTable")
      spark.sql(s"DROP TABLE IF EXISTS ${tableName(store.dir, which)}")
      fs.delete(pth(s"_old_$which"), true)
      require(fs.rename(pth(which), pth(s"_old_$which")) &&
          fs.rename(pth(s"_compact_$which"), pth(which)),
        s"compact: directory swap failed for $which under ${store.dir}")
      fs.delete(pth(s"_old_$which"), true)
    }

    swap("fingerprints",
      store.fingerprints.groupBy(col("fingerprint"))
        .agg(min(col("keep_id")).as("keep_id")),
      Seq("fingerprint"))
    if (p.nearDup) {
      swap("signatures", store.signatures.dropDuplicates("_id"), Seq("_id"))
      swap("buckets",
        store.buckets.dropDuplicates("_id", "_band", "_bucket")
          .withColumn("_n", count(lit(1))
            .over(Window.partitionBy(col("_band"), col("_bucket"))))
          .filter(col("_n") <= p.maxBucket)
          .drop("_n"),
        Seq("_band", "_bucket"))
    }
    attach(spark, store.dir)
  }

  /** Continuous-crawl ingestion: a Structured Streaming loop that, per
    * micro-batch, keeps only docs that are new vs the store AND the
    * batch ([[newDocs]]), writes the survivors to `sinkDir` (parquet,
    * one `batch=<id>` partition per batch), and [[append]]s them to the
    * store — so a duplicate
    * arriving in a LATER batch is dropped against the survivors of
    * earlier ones. The store IS the cross-batch state: watermark-free,
    * unbounded-horizon dedup (engine state stores bound their horizon
    * by watermark; the store is the full accepted history at ~5% of
    * corpus bytes, exactly the streaming analog of the daily batch
    * probe).
    *
    * Delivery contract: EXACTLY-once for the sink, idempotent for
    * membership. Each batch lands in its own `batch=<id>` sink
    * partition with overwrite semantics, so every replay path is safe:
    * replay before the sink write rewrites the same partition; replay
    * between sink write and append recomputes the same survivors (the
    * store hasn't admitted them yet) and overwrites the partition with
    * identical content; replay after the append finds ZERO survivors
    * (they are store members now) and touches nothing — the partition
    * from the first attempt stands. Survivors are snapshotted once per
    * batch so the sink write and the store append read one consistent
    * result; read the sink with `spark.read.parquet(sinkDir)` (the
    * batch id surfaces as a partition column). */
  def ingest(
      store: Store,
      stream: DataFrame,
      textCol: String,
      idCol: String,
      sinkDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((batch: DataFrame, id: Long) =>
        ingestBatch(store, batch, textCol, idCol, sinkDir, id))
      .start()

  /** One ingest micro-batch (see [[ingest]] for the replay contract);
    * package-visible so the replay paths are testable without forcing
    * a mid-batch crash through the streaming engine. */
  private[dedup] def ingestBatch(
      store: Store,
      batch: DataFrame,
      textCol: String,
      idCol: String,
      sinkDir: String,
      batchId: Long): Unit = {
    val survivors = newDocs(store, batch, textCol, idCol)
      .drop("fingerprint").localCheckpoint()
    try {
      // a tick with nothing admitted must not pay three bucketed
      // appends (nBuckets empty files each) plus an empty sink dir
      if (!survivors.isEmpty) {
        survivors.write.mode("overwrite").parquet(s"$sinkDir/batch=$batchId")
        // survivors is already an eager snapshot (checkpointed above):
        // appendSnapshot skips append()'s second materialization of the
        // increment
        appendSnapshot(store, survivors, textCol, idCol)
      }
    } finally {
      org.apache.spark.sql.GraftColumnBridge.unpersistCheckpoint(survivors)
    }
  }

  /** Accept an increment into the store: append its fingerprints,
    * signatures, and band rows in the tables' existing bucket layout
    * (bucketed appends co-partition with the original files, so probe
    * joins stay exchange-free). Callers append the SURVIVORS of their
    * own gating ([[newDocs]] / [[nearDups]]); appended fingerprints that
    * collide with existing ones are harmless for membership semantics
    * (`keep_id` is advisory after appends). */
  def append(
      store: Store,
      docs: DataFrame,
      textCol: String,
      idCol: String): Unit = {
    // `docs` is usually DERIVED from a store probe (the survivors of
    // newDocs/nearDups) — a lazy plan that re-reads the store tables.
    // Each bucketed write below would re-execute it, and after the
    // first write the re-execution observes the half-appended store
    // (the survivors anti-join against their own just-appended
    // fingerprints and vanish). Snapshot the increment eagerly so all
    // three digest writes read one consistent, increment-sized input.
    val snap = docs.select(col(idCol), col(textCol)).localCheckpoint()
    try appendSnapshot(store, snap, textCol, idCol)
    finally org.apache.spark.sql.GraftColumnBridge.unpersistCheckpoint(snap)
  }

  /** [[append]] for an increment the caller has ALREADY materialized
    * (e.g. [[ingestBatch]]'s checkpointed survivors): skips the second
    * snapshot. `snap` must be immutable across the three digest writes —
    * a localCheckpoint or a read of committed files. */
  private[dedup] def appendSnapshot(
      store: Store,
      snap: DataFrame,
      textCol: String,
      idCol: String): Unit = {
    val p = store.params
    locally {
      // Near-dup digests FIRST, fingerprints LAST: exact-dedup
      // membership is the gate every replay path probes (newDocs
      // anti-joins fingerprints), so a crash BETWEEN the writes must
      // leave the docs looking un-admitted — the replayed batch then
      // recomputes the same survivors and re-derives signatures/buckets
      // (duplicate sig/band rows are compact-collapsible). The previous
      // fingerprints-first order left a crash window where docs were
      // exact-members with NO near-dup index rows, permanently admitting
      // their future near-duplicates (r5 ADVICE #1).
      if (p.nearDup) {
        val sig = Dedup.minhashSignatures(
          snap, textCol, idCol, p.numHashes, p.shingleWidth)
          // two consumers (signature write + banding write): materialize
          // the increment-sized table once instead of running the
          // explode+minhash aggregation twice
          .localCheckpoint()
        try {
          bucketedWrite(sig, store.dir, "signatures", Seq("_id"), p.nBuckets,
            "append")
          bucketedWrite(Dedup.bandRows(sig, p.numHashes, p.bands),
            store.dir, "buckets", Seq("_band", "_bucket"), p.nBuckets, "append")
        } finally {
          org.apache.spark.sql.GraftColumnBridge.unpersistCheckpoint(sig)
        }
      }
      bucketedWrite(
        Dedup.exactGroups(snap, textCol, idCol)
          .select(col("fingerprint"), col("keep_id")),
        store.dir, "fingerprints", Seq("fingerprint"), p.nBuckets, "append")
      // the insert commands invalidate the relation cache of the
      // session that WROTE (docs.sparkSession) — which under
      // foreachBatch is Structured Streaming's session CLONE, not the
      // session probes read through. Refresh the store's session
      // explicitly or the next probe anti-joins a stale FileIndex and
      // re-accepts what this append just admitted (caught live by the
      // ingest spec).
      (Seq("fingerprints") ++
        (if (p.nearDup) Seq("signatures", "buckets") else Nil))
        .foreach(w => store.spark.catalog.refreshTable(tableName(store.dir, w)))
    }
  }
}
