package graft.dedup

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.text.TextAnalysis

class DedupStoreSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_dsspec_$tag")
    d.toFile.deleteOnExit()
    d.toString
  }

  // deterministic namespaced docs: doc i = 12 tokens w<i*100+j>; docs are
  // pairwise disjoint unless constructed as copies
  private def doc(i: Long): String =
    (0 until 12).map(j => s"w${i * 100 + j}").mkString(" ")

  test("newDocs drops exact dups against the store AND within the increment") {
    val store = (0L until 40L).map(i => (i, doc(i))).toDF("doc_id", "text")
    val st = DedupStore.build(store, "text", "doc_id", tmpDir("new"))
    // increment: 10 fresh docs, 5 copies of store docs, one intra-inc dup pair
    val inc = ((100L until 110L).map(i => (i, doc(i))) ++
      (0L until 5L).map(i => (200L + i, doc(i))) ++
      Seq((300L, doc(100L)))).toDF("doc_id", "text")
    val got = DedupStore.newDocs(st, inc, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(got === (100L until 110L).toSet) // 300 loses to 100 within the increment
  }

  test("nearDups: exact copies agree on every signature row; disjoint docs never pair") {
    val store = (0L until 30L).map(i => (i, doc(i))).toDF("doc_id", "text")
    val st = DedupStore.build(store, "text", "doc_id", tmpDir("near"))
    val inc = ((0L until 10L).map(i => (1000L + i, doc(i))) ++ // planted copies
      (50L until 60L).map(i => (1000L + i, doc(i)))) // disjoint fresh docs
      .toDF("doc_id", "text")
    val pairs = DedupStore.nearDups(st, inc, "text", "doc_id", threshold = 0.9)
      .as[(Long, Long, Double)].collect()
    assert(pairs.map { case (a, b, _) => (a, b) }.toSet ===
      (0L until 10L).map(i => (i, 1000L + i)).map(_.swap).toSet)
    assert(pairs.forall(_._3 === 1.0))
  }

  test("nearDups recall on near-threshold MUTATED copies (drop-last-2 words, J=0.947)") {
    // 40-token docs -> 38 shingles; dropping 2 words leaves 36 nested
    // grams: true J = 36/38 ≈ 0.947. Banding miss prob at 16×2 bands is
    // (1-J²)^16 ≈ 1e-16, and P(signature agreement < 0.6) is ~1e-9 per
    // pair — so at threshold 0.6 ALL 100 planted pairs must surface
    // (deterministic: hashes are seeded). At 0.9 the agreement estimate
    // (E=J, σ=0.04) straddles the cut; assert the deterministic count
    // stays in the binomial bulk rather than collapsing (the r4
    // finalizer bug mode: near-threshold pairs missing en masse).
    def longDoc(i: Long): String =
      (0 until 40).map(j => s"m${i * 100 + j}").mkString(" ")
    val store = (0L until 100L).map(i => (i, longDoc(i))).toDF("doc_id", "text")
    val st = DedupStore.build(store, "text", "doc_id", tmpDir("mut"))
    val inc = (0L until 100L).map { i =>
      (5000L + i, longDoc(i).split(" ").dropRight(2).mkString(" "))
    }.toDF("doc_id", "text")
    val loose = DedupStore.nearDups(st, inc, "text", "doc_id", 0.6)
      .filter(col("store_id") === col("inc_id") - 5000L).count()
    assert(loose === 100L, s"J=0.947 pairs must all clear threshold 0.6, got $loose")
    val tight = DedupStore.nearDups(st, inc, "text", "doc_id", 0.9)
      .filter(col("store_id") === col("inc_id") - 5000L).count()
    assert(tight >= 75L && tight <= 100L,
      s"agreement estimates collapsed on near-threshold pairs: $tight/100 at 0.9")
  }

  test("attach re-registers external tables in a fresh catalog; drops never touch data") {
    val dir = tmpDir("attach")
    val store = (0L until 25L).map(i => (i, doc(i))).toDF("doc_id", "text")
    val st = DedupStore.build(store, "text", "doc_id", dir)
    val inc = Seq((500L, doc(3L)), (501L, doc(777L))).toDF("doc_id", "text")
    val before = DedupStore.newDocs(st, inc, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet

    // simulate a fresh session: the in-memory catalog forgets the tables
    Seq(st.fpTable, st.sigTable, st.bucketTable)
      .foreach(t => spark.sql(s"DROP TABLE $t"))
    val re = DedupStore.attach(spark, dir)
    assert(re.params === st.params)
    val after = DedupStore.newDocs(re, inc, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(after === before && after === Set(501L))
    val np = DedupStore.nearDups(re, inc, "text", "doc_id", 0.9)
      .as[(Long, Long, Double)].collect().toSeq
    assert(np === Seq((3L, 500L, 1.0)).map { case (s0, i0, a) => (i0, s0, a) })
  }

  test("append grows the store: accepted docs are store members for the next increment") {
    val dir = tmpDir("append")
    val st = DedupStore.build(
      (0L until 20L).map(i => (i, doc(i))).toDF("doc_id", "text"),
      "text", "doc_id", dir)
    val day1 = (100L until 105L).map(i => (i, doc(i))).toDF("doc_id", "text")
    val accepted = DedupStore.newDocs(st, day1, "text", "doc_id")
    assert(accepted.count() === 5)
    DedupStore.append(st, accepted.select("doc_id", "text"), "text", "doc_id")

    val day2 = Seq((200L, doc(101L)), (201L, doc(300L))).toDF("doc_id", "text")
    assert(DedupStore.newDocs(st, day2, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet === Set(201L))
    assert(DedupStore.nearDups(st, day2, "text", "doc_id", 0.9)
      .select("store_id").as[Long].collect().toSet === Set(101L))
  }

  test("plan gate: probes NEVER shuffle the store side — only increment-sized exchanges") {
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val savedAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val dir = tmpDir("plan")
      val st = DedupStore.build(
        (0L until 50L).map(i => (i, doc(i))).toDF("doc_id", "text"),
        "text", "doc_id", dir)
      val inc = (500L until 520L).map(i => (i, doc(i))).toDF("doc_id", "text")

      // a store scan is "shuffled" if an exchange sits between it and
      // its NEAREST join ancestor — shuffles of post-join (candidate-
      // sized) data that merely contain the scan deeper in their
      // subtree are the increment paying its own way, which is fine
      def storeShuffled(df: org.apache.spark.sql.DataFrame): Seq[String] = {
        df.collect()
        import org.apache.spark.sql.execution.SparkPlan
        import org.apache.spark.sql.execution.joins.{BaseJoinExec => J}
        def walk(p: SparkPlan, ancestors: List[SparkPlan]): Seq[String] =
          p match {
            case f: FileSourceScanExec
                if f.relation.location.rootPaths.exists(_.toString.contains(dir)) =>
              val toJoin = ancestors.takeWhile(!_.isInstanceOf[J])
              if (toJoin.exists(_.isInstanceOf[ShuffleExchangeExec]))
                Seq(f.nodeName)
              else Nil
            case other => other.children.flatMap(c => walk(c, other :: ancestors))
          }
        walk(df.queryExecution.executedPlan, Nil)
      }
      val anti = DedupStore.newDocs(st, inc, "text", "doc_id")
      assert(storeShuffled(anti).isEmpty,
        s"store scan under a shuffle in newDocs:\n${anti.queryExecution.executedPlan}")
      // exactly ONE exchange total: the increment's fingerprint shuffle
      // feeds both the anti-join and the intra-increment window
      val exchanges = anti.queryExecution.executedPlan.collect {
        case sh: ShuffleExchangeExec => sh
      }
      assert(exchanges.size === 1,
        s"expected one increment-side exchange:\n${anti.queryExecution.executedPlan}")

      val near = DedupStore.nearDups(st, inc, "text", "doc_id", 0.9)
      assert(storeShuffled(near).isEmpty,
        s"store scan under a shuffle in nearDups:\n${near.queryExecution.executedPlan}")
      // and the store scans really are bucketed scans
      val storeScans = near.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec
            if f.relation.location.rootPaths.exists(_.toString.contains(dir)) => f
      }
      assert(storeScans.nonEmpty && storeScans.forall(_.bucketedScan),
        s"expected bucketed store scans:\n${near.queryExecution.executedPlan}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.conf.set("spark.sql.adaptive.enabled", savedAqe)
    }
  }

  test("maxBucket guard drops degenerate boilerplate buckets at build time") {
    // 40 identical docs -> every band bucket has 40 members > maxBucket=8;
    // plus 5 distinct docs that must keep their buckets
    val rows = (0L until 40L).map(i => (i, doc(999L))) ++
      (100L until 105L).map(i => (i, doc(i)))
    val st = DedupStore.build(rows.toDF("doc_id", "text"), "text", "doc_id",
      tmpDir("guard"), DedupStore.Params(maxBucket = 8))
    val boiler = st.buckets.filter(col("_id") < 40L).count()
    assert(boiler === 0, s"boilerplate buckets must be dropped, found $boiler")
    assert(st.buckets.filter(col("_id") >= 100L).count() ===
      5L * st.params.bands)
    // the exact stage still collapses the boilerplate
    val inc = Seq((500L, doc(999L))).toDF("doc_id", "text")
    assert(DedupStore.newDocs(st, inc, "text", "doc_id").count() === 0)
  }

  test("ingest: the store is the cross-batch state — later-batch dups of earlier survivors die") {
    val st = DedupStore.build(
      (0L until 15L).map(i => (i, doc(i))).toDF("doc_id", "text"),
      "text", "doc_id", tmpDir("ing"))
    val sink = tmpDir("ing_sink") + "/out"
    val ckpt = tmpDir("ing_ckpt") + "/cp"
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](spark)
    val q = DedupStore.ingest(st, input.toDF().toDF("doc_id", "text"),
      "text", "doc_id", sink, ckpt)
    try {
      // batch 1: one store dup, two fresh
      input.addData(Seq((100L, doc(3L)), (101L, doc(50L)), (102L, doc(51L))))
      q.processAllAvailable()
      // batch 2: a copy of batch 1's survivor + one fresh — the copy
      // must die against the APPENDED store, not any engine state
      input.addData(Seq((200L, doc(50L)), (201L, doc(60L))))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(sink)
      .select("doc_id").as[Long].collect().toSet
    assert(got === Set(101L, 102L, 201L))
    // and the store now knows all three survivors
    assert(DedupStore.newDocs(st,
        Seq((300L, doc(60L))).toDF("doc_id", "text"), "text", "doc_id")
      .count() === 0)
  }

  test("compact: collapses append debris, re-applies the bucket guard, preserves probe results") {
    val dir = tmpDir("cpt")
    val st = DedupStore.build(
      (0L until 20L).map(i => (i, doc(i))).toDF("doc_id", "text"),
      "text", "doc_id", dir, DedupStore.Params(maxBucket = 8))
    // append 1 includes a replayed duplicate of store doc 5 (at-least-
    // once replay shape) -> duplicate fingerprint KEY in the table
    DedupStore.append(st,
      ((100L until 110L).map(i => (i, doc(i))) :+ (110L, doc(5L)))
        .toDF("doc_id", "text"), "text", "doc_id")
    // append 2: 40 copies of one boilerplate text -> its band buckets
    // grow to 40 members, past the build-time cap of 8 (append drift)
    DedupStore.append(st,
      (200L until 240L).map(i => (i, doc(999L))).toDF("doc_id", "text"),
      "text", "doc_id")
    val inc = Seq((500L, doc(105L)), (501L, doc(777L))).toDF("doc_id", "text")
    val newBefore = DedupStore.newDocs(st, inc, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    val nearBefore = DedupStore.nearDups(st, inc, "text", "doc_id", 0.9)
      .as[(Long, Long, Double)].collect().toSet
    assert(st.buckets.filter(col("_id") >= 200L).count() ===
      40L * st.params.bands) // drifted past the cap before compaction

    val cp = DedupStore.compact(st)
    def nFiles(w: String): Int =
      new java.io.File(s"$dir/$w").listFiles.count(_.getName.startsWith("part-"))
    Seq("fingerprints", "signatures", "buckets").foreach { w =>
      assert(nFiles(w) <= cp.params.nBuckets, s"$w: ${nFiles(w)} files")
    }
    val fp = cp.fingerprints
    assert(fp.count() === fp.select("fingerprint").distinct().count())
    assert(cp.buckets.filter(col("_id") >= 200L).count() === 0L,
      "compaction must re-apply the maxBucket guard to drifted buckets")
    assert(DedupStore.newDocs(cp, inc, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet === newBefore)
    assert(DedupStore.nearDups(cp, inc, "text", "doc_id", 0.9)
      .as[(Long, Long, Double)].collect().toSet === nearBefore)
  }

  test("exact-only store: no signature tables, nearDups refuses loudly, attach round-trips the flag") {
    val dir = tmpDir("exonly")
    val st = DedupStore.build(
      (0L until 10L).map(i => (i, doc(i))).toDF("doc_id", "text"),
      "text", "doc_id", dir, DedupStore.Params(nearDup = false))
    assert(!new java.io.File(s"$dir/signatures").exists())
    val inc = Seq((100L, doc(3L)), (101L, doc(50L))).toDF("doc_id", "text")
    assert(DedupStore.newDocs(st, inc, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet === Set(101L))
    DedupStore.append(st, Seq((101L, doc(50L))).toDF("doc_id", "text"),
      "text", "doc_id")
    assert(DedupStore.newDocs(st,
        Seq((200L, doc(50L))).toDF("doc_id", "text"), "text", "doc_id")
      .count() === 0)
    val e = intercept[IllegalArgumentException] {
      DedupStore.nearDups(st, inc, "text", "doc_id")
    }
    assert(e.getMessage.contains("exact-only"))
    spark.sql(s"DROP TABLE ${st.fpTable}")
    assert(DedupStore.attach(spark, dir).params.nearDup === false)
  }

  test("build refuses to wipe a non-empty directory that is not a store; retry still refuses") {
    val dir = tmpDir("foreign")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "precious.txt"),
      "user data".getBytes)
    val docs = Seq((1L, doc(1L))).toDF("doc_id", "text")
    (1 to 2).foreach { _ => // the refusal must not leave a marker that lets a retry through
      val e = intercept[IllegalArgumentException] {
        DedupStore.build(docs, "text", "doc_id", dir)
      }
      assert(e.getMessage.contains("foreign"))
    }
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "precious.txt")))
    // a genuine previous store (even an interrupted build) rebuilds fine
    val storeDir = tmpDir("rebuild")
    DedupStore.build(docs, "text", "doc_id", storeDir)
    DedupStore.build(docs, "text", "doc_id", storeDir)
  }

  test("attach refuses a catalog table name that points at a different location") {
    val dir = tmpDir("coll")
    val st = DedupStore.build(
      Seq((1L, doc(1L))).toDF("doc_id", "text"), "text", "doc_id", dir)
    val elsewhere = tmpDir("coll_other")
    spark.sql(s"DROP TABLE ${st.fpTable}")
    spark.sql(
      s"""CREATE TABLE ${st.fpTable} (fingerprint STRING, keep_id BIGINT)
         |USING PARQUET LOCATION '$elsewhere/fp'""".stripMargin)
    try {
      val e = intercept[IllegalArgumentException] {
        DedupStore.attach(spark, dir)
      }
      assert(e.getMessage.contains("collision") ||
        e.getMessage.contains("stale"))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${st.fpTable}")
      DedupStore.attach(spark, dir) // clean re-registration recovers
    }
  }

  test("ingest: an empty micro-batch tick writes nothing to the sink or the store") {
    val dir = tmpDir("empty")
    val st = DedupStore.build(
      Seq((0L, doc(0L))).toDF("doc_id", "text"), "text", "doc_id", dir)
    val sink = tmpDir("empty_sink") + "/out"
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](spark)
    val q = DedupStore.ingest(st, input.toDF().toDF("doc_id", "text"),
      "text", "doc_id", sink, tmpDir("empty_ckpt") + "/cp")
    try {
      input.addData(Seq((100L, doc(0L)))) // a pure-duplicate batch: zero survivors
      q.processAllAvailable()
    } finally q.stop()
    assert(!new java.io.File(sink).exists(), "empty tick must not create the sink")
    assert(st.fingerprints.count() === 1L, "empty tick must not append")
  }

  test("ingest replay is exactly-once: re-running a committed batch changes nothing") {
    val st = DedupStore.build(
      Seq((0L, doc(0L))).toDF("doc_id", "text"), "text", "doc_id",
      tmpDir("replay"))
    val sink = tmpDir("replay_sink") + "/out"
    val batch = Seq((100L, doc(100L)), (101L, doc(101L))).toDF("doc_id", "text")
    DedupStore.ingestBatch(st, batch, "text", "doc_id", sink, batchId = 7L)
    def sinkRows() = spark.read.parquet(sink)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val first = sinkRows()
    assert(first === Seq(100L, 101L))
    val fpCount = st.fingerprints.count()
    // full replay of the same committed batch (crash after append,
    // before the checkpoint commit): survivors recompute to zero, the
    // batch=7 partition stands, membership unchanged
    DedupStore.ingestBatch(st, batch, "text", "doc_id", sink, batchId = 7L)
    assert(sinkRows() === first)
    assert(st.fingerprints.count() === fpCount)
  }

  test("fingerprint parity: store membership uses the engine-wide normalized fingerprint") {
    val st = DedupStore.build(
      Seq((1L, "The  Cat sat")).toDF("doc_id", "text"),
      "text", "doc_id", tmpDir("fp"))
    val fp = Seq((1L, "the cat SAT  ")).toDF("doc_id", "text")
      .select(TextAnalysis.fingerprint(col("text"))).as[String].head()
    assert(st.fingerprints.select("fingerprint").as[String].collect().toSeq
      === Seq(fp))
  }
}
