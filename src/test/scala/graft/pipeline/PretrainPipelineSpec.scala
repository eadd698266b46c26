package graft.pipeline

import scala.jdk.CollectionConverters._

import graft.SparkTestBase

class PretrainPipelineSpec extends SparkTestBase {
  import spark.implicits._

  test("clean: exact dups, near-dups, wrong-language and junk all removed") {
    val good =
      "the data table is a good row of value and the scan is in the plan " +
        "for this query to be a fast one with the right value"
    val german =
      "der hund und die katze sind nicht mit dem vogel in das haus gegangen " +
        "und der tag ist nicht zu ende und das ist gut"
    val junk = "!!! ??? *** ### $$$ %%% ^^^ &&& ((( ))) @@@ !!!"
    val docs = Seq(
      (1L, good),
      (2L, "  " + good.toUpperCase + " "),             // exact dup after normalization
      (3L, good.split(" ").dropRight(2).mkString(" ")), // near-dup of 1
      (4L, german),                                     // wrong language
      (5L, junk),                                       // low quality
      (6L, "the value of a table row is in the scan and the plan is for " +
        "the query of the data to be the best one of all the good runs")
    ).toDF("doc_id", "text")

    val out = PretrainPipeline.clean(docs, "text", "doc_id")
      .select($"doc_id", $"lang_pred", $"quality")
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq

    assert(out.map(_._1) === Seq(1L, 6L))
    assert(out.forall(_._2 == "en"))
    assert(out.forall(_._3 >= 0.75))
  }

  test("mixture stage: survivors sampled per lang_pred stratum, weights attached, off by default") {
    // 60 distinct clean English docs (unique trailing token defeats the
    // exact/near dedup stages), sampled at en -> 0.5 as the final stage
    val base = "the data table is a good row of value and the scan is in " +
      "the plan for this query to be a fast one with the right value token"
    val docs = (1L to 60L).map(i => (i, s"$base $i")).toDF("doc_id", "text")

    // the docs differ only in the trailing token (exact J ~ 25/27 = 0.93),
    // so raise the near-dup threshold to keep the dedup stages neutral —
    // this test targets the mixture stage
    val cfg = PretrainPipeline.Config(nearDupThreshold = 0.95)
    val cleaned = PretrainPipeline.clean(docs, "text", "doc_id", cfg)
    assert(!cleaned.columns.contains("sample_weight"), "mixture is opt-in")
    val survivors = cleaned.select($"doc_id").as[Long].collect().toSet
    assert(survivors.size === 60)

    val mixed = PretrainPipeline.clean(docs, "text", "doc_id",
      cfg.copy(mixture = Some(PretrainPipeline.Mixture(rates = Map("en" -> 0.5)))))
    val got = mixed.select($"doc_id", $"sample_weight")
      .as[(Long, Double)].collect()
    assert(got.forall(_._2 === 2.0))
    // the stage is exactly MixtureSampler.sample over the cleaned set
    val expect = MixtureSampler.sample(
      cleaned, "lang_pred", "doc_id", Map("en" -> 0.5))
      .select($"doc_id").as[Long].collect().toSet
    assert(got.map(_._1).toSet === expect)
    assert(got.nonEmpty && got.length < 60)
  }

  test("repetition gates: repetitive docs dropped only when enabled") {
    val good =
      "the data table is a good row of value and the scan is in the plan " +
        "for this query to be a fast one with the right value"
    // heavy bigram repetition + duplicate lines; stopword-rich so the
    // language/quality gates pass and only the repetition gate decides;
    // the duplicated LINE must not be `good` or the near-dup LSH stage
    // would drop doc 3 as a near-duplicate of doc 1 before the gate runs
    val spam = ("the spam is the spam is " * 12).trim
    val line =
      "a value of the row is in the table and the scan is of the plan now"
    val dupLines = s"$line\n$line\n$line"
    // 5 clean tokens: mode fraction is 1/4 = 0.25 > 0.2 purely from
    // brevity — the minRepetitionTokens floor must exempt it
    val shortClean = "the cat is a mat"
    val docs = Seq((1L, good), (2L, spam), (3L, dupLines), (4L, shortClean))
      .toDF("doc_id", "text")

    val off = PretrainPipeline.clean(docs, "text", "doc_id")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(off === Seq(1L, 2L, 3L, 4L), "gates disabled: repetition must pass")

    val on = PretrainPipeline.clean(docs, "text", "doc_id",
      cfg = PretrainPipeline.Config(
        maxDupLineFrac = Some(0.3), maxTopNgramFrac = Some(0.2)))
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(on === Seq(1L, 4L),
      "both repetition classes dropped; short clean doc exempt via the length floor")
  }

  test("paragraph gate: boilerplate-dominated docs dropped only when enabled") {
    val lineA = "the value of a table row is in the scan and the plan is good"
    val lineB = "a different english line with the usual words of the language now"
    val boiler = "the news of the day is in the table of the value rows"
    // docs 1-2: mostly-unique text + one shared boiler line → frac 1/3;
    // doc 3: boiler + one more line shared with doc 4 → frac 1.0;
    // doc 4 shares one line with doc 3 → frac 1/2
    val shared = "the shared line of the good text is in the value of a plan"
    val docs = Seq(
      (1L, s"$lineA\n$boiler\nthe first unique line of the doc is a good one here"),
      (2L, s"$lineB\n$boiler\nthe second unique line of the doc is a good one too"),
      (3L, s"$boiler\n$shared"),
      (4L, s"$shared\nthe last unique line of the set is a good long one again")
    ).toDF("doc_id", "text")

    val off = PretrainPipeline.clean(docs, "text", "doc_id",
      cfg = PretrainPipeline.Config(minQuality = 0.0))
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(off === Seq(1L, 2L, 3L, 4L), "gate disabled: all pass")

    val on = PretrainPipeline.clean(docs, "text", "doc_id",
      cfg = PretrainPipeline.Config(minQuality = 0.0,
        maxDupParaFrac = Some(0.6)))
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(on === Seq(1L, 2L, 4L),
      "only the fully-boilerplate doc (frac 1.0) exceeds the 0.6 gate")
  }

  test("staged clean (stageDir) equals the unstaged plan") {
    val docs = Seq(
      (1L, "the value of a table row is in the scan and the plan is for " +
        "the query of the data to be the best one of all the good runs"),
      (2L, "the value of a table row is in the scan and the plan is for " +
        "the query of the data to be the best one of all the good runs"),
      (3L, "a completely different english text with the usual words of " +
        "the language that is good and long enough to pass the filters of this")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    val unstaged = PretrainPipeline.clean(docs, "text", "doc_id")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    val staged = PretrainPipeline.clean(docs, "text", "doc_id",
      stageDir = Some(dir))
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(staged === unstaged)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "exact_dedup")))
  }

  test("Components canonicalization: 3-chain A~B~C keeps exactly the min id") {
    // 20 English words; each mutation drops the last 2, so 3-gram Jaccard
    // is 16/18 ≈ 0.889 (A,B), 14/16 = 0.875 (B,C) but only 14/18 ≈ 0.778
    // (A,C) — a transitive chain whose ends are BELOW the 0.8 threshold
    val a = "the data table is a good row of value and the scan is in " +
      "the plan for this query fast"
    val b = a.split(" ").dropRight(2).mkString(" ")
    val c = b.split(" ").dropRight(2).mkString(" ")
    val other = "a completely different english text with the usual words " +
      "of the language that is good and long enough to pass the filters"
    val docs = Seq((10L, a), (11L, b), (12L, c), (20L, other))
      .toDF("doc_id", "text")

    val kept = PretrainPipeline.clean(docs, "text", "doc_id",
      cfg = PretrainPipeline.Config(
        canonicalize = PretrainPipeline.Canonicalize.Components))
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(10L, 20L))
  }

  test("staged clean reads the dedup result from files: no window recompute in plan") {
    val docs = Seq(
      (1L, "the value of a table row is in the scan and the plan is for " +
        "the query of the data to be the best one of all the good runs"),
      (2L, "a completely different english text with the usual words of " +
        "the language that is good and long enough to pass the filters of this")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-stage-plan").toString

    val staged = PretrainPipeline.clean(docs, "text", "doc_id",
      stageDir = Some(dir))
    staged.collect() // AQE-final plan only after execution
    val stagedPlan = staged.queryExecution.executedPlan.toString
    // the exact-dedup subtree (row_number window over the fingerprint)
    // ran ONCE at stage-write time; the query plan re-scans parquet
    // instead (the Window node is the reliable marker — expression text
    // like md5 can be hidden by plan-string field truncation)
    assert(!stagedPlan.contains("Window"),
      s"staged plan recomputes the dedup window:\n$stagedPlan")
    // assert on inputFiles, not the plan STRING: the scan's Location
    // print truncates long paths (e.g. a /dev/shm/graft-jvm-tmp/ temp
    // prefix cuts ".../exact_dedup" to ".../exact_d...") — the
    // CLAUDE.md plan-string-truncation gotcha
    assert(staged.inputFiles.exists(_.contains("exact_dedup")),
      "staged plan does not scan the staged parquet")

    val unstaged = PretrainPipeline.clean(docs, "text", "doc_id")
    unstaged.collect()
    assert(unstaged.queryExecution.executedPlan.toString.contains("Window"))
  }

  test("resume reuses a completed stage; changed input invalidates it") {
    def listStage(dir: String): Set[String] = {
      val p = java.nio.file.Paths.get(dir, "exact_dedup")
      val s = java.nio.file.Files.list(p)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("part-")).toSet
      finally s.close()
    }
    val base = java.nio.file.Files.createTempDirectory("graft-resume").toString
    val docsA = Seq(
      (1L, "the value of a table row is in the scan and the plan is for " +
        "the query of the data to be the best one of all the good runs"),
      (2L, "a completely different english text with the usual words of " +
        "the language that is good and long enough to pass the filters of this")
    ).toDF("doc_id", "text")
    docsA.write.parquet(s"$base/inA")
    val inA = spark.read.parquet(s"$base/inA")
    val stage = s"$base/stage"

    val r1 = PretrainPipeline.clean(inA, "text", "doc_id",
      stageDir = Some(stage), resume = true)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    val files1 = listStage(stage)

    // second resume run: stage untouched (same part files), same answer
    val r2 = PretrainPipeline.clean(inA, "text", "doc_id",
      stageDir = Some(stage), resume = true)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(listStage(stage) === files1, "resume rewrote a completed stage")
    assert(r2 === r1)

    // different input files ⇒ manifest hash mismatch ⇒ stage recomputed
    docsA.filter($"doc_id" === 1L).write.parquet(s"$base/inB")
    val r3 = PretrainPipeline.clean(spark.read.parquet(s"$base/inB"),
      "text", "doc_id", stageDir = Some(stage), resume = true)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(listStage(stage) !== files1, "changed input did not invalidate stage")
    assert(r3 === Seq(1L))

    // in-memory input (no files): resume must not hit a file-keyed manifest
    val r4 = PretrainPipeline.clean(docsA, "text", "doc_id",
      stageDir = Some(stage), resume = true)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(r4 === r1)
  }

  test("resume hits across FRESH reads of the same path (driver-restart proxy)") {
    // A separate spark.read.parquet builds a NEW InMemoryFileIndex —
    // exactly what a restarted driver does. The raw analyzed-plan
    // semanticHash keys on HadoopFsRelation, which hashes its FileIndex
    // by JVM-local identity, so without the relation placeholder in
    // stageHash every cross-process resume silently missed (caught live
    // in r4: two identical PipelineJob runs, two different spec hashes).
    val base = java.nio.file.Files.createTempDirectory("graft-resume3").toString
    Seq(
      (1L, "the value of a table row is in the scan and the plan is for " +
        "the query of the data to be the best one of all the good runs"),
      (2L, "a completely different english text with the usual words of " +
        "the language that is good and long enough to pass the filters of this")
    ).toDF("doc_id", "text").write.parquet(s"$base/in")
    val stage = s"$base/stage"

    val (_, reused1) = PretrainPipeline.cleanDetailed(
      spark.read.parquet(s"$base/in"), "text", "doc_id",
      stageDir = Some(stage), resume = true)
    assert(!reused1, "first run cannot reuse a stage that does not exist")

    val (df2, reused2) = PretrainPipeline.cleanDetailed(
      spark.read.parquet(s"$base/in"), "text", "doc_id",
      stageDir = Some(stage), resume = true)
    assert(reused2, "fresh read of the same path must hit the stage manifest")
    assert(df2.select($"doc_id").as[Long].collect().sorted.toSeq === Seq(1L, 2L))
  }

  test("resume key: caller transforms invalidate, observe decoration does not") {
    val base = java.nio.file.Files.createTempDirectory("graft-resume2").toString
    Seq(
      (1L, "the value of a table row is in the scan and the plan is for " +
        "the query of the data to be the best one of all the good runs"),
      (2L, "a completely different english text with the usual words of " +
        "the language that is good and long enough to pass the filters of this")
    ).toDF("doc_id", "text").write.parquet(s"$base/in")
    val stage = s"$base/stage"
    def stageFiles(): Set[String] = {
      val s0 = java.nio.file.Files.list(
        java.nio.file.Paths.get(stage, "exact_dedup"))
      try s0.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("part-")).toSet
      finally s0.close()
    }

    val plain = spark.read.parquet(s"$base/in")
    PretrainPipeline.clean(plain, "text", "doc_id",
      stageDir = Some(stage), resume = true).collect()
    val f1 = stageFiles()

    // pure metric decoration (observe) must HIT the manifest
    val obs = new org.apache.spark.sql.Observation()
    val decorated = plain.observe(obs, org.apache.spark.sql.functions.count(
      org.apache.spark.sql.functions.lit(1)).as("rows"))
    PretrainPipeline.clean(decorated, "text", "doc_id",
      stageDir = Some(stage), resume = true).collect()
    assert(stageFiles() === f1, "observe decoration invalidated the stage")

    // a real transformation of the SAME files must MISS and recompute
    val r = PretrainPipeline.clean(plain.filter($"doc_id" === 2L), "text", "doc_id",
      stageDir = Some(stage), resume = true)
      .select($"doc_id").as[Long].collect().toSeq
    assert(stageFiles() !== f1, "caller-side filter did not invalidate the stage")
    assert(r === Seq(2L),
      "resume served a stale unfiltered stage for a transformed input")
  }

  test("clean is deterministic across runs and partitionings") {
    val docs = graft.datagen.TranscriptGen
      .turns(spark, nConvs = 30, avgTurns = 6, seed = 3L)
      .toDF().select($"turn_idx".cast("long") + $"conv_id".substr(6, 8).cast("long") * 100 as "doc_id", $"text")
      .dropDuplicates("doc_id")
    val a = PretrainPipeline.clean(docs, "text", "doc_id")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    val b = PretrainPipeline.clean(docs.repartition(7), "text", "doc_id")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(a === b)
  }
}
