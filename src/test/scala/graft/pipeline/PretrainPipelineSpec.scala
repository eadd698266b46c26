package graft.pipeline

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
