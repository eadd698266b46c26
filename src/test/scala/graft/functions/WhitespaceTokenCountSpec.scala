package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

class WhitespaceTokenCountSpec extends SparkTestBase {
  import spark.implicits._

  // reference semantics: number of NON-EMPTY \s+-separated pieces
  private def regexForm(c: org.apache.spark.sql.Column) =
    size(filter(split(c, "\\s+", -1), x => length(x) > 0))

  test("equals the regex split count on adversarial strings") {
    val cases = Seq(
      "", " ", "  \t \n ", "a", " a ", "a b", "a  b", "\ta\tb\t",
      "one two three", "多字节 字符 混合 ascii", "emoji 🚀 test",
      "trailing space ", " leading", "\r\n\f", "a b", // NBSP is NOT \s
      "x" * 1000 + " y")
    val df = cases.toDF("s")
    val got = df.select(
      WhitespaceTokenCount($"s").as("fast"),
      regexForm($"s").as("slow")).collect()
    got.zip(cases).foreach { case (r, in) =>
      assert(r.getInt(0) === r.getInt(1), s"mismatch on ${in.take(40)}")
    }
  }

  test("property: equals regex form on random unicode-ish strings") {
    val genStr = Gen.listOf(Gen.frequency(
      (5, Gen.alphaNumChar),
      (3, Gen.const(' ')),
      (1, Gen.oneOf('\t', '\n', '\r', '\f')),
      (1, Gen.oneOf('é', '多', '\u00e9', ' ')))).map(_.mkString)
    val strs = (0 until 300).flatMap(i =>
      genStr(Gen.Parameters.default, Seed(i.toLong)))
    val rows = strs.toDF("s").select(
      WhitespaceTokenCount($"s").as("fast"), regexForm($"s").as("slow"))
      .as[(Int, Int)].collect()
    assert(rows.forall { case (a, b) => a == b })
    assert(rows.nonEmpty)
  }

  test("null input, SQL registration, codegen plan") {
    val df = Seq(Option("a b"), None).toDF("s")
    val got = df.select(WhitespaceTokenCount($"s").as("n"))
      .as[Option[Int]].collect().toSeq
    assert(got === Seq(Some(2), None))

    WhitespaceTokenCount.register(spark)
    df.createOrReplaceTempView("wtc_t")
    val viaSql = spark.sql("SELECT ws_token_count(s) AS n FROM wtc_t")
      .as[Option[Int]].collect().toSeq
    assert(viaSql === Seq(Some(2), None))

    // stays inside whole-stage codegen (no CodegenFallback); repartition
    // so the projection isn't constant-folded into a LocalTableScan
    val cg = df.repartition(2).select(WhitespaceTokenCount($"s"))
    cg.collect()
    val plan = cg.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"expression fell out of codegen:\n$plan")
  }
}
