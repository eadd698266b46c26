package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

class TokenInSetCountSpec extends SparkTestBase {
  import spark.implicits._

  private val words = Seq("the", "a", "table", "row", "value", "多字节")

  // reference semantics, single-space mode: split(text, " ", -1) members
  private def hofSingleSpace(c: org.apache.spark.sql.Column) =
    size(filter(split(c, " ", -1), x => x.isInCollection(words)))

  // reference semantics, whitespace-runs mode: non-empty \s+ pieces
  private def hofRuns(c: org.apache.spark.sql.Column) =
    size(filter(split(c, "\\s+", -1),
      x => x.isInCollection(words) && length(x) > 0))

  private val cases = Seq(
    "", " ", "the", " the ", "the a the", "a  the", "thea the",
    "table row value none", "the\tthe", "the\nrow", "多字节 字符 the",
    "a a a a a", "  leading the", "the trailing  ", "\r\n\f the",
    "value" * 100 + " value", "the a", "x the y a z")

  test("single-space mode equals the HOF form on adversarial strings") {
    val got = cases.toDF("s").select(
      TokenInSetCount($"s", words, whitespaceRuns = false).as("fast"),
      hofSingleSpace($"s").as("slow")).collect()
    got.zip(cases).foreach { case (r, in) =>
      assert(r.getInt(0) === r.getInt(1), s"mismatch on '${in.take(40)}'")
    }
  }

  test("whitespace-runs mode equals the HOF form on adversarial strings") {
    val got = cases.toDF("s").select(
      TokenInSetCount($"s", words, whitespaceRuns = true).as("fast"),
      hofRuns($"s").as("slow")).collect()
    got.zip(cases).foreach { case (r, in) =>
      assert(r.getInt(0) === r.getInt(1), s"mismatch on '${in.take(40)}'")
    }
  }

  test("property: equals HOF forms on random strings, both modes") {
    val genStr = Gen.listOf(Gen.frequency(
      (4, Gen.oneOf("the", "a", "row", "xx", "value", "多字节", "t", "")),
      (4, Gen.const(" ")),
      (1, Gen.oneOf("\t", "\n", "\r")))).map(_.mkString(" "))
    val strs = (0 until 200).flatMap(i =>
      genStr(Gen.Parameters.default, Seed(i.toLong)))
    val rows = strs.toDF("s").select(
      TokenInSetCount($"s", words, whitespaceRuns = false).as("f1"),
      hofSingleSpace($"s").as("s1"),
      TokenInSetCount($"s", words, whitespaceRuns = true).as("f2"),
      hofRuns($"s").as("s2"))
      .as[(Int, Int, Int, Int)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (f1, s1, f2, s2) =>
      assert(f1 === s1); assert(f2 === s2)
    }
  }

  test("null input and whole-stage codegen") {
    val df = Seq(Option("the a"), None).toDF("s")
    val got = df.select(
      TokenInSetCount($"s", words, whitespaceRuns = false).as("n"))
      .as[Option[Int]].collect().toSeq
    assert(got === Seq(Some(2), None))

    val cg = df.repartition(2)
      .select(TokenInSetCount($"s", words, whitespaceRuns = true))
    cg.collect()
    val plan = cg.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"expression fell out of codegen:\n$plan")
  }
}
