package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

class WordShinglesSpec extends SparkTestBase {
  import spark.implicits._

  // the composed HOF form WordShingles replaces (sets must match as
  // SETS and as sequences: both keep first-occurrence order)
  private def hofForm(text: org.apache.spark.sql.Column, w: Int) = {
    val toks = split(lower(regexp_replace(trim(text), "\\s+", " ")), " ")
    val n = size(toks)
    array_distinct(
      when(n < w, array(concat_ws(" ", toks)))
        .otherwise(
          transform(sequence(lit(0), n - w),
            i => concat_ws(" ", slice(toks, i + lit(1), lit(w))))))
  }

  private val cases = Seq(
    "", " ", "one", "one two", "one two three", "one two three four",
    "  leading and   inner   runs ", "tab\tseparated\twords here",
    "repeat repeat repeat repeat repeat", "UPPER Case MiXeD words",
    "多字节 字符 混合 ascii words", "a\nb\nc d e", "x " * 50)

  test("equals the composed HOF form on adversarial strings (w=3 and w=2)") {
    for (w <- Seq(2, 3)) {
      val got = cases.toDF("s").select(
        WordShingles($"s", w).as("fast"), hofForm($"s", w).as("slow"))
        .as[(Seq[String], Seq[String])].collect()
      got.zip(cases).foreach { case ((f, s), in) =>
        assert(f === s, s"mismatch on '${in.take(40)}' w=$w")
      }
    }
  }

  test("property: equals the HOF form on random whitespace-heavy strings") {
    val genStr = Gen.listOf(Gen.frequency(
      (5, Gen.oneOf("one", "two", "Three", "FOUR", "多字节", "x")),
      (4, Gen.const(" ")),
      (1, Gen.oneOf("\t", "\n", "  ")))).map(_.mkString(" "))
    val strs = (0 until 200).flatMap(i =>
      genStr(Gen.Parameters.default, Seed(i.toLong)))
    val rows = strs.toDF("s").select(
      WordShingles($"s", 3).as("fast"), hofForm($"s", 3).as("slow"))
      .as[(Seq[String], Seq[String])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (f, s) => assert(f === s) }
  }

  test("null input and whole-stage codegen") {
    val df = Seq(Option("a b c d"), None).toDF("s")
    val got = df.select(WordShingles($"s", 3).as("sh"))
      .as[Option[Seq[String]]].collect().toSeq
    assert(got.head === Some(Seq("a b c", "b c d")))
    assert(got(1).isEmpty)

    val cg = df.repartition(2).select(WordShingles($"s", 3))
    cg.collect()
    val plan = cg.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"expression fell out of codegen:\n$plan")
  }
}
