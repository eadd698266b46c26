package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

class SubstringSetCountSpec extends SparkTestBase {
  import spark.implicits._

  private val patterns = Seq("the", "sch", "aaa", " of", "的", "ción")

  // reference semantics: per-pattern REPLACE arithmetic (the exact form
  // the SQL oracle uses), summed — character counts, like DuckDB LEN
  private def replaceForm(c: Column): Column =
    patterns.map { p =>
      (length(c) - length(regexp_replace(c, java.util.regex.Pattern.quote(p), "")))
        ./(lit(p.length)).cast("int")
    }.reduce(_ + _)

  private val cases = Seq(
    "", "the", "thethe", "ttthe", "aaaa", "aaaaaa", "aaaaaaa",
    "the of sch", "deutsche schule", "x的y的z", "nación y canción",
    " of of", "tthehe", "scsch", "the" * 50, "a" * 200,
    "mixed 的 sch the aaa ción tail")

  test("equals the per-pattern REPLACE arithmetic on adversarial strings") {
    val got = cases.toDF("s").select(
      SubstringSetCount($"s", patterns).as("fast"),
      replaceForm($"s").as("slow")).collect()
    got.zip(cases).foreach { case (r, in) =>
      assert(r.getInt(0) === r.getInt(1), s"mismatch on '${in.take(40)}'")
    }
  }

  test("property: equals REPLACE arithmetic on random strings") {
    val genStr = Gen.listOf(Gen.frequency(
      (4, Gen.oneOf("the", "sch", "aa", "a", "x", "的", "ción", " of", "")),
      (2, Gen.const(" ")))).map(_.mkString)
    val strs = (0 until 300).flatMap(i =>
      genStr(Gen.Parameters.default, Seed(i.toLong)))
    val rows = strs.toDF("s").select(
      SubstringSetCount($"s", patterns).as("fast"),
      replaceForm($"s").as("slow")).as[(Int, Int)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (f, sl) => f == sl })
  }

  test("null input and non-overlap greedy semantics") {
    val r = Seq[(Integer, String)]((1, null), (2, "aaaaa"))
      .toDF("id", "s")
      .select($"id", SubstringSetCount($"s", Seq("aaa")).as("n"))
      .collect().map(x => (x.getInt(0), if (x.isNullAt(1)) -1 else x.getInt(1)))
      .toMap
    assert(r(1) == -1)  // null in, null out (UnaryExpression default)
    assert(r(2) == 1)   // greedy left-to-right: 'aaaaa' has ONE 'aaa'
  }

  test("interpreted eval equals codegen path") {
    val expr = SubstringSetCount(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        "the schthe 的的",
        org.apache.spark.sql.types.StringType),
      patterns)
    val interp = expr.eval(null)
    val viaDf = spark.range(1)
      .select(SubstringSetCount(lit("the schthe 的的"), patterns)).head().getInt(0)
    assert(interp == viaDf)
  }
}
