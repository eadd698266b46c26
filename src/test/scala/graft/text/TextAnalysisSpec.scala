package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  test("quality score: clean prose scores higher than junk") {
    val df = Seq(
      ("good", "the quick brown fox jumps over the lazy dog and runs to the hills"),
      ("junk", ";;;; !!! ### @@@ %%%"),
      ("short", "hi")
    ).toDF("k", "text")
    val scores = df.select($"k", TextAnalysis.qualityScore($"text").as("q"))
      .as[(String, Double)].collect().toMap
    assert(scores("good") > 0.9)
    assert(scores("junk") < scores("good"))
    assert(scores("short") < scores("good"))
  }

  test("langId: marker-word argmax with deterministic ties") {
    val df = Seq(
      ("en", "the cat and the dog sat with one of them"),
      ("de", "der hund und die katze ist nicht da"),
      ("es", "el gato es una maravilla que con la casa"),
      ("fr", "le chat est dans les maisons pour une fois"),
      ("none", "zzz qqq www")
    ).toDF("expected", "text")
    val got = df.select($"expected", TextAnalysis.langId($"text").as("lang"))
      .as[(String, String)].collect().toMap
    assert(got("en") === "en")
    assert(got("de") === "de")
    assert(got("es") === "es")
    assert(got("fr") === "fr")
    assert(got("none") === "de") // all-zero tie → alphabetically first
  }

  test("fingerprint: whitespace/case-insensitive, content-sensitive") {
    val df = Seq(
      (1L, "Hello   World"),
      (2L, "  hello world "),
      (3L, "hello worlds")
    ).toDF("id", "text")
    val fps = df.select($"id", TextAnalysis.fingerprint($"text").as("fp"))
      .as[(Long, String)].collect().toMap
    assert(fps(1L) === fps(2L))
    assert(fps(1L) !== fps(3L))
  }

  test("token counts and ratios") {
    val df = Seq("a b, c! d").toDF("text")
    val row = df.select(
      TextAnalysis.tokenCountRegex($"text").as("toks"),
      TextAnalysis.punctRatio($"text").as("punct"),
      TextAnalysis.meanWordLen($"text").as("mwl")).collect().head
    assert(row.getAs[Int]("toks") === 4)
    assert(math.abs(row.getAs[Double]("punct") - 2.0 / 9.0) < 1e-9)
  }
}
