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

  test("langIdNgram: substring profiles fire inside compound words") {
    val df = Seq(
      // no German MARKER WORDS, but 'sch'/'ich'/'ein' inside compounds —
      // the word-marker langId cannot see these, the n-gram one must
      (1L, "geschichtliche scheinbare einheitliche entscheidungen"),
      (2L, "the remaining things are standing in the growing list"),
      (3L, "我的书是在的了我"),
      (4L, "zzz qqq vvv") // no profile hits anywhere: tie at 0 → 'de'
    ).toDF("id", "text")
    val got = df.select($"id", TextAnalysis.langIdNgram($"text").as("p"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) === "de")
    assert(got(2L) === "en")
    assert(got(3L) === "zh")
    assert(got(4L) === "de") // alphabetically-first tie-break, like langId
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
