package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class NgramModeFractionSpec extends SparkTestBase {
  import spark.implicits._

  private def frac(s: String, n: Int): Double =
    Seq(s).toDF("t").select(NgramModeFraction($"t", n).as("f"))
      .as[Double].head()

  test("hand-checked bigram mode fractions") {
    // grams: "a b","b a","a b","b c" → mode "a b" 2/4
    assert(frac("a b a b c", 2) === 0.5)
    // all distinct → 1/total
    assert(math.abs(frac("w1 w2 w3 w4", 2) - 1.0 / 3) < 1e-12)
    // fully repetitive → 1.0 ("x x" every window)
    assert(frac("x x x x x", 2) === 1.0)
  }

  test("normalization: case, whitespace runs and padding match the engine convention") {
    assert(frac("  A  b\ta B  c ", 2) === frac("a b a b c", 2))
  }

  test("edge cases: fewer tokens than n, empty, null") {
    assert(frac("solo", 2) === 1.0)
    assert(frac("", 2) === 1.0)
    val nullFrac = Seq(Option.empty[String]).toDF("t")
      .select(NgramModeFraction($"t", 2).as("f")).as[Option[Double]].head()
    assert(nullFrac.isEmpty) // null in → null out (nullSafeEval)
  }

  test("naive equivalence on generated docs (multiplicity counting, not distinct)") {
    val rng = new scala.util.Random(7)
    val docs = (0 until 50).map { _ =>
      (0 until (3 + rng.nextInt(40)))
        .map(_ => s"w${rng.nextInt(6)}").mkString(" ")
    }
    def naive(s: String, n: Int): Double = {
      // UTF8String.trim strips SPACES only (not \t/\n) — the naive model
      // must mirror that or it is blind to trim-convention regressions
      val spaceTrimmed = s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
      val toks = spaceTrimmed.toLowerCase.replaceAll("\\s+", " ").split(" ", -1)
      if (toks.length < n) 1.0
      else {
        val grams = toks.sliding(n).map(_.mkString(" ")).toSeq
        grams.groupBy(identity).values.map(_.size).max.toDouble / grams.size
      }
    }
    // leading tab: survives the space-only trim, collapses to a leading
    // space, and yields a leading empty token — by convention
    (docs :+ "\tfoo bar foo bar" :+ " \t mixed  ws\ttokens ").foreach { d =>
      assert(math.abs(frac(d, 2) - naive(d, 2)) < 1e-12, s"doc: $d")
      assert(math.abs(frac(d, 3) - naive(d, 3)) < 1e-12, s"doc: $d")
    }
  }

  test("dupLineFraction counts duplicate raw lines") {
    val f = Seq("l1\nl2\nl1\nl3\nl1").toDF("t")
      .select(graft.text.TextAnalysis.dupLineFraction($"t").as("f"))
      .as[Double].head()
    assert(f === 0.4) // 5 lines, 3 distinct
    val single = Seq("just one line").toDF("t")
      .select(graft.text.TextAnalysis.dupLineFraction($"t").as("f"))
      .as[Double].head()
    assert(single === 0.0)
  }

  test("participates in whole-stage codegen") {
    // repartition so the projection isn't constant-folded into a
    // LocalTableScan (same pattern as WhitespaceTokenCountSpec)
    val df = Seq("a b a b").toDF("t").repartition(2)
      .select(NgramModeFraction($"t", 2).as("f"))
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("*("),
      "expression fell out of codegen")
  }
}
