package graft.asof

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Property-based check that the ONE-shuffle multi-view as-of join
  * ([[AsOfJoin.backwardMulti]]) is semantically identical to folding
  * [[AsOfJoin.backward]] per view, over random feature tables with
  * duplicate timestamps, per-view TTLs, per-view tie-breaks, unknown
  * keys and duplicate probes. The fold is the independently
  * property-tested reference (AsOfPropertySpec), so equality here
  * transitively pins backwardMulti to the naive oracle.
  */
case class MRowA(k: String, ts: Timestamp, seqa: Long, va: Double)
case class MRowB(k: String, ts: Timestamp, vb: Double)

class AsOfMultiPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime

  private case class Case(
      featsA: List[MRowA],
      featsB: List[MRowB],
      probes: List[(String, Timestamp)],
      ttlA: Long,
      ttlB: Long)

  private val genCase: Gen[Case] = for {
    nKeys <- Gen.choose(1, 4)
    keys = (0 until nKeys).map(i => s"k$i")
    nA <- Gen.choose(0, 30)
    fa <- Gen.listOfN(nA, for {
      k <- Gen.oneOf(keys)
      off <- Gen.choose(0L, 86400L * 8)
      v <- Gen.choose(-50.0, 50.0)
    } yield (k, off, v))
    nB <- Gen.choose(0, 30)
    fb <- Gen.listOfN(nB, for {
      k <- Gen.oneOf(keys)
      off <- Gen.choose(0L, 86400L * 8)
      v <- Gen.choose(-50.0, 50.0)
    } yield (k, off, v))
    nProbes <- Gen.choose(1, 20)
    probes <- Gen.listOfN(nProbes, for {
      k <- Gen.oneOf(keys :+ "unknown")
      off <- Gen.choose(-3600L, 86400L * 9)
    } yield (k, new Timestamp(base + off * 1000L)))
    ttlA <- Gen.oneOf(3600L, 86400L, 86400L * 5)
    ttlB <- Gen.oneOf(7200L, 86400L * 2, 86400L * 30)
  } yield Case(
    fa.zipWithIndex.map { case ((k, off, v), i) =>
      MRowA(k, new Timestamp(base + off * 1000L), i.toLong, v) },
    // view B has NO tie-break column, so equal-(k, ts) rows would be
    // resolved arbitrarily (identically arbitrary in both plans is not
    // guaranteed) — keep (k, ts) unique for B; ties WITH a tie-break
    // are exercised through view A
    fb.distinctBy(t => (t._1, t._2)).map { case (k, off, v) =>
      MRowB(k, new Timestamp(base + off * 1000L), v) },
    probes, ttlA, ttlB)

  private def collect(df: DataFrame) =
    df.select($"k", $"pts", $"va", $"vb")
      .as[(String, Timestamp, Option[Double], Option[Double])]
      .collect().sortBy(r => (r._1, r._2.getTime, r._3, r._4)).toSeq

  test("backwardMulti ≡ per-view backward fold on random tables") {
    val cases = (0 until 12).map { i =>
      genCase(Gen.Parameters.default, Seed(777L + i))
        .getOrElse(sys.error(s"gen failed for seed $i"))
    }
    cases.foreach { c =>
      val pDF = c.probes.toDF("k", "pts")
      // view A carries a tie-break column (seqa, greatest wins); view B
      // has none (engine default tie behavior must also agree)
      val fa = c.featsA.toDF()
      val fb = c.featsB.toDF()

      val multi = AsOfJoin.backwardMulti(
        pDF,
        Seq(
          AsOfJoin.FeatureSide(fa, "ts", Some(c.ttlA),
            tieBreak = Seq("seqa"), outputCols = Some(Seq("va"))),
          AsOfJoin.FeatureSide(fb, "ts", Some(c.ttlB),
            outputCols = Some(Seq("vb")))),
        keys = Seq("k"), probeTsCol = "pts")

      val fold = {
        val s1 = AsOfJoin.backward(pDF, fa, Seq("k"), "pts", "ts",
          Some(c.ttlA), tieBreak = Seq("seqa"), matchedTsName = "_m1")
          .drop("_m1", "seqa")
        AsOfJoin.backward(s1, fb, Seq("k"), "pts", "ts",
          Some(c.ttlB), matchedTsName = "_m2")
          .drop("_m2")
      }

      assert(collect(multi) === collect(fold),
        s"ttlA=${c.ttlA} ttlB=${c.ttlB} nA=${c.featsA.size} nB=${c.featsB.size}")
    }
  }
}
