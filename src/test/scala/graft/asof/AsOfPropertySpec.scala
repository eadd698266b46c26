package graft.asof

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Property-based check of the as-of join against a naive per-probe
  * oracle over randomly generated feature tables and probe sets
  * (SURVEY §5.2: "leakage property test (ScalaCheck)"). Gen is driven
  * directly with fixed seeds (the scalatest-scalacheck bridge is not on
  * the offline classpath), so failures are reproducible by seed.
  */
case class FRow(k: String, ts: Timestamp, seq: Long, v: Double)

class AsOfPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime

  private val genTable: Gen[(List[FRow], List[(String, Timestamp)], Long)] = for {
    nKeys <- Gen.choose(1, 5)
    keys = (0 until nKeys).map(i => s"k$i")
    nFeat <- Gen.choose(0, 40)
    feats <- Gen.listOfN(nFeat, for {
      k <- Gen.oneOf(keys)
      off <- Gen.choose(0L, 86400L * 10)  // 10 days, seconds — dup ts likely
      v <- Gen.choose(-100.0, 100.0)
    } yield (k, off, v))
    nProbes <- Gen.choose(1, 25)
    probes <- Gen.listOfN(nProbes, for {
      k <- Gen.oneOf(keys :+ "unknown")
      off <- Gen.choose(-3600L, 86400L * 11)
    } yield (k, new Timestamp(base + off * 1000L)))
    ttl <- Gen.oneOf(3600L, 86400L, 86400L * 3, 86400L * 30)
  } yield (
    feats.zipWithIndex.map { case ((k, off, v), i) =>
      FRow(k, new Timestamp(base + off * 1000L), i.toLong, v)
    },
    probes,
    ttl)

  test("as-of join ≡ naive oracle for random tables (incl. dup-ts ties, unknown keys, TTL)") {
    val cases = (0 until 15).map { i =>
      genTable(Gen.Parameters.default, Seed(90210L + i))
        .getOrElse(sys.error(s"gen failed for seed $i"))
    }
    cases.foreach { case (feats, probes, ttl) =>
      val fDF = feats.toDF()
      val pDF = probes.toDF("k", "pts")

      val got = AsOfJoin.backward(pDF, fDF, Seq("k"), "pts", "ts",
          Some(ttl), tieBreak = Seq("seq"))
        .select($"k", $"pts", $"seq", $"v")
        .as[(String, Timestamp, Option[Long], Option[Double])]
        .collect()
        .groupBy(r => (r._1, r._2.getTime))
        .view.mapValues(_.map(r => (r._3, r._4)).sortBy(_._1)).toMap

      probes.foreach { case (k, pt) =>
        val cand = feats.filter(f =>
          f.k == k && f.ts.getTime <= pt.getTime &&
            f.ts.getTime >= pt.getTime - ttl * 1000L)
        val want =
          if (cand.isEmpty) (None, None)
          else {
            val best = cand.maxBy(f => (f.ts.getTime, f.seq))
            (Some(best.seq), Some(best.v))
          }
        val gotRows = got((k, pt.getTime))
        // every duplicate probe row must carry the same (correct) match
        assert(gotRows.forall(_ == want),
          s"probe ($k, $pt) ttl=$ttl: got $gotRows want $want")
      }
      // no temporal leakage by construction of the oracle: any mismatch
      // above would include a future row; also row count is exact
      assert(got.values.map(_.length).sum === probes.size)
    }
  }
}
