package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.dedup.Dedup

class RollingFingerprintsSpec extends SparkTestBase {
  import spark.implicits._

  /** Naive reference: all k-gram rolling hashes, min per w-window
    * (rightmost min), distinct sorted. */
  private def naive(text: String, k: Int, w: Int): Seq[Long] = {
    val bytes = text.getBytes("UTF-8").map(b => (b & 0xFF).toLong)
    val n = bytes.length
    if (n == 0) return Seq.empty
    if (n < k) return Seq(bytes.foldLeft(0L)((h, b) => h * 257L + b))
    val grams = (0 to n - k).map { i =>
      bytes.slice(i, i + k).foldLeft(0L)((h, b) => h * 257L + b)
    }
    val mins =
      if (grams.length < w) Seq(grams.zipWithIndex.minBy(t => (t._1, -t._2))._1)
      else grams.sliding(w).map(win => win.zipWithIndex.minBy(t => (t._1, -t._2))._1).toSeq
    mins.distinct.sorted
  }

  private val cases = Seq(
    "", "a", "short", "the quick brown fox jumps over the lazy dog",
    "aaaaaaaaaaaaaaaaaaaaaaaa", // degenerate: all k-grams equal
    "多字节 字符 混合 ascii text with unicode",
    "one two three four five six seven eight nine ten " * 10)

  test("equals the naive winnowing implementation (k=8, w=4 and k=16, w=8)") {
    for ((k, w) <- Seq((8, 4), (16, 8))) {
      val got = cases.toDF("s")
        .select(RollingFingerprints($"s", k, w).as("fp"))
        .as[Seq[Long]].collect()
      got.zip(cases).foreach { case (fp, in) =>
        assert(fp === naive(in, k, w), s"mismatch on '${in.take(40)}' k=$k w=$w")
      }
    }
  }

  test("winnowing guarantee: shared substrings >= w+k-1 bytes share fingerprints") {
    val doc = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    val withPrefix = "совершенно unrelated prefix text goes here " + doc
    val Seq(a, b) = Seq(doc, withPrefix).toDF("s")
      .select(RollingFingerprints($"s", 8, 4).as("fp"))
      .as[Seq[Long]].collect().toSeq
    val shared = a.toSet.intersect(b.toSet).size.toDouble
    assert(shared / a.toSet.size >= 0.8,
      s"prefix-extended doc should keep most fingerprints: ${shared / a.toSet.size}")

    val unrelated = "zzz qqq www eee rrr ttt yyy uuu " * 10
    val Seq(c) = Seq(unrelated).toDF("s")
      .select(RollingFingerprints($"s", 8, 4).as("fp"))
      .as[Seq[Long]].collect().toSeq
    assert(a.toSet.intersect(c.toSet).isEmpty)
  }

  test("null input and whole-stage codegen") {
    val df = Seq(Option("some text here"), None).toDF("s")
    val got = df.select(RollingFingerprints($"s", 8, 4).as("fp"))
      .as[Option[Seq[Long]]].collect().toSeq
    assert(got.head.exists(_.nonEmpty))
    assert(got(1).isEmpty)

    val cg = df.repartition(2).select(RollingFingerprints($"s", 8, 4))
    cg.collect()
    val plan = cg.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"expression fell out of codegen:\n$plan")
  }

  test("winnowNearDup: exact copies at overlap 1.0, mutated copies high, unrelated absent") {
    val rng = new scala.util.Random(23)
    val vocab = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu".split(" ")
    val base = (0 until 40).map { i =>
      (i.toLong, Array.fill(40 + rng.nextInt(20))(vocab(rng.nextInt(vocab.length))).mkString(" "))
    }
    val exact = base.take(10).map { case (id, t) => (id + 1000L, t) }
    val mutated = base.take(10).map { case (id, t) =>
      (id + 2000L, t.split(" ").dropRight(3).mkString(" "))
    }
    val docs = (base ++ exact ++ mutated).toDF("doc_id", "text")

    val pairs = Dedup.winnowNearDup(docs, "text", "doc_id", k = 16, w = 8,
      threshold = 0.5, maxBucket = 512)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, o) => (a, b) -> o }.toMap

    (0L until 10L).foreach { i =>
      assert(pairs.get((i, i + 1000L)).contains(1.0), s"exact copy $i not at overlap 1.0")
      assert(pairs.contains((i, i + 2000L)), s"mutated copy $i not found")
    }
  }

  test("winnowNearDup: boilerplate dropped by maxBucket leaves numerator " +
    "and denominator consistent (exact copies stay at 1.0)") {
    // 10 unrelated docs + 1 exact-copy pair all share a long boilerplate
    // prefix whose fingerprints land in a bucket of 12 > maxBucket = 4.
    // With a consistent universe the copies still overlap at exactly 1.0;
    // sizing docs over ALL fingerprints would push them below 1.0.
    val boiler = "this text is the standard license header that every " +
      "document in the corpus repeats verbatim before its actual content " +
      "begins and it is long enough to emit several fingerprints"
    val docs = ((0 until 10).map(i => (i.toLong, s"$boiler unique tail $i " +
        s"with words ${"x" * (i + 3)} ${"y" * (2 * i + 5)} $i end")) ++
      Seq((100L, s"$boiler the copied document body is right here"),
          (101L, s"$boiler the copied document body is right here")))
      .toDF("doc_id", "text")

    val pairs = Dedup.winnowNearDup(docs, "text", "doc_id", k = 16, w = 8,
      threshold = 0.5, maxBucket = 4)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, o) => (a, b) -> o }.toMap

    assert(pairs.get((100L, 101L)).contains(1.0),
      s"exact copies not at overlap 1.0: $pairs")
    // the boilerplate alone must not pair up unrelated docs
    assert(pairs.keySet === Set((100L, 101L)))
  }
}
