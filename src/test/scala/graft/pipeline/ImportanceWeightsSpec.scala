package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkTestBase
import graft.functions.HashedNgram

class ImportanceWeightsSpec extends SparkTestBase {
  import spark.implicits._

  private val B = 64
  private val Salt = "spec-dsir"

  // naive reference: independent re-derivation of grams + buckets
  private def naiveGrams(text: String): Seq[String] = {
    val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    toks ++ toks.sliding(2).filter(_.size == 2).map(_.mkString(" "))
  }

  private def naiveBucket(gram: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest((gram + ":" + Salt).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.take(15), 16) % B).toInt
  }

  test("HashedNgram.buckets matches the 15-hex-char md5 parse gram by gram") {
    val texts = Seq("the cat sat on the mat", "  Mixed   CASE text ",
      "solo", "", "   ", "a b c d e f g")
    for (t <- texts) {
      val got = HashedNgram.buckets(UTF8String.fromString(t), B, Salt)
        .toIntArray().toSeq
      val want = naiveGrams(t).map(naiveBucket)
      assert(got === want, s"text='$t'")
    }
  }

  test("score equals the naive per-gram ratio sum, over expression eval") {
    val lrq = Array.tabulate(B)(i => (i * 37 - 1000).toLong)
    val texts = Seq("the cat sat", "un deux trois quatre", "x", "")
    val df = texts.toDF("text")
    val got = ImportanceWeights.score(df, "text", lrq, B, Salt)
      .select("n_grams", "log_w_micro").as[(Long, Long)].collect().toSeq
    val want = texts.map { t =>
      val gs = naiveGrams(t)
      (gs.size.toLong, gs.map(g => lrq(naiveBucket(g))).sum)
    }
    assert(got === want)
  }

  test("bucketCounts histogram sums to total gram occurrences") {
    val df = Seq("one two three", "two three", "three").toDF("text")
    val counts = ImportanceWeights.bucketCounts(df, "text", B, Salt)
    // grams: 3+2 + 2+1 + 1+0 = 9
    assert(counts.sum === 9L)
    assert(counts.length === B)
  }

  test("dsirWeights ranks target-vocabulary documents above off-domain ones") {
    // two disjoint vocabularies; target = lang 'a' slice
    val aWords = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    val bWords = Seq("zulu", "yankee", "xray", "whiskey", "victor")
    val rnd = new scala.util.Random(7)
    def doc(ws: Seq[String]) =
      Seq.fill(20)(ws(rnd.nextInt(ws.size))).mkString(" ")
    val rows = (0 until 50).map(i =>
      (i.toLong, if (i % 2 == 0) "a" else "b",
        if (i % 2 == 0) doc(aWords) else doc(bWords)))
    val df = rows.toDF("doc_id", "lang", "text")
    val scored = ImportanceWeights.dsirWeights(
      df, df.filter($"lang" === "a"), "text", nBuckets = 256, salt = Salt)
      .select($"lang", $"log_w_micro").as[(String, Long)].collect()
    val aMin = scored.filter(_._1 == "a").map(_._2).min
    val bMax = scored.filter(_._1 == "b").map(_._2).max
    assert(aMin > bMax,
      s"every target-vocab doc should outscore every off-domain doc: $aMin vs $bMax")
  }

  test("logRatiosMicro: add-half smoothing keeps unseen buckets finite and quantization is Math.round") {
    val t = Array(10L, 0L, 5L)
    val s = Array(10L, 5L, 0L)
    val lrq = ImportanceWeights.logRatiosMicro(t, s)
    assert(lrq.length === 3)
    val tTot = 15.0 + 0.5 * 3
    val sTot = 15.0 + 0.5 * 3
    val want0 = math.round((math.log(10.5 / tTot) - math.log(10.5 / sTot)) * 1e6)
    assert(lrq(0) === want0)
    assert(lrq(1) < 0 && lrq(2) > 0) // unseen-in-target down, unseen-in-source up
  }

  test("scoring pass is scan-local: zero exchanges in the plan") {
    val df = Seq((1L, "a b c"), (2L, "d e")).toDF("doc_id", "text")
    val scored = ImportanceWeights.score(df, "text", new Array[Long](B), B, Salt)
    scored.collect()
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
