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

  test("gumbelMicro matches the driver-side re-derivation key by key") {
    val keys = (0L until 200L).toSeq
    val got = keys.toDF("doc_id")
      .select($"doc_id", ImportanceWeights.gumbelMicro($"doc_id", "spec-g").as("g"))
      .as[(Long, Long)].collect().toMap
    def naive(k: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest((k.toString + ":spec-g").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val u = (java.lang.Long.parseLong(hex.take(15), 16) + 0.5) / math.pow(2, 60)
      math.floor(-math.log(-math.log(u)) * 1e6 + 0.5).toLong
    }
    keys.foreach(k => assert(got(k) === naive(k), s"key $k"))
  }

  test("resampleTopK: exactly k rows, deterministic across runs and partitionings") {
    val rows = (0 until 300).map(i => (i.toLong, s"w$i w${i % 7}", (i % 50).toLong * 1000))
    val df = rows.toDF("doc_id", "text", "log_w_micro")
    val a = ImportanceWeights.resampleTopK(df, "doc_id", 40)
      .select("doc_id").as[Long].collect().toSet
    val b = ImportanceWeights.resampleTopK(df.repartition(13), "doc_id", 40)
      .select("doc_id").as[Long].collect().toSet
    assert(a.size === 40)
    assert(a === b)
  }

  test("resampleTopK prefers high-weight docs: a dominant weight gap overrides the Gumbel noise") {
    // Gumbel(0,1) spans ~[-2, 6] in practice; a 100-unit log-weight gap
    // (1e8 micro) makes selection deterministic in favor of the heavy half
    val rows = (0 until 100).map(i =>
      (i.toLong, "x", if (i < 50) 100000000L else 0L))
    val picked = ImportanceWeights.resampleTopK(
        rows.toDF("doc_id", "text", "log_w_micro"), "doc_id", 50)
      .select("doc_id").as[Long].collect().toSet
    assert(picked === (0L until 50L).toSet)
  }

  test("resampleTopK with equal weights is an unbiased hash draw: selection = top-k by gumbel alone") {
    val df = (0 until 200).map(i => (i.toLong, 0L)).toDF("doc_id", "log_w_micro")
    val picked = ImportanceWeights.resampleTopK(df, "doc_id", 30)
      .select("doc_id").as[Long].collect().toSet
    val byGumbel = df.select($"doc_id",
        ImportanceWeights.gumbelMicro($"doc_id").as("g"))
      .as[(Long, Long)].collect().sortBy { case (id, g) => (-g, id) }
      .take(30).map(_._1).toSet
    assert(picked === byGumbel)
  }

  test("resampleByQuantile lands within the GK rank bound of the requested fraction") {
    val df = (0 until 2000).map(i => (i.toLong, (i % 100).toLong)).toDF("doc_id", "log_w_micro")
    val kept = ImportanceWeights.resampleByQuantile(df, "doc_id", 0.25, accuracy = 10000)
    val n = kept.count()
    // accuracy=10000 on 2000 rows: rank error < 1 row; ties at the
    // threshold are excluded by the strict > so allow a small band
    assert(n >= 400 && n <= 600, s"kept $n of 2000 for fraction 0.25")
    // survivors must be exactly the global top-n by (score, id) order
    val ids = kept.select("doc_id").as[Long].collect().toSet
    val all = ImportanceWeights.resampleTopK(df, "doc_id", n.toInt)
      .select("doc_id").as[Long].collect().toSet
    assert(ids === all)
  }

  test("resampleByQuantile on an empty corpus fails with the cause, not a bare NPE") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "log_w_micro")
    val e = intercept[IllegalArgumentException] {
      ImportanceWeights.resampleByQuantile(empty, "doc_id", 0.5)
    }
    assert(e.getMessage.contains("empty corpus"))
  }

  test("pipeline dsir stage keeps the Gumbel-top-k of the cleaned survivors") {
    val aWords = Seq("alpha", "beta", "gamma", "delta")
    val bWords = Seq("zulu", "yankee", "xray", "whiskey")
    val rnd = new scala.util.Random(11)
    def doc(ws: Seq[String]) =
      Seq.fill(30)(ws(rnd.nextInt(ws.size))).mkString(" ")
    val rows = (0 until 60).map { i =>
      (i.toLong, if (i % 2 == 0) doc(aWords) else doc(bWords))
    }
    val df = rows.toDF("doc_id", "text")
    val target = df.filter($"doc_id" % 2 === 0)
    val langs = df.select(graft.text.TextAnalysis.langId($"text")).distinct()
      .collect().map(_.getString(0)).toSet
    val cfg = PretrainPipeline.Config(
      langs = langs, minQuality = 0.0,
      dsir = Some(PretrainPipeline.Dsir(target, k = 10)))
    val out = PretrainPipeline.clean(df, cfg = cfg)
    val picked = out.select("doc_id").as[Long].collect()
    assert(picked.length === 10)
    assert(picked.forall(_ % 2 == 0),
      s"target-vocab docs should dominate the selection: ${picked.mkString(",")}")
    assert(out.columns.contains("score_micro"))
  }

  test("scoring pass is scan-local: zero exchanges in the plan") {
    val df = Seq((1L, "a b c"), (2L, "d e")).toDF("doc_id", "text")
    val scored = ImportanceWeights.score(df, "text", new Array[Long](B), B, Salt)
    scored.collect()
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
