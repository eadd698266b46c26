package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase

case class MixDoc(doc_id: Long, lang: String)

class MixtureSamplerSpec extends SparkTestBase {
  import spark.implicits._

  // 30k docs across 3 strata with known sizes (round-robin: exact thirds)
  private def docs = spark.range(30000).select(
    col("id").as("doc_id"),
    element_at(array(lit("en"), lit("fr"), lit("code")),
      (col("id") % 3).cast("int") + 1).as("lang"))

  test("deterministic: two invocations select the identical row set") {
    val r = Map("en" -> 0.5, "fr" -> 0.2)
    val a = MixtureSampler.sample(docs, "lang", "doc_id", r).select("doc_id")
      .as[Long].collect().sorted.toSeq
    val b = MixtureSampler.sample(docs, "lang", "doc_id", r).select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(a === b && a.nonEmpty)
  }

  test("realized per-stratum rates land near targets; unlisted strata use the default") {
    val sampled = MixtureSampler.sample(docs, "lang", "doc_id",
      Map("en" -> 0.5, "fr" -> 0.2), defaultRate = 0.05)
    val mix = MixtureSampler.realizedMixture(sampled, docs, "lang")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    // 10k docs/stratum: binomial sd ≈ sqrt(p(1-p)/10000) ≤ 0.005; 5 sd.
    assert(math.abs(mix("en") - 0.5) < 0.025, mix)
    assert(math.abs(mix("fr") - 0.2) < 0.02, mix)
    assert(math.abs(mix("code") - 0.05) < 0.015, mix)
  }

  test("nested samples: raising a rate strictly grows the previous sample") {
    def ids(rate: Double) = MixtureSampler
      .sample(docs.filter($"lang" === "en"), "lang", "doc_id", Map("en" -> rate))
      .select("doc_id").as[Long].collect().toSet
    val s20 = ids(0.2); val s50 = ids(0.5); val s100 = ids(1.0)
    assert(s20.subsetOf(s50) && s50.subsetOf(s100))
    assert(s20.size < s50.size && s50.size < s100.size)
    assert(s100.size === 10000) // rate 1.0 keeps everything
  }

  test("rate 0 drops a stratum entirely; weights are 1/rate") {
    val sampled = MixtureSampler.sample(docs, "lang", "doc_id",
      Map("en" -> 0.5, "fr" -> 0.0), defaultRate = 0.1)
    assert(sampled.filter($"lang" === "fr").count() === 0)
    val w = sampled.select($"lang", $"sample_weight").distinct()
      .as[(String, Double)].collect().toMap
    assert(w("en") === 2.0 && w("code") === 10.0)
  }


  test("assignSplit: every row labeled, realized fractions near targets, fractions validated") {
    val splits = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
    val labeled = MixtureSampler.assignSplit(docs, "doc_id", splits)
    val counts = labeled.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.values.sum === 30000)
    assert(math.abs(counts("train") / 30000.0 - 0.9) < 0.02, counts)
    assert(math.abs(counts("val") / 30000.0 - 0.05) < 0.01, counts)
    assert(math.abs(counts("test") / 30000.0 - 0.05) < 0.01, counts)
    assert(intercept[IllegalArgumentException](
      MixtureSampler.assignSplit(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.2)))
      .getMessage.contains("sum to 1"))
  }

  test("assignSplit is stable under corpus growth: no train/test churn on re-runs") {
    val splits = Seq("train" -> 0.8, "test" -> 0.2)
    val small = MixtureSampler.assignSplit(docs.filter($"doc_id" < 5000),
      "doc_id", splits).select($"doc_id", $"split")
      .as[(Long, String)].collect().toMap
    val big = MixtureSampler.assignSplit(docs, "doc_id", splits)
      .filter($"doc_id" < 5000).select($"doc_id", $"split")
      .as[(Long, String)].collect().toMap
    assert(small === big)
  }

  test("capPerStratum keeps min(cap, |stratum|) rows, deterministic across partitionings") {
    val capped = MixtureSampler.capPerStratum(docs, "lang", "doc_id", 100)
    val counts = capped.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts === Map("en" -> 100L, "fr" -> 100L, "code" -> 100L))
    val a = capped.select("doc_id").as[Long].collect().toSet
    val b = MixtureSampler.capPerStratum(docs.repartition(13), "lang", "doc_id", 100)
      .select("doc_id").as[Long].collect().toSet
    assert(a === b)
    // a small stratum passes through whole
    val tiny = MixtureSampler.capPerStratum(
      docs.filter($"doc_id" < 30), "lang", "doc_id", 100)
    assert(tiny.count() === 30)
  }

  test("the sampling predicate is scan-local: no exchange below the filter") {
    val sampled = MixtureSampler.sample(docs, "lang", "doc_id", Map("en" -> 0.5))
    sampled.collect()
    val plan = sampled.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("stateless sampling/splitting run unchanged on a stream: stream == batch") {
    // the predicate carries no state, so the operators are streaming-
    // compatible as-is — append mode, no watermark, no aggregation
    val rows = (1L to 2000L).map(i =>
      MixDoc(i, if (i % 2 == 0) "en" else "fr"))
    val input = MemoryStream[MixDoc](spark)
    val sampled = MixtureSampler.assignSplit(
      MixtureSampler.sample(input.toDF(), "lang", "doc_id",
        Map("en" -> 0.5, "fr" -> 0.2)),
      "doc_id", Seq("train" -> 0.8, "test" -> 0.2))
    assert(sampled.isStreaming)
    val q = sampled.writeStream.format("memory")
      .queryName("mix_stream").outputMode("append").start()
    try {
      input.addData(rows.take(1000))
      q.processAllAvailable()
      input.addData(rows.drop(1000))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("mix_stream")
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val batch = MixtureSampler.assignSplit(
      MixtureSampler.sample(rows.toDF(), "lang", "doc_id",
        Map("en" -> 0.5, "fr" -> 0.2)),
      "doc_id", Seq("train" -> 0.8, "test" -> 0.2))
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }
}
