package graft.pipeline

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class PackingSpec extends SparkTestBase {
  import spark.implicits._

  // seeded token counts incl. zero-token rows and docs longer than capacity
  private def docs(n: Int) = {
    val rnd = new scala.util.Random(11)
    (0 until n).map(i => (i.toLong,
      if (i % 17 == 0) 0L else (rnd.nextInt(120) + 1).toLong))
      .toDF("doc_id", "n_tokens")
  }

  // the semantic spec: one global window (fine at test scale)
  private def naive(df: org.apache.spark.sql.DataFrame, cap: Long) = {
    val h = MixtureSampler.u60(col("doc_id"), "graft-pack")
    val w = Window.orderBy(h, col("doc_id"))
    df.filter($"n_tokens" > 0)
      .withColumn("seq", row_number().over(w).cast("long"))
      .withColumn("cum_tokens", sum($"n_tokens").over(w))
      .withColumn("bin_first", expr(s"(cum_tokens - n_tokens) div ${cap}L"))
      .withColumn("bin_last", expr(s"(cum_tokens - 1) div ${cap}L"))
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "n_tokens", "seq", "cum_tokens", "bin_first", "bin_last")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq

  test("sharded prefix sum equals the single-window result exactly") {
    val d = docs(500)
    for (shards <- Seq(1, 3, 8)) {
      val got = rows(Packing.pack(d, "doc_id", "n_tokens", 256L, nShards = shards))
      val want = rows(naive(d, 256L))
      assert(got === want, s"nShards=$shards")
    }
  }

  test("invariants: dense 1..N seq, cum diffs = tokens, bins consistent, zero-token rows dropped") {
    val out = rows(Packing.pack(docs(300), "doc_id", "n_tokens", 100L, nShards = 4))
    assert(out.size === 300 - (300 + 16) / 17) // zero-token rows dropped
    val bySeq = out.sortBy(_._3)
    assert(bySeq.map(_._3) === (1L to bySeq.size.toLong))
    var prevCum = 0L
    for ((_, tok, _, cum, bf, bl) <- bySeq) {
      assert(cum === prevCum + tok)
      assert(bf === (cum - tok) / 100L && bl === (cum - 1) / 100L && bf <= bl)
      prevCum = cum
    }
    // a 120-token doc at capacity 100 must straddle at least one boundary
    assert(out.exists { case (_, tok, _, _, bf, bl) => tok > 100L && bl > bf })
  }

  test("deterministic: identical output across invocations and shard counts") {
    val a = rows(Packing.pack(docs(200), "doc_id", "n_tokens", 64L, nShards = 5))
    val b = rows(Packing.pack(docs(200), "doc_id", "n_tokens", 64L, nShards = 2))
    assert(a === b)
  }

  test("scale shape: the window runs hash-partitioned, never SinglePartition") {
    val out = Packing.pack(docs(400), "doc_id", "n_tokens", 128L, nShards = 8)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    assert(plan.contains("hashpartitioning(__shard"), plan)
    assert(!plan.contains("SinglePartition"), plan)
  }
}
