package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase
import graft.dedup.Dedup

class MinHashSignatureSpec extends SparkTestBase {
  import spark.implicits._

  // the golden-ratio K-M seed the dedup pipeline fixes (Dedup.KmSeed)
  private val KmSeed = 0x9E3779B9L

  private val cases = Seq(
    "", " ", "one", "one two", "one two three", "one two three four",
    "  leading and   inner   runs ", "tab\tseparated\twords here",
    "repeat repeat repeat repeat repeat", "UPPER Case MiXeD words",
    "多字节 字符 混合 ascii words", "a\nb\nc d e", "x " * 50,
    "the same shingle the same shingle the same shingle")

  // the composed column form the native expression replaces:
  // per-shingle K-M combination of two xxhash64 columns through the
  // splitmix64 finalizer, min per function over the DISTINCT shingles
  private def composed(text: org.apache.spark.sql.Column, nh: Int, w: Int) =
    Dedup.minhashSignature(Dedup.shingles(text, w), nh)

  test("equals the composed K-M + splitmix form on adversarial strings") {
    for (w <- Seq(2, 3); nh <- Seq(8, 32)) {
      val got = cases.toDF("s").select(
        MinHashSignature($"s", nh, w, KmSeed).as("fast"),
        composed($"s", nh, w).as("slow"))
        .as[(Seq[Long], Seq[Long])].collect()
      got.zip(cases).foreach { case ((f, s), in) =>
        assert(f === s, s"mismatch on '${in.take(40)}' w=$w nh=$nh")
      }
    }
  }

  test("property: equals the composed form on random whitespace-heavy strings") {
    val genStr = Gen.listOf(Gen.frequency(
      (5, Gen.oneOf("one", "two", "Three", "FOUR", "多字节", "x")),
      (4, Gen.const(" ")),
      (1, Gen.oneOf("\t", "\n", "  ")))).map(_.mkString(" "))
    val strs = (0 until 200).flatMap(i =>
      genStr(Gen.Parameters.default, Seed(i.toLong)))
    val rows = strs.toDF("s").select(
      MinHashSignature($"s", 32, 3, KmSeed).as("fast"),
      composed($"s", 32, 3).as("slow"))
      .as[(Seq[Long], Seq[Long])].collect()
    rows.zip(strs).foreach { case ((f, s), in) =>
      assert(f === s, s"mismatch on '${in.take(60)}'")
    }
  }

  test("minhashSignatures is shuffle-free: no Exchange in the signature plan") {
    val df = cases.toDF("text").withColumn("doc_id", monotonically_increasing_id())
    val sig = Dedup.minhashSignatures(df, "text", "doc_id", 32, 3)
    sig.collect()
    val plan = sig.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"signature plan shuffles:\n$plan")
  }
}
