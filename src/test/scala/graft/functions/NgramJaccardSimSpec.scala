package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

class NgramJaccardSimSpec extends SparkTestBase {
  import spark.implicits._

  // the composed form the fused scalar replaces
  private def composed(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column, w: Int) = {
    val sa = WordShingles(a, w)
    val sb = WordShingles(b, w)
    size(array_intersect(sa, sb)).cast("double") /
      size(array_union(sa, sb))
  }

  private val texts = Seq(
    "", " ", "one", "one two", "one two three", "one two three four",
    "  leading and   inner   runs ", "tab\tseparated\twords here",
    "repeat repeat repeat repeat repeat", "UPPER Case MiXeD words",
    "多字节 字符 混合 ascii words", "a\nb\nc d e", "x " * 30,
    "the same shingle the same shingle", "one two three four five six")

  test("equals the composed intersect/union form on adversarial pairs") {
    val pairs = for (a <- texts; b <- texts) yield (a, b)
    for (w <- Seq(2, 3)) {
      val rows = pairs.toDF("a", "b").select(
        NgramJaccardSim($"a", $"b", w).as("fast"),
        composed($"a", $"b", w).as("slow"))
        .as[(Double, Double)].collect()
      rows.zip(pairs).foreach { case ((f, s), (a, b)) =>
        assert(f === s, s"mismatch on ('${a.take(25)}', '${b.take(25)}') w=$w")
      }
    }
  }

  test("property: equals the composed form on random whitespace-heavy pairs") {
    val genStr = Gen.listOf(Gen.frequency(
      (5, Gen.oneOf("one", "two", "Three", "FOUR", "多字节", "x")),
      (4, Gen.const(" ")),
      (1, Gen.oneOf("\t", "\n", "  ")))).map(_.mkString(" "))
    val strs = (0 until 240).flatMap(i =>
      genStr(Gen.Parameters.default, Seed(i.toLong)))
    val pairs = strs.grouped(2).collect { case Seq(a, b) => (a, b) }.toSeq
    val rows = pairs.toDF("a", "b").select(
      NgramJaccardSim($"a", $"b", 3).as("fast"),
      composed($"a", $"b", 3).as("slow"))
      .as[(Double, Double)].collect()
    rows.zip(pairs).foreach { case ((f, s), (a, b)) =>
      assert(f === s, s"mismatch on ('${a.take(40)}', '${b.take(40)}')")
    }
  }
}
