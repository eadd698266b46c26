package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SimHash64Spec extends SparkTestBase {
  import spark.implicits._

  // the composed HOF form SimHash64 replaces (token hashes via the
  // xxhash64() column function, majority vote per bit)
  private def hofForm(text: org.apache.spark.sql.Column) = {
    val toks = array_distinct(split(lower(regexp_replace(trim(text), "\\s+", " ")), " "))
    val hashes = transform(toks, t => xxhash64(t))
    val votes = aggregate(
      hashes,
      array((0 until 64).map(_ => lit(0L)): _*),
      (acc, h) => {
        val deltas = array((0 until 64).map { b =>
          when(shiftright(h, b).bitwiseAND(lit(1L)) === 1, 1L).otherwise(-1L)
        }: _*)
        zip_with(acc, deltas, (a, d) => a + d)
      })
    (0 until 64).map { b =>
      when(element_at(votes, b + 1) > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
  }

  private val cases = Seq(
    "", " ", "one", "the quick brown fox", "THE   Quick\tBrown\nFOX ",
    "repeat repeat repeat distinct", "多字节 字符 mixed ascii tokens",
    "a b c d e f g h i j k l m n o p")

  test("bit-identical to the composed xxhash64 vote form") {
    val got = cases.toDF("s").select(
      SimHash64($"s").as("fast"), hofForm($"s").as("slow"))
      .as[(Long, Long)].collect()
    got.zip(cases).foreach { case ((f, s), in) =>
      assert(f === s, s"mismatch on '${in.take(40)}'")
    }
  }

  test("normalization-equal docs share the hash; different docs differ") {
    val got = Seq(
      "the quick brown fox",
      "  THE quick   BROWN fox ",
      "completely different words entirely").toDF("s")
      .select(SimHash64($"s")).as[Long].collect()
    assert(got(0) === got(1))
    assert(got(0) !== got(2))
  }

  test("null input and whole-stage codegen") {
    val df = Seq(Option("a b"), None).toDF("s")
    val got = df.select(SimHash64($"s").as("h")).as[Option[Long]].collect().toSeq
    assert(got.head.isDefined)
    assert(got(1).isEmpty)

    val cg = df.repartition(2).select(SimHash64($"s"))
    cg.collect()
    val plan = cg.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"expression fell out of codegen:\n$plan")
  }
}
