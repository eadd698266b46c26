package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class CosineSimilaritySpec extends SparkTestBase {
  import spark.implicits._

  // the interpreted HOF form the native expression replaces
  private def hofCos(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))
    val nb = sqrt(aggregate(transform(b, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))
    dot / (na * nb)
  }

  test("bit-identical to the HOF form on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val pairs = emb.as("a").join(emb.as("b"),
      col("a.vec_id") + 1 === col("b.vec_id"))
      .select(col("a.embedding").as("va"), col("b.embedding").as("vb"))
    val got = pairs.select(
      CosineSimilarity($"va", $"vb").as("fast"),
      hofCos($"va", $"vb").as("slow"))
      .as[(Double, Double)].collect()
    assert(got.length > 100)
    got.foreach { case (f, s) =>
      assert(java.lang.Double.doubleToLongBits(f) ===
        java.lang.Double.doubleToLongBits(s))
    }
  }

  test("identity, orthogonality, null and length-mismatch semantics") {
    val rows = Seq(
      (Some(Array(1.0f, 2.0f, 3.0f)), Some(Array(1.0f, 2.0f, 3.0f))),   // self
      (Some(Array(1.0f, 0.0f)), Some(Array(0.0f, 1.0f))),               // orthogonal
      (Some(Array(1.0f, 0.0f)), Some(Array(1.0f, 0.0f, 0.0f))),         // len mismatch
      (None, Some(Array(1.0f)))                                          // null array
    ).toDF("a", "b")
    val got = rows.select(CosineSimilarity($"a", $"b").as("c"))
      .as[Option[Double]].collect().toSeq
    assert(math.abs(got.head.get - 1.0) < 1e-12)
    assert(got(1).get === 0.0)
    assert(got(2).isEmpty)
    assert(got(3).isEmpty)
  }

  test("whole-stage codegen") {
    val df = Seq((Array(1.0f, 2.0f), Array(2.0f, 1.0f))).toDF("a", "b")
    val cg = df.repartition(2).select(CosineSimilarity($"a", $"b"))
    cg.collect()
    val plan = cg.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"expression fell out of codegen:\n$plan")
  }
}
