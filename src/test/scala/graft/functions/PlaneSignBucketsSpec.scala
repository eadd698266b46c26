package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class PlaneSignBucketsSpec extends SparkTestBase {
  import spark.implicits._

  private val planes = PlaneSignBuckets.gaussianPlanes(8, 4, seed = 42L)

  /** Scala reference: packed sign bits per band. */
  private def naive(v: Array[Float], bands: Int): Seq[Long] = {
    val perBand = planes.size / bands
    (0 until bands).map { b =>
      (0 until perBand).map { j =>
        val plane = planes(b * perBand + j)
        val dot = v.indices.take(plane.size)
          .map(i => v(i).toDouble * plane(i)).sum
        if (dot > 0) 1L << j else 0L
      }.reduce(_ | _)
    }
  }

  test("equals the Scala reference; identical vectors share every bucket") {
    val vecs = Seq(
      Array(1.0f, 0.0f, 0.0f, 0.0f),
      Array(0.2f, -0.7f, 1.3f, 0.05f),
      Array(-1.0f, -1.0f, -1.0f, -1.0f),
      Array(0.2f, -0.7f, 1.3f, 0.05f))
    val got = vecs.toDF("v")
      .select(PlaneSignBuckets($"v", planes, bands = 4).as("b"))
      .as[Seq[Long]].collect().toSeq
    got.zip(vecs).foreach { case (b, v) => assert(b === naive(v, 4)) }
    assert(got(1) === got(3)) // identical vectors, identical buckets
  }

  test("deterministic planes: same (seed, idx) → same matrix") {
    assert(PlaneSignBuckets.gaussianPlanes(8, 4, 42L) ===
      PlaneSignBuckets.gaussianPlanes(8, 4, 42L))
    assert(PlaneSignBuckets.gaussianPlanes(8, 4, 42L) !==
      PlaneSignBuckets.gaussianPlanes(8, 4, 43L))
  }

  test("more than 64 planes per band is rejected (bit packing would wrap)") {
    val wide = PlaneSignBuckets.gaussianPlanes(128, 4, 42L)
    intercept[IllegalArgumentException] {
      Seq(Array(1.0f, 0.0f, 0.0f, 0.0f)).toDF("v")
        .select(PlaneSignBuckets($"v", wide, 1)).collect()
    }
    // 128 planes over 2 bands = 64/band: allowed
    Seq(Array(1.0f, 0.0f, 0.0f, 0.0f)).toDF("v")
      .select(PlaneSignBuckets($"v", wide, 2)).collect()
  }

  test("whole-stage codegen") {
    val df = Seq(Array(1.0f, 2.0f, 3.0f, 4.0f)).toDF("v")
    val cg = df.repartition(2).select(PlaneSignBuckets($"v", planes, 2))
    cg.collect()
    val plan = cg.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"expression fell out of codegen:\n$plan")
  }
}
