package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class NearestCentroidsSpec extends SparkTestBase {
  import spark.implicits._

  private val ids = Seq(0L, 1L, 2L, 3L)
  private val ctrs = Seq(
    Seq(1.0f, 0.0f), Seq(0.0f, 1.0f), Seq(-1.0f, 0.0f), Seq(0.7f, 0.7f))

  private def naive(v: Array[Float], k: Int): Seq[Long] = {
    def cos(c: Seq[Float]): Double = {
      val dot = v.zip(c).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val nv = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
      val nc = math.sqrt(c.map(x => x.toDouble * x.toDouble).sum)
      dot / (nv * nc)
    }
    ids.zip(ctrs).map { case (id, c) => (id, cos(c)) }
      .filterNot(_._2.isNaN)
      .sortBy { case (id, s) => (-s, id) }
      .take(k).map(_._1)
  }

  test("matches a naive argmax/top-k on handcrafted vectors") {
    val vecs = Seq(
      Array(1.0f, 0.1f), Array(0.1f, 1.0f), Array(-0.9f, -0.1f),
      Array(0.6f, 0.6f), Array(1.0f, 1.0f))
    for (k <- Seq(1, 2, 4)) {
      val got = vecs.toDF("v")
        .select(NearestCentroids($"v", ids, ctrs, k).as("n"))
        .as[Seq[Long]].collect().toSeq
      got.zip(vecs).foreach { case (g, v) =>
        assert(g === naive(v, k), s"k=$k vec=${v.toSeq}")
      }
    }
  }

  test("zero vector yields no centroids (NaN cosines skipped)") {
    val got = Seq(Array(0.0f, 0.0f)).toDF("v")
      .select(NearestCentroids($"v", ids, ctrs, 2)).as[Seq[Long]].head()
    assert(got === Seq.empty)
  }

  test("dimension-mismatched centroids are skipped, not silently truncated") {
    // centroid 9 (3-dim) would win under truncated-dot scoring of a
    // 2-dim vector; it must be excluded like CosineSimilarity's
    // null-on-mismatch, leaving the aligned centroids only
    val mixIds = Seq(0L, 9L)
    val mixCtrs = Seq(Seq(0.9f, 0.1f), Seq(1.0f, 0.0f, 0.0f))
    val got = Seq(Array(1.0f, 0.0f)).toDF("v")
      .select(NearestCentroids($"v", mixIds, mixCtrs, 2)).as[Seq[Long]].head()
    assert(got === Seq(0L))
  }

  test("whole-stage codegen") {
    val df = Seq(Array(1.0f, 0.0f)).toDF("v")
    val cg = df.repartition(2).select(NearestCentroids($"v", ids, ctrs, 2))
    cg.collect()
    val plan = cg.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"expression fell out of codegen:\n$plan")
  }
}
