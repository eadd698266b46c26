package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expression: ids of the `k` nearest centroids (by
  * cosine) for a float vector, in one fused loop.
  *
  * The centroid table is bounded by construction (nCentroids rows), so
  * it is collected to the driver and shipped as a codegen reference
  * object with PRE-COMPUTED norms — per corpus row the work is one dot
  * product per centroid, versus the interpreted
  * `aggregate(broadcast-struct-array, fold)` form that re-walked the
  * vector per centroid through interpreted lambdas. This is the IVF
  * assignment scan: it runs over the whole corpus at 100 TB.
  *
  * Ordering: cosine descending, ties broken by smaller centroid id
  * (deterministic). Centroids whose cosine is NaN (zero-norm inputs)
  * or whose dimension differs from the input vector are skipped; a
  * vector with null elements yields an empty result.
  */
case class NearestCentroids(
    child: Expression,
    ids: Seq[Long],
    centroids: Seq[Seq[Float]],
    k: Int) extends UnaryExpression {

  require(ids.size == centroids.size && ids.nonEmpty,
    "ids and centroids must align and be non-empty")
  require(k >= 1, s"k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"requires ARRAY<FLOAT> input, got ${other.catalogString}")
    }

  @transient private lazy val table =
    new NearestCentroids.CentroidTable(
      ids.toArray, centroids.map(_.toArray).toArray)

  override def nullSafeEval(input: Any): Any =
    table.nearest(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidTable", table,
      classOf[NearestCentroids.CentroidTable].getName)
    defineCodeGen(ctx, ev, c => s"$ref.nearest($c, $k)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroids {

  /** Centroid matrix + precomputed norms; serializable codegen ref. */
  final class CentroidTable(
      ids: Array[Long],
      mat: Array[Array[Float]]) extends Serializable {

    private val norms: Array[Double] = mat.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i).toDouble * c(i).toDouble; i += 1 }
      math.sqrt(s)
    }

    def nearest(vec: ArrayData, k: Int): ArrayData = {
      val n = vec.numElements()
      var i = 0
      var vnormSq = 0.0
      while (i < n) {
        if (vec.isNullAt(i)) return new GenericArrayData(Array.empty[Long])
        val x = vec.getFloat(i).toDouble
        vnormSq += x * x
        i += 1
      }
      val vnorm = math.sqrt(vnormSq)

      val kk = math.min(k, ids.length)
      val topCos = Array.fill(kk)(Double.NegativeInfinity)
      val topId = new Array[Long](kk)
      var filled = 0
      var c = 0
      while (c < mat.length) {
        val ctr = mat(c)
        // skip dimension-mismatched centroids entirely — a truncated dot
        // over full-length norms is quietly wrong (CosineSimilarity
        // returns null on length mismatch for the same reason)
        val dot = if (ctr.length != n) Double.NaN else {
          var d = 0.0
          var j = 0
          while (j < n) { d += vec.getFloat(j).toDouble * ctr(j); j += 1 }
          d
        }
        val cos = dot / (vnorm * norms(c))
        if (!cos.isNaN) {
          // insertion into the running top-k (cos desc, id asc on ties)
          var pos = filled
          while (pos > 0 && (topCos(pos - 1) < cos ||
            (topCos(pos - 1) == cos && topId(pos - 1) > ids(c)))) pos -= 1
          if (pos < kk) {
            var m = math.min(filled, kk - 1)
            while (m > pos) { topCos(m) = topCos(m - 1); topId(m) = topId(m - 1); m -= 1 }
            topCos(pos) = cos
            topId(pos) = ids(c)
            if (filled < kk) filled += 1
          }
        }
        c += 1
      }
      new GenericArrayData(topId.take(filled))
    }
  }

  def apply(c: Column, ids: Seq[Long], centroids: Seq[Seq[Float]], k: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      NearestCentroids(
        org.apache.spark.sql.GraftColumnBridge.expression(c), ids, centroids, k))
}
