package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expression: banded random-hyperplane LSH buckets for
  * a float vector in ONE fused pass — for each band, the packed sign
  * bits of that band's hyperplane dot products.
  *
  * The plane matrix is precomputed on the driver (nPlanes × dim doubles
  * — tiny) and shipped as a codegen reference object, so the per-row
  * work is one dense loop instead of nPlanes interpreted
  * `aggregate(zip_with(...))` traversals (the hyperplane stage is a
  * full-corpus scan in embedding near-dup — at 10⁹ vectors the
  * interpreted form dominates the job).
  *
  * A vector shorter than the plane dimension uses its available
  * components (missing dims contribute 0); a null element zeroes that
  * plane's bit, mirroring the HOF form's null-dot → false sign.
  */
case class PlaneSignBuckets(
    child: Expression,
    planes: Seq[Seq[Double]],
    bands: Int) extends UnaryExpression {

  require(bands >= 1 && planes.nonEmpty && planes.size % bands == 0,
    s"bands ($bands) must divide nPlanes (${planes.size})")
  // a band's sign bits are packed into one Long — more than 64 planes
  // per band would silently wrap `1L << j` (j mod 64) and collide
  // distinct planes into the same bit, degrading recall with no error
  require(planes.size / bands <= 64,
    s"at most 64 planes per band (got ${planes.size / bands})")

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

  @transient private lazy val mat: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any =
    PlaneSignBuckets.compute(input.asInstanceOf[ArrayData], mat, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planeMat", mat, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PlaneSignBuckets.compute($c, $ref, $bands)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PlaneSignBuckets {

  def compute(vec: ArrayData, mat: Array[Array[Double]], bands: Int): ArrayData = {
    val nPlanes = mat.length
    val perBand = nPlanes / bands
    val n = vec.numElements()
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var bucket = 0L
      var j = 0
      while (j < perBand) {
        val plane = mat(b * perBand + j)
        val dims = math.min(plane.length, n)
        var dot = 0.0
        var nullSeen = false
        var i = 0
        while (i < dims) {
          if (vec.isNullAt(i)) nullSeen = true
          else dot += vec.getFloat(i).toDouble * plane(i)
          i += 1
        }
        if (!nullSeen && dot > 0) bucket |= (1L << j)
        j += 1
      }
      out(b) = bucket
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Deterministic gaussian hyperplanes from (seed, planeIdx). */
  def gaussianPlanes(nPlanes: Int, dim: Int, seed: Long): Seq[Seq[Double]] =
    (0 until nPlanes).map { p =>
      val rng = new java.util.Random(seed * 1000003L + p)
      Seq.fill(dim)(rng.nextGaussian())
    }

  def apply(c: Column, planes: Seq[Seq[Double]], bands: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      PlaneSignBuckets(
        org.apache.spark.sql.GraftColumnBridge.expression(c), planes, bands))
}
