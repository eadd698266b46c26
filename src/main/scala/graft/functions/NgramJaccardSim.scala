package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: exact w-word-shingle Jaccard similarity
  * of two texts in one fused evaluation — the LSH candidate-verification
  * scalar.
  *
  * Value-equal by construction to the composed form
  * `size(array_intersect(WordShingles(a,w), WordShingles(b,w))) /
  *  size(array_union(WordShingles(a,w), WordShingles(b,w)))`
  * (shingle enumeration byte-identical to [[WordShingles.compute]];
  * `|∪| = |A| + |B| − |∩|` over the distinct shingle sets; same double
  * division) — property-tested in NgramJaccardSimSpec.
  *
  * Why it exists (r6 optimization): the composed form materializes two
  * shingle ARRAYS per candidate row and runs two hash-set operations
  * over them — and because the `jaccard >= threshold` predicate is
  * pushed into the verification join's condition while the output
  * projection recomputes the value, every surviving candidate paid the
  * whole chain twice. The fused scalar does one set build + one
  * membership sweep per evaluation and never materializes arrays.
  */
case class NgramJaccardSim(left: Expression, right: Expression, w: Int)
    extends BinaryExpression {

  require(w >= 1, s"shingle width must be >= 1, got $w")

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"requires (STRING, STRING) inputs, got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    NgramJaccardSim.compute(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.NgramJaccardSim.compute($a, $b, $w)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object NgramJaccardSim {

  /** Distinct shingle set of one text (same enumeration as
    * [[WordShingles.compute]], but as a hash set — no ArrayData). */
  private def shingleSet(s: UTF8String, w: Int): java.util.HashSet[UTF8String] = {
    val lowered = s.trim().toLowerCase()
    val in = lowered.getBytes

    val buf = new Array[Byte](in.length)
    var n = 0
    var i = 0
    var inWs = false
    while (i < in.length) {
      val b = in(i)
      val isWs = b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'
      if (isWs) {
        if (!inWs) { buf(n) = ' '; n += 1; inWs = true }
      } else { buf(n) = b; n += 1; inWs = false }
      i += 1
    }

    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var start = 0
    i = 0
    while (i <= n) {
      if (i == n || buf(i) == ' ') {
        starts.add(start); ends.add(i); start = i + 1
      }
      i += 1
    }
    val nTok = starts.size()

    val set = new java.util.HashSet[UTF8String]()
    if (nTok < w) set.add(UTF8String.fromBytes(buf, 0, n))
    else {
      var t = 0
      while (t <= nTok - w) {
        set.add(UTF8String.fromBytes(buf, starts.get(t), ends.get(t + w - 1) - starts.get(t)))
        t += 1
      }
    }
    set
  }

  def compute(a: UTF8String, b: UTF8String, w: Int): Double = {
    val sa = shingleSet(a, w)
    val sb = shingleSet(b, w)
    var inter = 0
    val it = sb.iterator()
    while (it.hasNext) if (sa.contains(it.next())) inter += 1
    val union = sa.size() + sb.size() - inter
    // both sets are non-empty by construction (even "" yields one
    // shingle), so union >= 1 — same as the composed form, where
    // array_union of two non-empty arrays is non-empty
    inter.toDouble / union
  }

  def apply(a: Column, b: Column, w: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      NgramJaccardSim(
        org.apache.spark.sql.GraftColumnBridge.expression(a),
        org.apache.spark.sql.GraftColumnBridge.expression(b), w))
}
