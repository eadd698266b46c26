package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: distinct w-word shingles of normalized
  * text in one pass — byte-for-byte the same output as the composed
  * form
  * `array_distinct(transform(sequence(...), i => concat_ws(" ",
  * slice(split(lower(regexp_replace(trim(text), "\\s+", " ")), " "),
  * i+1, w))))` (with the whole normalized text as the single shingle
  * when there are fewer than w tokens), but with no interpreted lambda,
  * no token-array materialization, and no per-shingle string
  * concatenation: after whitespace-run collapse every separator is one
  * 0x20 byte, so each shingle IS a contiguous slice of the normalized
  * buffer.
  *
  * Shingling is the scan-dominant stage of minhash/Jaccard dedup; the
  * interpreted form was the largest remaining non-codegen cost in the
  * dedup pipeline.
  */
case class WordShingles(child: Expression, w: Int) extends UnaryExpression {

  require(w >= 1, s"shingle width must be >= 1, got $w")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"requires STRING input, got ${child.dataType.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShingles.compute($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {

  def compute(s: UTF8String, w: Int): ArrayData = {
    if (s == null) return new GenericArrayData(Array.empty[AnyRef])
    // trim spaces then lowercase (order-independent wrt whitespace),
    // matching lower(regexp_replace(trim(text), "\s+", " "))
    val lowered = s.trim().toLowerCase()
    val in = lowered.getBytes

    // collapse ASCII whitespace runs to single 0x20
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

    // token boundaries: single-space split semantics (empties included)
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

    if (nTok < w)
      return new GenericArrayData(
        Array[AnyRef](UTF8String.fromBytes(buf, 0, n)))

    // every separator is one space → a shingle is a contiguous slice
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var t = 0
    while (t <= nTok - w) {
      val from = starts.get(t)
      val to = ends.get(t + w - 1)
      seen.add(UTF8String.fromBytes(buf, from, to - from))
      t += 1
    }
    val out = new Array[AnyRef](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  def apply(c: Column, w: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      WordShingles(
        org.apache.spark.sql.GraftColumnBridge.expression(c), w))
}
