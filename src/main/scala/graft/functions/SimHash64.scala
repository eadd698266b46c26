package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: 64-bit SimHash of a document in one
  * pass — normalize (trim / lowercase / collapse whitespace runs),
  * split on single spaces, hash each DISTINCT token with xxhash64
  * (catalyst's XXH64, seed 42 — the same function as the `xxhash64()`
  * column), majority-vote each of the 64 bits.
  *
  * Replaces the explode → groupBy(id) → 64 SUM-aggregate pipeline:
  * simhash becomes a scan-local scalar with NO shuffle at all (the old
  * shape shuffled one row per document token — corpus-token-count rows
  * through an exchange at 100 TB).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"requires STRING input, got ${child.dataType.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {

  private val Seed = 42L // xxhash64()'s default seed

  def compute(s: UTF8String): Long = {
    if (s == null) return 0L
    val lowered = s.trim().toLowerCase()
    val in = lowered.getBytes

    // collapse ASCII whitespace runs to single 0x20 (same normalization
    // as WordShingles / the composed HOF form)
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

    // distinct tokens (single-space split, empties included once)
    val seen = new java.util.HashSet[UTF8String]()
    val votes = new Array[Int](64)
    var start = 0
    i = 0
    while (i <= n) {
      if (i == n || buf(i) == ' ') {
        val tok = UTF8String.fromBytes(buf, start, i - start)
        if (seen.add(tok)) {
          val h = XXH64.hashUnsafeBytes(
            buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + start,
            i - start, Seed)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }

    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def apply(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      SimHash64(org.apache.spark.sql.GraftColumnBridge.expression(c)))
}
