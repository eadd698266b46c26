package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: total count of NON-OVERLAPPING occurrences
  * of each pattern of a fixed set in the input, in one byte pass — the
  * char-n-gram scoring primitive for profile-based language ID
  * ([[graft.text.TextAnalysis.langIdNgram]]).
  *
  * Semantics per pattern are independent left-to-right greedy non-overlap
  * — exactly `(length(s) - length(replace(s, p, ''))) / length(p)` — so a
  * SQL oracle can replay the score arithmetically. Counts for different
  * patterns are independent: "sch" and "che" both count their own
  * occurrences in "sche". Byte-level matching of UTF-8 patterns aligns
  * with character boundaries (a pattern's UTF-8 lead byte never equals a
  * continuation byte), so multi-byte patterns (e.g. CJK chars) are safe.
  *
  * Matching is exact byte equality (UTF-8): callers pass pre-normalized
  * text (`lower(col)`) and pre-normalized patterns.
  */
case class SubstringSetCount(
    child: Expression,
    patterns: Seq[String]) extends UnaryExpression {

  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "patterns must be non-empty strings")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"requires STRING input, got ${child.dataType.catalogString}")
  }

  @transient private lazy val table = new SubstringSetCount.PatternTable(
    patterns.map(_.getBytes(StandardCharsets.UTF_8)).toArray)

  override def nullSafeEval(input: Any): Any =
    table.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj(
      "patternTable", table, classOf[SubstringSetCount.PatternTable].getName)
    defineCodeGen(ctx, ev, c => s"$ref.count($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SubstringSetCount {

  /** Byte-level pattern table; serializable so generated code can hold it
    * as a reference object. One scan position tests every pattern (first-
    * byte pre-filter), each pattern carrying its own next-allowed-match
    * cursor for the per-pattern non-overlap rule. */
  final class PatternTable(patterns: Array[Array[Byte]]) extends Serializable {

    def count(s: UTF8String): Int = {
      if (s == null) return 0
      val n = s.numBytes()
      val base = s.getBaseObject
      val off = s.getBaseOffset
      val nextAllowed = new Array[Int](patterns.length)
      var cnt = 0
      var i = 0
      while (i < n) {
        val b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
        var p = 0
        while (p < patterns.length) {
          val pat = patterns(p)
          if (i >= nextAllowed(p) && pat(0) == b && i + pat.length <= n) {
            var j = 1
            while (j < pat.length &&
              org.apache.spark.unsafe.Platform.getByte(base, off + i + j) == pat(j)) j += 1
            if (j == pat.length) {
              cnt += 1
              nextAllowed(p) = i + pat.length
            }
          }
          p += 1
        }
        i += 1
      }
      cnt
    }
  }

  def apply(c: Column, patterns: Seq[String]): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      SubstringSetCount(
        org.apache.spark.sql.GraftColumnBridge.expression(c), patterns))
}
