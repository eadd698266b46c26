package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: count the tokens of a string that equal
  * any word of a fixed set, in one byte pass — replacing the interpreted
  * higher-order `size(filter(split(...), _.isInCollection(words)))`
  * pattern (HOF lambdas are interpreted per token with no codegen; this
  * is a single whole-stage-codegen'd scan with no array materialization).
  *
  * Two tokenizer modes, matching the engine's two split conventions:
  *  - `whitespaceRuns = false`: tokens are the substrings between single
  *    0x20 bytes — `split(text, " ", -1)` semantics (empty tokens can
  *    occur but never match: set words are non-empty).
  *  - `whitespaceRuns = true`: tokens are maximal runs of non-whitespace
  *    (Java `\s` = [ \t\n\x0B\f\r], ASCII-only) — `split(trim(text),
  *    "\\s+")` semantics for the non-empty-word counting use case.
  *
  * Matching is exact byte equality (UTF-8), so callers pass pre-
  * normalized text (e.g. `lower(col)`) and pre-normalized words.
  */
case class TokenInSetCount(
    child: Expression,
    words: Seq[String],
    whitespaceRuns: Boolean) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"requires STRING input, got ${child.dataType.catalogString}")
  }

  @transient private lazy val table = new TokenInSetCount.WordTable(
    words.map(_.getBytes(StandardCharsets.UTF_8)).toArray, whitespaceRuns)

  override def nullSafeEval(input: Any): Any =
    table.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj(
      "wordTable", table, classOf[TokenInSetCount.WordTable].getName)
    defineCodeGen(ctx, ev, c => s"$ref.count($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenInSetCount {

  /** Length-bucketed byte-level word table; serializable so generated
    * code can hold it as a reference object. */
  final class WordTable(
      words: Array[Array[Byte]],
      whitespaceRuns: Boolean) extends Serializable {

    private val maxLen: Int =
      if (words.isEmpty) 0 else words.iterator.map(_.length).max
    private val byLen: Array[Array[Array[Byte]]] = {
      val arr = Array.fill(maxLen + 1)(Array.empty[Array[Byte]])
      words.filter(_.length > 0).groupBy(_.length).foreach {
        case (l, ws) => arr(l) = ws
      }
      arr
    }

    def count(s: UTF8String): Int = {
      if (s == null) return 0
      val n = s.numBytes()
      val base = s.getBaseObject
      val off = s.getBaseOffset
      var i = 0
      var start = 0
      var cnt = 0
      while (i <= n) {
        val isSep = i == n || {
          val b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
          if (whitespaceRuns)
            b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'
          else b == ' '
        }
        if (isSep) {
          val len = i - start
          if (len > 0 && len <= maxLen) {
            val cands = byLen(len)
            var w = 0
            var matched = false
            while (w < cands.length && !matched) {
              val cand = cands(w)
              var j = 0
              while (j < len &&
                org.apache.spark.unsafe.Platform.getByte(base, off + start + j) == cand(j)) j += 1
              if (j == len) matched = true
              w += 1
            }
            if (matched) cnt += 1
          }
          start = i + 1
        }
        i += 1
      }
      cnt
    }
  }

  def apply(c: Column, words: Seq[String], whitespaceRuns: Boolean): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      TokenInSetCount(
        org.apache.spark.sql.GraftColumnBridge.expression(c),
        words, whitespaceRuns))
}
