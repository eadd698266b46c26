package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the fraction of all word n-gram
  * OCCURRENCES taken by the single most frequent n-gram — the Gopher
  * repetition signal ("top n-gram fraction"; heavily repetitive docs
  * score high and are dropped from pretraining corpora).
  *
  * Normalization matches the engine's other text scalars
  * ([[SimHash64]]/[[WordShingles]]): trim, lowercase, collapse
  * whitespace runs to single spaces; tokens = single-space split;
  * n-grams = CONTIGUOUS token windows, counted with multiplicity
  * (unlike [[WordShingles]], which is distinct by design — dedup wants
  * set overlap, repetition scoring wants occurrence mass). Fewer than
  * `n` tokens ⇒ one gram (the whole normalized text) ⇒ fraction 1.0.
  *
  * One HashMap pass per document — the composed columnar form would be
  * either an O(distinct·total) nested HOF (interpreted, quadratic in
  * document length) or an explode + two-level aggregation (shuffles
  * corpus-token-count rows). As a scan-local scalar it rides the same
  * scan as the other quality signals at 100 TB.
  */
case class NgramModeFraction(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (n < 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"n must be >= 1, got $n")
    else if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"requires STRING input, got ${child.dataType.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    NgramModeFraction.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NgramModeFraction.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramModeFraction {

  private val Ws = java.util.regex.Pattern.compile("\\s+")

  def compute(s: UTF8String, n: Int): Double = {
    if (s == null) return 1.0
    // same normalization chain as SimHash64/WordShingles
    val norm = Ws.matcher(s.trim().toLowerCase().toString).replaceAll(" ")
    val toks = norm.split(" ", -1)
    if (toks.length < n) return 1.0 // single whole-text gram
    val counts = new java.util.HashMap[String, Int]()
    val sb = new java.lang.StringBuilder
    var i = 0
    var max = 0
    val total = toks.length - n + 1
    while (i < total) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val g = sb.toString
      val c = counts.merge(g, 1, (a, b) => a + b)
      if (c > max) max = c
      i += 1
    }
    max.toDouble / total
  }

  def apply(c: Column, n: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      NgramModeFraction(
        org.apache.spark.sql.GraftColumnBridge.expression(c), n))
}
