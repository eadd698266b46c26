package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernel for hashed-n-gram operators (DSIR-style importance
  * weighting): tokenize a document (trim → lowercase → `\s+` split,
  * blank → zero tokens — the same normalization chain as
  * [[SimHash64]]/[[NgramModeFraction]]), enumerate unigrams + bigrams,
  * and map each gram to one of `nBuckets` hash buckets via the SAME
  * 60-bit md5 construction as [[graft.pipeline.MixtureSampler.u60]]
  * (first 15 hex chars of `md5(gram ":" salt)` read as an integer) —
  * engine-independent, so a SQL oracle replays buckets exactly.
  */
object HashedNgram {

  private val Ws = java.util.regex.Pattern.compile("\\s+")

  private val Md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Normalized word tokens; empty array for null/blank input. */
  def tokens(s: UTF8String): Array[String] = {
    if (s == null) return Array.empty
    val norm = s.trim().toLowerCase().toString
    if (norm.isEmpty) Array.empty else Ws.split(norm)
  }

  /** Bucket of one gram: u60(md5(gram ":" salt)) mod nBuckets — the
    * top 60 bits of the digest, identical to parsing its first 15 hex
    * chars (what [[graft.pipeline.MixtureSampler.u60]] and the DuckDB
    * oracle compute). */
  def bucket(gram: String, salt: String, nBuckets: Int): Int = {
    val md = Md5.get()
    md.reset()
    val d = md.digest((gram + ":" + salt).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var be = 0L
    var i = 0
    while (i < 8) { be = (be << 8) | (d(i) & 0xffL); i += 1 }
    ((be >>> 4) % nBuckets).toInt
  }

  /** All hashed unigram + bigram buckets of a document, in document
    * order (with multiplicity): 2T-1 entries for T ≥ 1 tokens. */
  def buckets(s: UTF8String, nBuckets: Int, salt: String): ArrayData = {
    val toks = tokens(s)
    val t = toks.length
    val out = new Array[Int](if (t == 0) 0 else 2 * t - 1)
    var i = 0
    while (i < t) { out(i) = bucket(toks(i), salt, nBuckets); i += 1 }
    i = 0
    while (i < t - 1) {
      out(t + i) = bucket(toks(i) + " " + toks(i + 1), salt, nBuckets)
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Scan-local DSIR score: Σ over the document's grams of the
    * per-bucket quantized log importance ratio. Integer accumulation —
    * exact and order-independent, so any SQL engine's grouped SUM over
    * the same per-gram terms reproduces it bit-for-bit. */
  def score(s: UTF8String, nBuckets: Int, salt: String, lrq: Array[Long]): Long = {
    val toks = tokens(s)
    val t = toks.length
    var acc = 0L
    var i = 0
    while (i < t) { acc += lrq(bucket(toks(i), salt, nBuckets)); i += 1 }
    i = 0
    while (i < t - 1) {
      acc += lrq(bucket(toks(i) + " " + toks(i + 1), salt, nBuckets))
      i += 1
    }
    acc
  }
}

/** Native Catalyst expression: the document's hashed unigram+bigram
  * bucket ids (array<int>, document order, with multiplicity). Used by
  * the corpus-distribution pass of
  * [[graft.pipeline.ImportanceWeights]]: `explode` + count(bucket) is a
  * map-side-combined aggregate to ≤ nBuckets rows. Codegen'd — the
  * whole distribution pass stays inside whole-stage codegen up to the
  * tiny final aggregate.
  */
case class HashedNgramBuckets(child: Expression, nBuckets: Int, salt: String)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (nBuckets < 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nBuckets must be >= 1, got $nBuckets")
    else if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"requires STRING input, got ${child.dataType.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    HashedNgram.buckets(input.asInstanceOf[UTF8String], nBuckets, salt)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val saltRef = ctx.addReferenceObj("salt", salt, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashedNgram.buckets($c, $nBuckets, $saltRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedNgramBuckets {
  def apply(c: Column, nBuckets: Int, salt: String): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      HashedNgramBuckets(
        org.apache.spark.sql.GraftColumnBridge.expression(c), nBuckets, salt))
}

/** Native Catalyst expression: the document's DSIR importance score in
  * integer micro-units — Σ over its hashed grams of the quantized
  * per-bucket log ratio `lrq` (computed driver-side by
  * [[graft.pipeline.ImportanceWeights.logRatiosMicro]] from two tiny
  * bucket histograms). One codegen'd pass per document: tokenization,
  * hashing, and the weighted sum never leave the scan — no explode, no
  * per-document shuffle, no float accumulation (exact long adds, so the
  * oracle's grouped integer SUM matches bit-for-bit regardless of
  * evaluation order).
  */
case class HashedNgramRatioScore(
    child: Expression, nBuckets: Int, salt: String, lrq: IndexedSeq[Long])
    extends UnaryExpression {

  // `lrq` is an immutable IndexedSeq, NOT Array: arrays compare by
  // reference, so two structurally identical score expressions were
  // never semanticEquals/canonicalized-equal (missed subexpression
  // elimination and exchange/cache reuse), and a caller-held array
  // could be mutated after construction (r5 ADVICE #3). The eval path
  // still runs on a primitive long[] snapshot.
  @transient private lazy val lrqArr: Array[Long] = lrq.toArray

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (lrq.length != nBuckets)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"lrq must have nBuckets=$nBuckets entries, got ${lrq.length}")
    else if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"requires STRING input, got ${child.dataType.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    HashedNgram.score(input.asInstanceOf[UTF8String], nBuckets, salt, lrqArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val saltRef = ctx.addReferenceObj("salt", salt, "java.lang.String")
    val lrqRef = ctx.addReferenceObj("lrq", lrqArr, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashedNgram.score($c, $nBuckets, $saltRef, $lrqRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedNgramRatioScore {
  def apply(c: Column, nBuckets: Int, salt: String, lrq: Array[Long]): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      HashedNgramRatioScore(
        org.apache.spark.sql.GraftColumnBridge.expression(c), nBuckets, salt,
        // snapshot: the expression must not see caller-side mutation
        scala.collection.immutable.ArraySeq.unsafeWrapArray(lrq.clone())))
}
