package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the full per-document MinHash signature
  * (`numHashes` mixed Kirsch–Mitzenmacher minima over w-word shingles of
  * normalized text) in ONE byte pass — scan-local, no shuffle.
  *
  * Value-equal by construction to the explode+aggregate pipeline it
  * replaces in [[graft.dedup.Dedup.minhashSignatures]]:
  *
  *   explode(WordShingles(text, w)) as _s
  *     → _h1 = xxhash64(_s), _h2 = xxhash64(_s, lit(seed2))
  *     → groupBy(id).agg(min(mix64(_h1 + i·_h2)) for i < numHashes)
  *
  * because (a) shingle enumeration and normalization are byte-identical
  * to [[WordShingles.compute]] (whitespace-run collapse, lowercase,
  * whole-text shingle below w tokens); (b) Spark's two-child
  * `xxhash64(s, lit(seed2))` chains as
  * `XXH64.hashLong(seed2, XXH64.hashUTF8String(s, 42))`, i.e. _h2 is
  * derived from _h1 — computed here without re-hashing the bytes; and
  * (c) `min` over the DISTINCT shingle set equals `min` over the
  * multiset, so the distinct-set materialization can be skipped
  * entirely. MinHashSignatureSpec property-checks the equality against
  * the composed column form.
  *
  * Why it exists (r6 optimization): the explode form multiplies every
  * document into one row per shingle through a 32-column min hash
  * aggregate — row amplification, agg buffers, and one exchange that a
  * scan-local scalar does not pay; at corpus scale the signature pass
  * was the dominant cost of every LSH query.
  */
case class MinHashSignature(child: Expression, numHashes: Int, w: Int, seed2: Long)
    extends UnaryExpression {

  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")
  require(w >= 1, s"shingle width must be >= 1, got $w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"requires STRING input, got ${child.dataType.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[UTF8String], numHashes, w, seed2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashSignature.compute($c, $numHashes, $w, ${seed2}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {

  def compute(s: UTF8String, numHashes: Int, w: Int, seed2: Long): ArrayData = {
    // normalization byte-identical to WordShingles.compute
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

    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)

    def addShingle(from: Int, to: Int): Unit = {
      // h1 = xxhash64(shingle) (seed 42, Spark's default); h2 =
      // xxhash64(shingle, lit(seed2)) = hashLong(seed2, h1) by Spark's
      // multi-child chaining — no second pass over the bytes.
      // UTF8String.fromBytes wraps the buffer without copying.
      val h1 = XXH64.hashUTF8String(UTF8String.fromBytes(buf, from, to - from), 42L)
      val h2 = XXH64.hashLong(seed2, h1)
      var c = h1 // c accumulates h1 + i*h2 with wrapping add = i·h2 mod 2^64
      var k = 0
      while (k < numHashes) {
        // splitmix64 finalizer — identical to Dedup.mix64's column form
        var z = (c ^ (c >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z = z ^ (z >>> 31)
        if (z < mins(k)) mins(k) = z
        k += 1
        c += h2
      }
    }

    if (nTok < w) addShingle(0, n)
    else {
      var t = 0
      while (t <= nTok - w) {
        addShingle(starts.get(t), ends.get(t + w - 1))
        t += 1
      }
    }
    new GenericArrayData(mins)
  }

  def apply(c: Column, numHashes: Int, w: Int, seed2: Long): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      MinHashSignature(
        org.apache.spark.sql.GraftColumnBridge.expression(c), numHashes, w, seed2))
}
