package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: winnowing document fingerprints
  * (Schleimer/Wilkerson/Aiken, "Winnowing: Local Algorithms for
  * Document Fingerprinting", SIGMOD 2003) in one byte pass.
  *
  *  - Rabin–Karp rolling hash over byte `k`-grams (base-257 polynomial
  *    in mod-2⁶⁴ wraparound arithmetic — engine-independent math, fully
  *    deterministic);
  *  - winnowing window of `w` consecutive k-gram hashes, keeping the
  *    RIGHTMOST minimum per window (the standard robust-winnowing
  *    choice), via a monotonic deque — O(n) total;
  *  - output = sorted distinct fingerprint array (set semantics, so
  *    overlap = |A∩B| / |A∪B| is position-independent).
  *
  * Guarantee: any shared substring of at least w + k - 1 bytes yields at
  * least one shared fingerprint, so fingerprint overlap is a robust
  * near-duplicate / containment signal at a fraction of minhash's cost
  * (one pass, no shingle materialization, no shuffle until the overlap
  * join). Texts shorter than k bytes fingerprint as one whole-text hash.
  */
case class RollingFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1 && w >= 1, s"k and w must be >= 1, got k=$k w=$w")

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
    RollingFingerprints.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingFingerprints.compute($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingFingerprints {

  private val Base = 257L

  /** One pass: rolling k-gram hashes + monotonic-deque window minima →
    * sorted distinct fingerprints. */
  def compute(s: UTF8String, k: Int, w: Int): ArrayData = {
    if (s == null) return new GenericArrayData(Array.empty[Long])
    val n = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    @inline def byteAt(i: Int): Long =
      (org.apache.spark.unsafe.Platform.getByte(base, off + i) & 0xFF).toLong

    if (n == 0) return new GenericArrayData(Array.empty[Long])
    if (n < k) {
      // whole-text hash for short docs
      var h = 0L
      var i = 0
      while (i < n) { h = h * Base + byteAt(i); i += 1 }
      return new GenericArrayData(Array(h))
    }

    val m = n - k + 1 // number of k-grams
    // base^(k-1) with mod-2^64 wraparound
    var pow = 1L
    var p = 1
    while (p < k) { pow *= Base; p += 1 }

    val selected = new java.util.TreeSet[java.lang.Long]()
    // monotonic deque of (hash, index), increasing hashes; ties evicted
    // so the RIGHTMOST minimum survives (robust winnowing)
    val dqHash = new Array[Long](m)
    val dqIdx = new Array[Int](m)
    var head = 0
    var tail = 0 // exclusive

    var h = 0L
    var i = 0
    while (i < k) { h = h * Base + byteAt(i); i += 1 }

    var g = 0 // k-gram index
    while (g < m) {
      if (g > 0) h = (h - byteAt(g - 1) * pow) * Base + byteAt(g + k - 1)
      // evict >= h from the back (rightmost-min tie rule)
      while (tail > head && dqHash(tail - 1) >= h) tail -= 1
      dqHash(tail) = h; dqIdx(tail) = g; tail += 1
      // evict out-of-window from the front
      while (dqIdx(head) <= g - w) head += 1
      // record the window min once the first full window is formed (and
      // for the leading partial windows of short texts)
      if (g >= w - 1 || g == m - 1) selected.add(dqHash(head))
      g += 1
    }

    val out = new Array[Long](selected.size())
    val it = selected.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  def apply(c: Column, k: Int = 8, w: Int = 4): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      RollingFingerprints(
        org.apache.spark.sql.GraftColumnBridge.expression(c), k, w))
}
