package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: winnowing fingerprint selection (Schleimer,
  * Wilkerson & Aiken, "Winnowing: local algorithms for document
  * fingerprinting", SIGMOD 2003 — public methodology). Over the document's
  * k-gram rolling hashes (same base-257 / 64-bit-wraparound polynomial as
  * [[RollingHashMin]]), slide a window of `w` consecutive hashes and select
  * each window's minimum — determinized to the LEFTMOST minimum (the paper
  * picks rightmost; any fixed rule preserves the guarantee, and leftmost is
  * the rule a SQL oracle reproduces as `min(pos) where h = min(h)`).
  * Selections are deduplicated by position (selected positions are
  * non-decreasing as the window slides, so consecutive-dedup suffices).
  *
  * Guarantee: any shared substring of length ≥ w + k − 1 yields at least
  * one shared fingerprint — the document-overlap detection bound MOSS-style
  * pipelines rely on, with fingerprint density ~2/(w+1) instead of every
  * gram.
  *
  * Why a custom Expression: selection needs a monotonic deque over the
  * rolling hash stream — O(len) single pass, zero boxing, inside
  * WholeStageCodegen via one static call. A DataFrame formulation explodes
  * len·w rows per document through a shuffle first; at 100 TB the scan-side
  * kernel IS the operator.
  *
  * Semantics: null → null; len < k+w−1 → the single leftmost-min gram hash
  * (one degenerate window), empty string → empty array.
  */
case class Winnow(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow"

  override protected def nullSafeEval(input: Any): Any =
    Winnow.compute(input.asInstanceOf[UTF8String].getBytes, k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Winnow.compute($c.getBytes(), $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)
}

object Winnow {
  final val Base = 257L

  /** O(len) winnowing pass; called from interpreted and generated code. */
  def compute(bytes: Array[Byte], k: Int, w: Int): ArrayData = {
    val len = bytes.length
    if (len == 0) return new GenericArrayData(Array.emptyLongArray)
    val kk = math.min(k, len)
    val m = len - kk + 1 // number of k-gram hashes
    // rolling hash state
    var pow = 1L
    var i = 1
    while (i < kk) { pow *= Base; i += 1 }
    var h = 0L
    i = 0
    while (i < kk) { h = h * Base + (bytes(i) & 0xffL); i += 1 }
    if (m <= w) {
      // one (possibly short) window: leftmost global min
      var min = h
      i = kk
      while (i < len) {
        h = (h - (bytes(i - kk) & 0xffL) * pow) * Base + (bytes(i) & 0xffL)
        if (h < min) min = h
        i += 1
      }
      return new GenericArrayData(Array(min))
    }
    // monotonic deque over (pos, hash): back-pop strictly greater values so
    // the front is the LEFTMOST minimum of the current window
    val dqPos = new Array[Int](m)
    val dqHash = new Array[Long](m)
    var head = 0
    var tail = 0 // exclusive
    val out = new Array[Long](m - w + 1) // ≤ one selection per window
    var nOut = 0
    var lastSel = -1
    var p = 0 // hash position of the current h
    while (p < m) {
      if (p > 0) {
        val j = p + kk - 1 // incoming byte index
        h = (h - (bytes(j - kk) & 0xffL) * pow) * Base + (bytes(j) & 0xffL)
      }
      while (tail > head && dqHash(tail - 1) > h) tail -= 1
      dqPos(tail) = p; dqHash(tail) = h; tail += 1
      val j0 = p - w + 1 // window start once p ≥ w-1
      if (j0 >= 0) {
        while (dqPos(head) < j0) head += 1
        if (dqPos(head) != lastSel) {
          lastSel = dqPos(head)
          out(nOut) = dqHash(head); nOut += 1
        }
      }
      p += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, nOut))
  }

  /** Register `winnow(str, k, w)` for SQL / expr() use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("winnow"),
      new ExpressionInfo(classOf[Winnow].getName, "winnow"),
      (exprs: Seq[Expression]) => {
        require(exprs.size == 3, "winnow(str, k, w)")
        def intLit(e: Expression, name: String): Int = e match {
          case x if x.foldable => x.eval().asInstanceOf[Number].intValue()
          case _ => throw new IllegalArgumentException(s"$name must be a literal")
        }
        Winnow(exprs.head, intLit(exprs(1), "k"), intLit(exprs(2), "w"))
      })
}
