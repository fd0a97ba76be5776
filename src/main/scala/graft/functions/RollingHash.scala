package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Karp-Rabin rolling-hash fingerprint kernel: the minimum polynomial
  * hash over all sliding byte windows of width W — the classic
  * winnowing-family document fingerprint (same family as MOSS).
  *
  * hash(window j) = Σ_k b[j+k] · B^(W-1-k) mod M, updated in O(1) per
  * position: h' = (h − b[j]·B^(W-1)) · B + b[j+W] (mod M). One pass over
  * the document, no allocations. B = 257, M = 1_000_000_007 (fits long
  * arithmetic: intermediate ≤ M·B + 255 < 2^63).
  */
object RollingHashKernel {
  final val W = 16
  final val B = 257L
  final val M = 1000000007L

  /** B^(W-1) mod M, for the O(1) window update. */
  final val POW: Long = {
    var p = 1L
    var i = 0
    while (i < W - 1) { p = p * B % M; i += 1 }
    p
  }

  /** Min rolling hash over byte windows; hash of the whole (padded)
    * content when shorter than W. Deterministic for any byte string. */
  def minWindowHash(s: UTF8String): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return 0L
    if (n < W) {
      var h = 0L
      var i = 0
      while (i < n) { h = (h * B + (bytes(i) & 0xff)) % M; i += 1 }
      return h
    }
    var h = 0L
    var i = 0
    while (i < W) { h = (h * B + (bytes(i) & 0xff)) % M; i += 1 }
    var min = h
    var j = 0
    while (j < n - W) {
      h = (h - (bytes(j) & 0xff) * POW % M + M) % M
      h = (h * B + (bytes(j + W) & 0xff)) % M
      if (h < min) min = h
      j += 1
    }
    min
  }
}

/** Codegen'd rolling-hash document fingerprint over a string column. */
case class RollingFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"rolling_fingerprint requires string, got ${t.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_fingerprint"

  override def nullSafeEval(a: Any): Any =
    RollingHashKernel.minWindowHash(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.RollingHashKernel.minWindowHash($a)")

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}
