package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bounded edit distance via Myers' bit-parallel algorithm (Myers, JACM
  * 1999; Hyyrö's 2001 formulation — public-domain algorithms): exact
  * Levenshtein distance when it is ≤ k, else -1. Drop-in contract twin of
  * Spark's built-in `levenshtein(l, r, k)` — bit-identity against it is
  * asserted in DotProductSpec over random ASCII/unicode/supplementary
  * inputs, so either can serve the fuzzy-name verify stage.
  *
  * Shape: the pattern (shorter string, ≤ 64 code points) is compiled into
  * per-character bitmasks (Peq); one pass over the text then advances the
  * whole DP column per character with ~15 word ops — O(n) vs the classic
  * DP's O(mn) cell updates. ASCII patterns use a flat 128-entry mask
  * table; any non-ASCII or > 64-code-point input falls back to the
  * built-in threshold DP (`UTF8String.levenshteinDistance(other, k)`), so
  * semantics hold on every input while the hot path (supplier-style ASCII
  * names) stays bit-parallel.
  */
object MyersEd {
  /** Exact edit distance if ≤ k, else -1 (the built-in threshold
    * contract). Called from both eval and generated code. */
  def distance(a: UTF8String, b: UTF8String, k: Int): Int = {
    if (k < 0) return -1
    val na = a.numChars()
    val nb = b.numChars()
    if (math.abs(na - nb) > k) return -1
    if (na == 0) return if (nb <= k) nb else -1
    if (nb == 0) return if (na <= k) na else -1
    // pattern = shorter string (edit distance is symmetric)
    val (p, t) = if (na <= nb) (a, b) else (b, a)
    val m = math.min(na, nb)
    if (m > 64) return a.levenshteinDistance(b, k)
    // single-pass byte walk; bail to the built-in DP on any non-ASCII
    val pb = p.getBytes
    val tb = t.getBytes
    if (pb.length != m || tb.length != math.max(na, nb))
      return a.levenshteinDistance(b, k) // multi-byte chars present
    val peq = new Array[Long](128)
    var i = 0
    while (i < m) {
      val c = pb(i)
      if (c < 0) return a.levenshteinDistance(b, k)
      peq(c) |= 1L << i
      i += 1
    }
    val high = 1L << (m - 1)
    var pv = -1L
    var mv = 0L
    var score = m
    val n = tb.length
    var j = 0
    while (j < n) {
      val c = tb(j)
      if (c < 0) return a.levenshteinDistance(b, k)
      val eq = peq(c)
      val xv = eq | mv
      val xh = (((eq & pv) + pv) ^ pv) | eq
      var ph = mv | ~(xh | pv)
      var mh = pv & xh
      if ((ph & high) != 0L) score += 1
      else if ((mh & high) != 0L) score -= 1
      ph = (ph << 1) | 1L
      mh = mh << 1
      pv = mh | ~(xv | ph)
      mv = ph & xv
      j += 1
    }
    if (score <= k) score else -1
  }
}

/** `myers_ed(a, b)` with a literal bound k baked in at construction:
  * registered through [[GraftFunctions]] as a 3-arg function whose third
  * argument must be an integer literal (the bound shapes the algorithm,
  * it is not data). */
case class MyersEdK(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"myers_ed requires two string arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "myers_ed"

  override def nullSafeEval(a: Any, b: Any): Any =
    MyersEd.distance(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.MyersEd.distance($a, $b, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MyersEdK =
    copy(left = newLeft, right = newRight)
}
