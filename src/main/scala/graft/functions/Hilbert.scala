package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Compiled 2-D Hilbert-curve kernel shared by interpreted eval and
  * codegen — the space-filling-curve alternative to
  * [[graft.operators.Layout.zValue]]'s Morton interleave. Hilbert keeps
  * STRICT adjacency (consecutive keys are always grid neighbors, which
  * Morton violates at every power-of-two boundary seam), so range
  * clustering on the key gives strictly better worst-case locality for
  * 2-D box queries.
  *
  * Bit semantics are EXACTLY the portable SQL formulation in
  * [[graft.operators.Layout.hilbertSqlRounds]] (the DuckDB oracle's
  * chained per-bit rounds): the classic top-down walk — quadrant
  * q = (3·rx) xor ry (spelled 3·rx + ry − 2·rx·ry in SQL, identical on
  * the {0,1}² domain), flip-then-swap rotation when ry = 0.
  */
object HilbertKernel {
  def hilbert(bits: Int, x0: Long, y0: Long): Long = {
    var x = x0; var y = y0; var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** Codegen'd Hilbert index of two non-negative integer keys (`bits` bits
  * each; keys ≥ 2^bits fold into the top cells via the masked walk —
  * callers bucket-normalize first, as with z-order). A 16-round
  * branch-heavy state machine is exactly what expression-tree SQL does
  * badly (the rotation references each state column several times per
  * round, so a nested-expression formulation explodes exponentially) and
  * a compiled loop does for free. */
case class HilbertD(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  // bits = 0 would make the kernel's initial mask 1L << -1 (negative, so
  // the walk never runs and EVERY key maps to 0); bits > 31 overflows the
  // s*s quadrant weight. Fail analysis instead of emitting degenerate keys.
  require(bits >= 1 && bits <= 31,
    s"hilbert_d: bits must be in [1, 31], got $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"hilbert_d requires (bigint, bigint), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_d"

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertKernel.hilbert(bits, a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.HilbertKernel.hilbert($bits, $a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertD =
    copy(left = newLeft, right = newRight)
}
