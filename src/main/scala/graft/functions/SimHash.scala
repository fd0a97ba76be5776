package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Compiled SimHash kernel shared by interpreted eval and codegen.
  *
  * Bit semantics are EXACTLY the portable SQL formulation in
  * [[TextFns.simhash32]] (and its DuckDB oracle): hex digit j of
  * md5(token) carries bits 4j..4j+3; each token votes ±1 per bit; the
  * 32-bit signature sets bit k iff the vote sum is positive.
  */
object SimHashKernel {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def simhash32(toks: ArrayData): Long = {
    val votes = new Array[Int](32)
    val digest = md.get()
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      digest.reset()
      val d = digest.digest(toks.getUTF8String(i).getBytes)
      var k = 0
      while (k < 32) {
        val j = k >> 2 // hex digit index
        val b = d(j >> 1)
        val nib = if ((j & 1) == 0) (b >> 4) & 0xf else b & 0xf
        votes(k) += (if (((nib >> (k & 3)) & 1) == 1) 1 else -1)
        k += 1
      }
      i += 1
    }
    var sig = 0L
    var k = 0
    while (k < 32) { if (votes(k) > 0) sig |= 1L << k; k += 1 }
    sig
  }
}

/** Codegen'd 32-bit SimHash over an array<string> token column — replaces
  * the higher-order `aggregate` fold, which allocated a 32-element array
  * per TOKEN under lambda interpretation. Same zero-shuffle per-row shape,
  * compiled loop. */
case class SimHash32D(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash32_d requires array<string>, got ${t.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32_d"

  override def nullSafeEval(a: Any): Any =
    SimHashKernel.simhash32(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.SimHashKernel.simhash32($a)")

  override protected def withNewChildInternal(newChild: Expression): SimHash32D =
    copy(child = newChild)
}
