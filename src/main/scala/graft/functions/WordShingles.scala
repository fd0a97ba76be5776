package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled word n-gram shingling — semantics EXACTLY
  * [[TextFns.shinglesSql]] (and the DuckDB oracles): shingle i is
  * tokens[i..i+n-1] joined with single spaces; empty array when the doc
  * has fewer than n tokens; duplicates preserved (callers array_distinct
  * as needed). The SQL form pays an interpreted lambda + slice allocation
  * per shingle; this is one pass with UTF8String concat. */
object ShingleKernel {
  private val SP = UTF8String.fromString(" ")

  def shingles(toks: ArrayData, n: Int): ArrayData = {
    val sz = toks.numElements()
    if (sz < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](sz - n + 1)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= sz - n) {
      var k = 0
      while (k < n) { parts(k) = toks.getUTF8String(i + k); k += 1 }
      out(i) = UTF8String.concatWs(SP, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** word_shingles(toks, n) — n is fixed at plan build (a literal in SQL). */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires array<string>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(a: Any): Any =
    ShingleKernel.shingles(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.ShingleKernel.shingles($a, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}
