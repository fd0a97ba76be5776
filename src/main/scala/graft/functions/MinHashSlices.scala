package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled MinHash kernel: all 8 sliced-md5 minimum hashes in ONE pass
  * over the shingle array.
  *
  * Semantics are EXACTLY the portable-SQL form in TextFns
  * (minhashBase + minhashSlice, mirrored by the DuckDB oracle): per
  * shingle x the base hash is hex(md5(x)) ++ hex(md5("s:"+x)) — 64 hex
  * chars — and hash function i is the lexicographic minimum of slice
  * [8i, 8i+8) over all shingles. The SQL form allocates ~16 intermediate
  * strings per shingle across the 8 transform lambdas; this kernel
  * allocates one 64-char buffer per shingle and 8 result strings per ROW.
  */
object MinHashKernel {
  private val HEX = "0123456789abcdef".toCharArray

  def slices(shingles: ArrayData): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return null
    val mins = new Array[String](8)
    val hex = new Array[Char](64)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i).getBytes
      md.reset()
      val d1 = md.digest(s)
      md.reset()
      md.update("s:".getBytes)
      val d2 = md.digest(s)
      var j = 0
      while (j < 16) {
        hex(2 * j) = HEX((d1(j) >> 4) & 0xf); hex(2 * j + 1) = HEX(d1(j) & 0xf)
        hex(32 + 2 * j) = HEX((d2(j) >> 4) & 0xf); hex(33 + 2 * j) = HEX(d2(j) & 0xf)
        j += 1
      }
      var k = 0
      while (k < 8) {
        val sl = new String(hex, 8 * k, 8)
        if (mins(k) == null || sl.compareTo(mins(k)) < 0) mins(k) = sl
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(UTF8String.fromString(_)))
  }
}

/** Codegen'd 8-way sliced-md5 MinHash signature over array<string>
  * shingles: returns array<string> of the 8 minimum slices, or NULL for an
  * empty shingle set (matching array_min-over-empty in the SQL form). */
case class MinHashSlicesD(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_slices requires array<string>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_slices"

  override def nullSafeEval(a: Any): Any =
    MinHashKernel.slices(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.MinHashKernel.slices($a);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSlicesD =
    copy(child = newChild)
}
