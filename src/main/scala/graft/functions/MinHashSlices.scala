package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled MinHash kernel: all K = 24 sliced-md5 minimum hashes in ONE
  * pass over the shingle array.
  *
  * Semantics are EXACTLY the portable-SQL form in TextFns
  * (minhashBase + minhashSlice, mirrored by the DuckDB oracle): per
  * shingle x the base hash is the concatenation of
  * hex(md5(p + x)) for prefixes p in ("", "s:", "t:", "u:", "v:", "w:")
  * — 192 hex chars — and hash function i is the lexicographic minimum of
  * slice [8i, 8i+8) over all shingles (each 32-bit md5 fragment is an
  * independent uniform hash). The SQL form allocates ~2K intermediate
  * strings per shingle across the K transform lambdas; this kernel
  * allocates one 192-char buffer per shingle and K result strings per ROW.
  *
  * K = 24 feeds 12 LSH bands of 2 rows (Dedup.minhashLsh): S-curve
  * midpoint (1/12)^(1/2) ≈ 0.29 Jaccard, below the 0.3 verify threshold,
  * so mid-similarity duplicates are caught with high probability
  * (PropertiesSpec plants one and asserts it).
  */
object MinHashKernel {
  private val HEX = "0123456789abcdef".toCharArray
  /** digest prefixes; K = 4 slices per digest × 6 digests = 24 */
  private val PREFIXES =
    Array("", "s:", "t:", "u:", "v:", "w:").map(_.getBytes("UTF-8"))
  val K: Int = 4 * PREFIXES.length

  def slices(shingles: ArrayData): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return null
    val mins = new Array[String](K)
    val hex = new Array[Char](32 * PREFIXES.length)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i).getBytes
      var d = 0
      while (d < PREFIXES.length) {
        md.reset()
        if (PREFIXES(d).length > 0) md.update(PREFIXES(d))
        val dig = md.digest(s)
        var j = 0
        while (j < 16) {
          hex(32 * d + 2 * j) = HEX((dig(j) >> 4) & 0xf)
          hex(32 * d + 2 * j + 1) = HEX(dig(j) & 0xf)
          j += 1
        }
        d += 1
      }
      var k = 0
      while (k < K) {
        val sl = new String(hex, 8 * k, 8)
        if (mins(k) == null || sl.compareTo(mins(k)) < 0) mins(k) = sl
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(UTF8String.fromString(_)))
  }
}

/** Codegen'd K-way sliced-md5 MinHash signature over array<string>
  * shingles: returns array<string> of the K minimum slices, or NULL for an
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
