package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled document fingerprint: the minimum md5 over a doc's word
  * n-shingles, fused into ONE pass over the token array.
  *
  * Semantics are EXACTLY [[TextFns.fingerprint]]'s portable-SQL form (and
  * the DuckDB oracle): min over shingles x of hex(md5("0:" + x)), where
  * shingle i is tokens[i..i+n-1] joined with single spaces; NULL when the
  * doc has fewer than n tokens. (array_distinct in the SQL form is
  * irrelevant to a minimum and is skipped here.)
  *
  * Why compiled: the HOF form interprets two lambda layers per shingle and
  * allocates the shingle string, its md5 hex string, and slice arrays —
  * and breaks the surrounding whole-stage-codegen span (the
  * q_text_fingerprint hot spot). This kernel streams each shingle's bytes
  * straight into one reused MessageDigest and keeps the running minimum as
  * a raw 16-byte digest — lowercase-hex order equals unsigned-byte order,
  * so only the FINAL winner is hex-encoded.
  */
object FingerprintKernel {
  private val HEX = "0123456789abcdef".toCharArray
  private val PREFIX = "0:".getBytes("UTF-8")
  private val SPACE = " ".getBytes("UTF-8")

  /** a < b over 16-byte digests, unsigned lexicographic. */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  def minFingerprint(toks: ArrayData, n: Int): UTF8String = {
    val sz = toks.numElements()
    if (sz < n) return null
    val md = java.security.MessageDigest.getInstance("MD5")
    var best: Array[Byte] = null
    var i = 0
    while (i <= sz - n) {
      md.reset()
      md.update(PREFIX)
      var k = 0
      while (k < n) {
        if (k > 0) md.update(SPACE)
        md.update(toks.getUTF8String(i + k).getBytes)
        k += 1
      }
      val d = md.digest()
      if (best == null || less(d, best)) best = d
      i += 1
    }
    val hex = new Array[Char](32)
    var j = 0
    while (j < 16) {
      hex(2 * j) = HEX((best(j) >> 4) & 0xf); hex(2 * j + 1) = HEX(best(j) & 0xf)
      j += 1
    }
    UTF8String.fromString(new String(hex))
  }
}

/** fingerprint_min(toks, n) — n fixed at plan build (a literal in SQL). */
case class FingerprintMin(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"fingerprint_min requires array<string>, got ${t.catalogString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "fingerprint_min"

  override def nullSafeEval(a: Any): Any =
    FingerprintKernel.minFingerprint(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.FingerprintKernel.minFingerprint($a, $n);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FingerprintMin =
    copy(child = newChild)
}
