package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** Vector math over ArrayType(FloatType) embedding columns, expressed with
  * higher-order functions (zip_with / aggregate) so the whole computation
  * stays inside whole-stage codegen — no UDF boxing per element.
  *
  * All helpers take SQL fragments (column names) and widen float32 → double
  * before arithmetic: at 64 dims the float32 accumulation error is already
  * visible in the 4th decimal, and the DuckDB oracle must agree.
  */
object VectorFns {

  /** transform(v, float → double) fragment. */
  def asDoubleSql(v: String): String =
    s"transform($v, x -> cast(x as double))"

  /** Sequential-fold dot product fragment via the codegen'd [[DotProductD]]
    * expression (same left-to-right fold as DuckDB's list_dot_product and
    * the HOF `aggregate(zip_with(...))` form it replaced — bit-identical
    * results, ~5× faster, stays inside whole-stage codegen). Callers must
    * have run [[GraftFunctions.register]] on the session first. */
  def dotSql(a: String, b: String): String = s"dot_d($a, $b)"

  def normSql(v: String): String = s"sqrt(${dotSql(v, v)})"

  def dot(a: String, b: String): Column = expr(dotSql(a, b))
  def norm(v: String): Column = expr(normSql(v))

  /** Cosine similarity of two double-array columns with precomputed norm
    * columns (precompute norms once per row — at 100 TB the norm is
    * written next to the embedding, never recomputed per pair). */
  def cosineWithNorms(a: String, b: String, na: String, nb: String): Column =
    expr(s"${dotSql(a, b)} / ($na * $nb)")

  /** Deterministic ±1 hyperplane weight for (plane m, dim j): +1 iff the
    * first hex digit of md5("m:j") is >= 8. The same formula is computable
    * in any engine with md5 — the DuckDB oracle re-derives these weights in
    * SQL while the Spark plan inlines them as literals (computed here once
    * at plan build, not per row). */
  def planeWeight(m: Int, j: Int): Double = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s"$m:$j".getBytes(StandardCharsets.UTF_8))
    // first hex char = high nibble of byte 0
    if (((d(0) >> 4) & 0xf) >= 8) 1.0 else -1.0
  }

  /** Random-hyperplane LSH signature fragment: `bits` sign-bits over a
    * double-array column of dimension `dim`, packed into a BIGINT.
    * Plane weights are inlined literal arrays — the scan evaluates
    * `bits` dot products per row with zero hashing in the hot path. */
  def lshSignatureSql(v: String, bits: Int, dim: Int): String = {
    val terms = (0 until bits).map { m =>
      val w = (0 until dim).map(j => s"cast(${planeWeight(m, j)} as double)")
        .mkString("array(", ", ", ")")
      s"CASE WHEN ${dotSql(v, w)} > 0 THEN cast(${1L << m} as bigint) ELSE cast(0 as bigint) END"
    }
    terms.mkString("(", " + ", ")")
  }
}
