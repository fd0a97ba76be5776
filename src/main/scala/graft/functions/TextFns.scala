package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives for the LLM-data-pipeline operators
  * (dedup, fingerprinting, lang-ID, quality). Everything here is built
  * from codegen'd Spark SQL functions — no Scala UDFs — so whole-stage
  * codegen keeps the hot path fused, and every primitive has an exact
  * DuckDB-SQL twin (md5 / instr / integer arithmetic are engine-portable),
  * which is what makes the dedup operators oracle-checkable.
  *
  * Inputs are SQL expression fragments (usually a column name materialized
  * with withColumn) rather than Columns: Spark 4's public Column API no
  * longer exposes the underlying expression tree, and these primitives
  * compose inside higher-order lambdas where only SQL text reaches.
  */
object TextFns {

  /** Whitespace tokenization. Documents in the harness are space-separated
    * token streams; for general text compose with `normalize` first. */
  def tokens(text: Column): Column = split(text, " ")

  /** Lowercase + collapse non-alphanumerics — the normalize step of
    * near-dedup pipelines. */
  def normalize(text: Column): Column =
    regexp_replace(lower(trim(text)), "[^a-z0-9 ]+", " ")

  /** SQL fragment for word n-gram shingles over a token-array expression —
    * string form so primitives can nest inside each other's lambdas. */
  def shinglesSql(toks: String, n: Int): String =
    s"""CASE WHEN size($toks) >= $n
       |  THEN transform(sequence(1, size($toks) - ${n - 1}),
       |                 i -> concat_ws(' ', slice($toks, i, $n)))
       |  ELSE cast(array() as array<string>) END""".stripMargin

  /** Word n-gram shingles over a token-array column, joined with single
    * spaces. Empty array for docs shorter than n (guarded: Spark's
    * sequence(1,0) would count DOWN, not return empty). */
  def shingles(toks: String, n: Int): Column = expr(shinglesSql(toks, n))

  /** One MinHash value: the lexicographic minimum of md5("<seed>:"+s) over
    * the (distinct) shingle set. md5-as-hash keeps the value identical in
    * any engine (vs xxhash64, which DuckDB lacks); lexicographic min over
    * fixed-width lowercase hex is a total order both engines share.
    * NULL when the shingle set is empty. */
  def minhash(shingleSet: String, seed: Int): Column =
    expr(s"array_min(transform($shingleSet, x -> md5(concat('$seed:', x))))")

  /** Per-shingle base hash for sliced MinHash: the concatenation of
    * md5(p + x) for p in ("", "s:", "t:", "u:", "v:", "w:") = 192 hex
    * chars. The K = 24 minhash functions are then 8-char slices of this
    * (see [[minhashSlice]]) — 6 md5 calls per shingle instead of K, the
    * standard one-strong-hash-many-fragments trick (each 32-bit fragment
    * of md5 is an independent uniform hash). Portable twin of the compiled
    * [[MinHashKernel]] (bit-equality asserted in DotProductSpec). */
  def minhashBase(shingleSet: String): Column =
    expr(s"transform($shingleSet, x -> concat(md5(x), " +
      Seq("s", "t", "u", "v", "w")
        .map(p => s"md5(concat('$p:', x))").mkString(", ") + "))")

  /** MinHash function i (0-based, i < 24) over a [[minhashBase]] column:
    * lexicographic min of the i-th 8-hex-char slice. */
  def minhashSlice(baseCol: String, i: Int): Column =
    expr(s"array_min(transform($baseCol, h -> substring(h, ${1 + 8 * i}, 8)))")

  /** LSH band key: hash of the concatenation of one band's MinHash values.
    * Docs agreeing on all hashes in any band become candidate pairs. */
  def bandKey(hashes: Seq[Column]): Column = md5(concat(hashes: _*))

  /** 32-bit SimHash over a token-array column, as a non-negative Long.
    *
    * Bit source: hex digit j of md5(token) carries bits 4j..4j+3 —
    * extracted with instr('0123456789abcdef', ...) and integer arithmetic
    * only, so DuckDB reproduces it exactly (strpos + // + <<). Each token
    * votes ±1 per bit; the signature sets bit k iff the vote sum is
    * positive. One fold over the token array per row — no explode, no
    * shuffle. */
  def simhash32(toks: String): Column =
    expr(
      s"""aggregate(
         |  $toks,
         |  array_repeat(cast(0 as bigint), 32),
         |  (acc, tok) -> zip_with(acc, transform(sequence(0, 31), k ->
         |      CASE WHEN ((instr('0123456789abcdef',
         |                        substr(md5(tok), cast(k div 4 as int) + 1, 1)) - 1)
         |                 div shiftleft(1, cast(k % 4 as int))) % 2 = 1
         |           THEN cast(1 as bigint) ELSE cast(-1 as bigint) END),
         |    (a, b) -> a + b),
         |  acc -> aggregate(
         |    zip_with(acc, sequence(0, 31),
         |             (v, k) -> CASE WHEN v > 0
         |                       THEN shiftleft(cast(1 as bigint), cast(k as int))
         |                       ELSE cast(0 as bigint) END),
         |    cast(0 as bigint), (s, x) -> s + x))""".stripMargin)

  /** Set Jaccard similarity of two string-array columns (assumed already
    * distinct), as Double. Union size comes from |a|+|b|-|a∩b| — exact for
    * distinct inputs and half the cost of also materializing array_union. */
  def jaccard(a: String, b: String): Column =
    expr(
      s"""cast(size(array_intersect($a, $b)) as double) /
         |  cast(size($a) + size($b) - size(array_intersect($a, $b)) as double)""".stripMargin)

  /** Document fingerprint (winnowing-lite): the minimum md5 over the doc's
    * word 3-shingles — a single stable representative hash per document.
    * Input is a token-array column name. */
  def fingerprint(toks: String): Column =
    expr(s"array_min(transform(array_distinct(${shinglesSql(toks, 3)}), " +
      "x -> md5(concat('0:', x))))")
}
