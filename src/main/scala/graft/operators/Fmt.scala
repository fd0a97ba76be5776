package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit}

/** Engine-identical display rounding for the oracle-compared fleet.
  *
  * `round(x, 4)` is NOT engine-identical on doubles: Spark routes the
  * double through BigDecimal HALF_UP while DuckDB rounds the binary
  * double directly, so values sitting on a .xxxx5 representation edge
  * round apart and hash-fail (the ADVICE-r10 class first fixed in
  * q_png_meta). `floor(x · 10⁴ + 0.5) / 10⁴` is the same primitive
  * double ops in both engines — the SQL twin must spell exactly
  * `floor(x * 10000.0 + 0.5) / 10000.0`. FmtLintSpec bans the
  * round-avg-4 spelling from ever shipping again.
  */
private[graft] object Fmt {

  /** Four-decimal fixed-point display value, engine-identical. */
  def fix4(c: Column): Column =
    floor(c * lit(10000.0d) + lit(0.5d)) / lit(10000.0d)

  /** Six-decimal variant (rank-fusion/DCG terms) — SQL twin
    * `floor(x * 1000000.0 + 0.5) / 1000000.0`. */
  def fix6(c: Column): Column =
    floor(c * lit(1000000.0d) + lit(0.5d)) / lit(1000000.0d)
}
