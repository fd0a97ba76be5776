package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query.
  *
  * @param name   key in `SparkEntry.queries` (and in `oracleSql` when present)
  * @param run    (session, sfDir) => result DataFrame. Must be deterministic:
  *               a global ORDER BY with a unique tiebreak key, displayed
  *               floats fixed via [[graft.operators.Fmt.fix4]] (never
  *               round-avg-4 — see FmtLintSpec) — the driver
  *               hash-compares row-by-row against DuckDB running `oracle`
  *               on the same parquet files.
  * @param oracle equivalent ANSI SQL for DuckDB; None => driver does a weaker
  *               rows-only check (allowed for non-SQL-expressible operators).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")
