package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query.
  *
  * @param name   key in `SparkEntry.queries` (and in `oracleSql` when present)
  * @param run    (session, sfDir) => result DataFrame. Must be deterministic:
  *               a global ORDER BY with a unique tiebreak key, floats rounded
  *               via round(x, 4) — the driver hash-compares row-by-row against
  *               DuckDB running `oracle` on the same parquet files.
  * @param oracle equivalent ANSI SQL for DuckDB; None => driver does a weaker
  *               rows-only check (allowed for non-SQL-expressible operators).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")
