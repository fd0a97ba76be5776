package graft

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive fan-out for CPU-heavy row-local pipelines above a
  * NARROW projection (ids / numerics / short digests only — fleet
  * hygiene bans text, token arrays, and vectors from shuffles).
  *
  * The problem it solves (optimization guide §2.2/§6): a parquet table
  * whose bytes land in fewer input splits than the machine has cores
  * plans a scan stage narrower than the machine, and EVERYTHING
  * row-local above it — md5 resample draws, sketch updates, Catalyst's
  * Expand for multi-distinct aggregates — inherits that width. On the
  * single-row-group dev fixtures that means ONE task does all per-row
  * compute of a 32-core box.
  *
  * The guard makes it scale-adaptive rather than a local-mode constant:
  * the fan fires only when the frame's PLANNED partition count is below
  * the session's cores. A production multi-split table plans at least
  * cores-many scan partitions (128 MB splits at any real volume), so the
  * extra exchange never happens at scale — the same adaptive-to-input
  * discipline as AQE's partition coalescing, applied at the scan end.
  */
object Par {

  /** Planned partition count of `df` (physical planning only; no job). */
  private def planned(df: DataFrame): Int = df.rdd.getNumPartitions

  private def cores(df: DataFrame): Int =
    df.sparkSession.sparkContext.defaultParallelism

  /** Round-robin fan to full machine width, when (and only when) the
    * plan is narrower than the machine. The exchange pays
    * |rows|·|narrow row| bytes once; the per-row compute above it then
    * uses every core instead of the scan's task count. */
  def fan(df: DataFrame): DataFrame =
    if (planned(df) < cores(df)) df.repartition(cores(df)) else df

  /** Hash fan on `keys` to full machine width under the same guard —
    * for pipelines whose NEXT operator needs clustering on `keys`
    * (distinct / groupBy): the explicit hash exchange replaces (not
    * adds to) the aggregation's own, every downstream stage keyed on
    * `keys` reuses it, and — because an explicit numbered repartition
    * is never AQE-coalesced — the post-aggregation per-row compute
    * (hash draws over the distinct key set) keeps the machine's width
    * instead of collapsing to one size-coalesced task. */
  def fanKey(df: DataFrame, keys: Column*): DataFrame =
    if (planned(df) < cores(df)) df.repartition(cores(df), keys: _*) else df
}
