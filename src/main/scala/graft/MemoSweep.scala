package graft

import org.apache.spark.sql.SparkSession

/** Central registry of the engine's driver-side memo maps, with a sweep
  * that releases everything they pin.
  *
  * Shared expensive builds (candidate pairs, affinity edges, trained
  * probes, brute-force ground truth) memoize per (session, dir,
  * fingerprint) in per-module ConcurrentHashMaps, pinned via
  * `localCheckpoint` so Bench's per-query `clearCache()` cannot drop
  * them (round-9 protocol). The cost of that protocol surfaced in the
  * first SKEW100 run: pins are UNBOUNDED across queries and fixture
  * dirs — 23 queries × 2 dirs at ×100 volume accumulated enough
  * checkpoint blocks that the skewed leg's hot task died with
  * `UNABLE_TO_ACQUIRE_MEMORY` (storage squeezing execution), while every
  * query passed standalone in a fresh JVM. At 100 TB the same failure is
  * an executor OOM from index/memo state that outlived its consumer.
  *
  * [[sweep]] clears every registered map AND unpersists all persistent
  * RDDs (covers localCheckpoint blocks, which survive
  * `catalog.clearCache()`), returning the JVM to a cold-memo state;
  * consumers rebuild on next touch because the maps no longer hand out
  * frames whose blocks were destroyed. Benches call it per measured
  * query so each measurement runs against its OWN working set — the
  * min-of-2 protocol still attributes first-touch builds to run 1 and
  * reads run 2 warm, because the sweep sits BEFORE run 1, not between
  * runs.
  */
object MemoSweep {
  private val maps =
    new java.util.concurrent.CopyOnWriteArrayList[java.util.Map[_, _]]()

  /** Register a memo map at declaration site; returns it unchanged. */
  def register[M <: java.util.Map[_, _]](m: M): M = { maps.add(m); m }

  /** Clear all memo maps and unpersist every pinned RDD (blocking, so
    * the freed memory is actually available to the next measurement). */
  def sweep(spark: SparkSession): Unit = {
    maps.forEach(m => m.clear())
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
  }
}
