package graft

/** Process-wide counter of expensive FIRST-TOUCH builds — memo misses
  * (shared candidate/label/edge/probe/BPE builds) and persisted
  * index-table constructions. [[Bench]] samples it around each query and
  * emits a per-query `first_touch` flag, so round-over-round comparisons
  * can separate "the plan got slower" from "this run's alphabetically
  * first consumer paid the shared build" (at 100 TB those builds are
  * ingest work, not query work). */
object BuildMeter {
  private val n = new java.util.concurrent.atomic.AtomicLong(0L)
  /** Call at every memo-miss / index-build site, AFTER deciding to build. */
  def record(): Unit = n.incrementAndGet()
  def count: Long = n.get()
}
