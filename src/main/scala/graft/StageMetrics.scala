package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Stage-level execution telemetry for the scale artifacts.
  *
  * Wall-clock ratios alone can hide a superlinear shuffle: a query whose
  * time grows 8× at 10× data while its shuffle bytes grow 80× is a scale
  * problem the clock hasn't caught yet (the extra bytes are still
  * in-memory at sf0.1 ×10 but become the network bottleneck at 100 TB).
  * This listener aggregates the task metrics Spark publishes per
  * completed stage — shuffle bytes written/read, disk spill, input bytes
  * — so [[ScaleBench]] can record byte-growth ratios next to time ratios.
  *
  * Accounting is JVM-global (one listener, monotonic counters): callers
  * take a [[Snap]] before and after a query and subtract. Deltas are
  * only attributable when queries run sequentially on the session —
  * exactly the bench mains' shape. Listener delivery is asynchronous, so
  * [[Agg.settled]] polls until the counters stop moving before the
  * "after" snapshot is taken.
  */
object StageMetrics {

  /** Monotonic counter snapshot (bytes; `shuffleRecords` = shuffle rows
    * written — lets a byte-growth flag distinguish MORE rows (a real
    * scale problem) from FATTER rows (a fixture/encoding artifact);
    * `stages` = completed-stage count, used only for settlement
    * detection). */
  final case class Snap(shuffleWrite: Long, shuffleRead: Long, spill: Long,
                        input: Long, shuffleRecords: Long, stages: Long) {
    def -(o: Snap): Snap = Snap(shuffleWrite - o.shuffleWrite,
      shuffleRead - o.shuffleRead, spill - o.spill, input - o.input,
      shuffleRecords - o.shuffleRecords, stages - o.stages)
  }

  final class Agg extends SparkListener {
    private val shuffleWrite = new AtomicLong
    private val shuffleRead = new AtomicLong
    private val spill = new AtomicLong
    private val input = new AtomicLong
    private val shuffleRecords = new AtomicLong
    private val stages = new AtomicLong

    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      val m = s.stageInfo.taskMetrics
      if (m != null) {
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        spill.addAndGet(m.diskBytesSpilled)
        input.addAndGet(m.inputMetrics.bytesRead)
        shuffleRecords.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        ()
      }
      stages.incrementAndGet()
      ()
    }

    // per-(stage, attempt) task-duration (max, sum, count) — the
    // straggler signal byte counters can't see: a skewed key makes ONE
    // task run 20× its siblings while stage-aggregate bytes look normal
    private val stageTasks = new java.util.concurrent.ConcurrentHashMap[
      java.lang.Long, (Long, Long, Long)]()

    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      // TaskInfo.duration THROWS on an unfinished TaskInfo (Resubmitted
      // task-end events), and failed/killed (speculative) tasks would
      // fold retry noise into the straggler ratio — count successful
      // finished tasks only (ADVICE r12).
      if (t.taskInfo == null || !t.taskInfo.finished ||
          t.reason != org.apache.spark.Success) return
      val d = t.taskInfo.duration
      val key = java.lang.Long.valueOf(
        (t.stageId.toLong << 16) | (t.stageAttemptId & 0xffffL))
      stageTasks.merge(key, (d, d, 1L),
        (a, b) => (math.max(a._1, b._1), a._2 + b._2, a._3 + b._3))
      ()
    }

    /** Worst per-stage straggler ratio (max task duration / mean task
      * duration) since the last drain, over stages with at least
      * `minTasks` tasks and a mean of at least `minMeanMs` (tiny stages
      * are scheduler noise, not skew). 0.0 = no qualifying stage.
      * Clears the per-stage table — callers drain once per measured
      * run, the bench mains' sequential shape. */
    def drainImbalance(minTasks: Int = 8, minMeanMs: Long = 100): Double = {
      val it = stageTasks.entrySet().iterator()
      var worst = 0.0
      while (it.hasNext) {
        val e = it.next(); it.remove()
        val (mx, sum, cnt) = e.getValue
        if (cnt >= minTasks && sum >= minMeanMs * cnt) {
          val r = mx.toDouble * cnt / sum
          if (r > worst) worst = r
        }
      }
      worst
    }

    def snap(): Snap =
      Snap(shuffleWrite.get, shuffleRead.get, spill.get, input.get,
        shuffleRecords.get, stages.get)

    /** Snapshot after the async listener bus has drained: polls until two
      * reads `gapMs` apart agree (or `timeoutMs` elapses — the counters
      * are then as settled as they will get). */
    def settled(timeoutMs: Long = 2000, gapMs: Long = 100): Snap = {
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      var prev = snap()
      var cur = prev
      var settledOnce = false
      while (!settledOnce && System.nanoTime() < deadline) {
        Thread.sleep(gapMs)
        cur = snap()
        settledOnce = cur == prev
        prev = cur
      }
      cur
    }
  }

  /** Bytes → MB with 2-decimal floor rounding, shared by every artifact
    * that renders a [[Snap]]. */
  def mb(v: Long): Double = math.floor(v / 1e6 * 100.0 + 0.5) / 100.0

  /** Install a fresh aggregator on the session's listener bus. */
  def install(spark: SparkSession): Agg = {
    val agg = new Agg
    spark.sparkContext.addSparkListener(agg)
    agg
  }
}
