package graft

import org.apache.spark.sql.functions._

/** Pins the [[StageMetrics]] accounting [[ScaleBench]]'s byte-growth
  * ratios rely on: a shuffling query must show shuffle-write bytes, a
  * broadcast-only query must not, and the settle/delta protocol must
  * attribute bytes to the query that moved them.
  */
class StageMetricsSpec extends SparkTestBase {

  private lazy val agg = StageMetrics.install(spark)

  private def deltaOf(body: => Unit): StageMetrics.Snap = {
    val before = agg.settled()
    body
    agg.settled() - before
  }

  test("a groupBy over distinct keys shows shuffle-write bytes; the delta " +
    "protocol attributes them to the run") {
    val d = deltaOf {
      spark.range(0, 100000, 1, 8)
        .groupBy((col("id") % 9973).as("k"))
        .agg(sum("id").as("s"))
        .write.format("noop").mode("overwrite").save()
    }
    assert(d.shuffleWrite > 0, s"expected shuffle write bytes, got $d")
    assert(d.shuffleRead > 0, s"expected shuffle read bytes, got $d")
    assert(d.stages >= 2, s"a shuffle implies >= 2 stages, got $d")
  }

  test("a map-only pipeline shows zero shuffle bytes") {
    val d = deltaOf {
      spark.range(0, 100000, 1, 8)
        .select((col("id") * 2).as("x"))
        .filter(col("x") % 7 === 0)
        .write.format("noop").mode("overwrite").save()
    }
    assert(d.shuffleWrite == 0 && d.shuffleRead == 0,
      s"map-only plan must not shuffle, got $d")
    assert(d.stages >= 1)
  }

  test("input bytes are attributed on a parquet scan") {
    val d = deltaOf {
      Tables.lineitem(spark, sfDir).select(sum("l_quantity"))
        .write.format("noop").mode("overwrite").save()
    }
    assert(d.input > 0, s"parquet scan must report input bytes, got $d")
  }

  test("drainImbalance: a hot partition shows a straggler ratio; a " +
    "uniform job does not") {
    import spark.implicits._
    // spark.range(0,16,1,16): exactly one id per partition, no shuffle —
    // partition 0 then carries ~60x the CPU work of its siblings (an
    // iterated FNV hash — real compute, not sleep, so the measured
    // duration is the task's own)
    def burn(rounds: Long): Long = {
      var h = 0xcbf29ce484222325L; var i = 0L
      while (i < rounds) { h = (h ^ i) * 0x100000001b3L; i += 1 }
      h
    }
    agg.drainImbalance() // clear stages billed to earlier tests
    spark.range(0, 16, 1, 16).as[Long]
      .mapPartitions(it => it.map(p => burn(if (p == 0) 600000000L else 10000000L)))
      .write.format("noop").mode("overwrite").save()
    agg.settled()
    val skewed = agg.drainImbalance(minTasks = 8, minMeanMs = 5)
    assert(skewed > 3.0, s"hot partition should dominate its stage, got $skewed")
    spark.range(0, 16, 1, 16).as[Long]
      .mapPartitions(it => it.map(_ => burn(100000000L)))
      .write.format("noop").mode("overwrite").save()
    agg.settled()
    val uniform = agg.drainImbalance(minTasks = 8, minMeanMs = 5)
    assert(uniform > 0.0 && uniform < 3.0,
      s"uniform partitions should balance, got $uniform")
    // the drain cleared the table: an immediate re-drain sees nothing
    assert(agg.drainImbalance(minTasks = 1, minMeanMs = 0) == 0.0)
  }

  test("consecutive deltas do not double-count") {
    val q = () => spark.range(0, 50000, 1, 8)
      .groupBy((col("id") % 997).as("k")).count()
      .write.format("noop").mode("overwrite").save()
    val d1 = deltaOf(q())
    val d2 = deltaOf(q())
    // same query, same bytes — each delta sees its own run only (within
    // metadata slack; a double-count would be ~2x)
    assert(d2.shuffleWrite < d1.shuffleWrite * 3 / 2 + 1024,
      s"second delta looks double-counted: $d1 then $d2")
    assert(d2.shuffleWrite > 0)
  }
}
