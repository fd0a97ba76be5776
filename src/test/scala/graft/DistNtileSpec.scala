package graft

import org.apache.spark.sql.functions._

import graft.operators.DistNtile

/** Invariants of the distributed rank/prefix decomposition — including
  * the regression guard for the range-exchange resampling bug: the
  * counts branch and the window branch must see ONE partitioning, or
  * the offset join corrupts ranks (caught round 8 via the Spearman
  * rank-sum identity; DistNtile now pins the keyed frame with an eager
  * localCheckpoint). The input here is deliberately a SHUFFLE OUTPUT
  * (groupBy aggregate) — the nondeterministic intra-partition order
  * that made boundary resampling visible. */
class DistNtileSpec extends SparkTestBase {

  test("withPrefixSum over a shuffle-output frame: exact global prefix " +
    "(max = total weight, strictly increasing in key order)") {
    // value frame from an aggregation — nondeterministic row order
    val vals = spark.range(100000)
      .select((col("id") % 9973L).as("v"))
      .groupBy("v").agg(count(lit(1)).as("w"))
    val pre = DistNtile.withPrefixSum(vals, Seq(col("v").asc), col("w"), "s")
      .cache()
    val total = pre.agg(sum("w")).collect().head.getLong(0)
    assert(total == 100000L)
    assert(pre.agg(max("s")).collect().head.getLong(0) == total,
      "inclusive prefix must end at the total weight")
    // prefix is exactly the running sum of weights in value order
    val rows = pre.select("v", "w", "s").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    var run = 0L
    rows.foreach { case (v, w, s) =>
      run += w
      assert(s == run, s"prefix broke at v=$v: got $s expected $run")
    }
    spark.catalog.clearCache()
  }

  test("withRank and withNtile stay consistent: rank buckets fill the " +
    "exact ntile split on a skewed shuffle-output frame") {
    val df = spark.range(10007)
      .select((col("id") * col("id") % 5003L).as("k"))
      .groupBy("k").agg(count(lit(1)).as("cnt"))
    val n = df.count()
    val ranked = DistNtile.withRank(df, Seq(col("k").asc), "r")
    assert(ranked.agg(max("r")).collect().head.getLong(0) == n)
    assert(ranked.select("r").distinct().count() == n,
      "ranks must be a permutation of 1..n")
    val tiled = DistNtile.withNtile(df, 7, Seq(col("k").asc), "b")
      .groupBy("b").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = n / 7
    val rem = n % 7
    (1 to 7).foreach { b =>
      val expect = if (b <= rem) base + 1 else base
      assert(tiled(b.toLong) == expect,
        s"bucket $b holds ${tiled(b.toLong)}, expected $expect")
    }
  }
}
