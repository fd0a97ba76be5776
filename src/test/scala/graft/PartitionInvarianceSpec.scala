package graft

/** Fleet-wide partition-invariance sweep: every oracle-backed query must
  * return IDENTICAL rows when the physical partitioning changes — a
  * different shuffle fan-out AND a smaller scan split size (more input
  * partitions per parquet file). This is the property a 1000-executor
  * cluster actually depends on: at 100 TB the engine never controls how
  * many partitions a stage gets, so any result that drifts with
  * partitioning is a latent correctness bug the single-configuration
  * oracle compare cannot see (FP sums reordered across partitions,
  * first/last picked from shuffle-order ties, sampled exchange
  * boundaries leaking into output — the r8 DistNtile bug's whole class).
  *
  * Scope: queries WITH an oracle (the declared no-oracle set measures
  * physical artifacts like file sizes, which legitimately vary with
  * partitioning). Memoized shared builds are keyed per session+fixture
  * and thus built once under leg A — the sweep exercises every
  * consumer's own plan under both configurations, not the memo builds.
  * The hot-key twin of this sweep is [[SkewInvarianceSpec]]; both ride
  * [[InvarianceHarness]].
  */
class PartitionInvarianceSpec extends SparkTestBase with InvarianceHarness {

  test("every oracle-backed query returns identical rows under a different " +
    "shuffle fan-out and scan split size") {
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(SparkEntry.oracleSql.contains)
    val a = runQuerySet(
      Map("spark.sql.shuffle.partitions" -> "8"), names, sfDir)
    // 3 shuffle partitions re-buckets every exchange; 128 KB scan splits
    // multiply the input partition count of every sf0.001 parquet file
    val b = runQuerySet(Map(
      "spark.sql.shuffle.partitions" -> "3",
      "spark.sql.files.maxPartitionBytes" -> "131072"), names, sfDir)
    assertInvariant(a, b, "")
    // the sweep must actually have covered the fleet
    assert(a.size > 200, s"only ${a.size} oracle-backed queries swept")
  }
}
