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
  */
class PartitionInvarianceSpec extends SparkTestBase {

  private def runFleet(conf: Map[String, String]): Map[String, Seq[String]] = {
    val saved = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (n, _) => SparkEntry.oracleSql.contains(n) }
        .map { case (name, fn) =>
          val rows =
            try fn(spark, sfDir).collect().toSeq.map(_.toString)
            catch { case e: Throwable => Seq(s"ERROR: ${e.getMessage}") }
          spark.catalog.clearCache()
          name -> rows
        }.toMap
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("every oracle-backed query returns identical rows under a different " +
    "shuffle fan-out and scan split size") {
    val a = runFleet(Map("spark.sql.shuffle.partitions" -> "8"))
    // 3 shuffle partitions re-buckets every exchange; 128 KB scan splits
    // multiply the input partition count of every sf0.001 parquet file
    val b = runFleet(Map(
      "spark.sql.shuffle.partitions" -> "3",
      "spark.sql.files.maxPartitionBytes" -> "131072"))
    assert(a.keySet == b.keySet)
    // a query that throws under BOTH legs would compare equal on its
    // error marker — that's a skipped comparison, not invariance
    val errored = (a ++ b).collect {
      case (k, rows) if rows.exists(_.startsWith("ERROR:")) => k
    }
    assert(errored.isEmpty, s"queries errored instead of comparing: $errored")
    val broken = a.keys.toSeq.sorted.filter(k => a(k) != b(k))
    val detail = broken.take(5).map { k =>
      val diffAt = a(k).zipAll(b(k), "<missing>", "<missing>")
        .indexWhere { case (x, y) => x != y }
      s"$k (first diff row $diffAt):\n  A: ${a(k).lift(diffAt).getOrElse("")}" +
        s"\n  B: ${b(k).lift(diffAt).getOrElse("")}"
    }
    assert(broken.isEmpty,
      s"${broken.size} queries drift with partitioning: " +
        s"${broken.mkString(", ")}\n${detail.mkString("\n")}")
    // the sweep must actually have covered the fleet
    assert(a.size > 200, s"only ${a.size} oracle-backed queries swept")
  }
}
