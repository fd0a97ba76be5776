package graft

/** Partition-invariance under HOT KEYS — the leg the fleet-wide sweep
  * cannot cover: on the uniform harness fixture the dedup family's
  * bucket/posting caps (BUCKET_CAP, POSTING_CAP = 64) are never
  * exceeded, so their survivor selection is never exercised. If a cap
  * kept "whichever 64 arrive first" (shuffle order) instead of a
  * deterministic ordered prefix, every capped query would silently
  * return partition-dependent results EXACTLY on the data that matters
  * — skewed corpora — while staying green on the single-configuration
  * oracle compare.
  *
  * This sweep derives a small skewed corpus ([[SkewFixture]]: 50% hot
  * source, 20% shared-boilerplate docs, 20% hot-user events) from the
  * sf0.001 fixture at ×4, whose shared boilerplate shingles land
  * hundreds of docs in the same postings/buckets — far past every cap —
  * and requires each skew-sensitive query to return identical rows
  * under a different shuffle fan-out and scan split size.
  */
class SkewInvarianceSpec extends SparkTestBase {

  private val dir = "target/skewtest"

  private def runSet(conf: Map[String, String]): Map[String, Seq[String]] = {
    val saved = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      SkewBench.skewQueries
        .filter(SparkEntry.queries.contains)
        .map { name =>
          val rows =
            try SparkEntry.queries(name)(spark, dir).collect().toSeq.map(_.toString)
            catch { case e: Throwable => Seq(s"ERROR: ${e.getMessage}") }
          spark.catalog.clearCache()
          name -> rows
        }.toMap
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("skew-sensitive queries return identical rows on a cap-exceeding " +
    "skewed corpus under a different shuffle fan-out and scan split size") {
    // embeddings symlink target = base dir (the skew set reads documents
    // and events only); ×4 on sf0.001 ≈ 2.4k docs, ~480 sharing the
    // boilerplate shingles — every 64-cap structure overflows
    SkewFixture.ensure(spark, sfDir, sfDir, dir, scale = 4)
    val a = runSet(Map("spark.sql.shuffle.partitions" -> "8"))
    val b = runSet(Map(
      "spark.sql.shuffle.partitions" -> "3",
      "spark.sql.files.maxPartitionBytes" -> "131072"))
    assert(a.keySet == b.keySet && a.nonEmpty)
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
      s"${broken.size} queries drift with partitioning on skewed data: " +
        s"${broken.mkString(", ")}\n${detail.mkString("\n")}")
  }
}
