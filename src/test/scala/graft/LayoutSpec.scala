package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import graft.operators.Layout

/** The measurable claim behind Z-ordering: on the SAME data with the SAME
  * predicates, a 2-D box query over a z-ordered layout reads fewer rows
  * out of parquet (row groups pruned by min/max stats on both dims) than
  * over a single-key linear sort. Rows-read comes from the scan node's
  * own metric after pushdown — not from plan shape.
  */
class LayoutSpec extends SparkTestBase with AdaptiveSparkPlanHelper {

  private def rowsRead(dir: String, pLo: Int, pHi: Int, sLo: Int, sHi: Int): (Long, Long) = {
    val df = spark.read.parquet(dir)
      .filter(col("l_partkey").between(pLo, pHi) &&
        col("l_suppkey").between(sLo, sHi))
      .agg(count(lit(1)).as("n"))
    val n = df.collect()(0).getLong(0)
    val scans = collect(df.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s
    }
    (scans.map(_.metrics("numOutputRows").value).sum, n)
  }

  test("z-ordered layout prunes row groups on both box dimensions") {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "l_quantity")
    val base = java.nio.file.Files.createTempDirectory("graft_layout").toString
    val zDir = s"$base/zorder"
    val linDir = s"$base/linear"
    // ~6k rows; 4 KiB groups yield ~50 row groups so min/max pruning has
    // real granularity to work with
    Layout.writeZOrdered(li, "l_partkey", "l_suppkey", zDir, 4 * 1024)
    Layout.writeLinearSorted(li, "l_partkey", linDir, 4 * 1024)

    val (pMax, sMax) = {
      val r = li.agg(max("l_partkey"), max("l_suppkey")).collect()(0)
      (r.getLong(0).toInt, r.getLong(1).toInt)
    }
    // a box in the low quarter of both dimensions
    val (zRead, zN) = rowsRead(zDir, 0, pMax / 4, 0, sMax / 4)
    val (linRead, linN) = rowsRead(linDir, 0, pMax / 4, 0, sMax / 4)
    assert(zN == linN, "layouts must agree on the answer")
    val total = li.count()
    assert(zRead < total, "z layout should prune at least some row groups")
    assert(zRead < linRead,
      s"z-order must out-prune the linear sort on a 2-D box: " +
        s"z=$zRead linear=$linRead total=$total")
  }

  test("hilbert layout prunes a 2-D box at least as well as the linear " +
    "sort") {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "l_quantity")
    val base = java.nio.file.Files
      .createTempDirectory("graft_hlayout").toString
    val hDir = s"$base/hilbert"
    val linDir = s"$base/linear"
    Layout.writeHilbertOrdered(li, "l_partkey", "l_suppkey", hDir, 4 * 1024)
    Layout.writeLinearSorted(li, "l_partkey", linDir, 4 * 1024)
    val (pMax, sMax) = {
      val r = li.agg(max("l_partkey"), max("l_suppkey")).collect()(0)
      (r.getLong(0).toInt, r.getLong(1).toInt)
    }
    val (hRead, hN) = rowsRead(hDir, 0, pMax / 4, 0, sMax / 4)
    val (linRead, linN) = rowsRead(linDir, 0, pMax / 4, 0, sMax / 4)
    assert(hN == linN, "layouts must agree on the answer")
    val total = li.count()
    assert(hRead < total, "hilbert layout should prune some row groups")
    assert(hRead < linRead,
      s"hilbert must out-prune the linear sort on a 2-D box: " +
        s"hilbert=$hRead linear=$linRead total=$total")
  }

  test("range-partitioned sorted write yields files with disjoint key " +
    "ranges — the file-skipping contract") {
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_partkey")
    val out = java.nio.file.Files
      .createTempDirectory("graft_rangewrite").toString + "/sorted"
    Layout.writeLinearSorted(li, "l_partkey", out, 128 * 1024, partitions = 8)
    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length > 1, "need multiple files to prove disjointness")
    // per-FILE key intervals: repartitionByRange gives each output file a
    // contiguous, non-overlapping slice of the key domain — exactly what
    // lets a manifest (or parquet footer read) skip whole FILES, not just
    // row groups, for a key-range predicate
    val spans = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("l_partkey"), max("l_partkey")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    spans.sliding(2).foreach {
      case Array((_, hiA), (loB, _)) =>
        assert(hiA <= loB,
          s"file key ranges overlap: [..,$hiA] vs [$loB,..] — range " +
            "clustering is broken")
      case _ =>
    }
  }
}
