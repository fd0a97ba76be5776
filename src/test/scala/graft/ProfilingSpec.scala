package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.operators.Profiling

/** Profiling operators: result invariants plus the plan shapes that make
  * them affordable at scale (aggregate-only shuffles, pruned scans). */
class ProfilingSpec extends SparkTestBase with AdaptiveSparkPlanHelper {

  test("histogram bins partition the table: counts sum to row count") {
    val rows = Profiling.histogram(spark, sfDir).collect()
    val total = Tables.lineitem(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_items")).sum == total)
    // bins are contiguous ascending with monotone lower bounds
    val bins = rows.map(_.getAs[Int]("bin")).toSeq
    assert(bins == bins.sorted && bins.distinct.size == bins.size)
    val los = rows.map(_.getAs[Double]("bin_lo")).toSeq
    assert(los == los.sorted)
  }

  test("histogram scans read only the profiled column") {
    val df = Profiling.histogram(spark, sfDir)
    df.collect()
    val scans = collect(df.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    scans.foreach { s =>
      assert(s.requiredSchema.fieldNames.toSet.subsetOf(Set("l_extendedprice")),
        s"histogram scan reads ${s.requiredSchema.fieldNames.mkString(",")} — " +
          "profiling must not widen the scan beyond the profiled column")
    }
  }

  test("spearman: distributed tie-averaged ranks equal the window " +
    "spelling; monotone pair hits rho = 1") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // heavy ties: v = id % 7 over 1000 rows, ranked under (v, id)
    val df = spark.range(1000).select(col("id"),
      (col("id") % 7).as("v"))
    val dist = graft.operators.DistNtile
      .withRank(df, Seq(col("v").asc, col("id").asc), "rk")
      .groupBy("v").agg((min("rk") + max("rk")).as("r2_dist"))
    val win = df.withColumn("rk",
        rank().over(Window.orderBy("v")).cast("long"))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("v")))
      .groupBy("v")
      .agg((max(col("rk") * 2 + col("cnt") - 1)).as("r2_win"))
    val joined = dist.join(win, "v").collect()
    assert(joined.length == 7)
    joined.foreach(r => assert(
      r.getAs[Long]("r2_dist") == r.getAs[Long]("r2_win"),
      s"tie-averaged rank mismatch at v=${r.get(0)}: $r"))
    // every rho in [-1, 1] over the fixture (the fixture's measures are
    // independently drawn, so values near 0 are expected — cross-engine
    // exactness is pinned by the DuckDB oracle, not here)
    val rows = Profiling.spearmanMatrix(spark, sfDir).collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      val rho = r.getAs[Double]("rho")
      assert(rho >= -1.0 && rho <= 1.0, s"rho out of range: $r")
    }
  }

  test("AR(2) fit: alternating series hits the hand Yule-Walker " +
    "solution; constant series degenerates to NULL") {
    import spark.implicits._
    // y = 1,2,1,2,1,2: a_t = 6y-9 = ±3; c0=54, c1=-45, c2=36 ->
    // rho1=-0.8333, rho2=0.6667, phi1=-0.9091, phi2=-0.0909, resid=0.3030
    val ev = ((0 until 6).flatMap { d =>
      Seq.fill(if (d % 2 == 0) 1 else 2)(("a", d.toLong))
    } ++ (0 until 4).flatMap { d => Seq.fill(7)(("c", d.toLong)) })
      .toDF("event_type", "x")
    val rows = Profiling.arFitOn(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = rows("a")
    assert(a.getAs[Double]("rho1") == -0.8333 &&
      a.getAs[Double]("rho2") == 0.6667, s"$a")
    assert(a.getAs[Double]("phi1") == -0.9091 &&
      a.getAs[Double]("phi2") == -0.0909, s"$a")
    assert(a.getAs[Double]("resid_var_ratio") == 0.303, s"$a")
    // constant series: c0 = 0 -> every statistic NULL, no divide error
    val c = rows("c")
    assert(c.isNullAt(c.fieldIndex("rho1")) &&
      c.isNullAt(c.fieldIndex("phi1")), s"$c")
    spark.catalog.clearCache()
  }

  test("PACF: lag-1 equals ACF, lag-2 equals the Yule-Walker phi2, " +
    "lags beyond the sample emit NULL") {
    import spark.implicits._
    // same alternating fixture as the AR(2) spec: rho1=-0.8333,
    // phi2=-0.0909; only 6 days, so lags 6..7 have no pairs
    val ev = (0 until 6).flatMap { d =>
      Seq.fill(if (d % 2 == 0) 1 else 2)(("a", d.toLong))
    }.toDF("event_type", "x")
    val rows = Profiling.pacfOn(ev).collect()
      .map(r => r.getLong(1) -> r).toMap
    assert(rows.size == 7)
    assert(rows(1L).getAs[Double]("acf") == -0.8333)
    assert(rows(1L).getAs[Double]("pacf") == -0.8333,
      "pacf(1) must equal acf(1)")
    assert(rows(2L).getAs[Double]("pacf") == -0.0909,
      s"pacf(2) must equal Yule-Walker phi2: ${rows(2L)}")
    assert(rows(6L).isNullAt(rows(6L).fieldIndex("pacf")) &&
      rows(7L).isNullAt(rows(7L).fieldIndex("pacf")),
      "lags beyond the sample must be NULL")
    spark.catalog.clearCache()
  }

  test("kendall tau-b: perfect concordance hits 1, one swap gives 1/3, " +
    "tied fixture matches the hand tau-b") {
    import spark.implicits._
    def tau(pairs: (Long, Long)*) =
      Profiling.kendallTauOn(pairs.toDF("x", "y")).collect().head
    val perfect = tau((1L, 1L), (2L, 2L), (3L, 3L))
    assert(perfect.getAs[Double]("tau_b") == 1.0)
    assert(perfect.getAs[Long]("c_pairs") == 3L &&
      perfect.getAs[Long]("d_pairs") == 0L)
    val oneSwap = tau((1L, 2L), (2L, 1L), (3L, 3L))
    assert(math.abs(oneSwap.getAs[Double]("tau_b") - 1.0 / 3.0) < 1e-4)
    // ties on both axes: x=[1,1,2], y=[1,2,1] -> C=0, D=1,
    // nontied_x = nontied_y = 2 -> tau_b = -0.5
    val tied = tau((1L, 1L), (1L, 2L), (2L, 1L))
    assert(tied.getAs[Long]("c_pairs") == 0L &&
      tied.getAs[Long]("d_pairs") == 1L)
    assert(tied.getAs[Long]("nontied_x") == 2L &&
      tied.getAs[Long]("nontied_y") == 2L)
    assert(tied.getAs[Double]("tau_b") == -0.5)
    spark.catalog.clearCache()
  }

  test("skew profile: shares bounded, skew is share times key count") {
    val rows = Profiling.skewProfile(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val shares = rows.map(_.getAs[Double]("share"))
    assert(shares.sum <= 1.0001)
    assert(shares.forall(sh => sh > 0 && sh <= 1))
    // ordered heaviest-first
    val cnts = rows.map(_.getAs[Long]("cnt")).toSeq
    assert(cnts == cnts.sorted.reverse)
  }

  test("profiling shuffles carry aggregate rows, not fact rows") {
    Seq(Profiling.histogram(spark, sfDir),
      Profiling.skewProfile(spark, sfDir)).foreach { df =>
      df.collect()
      val ex = collect(df.queryExecution.executedPlan) {
        case e: ShuffleExchangeExec => e
      }
      // every shuffle's columns are (group key, counters/bounds) — the
      // profiled fact column itself never crosses a shuffle un-aggregated
      ex.foreach { e =>
        assert(!e.output.map(_.name).contains("l_extendedprice"),
          "fact column crossing a profiling shuffle un-aggregated")
      }
    }
  }

  test("winsorized means sit inside the clip band, which brackets the data") {
    val rows = Profiling.winsorized(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p05, p95) = (r.getAs[Double]("p05"), r.getAs[Double]("p95"))
      val wins = r.getAs[Double]("wins_mean")
      assert(p05 <= p95)
      assert(wins >= p05 - 1e-9 && wins <= p95 + 1e-9,
        s"winsorized mean $wins escaped the [$p05, $p95] clip band")
    }
  }

  test("winsorized mean matches a direct per-language computation") {
    import org.apache.spark.sql.functions.col
    val lang = Profiling.winsorized(spark, sfDir).collect().head
      .getAs[String]("lang")
    val vals = Tables.documents(spark, sfDir).filter(col("lang") === lang)
      .select("n_chars").collect().map(_.getLong(0).toDouble).sorted
    def pct(p: Double): Double = {
      val pos = p * (vals.length - 1)
      val (lo, hi) = (pos.toInt, math.min(pos.toInt + 1, vals.length - 1))
      vals(lo) + (pos - lo) * (vals(hi) - vals(lo))
    }
    val (p05, p95) = (pct(0.05), pct(0.95))
    val wins = vals.map(v =>
      math.floor(math.min(math.max(v, p05), p95) * 1e6 + 0.5) / 1e6).sum /
      vals.length
    val got = Profiling.winsorized(spark, sfDir)
      .filter(col("lang") === lang).collect().head.getAs[Double]("wins_mean")
    assert(math.abs(got - math.floor(wins * 1e4 + 0.5) / 1e4) < 1e-9,
      s"engine winsorized mean $got != direct $wins")
  }

  test("referential integrity: clean fixture, FK-only scans") {
    val df = Profiling.refIntegrity(spark, sfDir)
    val rows = df.collect()
    assert(rows.length == 7, "one row per FK edge")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_orphans") == 0L,
        s"${r.getAs[String]("rel")}: fixture must be referentially closed")
      assert(r.getAs[Long]("n_child_keys") <= r.getAs[Long]("n_child_rows"))
    }
    // the audit must never read payload columns: every scan is ≤1 column
    val scans = collect(df.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    scans.foreach { s =>
      assert(s.requiredSchema.fieldNames.length <= 1,
        s"integrity scan reads ${s.requiredSchema.fieldNames.mkString(",")} — " +
          "an FK audit must project only the key")
    }
  }

  test("source overlap: complete pair matrix with set-algebra invariants") {
    val rows = Profiling.sourceOverlap(spark, sfDir).collect()
    val nSources = Tables.documents(spark, sfDir)
      .select("source").distinct().count().toInt
    assert(rows.length == nSources * (nSources - 1) / 2,
      "one row per unordered source pair")
    rows.foreach { r =>
      val (na, nb, sh) = (r.getAs[Long]("na"), r.getAs[Long]("nb"),
        r.getAs[Long]("n_shared"))
      assert(sh <= math.min(na, nb), "intersection can't exceed a side")
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.0 && j <= 1.0)
      assert(r.getAs[String]("source_a") < r.getAs[String]("source_b"))
    }
  }

  test("exactQuantiles on empty and all-null columns returns NaN, not a throw") {
    // ADVICE r6: pos = p·(n−1) with n = 0 used to reach idxVal(-1)
    import spark.implicits._
    val empty = Seq.empty[Option[Double]].toDF("x")
    val allNull = Seq[Option[Double]](None, None).toDF("x")
    for (df <- Seq(empty, allNull)) {
      val qs = Profiling.exactQuantiles(df, "x", Seq(0.25, 0.5, 0.75))
      assert(qs.length == 3 && qs.forall(_.isNaN),
        s"degenerate input must yield NaN quantiles, got $qs")
    }
  }

  test("groupedQuantiles drops all-null groups (documented contract) and keeps mixed ones") {
    import spark.implicits._
    val df = Seq(("a", Some(1.0)), ("a", Some(3.0)),
      ("b", None), ("b", None), ("c", None), ("c", Some(5.0)))
      .toDF("k", "x")
    val m = Profiling.groupedQuantiles(df, "k", "x", Seq(0.5))
    assert(!m.contains("b"), "all-null group must be absent, not a throw")
    assert(m("a") == Seq(2.0))
    assert(m("c") == Seq(5.0), "nulls within a mixed group are ignored")
  }

  test("source overlap agrees with a direct two-source set intersection") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    val first2 = Tables.documents(spark, sfDir).select("source")
      .distinct().orderBy("source").take(2).map(_.getString(0))
    val Array(sa, sb) = first2
    def shingleSet(src: String): Set[String] = Tables.documents(spark, sfDir)
      .filter(col("source") === src)
      .select(explode(expr(
        "array_distinct(word_shingles(split(text, ' '), 3))")).as("g"))
      .distinct().collect().map(_.getString(0)).toSet
    val (xa, xb) = (shingleSet(sa), shingleSet(sb))
    val row = Profiling.sourceOverlap(spark, sfDir)
      .filter(col("source_a") === sa && col("source_b") === sb)
      .collect().head
    assert(row.getAs[Long]("na") == xa.size)
    assert(row.getAs[Long]("nb") == xb.size)
    assert(row.getAs[Long]("n_shared") == (xa intersect xb).size)
  }

  test("expectations: one lineitem scan serves all eight constraints; " +
    "only the known non-unique line key fails") {
    val df = graft.operators.Profiling.expectations(spark, sfDir)
    val rows = df.collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      assert((r.getAs[Long]("n_violations") == 0L) == r.getAs[Boolean]("passed"),
        s"verdict must be the zero test of the violation count: $r")
    }
    val failed = rows.filterNot(_.getAs[Boolean]("passed"))
      .map(_.getAs[String]("check_name")).toSeq
    assert(failed == Seq("unique:l_orderkey+l_linenumber"),
      s"fixture verdicts drifted: failed=$failed")
    // r14 shape: the 7 row-local checks fold into ONE pass and the
    // uniqueness census rides its own column-pruned branch (the old
    // single-aggregate spelling paid the one-distinct Expand — a ×2 row
    // amplification through the scan stage). Two scans exactly, and the
    // uniqueness branch must stay pruned to the 2-column pair key.
    val scans = collect(df.queryExecution.executedPlan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.size == 2, s"expected the two-branch shape, got ${scans.size}")
    val pairScan = scans.filter(_.schema.fieldNames.length == 2)
    assert(pairScan.nonEmpty &&
      pairScan.head.schema.fieldNames.toSet ==
        Set("l_orderkey", "l_linenumber"),
      s"uniqueness branch lost its 2-column pruning: ${scans.map(_.schema)}")
  }
}
