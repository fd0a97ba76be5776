package graft

import org.apache.spark.sql.functions._

import graft.operators.{Inference, Profiling, TextAnalysis}

/** Planted-fixture semantics for the inference wave: Kaplan-Meier
  * censoring conventions, CUSUM peak location, bootstrap CI sanity and
  * determinism, skyline dominance, and kappa's algebraic identity. */
class InferenceSpec extends SparkTestBase {

  private def kmRows(obs: Seq[(Long, Long)]) = {
    import spark.implicits._
    Inference.kmOn(obs.toDF("t", "death"))
      .orderBy("t_hours")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
  }

  test("KM: textbook curve with interleaved censoring, zero tail pinned") {
    // subjects: death@1, censor@2, death@3, censor@4, death@5
    val rows = kmRows(Seq((1L, 1L), (2L, 0L), (3L, 1L), (4L, 0L), (5L, 1L)))
    // S(1) = 4/5; S(3) = 0.8 * 2/3; S(5): last subject dies -> exactly 0
    assert(rows.map(_._1).toSeq == Seq(1L, 3L, 5L), "one row per death time")
    assert(rows(0) == ((1L, 5L, 1L, 0.8)), s"got ${rows(0)}")
    assert(rows(1) == ((3L, 3L, 1L, 0.5333)), s"got ${rows(1)}")
    assert(rows(2) == ((5L, 1L, 1L, 0.0)), "exhausted risk set pins S=0.0")
  }

  test("KM: censored subjects at a death time remain at risk (deaths-first)") {
    val rows = kmRows(Seq((2L, 1L), (2L, 0L), (3L, 1L)))
    // t=2: risk 3 (censor@2 counted), d=1 -> S = 2/3
    assert(rows(0)._2 == 3L, "censored@2 still at risk at t=2")
    assert(rows(0)._4 == 0.6667)
    // t=3: only the last subject remains -> S = 0
    assert(rows(1) == ((3L, 1L, 1L, 0.0)))
  }

  test("CUSUM: a step shift peaks exactly at the change day") {
    import spark.implicits._
    val daily = (1 to 20)
      .map(d => (java.sql.Date.valueOf(f"2024-01-$d%02d"),
        if (d <= 10) 10L else 20L))
      .toDF("day", "n_events")
    val rows = Inference.cusumOn(daily).orderBy("day").collect()
    val peaks = rows.filter(_.getBoolean(3)).map(_.getDate(0).toString)
    assert(peaks.toSeq == Seq("2024-01-10"), s"peak at the shift, got $peaks")
    // exact integer statistic: T=20, N=300; S_10 = 20*100 - 10*300 = -1000
    val s10 = rows.find(_.getDate(0).toString == "2024-01-10").get.getLong(2)
    assert(s10 == -1000L)
    // flat series -> statistic is identically 0, every day ties as peak
    val flat = (1 to 5)
      .map(d => (java.sql.Date.valueOf(f"2024-02-$d%02d"), 7L))
      .toDF("day", "n_events")
    assert(Inference.cusumOn(flat).collect().forall(_.getLong(2) == 0L))
  }

  test("bootstrap CI: ordered, brackets the point estimate, deterministic") {
    val a = Inference.bootstrapCi(spark, sfDir).collect().head
    val (pe, lo, med, hi) =
      (a.getDouble(2), a.getDouble(3), a.getDouble(4), a.getDouble(5))
    assert(lo <= med && med <= hi, s"CI quantiles ordered: $lo $med $hi")
    assert(lo <= pe && pe <= hi,
      s"point estimate $pe inside the 95% CI [$lo, $hi]")
    // hash-keyed resampling: a rerun is bit-identical, no RNG state
    val b = Inference.bootstrapCi(spark, sfDir).collect().head
    assert(a == b, "Poisson bootstrap must be deterministic")
  }

  test("skyline: planted dominance, duplicates and equal-size ties") {
    import spark.implicits._
    val pts = Seq((1.0, 5), (1.0, 5), (1.0, 2), (2.0, 7), (2.0, 3),
      (3.0, 7), (4.0, 8)).toDF("p", "sz")
    val got = Profiling.skylineOn(pts).orderBy("p")
      .collect().map(r => (r.getDouble(0), r.getInt(1), r.getLong(2)))
    // (3.0, 7) is dominated by (2.0, 7): equal size, strictly cheaper.
    // (1.0, 2) and (2.0, 3) are dominated within/below their price.
    assert(got.toSeq == Seq((1.0, 5, 2L), (2.0, 7, 1L), (4.0, 8, 1L)),
      s"got ${got.toSeq}")
  }

  test("skyline: single-price corpus survives the degenerate-bounds guard") {
    import spark.implicits._
    val pts = Seq((9.0, 1), (9.0, 4)).toDF("p", "sz")
    val got = Profiling.skylineOn(pts).collect()
      .map(r => (r.getDouble(0), r.getInt(1), r.getLong(2)))
    assert(got.toSeq == Seq((9.0, 4, 1L)))
  }

  test("kappa: matches the identity recomputed from the confusion counts") {
    val conf = TextAnalysis.langId(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val n = conf.map(_._3).sum.toDouble
    val po = conf.filter(c => c._1 == c._2).map(_._3).sum / n
    val labels = (conf.map(_._1) ++ conf.map(_._2)).distinct
    val pe = labels.map { l =>
      conf.filter(_._1 == l).map(_._3).sum.toDouble *
        conf.filter(_._2 == l).map(_._3).sum.toDouble
    }.sum / (n * n)
    def fix4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    val row = TextAnalysis.langIdKappa(spark, sfDir).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(row.getDouble(1) == fix4(po), "p_o identity")
    assert(row.getDouble(2) == fix4(pe), "p_e identity")
    assert(row.getDouble(3) == fix4((po - pe) / (1.0 - pe)), "kappa identity")
    assert(row.getDouble(3) <= 1.0)
  }
}
