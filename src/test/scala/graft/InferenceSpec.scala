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

  test("Nelson-Aalen: textbook increments sum, same risk sets as KM") {
    import spark.implicits._
    val obs = Seq((1L, 1L), (2L, 0L), (3L, 1L), (4L, 0L), (5L, 1L))
    val rows = Inference.naOn(obs.toDF("t", "death"))
      .orderBy("t_hours").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // H(1) = 1/5 = 0.2; H(3) = 0.2 + 1/3 -> 533333 -> 0.5333;
    // H(5) = + 1/1 -> 1533333 -> 1.5333
    assert(rows.toSeq == Seq((1L, 5L, 1L, 0.2), (3L, 3L, 1L, 0.5333),
      (5L, 1L, 1L, 1.5333)), s"got ${rows.toSeq}")
    // risk sets agree with the KM core on the identical frame
    val km = kmRows(obs)
    assert(rows.map(r => (r._1, r._2)).toSeq == km.map(r => (r._1, r._2)).toSeq)
  }

  test("perm test: planted extreme separation pins p at the add-one floor") {
    import spark.implicits._
    // group A values dwarf group B: no binomial reshuffle of 40 docs can
    // reproduce a mean gap this extreme except by re-drawing (near-)the
    // same split — expect very few extreme replicates.
    val docs = ((1 to 20).map(i => (i.toLong, 1000000L, true)) ++
      (21 to 40).map(i => (i.toLong, 1L, false)))
      .toDF("doc_id", "v", "ga")
    val r = Inference.permTestOn(docs).collect().head
    assert(r.getAs[Long]("n_a") == 20L && r.getAs[Long]("n_b") == 20L)
    assert(r.getAs[Double]("p_value") <= 0.05,
      s"planted separation must be significant: $r")
    // identical groups: every replicate is at least as extreme as the
    // observed zero gap -> p pins at exactly 1.0
    val flat = (1 to 40).map(i => (i.toLong, 7L, i <= 20))
      .toDF("doc_id", "v", "ga")
    val f = Inference.permTestOn(flat).collect().head
    assert(f.getAs[Double]("obs_diff") == 0.0)
    assert(f.getAs[Double]("p_value") == 1.0, s"null case: $f")
    // determinism: bit-identical on a rerun (no RNG state)
    assert(Inference.permTestOn(docs).collect().head == r)
  }

  test("Markov attribution: hand-computed removal effects on a planted " +
    "journey set") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // journeys: 2× (view -> purchase), 1× (click -> purchase), 1× click
    // only. Base P(conv) = 0.5·1 + 0.5·0.5 = 0.75; removing view strands
    // its half (P = 0.25, effect 2/3); removing click leaves P = 0.5
    // (effect 1/3).
    val events = Seq(
      (1L, 1L, ts(10), "view"), (1L, 2L, ts(20), "purchase"),
      (2L, 3L, ts(10), "view"), (2L, 4L, ts(20), "purchase"),
      (3L, 5L, ts(10), "click"), (3L, 6L, ts(20), "purchase"),
      (4L, 7L, ts(10), "click")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val got = Inference.markovOn(events).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got.keySet == Set("view", "click"), s"channels: $got")
    assert(got("view") == ((0.75, 0.25, 0.6667)), s"view: ${got("view")}")
    assert(got("click") == ((0.75, 0.5, 0.3333)), s"click: ${got("click")}")
    // a user whose FIRST event is the purchase routes start -> conv
    // directly and no removal can strand it
    val direct = Seq((9L, 8L, ts(5), "purchase"),
      (10L, 9L, ts(5), "view")).toDF("user_id", "event_id", "ts", "event_type")
    val d = Inference.markovOn(direct).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(d("view") == 0.5, s"direct conversion must survive removal: $d")
  }

  test("Shapley attribution: hand-computed coalition credit, efficiency") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // masks: u1 {A} conv, u2 {B} no-conv, u3 {A,B} conv, u4 {} conv.
    // v(∅)=1 v(A)=2 v(B)=1 v(AB)=3 over N=4 ->
    // φ_A = (1 + 2)/(2!·4) = 0.375, φ_B = (0 + 1)/8 = 0.125
    val events = Seq(
      (1L, 1L, ts(10), "chA"), (1L, 2L, ts(20), "purchase"),
      (2L, 3L, ts(10), "chB"),
      (3L, 4L, ts(10), "chA"), (3L, 5L, ts(15), "chB"),
      (3L, 6L, ts(20), "purchase"),
      (4L, 7L, ts(10), "purchase")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val got = Inference.shapleyOn(events).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("chA" -> 0.375, "chB" -> 0.125), s"got $got")
    // efficiency: Σφ = (v(full) − v(∅))/N exactly on dyadic values
    assert(got.values.sum == 0.5)
  }

  test("STL anomaly: a planted spike flags; its clean twin days do not") {
    import spark.implicits._
    // flat weekly-periodic series with ONE spiked day in the interior
    val p = Seq(0L, 7L, 14L, 0L, 0L, 0L, 0L)
    val daily = (1 to 28).map { d =>
      val day = java.sql.Date.valueOf(f"2024-03-$d%02d")
      val dow = (day.toLocalDate.toEpochDay % 7).toInt
      val x = 10L + p(dow) + (if (d == 14) 40L else 0L)
      (day, x)
    }.toDF("day", "x")
    val rows = Inference.stlAnomalyOn(daily).collect()
      .map(r => r.getDate(0).toString -> r.getBoolean(3)).toMap
    assert(rows("2024-03-14"), "planted spike must flag")
    // clean interior days far from the spike's MA window stay quiet
    Seq("2024-03-05", "2024-03-06", "2024-03-22", "2024-03-23")
      .foreach(d => assert(!rows(d), s"clean day $d flagged"))
  }

  test("binary segmentation: two planted steps localize at both levels") {
    import spark.implicits._
    // three regimes: 10/day (days 1-10), 30/day (11-20), 90/day (21-30).
    // Level 1 finds the bigger break at day 20; the left re-run finds
    // the day-10 step.
    val daily = (1 to 30).map { d =>
      val x = if (d <= 10) 10L else if (d <= 20) 30L else 90L
      (java.sql.Date.valueOf(f"2024-06-$d%02d"), x)
    }.toDF("day", "n_events")
    val rows = Inference.binarySegmentationOn(daily).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDate(2).toString)).toMap
    assert(rows("all") == ((30L, "2024-06-20")), s"got $rows")
    assert(rows("left")._2 == "2024-06-10",
      s"left re-run must find the smaller step: $rows")
    assert(rows("left")._1 == 20L && rows("right")._1 == 10L)
  }

  test("EWMA: dyadic recursion is exact and per-type independent") {
    import spark.implicits._
    val daily = Seq(
      ("a", "2024-01-01", 10L), ("a", "2024-01-02", 20L),
      ("a", "2024-01-03", 40L),
      ("b", "2024-01-01", 100L), ("b", "2024-01-02", 0L))
      .map { case (t, d, x) => (t, java.sql.Date.valueOf(d), x) }
      .toDF("event_type", "day", "x")
    val got = Inference.ewmaOn(daily).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(3)))
    // a: 10 -> (10+20)/2 = 15 -> (15+40)/2 = 27.5; b: 100 -> 50
    assert(got.toSeq == Seq(
      ("a", "2024-01-01", 10.0), ("a", "2024-01-02", 15.0),
      ("a", "2024-01-03", 27.5),
      ("b", "2024-01-01", 100.0), ("b", "2024-01-02", 50.0)),
      s"got ${got.toSeq}")
  }

  test("Holt: two-state dyadic fold matches the hand recurrence, " +
    "negative trend floors identically") {
    import spark.implicits._
    val daily = Seq(
      ("a", "2024-01-01", 4L), ("a", "2024-01-02", 8L),
      ("a", "2024-01-03", 4L),
      // falling series: trend goes NEGATIVE, exercising the signed
      // floor-division shift
      ("b", "2024-01-01", 100L), ("b", "2024-01-02", 0L))
      .map { case (t, d, x) => (t, java.sql.Date.valueOf(d), x) }
      .toDF("event_type", "day", "x")
    val got = Inference.holtOn(daily).collect().map(r =>
      (r.getString(0), r.getDate(1).toString,
        (r.getDouble(3), r.getDouble(4), r.getDouble(5))))
    // a: l1=4,b1=0; l2=(8+4+0)/2=6, b2=(0+2)/2=1;
    //    l3=(4+6+1)/2=5.5, b3=(1+(5.5-6))/2=0.25 -> forecast 5.75
    // b: l1=100,b1=0; l2=(0+100+0)/2=50, b2=(0-50)/2=-25 -> forecast 25
    assert(got.toSeq == Seq(
      ("a", "2024-01-01", (4.0, 0.0, 4.0)),
      ("a", "2024-01-02", (6.0, 1.0, 7.0)),
      ("a", "2024-01-03", (5.5, 0.25, 5.75)),
      ("b", "2024-01-01", (100.0, 0.0, 100.0)),
      ("b", "2024-01-02", (50.0, -25.0, 25.0))), s"got ${got.toSeq}")
  }

  test("Welch t-test: hand two-group fixture hits the textbook " +
    "t / Welch df / Cohen's d") {
    import spark.implicits._
    // en = [1,2,3] (mean 2, var 1), other = [4,6] (mean 5, var 2):
    // t = -3/sqrt(1/3 + 1) = -2.5981, df = (4/3)^2/(1/18 + 1) = 1.6842,
    // d = -3/sqrt(4/3) = -2.5981
    val docs = Seq((1L, "en"), (2L, "en"), (3L, "en"),
      (4L, "fr"), (6L, "fr")).toDF("n_chars", "lang")
    val r = Inference.welchTtestOn(docs).collect().head
    assert(r.getAs[Long]("n1") == 3L && r.getAs[Long]("n2") == 2L)
    assert(r.getAs[Double]("mean_en") == 2.0)
    assert(r.getAs[Double]("mean_other") == 5.0)
    assert(math.abs(r.getAs[Double]("t") - (-2.5981)) < 1e-9, s"$r")
    assert(math.abs(r.getAs[Double]("df") - 1.6842) < 1e-9, s"$r")
    assert(math.abs(r.getAs[Double]("cohens_d") - (-2.5981)) < 1e-9, s"$r")
  }

  test("ANOVA F: three planted groups with equal within-variance hit " +
    "the exact textbook F") {
    import spark.implicits._
    // [1,2,3], [2,3,4], [6,7,8]: SSW = 6, SSB = 42, F = (42/2)/(6/6) = 21
    val docs = Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 2L), ("b", 3L), ("b", 4L),
      ("c", 6L), ("c", 7L), ("c", 8L))
      .toDF("lang", "n_chars")
    val rows = Inference.anovaFOn(docs).collect()
    assert(rows.length == 3)
    val r = rows.head
    assert(r.getAs[Long]("df_between") == 2L &&
      r.getAs[Long]("df_within") == 6L)
    assert(r.getAs[Double]("ss_between") == 42.0, s"$r")
    assert(r.getAs[Double]("ss_within") == 6.0, s"$r")
    assert(r.getAs[Double]("f_stat") == 21.0, s"$r")
    assert(rows.map(x => (x.getString(0), x.getAs[Double]("mean_chars")))
      .toSeq == Seq(("a", 2.0), ("b", 3.0), ("c", 7.0)))
  }

  test("Kruskal-Wallis: textbook no-tie fixture hits H = 7.2; tie " +
    "correction scales a tied fixture to exactly 1.0") {
    import spark.implicits._
    // groups a/b/c at 1-2-3 / 4-5-6 / 7-8-9: ranks 1..9, H = 7.2, no ties
    val clean = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 4L), ("b", 5L),
      ("b", 6L), ("c", 7L), ("c", 8L), ("c", 9L))
      .toDF("lang", "n_chars")
    val rows = Inference.kruskalWallisOn(clean).collect()
    assert(rows.length == 3)
    val r0 = rows.head
    assert(r0.getAs[Long]("df") == 2L)
    assert(math.abs(r0.getAs[Double]("h") - 7.2) < 1e-9)
    assert(math.abs(r0.getAs[Double]("h_tie_corrected") - 7.2) < 1e-9)
    assert(rows.map(r => (r.getString(0), r.getAs[Double]("mean_rank")))
      .toSeq == Seq(("a", 2.0), ("b", 5.0), ("c", 8.0)))
    // ties: a=[1,1], b=[1,2] -> H = 0.6, sum(t^3-t) = 24,
    // c = 1 - 24/60 = 0.6 -> corrected exactly 1.0
    val tied = Seq(("a", 1L), ("a", 1L), ("b", 1L), ("b", 2L))
      .toDF("lang", "n_chars")
    val t0 = Inference.kruskalWallisOn(tied).collect().head
    assert(math.abs(t0.getAs[Double]("h") - 0.6) < 1e-9)
    assert(math.abs(t0.getAs[Double]("h_tie_corrected") - 1.0) < 1e-9)
  }

  test("Holt-Winters: hand 3-day recurrence with negative trend and " +
    "seasonal; constant series is a fixpoint through full rotation") {
    import spark.implicits._
    def daily(t: String, xs: Seq[Long]) = xs.zipWithIndex.map {
      case (x, i) =>
        (t, java.sql.Date.valueOf(f"2024-01-${i + 1}%02d"), x)
    }
    val df = (daily("a", Seq(8L, 12L, 6L)) ++
      daily("c", Seq.fill(10)(5L)))
      .toDF("event_type", "day", "x")
    val got = Inference.holtWintersOn(df).collect().map(r =>
      (r.getString(0), r.getDate(1).toString,
        (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))))
    // a: seed l=8,b=0,s=0; day2: l=(12-0+8+0)/2=10, b=(0+2)/2=1,
    //    s'=(0+12-10)/2=1, fc=10+1+0=11
    //    day3: l=(6-0+10+1)/2=8.5, b=(1-1.5)/2=-0.25, s'=(0+6-8.5)/2=-1.25,
    //    fc=8.5-0.25+0=8.25
    val a = got.filter(_._1 == "a").map(_._3)
    assert(a.toSeq == Seq((8.0, 0.0, 0.0, 8.0), (10.0, 1.0, 1.0, 11.0),
      (8.5, -0.25, -1.25, 8.25)), s"got ${a.toSeq}")
    // constant series: l=c, b=0, s=0 is a fixpoint of all three
    // recurrences, and 10 days > period 7 exercises a full rotation
    val c = got.filter(_._1 == "c").map(_._3)
    assert(c.forall(_ == (5.0, 0.0, 0.0, 5.0)), s"got ${c.toSeq}")
  }

  test("STL: periodic series decomposes to flat trend, exact seasonal, " +
    "zero residual") {
    import spark.implicits._
    // x = 10 + p[dow], p = (0,7,14,0,0,0,0): any 7-day sum is 91 -> the
    // centered MA is exactly 13 on every full-window day, the seasonal
    // component absorbs the pattern, and the residual vanishes.
    val p = Seq(0L, 7L, 14L, 0L, 0L, 0L, 0L)
    val daily = (1 to 21).map { d =>
      val day = java.sql.Date.valueOf(f"2024-03-$d%02d")
      val dow = ((day.toLocalDate.toEpochDay) % 7).toInt
      (day, 10L + p(dow))
    }.toDF("day", "x")
    val rows = Inference.stlOn(daily).orderBy("day").collect()
    assert(rows.length == 15, "only full 7-day windows survive")
    rows.foreach { r =>
      val (x, tr, se, res) =
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(tr == 13.0, s"flat trend, got $tr")
      assert(se == x - 13.0, s"seasonal absorbs the pattern, got $se for $x")
      assert(res == 0.0, s"residual vanishes, got $res")
    }
    // decomposition identity holds exactly on the engine's own corpus
    Inference.stlDecompose(spark, sfDir).collect().foreach { r =>
      val sum = r.getDouble(2) + r.getDouble(3) + r.getDouble(4)
      assert(math.abs(sum - r.getLong(1)) < 1e-9,
        s"x = trend + seasonal + resid, got $sum vs ${r.getLong(1)}")
    }
  }

  test("Mann-Kendall: strictly rising series gives S = C(n,2) and the " +
    "textbook z; constant series degenerates to NULL") {
    import spark.implicits._
    def daily(t: String, xs: Seq[Long]) = xs.zipWithIndex.map {
      case (x, i) => (t, java.sql.Date.valueOf(f"2024-02-${i + 1}%02d"), x)
    }
    // rising n=5: S = 10, no ties, var = 5*4*15/18 = 50/3,
    // z = (10-1)/sqrt(50/3) = 2.2045
    val df = (daily("up", Seq(1L, 2L, 3L, 4L, 5L)) ++
      daily("flat", Seq(7L, 7L, 7L, 7L))).toDF("event_type", "day", "x")
    val rows = Inference.mannKendallOn(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val up = rows("up")
    assert(up.getAs[Long]("s_mk") == 10L)
    assert(math.abs(up.getAs[Double]("z") - 2.2045) < 1e-9, s"$up")
    // all-tied: S = 0 and var = 0 (ties term cancels n(n-1)(2n+5))
    val fl = rows("flat")
    assert(fl.getAs[Long]("s_mk") == 0L)
    assert(fl.isNullAt(fl.fieldIndex("z")), s"$fl")
  }

  test("Bradley-Terry: dominant source takes ~all mass, wins counted " +
    "from buckets exactly, equal sources split evenly") {
    import spark.implicits._
    // X: two docs in bucket 5; Y: two docs in bucket 1 -> X wins all 4
    // cross pairs, Y none
    val docs = Seq(("X", 500L), ("X", 510L), ("Y", 100L), ("Y", 110L))
      .toDF("source", "n_chars")
    val rows = Inference.bradleyTerryOn(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq(("X", 4L, 4L), ("Y", 0L, 4L)), s"got ${rows.toSeq}")
    assert(rows.head._4 > 0.99, s"dominant share ${rows.head._4}")
    // symmetric sources: identical histograms -> equal shares
    val even = Seq(("A", 100L), ("A", 500L), ("B", 100L), ("B", 500L))
      .toDF("source", "n_chars")
    val ev = Inference.bradleyTerryOn(even).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(ev("A") == ev("B"), s"got $ev")
    // deterministic: full retrain is bit-identical
    val again = Inference.bradleyTerryOn(docs).collect()
      .map(r => (r.getString(0), r.getDouble(3)))
    assert(again.toSeq == rows.map(t => (t._1, t._4)).toSeq)
  }

  test("PSM: treated match the nearest not-greater score within nation, " +
    "unmatched treated counted but excluded from ATT") {
    import spark.implicits._
    // nation 1: treated k=2 (score 5, spend 1000 cents), controls k=1
    // (score 3, spend 400) and k=3 (score 7, spend 900) -> match k=1
    // (7 > 5 is greater; nearest not-greater is 3). treated k=4
    // (score 2, spend 300) -> no control with score <= 2+pack... k=1
    // has score 3 > 2 -> unmatched.
    // nation 2: treated k=6 (score 4, spend 800), control k=5
    // (score 4, spend 500) -> equal score matches (cmp: 4*2^20+5 <=
    // 4*2^20+6).
    val cust = Seq(
      (2L, 1L, 1000L, 5L), (1L, 1L, 400L, 3L), (3L, 1L, 900L, 7L),
      (4L, 1L, 300L, 2L),
      (6L, 2L, 800L, 4L), (5L, 2L, 500L, 4L))
      .toDF("c_custkey", "c_nationkey", "spend", "n_orders")
    val r = Inference.psmAttOn(cust).collect().head
    assert(r.getAs[Long]("n_treated") == 3L)
    assert(r.getAs[Long]("n_matched") == 2L)
    // ATT = ((1000-400) + (800-500)) / 2 = 450 cents = 4.5 dollars
    assert(r.getAs[Double]("att_dollars") == 4.5, s"$r")
    assert(r.getAs[Double]("match_rate") == 0.6667)
  }

  test("IPW: single-stratum Hajek means are plain means, " +
    "positivity-violating strata are trimmed") {
    import spark.implicits._
    // stratum 1: treated (2, 4) spend 100/200, control (1, 3) spend
    // 50/150 -> mean_t 150c, mean_c 100c, ATE 0.5 dollars.
    // stratum 2: only treated (6) -> trimmed out of n_used.
    val cust = Seq(
      (2L, 100L, 1L), (4L, 200L, 1L), (1L, 50L, 1L), (3L, 150L, 1L),
      (6L, 999L, 2L))
      .toDF("c_custkey", "spend", "n_orders")
    val r = Inference.ipwAteOn(cust).collect().head
    assert(r.getAs[Long]("n_used") == 4L && r.getAs[Long]("n_treated") == 2L)
    assert(r.getAs[Double]("mean_treated") == 1.5 &&
      r.getAs[Double]("mean_control") == 1.0 &&
      r.getAs[Double]("ate_dollars") == 0.5, s"$r")
  }

  test("DiD: planted 2x2 means recover the injected effect exactly") {
    import spark.implicits._
    def o(k: Long, d: String, v: Double) =
      (k, java.sql.Timestamp.valueOf(d + " 00:00:00"), v)
    // control means: pre 10, post 14 (trend +4);
    // treated: pre 20, post 29 (trend +4 plus effect +5)
    val orders = Seq(
      o(1L, "1996-01-01", 10.0), o(1L, "1999-01-01", 14.0),
      o(2L, "1996-01-01", 20.0), o(2L, "1999-01-01", 29.0))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val r = Inference.didOn(orders).collect().head
    assert(r.getAs[Long]("n_orders") == 4L)
    assert(r.getAs[Double]("treat_pre") == 20.0 &&
      r.getAs[Double]("treat_post") == 29.0 &&
      r.getAs[Double]("ctrl_pre") == 10.0 &&
      r.getAs[Double]("ctrl_post") == 14.0, s"$r")
    assert(r.getAs[Double]("did_dollars") == 5.0, s"$r")
  }
}
