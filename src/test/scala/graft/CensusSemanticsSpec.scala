package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Profiling, Similarity}

/** Planted-data SEMANTICS for the round-6 census operators — the oracle
  * twin proves Spark and DuckDB compute the same thing; these prove it is
  * the RIGHT thing on inputs whose answer is hand-computable.
  */
class CensusSemanticsSpec extends SparkTestBase {

  test("watermark sweep counts exactly the planted late arrivals per delay") {
    import spark.implicits._
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    // user 1: arrival order 1,2,3 with event times 1000, 400, 940 —
    // event 2 is 600 s late vs the running max, event 3 is 60 s late.
    // user 2: perfectly ordered — contributes no lateness.
    val events = Seq(
      (1L, 1L, ts(1000)), (1L, 2L, ts(400)), (1L, 3L, ts(940)),
      (2L, 4L, ts(10)), (2L, 5L, ts(20))
    ).toDF("user_id", "event_id", "ts")
    val out = Profiling.watermarkSweepOn(events).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // delay 0: both disordered events are late (lag > 0)
    assert(out(0L)._1 == 2L, s"delay 0 late count: ${out(0L)}")
    // delay 60 s: the 60 s-late event is NOT late (lag must exceed D)
    assert(out(60L)._1 == 1L, s"delay 60 late count: ${out(60L)}")
    // delay 300 s: only the 600 s-late event remains
    assert(out(300L)._1 == 1L)
    // delay 900 s: nothing is that late
    assert(out(900L)._1 == 0L && out(3600L)._1 == 0L)
    // pct_late = n_late / 5, floor-fixed to 4 dp
    assert(out(0L)._2 == 0.4d)
  }

  test("embedding profile flags planted zero vectors and collapsed dims") {
    import spark.implicits._
    // 4 vectors in 3-d: dim 2 is CONSTANT (collapsed, var 0); one vector
    // is all-zero (zero norm); dims 0/1 vary.
    val vecs = Seq(
      (0L, Seq(1.0d, 0.0d, 0.5d)),
      (1L, Seq(0.0d, 2.0d, 0.5d)),
      (2L, Seq(3.0d, 1.0d, 0.5d)),
      (3L, Seq(0.0d, 0.0d, 0.0d))
    ).toDF("vec_id", "emb")
      .withColumn("nrm", expr("sqrt(aggregate(emb, 0D, (a, x) -> a + x * x))"))
    val r = Similarity.embeddingProfileOn(vecs).collect().head
    assert(r.getAs[Long]("n_vecs") == 4L)
    assert(r.getAs[Long]("n_dims") == 3L)
    assert(r.getAs[Long]("n_zero") == 1L, "the all-zero vector must be flagged")
    // dim 2 has values (.5,.5,.5,0) — NOT collapsed (the zero vector
    // varies it); no dim is constant across all four vectors, so plant a
    // truly-constant check on the first three vectors only
    val r3 = Similarity.embeddingProfileOn(vecs.filter(col("vec_id") < 3))
      .collect().head
    assert(r3.getAs[Long]("n_collapsed_dims") == 1L,
      s"dim 2 is constant over the first three vectors: $r3")
    assert(r3.getAs[Long]("n_zero") == 0L)
    assert(r3.getAs[Double]("norm_min") > 0d)
    // max variance sits on dim 0 (values 1,0,3): var = E[x^2]-E[x]^2 =
    // (10/3) - (4/3)^2 = 14/9 ~= 1.5555...; fixed to 8 dp
    assert(math.abs(r3.getAs[Double]("max_dim_var") - 14.0 / 9.0) < 1e-6,
      s"max_dim_var: $r3")
  }

  test("DSIR affinity separates planted target-like and off-target sources") {
    import spark.implicits._
    // target LM = lang 'en'. Source srcA's docs are English-vocabulary
    // ('alpha beta'), srcB's are disjoint off-target vocabulary
    // ('gamma delta'). λ(alpha/beta) > 0 > λ(gamma/delta), so srcA's
    // mean affinity must exceed srcB's, and the signs must split.
    val docs = Seq(
      (1L, "srcA", "en", "alpha beta alpha beta"),
      (2L, "srcA", "en", "beta alpha beta alpha"),
      (3L, "srcB", "zh", "gamma delta gamma delta"),
      (4L, "srcB", "zh", "delta gamma delta gamma")
    ).toDF("doc_id", "source", "lang", "text")
    val out = operators.TextAnalysis.dsirAffinityOn(docs).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("srcA") > 0d, s"target-like source must score positive: $out")
    assert(out("srcB") < 0d, s"off-target source must score negative: $out")
    assert(out("srcA") > out("srcB"))
  }

  test("mixture weights: each column normalizes and α<1 flattens shares") {
    val rows = operators.Curation.mixtureWeights(spark, sfDir).collect()
    val tol = 1e-4 * (rows.length + 1)
    for (c <- Seq("w_raw", "w_half", "w_quarter")) {
      val s = rows.map(_.getAs[Double](c)).sum
      assert(math.abs(s - 1.0) < tol, s"$c sums to $s")
    }
    // temperature flattening: the smallest source gains share as α drops,
    // the largest loses share
    val smallest = rows.minBy(_.getAs[Long]("n_toks"))
    val largest = rows.maxBy(_.getAs[Long]("n_toks"))
    assert(smallest.getAs[Double]("w_quarter")
      >= smallest.getAs[Double]("w_half"),
      s"α=1/4 must upweight the smallest source: $smallest")
    assert(smallest.getAs[Double]("w_half") >= smallest.getAs[Double]("w_raw"))
    assert(largest.getAs[Double]("w_quarter") <= largest.getAs[Double]("w_raw"),
      s"α=1/4 must downweight the largest source: $largest")
  }

  test("epoch schedule conserves the token budget and flags consistently") {
    val rows = operators.Curation.epochSchedule(spark, sfDir).collect()
    val totToks = rows.map(_.getAs[Long]("n_toks")).sum
    // Σ_s epochs_s · tokens_s = budget (one corpus pass), up to the 4-dp
    // fix on each epochs value
    val spent = rows.map(r =>
      r.getAs[Double]("epochs") * r.getAs[Long]("n_toks")).sum
    assert(math.abs(spent - totToks) < 2e-4 * totToks,
      s"budget conservation: spent $spent of $totToks")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("over_repeated")
        == (r.getAs[Double]("epochs") > 4.0d), s"flag mismatch: $r")
      assert(r.getAs[Double]("epochs") > 0d)
    }
  }

  test("Mann-Whitney: planted separation gives the textbook extremes") {
    import spark.implicits._
    // en strictly above non-en: U1 = n1·n2 (every pair won), so
    // rank_biserial = 1 − 2U1/(n1·n2) = −1 and z > 0; a tie-heavy
    // overlap case checks the doubled-midrank path stays exact
    val sep = Seq((100L, "en"), (110L, "en"), (10L, "zh"), (20L, "zh"),
      (30L, "zh")).toDF("n_chars", "lang")
    val r = operators.Inference.mannWhitneyOn(sep).collect().head
    assert(r.getAs[Long]("n1") == 2L && r.getAs[Long]("n2") == 3L)
    assert(r.getAs[Long]("u1x2") == 2L * 2L * 3L, s"U1 must be n1*n2: $r")
    assert(r.getAs[Double]("rank_biserial") == -1.0d)
    assert(r.getAs[Double]("z") > 0d)
    // all-equal values: U1 = n1·n2/2 exactly (pure midranks), z = 0
    val ties = Seq((5L, "en"), (5L, "en"), (5L, "zh"), (5L, "zh"))
      .toDF("n_chars", "lang")
    val t = operators.Inference.mannWhitneyOn(ties).collect().head
    assert(t.getAs[Long]("u1x2") == 2L * 2L, s"tied U1 must be n1*n2/2: $t")
    assert(t.getAs[Double]("rank_biserial") == 0.0d)
  }

  test("corpus funnel is monotone and anchored at the raw corpus") {
    val rows = operators.Curation.corpusFunnel(spark, sfDir).collect()
      .sortBy(_.getAs[Int]("stage_idx"))
    assert(rows.length == 5)
    val nDocs = rows.map(_.getAs[Long]("n_docs"))
    val nToks = rows.map(_.getAs[Long]("n_tokens"))
    assert(nDocs.zip(nDocs.tail).forall { case (a, b) => b <= a },
      s"docs must be non-increasing: ${nDocs.toSeq}")
    assert(nToks.zip(nToks.tail).forall { case (a, b) => b <= a },
      s"tokens must be non-increasing: ${nToks.toSeq}")
    val raw = Tables.documents(spark, sfDir)
    assert(nDocs.head == raw.count(), "stage 1 is the raw corpus")
    assert(rows.head.getAs[Double]("pct_docs") == 1.0d)
    assert(nDocs.last > 0L, "the funnel must not empty the corpus")
  }

  test("word coverage is monotone across vocab tiers and OOV-consistent") {
    val rows = operators.TextAnalysis.wordCoverage(spark, sfDir).collect()
    rows.foreach { r =>
      val (c1, c8, c32) = (r.getAs[Double]("cov_rate_1000"),
        r.getAs[Double]("cov_rate_8000"), r.getAs[Double]("cov_rate_32000"))
      assert(c1 <= c8 + 1e-9 && c8 <= c32 + 1e-9, s"tier monotonicity: $r")
      assert(c32 <= 1.0d)
      // the sf0.001 vocabulary is far under 32k words, so the top tier
      // must cover everything
      assert(r.getAs[Long]("oov_tokens") == 0L, s"no OOV at 32k here: $r")
      assert(c32 == 1.0d)
    }
  }

  test("distinct-ngram diversity stays within counting bounds") {
    val rows = operators.TextAnalysis.distinctNgrams(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_distinct_1") <= r.getAs[Long]("n_tokens"))
      for (c <- Seq("distinct_1", "distinct_2", "distinct_3")) {
        val v = r.getAs[Double](c)
        assert(v > 0d && v <= 1.0d, s"$c out of range: $r")
      }
    }
  }

  test("readability: planted doc counts words, sentences, vowel groups") {
    import spark.implicits._
    val docs = Seq(("en", "Hello world. Foo bar!")).toDF("lang", "text")
    val r = operators.TextAnalysis.readabilityOn(docs).collect().head
    // 4 words, 2 terminal marks, vowel groups: e,o / o / oo / a = 5
    assert(r.getAs[Long]("n_docs") == 1L)
    assert(r.getAs[Double]("wps") == 2.0, s"words/sentence: $r")
    assert(r.getAs[Double]("spw") == 1.25, s"syllables/word: $r")
    // a no-terminal-punctuation doc clamps to 1 sentence, not div-by-zero
    val bare = Seq(("en", "just words no stops")).toDF("lang", "text")
    val b = operators.TextAnalysis.readabilityOn(bare).collect().head
    assert(b.getAs[Double]("wps") == 4.0)
  }

  test("path regex: planted sessions classify by pattern, order by time") {
    import spark.implicits._
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    // user 1, one session: arrival order scrambled, event-time order is
    // view, click, purchase -> path "vcp": matches v.*p, not ^s/ee/^[vc]+$
    // user 1, second session (gap > 1800 s): error, error -> "ee"
    // user 2, one session: signup, view, click -> "svc": ^s only
    val events = Seq(
      (1L, 3L, ts(300), "purchase"), (1L, 1L, ts(100), "view"),
      (1L, 2L, ts(200), "click"),
      (1L, 4L, ts(9000), "error"), (1L, 5L, ts(9010), "error"),
      (2L, 6L, ts(50), "signup"), (2L, 7L, ts(60), "view"),
      (2L, 8L, ts(70), "click")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val got = operators.Breadth.pathRegexOn(events).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.values.forall(_._1 == 3L), s"3 sessions total: $got")
    assert(got("view_then_purchase[v.*p]")._2 == 1L, s"$got")
    assert(got("error_pair[ee]")._2 == 1L, s"$got")
    assert(got("signup_start[^s]")._2 == 1L, s"$got")
    assert(got("browse_only[^[vc]+$]")._2 == 0L, s"$got")
  }

  test("rolling distinct: trailing-7-day union, not a sum of DAUs") {
    import spark.implicits._
    def ts(day: Int) = Timestamp.valueOf(f"2024-05-$day%02d 12:00:00")
    // user 1 active on days 1 and 5 (one WAU member, two DAU hits);
    // user 2 active on day 5 only
    val events = Seq((ts(1), 1L), (ts(5), 1L), (ts(5), 2L), (ts(5), 2L))
      .toDF("ts", "user_id")
    val got = operators.Breadth.rollingDistinctOn(events).collect()
      .map(r => r.getDate(0).toString -> (r.getLong(1), r.getLong(2))).toMap
    // day 1: dau 1, wau 1; day 5: dau 2, but WAU window [apr 29..may 5]
    // holds the UNION {1, 2} = 2 (user 1 counted once despite two
    // active days in the window)
    assert(got("2024-05-01") == ((1L, 1L)), s"$got")
    assert(got("2024-05-05") == ((2L, 2L)), s"$got")
    assert(got.size == 2, "only active days emit rows")
  }

  test("keywords: planted source-specific term outranks shared vocabulary") {
    import spark.implicits._
    // 'zebra' lives only in source A (rate 5/15 vs corpus 5/30 -> lift 2);
    // 'the' is everywhere (lift 1); both clear the tf >= 5 floor
    val a = "the zebra the zebra the zebra the zebra the zebra"
    val b = "the cat the cat the cat the cat the cat"
    val docs = Seq(("A", a + " safari park camp"),
      ("B", b + " sofa nap rug")).toDF("source", "text")
    val rows = operators.TextAnalysis.keywordsOn(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getDouble(4)))
    val aTop = rows.filter(_._1 == "A").minBy(_._2)
    assert(aTop._3 == "zebra", s"A's top term: $rows")
    // exact integer arithmetic: A holds 13 tokens, the corpus 26 ->
    // r_s = round(5e6/13), r_c = round(5e6/26), lift ~ 2.0
    val rs = (2L * 5 * 1000000L + 13) / (2 * 13)
    val rc = (2L * 5 * 1000000L + 26) / (2 * 26)
    val lift4 = (2 * rs * 10000L + rc) / (2 * rc)
    assert(aTop._4 == lift4.toDouble / 10000.0, s"lift mismatch: $aTop")
    // ranks are 1..k and unique per source
    rows.groupBy(_._1).foreach { case (_, rs2) =>
      assert(rs2.map(_._2).sorted.sameElements(1L to rs2.length))
    }
  }

  test("burstiness: a one-doc burst dwarfs an evenly spread term") {
    import spark.implicits._
    // 'burst' = 60× in doc 1 only: mean 15, E[x²] 900, VMR = 675/15 = 45
    // 'even'  = 15× in each of 4 docs: zero variance, VMR = 0
    val docs = Seq(
      (1L, (Seq.fill(60)("burst") ++ Seq.fill(15)("even")).mkString(" ")),
      (2L, Seq.fill(15)("even").mkString(" ")),
      (3L, Seq.fill(15)("even").mkString(" ")),
      (4L, Seq.fill(15)("even").mkString(" "))
    ).toDF("doc_id", "text")
    val got = operators.TextAnalysis.burstinessOn(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(got("burst") == ((60L, 45.0)), s"got $got")
    assert(got("even") == ((60L, 0.0)), s"got $got")
  }

  test("unpivot: one row per (flag, measure), cnt cells sum to |lineitem|") {
    val rows = operators.Breadth.unpivotMeasures(spark, sfDir).collect()
    val flags = rows.map(_.getString(0)).distinct
    assert(rows.length == flags.length * 3, "3 measures per flag")
    assert(rows.map(r => (r.getString(0), r.getString(1))).distinct.length
      == rows.length, "cells are unique")
    val cntSum = rows.filter(_.getString(1) == "cnt").map(_.getDouble(2)).sum
    val total = Tables.lineitem(spark, sfDir).count()
    assert(cntSum.toLong == total, s"cnt cells sum to $total, got $cntSum")
  }

  test("CUPED: x = y per user makes theta 1, variance reduction 1, and " +
    "a fully-explained adjusted effect of 0") {
    import spark.implicits._
    // pre-period activity IS the post-period activity -> the covariate
    // explains everything: theta = 1, rho^2 = 1, diff_cuped = 0
    // regardless of which md5 bucket each user lands in
    val perUser = (1L to 40L).map(u => (u, u % 7L + 1L, u % 7L + 1L))
      .toDF("user_id", "x", "y")
    val r = operators.Breadth.cupedOn(perUser).collect().head
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") == 40L)
    assert(r.getAs[Double]("theta") == 1.0, s"$r")
    assert(r.getAs[Double]("var_reduction") == 1.0, s"$r")
    assert(r.getAs[Double]("diff_cuped") == 0.0, s"$r")
    assert(r.getAs[Double]("diff_raw") ==
      r.getAs[Double]("diff_raw"), "raw effect present")
    // zero-variance pre-period: theta and var_reduction NULL, no throw
    val flat = (1L to 10L).map(u => (u, 3L, u)).toDF("user_id", "x", "y")
    val f = operators.Breadth.cupedOn(flat).collect().head
    assert(f.isNullAt(f.fieldIndex("theta")) &&
      f.isNullAt(f.fieldIndex("var_reduction")), s"$f")
  }
}
