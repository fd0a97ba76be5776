package graft

import org.apache.spark.sql.functions._

import graft.operators.{Breadth, Profiling}

/** Fixture invariants for the statistics/experimentation operators —
  * the algebraic facts that hold regardless of data values, asserted on
  * the harness fixture (each operator's VALUES are already hash-checked
  * against the DuckDB oracle; these pin the semantics a value-compare
  * can't, like "the split partitions the population").
  */
class StatsOpsSpec extends SparkTestBase {

  test("A/B split partitions the user population; rates match counts") {
    val r = Breadth.abTest(spark, sfDir).collect().head
    val nUsers = Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
    assert(na + nb == nUsers, "variants must partition the users")
    assert(r.getAs[Long]("conv_a") <= na && r.getAs[Long]("conv_b") <= nb)
    val ra = r.getAs[Double]("rate_a")
    assert(math.abs(ra - r.getAs[Long]("conv_a").toDouble / na) < 1e-4)
    // z sign agrees with the rate difference
    val z = r.getAs[Double]("z_stat")
    assert(z.sign == (ra - r.getAs[Double]("rate_b")).sign || z == 0.0)
  }

  test("co-occurrence: intersection bounds and complete pair matrix") {
    val rows = Breadth.cooccurrence(spark, sfDir).collect()
    val types = Tables.events(spark, sfDir)
      .select("event_type").distinct().count().toInt
    assert(rows.length == types * (types - 1) / 2)
    rows.foreach { r =>
      val (na, nb, both) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
        r.getAs[Long]("n_both"))
      assert(both <= math.min(na, nb), "A∩B can't exceed either side")
      assert(r.getAs[Double]("lift") >= 0.0)
    }
  }

  test("PSI terms are non-negative; IID split reads below alarm at scale") {
    // each term (p_a − p_b)·ln(p_a/p_b) ≥ 0 — both factors share sign —
    // so PSI is a true divergence: this holds for ANY data
    val rows = Profiling.driftPsi(spark, sfDir).collect()
    assert(rows.length == 10)
    rows.foreach(r => assert(r.getAs[Double]("psi_term") >= -1e-9))
    val st = rows.map(_.getAs[Double]("share_train")).sum
    assert(math.abs(st - 1.0) < 0.01, s"smoothed train shares sum to $st")
    // "IID split ⇒ PSI ≈ 0" is an ASYMPTOTIC fact (sampling bias scales
    // like bins/n: ~0.09 on the 50-doc sf0.001 fixture) — assert it where
    // n is large enough to mean something (50k docs at sf0.1)
    val atScale = Profiling.driftPsi(spark, "/root/testdata/sf0.1")
      .collect().map(_.getAs[Double]("psi_term")).sum
    assert(atScale < 0.05,
      s"PSI $atScale on an IID split at 50k docs should sit far below " +
        "the 0.1 alarm threshold")
  }

  test("Tukey fences bracket the quartiles; outliers are a minority") {
    val rows = Profiling.iqrOutliers(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("fence_lo") <= r.getAs[Double]("fence_hi"))
      // by construction ≥ 50% of values sit inside [q1, q3] ⊂ fences
      assert(r.getAs[Long]("n_outliers") * 2 < r.getAs[Long]("n_events"),
        "more than half the data outside Tukey fences is impossible")
    }
  }

  test("correlation matrix: bounded in [-1,1]; agrees with Spark's corr()") {
    val rows = Profiling.corrMatrix(spark, sfDir).collect()
    assert(rows.length == 6, "4 columns give 6 pairs")
    rows.foreach { r =>
      val c = r.getAs[Double]("corr")
      assert(c >= -1.0 && c <= 1.0, s"corr out of range: $r")
    }
    // cross-check one pair against Spark's own corr() aggregate — an
    // independent implementation (streaming covariance accumulators vs
    // our exact fixed-point sufficient statistics). The 2-dp cent fixing
    // and double rounding bound the gap well under 1e-3. (The fixture
    // draws the measures independently — discount~tax reads ≈ 0, and
    // price does NOT track quantity here; asserted agreement, not sign.)
    val reference = Tables.lineitem(spark, sfDir)
      .agg(corr(col("l_discount"), col("l_tax"))).collect()(0).getDouble(0)
    val dt = rows.find(r => r.getString(0) == "discount" &&
      r.getString(1) == "tax").get.getAs[Double]("corr")
    assert(math.abs(dt - reference) < 1e-3,
      s"exact-sum corr $dt vs Spark corr() $reference")
  }

  test("heavy hitters: a planted heavy token diluted across partitions survives") {
    import spark.implicits._
    // 'hot' is ~2% of all tokens (> N/100 threshold) but spread thin:
    // per doc it's 1 token in 50 — the pigeonhole composition, not a
    // lucky local concentration, must find it. Filler tokens are all
    // unique so no other token qualifies.
    val docs = (0 until 400).map { i =>
      (Seq("hot") ++ (0 until 49).map(j => s"u_${i}_$j")).mkString(" ")
    }.toDF("text").select(split(col("text"), " ").as("toks"))
      .repartition(8)
    val out = operators.TextAnalysis.heavyHittersOn(spark, docs).collect()
    assert(out.map(_.getString(0)).contains("hot"),
      s"planted heavy token missing from ${out.map(_.getString(0)).toSeq}")
    assert(out.length == 1, "unique fillers must not qualify")
    val hot = out.head
    assert(hot.getAs[Long]("cnt") == 400L)
    spark.catalog.clearCache()
  }

  test("naive Bayes: perfectly separable planted vocabularies classify " +
    "the holdout with accuracy 1; confusion matrix is diagonal") {
    import spark.implicits._
    // lang aa speaks {xa, ya}, lang bb speaks {zb, wb} — disjoint
    // vocabularies, so every holdout doc (doc_id % 5 == 0) must score
    // its own language strictly higher. 20 docs per lang, 4 holdout.
    val docs = (0 until 20).flatMap { i =>
      Seq((i * 2L, "xa ya xa", "aa"), (i * 2L + 1L, "zb wb zb", "bb"))
    }.toDF("doc_id", "text", "lang")
    val rows = operators.TextAnalysis.naiveBayesOn(docs).collect()
    assert(rows.forall(_.getAs[Double]("accuracy") == 1.0),
      s"expected perfect separation: ${rows.toSeq}")
    rows.foreach { r =>
      assert(r.getString(0) == r.getString(1),
        s"off-diagonal confusion row: $r")
    }
    assert(rows.map(_.getAs[Long]("n_docs")).sum == 8L,
      s"holdout census wrong: ${rows.toSeq}")
    spark.catalog.clearCache()
  }

  test("HLL rollup: union of daily sketches equals the direct build; " +
    "both within the error band of exact") {
    val rows = Breadth.hllRollup(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (u, d) = (r.getAs[Long]("est_union"), r.getAs[Long]("est_direct"))
      // Register state merges losslessly, but DataSketches scores a
      // merged sketch with the composite estimator while a single-pass
      // build keeps the (order-dependent, slightly tighter) HIP
      // estimator — the estimates agree closely, not bit-exactly.
      assert(math.abs(u - d).toDouble / d < 0.02,
        s"${r.getString(0)}: union $u vs direct $d diverge > 2%")
      val exact = r.getAs[Long]("exact_users")
      // lgK=12 standard error ≈ 1.04/√4096 ≈ 1.6%; allow 4 sigma
      assert(math.abs(u - exact).toDouble / exact < 0.065,
        s"${r.getString(0)}: estimate $u too far from exact $exact")
    }
  }

  test("stupid backoff: every level exercised with exact hand scores") {
    import spark.implicits._
    // train (doc_id % 5 != 0): "a b c a b c" and "b d e"
    //   tri (a,b,c)=2; bi (a,b)=2 (b,c)=2 (c,a)=1 (b,d)=1 (d,e)=1;
    //   uni a=2 b=3 c=2 d=1 e=1, N=9
    // eval (doc_id 5): "a b c x b d q" exercises all four levels:
    //   (a,b,c) hit -> 2/2 = 1.0;  (x,b,d) bigram backoff -> 1/(2*3);
    //   (c,x,b) unigram backoff -> 3/(4*9);  (b,c,x),(b,d,q) -> OOV 0
    val docs = Seq((1L, "a b c a b c"), (2L, "b d e"),
      (5L, "a b c x b d q")).toDF("doc_id", "text")
    val got = operators.TextAnalysis.stupidBackoffOn(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((3L, 1L, 1.0), (2L, 1L, 0.1667),
      (1L, 1L, 0.0833), (0L, 2L, 0.0)), s"got ${got.toSeq}")
  }
}
