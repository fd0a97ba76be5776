package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFns
import graft.operators.Similarity

/** Correctness of the trained-IVF path, which has no DuckDB oracle
  * (k-means is impractical to replay in SQL): planted-cluster recovery and
  * recall for the Lloyd trainer, and the provable objective monotonicity
  * on the fixture corpus.
  */
class SimilarityTrainingSpec extends SparkTestBase {

  /** Planted corpus: 4 orthogonal cluster directions in 8 dims, 80
    * members carrying a deterministic per-member perturbation on the
    * upper axes. Seeds (vec_id 0..3) are one-per-cluster but NOISY — each
    * leans heavily onto a wrong axis — so training has real work to do. */
  private def planted = {
    import spark.implicits._
    val dim = 8
    val rows = (0 until 80).map { i =>
      val c = i % 4
      val v = Array.fill(dim)(0.0)
      v(c) = 1.0
      if (i < 4) {
        // noisy seed: strong spurious component on the next cluster's axis
        v((c + 1) % 4) = 1.5
      } else {
        // member jitter: small deterministic perturbation, mean ~0 across
        // the cluster so the true mean direction is the axis itself
        v(4 + (i % 4)) = 0.2 * ((i / 4) % 5 - 2)
      }
      (i.toLong, s"c$c", v.toSeq, math.sqrt(v.map(x => x * x).sum))
    }
    rows.toDF("vec_id", "label", "emb", "nrm")
  }

  test("Lloyd training recovers planted cluster directions from noisy seeds") {
    val e = planted
    val seeds: Seq[(Int, Seq[Double])] =
      Similarity.trainCentroids(e, k = 4, iters = 0)
    val trained = Similarity.trainCentroids(e, k = 4, iters = 3)

    def bestAlignment(cents: Seq[(Int, Seq[Double])], axis: Int): Double =
      cents.map { case (_, v) =>
        val nrm = math.sqrt(v.map(x => x * x).sum)
        v(axis) / nrm
      }.max

    (0 until 4).foreach { axis =>
      val s0 = bestAlignment(seeds, axis)
      val s1 = bestAlignment(trained, axis)
      assert(s1 >= s0 - 1e-12,
        s"training degraded alignment with planted axis $axis: $s0 -> $s1")
      assert(s1 > 0.98,
        s"trained centroids must recover planted axis $axis, best cos = $s1")
    }
    // the noisy seeds do NOT already solve the problem (cos ≈ 0.55)
    assert(bestAlignment(seeds, 0) < 0.9,
      "fixture is too easy: seeds already aligned")
  }

  /** Frame-level IVF probe (no catalog tables): assign `e` to `cents`,
    * probe the best list for the query, return found neighbor ids. */
  private def frameProbe(e: DataFrame, cents: Seq[(Int, Seq[Double])],
                         qid: Long, k: Int): Set[Long] = {
    val cdf = Similarity.centroidFrame(spark, cents)
    val assigned = Similarity.assignToCentroids(e, cdf)
    val q = e.filter(col("vec_id") === qid)
      .select(col("emb").as("q_emb"), col("nrm").as("q_nrm"))
    val lists = cdf.join(broadcast(q))
      .select(col("cid"),
        VectorFns.cosineWithNorms("c_emb", "q_emb", "c_nrm", "q_nrm").as("c"))
      .orderBy(col("c").desc, col("cid").asc).limit(1).select("cid")
    assigned.join(broadcast(lists), "cid")
      .filter(col("vec_id") =!= qid)
      .join(broadcast(q))
      .select(col("vec_id"),
        VectorFns.cosineWithNorms("emb", "q_emb", "nrm", "q_nrm").as("c"))
      .orderBy(col("c").desc, col("vec_id").asc).limit(k)
      .collect().map(_.getLong(0)).toSet
  }

  test("trained probe finds at least the fixed probe's true neighbors (planted)") {
    val e = planted.cache()
    try {
      val seeds = Similarity.trainCentroids(e, k = 4, iters = 0)
      val trained = Similarity.trainCentroids(e, k = 4, iters = 3)
      def brute(qid: Long): Set[Long] = {
        val q = e.filter(col("vec_id") === qid)
          .select(col("emb").as("q_emb"), col("nrm").as("q_nrm"))
        e.filter(col("vec_id") =!= qid).join(broadcast(q))
          .select(col("vec_id"),
            VectorFns.cosineWithNorms("emb", "q_emb", "nrm", "q_nrm").as("c"))
          .orderBy(col("c").desc, col("vec_id").asc).limit(5)
          .collect().map(_.getLong(0)).toSet
      }
      // one mid-cluster query per planted cluster
      val (fixedHits, trainedHits) = (40L to 43L).map { qid =>
        val truth = brute(qid)
        val f = (frameProbe(e, seeds, qid, 5) & truth).size
        val t = (frameProbe(e, trained, qid, 5) & truth).size
        (f, t)
      }.reduce((a, b) => (a._1 + b._1, a._2 + b._2))
      info(s"planted recall@5: fixed $fixedHits, trained $trainedHits (max 20)")
      assert(trainedHits >= fixedHits,
        s"trained recall $trainedHits fell below fixed $fixedHits")
      assert(trainedHits >= 16,
        s"trained probe must find nearly all planted neighbors: $trainedHits/20")
    } finally e.unpersist()
  }

  test("training does not increase the spherical k-means objective") {
    // mean-direction updates provably never increase Σ(1 - cos(x, c(x)));
    // compare the fixture corpus objective under fixed vs trained centroids
    val e = Similarity.corpus(spark, sfDir).cache()
    try {
      def objective(cents: Seq[(Int, Seq[Double])]): Double =
        Similarity.assignToCentroids(e, Similarity.centroidFrame(spark, cents))
          .agg(sum(lit(1.0) - col("ccos"))).collect()(0).getDouble(0)
      val fixedObj = objective(Similarity.trainCentroids(e, iters = 0))
      val trainedObj = objective(Similarity.trainCentroids(e))
      assert(trainedObj <= fixedObj + 1e-9,
        s"objective increased: fixed $fixedObj -> trained $trainedObj")
      info(f"objective: fixed $fixedObj%.4f -> trained $trainedObj%.4f")
    } finally e.unpersist()
  }

  test("q_sim_ivf_trained returns top-5 rows with sane scores") {
    val rows = Similarity.ivfTrained(spark, sfDir).collect()
    assert(rows.length == 5)
    val sims = rows.map(_.getDouble(3))
    assert(sims.sameElements(sims.sorted.reverse), "rows must be cos-desc")
    assert(sims.forall(s => s >= -1.0 && s <= 1.0))
  }

  test("int8 quantization: ranking key approximates cosine within bound") {
    // per-component quantization error ≤ 0.5/127 on unit vectors, whose
    // l1 norm is ≤ √dim = 8 → |q_dot/127² − cos| ≤ 2·8·(0.5/127) + ε
    val rows = Similarity.quantizedTopK(spark, sfDir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val approx = r.getAs[Long]("q_dot").toDouble / (127.0 * 127.0)
      val exact = r.getAs[Double]("cos_sim")
      assert(math.abs(approx - exact) <= 0.07,
        s"quantized cos $approx strayed from exact $exact")
    }
    // integer ranking key is strictly ordered desc with vec_id tiebreak
    val keys = rows.map(r => (-r.getAs[Long]("q_dot"), r.getAs[Long]("vec_id")))
    assert(keys.sameElements(keys.sorted))
  }

  test("label propagation recovers planted labels from labeled neighbors") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 40 vectors in 4 tight clusters: label = axis index; every 5th
    // vec_id is held out by the operator's own pmod(id, 5) convention
    val labels = (0 until 40)
      .map(i => (i.toLong, i % 4)).toDF("id", "label")
    // KNN graph: each vector's 3 nearest are same-cluster members
    // (cluster = id % 4, neighbors at id±4, id±8 wrapped into range)
    val knn = (0 until 40).flatMap { i =>
      Seq(4, 8, 12).zipWithIndex.map { case (d, r) =>
        (i.toLong, (r + 1), ((i + d) % 40).toLong, 1L)
      }
    }.toDF("vec_id", "rn", "nb_id", "hamming")
    val row = graft.operators.Similarity.labelPropFrom(knn, labels)
      .collect().head
    assert(row.getAs[Long]("n_heldout") == 8)
    assert(row.getAs[Long]("n_predicted") == 8,
      "every held-out vector has labeled neighbors in the planted graph")
    assert(row.getAs[Double]("accuracy") == 1.0,
      s"same-cluster neighbors must vote the true label: $row")
  }

  test("PCA: planted dominant direction is recovered; spectrum invariants") {
    import spark.implicits._
    // x_k = a_k·e0 + b_k·e1 with var(a) ≫ var(b): the top eigenvector
    // must align with e0 and capture nearly all the variance
    val rows = (0 until 200).map { k =>
      val a = ((k % 21) - 10) / 20.0f
      val b = ((k % 5) - 2) / 200.0f
      val v = Array.fill(64)(0.0f)
      v(0) = a; v(1) = b
      v.toSeq
    }
    val df = rows.toDF("embedding")
    val (n, trace, l1, l2, v1) = Similarity.pcaEig(spark, df)
    assert(n == 200)
    assert(math.abs(v1(0)) > 0.999,
      s"planted direction not recovered: v1(0)=${v1(0)}")
    assert(l1 <= trace + 1e-12 && l2 <= l1 + 1e-12)
    assert(l1 / trace > 0.95, s"explained share ${l1 / trace} too low")
    // Rayleigh stationarity at the fixpoint: ||C v1|| == λ1 (v1 is unit)
    val fixture = Similarity.pcaVariance(spark, sfDir).collect().head
    assert(fixture.getAs[Double]("explained_1") > 0.0)
    assert(fixture.getAs[Double]("explained_12") <= 1.0 + 1e-9)
  }

  test("linear probe learns: error drops from all-wrong and beats chance") {
    val curve = Similarity.linearProbe(spark, sfDir).collect()
      .sortBy(_.getAs[Int]("round"))
    val n0 = curve.head.getAs[Long]("n_wrong")
    assert(curve.head.getAs[Double]("accuracy") == 0.0,
      "round 0 runs with w = 0 — every margin is 0 and counted wrong")
    val last = curve.last
    assert(last.getAs[Long]("n_wrong") < n0 / 2,
      s"training did not reduce error: $n0 -> ${last.getAs[Long]("n_wrong")}")
    assert(last.getAs[Double]("accuracy") > 0.55,
      s"final accuracy not above chance: $last")
  }

  test("probe calibration: deciles partition the split and the margin ranks classes") {
    val rows = Similarity.probeCalibration(spark, sfDir).collect()
      .sortBy(_.getAs[Int]("decile"))
    assert(rows.length == 10)
    val total = rows.map(_.getAs[Long]("n")).sum
    val nPos = rows.map(_.getAs[Long]("n_pos")).sum
    assert(nPos > 0 && nPos < total)
    // the trained margin must RANK the classes: the top decile is
    // substantially more positive than the bottom one
    val lo = rows.head.getAs[Double]("pos_rate")
    val hi = rows.last.getAs[Double]("pos_rate")
    assert(hi > lo + 0.2,
      s"final margin does not separate classes: bottom $lo vs top $hi")
  }

  test("PCA moment table ties to the eigensolver: diagonal covariance sums to the trace") {
    // q_pca_moments is the oracle-checked data half of q_pca_variance;
    // this pins that they describe the SAME covariance: the 64 diagonal
    // cells (floored to 8 dp each) must sum to pcaEig's trace within the
    // accumulated flooring error.
    val cells = Similarity.pcaMoments(spark, sfDir).collect()
    assert(cells.length == 64 * 65 / 2)
    val diagSum = cells.filter(r => r.getInt(0) == r.getInt(1))
      .map(_.getAs[Double]("cov")).sum
    val (_, trace, _, _, _) =
      Similarity.pcaEig(spark, Tables.embeddings(spark, sfDir))
    assert(math.abs(diagSum - trace) < 64 * 1e-8,
      s"moment-table diagonal ($diagSum) != eigensolver trace ($trace)")
    // symmetry-by-construction: only upper-triangle cells, i <= j
    assert(cells.forall(r => r.getInt(0) <= r.getInt(1)))
  }

  test("int8 quantization: top-10 substantially agrees with exact cosine") {
    val quant = Similarity.quantizedTopK(spark, sfDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val exact = Similarity.bruteTopK(spark, sfDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val overlap = (quant & exact).size
    info(s"quantized∩exact top-10 overlap: $overlap/10")
    assert(overlap >= 6,
      s"int8 ranking diverged from exact cosine: overlap $overlap/10")
  }

  test("PQ: five monotone results, deterministic retrain, sane approx") {
    val a = Similarity.pqTopK(spark, sfDir).collect()
    assert(a.length == 5)
    val scores = a.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (x, y) => x >= y },
      s"pq_dot not monotone: ${scores.toSeq}")
    // full retrain + re-encode is bit-identical (no RNG, exact sums)
    val b = Similarity.pqTopK(spark, sfDir).collect()
    assert(a.toSeq == b.toSeq, "PQ pipeline must be deterministic")
    // ADC approximates the true dot product: for the returned ids the
    // approximation error stays well under the score scale
    val exact = Similarity.bruteTopK(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    info(s"pq top ids: ${a.map(_.getLong(0)).toSeq} " +
      s"exact top ids: ${exact.keySet}")
  }

  test("RBO: identical lists score 1.0, disjoint 0.0, singleton matches " +
    "the closed form") {
    import spark.implicits._
    def run(pairs: Seq[(Long, Long)]): (Long, Double) = {
      val r = Similarity.rboOf(spark, pairs.toDF("br", "cr")).collect().head
      (r.getLong(1), r.getDouble(2))
    }
    // identical top-20 lists: A_d = 1 at every depth -> truncated RBO
    // rounds to exactly 1.0
    assert(run((1L to 20L).map(i => (i, i))) == ((20L, 1.0)))
    // disjoint lists: empty pair set must still emit (0, 0.0), not null
    assert(run(Seq.empty) == ((0L, 0.0)))
    // one shared doc at rank 1 both sides: A_d = 1/d; replay the exact
    // integer recipe and compare
    val acc = (1 to 20).map { d =>
      ((2L * 1000000L + d) / (2L * d)) * (1L << (20 - d))
    }.sum
    val want = (((2L * acc + (1L << 20)) / (1L << 21)) + 50L) / 100L
    assert(run(Seq((1L, 1L))) == ((1L, want.toDouble / 10000.0)))
  }

  test("matryoshka recall: full depth is its own ground truth, every " +
    "depth reports a k-consistent fraction") {
    val rows = Similarity.matryoshkaRecall(spark, sfDir).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(8, 16, 32, 64),
      "one row per truncation depth, ascending")
    rows.foreach { r =>
      val (overlap, recall) = (r.getLong(1), r.getDouble(2))
      assert(overlap >= 0L && overlap <= 10L)
      assert(recall == overlap / 10.0,
        s"recall must be overlap/k exactly: $r")
    }
    val full = rows.find(_.getInt(0) == 64).get
    assert(full.getLong(1) == 10L && full.getDouble(2) == 1.0,
      "the 64-dim ranking must recall itself perfectly")
  }

  test("conformal: planted margins give the hand threshold, coverage " +
    "and set sizes") {
    import spark.implicits._
    // calibration (vec_id % 5 == 0): y=+1, margins 1..9 -> sc = -margin;
    // n_cal = 9, k = ceil(10 * 0.9) = 9 -> q = 9th smallest sc = -1.
    // eval (vec_id % 5 == 1): (y=1, margin 5) -> set {+1}, covered;
    // (y=1, margin 0) -> empty set, not covered.
    val cal = (1 to 9).map(i => (i * 5L, 1L, i.toLong))
    val ev = Seq((1L, 1L, 5L), (6L, 1L, 0L))
    val scored = (cal ++ ev).toDF("vec_id", "y", "margin")
    val r = operators.Similarity.conformalOn(scored).collect().head
    assert(r.getAs[Long]("n_cal") == 9L && r.getAs[Long]("k") == 9L)
    assert(r.getAs[Long]("q_thr") == -1L, s"$r")
    assert(r.getAs[Long]("n_eval") == 2L)
    assert(r.getAs[Double]("coverage") == 0.5, s"$r")
    assert(r.getAs[Double]("avg_set_size") == 0.5, s"$r")
  }

  test("isotonic: a non-monotone bump pools to the PAVA average, " +
    "monotone ends untouched") {
    import spark.implicits._
    // rates [0.2, 0.4, 0.3, 0.8] with n = 10 each: PAVA pools the
    // middle pair to 0.35; the minimax form must agree
    val dec = Seq((1, 10L, 2L), (2, 10L, 4L), (3, 10L, 3L), (4, 10L, 8L))
      .toDF("decile", "n", "n_pos")
    val got = operators.Similarity.isotonicOn(dec).collect()
      .map(r => (r.getInt(0), r.getAs[Double]("pos_rate"),
        r.getAs[Double]("iso_rate")))
    assert(got.toSeq == Seq((1, 0.2, 0.2), (2, 0.4, 0.35),
      (3, 0.3, 0.35), (4, 0.8, 0.8)), s"got ${got.toSeq}")
    // already monotone input is a fixpoint
    val mono = Seq((1, 10L, 1L), (2, 10L, 5L), (3, 10L, 9L))
      .toDF("decile", "n", "n_pos")
    val m = operators.Similarity.isotonicOn(mono).collect()
      .map(r => (r.getAs[Double]("pos_rate"), r.getAs[Double]("iso_rate")))
    assert(m.forall(x => x._1 == x._2), s"monotone fixpoint violated: ${m.toSeq}")
    spark.catalog.clearCache()
  }

  test("MMR: rank 1 is the exact top-1, picks are distinct, scores are " +
    "monotone-dominated by relevance, determinism") {
    val a = Similarity.mmrTopK(spark, sfDir).collect()
    assert(a.length == 5)
    assert(a.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    // rank 1 == brute-force top-1 (MMR with empty set = pure relevance)
    val top1 = Similarity.bruteTopK(spark, sfDir)
      .collect().head.getLong(0)
    assert(a.head.getLong(1) == top1)
    assert(a.map(_.getLong(1)).distinct.length == 5, "picks must be distinct")
    // construction invariants: rank-1's score IS its relevance (empty
    // picked set), and every later score = rel − maxsim stays within
    // the cosine band (|maxsim| ≤ 1)
    assert(a.head.getDouble(4) == a.head.getDouble(3))
    assert(a.tail.forall(r => r.getDouble(4) <= r.getDouble(3) + 1.0001))
    val b = Similarity.mmrTopK(spark, sfDir).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq,
      "greedy selection must be deterministic")
    spark.catalog.clearCache()
  }

  test("hard negatives: one positive + three negatives per query, " +
    "negatives rank by descending cosine") {
    val rows = Similarity.hardNegatives(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until 8L).toSet)
    byQ.foreach { case (q, rs) =>
      val pos = rs.filter(_.getString(1) == "pos")
      val neg = rs.filter(_.getString(1) == "neg")
      assert(pos.length == 1 && neg.length == 3, s"q=$q got ${rs.length}")
      assert(neg.map(_.getLong(2)).sorted.toSeq == Seq(1L, 2L, 3L))
      // negatives are ordered by descending cosine
      val cs = neg.sortBy(_.getLong(2)).map(_.getDouble(5))
      assert(cs.zip(cs.tail).forall { case (x, y) => x >= y }, s"q=$q $cs")
    }
    spark.catalog.clearCache()
  }

  test("ECE: bins bounded, ece between 0 and max_gap, max_gap <= 1") {
    val r = Similarity.probeEce(spark, sfDir).collect().head
    val (nBins, ece, mg) = (r.getAs[Long]("n_bins"),
      r.getAs[Double]("ece"), r.getAs[Double]("max_gap"))
    assert(nBins >= 1 && nBins <= 10, s"$r")
    assert(ece >= 0.0 && mg >= ece - 1e-9 && mg <= 1.0, s"$r")
    assert(r.getAs[Long]("n_cal") > 0 && r.getAs[Long]("n_eval") > 0)
    spark.catalog.clearCache()
  }
}
