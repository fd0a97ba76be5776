package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Fleet-wide plan hygiene, enforced over EVERY registered query: the
  * properties that decide 100 TB viability, asserted globally so a new
  * operator can't quietly regress them.
  *
  *  1. No shuffle exchange may carry raw document text or embedding
  *     vectors — candidate generation and aggregation must move ids,
  *     digests, keys, and narrow tuples.
  *  2. No unbounded join algorithm (cartesian / broadcast-nested-loop)
  *     unless one side is a literal handful of rows (the 1-row stats
  *     frames a few queries broadcast on purpose).
  */
class ShuffleHygieneSpec extends SparkTestBase with AdaptiveSparkPlanHelper {

  /** Column names whose presence in a shuffle means document-scale bytes
    * are crossing the wire. */
  private val heavyCols = Set("text", "emb", "embedding", "sh", "toks", "big")

  /** Queries allowed a bounded nested-loop/cartesian: each crossJoins a
    * one-row (or literal-k-row) aggregate/stats frame — broadcast-tiny by
    * construction, asserted tiny below. */
  private val nestedLoopAllowed = Set(
    "q_setops", "q_ntile", "q_dedup_embed", "q_sim_topk", "q_sim_topk_batch",
    "q_sim_ann_lsh", "q_sim_ann_batch", "q_sim_ivf", "q_sim_ivf_trained",
    "q_ann_recall", "q_dedup_minhash", "q_dedup_ngram", "q_tfidf",
    "q_sim_ann_multiprobe",
    "q_histogram", "q_skew_profile",
    // 1-row broadcast query vector (same shape as q_sim_topk)
    "q_sim_quantized",
    // inherits the broadcast query vector + a 1-row recall census frame
    "q_sim_rerank",
    // |sources|-row size-table self-join on an inequality key
    "q_source_overlap",
    // 7 crossJoins of 1-row orphan-count aggregates
    "q_ref_integrity",
    // 1-row corpus-stats frame (N, avgdl) broadcast onto the postings
    "q_bm25",
    // inherits q_bm25's stats frame + the 1-row query-vector broadcast
    "q_hybrid_rrf",
    // crossJoin of two 1-row DCG/IDCG aggregates + ANN-side broadcasts
    "q_ann_ndcg",
    // 1-row bounds + 1-row split-totals frames joined onto 10 bin rows
    "q_drift_psi",
    // crossJoin of the 1-row held-out census onto the accuracy aggregate
    "q_label_prop",
    // 1-row grand-total frame broadcast onto the |types|×2 cell table
    "q_chi_squared",
    // 1-row decile-boundary frame broadcast onto the scan (q_histogram shape)
    "q_equidepth_hist",
    // crossJoins of three 1-row census aggregates (q_ref_integrity shape)
    "q_triangles",
    // 1-row user-census aggregate broadcast onto the |types|² lift table
    // (r15: the census moved from a blocking driver count into the plan)
    "q_cooccurrence",
    // NOT IN plans the null-aware anti join (BroadcastNestedLoopJoin with
    // the null-check conjunct) — build side is the broadcast-tiny
    // distinct subquery key set; the NAAJ plan IS the operator under test
    "q_null_anti",
    // 1-row digit-total frame broadcast onto the 9-row digit table
    "q_benford",
    // 1-row quartile-boundary frame broadcast onto the customer aggregate
    "q_rfm",
    // 1-row decile-boundary frame broadcast onto the scan (q_equidepth_hist
    // shape)
    "q_lift_curve",
    // 1-row token-budget frame broadcast onto the bucketed scan
    "q_token_budget",
    // inherits the q_sim_topk_batch/q_sim_ann_batch broadcast shapes
    "q_ann_mrr",
    // 1-row quartile-boundary frame broadcast onto the user aggregate
    "q_cmh_test",
    // 1-row user-total frame broadcast onto the ≤horizon-row hour table
    "q_survival",
    // same 1-row user-total shape as q_survival
    "q_nelson_aalen",
    // crossJoin of the 1-row norm census onto the 1-row dimension census
    "q_embedding_profile",
    // 1-row (n_days, n_total) + 1-row max|S| frames onto the day table
    "q_cusum",
    // 1-row CI-quantile frame crossJoined onto the 1-row point estimate
    "q_bootstrap_ci",
    // 1-row price-bounds frame onto the distinct-price aggregate (the
    // q_histogram shape); the bucket-prefix and survivor frames join
    // with equi-keys
    "q_skyline",
    // crossJoins of three ≤1-row agreement/chance/total aggregates
    "q_langid_kappa",
    // 1-row corpus-total frames broadcast onto the cell/marginal tables
    "q_mutual_info",
    // 1-row corpus-size frame broadcast onto the per-anchor draw frame
    "q_negative_sample",
    // 1-row min-stratum budget frame broadcast onto the doc scan
    "q_stratified_sample",
    // 1-row straddling-cluster census crossJoined onto the 3-row split agg
    "q_split_assign",
    // crossJoins of five 1-row census aggregates (q_ref_integrity shape)
    "q_bloom_prune",
    // 1-row global-max frame broadcast onto the ≤|buckets|-row aggregate
    "q_padding_waste",
    // two 1-row (test-grams × shared) census crossJoins, one per method
    "q_split_contamination",
    // 1-row weight-normalizer frame broadcast onto the ≤|sources|-row agg
    "q_mixture_weights",
    // same 1-row normalizer shape as q_mixture_weights
    "q_epoch_schedule",
    // 1-row corpus-mean-score frame broadcast onto the doc flag table
    "q_corpus_funnel",
    // 1-row (T, R, V) LM-scalar frame broadcast onto the vocab table
    "q_dsir_affinity",
    // the q_sim_topk_batch broadcast query-batch shape (=!= join) plus
    // the 1-row decile-boundary frame broadcast onto the eval scan
    "q_ece",
    // 1-row all-round-weights frame broadcast onto the scoring scan +
    // the 1-row bucket-total census (q_probe_calibration shape)
    "q_data_maps",
    // the q_sim_topk_batch broadcast query-batch shape (=!= join)
    "q_hard_negatives",
    // 1-row trained-weights frame broadcast onto the scoring scan
    "q_probe_calibration",
    // the same weights broadcast + 1-row calibration-census/threshold
    // frames crossJoined onto the eval scan
    "q_conformal",
    // <=10-row decile frames in the bounded interval-lattice joins
    "q_isotonic",
    // DistNtile.withRank's triangular offsets join over the
    // ≤shuffle-partitions-row per-partition counts frame, once per
    // ranked column (4 columns)
    "q_spearman",
    // 1-row observed-groups frame crossJoined onto the doc scan, the
    // R-row replicate aggregate, and the 1-row extremeness count
    "q_perm_test",
    // |langs|-row group frame crossJoined with the 1-row totals and the
    // 1-row H frames
    "q_kruskal_wallis",
    // same |langs|-row group frame + 1-row totals/F shape
    "q_anova_f",
    // inequality join over the ≤550-cell contingency table (domain² cell
    // pairs, never facts) + 1-row marginal-census crossJoins
    "q_kendall_tau",
    // |brands|-row community frame crossJoined with the 1-row edge-count
    // and 1-row modularity frames
    "q_modularity",
    // 5-row per-language parameter frame crossJoined onto the holdout
    // scan + the 1-row vocab/train-count/accuracy frames
    "q_naive_bayes",
    // 1-row basket-census frame broadcast onto the rule table
    "q_assoc_rules",
    // 1-row key-domain (kbase) frame broadcast onto the activity scan,
    // visible on both the treated and control branches of the as-of join
    "q_psm_att",
    // 1-row test-basket census crossJoined onto the 1-row hit aggregate
    // (the top-200 rule table itself joins with an equi-key)
    "q_assoc_eval",
    // 1-row calendar-midpoint frame broadcast onto the events scan
    "q_cuped",
    // bounded (<=200-row) candidate-triple list broadcast onto the
    // basket scan - the Apriori pruned level-3 pass
    "q_freq_triples",
    // 1-row corpus-token-total frame broadcast onto the pair table
    "q_keywords",
    // 1-row query-phrase frame broadcast onto the posting scan (the OR
    // tok-match makes it a nested loop; build side is one row)
    "q_phrase_search",
    // 1-row median + 1-row MAD frames crossJoined onto the ≤31-day table
    "q_stl_anomaly",
    // 1-row revenue-total frame crossJoined onto the 10-row decile table
    "q_lorenz",
    // per segment: 1-row stats + 1-row max frames onto the day table
    // (the q_cusum shape ×3 segments)
    "q_binary_segmentation",
    // 1-row distinct-pair census crossJoined onto the 1-row checks
    // aggregate (r14 uniqueness-branch split)
    "q_expectations")

  // ONE sweep over the registry (executing every query once — the
  // dominant cost of this suite), with both plan properties checked off
  // the same executed plan
  private lazy val executedPlans: Seq[(String, org.apache.spark.sql.execution.SparkPlan)] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, run) =>
      val df = run(spark, sfDir)
      df.collect()
      val plan = df.queryExecution.executedPlan
      spark.catalog.clearCache() // queries that cache must not stack up
      name -> plan
    }

  test("no registered query shuffles raw text or embedding vectors") {
    val offenders = executedPlans.flatMap { case (name, plan) =>
      val shuffled = collect(plan) {
        case e: ShuffleExchangeExec => e
      }.flatMap(_.output.map(_.name)).toSet
      val bad = shuffled.intersect(heavyCols)
      if (bad.nonEmpty) Some(s"$name shuffles $bad") else None
    }
    assert(offenders.isEmpty,
      s"document-scale columns crossing shuffles:\n${offenders.mkString("\n")}")
  }

  /** Queries allowed an UNPARTITIONED window (Window.orderBy with no
    * partitionBy — a single-task sort): each documented entry runs over a
    * provably BOUNDED frame (calendar days/hours, deciles, hash slices,
    * top-k heads, distinct-value domains, replicate counts), never over a
    * corpus-cardinality one. Data-cardinality global cuts must use
    * [[graft.operators.DistNtile]] instead (the q_lorenz /
    * q_probe_calibration round-8 fix) — this sweep is what keeps the
    * bare-ntile pattern from shipping again. */
  private val globalWindowAllowed: Map[String, String] = Map(
    "q_ann_ndcg" -> "rank windows over the ≤k-row retrieval lists",
    "q_cusum" -> "running stat over the calendar-day frame",
    "q_hybrid_rrf" -> "rank windows over the two ≤20-row ranker heads",
    "q_ks_test" -> "cumulative CDF over the distinct-value domain",
    "q_lift_curve" -> "boundary/cumulative windows over the 10-row decile table",
    "q_lorenz" -> ("cumulative share over the 10-row decile table " +
      "(the decile CUT itself is DistNtile)"),
    "q_kruskal_wallis" -> "rank-sum over the distinct-value domain",
    "q_mann_whitney" -> "rank-sum over the distinct-value domain",
    "q_quantile_norm" -> ("pooled CDF + union-tag step alignment over " +
      "the distinct-length domain (no join — the r12 BNLJ kill)"),
    "q_isotonic" -> "cumulative sums over the 10-row decile table",
    "q_nelson_aalen" -> "cumulative hazard over the ≤horizon-hour table",
    "q_quality_retention" -> "cumulative retention over the 10-row decile table",
    "q_sim_rerank" -> "rank over the 5-row reranked head",
    "q_skyline" -> "prefix-max over the distinct-price aggregate",
    "q_split_assign" -> "ordering the 3-row split census",
    "q_stl_anomaly" -> "trend/MAD windows over the calendar-day frame",
    "q_stl_decompose" -> "trend windows over the calendar-day frame",
    "q_survival" -> "KM product over the ≤horizon-hour table",
    "q_user_growth" -> "running distinct over the calendar-day frame",
    "q_vocab_growth" -> "cumulative curve over the 16 md5 slices",
    "q_word_coverage" -> "cumulative coverage over the top-k token head",
    "q_zipf_fit" -> "rank over the top-k token head")

  test("no registered query runs an unpartitioned window over a " +
    "data-cardinality frame") {
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    val offenders = executedPlans.flatMap { case (name, plan) =>
      val globals = collect(plan) {
        case w: WindowExec if w.partitionSpec.isEmpty => w: Any
        case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => w: Any
      }
      if (globals.nonEmpty && !globalWindowAllowed.contains(name))
        Some(s"$name plans ${globals.size} unpartitioned window(s)")
      else None
    }
    assert(offenders.isEmpty,
      "unpartitioned windows outside the bounded-frame allow-list " +
        s"(use DistNtile for data-sized cuts):\n${offenders.mkString("\n")}")
  }

  test("no registered query runs an unbounded cartesian or nested-loop join") {
    val offenders = executedPlans.flatMap { case (name, plan) =>
      val loops = collect(plan) {
        case j: CartesianProductExec => j: Any
        case j: BroadcastNestedLoopJoinExec => j: Any
      }
      if (loops.nonEmpty && !nestedLoopAllowed.contains(name))
        Some(s"$name plans ${loops.size} nested-loop/cartesian join(s)")
      else None
    }
    assert(offenders.isEmpty,
      s"unbounded join algorithms outside the allow-list:\n${offenders.mkString("\n")}")
  }
}
