package graft

/** Plan contracts: silent plan regressions (a broadcast that becomes a
  * shuffle, a filter that stops pushing down, a join that degrades to a
  * nested loop) are invisible to correctness tests and fatal at 100 TB.
  * This spec pins the plan shapes for every registered query. */
class PlanContractSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  // Constructing all 392 registered queries executes their driver-loop
  // sub-jobs, and the operators with DOCUMENTED contract-small single-
  // partition windows (global sequence numbers, percentile-CI ranks, …)
  // each log WindowExec's "moving all data to a single partition" WARN —
  // ~170 lines of noise per run that buries real warnings. The machine-
  // checked plan contracts in this suite are the actual regression guard,
  // so the logger is quieted HERE ONLY and restored after, keeping an
  // unexpected single-partition window visible in every other suite's log.
  private val windowExecLogger = "org.apache.spark.sql.execution.window.WindowExec"
  private var savedLevel: org.apache.logging.log4j.Level = _
  override def beforeAll(): Unit = {
    super.beforeAll()
    // force session creation FIRST: Spark (re)initializes log4j when the
    // first SparkContext comes up, which would wipe a level set before it
    spark.sparkContext
    savedLevel = org.apache.logging.log4j.LogManager.getLogger(windowExecLogger).getLevel
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      windowExecLogger, org.apache.logging.log4j.Level.ERROR)
  }
  override def afterAll(): Unit = {
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      windowExecLogger, savedLevel)
    super.afterAll()
  }

  private val d = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, d).queryExecution.executedPlan.toString

  test("NO registered query plans a cartesian product or nested-loop join") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val p = plan(name)
      if (p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin")) {
        // legitimate tiny cross joins only: 1×1 stat rows, the calendar
        // spine (months × keys — inherently a small cartesian, never
        // fact-sized), the 1-row broadcast N-joins in tfidf/pmi (the
        // corpus-count aggregate folded into the job instead of a separate
        // count() action — O(n·1) by construction), the 1-row broadcast
        // quantile-edge array in the equi-depth histogram, and the 1-row
        // broadcast corpus stats / basket total / vocab size / revenue
        // total in bm25 / assoc rules / bigram LM / ratio-to-report, and
        // the 1-row broadcast reference time in the decay score, and the
        // 1-row broadcast global-mean fallback in the imputation
        // (plus: the 1-row broadcast totals in PSI/KS, and the
        // groups-sized broadcast token-totals in the JS divergence)
        val allowed = Set("q62_skew_profile", "q68_funnel", "q74_profile",
          "q67_series_filled", "q49_tfidf", "q82_cooccur_pmi", "q88_unigram_ll",
          "q92_chi_square", "q94_equidepth",
          "q97_bm25", "q105_assoc_rules", "q106_pct_of_total", "q109_bigram_ll",
          "q116_decayed_score", "q128_impute",
          "q142_psi", "q143_ks", "q148_js_divergence",
          // 1-row broadcast (nn, np) totals in the lift/gains table
          "q154_lift",
          // 1-row broadcast control arm in the A/B readout; the |X|×|Y|
          // contingency grid + 1-row broadcast totals in mutual info
          "q155_ab_test", "q156_mutual_info",
          // 1-row broadcast pooled moments in the CUPED readout
          "q225_cuped",
          // 1-row broadcast μ/den stats in the ACF; the 9-row digit spine ×
          // 1-row totals in the Benford audit
          "q159_acf", "q160_benford",
          // 1-row broadcast per-series stats in the CCF; the arms-sized
          // allocation spine × 1-row totals in the SRM check
          "q168_ccf", "q169_srm",
          // kappa: three 1-row stat frames (n, agree, Σna·nb) cross-joined;
          // DSIR: the 1-row (Ns, Nt, V) totals broadcast over occurrences
          "q172_kappa", "q173_dsir_weights",
          // woe/iv rides psiDetail's 1-row broadcast totals (q142's shape);
          // silhouette broadcasts the k-row centroid table over the corpus;
          // drift report is psi per column (same 1-row totals, per block)
          "q187_woe_iv", "q188_silhouette", "q201_drift_report",
          // allocation: 1-row total + 1-row leftover over the sources
          // table; missing partitions: the day spine × distinct sources;
          // jackknife/threshold-sweep/brier: 1-row totals broadcast over
          // group/score/bin tables — all contract-small by construction
          "q202_allocation", "q205_missing_partitions", "q207_jackknife",
          "q212_threshold_sweep", "q213_brier",
          // kanon repair: the 1-row first-passing-level frame broadcast
          // over the 4-row level table; distinctive terms: the 1-row
          // corpus-total broadcast over the (source, token) counts
          "q218_kanon_repair", "q219_distinctive_terms",
          // bootstrap: 1-row point estimate × 1-row CI bounds; stl: the
          // 1-row seasonal-center broadcast over the 7-row dow means;
          // eigencentrality: a 1-row max broadcast per power-iteration
          // round (the deterministic normalizer — no order-dependent L2)
          "q228_bootstrap_ci", "q232_stl", "q231_eigencentrality",
          // tail index: the 1-row pivot (min of top-k-plus-1) broadcast
          // over the k-row top set; sax/changepoint: the 1-row series
          // moments broadcast over the day-sized series
          "q235_tail_index", "q239_sax", "q244_changepoint",
          // target encoding: the 1-row global-mean fallback broadcast
          // over the fact rows (q128_impute's shape)
          "q250_target_encode",
          // isotonic: the B²/B³ interval lattice over ≤16 bin rows —
          // contract-small inequality joins by construction
          "q252_isotonic",
          // conformal: 1-row fallback mean + 1-row q̂ radius broadcasts
          "q253_conformal",
          // bh_fdr: the 1-row (N, m) totals broadcast over the m-key
          // counts; kde: the constant gridN-row grid broadcast over the
          // fact side (map-side fan-out by design); simpson: the
          // groups-sized totals self-cross (dim² by construction)
          "q256_bh_fdr", "q258_kde", "q261_simpson",
          // hub assignment: the constant 8-row hub table broadcast over
          // the points; modularity: the 1-row m and the communities-sized
          // q_total broadcasts; knee: the 1-row min/max extents broadcast
          // over the aggregate-sized curve
          "q262_hub_assign", "q266_modularity", "q271_knee",
          // join-size audit: three 1-row stat frames cross-joined
          "q272_join_estimate",
          // cat_assoc: margins cross to the densified |A|×|B| grid +
          // 1-row totals/entropy frames; hellinger/durbin_watson: 1-row
          // totals/moments broadcast over bin/day tables; mmd: the capped
          // sample blocks cross by definition (quadratic estimator);
          // tukey: the k-group pair lattice + 1-row MSW; eb_shrinkage:
          // the 1-row prior broadcast over items
          "q277_cat_assoc", "q279_hellinger", "q280_mmd",
          "q281_durbin_watson", "q282_tukey", "q284_eb_shrinkage",
          // markov entropy: the 1-row grand total over the |types|² cells;
          // kfold: the 1-row cross-fold summary over the k fold rows
          "q286_markov_entropy", "q287_kfold_cv",
          // kruskal: 1-row tie/total frames over the k-group table;
          // ljung_box: the 1-row series length over the lag margin;
          // wasserstein/cvm/cliffs: 1-row cohort totals over the
          // distinct-value margin; runs_test: the 1-row (n, Σx) moments
          // over the day series; t_closeness: the sensitive-margin ×
          // class grid (categorical-sized) + 1-row total; theil: 1-row
          // corpus totals + 1-row between over the k-group table
          "q289_kruskal", "q292_ljung_box", "q294_wasserstein",
          "q301_t_closeness", "q304_cvm", "q305_cliffs_delta",
          "q306_runs_test", "q307_theil",
          // nelson_aalen: q157's 1-row cohort-size broadcast; anova2: the
          // two 1-row margin-quadratic frames; digit_uniformity: the
          // 1-row χ² over the 100-row ending margin
          "q311_nelson_aalen", "q312_anova2", "q313_digit_uniformity",
          // friedman: the 1-row k frame over blocks + 1-row χ² over the
          // k-treatment table; mantel_haenszel: the 1-row pooled OR over
          // the strata table; dunn: the k² pair lattice + 1-row tie frame
          "q315_friedman", "q316_mantel_haenszel", "q317_dunn",
          // cochran_q/seasonal_mk: 1-row global stats over the
          // treatment/season tables; jonckheere: the value-margin ×
          // k-group densifying grid + two 1-row frames; morans_i: the
          // 1-row global moments over the cell table
          "q318_cochran_q", "q321_seasonal_mk", "q322_jonckheere",
          "q323_morans_i",
          // erasure_execute: per-table 1-row (rows_before) × 1-row
          // (post-state count + key checksum) combine frames
          "q325_erasure_execute",
          // pagerank_directed: per-iteration 1-row dangling-mass and
          // 1-row node-count frames broadcast over the node table
          "q326_pagerank_directed",
          // sign_flip: the 1-row observed-statistic frame over the
          // 64-row permutation table
          "q328_sign_flip",
          // clustering_agreement: two 1-row margin-total frames crossed
          // onto the 1-row contingency total
          "q332_clustering_agreement",
          // logrank: the 1-row observed/expected totals frame broadcast
          // over the event-time table (same 1-row-broadcast house shape)
          "q335_logrank",
          // seq_patterns: the 1-row user-count frame over the pattern
          // table; loo_influence: the 1-row corpus-total frame over the
          // source table; periodogram: the 1-row span-bounds frame over
          // the day table (all the 1-row-broadcast house shape)
          "q338_seq_patterns", "q339_loo_influence", "q342_periodogram",
          // domain_logodds: the 1-row LM-totals frame over the token table
          "q344_domain_logodds",
          // mahalanobis: the 1-row moments frame over the unit table
          "q347_mahalanobis",
          // percentile_ci: the 1-row count frame over the ranked values
          "q354_percentile_ci",
          // hl_shift: the pairwise-difference lattice is the ESTIMATOR
          // (two bounded pre-aggregated daily series per the operator's
          // scale contract — broadcast cross, never row-sized), plus the
          // 1-row count frame of the percentile_ci shape
          "q361_hl_shift",
          // rbo: the mr ≤ d range join against the DEPTH-row (≤40)
          // broadcast literal weight table — fan-out bounded by the
          // declared depth, inputs already truncated to top-D
          "q363_rbo",
          // kneser_ney: the 1-row distinct-bigram-total frame broadcast
          // over the type table (house 1-row-broadcast shape)
          "q365_kneser_ney",
          // holm: q256's shared p-value producer crosses the 1-row
          // (n_total, m) totals frame over the 25-nation count table
          "q364_holm",
          // yuen: the 1-row treated side crossed onto the 1-row control
          // side; qte: the 1-row quantile-array aggregate crossed onto
          // the 9-row literal decile table — both bounded by contract
          "q372_yuen", "q373_qte",
          // rmst: inherits kaplanMeier's 1-row total frame; rich_club:
          // the 4-row literal threshold frame fanned over edges/nodes;
          // group_sequential: the 1-row (min,max) span frame
          "q374_rmst", "q376_rich_club", "q378_group_sequential",
          // token_burstiness: the 1-row corpus-size frame over the
          // token table; qini: the 1-row count frame (rank → decile)
          "q381_token_burstiness", "q383_qini",
          // by_fdr: q256's 1-row totals frame; abc: the 1-row grand-
          // total frame; seasonal_strength: q232's 1-row seasonal-center
          // frame inside the decomposition it consumes
          "q384_by_fdr", "q387_abc", "q388_seasonal_strength",
          // bland_altman: the 1-row limits frame crossed back over the
          // pair diffs; ratio_metric: the 1-row arm frames crossed
          "q389_bland_altman", "q392_ratio_metric")
        if (allowed(name)) None else Some(name)
      } else None
    }
    assert(offenders.isEmpty, s"nested-loop/cartesian in: $offenders")
  }

  test("point lookups and key filters push down to the parquet scan") {
    assert(plan("q01_jobs_by_user").contains("PushedFilters: [IsNotNull(o_custkey), EqualTo(o_custkey"))
    assert(plan("q02_job_by_id").contains("EqualTo(o_orderkey"))
  }

  test("dimension joins broadcast; EXISTING_EMAIL is a broadcast anti-join") {
    assert(plan("q06_issues_join_jobs").contains("BroadcastHashJoin"))
    val p12 = plan("q12_existing_email")
    assert(p12.contains("BroadcastHashJoin") && p12.contains("LeftAnti"), p12)
  }

  test("top-N per group and group sampling keep WindowGroupLimit before the exchange") {
    assert(plan("q18_topn_per_group").contains("WindowGroupLimit"))
    assert(plan("q56_group_sample").contains("WindowGroupLimit"))
    assert(plan("q150_topn_ties").contains("WindowGroupLimit")) // rank(), not just row_number
  }

  test("round-9 reshapes: q195/q237 prune the documents scan to doc_id only") {
    // both queries synthesize their payloads as pure functions of doc_id —
    // if column pruning regressed, the wide `text` column would ride the
    // scan for nothing (a full-corpus read at 100 TB). Allowlist note: the
    // q195 registration intentionally runs the UNCAPPED exact-recall
    // regime via imageNearDupPairsExact (corpus-derived bucket cap + loud
    // regime guard — see SparkEntry's q195 comment); the 1000-doc default
    // cap stays the documented scale path.
    val p195 = plan("q195_image_neardups")
    assert(p195.contains("ReadSchema: struct<doc_id:bigint>"), p195)
    val p237 = plan("q237_compression")
    assert(p237.contains("ReadSchema: struct<doc_id:bigint>"), p237)
  }

  test("vocabulary top-k plans TakeOrderedAndProject, not a global sort") {
    assert(plan("q48_vocab_topk").contains("TakeOrderedAndProject"))
  }

  test("rollup/cube run ONE Expand + hash aggregate, not multiple scans") {
    val p = plan("q52_rollup")
    assert("Expand".r.findAllIn(p).size == 1, p)
    assert(plan("q70_cube").contains("Expand"))
  }
}
