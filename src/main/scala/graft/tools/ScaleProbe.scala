package graft.tools

import graft._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale sanity probe: multiply the sf0.1 fact tables K-fold (shifted
  * surrogate keys, foreign keys intact, dims copied) into /tmp and time
  * the headline operators against both sizes. Near-linear growth
  * validates the shuffle/broadcast design; superlinear growth flags an
  * operator whose plan wouldn't survive 100 TB.
  *
  * Usage: ScaleProbe [K] — defaults to 8.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.session.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // regenerated events.parquet would otherwise infer TIMESTAMP_NTZ,
      // which unix_micros rejects — same setting as Verify/Bench
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"
    val dst = s"/tmp/graft-scale-x$k"

    def times(df: DataFrame, keyShifts: Map[String, Long]): DataFrame =
      (0 until k).map { i =>
        keyShifts.foldLeft(df) { case (d, (c, base)) =>
          d.withColumn(c, col(c) + lit(base * i))
        }
      }.reduce(_ unionByName _)

    if (!new java.io.File(s"$dst/_done").exists()) {
      val shift = 100000000L
      times(Tables.lineitem(spark, src), Map("l_orderkey" -> shift))
        .write.mode("overwrite").parquet(s"$dst/lineitem.parquet")
      times(Tables.orders(spark, src), Map("o_orderkey" -> shift))
        .write.mode("overwrite").parquet(s"$dst/orders.parquet")
      times(Tables.documents(spark, src), Map("doc_id" -> shift))
        .write.mode("overwrite").parquet(s"$dst/documents.parquet")
      times(Tables.embeddings(spark, src), Map("vec_id" -> shift))
        .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
      times(Tables.events(spark, src), Map("event_id" -> shift, "user_id" -> 10000L))
        .write.mode("overwrite").parquet(s"$dst/events.parquet")
      for (t <- Seq("supplier", "part", "customer", "nation", "region"))
        spark.read.parquet(s"$src/$t.parquet")
          .write.mode("overwrite").parquet(s"$dst/$t.parquet")
      new java.io.File(s"$dst/_done").createNewFile()
    }

    val probes = Seq("q1_agg", "llr_pairs", "significant_pairs",
      "d_minhash_neardup", "d_simhash", "e_cosine_topk", "e_ivf_topk",
      "st_session_counts", "j10_asof_join", "t_token_stats",
      "d_dedup_clusters_closed", "g_connected_components", "p_pack_greedy",
      "d_decontaminate", "t_tfidf_topk", "t_heavy_hitters", "t_rm_boilerplate",
      "t_quality_filter", "s_mixture_upsample", "a12_dataset_card",
      // round-3 surface
      "e_kmeans_assign", "e_semantic_pairs", "e_semantic_dedup",
      "e_quantize_int8", "e_quantized_topk", "st_stream_join",
      "st_doc_dedup", "t_strip_markup", "t_unigram_logprob",
      // round-4 surface
      "d_simhash_neardup", "d_incremental_neardup_appended",
      "a13_snapshot_diff", "m_decode_features", "m_decode_wav",
      "d_span_dedup_keepfirst",
      // NOTE: on the K-fold copied corpus EVERY window repeats, so this
      // probes the duplicate-saturated WORST CASE (full coverage
      // explode, all docs edited to empty) — deliberate stress, not the
      // near-linear-growth premise the other probes validate
      "d_span_dedup",
      // round-4b surface
      "t_nb_classifier", "t_bigram_logprob", "r_bm25_topk",
      "r_bm25_capped", "e_rand_proj", "r_rrf_hybrid", "e_pq_encode",
      "e_pq_topk", "t_bpe_train", "g_pagerank", "j11_range_join",
      "s5_warc_source", "e_ivfpq_topk", "t_bigram_kn", "t_url_parse",
      "a15_sessionize", "s7_zorder", "a14_card_merge", "t_nb_stateless",
      // round-4c surface
      "t_trigram_kn", "k_theta_overlap", "t_url_psl", "s_token_budget",
      "t_bpe_apply",
      // same duplicate-saturated caveat as d_span_dedup: on the K-fold
      // corpus every window repeats, so the island merge sees the
      // worst-case covered frame
      "d_span_maximal",
      // round-5 surface
      "m_decode_png", "m_phash_png", "t_langid_nb", "k_theta_jaccard",
      "t_char_entropy", "t_novelty", "e_pca_cov",
      // the composed pipeline: K-fold copies are collapsed by its own
      // exact-dedup stage, so growth past that stage tracks distinct
      // content, not K — the shape the daily loop relies on
      "pipe_full",
      // round-5b surface
      "d_leaked_spans", "t_fix_mojibake", "s_temperature_mix",
      "e_incremental_embdup", "d_incremental_exact_bloom",
      // daily loop: at K× BOTH the corpus (index build) and the
      // increment scale — the probe measures the whole day's cost
      "pipe_increment",
      "s_curriculum", "t_dedup_paragraphs",
      // round-5c surface
      "i_apply_changes", "i_scd2_history", "k_histogram",
      "k_hist_quantile", "x_cohort_retention", "x_funnel",
      // anchors scale with the corpus (vec_id % 10), so the brute-force
      // candidate set grows K² — the bounded composition is semiHardIvf
      // (measured by e_hard_neg_recall); this probes the exact baseline
      "e_hard_negatives",
      // K-fold copies repeat the same words, so the distinct-word
      // serving frame is FLAT at K× — the property the tokenizer
      // serving path relies on (same argument as t_bpe_apply)
      "t_wordpiece", "t_wordpiece_encode",
      "g_anchor_text", "g_hits",
      // same flat-distinct-word-frame property as t_wordpiece
      "t_unigram_lm",
      // queries scale with the corpus (doc_id % 20) like e_hard_negatives
      "r_phrase_search", "s_shard_assign", "k_hist_quantile_grouped",
      // round-5d surface
      "st_running_cards", "k_profile", "k_corr", "k_outliers",
      "a16_pivot", "x_resample",
      // O(len^2) per planted PAIR — pairs scale with the corpus, so
      // linear growth here means the per-pair kernel is flat
      "d_edit_verify",
      // round-5e surface
      // the templated corpus makes near-pairs grow superlinearly with K
      // (a data property — see the gate comment); the probe watches the
      // prefix filter keep the candidate join bounded by true pairs.
      // Measured at 8× K-fold copies: 177 s / 11.1M output rows —
      // output-proportional but quadratic in the copy factor, which is
      // exactly what the rep-collapsed twin below exists to fix
      "d_setsim_join",
      // rep-collapse folds the K copies before the join — FLAT at 8×
      "d_setsim_reps",
      "e_binary_topk", "e_binary_rerank", "g_lpa", "t_textrank",
      // cell census is (lang × source)-bounded — FLAT at K×
      "x_ipf_raking",
      // one scan, one agg — the probe pins the single-pass property
      "v_constraints", "s8_bloom_prune", "s9_corrupt_json",
      "g_ppr",
      // O(n·w) candidates by construction — the probe watches the
      // verify join track true pairs, never buckets
      "d_sorted_neighborhood",
      // pairs scale linearly with tokens (fanout 2·window·k fixed)
      "t_skipgram",
      // wedge fanout capped by oriented out-degree (≤ O(√m) any graph)
      "g_triangles",
      // session cap bounds per-session pair fanout by construction
      "x_covisitation",
      // expired-prefix window only — increment-proportional
      "i_vacuum",
      // shuffle-free projection — must stay flat per-row
      "t_readability", "s10_schema_merge",
      // two census-grain aggs — window census then type census
      "x_rate_anomaly",
      // peel rounds grow with chain length, not data size; per round
      // one census + two semi-joins
      "g_kcore",
      "g_assortativity", "k_winsorize", "v_orphans",
      // serving is a shuffle-free scan; census labels × dim
      "e_nearest_centroid", "e_silhouette",
      // grouped iteration: per-doc graphs rank in ONE job — growth
      // tracks total edges, never doc count × rounds
      "t_textrank_doc", "st_daily_rollup",
      // census-grain: fixed 64-bucket grid / one user-grain agg
      "k_psi", "x_ab_test",
      // per-payload byte walk — frame rows ∝ samples
      "m_wav_features",
      // inverted-index join like BM25; queries scale with the corpus
      "r_vsm_topk",
      // RANGE frame bounded by the hour, one user-partition window
      "x_moving_avg", "a18_grouping_sets",
      // sketch state per group through the SQL surface
      "f_sql_theta", "f_sql_bloom",
      // two commits + manifest swap — write-bound, linear in rows
      "s11_manifest_source",
      // interval-bounded join state; output ∝ matches
      "st_stream_join_outer",
      // types² census from one user-partition lag window
      "x_transitions",
      // same Pregel shape as g_pagerank, weights ride the edge shuffle
      "g_pagerank_weighted",
      // one broadcast-flag scan per table — the audit minimum
      "i_forget",
      // round-5f surface
      // QI census-grain aggs — cells bounded by lang × length domain
      "v_kanon", "v_ldiv", "v_dp_counts",
      // one key shuffle; per-user series length is K-invariant here
      // (copies shift user_id), so growth tracks row count
      "x_ewma",
      // k rounds × one shuffle-free scan each — linear in corpus
      "e_kcenter",
      // corpus-sized work is the one broadcast-query relevance scan;
      // pool² sims and greedy rounds are pool-bounded (flat at K×)
      "r_mmr",
      // x-grain census + sharded suffix max + broadcast verdict join
      "x_pareto",
      // blocking candidates O(n·w); scoring a shuffle-free projection
      "d_fellegi_sunter",
      // one scan → map-side combine to a B-row census
      "x_bootstrap",
      // group windows + broadcast ≤64-row census join
      "t_quantile_norm",
      // 5 persisted + 3 warm rounds + the cold-8 equivalence require —
      // the probe measures the whole daily refresh INCLUDING its proof
      "g_pagerank_warm",
      // stateful recurrence, one long of state per user
      "st_ewma",
      // hour-bucket census then census-grain split scan
      "x_changepoint",
      // one translate() projection + digest equi-join
      "t_homoglyph",
      // SQL-surface twin of the fused uniform kernel
      "f_sql_md5prefix",
      // census-grain pair slopes / lag joins; one lag window per user
      "x_theilsen", "x_autocorr", "x_journeys",
      // group-census concentration stats; day-census KM fold
      "k_gini", "k_entropy", "k_coverage", "x_kaplan_meier",
      // per-file listing parallelism; staging is idempotent (marker)
      "s12_binaryfile",
      // vocabulary census regression; windows×buckets state only
      "t_zipf", "st_drift",
      // md5 span walk folds per doc; one doc-grain shuffle
      "t_span_corrupt",
      // PCM byte walk per clip; banding joins fingerprints only
      "m_audio_fp",
      // the byte-cycle clips alias heavily (256-period phase shifts),
      // so pairs grow with true fingerprint collisions — same templated
      // worst-case caveat as d_setsim_join; output-proportional
      "m_audio_fp_neardup",
      // inherits r_vsm_topk's honest superlinearity (queries scale
      // with the corpus; df cap off in the replay gate by design)
      "r_ndcg",
      // one-scan B-grain census per group; inverted-index self-join
      // (cap ON at scale; the replay gate runs cap-off like
      // d_decontaminate)
      "x_bootstrap_by", "d_containment_self",
      // dim-grain censuses — d rows per side, never vectors
      "e_embedding_drift_summary",
      // NB scoring chain + score census; the curve math is census-grain
      // two-phase cumulative (no global window)
      "v_roc_auc",
      // one ln-key per row + TakeOrdered — the unbounded-weight A-ES path
      "s_weighted_sample_log",
      // one exact-verify pass over candidate pairs; the grid multiplies
      // only the surviving pair census
      "d_threshold_sweep",
      // two token censuses + a vocabulary-grain join
      "t_divergence",
      // O(maxMapSize) sketch state; shuffle carries sketch bytes
      "t_freq_hitters",
      // group-grain distinct + broadcast join back; doc side is a scan
      "s_group_splits",
      // rounds × (assignment scan + k·dim census); driver k·dim/round
      "e_kmeans_warm",
      // one id-grain join to a k² contingency census
      "e_cluster_compare",
      // census + vocabulary-grain join back onto the token stream
      "t_subsample",
      // per-offset equi-joins → vocabulary²-bounded census
      "t_cooc",
      // one partial-agg shuffle; O(k·log n) sketch state per group
      "a21_card_quantiles",
      // cluster-partition rank windows over micro distances
      "e_embedding_outliers",
      // source-grain token census + broadcast total-weight row
      "s_mixture_solve",
      // value census + two-phase cumulative; series on a 1-row frame
      "x_ks_test",
      // fingerprint-grain censuses, splits²-bounded output
      "v_split_leakage",
      // G×V dense grid cumulatives + per-group p series
      "x_drift_fleet",
      // ≤4 census passes, ≤2^16 driver rows per round, no sort
      "a20_exact_median",
      // shingle df census join, never doc×doc
      "t_distinctness",
      // FS pair scoring + large-star/small-star closure on match edges
      "d_fs_entities",
      // custom heap exec: shuffle carries ≤ k rows per (group ×
      // partition) after the partial pass — no sort anywhere
      "x_grouped_topk_hi",
      // MM rounds on the pair/item censuses; rounds fixed, censuses
      // grow with distinct pairs (suppliers fixed here -> near-flat)
      "x_bradley_terry",
      // gram censuses + one clipped-match equi-join per pair
      "x_bleu",
      // char-gram censuses (6 orders), same clipped-match join shape
      "x_chrf",
      // shuffle-free projection; per-row O(m·n) DP in one native call
      "x_rouge_l",
      // round-6 surface
      // rank()-ties heap rewrite: k+ties rows per (group × partition)
      "x_topk_rank",
      // trim/color/sweep rounds grow with color-chain depth, not data:
      // at K× the decade rings multiply but the diameter is constant,
      // so growth is per-round row volume only
      "g_scc",
      // real streaming drain (2 epochs) + manifest commits — cost is
      // the partition-parallel parquet writes; the serial section is
      // one local manifest rename per epoch
      "st_manifest",
      // value-census integer cores + census-grain tails — FLAT like
      // x_ks_test / category²-bounded like the raking censuses
      "x_mann_whitney", "x_chi2_assoc",
      // LPA rounds + label-grain censuses / docs×L scores + L-row
      // broadcast thresholds
      "g_modularity", "v_label_noise",
      // unit-grain shuffle + census sums / league-partitioned arrival
      // fold (games scale with subsampled orders)
      "x_cuped", "x_elo",
      // one bin-census shuffle + a <=17-row driver PAV fold
      "v_isotonic",
      // (window x user) census + k-bounded heap rank / hour-census lag
      // equi-joins
      "st_top_talkers", "x_forecast_eval",
      // one partial-agg shuffle to a single row (integer weights)
      "x_offpolicy",
      // QI-census shuffle + domain-bounded driver recursion
      "v_mondrian",
      // 12 frontier-join rounds; per-round shuffle = frontier out-edges
      "g_bfs",
      // slice-grain census + broadcast pooled row
      "v_fairness",
      // one exactKth narrowing (≤5 censuses) + a literal-filter scan
      "s_temporal_split",
      // codegen projection, output-proportional chunk table
      "d_cdc_chunks",
      // k bounded scans of the deduped element frame, 1 driver row/round
      "e_setcover",
      // (arm x hour) census shuffle + a census-grain cumulative window
      "x_evalue",
      // corpus x panel pairs, two-phase sharded ranks/suffix sums
      "e_knn_shapley",
      // (group x value) census + census-grain cumulative windows
      "x_wasserstein",
      // degree-capped wedge joins + pair-grain partial agg
      "g_adamic_adar",
      // exactKth narrowing censuses + one literal-filter coverage scan
      "v_conformal",
      // 9-row digit census / 4-cell decimal census
      "k_benford", "x_did",
      // presence distinct + per-basket self-join (vocab-bounded fanout)
      "x_assoc_rules",
      // exactKth narrowing + one literal-filter tail scan
      "x_hill",
      // (group x day) census + codegen'd banded min-plus DP projection
      "x_dtw",
      // two top-k frames (heap-rewritten windows) + depth-census join
      "r_rbo",
      // one full-outer key join, change-volume-bounded output
      "i_table_diff",
      // bucketed equi-join via the optimizer rewrite
      "j13_rangejoin_rewrite",
      // lag-grid broadcast x group census, pair-grain partial agg
      "x_xcorr",
      // feature explode + broadcast model join + heap top-k
      "v_nb_explain",
      // tau-ladder cross + one partial agg / Expand + hash agg
      "v_pinball", "q_rollup",
      // score-census Newton rounds, 5 longs to the driver per round
      "v_platt",
      // L frontier equi-joins, walk-volume-proportional output
      "g_walks",
      // the composed walks -> sentences -> co-oc census pipeline
      "g_deepwalk_pairs",
      // segment projection + stateless dense-array scoring + doc rollup
      "t_code_switch",
      // (period x item) census + two heap top-ks + a <=2k-row join
      "t_trending",
      // AA wedges on the train split + the score-census AUC
      "g_linkpred_auc",
      // (term x doc) census + term-grain agg / census-of-census lead
      "t_burstiness", "t_good_turing",
      // (group x day) census + shifted self-join + two rank windows
      "x_seasonal_anomaly",
      // round-7 surface
      // quotient-graph closure: contraction joins at batch grain, the
      // iterative closure runs on contracted edges only
      "g_cc_incremental",
      // one extra 1-row dangling-mass broadcast agg per round
      "g_pagerank_dangling",
      // byte symbolization is a per-distinct-word projection (the map
      // is a plan literal); rounds = the same vocabulary-grain censuses
      "t_bpe_bytes", "t_bpe_bytes_apply",
      // TakeOrdered seed draw + 3 census rounds (the warm shape + one
      // ladder scan)
      "e_kmeans_cluster",
      // moment census + driver Jacobi (d-bounded) + shuffle-free
      // projection scan to a k-row census
      "e_pca_project",
      // quotient SCC on condensation ∪ contracted batch — the ring
      // interiors never re-enter; trim collapses the DAG skeleton
      "g_scc_incremental",
      // 6 half-rounds x (one ratings equi-join + one entity-grain
      // partial-agg shuffle); factor tables entity-grain
      "r_als_factors",
      // depth censuses bounded by nodes x features x bins regardless
      // of rows; scoring is a shuffle-free codegen CASE scan
      "v_tree_train", "v_tree_leaf_rate",
      // rounds x one weighted census shuffle + narrow weight updates;
      // the integer argmin folds a 64-row census on the driver
      "x_boost_train",
      // whole-partition windows rewritten to census joins: no sort, no
      // partition buffering — scales by scan, not by max group size
      "w_window_rewrite",
      // transformWithState: one fixed-width state row per ACTIVE user,
      // one keyed shuffle; RocksDB-backed in streaming
      "st_sessions_tws",
      // nTrees x depth bounded censuses; vote/OOB one codegen scan
      "v_forest_vote",
      // one value-census shuffle per feature + driver edge scan
      // (distinct-value bounded) + codegen when-chain binning
      "v_tree_quantile",
      // MapState census: one keyed shuffle; per-user map bounded by
      // the user's type vocabulary, not history
      "st_type_census",
      // ListState last-K: <=K fixed-width state rows per active user,
      // one keyed shuffle; fold touches carried-K + batch rows only
      "st_recent_items",
      // full-outer interval join: watermark-bounded state both sides;
      // batch analog is the same time-range sort-merge join
      "st_stream_join_full",
      // rolling-hash gram keys: one codepoint pass per row per order,
      // no gram substrings; same single 8-byte-key census shuffle
      "x_chrf_fast",
      // k x (two bounded training censuses + one doc-grain score
      // shuffle over 1/k of the corpus) + one census AUC window
      "v_cv_nb_auc",
      // one (key, hour) partial agg + bounds census + span-proportional
      // grid explode + per-key ordered carry window
      "x_gapfill")
    // optional 2nd+ args: probe only the named queries (local iteration)
    val only = args.drop(1).toSet
    for (dir <- Seq(src, dst);
         q <- probes if only.isEmpty || only(q)) {
      // warm codegen/JIT on the small dir pass; report second-run time
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, dir).count()
      val t1 = System.nanoTime()
      val n2 = SparkEntry.queries(q)(spark, dir).count()
      val t2 = System.nanoTime()
      println(f"$dir $q: cold ${(t1 - t0) / 1e9}%.2f warm ${(t2 - t1) / 1e9}%.2f s ($n2 rows)")
      assert(n == n2)
    }
    spark.stop()
  }
}
