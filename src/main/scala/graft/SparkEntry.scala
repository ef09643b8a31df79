package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator family lives in its own module under graft.ops; each
  * module exposes `queries` (name -> (SparkSession, sfDir) -> DataFrame) and
  * `oracles` (name -> DuckDB-runnable ANSI SQL over the same parquet
  * tables). SparkEntry is the union surface the driver exercises.
  */
object SparkEntry {
  import graft.ops._

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Daily value trend (SURVEY §7.2 — stats_visualization.py:294 shape).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("a4_daily_value_trend")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Aggregates.queries ++ TextOps.queries ++
      DedupOps.queries ++ SimilarityOps.queries ++ MLOps.queries ++
      MultimodalOps.queries ++ GraphOps.queries ++
      graft.streaming.StreamingOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Aggregates.oracles ++ TextOps.oracles ++
      DedupOps.oracles ++ SimilarityOps.oracles ++ MLOps.oracles ++
      MultimodalOps.oracles ++ GraphOps.oracles ++
      graft.streaming.StreamingOps.oracles

  /** Headline subset used by graft.Bench — the scale-representative
    * queries (big shuffles, joins, windows, text/similarity paths), not
    * every correctness micro-query.
    */
  def benchQueries: Seq[String] = Seq(
    "j_star_revenue_by_region",
    "j_left_order_line_counts",
    "w1_top_suppliers_per_nation",
    "a4_daily_value_trend",
    "a5_daily_share_pct",
    "a6_daily_pivot",
    "a_distinct_users_per_type",
    "d1_dedup_first_per_user",
    "s1_latest_events",
    "a10_word_freq",
    "u7_tfidf_top_terms",
    "u3_vader_sentiment",
    "text_quality",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "asof_join_purchase_click",
    "a_percentiles",
    "a_cohort_retention",
    "a_rollup_daily_type",
    "s9b_partitioned_pruning",
    "stream_tumbling_daily",
    "stream_session_windows",
    "mm_feature_histogram",
    "mm_frame_sample",
  ).filter(queries.contains)

  /** Second bench group (round 7): the round-2+ families — graph, PQ/IVF
    * ANN, trainers, sketches, and the round-7 ops — that the frozen group
    * above predates. Timed and reported SEPARATELY (`total2`/`queries2`
    * in the Bench JSON) so group 1 stays comparable across every round
    * while regressions in the newer families become visible. Excludes
    * the MLlib LDA family (pipeline_topic_fanout's single-partition fits
    * are a documented ~28 s constant that would drown the signal).
    */
  def benchQueries2: Seq[String] = Seq(
    "graph_pagerank",
    "graph_harmonic",
    "graph_hyperball",
    "graph_triangles",
    "graph_degree_stats",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "ann_ivf_kmeans_topk",
    "ann_sq8_topk",
    "ann_lsh_multi_topk",
    "ml_kmeans",
    "text_bpe_merges",
    "text_bpe_encode",
    // encode, not train: the trainer caches survive clearState (by
    // design — see Bench), so timing the train query would measure a
    // 300-row rank over the cached model; the encode pass is the real
    // repeated work (a full Viterbi inference pass per timed run)
    "text_unigram_encode",
    "text_lm_backoff",
    "a_hll_probe",
    "a_countmin_probe",
    "a_heavy_hitters",
    "a_sketch_merge",
    "a_quantile_sketch",
    "dedup_substring_exact",
    "dedup_cluster_reps_star",
    "lda_em_topics",
    "sample_weighted_ares",
    // round-10 retrieval additions — first anchors recorded this round
    "ann_filtered_topk",
    "retrieval_rrf_fusion",
    "retrieval_mmr_rerank",
    "retrieval_prf_expansion",
    // round-10 relational/pipeline additions — first anchors this round
    "a_cube_type_day",
    "w_sessionize_gap",
    "scd2_status_history",
    "dedup_source_overlap",
    "text_oov_rate",
    // round-10 closed-form trainer/inference additions
    "emb_pca_power",
    "ml_ridge_probe",
    "a_ttest_welch",
    // round-10 late additions — first anchors this round
    "a_robust_stats",
    "w_trend_theilsen",
    "join_incremental_merge",
    // round-11 streaming batch twins — first anchors this round
    "stream_dedup_within_watermark",
    "stream_session_bounds",
    // round-11 new operators — first anchors this round
    "a_ks_test",
    "retrieval_maxscore_topk",
    "text_heaps_law",
    "ml_calibration_bins",
    "graph_kcore",
    "dedup_lsh_pr_eval",
    "ml_logreg_gd",
    "a_benford_digits",
    "graph_assortativity",
    "text_boilerplate_strip",
    "text_zipf_slope",
  ).filter(queries.contains)
}
