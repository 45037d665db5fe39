"""Query registry: importing this package registers every query id.

``QUERIES`` maps operator ids from SURVEY.md §2 to Spark builders
``(spark, sf_dir) -> DataFrame``; ``ORACLES`` maps the oracle-checkable
subset to DuckDB-runnable ANSI SQL twins.  ``__spark_entry__.py`` simply
re-exports these.
"""

from .registry import ORACLES, QUERIES, query  # noqa: F401

# Side-effect imports: each module registers its queries.
from . import core  # noqa: F401,E402
from . import scalars  # noqa: F401,E402
from . import relational  # noqa: F401,E402
from . import textops  # noqa: F401,E402
from . import similarity  # noqa: F401,E402
from . import stream_windows  # noqa: F401,E402
from . import multimodal  # noqa: F401,E402
from . import mllib  # noqa: F401,E402
from . import grouped  # noqa: F401,E402
from . import tpch_more  # noqa: F401,E402
from . import spark4  # noqa: F401,E402
from . import spark4_sources  # noqa: F401,E402
from . import udtf_udaf  # noqa: F401,E402
from . import quality  # noqa: F401,E402
from . import advanced  # noqa: F401,E402
from . import retrieval  # noqa: F401,E402
from . import sketches  # noqa: F401,E402


# --- driver-sample ordering (VERDICT r2 item 2, r3 item 3) ----------------
#
# The driver samples the FIRST ~50 registered queries per round
# (registration order steered all three prior samples).  Round-4
# ordering, in priority:
#   1. the 11 queries whose oracle SQL was re-typed this round (the two
#      r3 hash-fail rows plus nine never-sampled queries with the same
#      uncast-int128 defect, found by the new DESCRIBE lint) — each
#      needs a fresh green driver row against the fixed SQL,
#   2. every id with no driver row in CORRECTNESS_r01 ∪ r02 ∪ r03
#      (127 of 272), oracle-backed before rows-only, north-star
#      modules first,
#   3. ids already driver-checked, last.

# Cumulative driver coverage: keys of CORRECTNESS_r01 ∪ r02 ∪ r03.
_DRIVER_CHECKED = {
    "agg_approx_distinct", "agg_approx_percentile", "agg_arg_extremes",
    "agg_avg_risk", "agg_cube", "agg_distinct_users", "agg_grouping_sets",
    "agg_high_risk_count", "agg_keyword_hits", "agg_rollup_region_nation",
    "agg_total_count", "arr_explode_outer", "arr_explode_pos",
    "arr_explode_tokens", "arr_set_ops", "arr_tokenize", "bpe_encode_apply",
    "bpe_train_merges", "cast_value_string", "corpus_curation_report",
    "decontam_benchmark", "decontam_embedding_cells",
    "decontam_fuzzy_overlap", "dedup_by_id", "dedup_chunk_exact",
    "dedup_chunk_rewrite", "dedup_cluster_components",
    "dedup_cluster_portable", "dedup_embedding_cells",
    "dedup_embedding_cosine", "dedup_exact_docs",
    "dedup_levenshtein_blocked", "dedup_minhash_near",
    "dedup_minhash_portable", "dedup_ngram_jaccard", "dedup_semdedup",
    "dedup_simhash", "dedup_simhash_portable", "dedup_soft_weights",
    "dedup_substring_rewrite", "dedup_substring_spans",
    "dedup_survivor_select", "doc_fingerprint",
    "doc_winnowing_fingerprints", "dq_schema_drift",
    "dsir_importance_weights", "filter_high_risk", "filter_nonempty_text",
    "filter_risk_bucket", "flatten_struct", "graph_pagerank_tokens",
    "groupby_collect_posts", "groupby_subreddit", "histogram_risk_buckets",
    "join_anti", "join_asof_events", "join_broadcast_dim",
    "join_full_outer", "join_inner_equi", "join_left_outer",
    "join_range_theta", "join_semi", "json_extract_path",
    "json_parse_struct", "json_serialize", "lsh_scurve_table",
    "map_props_extract", "merge_upsert_cdc", "mine_hard_negatives",
    "multimodal_features", "neardup_threshold_sweep", "null_default_fill",
    "pack_sequences", "pipeline_training_data", "privacy_k_anonymity",
    "project_processed", "q1_pricing_summary", "quality_ensemble_score",
    "retain_last_n", "sample_mixture_weights", "sample_stratified_api",
    "sample_temperature_mixture", "scalar_date_breadth", "scalar_date_ops",
    "scalar_math_ops", "scalar_string_breadth", "scalar_string_ops",
    "scalar_try_ops", "set_except", "set_intersect", "set_union_all",
    "sim_ann_ivf", "sim_ann_ivf_portable", "sim_ann_lsh",
    "sim_ann_lsh_portable", "sim_ann_recall_eval",
    "sim_ann_recall_multiprobe", "sim_cosine_topk", "sim_ivfpq_batch",
    "sim_ivfpq_recall", "sim_ivfpq_topk", "sim_pq_adc_topk",
    "sim_sparse_tfidf_cosine", "sim_topk_batch", "sim_topk_batch_gemm",
    "sketch_hll_rollup", "sketch_topk_langs", "sketch_topk_rollup",
    "source_overlap_matrix", "split_leakage_audit", "split_train_val_test",
    "stream_window_session", "stream_window_sliding",
    "stream_window_tumbling", "text_bigram_freq", "text_bigram_lm_score",
    "text_char_entropy", "text_char_ngram_lang_id", "text_lang_confusion",
    "text_lang_dist", "text_lang_id", "text_pii_scrub", "text_pmi_bigrams",
    "text_quality_score", "text_repetition_stats", "text_surprisal_score",
    "text_tfidf", "text_token_count", "text_token_freq",
    "text_vocab_coverage", "text_zipf_fit", "topk_recent",
    "ts_forecast_snaive", "ts_seasonal_decompose", "vec_centroid_by_label",
    "vec_covariance_matrix", "vec_distance_breadth", "vec_minmax_scale",
    "vec_normalize", "vec_pq_encode", "vec_pq_residual_mse",
    "vec_quantize_int8", "win_lag_value", "win_rank_orders_by_price",
    "win_running_sum",
}

_MODULE_PRIORITY = [
    "similarity", "textops", "multimodal", "quality", "advanced",
    "stream_windows", "mllib", "grouped", "spark4", "spark4_sources",
    "udtf_udaf", "tpch_more", "relational", "scalars", "core",
]

# Head of the round-4 sample window, in order: every query whose oracle
# SQL changed this round (CAST ... AS BIGINT on int128 outputs).
_CONVERTED_FRONT = [
    # r3 hash-fail rows — locally bitwise-correct, oracle re-typed
    "text_repetition_stats", "dedup_chunk_exact",
    # never-sampled queries fixed by the same sweep (plain SUM)
    "anomaly_mad_outliers", "state_duration_total", "dq_key_skew",
    # windowed SUM() OVER sites the DESCRIBE lint surfaced
    "win_cumulative_distinct", "concurrency_peak",
    "concurrency_peak_bucketed", "sessionize_lag_gaps",
    "sample_weighted_systematic",
    # leaked_grams INT -> BIGINT widening (both engines)
    "split_leakage_audit",
    # new in round 4: CCNet perplexity head/middle/tail partitioning
    # and the cross-modality dedup agreement table
    "quality_ppl_buckets", "dedup_modality_agreement",
    "bpe_fertility_by_lang", "emb_cell_balance", "doc_length_survival",
    "ngram_novelty_decay",
    # new in round 4: the sparse/hybrid retrieval surface
    "sim_bm25_topk", "rank_fusion_rrf", "sim_mmr_rerank",
    "retrieval_eval_ndcg",
    # new in round 4 (late): Z-order layout clustering + skipping eval
    "layout_zorder_skipping",
    # new in round 4 (late): oracle-checked Lloyd k-means training and
    # the learned-quantizer IVF probe built on it
    "ml_kmeans_lloyd_portable", "sim_ann_ivf_kmeans",
    # new in round 4 (late): portable sketches / weighted sampling /
    # closed-form statistics (plans/sketches.py)
    "sketch_hll_portable", "sketch_hll_merge", "sketch_hdr_quantiles",
    "sketch_bloom_decontam", "sample_weighted_reservoir",
    "ml_linreg_closed_form", "lm_kneser_ney_bigram",
    "vec_jl_distortion", "sim_jl_topk_recall", "sketch_hdr_merge",
    "sketch_hll_setops", "assoc_rules_pairs", "dq_profile_columns",
    # new in round 4 (late): prefix-filtered exact set-similarity join,
    # sorted-neighborhood ER, TWAP, incremental aggregate refresh
    "dedup_setsim_prefix", "er_sorted_neighborhood", "ts_twap",
    "ivm_agg_refresh", "neardup_lsh_eval", "split_group_holdout",
    "anomaly_cusum_shift",
]


def _reorder_registries() -> None:
    def rank(item):
        idx, (qid, fn) = item
        mod = fn.__module__.rsplit(".", 1)[-1]
        mod_rank = (_MODULE_PRIORITY.index(mod)
                    if mod in _MODULE_PRIORITY else len(_MODULE_PRIORITY))
        front = (_CONVERTED_FRONT.index(qid)
                 if qid in _CONVERTED_FRONT else len(_CONVERTED_FRONT))
        return (front,
                qid in _DRIVER_CHECKED,      # already-checked ids last
                mod_rank,
                qid not in ORACLES,          # oracle-backed before rows-only
                idx)                         # stable within a module

    ordered = sorted(enumerate(list(QUERIES.items())), key=rank)
    snapshot_oracles = dict(ORACLES)
    QUERIES.clear()
    ORACLES.clear()
    for _, (qid, fn) in ordered:
        QUERIES[qid] = fn
        if qid in snapshot_oracles:
            ORACLES[qid] = snapshot_oracles[qid]


_reorder_registries()
