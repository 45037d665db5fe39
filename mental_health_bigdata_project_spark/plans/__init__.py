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


# --- driver-sample ordering (VERDICT r2 items 2 & 7) ---------------------
#
# The driver samples the FIRST ~50 registered queries per round
# (registration order steered both prior samples — commit 13970b0).
# Round-3 ordering, in priority:
#   1. the 7 SURVEY §2 ids no driver round has ever sampled (VERDICT r2
#      item 2) plus the 3 queries rewritten this round to emit scalar
#      cells (vec_normalize / vec_quantize_int8 were ERR rows in r02 —
#      the driver canonicalizer can't hash ArrayType; vec_minmax_scale
#      had the same latent trap),
#   2. every id with no driver row in CORRECTNESS_r01 ∪ r02 (149 of
#      246), oracle-backed before rows-only, north-star modules first,
#   3. ids already driver-checked, last.

# Cumulative driver coverage: keys of CORRECTNESS_r01.json ∪ _r02.json.
_DRIVER_CHECKED = {
    "agg_approx_distinct", "agg_approx_percentile", "agg_arg_extremes",
    "agg_avg_risk", "agg_cube", "agg_distinct_users", "agg_grouping_sets",
    "agg_high_risk_count", "agg_keyword_hits", "agg_rollup_region_nation",
    "agg_total_count", "arr_explode_outer", "arr_explode_pos",
    "arr_explode_tokens", "arr_set_ops", "arr_tokenize", "bpe_encode_apply",
    "bpe_train_merges", "cast_value_string", "decontam_embedding_cells",
    "decontam_fuzzy_overlap", "dedup_by_id", "dedup_cluster_components",
    "dedup_cluster_portable", "dedup_embedding_cells",
    "dedup_embedding_cosine", "dedup_exact_docs", "dedup_minhash_near",
    "dedup_minhash_portable", "dedup_ngram_jaccard", "dedup_simhash",
    "dedup_simhash_portable", "dedup_survivor_select", "doc_fingerprint",
    "filter_high_risk", "filter_nonempty_text", "filter_risk_bucket",
    "flatten_struct", "graph_pagerank_tokens", "groupby_collect_posts",
    "groupby_subreddit", "histogram_risk_buckets", "join_anti",
    "join_asof_events", "join_broadcast_dim", "join_full_outer",
    "join_inner_equi", "join_left_outer", "join_range_theta", "join_semi",
    "json_extract_path", "json_parse_struct", "json_serialize",
    "map_props_extract", "multimodal_features", "neardup_threshold_sweep",
    "null_default_fill", "pipeline_training_data", "project_processed",
    "q1_pricing_summary", "retain_last_n", "sample_stratified_api",
    "sample_temperature_mixture", "scalar_date_breadth", "scalar_date_ops",
    "scalar_math_ops", "scalar_string_breadth", "scalar_string_ops",
    "scalar_try_ops", "sim_ann_ivf", "sim_ann_lsh", "sim_ann_recall_eval",
    "sim_ann_recall_multiprobe", "sim_cosine_topk",
    "sim_sparse_tfidf_cosine", "sim_topk_batch", "sim_topk_batch_gemm",
    "sketch_hll_rollup", "sketch_topk_langs", "sketch_topk_rollup",
    "split_train_val_test", "text_bigram_freq", "text_lang_dist",
    "text_lang_id", "text_pii_scrub", "text_quality_score", "text_tfidf",
    "text_token_count", "text_token_freq", "topk_recent",
    "vec_centroid_by_label", "vec_covariance_matrix",
    "vec_distance_breadth", "vec_normalize", "vec_quantize_int8",
    "win_rank_orders_by_price", "win_running_sum",
}

_MODULE_PRIORITY = [
    "similarity", "textops", "multimodal", "quality", "advanced",
    "stream_windows", "mllib", "grouped", "spark4", "spark4_sources",
    "udtf_udaf", "tpch_more", "relational", "scalars", "core",
]

# Head of the round-3 sample window, in order.
_CONVERTED_FRONT = [
    # never sampled in r01/r02 — the last §2 ids without a driver row
    "win_lag_value", "set_union_all", "set_intersect", "set_except",
    "stream_window_tumbling", "stream_window_sliding",
    "stream_window_session",
    # ERR rows in r02 (ArrayType canonicalizer trap), now scalar-celled
    "vec_normalize", "vec_quantize_int8",
    # same trap fixed pre-emptively this round
    "vec_minmax_scale",
    # new this round: oracle-backed ANN twins (VERDICT r2 item 3) and
    # the PQ/ADC + DSIR additions
    "sim_ann_lsh_portable", "sim_ann_ivf_portable",
    "vec_pq_encode", "sim_pq_adc_topk", "dsir_importance_weights",
    # round-3 additions: IVFADC composition, SemDeDup, ExactSubstr spans
    "sim_ivfpq_topk", "dedup_semdedup", "dedup_substring_spans",
    "dedup_substring_rewrite", "merge_upsert_cdc", "dedup_soft_weights",
    "sim_ivfpq_recall", "privacy_k_anonymity", "dq_schema_drift",
    "quality_ensemble_score", "sim_ivfpq_batch", "vec_pq_residual_mse", "split_leakage_audit",
    "lsh_scurve_table", "text_vocab_coverage", "ts_seasonal_decompose",
    "mine_hard_negatives", "ts_forecast_snaive", "text_char_entropy", "source_overlap_matrix",
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
