"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship extraction pipeline on sf0.001;
``queries()`` exposes one callable per implemented operator family
(SURVEY.md §2 + the training-data additions); ``oracle_sql()`` gives
the DuckDB-equivalent SQL for every SQL-expressible query. Ray is
initialised by the driver BEFORE importing this module — nothing here
(or in the library) calls ray.init/ray.shutdown.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

# Make the engine importable no matter where the driver process started,
# and ship its code BY VALUE to Ray workers: the driver may have called
# ray.init() before this module was importable, in which case workers
# snapshotted a sys.path that cannot resolve `video_features_ray` and
# every map_batches fn would fail to deserialize. Registering the package
# for cloudpickle by-value serialization sidesteps worker-side imports
# entirely (worker only needs numpy/pandas/pyarrow, which are global).
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)


def _register_by_value() -> None:
    import importlib
    import pkgutil

    from ray import cloudpickle  # Ray serializes with its vendored fork

    import video_features_ray

    for m in pkgutil.walk_packages(video_features_ray.__path__,
                                   prefix="video_features_ray."):
        try:
            importlib.import_module(m.name)
        except Exception:
            continue
    for name, mod in list(sys.modules.items()):
        if name == "video_features_ray" or name.startswith("video_features_ray."):
            try:
                cloudpickle.register_pickle_by_value(mod)
            except Exception:
                pass


_register_by_value()

#: shared DuckDB CTE: documents → tokenized sequences, exactly mirroring
#: video_features_ray.sources.sequences.tokenize_documents
_SEQ = (
    "WITH seq AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id, "
    "list_transform(string_split(text, ''), c -> unicode(c)) AS tokens, "
    "length(text) AS n FROM documents)"
)

# PII patterns are single-sourced from the engine so the oracle SQL can
# never drift from what the pyarrow kernels match (both are RE2).
from video_features_ray.stages.pii import PII_PATTERNS as _PII_PATTERNS  # noqa: E402

_PII_E = _PII_PATTERNS["email"]
_PII_I = _PII_PATTERNS["ipv4"]
_PII_P = _PII_PATTERNS["phone"]
#: documents → deterministic synthetic-PII augmentation, mirroring
#: video_features_ray.stages.pii.augment_with_pii string-for-string
_PII_AUG = (
    "SELECT doc_id, source, coalesce(text, '') "
    "|| CASE WHEN doc_id % 3 = 0 THEN ' reach user' "
    "|| CAST(doc_id AS VARCHAR) || '@mail.example.com' ELSE '' END "
    "|| CASE WHEN doc_id % 4 = 0 THEN ' from 192.168.' "
    "|| CAST(doc_id % 256 AS VARCHAR) || '.' "
    "|| CAST((doc_id * 3) % 256 AS VARCHAR) ELSE '' END "
    "|| CASE WHEN doc_id % 5 = 0 THEN ' call 415-555-' "
    "|| lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END "
    "AS text FROM documents"
)

_W1_WINDOWS = (
    "SELECT s.doc_id, CAST(s.wid AS BIGINT) AS window_id, "
    "(s.wid * 16 + 31) / 25.0 * 1000.0 AS ts_ms, "
    "CAST(list_sum(s.tokens[s.wid * 16 + 1 : s.wid * 16 + 32]) AS BIGINT) AS window_sum "
    "FROM (SELECT seq.*, unnest(generate_series(0, (seq.n - 32) // 16)) AS wid "
    "FROM seq WHERE seq.n >= 32) s"
)


_COSINE_TOPK_SQL = (
    "WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0), "
    "sims AS (SELECT e.vec_id, list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe) AS sim "
    "FROM embeddings e, q) "
    "SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(rank AS BIGINT) AS rank "
    "FROM (SELECT vec_id, row_number() OVER (ORDER BY sim DESC, vec_id) AS rank FROM sims) "
    "WHERE rank <= 10"
)


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from video_features_ray.pipelines.queries import q_flagship_features

    return q_flagship_features("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    # ORDERING CONTRACT: the external gate checks the FIRST 50 entries,
    # so each round the entries that have never had a driver-side green
    # row rotate to the front.  Round 5 fronts 50 of the 97 entries that
    # were never driver-checked in rounds 1-4 (the round-4b graph /
    # corpus-profiling batch, the PII family, the TPC-H join shapes and
    # the event/feature analytics tail); the 40 still-unchecked oracled
    # entries sit immediately after the window for the next rotation.
    # The in-repo parity suite always runs ALL of oracle_sql().
    from video_features_ray.pipelines import queries as q

    return {
        # --- round-5 front: never driver-checked in rounds 1-4 ---
        # newly oracled this round (historical err:no_oracle rows)
        "link_pagerank": q.q_link_pagerank,
        "langid": q.q_langid,
        "dup_span_stats": q.q_dup_span_stats,
        "cosine_pairs": q.q_cosine_pairs,
        "triangle_count": q.q_triangle_count,
        "edit1_name_hist": q.q_edit1_name_hist,
        "random_walks": q.q_random_walks,
        "psi_value_drift": q.q_psi_value_drift,
        "frequent_triples": q.q_frequent_triples,
        "degree_assortativity": q.q_degree_assortativity,
        "markov_accuracy": q.q_markov_accuracy,
        "mutual_top_partner": q.q_mutual_top_partner,
        "search_docs": q.q_search_docs,
        "label_centroids": q.q_label_centroids,
        "shuffle_shards": q.q_shuffle_shards,
        "daily_spine_orders": q.q_daily_spine_orders,
        "zonemap_prune": q.q_zonemap_prune,
        "copurchase_pairs": q.q_copurchase_pairs,
        "dup_rate_by_source": q.q_dup_rate_by_source,
        "redact_pii": q.q_redact_pii,
        "pii_per_source": q.q_pii_per_source,
        "lm_familiarity": q.q_lm_familiarity,
        "weighted_sample_docs": q.q_weighted_sample_docs,
        "corpus_diff": q.q_corpus_diff,
        "returned_top20": q.q_returned_top20,
        "promo_revenue": q.q_promo_revenue,
        "disjunctive_revenue": q.q_disjunctive_revenue,
        "late_order_priority": q.q_late_order_priority,
        "market_share": q.q_market_share,
        "profit_by_nation_year": q.q_profit_by_nation_year,
        "top_supplier": q.q_top_supplier,
        "small_qty_revenue": q.q_small_qty_revenue,
        "idle_rich_customers": q.q_idle_rich_customers,
        "orders_per_customer_dist": q.q_orders_per_customer_dist,
        "large_orders": q.q_large_orders,
        "cheapest_supplier": q.q_cheapest_supplier,
        "important_parts": q.q_important_parts,
        "supplier_part_counts": q.q_supplier_part_counts,
        "dominant_suppliers": q.q_dominant_suppliers,
        "waiting_suppliers": q.q_waiting_suppliers,
        "rolling_median_value": q.q_rolling_median_value,
        "event_transitions": q.q_event_transitions,
        "mad_value_per_type": q.q_mad_value_per_type,
        "ab_test_value": q.q_ab_test_value,
        "lang_source_independence": q.q_lang_source_independence,
        "longest_streak": q.q_longest_streak,
        "heavy_hitters": q.q_heavy_hitters,
        "interarrival_stats": q.q_interarrival_stats,
        "time_weighted_value": q.q_time_weighted_value,
        "benford_totalprice": q.q_benford_totalprice,
        # --- still never driver-checked (next rotation fronts these) ---
        # round-5 additions (oracled)
        "dup_span_ranges": q.q_dup_span_ranges,
        "kanon_docs": q.q_kanon_docs,
        "late_event_rate": q.q_late_event_rate,
        "user_status_intervals": q.q_user_status_intervals,
        "event_expectations": q.q_event_expectations,
        "weighted_pagerank": q.q_weighted_pagerank,
        "user_active_coverage": q.q_user_active_coverage,
        "dup_span_winnowed": q.q_dup_span_winnowed,  # rows-only (r5)
        "auc_purchase_value": q.q_auc_purchase_value,
        "calibration_value": q.q_calibration_value,
        "corr_matrix_lineitem": q.q_corr_matrix_lineitem,
        "pareto_parts": q.q_pareto_parts,
        "clustering_coeff": q.q_clustering_coeff,
        "zorder_prune_2d": q.q_zorder_prune_2d,
        "spend_concentration": q.q_spend_concentration,
        "mi_lang_source": q.q_mi_lang_source,
        "cms_type_counts": q.q_cms_type_counts,
        "readability_docs": q.q_readability_docs,
        "mad_outliers_value": q.q_mad_outliers_value,
        "knn_label_accuracy": q.q_knn_label_accuracy,
        "user_daily_grid": q.q_user_daily_grid,
        "ks_value_drift": q.q_ks_value_drift,
        "cusum_daily_events": q.q_cusum_daily_events,
        "user_daily_interp": q.q_user_daily_interp,
        "discount_revenue": q.q_discount_revenue,
        "late_ship_priority": q.q_late_ship_priority,
        "source_lang_entropy": q.q_source_lang_entropy,
        "autocorr_value_lag1": q.q_autocorr_value_lag1,
        "rolling_1h_sum": q.q_rolling_1h_sum,
        "bfill_events": q.q_bfill_events,
        "ewma_value": q.q_ewma_value,
        "multi_lag_value": q.q_multi_lag_value,
        "cume_dist_events": q.q_cume_dist_events,
        "ordinal_encode_type": q.q_ordinal_encode_type,
        "latest_event_per_user": q.q_latest_event_per_user,
        "pct_rank_events": q.q_pct_rank_events,
        "prev_same_type_event": q.q_prev_same_type_event,
        "churned_customers": q.q_churned_customers,
        "loyal_customers": q.q_loyal_customers,
        "user_journey": q.q_user_journey,
        "order_stats_per_status": q.q_order_stats_per_status,
        "share_of_user_total": q.q_share_of_user_total,
        "user_type_spend": q.q_user_type_spend,
        "hourly_active_users": q.q_hourly_active_users,
        "pq_topk": q.q_pq_topk,
        "pca_embeddings": q.q_pca_embeddings,
        "embedding_neardup_winners": q.q_embedding_neardup_winners,
        "media_deadletter": q.q_media_deadletter,
        "semantic_dedup": q.q_semantic_dedup,
        "filtered_topk": q.q_filtered_topk,
        "incremental_agg": q.q_incremental_agg,
        "ntile_value": q.q_ntile_value,
        "user_event_paths": q.q_user_event_paths,
        "type_cooccurrence": q.q_type_cooccurrence,
        "source_jaccard": q.q_source_jaccard,
        "source_top_terms": q.q_source_top_terms,
        "cumulative_new_users": q.q_cumulative_new_users,
        "bigram_topk": q.q_bigram_topk,
        "events_per_user_hist": q.q_events_per_user_hist,
        "hapax_ratio": q.q_hapax_ratio,
        "hourly_profile": q.q_hourly_profile,
        "ship_delay_median": q.q_ship_delay_median,
        "spend_decile": q.q_spend_decile,
        "stratified_sample": q.q_stratified_sample,
        "distinct_users_6h": q.q_distinct_users_6h,
        "prefix_dup_groups": q.q_prefix_dup_groups,
        "per_user_top_type": q.q_per_user_top_type,
        "session_duration_decile": q.q_session_duration_decile,
        "props_k_stats": q.q_props_k_stats,
        "cum_distinct_types": q.q_cum_distinct_types,
        "monthly_revenue_growth": q.q_monthly_revenue_growth,
        "kcore_copurchase": q.q_kcore_copurchase,
        # round-5 late additions (oracled)
        "weighted_median_price": q.q_weighted_median_price,
        "alloc_docs_budget": q.q_alloc_docs_budget,
        "proportional_sample": q.q_proportional_sample,
        "weighted_p90_price": q.q_weighted_p90_price,
        "fk_audit": q.q_fk_audit,
        "weekly_retention": q.q_weekly_retention,
        "pair_lift": q.q_pair_lift,
        "bfs_hops": q.q_bfs_hops,
        # --- driver-verified green in a prior CORRECTNESS_r0*.json ---
        "stddev_value_per_type": q.q_stddev_value_per_type,
        "zscore_value": q.q_zscore_value,
        "minmax_value": q.q_minmax_value,
        "target_encode_type": q.q_target_encode_type,
        "lang_onehot_per_source": q.q_lang_onehot_per_source,
        "value_histogram": q.q_value_histogram,
        "price_qty_regression": q.q_price_qty_regression,
        "daily_order_vs_ship": q.q_daily_order_vs_ship,
        "robust_value_per_type": q.q_robust_value_per_type,
        "count_encode_type": q.q_count_encode_type,
        "lang_source_cross": q.q_lang_source_cross,
        "lineitem_unpivot": q.q_lineitem_unpivot,
        "quantile_bin_value": q.q_quantile_bin_value,
        "train_test_split": q.q_train_test_split,
        "winsorized_value": q.q_winsorized_value,
        "ordered_te_value": q.q_ordered_te_value,
        "running_peak_value": q.q_running_peak_value,
        "impute_value": q.q_impute_value,
        "rolling_1h_stats": q.q_rolling_1h_stats,
        "feature_store_events": q.q_feature_store_events,
        "skew_kurt_per_type": q.q_skew_kurt_per_type,
        "value_percentile": q.q_value_percentile,
        "profile_events": q.q_profile_events,
        "kfold_users": q.q_kfold_users,
        "ngram_repetition": q.q_ngram_repetition,
        "contamination": q.q_contamination,
        "bloom_new_docs": q.q_bloom_new_docs,
        "token_budget": q.q_token_budget,
        "mixture_sample": q.q_mixture_sample,
        "pivot_event_counts": q.q_pivot_event_counts,
        "curation_pipeline": q.q_curation_pipeline,
        "chunk_dedup": q.q_chunk_dedup,
        "oov_rate": q.q_oov_rate,
        "balanced_docs": q.q_balanced_docs,
        "chunk_dedup_local": q.q_chunk_dedup_local,
        "temperature_sample": q.q_temperature_sample,
        "ngram_novelty": q.q_ngram_novelty,
        "funnel_stages": q.q_funnel_stages,
        "throttle_events": q.q_throttle_events,
        "cohort_retention": q.q_cohort_retention,
        "local_supplier_revenue": q.q_local_supplier_revenue,
        "revenue_rollup": q.q_revenue_rollup,
        "revenue_cube": q.q_revenue_cube,
        "asof_click_within_1h": q.q_asof_click_within_1h,
        "p99_price_sketch": q.q_p99_price_sketch,
        "asof_chunked_hot": q.q_asof_chunked_hot,
        "salted_join_revenue": q.q_salted_join_revenue,
        "rfm_segments": q.q_rfm_segments,
        "volume_shipping": q.q_volume_shipping,
        "gini_user_spend": q.q_gini_user_spend,
        "flagship_features": q.q_flagship_features,
        "checkpointed_extract": q.q_checkpointed_extract,
        "ivf_topk": q.q_ivf_topk,
        "w1_windows": q.q_w1_windows,
        "w2_windows": q.q_w2_windows,
        "resample_total5": q.q_resample_total5,
        "resample_fps10": q.q_resample_fps10,
        "flow_pairs": q.q_flow_pairs,
        "vggish_windows": q.q_vggish_windows,
        "w2_resampled": q.q_w2_resampled,
        "asof_features": q.q_asof_features,
        "lag_lead_events": q.q_lag_lead_events,
        "sessionize_events": q.q_sessionize_events,
        "ffill_events": q.q_ffill_events,
        "tumbling_hourly": q.q_tumbling_hourly,
        "top_users": q.q_top_users,
        "asof_purchase_click": q.q_asof_purchase_click,
        "session_stats": q.q_session_stats,
        "unique_sources": q.q_unique_sources,
        "q1_pricing": q.q_q1_pricing,
        "revenue_per_nation": q.q_revenue_per_nation,
        "docs_per_source": q.q_docs_per_source,
        "exact_dedup": q.q_exact_dedup,
        "token_stats": q.q_token_stats,
        "quality_score": q.q_quality_score,
        "similarity_topk": q.q_similarity_topk,
        "sample_bottomk": q.q_sample_bottomk,
        "token_freq_top50": q.q_token_freq_top50,
        "sliding_hourly": q.q_sliding_hourly,
        "revenue_per_segment": q.q_revenue_per_segment,
        "rolling_sum": q.q_rolling_sum,
        "rank_events": q.q_rank_events,
        "customers_without_orders": q.q_customers_without_orders,
        "cumsum_events": q.q_cumsum_events,
        "median_value_per_type": q.q_median_value_per_type,
        "distinct_users_per_type": q.q_distinct_users_per_type,
        "stratified_docs": q.q_stratified_docs,
        "top100_events": q.q_top100_events,
        "user_type_counts": q.q_user_type_counts,
        "time_since_prev": q.q_time_since_prev,
        "asof_features_forward": q.q_asof_features_forward,
        "session_enriched": q.q_session_enriched,
        "top3_per_user": q.q_top3_per_user,
        "session_range_join": q.q_session_range_join,
        "term_df_topk": q.q_term_df_topk,
        "ngram_jaccard": q.q_ngram_jaccard,
        "pack_sequences": q.q_pack_sequences,
        "dense_rank_events": q.q_dense_rank_events,
        "ntile_events": q.q_ntile_events,
        "mode_event_type": q.q_mode_event_type,
        "shipping_priority": q.q_shipping_priority,
        "corr_qty_price": q.q_corr_qty_price,
        "p90_value_per_type": q.q_p90_value_per_type,
        "approx_distinct_users": q.q_approx_distinct_users,
        "approx_quantiles_price": q.q_approx_quantiles_price,
        "minhash_neardup": q.q_minhash_neardup,
        "neardup_winners": q.q_neardup_winners,
        "simhash": q.q_simhash,
        "fingerprint": q.q_fingerprint,
        "embedding_neardup": q.q_embedding_neardup,
        "kmeans_centroids": q.q_kmeans_centroids,
        "media_decode": q.q_media_decode,
        # round-5c additions (oracled; behind the rotation window)
        "mannwhitney_value": q.q_mannwhitney_value,
        "spearman_qty_price": q.q_spearman_qty_price,
        "dow_seasonality": q.q_dow_seasonality,
        "hhi_supplier_nation": q.q_hhi_supplier_nation,
        "mann_kendall_daily": q.q_mann_kendall_daily,
        "followed_within_1h": q.q_followed_within_1h,
        "containment_neardup": q.q_containment_neardup,
        "quantile_normalize_value": q.q_quantile_normalize_value,
        "oof_target_encode": q.q_oof_target_encode,
        "day_user_overlap": q.q_day_user_overlap,
        "fano_factor_daily": q.q_fano_factor_daily,
        "link_pred_jaccard": q.q_link_pred_jaccard,
        "anova_value_by_type": q.q_anova_value_by_type,
        "kruskal_value_by_type": q.q_kruskal_value_by_type,
        # rows-only (PAV pooling is iterative — no SQL equivalent;
        # tests/test_isotonic.py pins the math)
        "isotonic_calibration": q.q_isotonic_calibration,
        "ks_source_matrix": q.q_ks_source_matrix,
        "wasserstein_source_pairs": q.q_wasserstein_source_pairs,
        "tv_source_pairs": q.q_tv_source_pairs,
        "unigram_cosine_sources": q.q_unigram_cosine_sources,
        "textrank_keywords": q.q_textrank_keywords,
        "stl_daily_decomp": q.q_stl_daily_decomp,
        "theilsen_daily_slope": q.q_theilsen_daily_slope,
        "linear_attribution": q.q_linear_attribution,
        "pad_waste_by_bucket": q.q_pad_waste_by_bucket,
        "ppjoin_neardup": q.q_ppjoin_neardup,
        "breakpoint_daily_trend": q.q_breakpoint_daily_trend,
        "ccf_daily_lags": q.q_ccf_daily_lags,
        "runs_test_daily": q.q_runs_test_daily,
        "durbin_watson_daily": q.q_durbin_watson_daily,
        "levene_value_by_type": q.q_levene_value_by_type,
        # rows-only (array splicing has no SQL equivalent;
        # tests/test_corruption.py pins lossless reconstruction)
        "span_corruption": q.q_span_corruption,
    }

def _langid_oracle_sql() -> str:
    """Marker-word language heuristic, mirroring stages/text.LangId
    exactly: words split on single ASCII whitespace chars (empties
    kept out of the totals), case-insensitive marker match (for these
    40 ASCII/Latin-1 markers DuckDB's unicode lower() and the engine's
    latin1 lowering agree — no non-Latin char lowers INTO a marker),
    ties broken toward the LARGEST language key, score = best/total
    as one double division."""
    from video_features_ray.stages.text import LangId

    def _in(k: str) -> str:
        return ", ".join("'" + w + "'" for w in sorted(LangId.MARKERS[k]))

    g = "greatest(c_de, c_en, c_es, c_fr)"
    return (
        "WITH w0 AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id, "
        "unnest(regexp_split_to_array(coalesce(text, ''), "
        "'[\\t\\n\\x0B\\x0C\\r ]')) AS word FROM documents), "
        "cnts AS (SELECT doc_id, "
        "COUNT(*) FILTER (length(word) > 0) AS total_words, "
        f"COUNT(*) FILTER (lower(word) IN ({_in('de')})) AS c_de, "
        f"COUNT(*) FILTER (lower(word) IN ({_in('en')})) AS c_en, "
        f"COUNT(*) FILTER (lower(word) IN ({_in('es')})) AS c_es, "
        f"COUNT(*) FILTER (lower(word) IN ({_in('fr')})) AS c_fr "
        "FROM w0 GROUP BY doc_id) "
        "SELECT doc_id, "
        f"CASE WHEN {g} = 0 THEN 'unknown' "
        f"WHEN c_fr = {g} THEN 'fr' WHEN c_es = {g} THEN 'es' "
        f"WHEN c_en = {g} THEN 'en' ELSE 'de' END AS lang_pred, "
        f"CAST({g} AS DOUBLE) / greatest(total_words, 1) AS lang_score "
        "FROM cnts"
    )


def _pagerank_oracle_sql(iters: int = 3, damping: float = 0.85,
                         weighted: bool = False) -> str:
    """Unrolled synchronous PageRank over the synthetic citation graph
    (doc i -> (7i+3) mod N, (3i+1) mod N), one CTE trio per iteration
    (dangling mass, contribution sums, rank refresh), mirroring
    stages/graph.pagerank's float expressions association-for-
    association; the final ranks land on the 1e-9 half-away grid so
    summation-order noise (~1e-17) cannot flip a digit."""
    if weighted:
        e_cte = ("e AS (SELECT doc_id AS src, "
                 "(doc_id*7+3) % cnt.n AS dst, doc_id % 3 + 1 AS w "
                 "FROM documents, cnt "
                 "UNION ALL SELECT doc_id, (doc_id*3+1) % cnt.n, "
                 "doc_id % 5 + 1 FROM documents, cnt), "
                 "od AS (SELECT src, CAST(SUM(w) AS BIGINT) AS outdeg "
                 "FROM e GROUP BY src), ")
        c_expr = "SUM(r.rank * e.w / od.outdeg) AS c "
    else:
        e_cte = ("e AS (SELECT doc_id AS src, "
                 "(doc_id*7+3) % cnt.n AS dst "
                 "FROM documents, cnt "
                 "UNION ALL SELECT doc_id, (doc_id*3+1) % cnt.n "
                 "FROM documents, cnt), "
                 "od AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg "
                 "FROM e GROUP BY src), ")
        c_expr = "SUM(r.rank / od.outdeg) AS c "
    sql = (
        "WITH cnt AS (SELECT COUNT(*) AS n FROM documents), "
        + e_cte +
        "nodes AS (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM e UNION ALL SELECT dst FROM e)), "
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes), "
        "r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes, nn)"
    )
    for i in range(1, iters + 1):
        p, c, d, r = f"r{i - 1}", f"c{i}", f"d{i}", f"r{i}"
        sql += (
            f", {d} AS (SELECT COALESCE(SUM(r.rank), 0.0) AS dm "
            f"FROM {p} r LEFT JOIN od ON r.node = od.src "
            f"WHERE od.src IS NULL)"
            f", {c} AS (SELECT e.dst AS node, "
            + c_expr +
            f"FROM e JOIN od ON e.src = od.src "
            f"JOIN {p} r ON r.node = e.src GROUP BY e.dst)"
            f", {r} AS (SELECT nd.node, "
            f"{1.0 - damping!r} / nn.n + {damping!r} * {d}.dm / nn.n "
            f"+ {damping!r} * COALESCE({c}.c, 0.0) AS rank "
            f"FROM nodes nd CROSS JOIN nn CROSS JOIN {d} "
            f"LEFT JOIN {c} ON nd.node = {c}.node)"
        )
    sql += (
        f" SELECT node, CAST(CASE WHEN sx >= 0 THEN floor(sx + 0.5) "
        f"ELSE -floor(-sx + 0.5) END AS BIGINT) AS rank_e9 FROM "
        f"(SELECT node, rank * 1000000000.0 AS sx FROM r{iters})"
    )
    return sql


def _textrank_oracle_sql(iters: int = 3, damping: float = 0.85) -> str:
    """TextRank: the same unrolled PageRank CTE trio per iteration as
    `_pagerank_oracle_sql`, over the DISTINCT word-adjacency edge
    table (string nodes — ids are irrelevant to the ranks), top-20 on
    the 1e-9 grid with word tiebreak."""
    sql = (
        "WITH t AS (SELECT doc_id, string_split(text, ' ') AS w, "
        "len(string_split(text, ' ')) AS nw FROM documents), "
        "e AS (SELECT DISTINCT w[i] AS src, w[i + 1] AS dst FROM "
        "(SELECT w, unnest(generate_series(1, nw - 1)) AS i FROM t "
        "WHERE nw >= 2) x), "
        "od AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg "
        "FROM e GROUP BY src), "
        "nodes AS (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM e UNION ALL SELECT dst FROM e)), "
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes), "
        "r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes, nn)"
    )
    for i in range(1, iters + 1):
        p, c, d, r = f"r{i - 1}", f"c{i}", f"d{i}", f"r{i}"
        sql += (
            f", {d} AS (SELECT COALESCE(SUM(r.rank), 0.0) AS dm "
            f"FROM {p} r LEFT JOIN od ON r.node = od.src "
            f"WHERE od.src IS NULL)"
            f", {c} AS (SELECT e.dst AS node, "
            f"SUM(r.rank / od.outdeg) AS c "
            f"FROM e JOIN od ON e.src = od.src "
            f"JOIN {p} r ON r.node = e.src GROUP BY e.dst)"
            f", {r} AS (SELECT nd.node, "
            f"{1.0 - damping!r} / nn.n + {damping!r} * {d}.dm / nn.n "
            f"+ {damping!r} * COALESCE({c}.c, 0.0) AS rank "
            f"FROM nodes nd CROSS JOIN nn CROSS JOIN {d} "
            f"LEFT JOIN {c} ON nd.node = {c}.node)"
        )
    sql += (
        f" SELECT node AS word, CAST(CASE WHEN sx >= 0 THEN "
        f"floor(sx + 0.5) ELSE -floor(-sx + 0.5) END AS BIGINT) AS "
        f"rank_e9 FROM (SELECT node, rank * 1000000000.0 AS sx "
        f"FROM r{iters}) ORDER BY rank_e9 DESC, word LIMIT 20"
    )
    return sql


def _fk_audit_oracle_sql() -> str:
    """UNION ALL of per-relation integrity scalars (see q_fk_audit)."""
    rels = [
        ("customer.c_nationkey->nation", "customer", "c_nationkey",
         "nation", "n_nationkey"),
        ("events.user_id->customer", "events", "user_id",
         "customer", "c_custkey"),
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
         "orders", "o_orderkey"),
        ("lineitem.l_partkey->part", "lineitem", "l_partkey",
         "part", "p_partkey"),
        ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
         "supplier", "s_suppkey"),
        ("nation.n_regionkey->region", "nation", "n_regionkey",
         "region", "r_regionkey"),
        ("orders.o_custkey->customer", "orders", "o_custkey",
         "customer", "c_custkey"),
        ("supplier.s_nationkey->nation", "supplier", "s_nationkey",
         "nation", "n_nationkey"),
    ]
    parts = []
    for name, child, fk, parent, pk in rels:
        parts.append(
            f"SELECT '{name}' AS relation, "
            f"(SELECT COUNT(*) FROM {child}) AS child_rows, "
            f"(SELECT COUNT(*) FROM {child} WHERE {fk} IS NULL) "
            f"AS null_fk_rows, "
            f"(SELECT COUNT(DISTINCT {fk}) FROM {child}) AS distinct_keys, "
            f"(SELECT COUNT(*) FROM (SELECT DISTINCT {fk} FROM {child} "
            f"WHERE {fk} IS NOT NULL) c LEFT JOIN {parent} p "
            f"ON c.{fk} = p.{pk} WHERE p.{pk} IS NULL) AS orphan_keys, "
            f"(SELECT COUNT(*) FROM {child} c LEFT JOIN {parent} p "
            f"ON c.{fk} = p.{pk} WHERE c.{fk} IS NOT NULL "
            f"AND p.{pk} IS NULL) AS orphan_rows"
        )
    return " UNION ALL ".join(parts) + " ORDER BY relation"


def _corr_matrix_sql() -> str:
    """All-pairs Pearson SQL over the same integer scalings and the
    same float64 expression tree as ``stages/joins.py:corr_matrix`` —
    generated so the 6 pair cells cannot drift from one another."""
    cols = {"qty": "CAST(round(l_quantity) AS BIGINT)",
            "price": "CAST(floor(l_extendedprice) AS BIGINT)",
            "disc": "CAST(round(l_discount * 100.0) AS BIGINT)",
            "tax": "CAST(round(l_tax * 100.0) AS BIGINT)"}
    names = list(cols)
    sel = ", ".join(f"{expr} AS {c}" for c, expr in cols.items())
    moments = ["CAST(COUNT(*) AS DOUBLE) AS n",
               "CAST(COUNT(*) AS BIGINT) AS nn"]
    for c in names:
        moments.append(f"CAST(SUM({c}) AS DOUBLE) AS s_{c}")
        moments.append(f"CAST(SUM({c} * {c}) AS DOUBLE) AS q_{c}")
    pairs = [(a, b) for i, a in enumerate(names) for b in names[i + 1:]]
    for a, b in pairs:
        moments.append(f"CAST(SUM({a} * {b}) AS DOUBLE) AS p_{a}_{b}")
    rows = []
    for a, b in pairs:
        num = f"(n * p_{a}_{b} - s_{a} * s_{b})"
        den = (f"(sqrt(n * q_{a} - s_{a} * s_{a}) * "
               f"sqrt(n * q_{b} - s_{b} * s_{b}))")
        rows.append(f"SELECT '{a}' AS col_x, '{b}' AS col_y, nn AS n, "
                    f"CASE WHEN {den} > 0 THEN {num} / {den} "
                    f"ELSE -1.0 END AS corr FROM m")
    return (f"WITH s AS (SELECT {sel} FROM lineitem), "
            f"m AS (SELECT {', '.join(moments)} FROM s) "
            + " UNION ALL ".join(rows))


_CORR_MATRIX_SQL = _corr_matrix_sql()


def oracle_sql() -> dict[str, str]:
    return {
        # exact lower weighted median: smallest price with
        # 2*cumweight >= total weight (order-invariant under ties —
        # the tie run's last row always carries the full cum weight)
        "weighted_median_price": (
            "WITH s AS (SELECT l_suppkey AS suppkey, "
            "CAST(round(l_extendedprice * 100.0) AS BIGINT) AS price_c, "
            "CAST(l_quantity AS BIGINT) AS w FROM lineitem), "
            "c AS (SELECT suppkey, price_c, "
            "SUM(w) OVER (PARTITION BY suppkey ORDER BY price_c "
            "ROWS UNBOUNDED PRECEDING) AS cw, "
            "SUM(w) OVER (PARTITION BY suppkey) AS tw FROM s) "
            "SELECT suppkey, MIN(price_c) / 100.0 AS wmedian_price "
            "FROM c WHERE 2 * cw >= tw GROUP BY suppkey"
        ),
        # weighted 90th percentile: same crossing at 100*cw >= 90*tw
        "weighted_p90_price": (
            "WITH s AS (SELECT l_suppkey AS suppkey, "
            "CAST(round(l_extendedprice * 100.0) AS BIGINT) AS price_c, "
            "CAST(l_quantity AS BIGINT) AS w FROM lineitem), "
            "c AS (SELECT suppkey, price_c, "
            "SUM(w) OVER (PARTITION BY suppkey ORDER BY price_c "
            "ROWS UNBOUNDED PRECEDING) AS cw, "
            "SUM(w) OVER (PARTITION BY suppkey) AS tw FROM s) "
            "SELECT suppkey, MIN(price_c) / 100.0 AS wp90_price "
            "FROM c WHERE 100 * cw >= 90 * tw GROUP BY suppkey"
        ),
        # largest-remainder apportionment of a 10k budget by doc count
        "alloc_docs_budget": (
            "WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) "
            "AS n_docs FROM documents GROUP BY source), "
            "t AS (SELECT SUM(n_docs) AS tot FROM c), "
            "f AS (SELECT source, n_docs, (10000 * n_docs) // tot AS fl, "
            "(10000 * n_docs) % tot AS rem FROM c, t), "
            "d AS (SELECT 10000 - SUM(fl) AS k FROM f), "
            "r AS (SELECT source, n_docs, fl, rem, ROW_NUMBER() OVER "
            "(ORDER BY rem DESC, source) AS rn FROM f) "
            "SELECT r.source, r.n_docs, CAST(r.fl + CASE WHEN r.rn <= d.k "
            "THEN 1 ELSE 0 END AS BIGINT) AS alloc FROM r, d"
        ),
        # budget-exact proportional stratified sample: Hamilton quotas
        # of a 200-doc budget + the replayable Knuth-hash order
        "proportional_sample": (
            "WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) "
            "AS n_docs FROM documents GROUP BY source), "
            "t AS (SELECT SUM(n_docs) AS tot FROM c), "
            "f AS (SELECT source, n_docs, (200 * n_docs) // tot AS fl, "
            "(200 * n_docs) % tot AS rem FROM c, t), "
            "d AS (SELECT 200 - SUM(fl) AS k FROM f), "
            "a AS (SELECT source, fl + CASE WHEN ROW_NUMBER() OVER "
            "(ORDER BY rem DESC, source) <= (SELECT k FROM d) "
            "THEN 1 ELSE 0 END AS quota FROM f), "
            "s AS (SELECT source, doc_id, ROW_NUMBER() OVER "
            "(PARTITION BY source ORDER BY "
            "(doc_id * 2654435761) % 4294967296, doc_id) AS rn "
            "FROM documents) "
            "SELECT s.source, CAST(s.doc_id AS BIGINT) AS doc_id "
            "FROM s JOIN a USING (source) WHERE s.rn <= a.quota"
        ),
        # referential-integrity audit over every FK->PK relation
        "fk_audit": _fk_audit_oracle_sql(),
        # BFS hop distances <= 3 from the smallest co-purchase node;
        # bounded recursive path enumeration + MIN(depth)
        "bfs_hops": (
            "WITH RECURSIVE lp AS (SELECT DISTINCT l_orderkey, "
            "l_partkey FROM lineitem), "
            "pp AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb "
            "FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey "
            "AND a.l_partkey < b.l_partkey), "
            "e0 AS (SELECT pa, pb FROM pp GROUP BY pa, pb "
            "HAVING COUNT(*) >= 2), "
            "e AS (SELECT pa AS src, pb AS dst FROM e0 "
            "UNION ALL SELECT pb, pa FROM e0), "
            "b(node, depth) AS ("
            "SELECT (SELECT MIN(src) FROM e), 0 "
            "UNION ALL "
            "SELECT e.dst, b.depth + 1 FROM b JOIN e ON e.src = b.node "
            "WHERE b.depth < 3) "
            "SELECT CAST(node AS BIGINT) AS node, "
            "CAST(MIN(depth) AS BIGINT) AS depth "
            "FROM b GROUP BY node ORDER BY node"
        ),
        # cohort retention matrix on epoch-anchored week indexes
        "weekly_retention": (
            "WITH uw AS (SELECT DISTINCT user_id, "
            "CAST(floor(epoch(ts)/604800) AS BIGINT) AS wk FROM events), "
            "f AS (SELECT user_id, MIN(wk) AS cw FROM uw GROUP BY 1) "
            "SELECT f.cw AS cohort_week, uw.wk - f.cw AS week_offset, "
            "CAST(COUNT(*) AS BIGINT) AS n_users "
            "FROM uw JOIN f USING (user_id) "
            "GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        # market-basket lift for pairs co-ordered >= 3 times; lift is
        # one BIGINT-product division so float bits match exactly
        "pair_lift": (
            "WITH d AS (SELECT DISTINCT l_orderkey, l_partkey "
            "FROM lineitem), "
            "n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) "
            "AS n_orders FROM lineitem), "
            "ic AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) "
            "AS n_item FROM d GROUP BY 1), "
            "p AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, "
            "CAST(COUNT(*) AS BIGINT) AS n_ab FROM d a JOIN d b "
            "ON a.l_orderkey = b.l_orderkey "
            "AND a.l_partkey < b.l_partkey GROUP BY 1, 2) "
            "SELECT p.part_a, p.part_b, p.n_ab, ia.n_item AS n_a, "
            "ib.n_item AS n_b, CAST(p.n_ab * n.n_orders AS DOUBLE) / "
            "CAST(ia.n_item * ib.n_item AS DOUBLE) AS lift "
            "FROM p JOIN ic ia ON p.part_a = ia.l_partkey "
            "JOIN ic ib ON p.part_b = ib.l_partkey CROSS JOIN n "
            "WHERE p.n_ab >= 3 ORDER BY part_a, part_b"
        ),
        # 3-iteration PageRank, unrolled CTEs, ranks on the 1e-9 grid
        "link_pagerank": _pagerank_oracle_sql(iters=3, damping=0.85),
        # edge-weighted PageRank (weights folded into the out-sum)
        "weighted_pagerank": _pagerank_oracle_sql(iters=3, damping=0.85,
                                                  weighted=True),
        # marker-word language heuristic (was rows-only through r4)
        "langid": _langid_oracle_sql(),
        # merged duplicated-span intervals (ExactSubstr deliverable):
        # gaps-and-islands over duplicated 40-gram positions
        "dup_span_ranges": (
            "WITH g0 AS (SELECT doc_id, text, "
            "unnest(generate_series(1, length(text) - 39)) AS i "
            "FROM documents WHERE length(text) >= 40), "
            "g AS (SELECT doc_id, CAST(i AS BIGINT) AS i, "
            "substr(text, CAST(i AS INT), 40) AS gram FROM g0), "
            "d AS (SELECT gram FROM "
            "(SELECT DISTINCT doc_id, gram FROM g) "
            "GROUP BY gram HAVING COUNT(*) >= 2), "
            "p AS (SELECT doc_id, i FROM g "
            "WHERE gram IN (SELECT gram FROM d)), "
            "w AS (SELECT doc_id, i, CASE WHEN i - COALESCE("
            "lag(i) OVER (PARTITION BY doc_id ORDER BY i), i) > 40 "
            "THEN 1 ELSE 0 END AS brk FROM p), "
            "isl AS (SELECT doc_id, i, SUM(brk) OVER "
            "(PARTITION BY doc_id ORDER BY i "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
            "AS island FROM w) "
            "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
            "CAST(MIN(i) AS BIGINT) AS span_start, "
            "CAST(MAX(i) + 39 AS BIGINT) AS span_end, "
            "CAST(COUNT(*) AS BIGINT) AS n_dup_pos "
            "FROM isl GROUP BY doc_id, island"
        ),
        # k-anonymity suppression on (source, n_chars // 100)
        "kanon_docs": (
            "WITH b AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, "
            "source, CAST(n_chars // 100 AS BIGINT) AS size_bin "
            "FROM documents), "
            "c AS (SELECT source, size_bin, COUNT(*) AS n "
            "FROM b GROUP BY 1, 2) "
            "SELECT b.doc_id, b.source, b.size_bin FROM b JOIN c "
            "ON b.source = c.source AND b.size_bin = c.size_bin "
            "WHERE c.n >= 5"
        ),
        # SCD2 validity intervals from event-type runs per user
        "user_status_intervals": (
            "WITH s AS (SELECT user_id, event_type, epoch_us(ts) AS t, "
            "event_id, CASE WHEN lag(event_type) OVER "
            "(PARTITION BY user_id ORDER BY epoch_us(ts), event_id) "
            "IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS brk "
            "FROM events), "
            "i AS (SELECT user_id, event_type, t, SUM(brk) OVER "
            "(PARTITION BY user_id ORDER BY t, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run "
            "FROM s), "
            "r AS (SELECT CAST(user_id AS BIGINT) AS user_id, "
            "event_type, MIN(t) AS valid_from_us, "
            "CAST(COUNT(*) AS BIGINT) AS n_events, run "
            "FROM i GROUP BY user_id, event_type, run), "
            "f AS (SELECT user_id, event_type, valid_from_us, "
            "lead(valid_from_us) OVER "
            "(PARTITION BY user_id ORDER BY run) AS valid_to_us, "
            "n_events FROM r) "
            "SELECT user_id, event_type, "
            "CAST(valid_from_us AS BIGINT) AS valid_from_us, "
            "CAST(valid_to_us AS BIGINT) AS valid_to_us, n_events "
            "FROM f"
        ),
        # interval-union activity coverage (5-min windows merged)
        "user_active_coverage": (
            "WITH x AS (SELECT user_id, epoch_us(ts) AS t "
            "FROM events), "
            "w AS (SELECT user_id, t, CASE WHEN t - COALESCE("
            "lag(t) OVER (PARTITION BY user_id ORDER BY t), t) "
            "> 300000000 THEN 1 ELSE 0 END AS brk FROM x), "
            "isl AS (SELECT user_id, t, SUM(brk) OVER "
            "(PARTITION BY user_id ORDER BY t "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
            "AS g FROM w), "
            "c AS (SELECT user_id, g, MAX(t) - MIN(t) + 300000000 "
            "AS cov, COUNT(*) AS ne FROM isl GROUP BY 1, 2) "
            "SELECT CAST(user_id AS BIGINT) AS user_id, "
            "CAST(SUM(cov) AS BIGINT) AS covered_us, "
            "CAST(COUNT(*) AS BIGINT) AS n_islands, "
            "CAST(SUM(ne) AS BIGINT) AS n_events "
            "FROM c GROUP BY 1"
        ),
        # data-quality expectations: per-day rule-violation counts
        "event_expectations": (
            "SELECT epoch_us(ts) // 86400000000 AS day, "
            "CAST(COUNT(*) AS BIGINT) AS n_rows, "
            "CAST(SUM(CASE WHEN value > 100.0 THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_value_outlier, "
            "CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 "
            "END) AS BIGINT) AS n_error_events, "
            "CAST(SUM(CASE WHEN (epoch_us(ts) % 86400000000) "
            "// 3600000000 < 6 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_night_events "
            "FROM events GROUP BY 1"
        ),
        # watermark / allowed-lateness accounting (1h) by arrival order
        "late_event_rate": (
            "WITH w AS (SELECT event_type, epoch_us(ts) AS t, "
            "MAX(epoch_us(ts)) OVER (ORDER BY event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm "
            "FROM events) "
            "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events, "
            "CAST(COALESCE(SUM(CASE WHEN wm IS NOT NULL "
            "AND t + 3600000000 < wm THEN 1 ELSE 0 END), 0) AS BIGINT) "
            "AS n_late, "
            "CAST(COALESCE(SUM(CASE WHEN wm IS NOT NULL "
            "AND t + 3600000000 < wm THEN 1 ELSE 0 END), 0) AS DOUBLE) "
            "/ COUNT(*) AS late_frac "
            "FROM w GROUP BY event_type"
        ),
        "w1_windows": f"{_SEQ} {_W1_WINDOWS}",
        "w2_windows": (
            f"{_SEQ} "
            "SELECT s.doc_id, CAST(s.wid AS BIGINT) AS window_id, "
            "(s.wid * 8 + 17) / 25.0 * 1000.0 AS ts_ms, "
            "CAST(list_sum(s.tokens[s.wid * 8 + 1 : s.wid * 8 + 17]) AS BIGINT) AS window_sum "
            "FROM (SELECT seq.*, unnest(generate_series(0, (seq.n - 17) // 8)) AS wid "
            "FROM seq WHERE seq.n >= 17) s"
        ),
        "resample_total5": (
            f"{_SEQ} "
            "SELECT s.doc_id, CAST(s.k AS BIGINT) AS pos, "
            "s.k / ((5 * 25.0) / s.n) * 1000.0 AS ts_ms, "
            "CAST(s.tokens[(s.k * s.n) // 5 + 1] AS BIGINT) AS token "
            "FROM (SELECT seq.*, unnest(generate_series(0, 4)) AS k "
            "FROM seq WHERE seq.n > 0) s"
        ),
        "resample_fps10": (
            f"{_SEQ} "
            "SELECT s.doc_id, CAST(s.k AS BIGINT) AS pos, "
            "s.k / 10.0 * 1000.0 AS ts_ms, "
            "CAST(s.tokens[LEAST(CAST(floor(s.k * (25.0 / 10.0)) AS BIGINT), s.n - 1) + 1] AS BIGINT) AS token "
            "FROM (SELECT seq.*, unnest(generate_series(0, "
            "CAST(ceil(seq.n * (10.0 / 25.0)) AS BIGINT) - 1)) AS k "
            "FROM seq WHERE seq.n > 0) s"
        ),
        "flow_pairs": (
            f"{_SEQ} "
            "SELECT s.doc_id, CAST(s.i AS BIGINT) AS window_id, "
            "(s.i + 1) / 25.0 * 1000.0 AS ts_ms, "
            "CAST(s.tokens[s.i + 1] AS BIGINT) AS tok_a, "
            "CAST(s.tokens[s.i + 2] AS BIGINT) AS tok_b "
            "FROM (SELECT seq.*, unnest(generate_series(0, seq.n - 2)) AS i "
            "FROM seq WHERE seq.n >= 2) s"
        ),
        "vggish_windows": (
            f"{_SEQ}, "
            # level 1: inner frame sums (win 40, hop 16), tail dropped
            "inn AS (SELECT s.doc_id, s.k, "
            "CAST(list_sum(s.tokens[s.k * 16 + 1 : s.k * 16 + 40]) AS BIGINT) AS f "
            "FROM (SELECT seq.*, unnest(generate_series(0, (seq.n - 40) // 16)) AS k "
            "FROM seq WHERE seq.n >= 40) s), "
            "fr AS (SELECT doc_id, list(f ORDER BY k) AS fl, COUNT(*) AS ni "
            "FROM inn GROUP BY doc_id) "
            # level 2: tumbling 8/8 over inner frames
            "SELECT t.doc_id, CAST(t.wid AS BIGINT) AS window_id, "
            "((t.wid * 8 + 8 - 1) * 16 + 40 - 1) / 25.0 * 1000.0 AS ts_ms, "
            "CAST(list_sum(t.fl[t.wid * 8 + 1 : t.wid * 8 + 8]) AS BIGINT) AS window_sum "
            "FROM (SELECT fr.*, unnest(generate_series(0, CAST((fr.ni - 8) // 8 AS BIGINT))) AS wid "
            "FROM fr WHERE fr.ni >= 8) t"
        ),
        "w2_resampled": (
            f"{_SEQ}, "
            # S5 resample 25→10 fps (nearest-frame model), THEN W2 windows (W7)
            "res AS (SELECT s.doc_id, "
            "list_transform(generate_series(0, CAST(ceil(s.n * (10.0 / 25.0)) AS BIGINT) - 1), "
            "k -> s.tokens[LEAST(CAST(floor(k * (25.0 / 10.0)) AS BIGINT), s.n - 1) + 1]) AS rt "
            "FROM seq s WHERE s.n > 0), "
            "rn AS (SELECT doc_id, rt, len(rt) AS m FROM res) "
            "SELECT t.doc_id, CAST(t.wid AS BIGINT) AS window_id, "
            "(t.wid * 8 + 17) / 10.0 * 1000.0 AS ts_ms, "
            "CAST(list_sum(t.rt[t.wid * 8 + 1 : t.wid * 8 + 17]) AS BIGINT) AS window_sum "
            "FROM (SELECT rn.*, unnest(generate_series(0, (rn.m - 17) // 8)) AS wid "
            "FROM rn WHERE rn.m >= 17) t"
        ),
        "asof_features": (
            f"{_SEQ}, w AS ({_W1_WINDOWS}), "
            "grid AS (SELECT d.doc_id, g.g * 937.0 AS ts_q "
            "FROM (SELECT CAST(doc_id AS VARCHAR) AS doc_id FROM documents) d "
            "CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS g) g) "
            "SELECT grid.doc_id, grid.ts_q, "
            "CAST(COALESCE(w.window_id, -1) AS BIGINT) AS window_id_r, "
            "COALESCE(w.ts_ms, -1.0) AS win_ts_r "
            "FROM grid ASOF LEFT JOIN w "
            "ON grid.doc_id = w.doc_id AND grid.ts_q >= w.ts_ms"
        ),
        "lag_lead_events": (
            "SELECT event_id, user_id, epoch_us(ts) AS ts_us, value, "
            "COALESCE(lag(value) OVER w, -1.0) AS value_lag1, "
            "COALESCE(lead(value) OVER w, -1.0) AS value_lead1 "
            "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"
        ),
        "sessionize_events": (
            "WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events), "
            "m AS (SELECT *, CASE WHEN lag(t) OVER w IS NULL "
            "OR t - lag(t) OVER w > 1800000000 THEN 1 ELSE 0 END AS new "
            "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)) "
            "SELECT event_id, user_id, "
            "CAST(SUM(new) OVER (PARTITION BY user_id ORDER BY t, event_id "
            "ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id FROM m"
        ),
        "ffill_events": (
            "SELECT event_id, user_id, epoch_us(ts) AS ts_us, "
            "COALESCE(last_value(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS) "
            "OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING), "
            "-1.0) AS click_value_ffill FROM events"
        ),
        "tumbling_hourly": (
            "SELECT user_id, "
            "CAST(floor(epoch_us(ts) / 3600000000.0) * 3600000000.0 AS BIGINT) AS window_start_us, "
            "CAST(COUNT(*) AS BIGINT) AS n, "
            "SUM(CAST(round(value * 10000.0) AS BIGINT)) / 10000.0 AS sum_value "
            "FROM events GROUP BY 1, 2"
        ),
        "top_users": (
            "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n, "
            "SUM(CAST(round(value * 10000.0) AS BIGINT)) / 10000.0 AS total_value "
            "FROM events GROUP BY user_id "
            "ORDER BY SUM(CAST(round(value * 10000.0) AS BIGINT)) DESC, user_id LIMIT 10"
        ),
        "asof_purchase_click": (
            "WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value "
            "FROM events WHERE event_type = 'purchase'), "
            "c AS (SELECT event_id AS c_event, user_id, epoch_us(ts) AS ts_us, "
            "value AS c_value FROM events WHERE event_type = 'click') "
            "SELECT p.event_id, p.user_id, p.ts_us, p.value, "
            "CAST(COALESCE(c.c_event, -1) AS BIGINT) AS c_event_r, "
            "COALESCE(c.c_value, -1.0) AS c_value_r "
            "FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts_us >= c.ts_us"
        ),
        "session_stats": (
            "WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events), "
            "m AS (SELECT *, CASE WHEN lag(t) OVER w IS NULL "
            "OR t - lag(t) OVER w > 1800000000 THEN 1 ELSE 0 END AS new "
            "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)), "
            "s AS (SELECT *, CAST(SUM(new) OVER (PARTITION BY user_id ORDER BY t, event_id "
            "ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id FROM m) "
            "SELECT user_id, session_id, CAST(COUNT(*) AS BIGINT) AS n_events, "
            "CAST(MIN(t) AS BIGINT) AS t_start, CAST(MAX(t) AS BIGINT) AS t_end "
            "FROM s GROUP BY user_id, session_id"
        ),
        "unique_sources": "SELECT DISTINCT source FROM documents",
        "q1_pricing": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, "
            "SUM(CAST(round(l_extendedprice * 100.0) AS BIGINT)) / 100.0 AS sum_base_price, "
            "SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000.0) AS BIGINT)) / 10000.0 AS sum_disc_price, "
            "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) / CAST(COUNT(*) AS BIGINT) AS avg_qty, "
            "CAST(COUNT(*) AS BIGINT) AS count_order "
            "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' "
            "GROUP BY l_returnflag, l_linestatus"
        ),
        "revenue_per_nation": (
            "SELECT n.n_name AS n_name, "
            "SUM(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 10000.0) AS BIGINT)) / 10000.0 AS revenue, "
            "CAST(COUNT(*) AS BIGINT) AS n_items "
            "FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey "
            "JOIN nation n ON s.s_nationkey = n.n_nationkey GROUP BY n.n_name"
        ),
        "docs_per_source": (
            "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars FROM documents GROUP BY source"
        ),
        "exact_dedup": (
            "SELECT md5(text) AS content_hash, CAST(MIN(doc_id) AS BIGINT) AS keep_id, "
            "CAST(COUNT(*) AS BIGINT) AS n_dupes FROM documents GROUP BY md5(text)"
        ),
        "token_stats": (
            "SELECT CAST(doc_id AS VARCHAR) AS doc_id, "
            "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words, "
            "CAST(length(text) AS BIGINT) AS n_chars, "
            "CAST(list_sum(list_transform(string_split(text, ' '), w -> length(w))) AS BIGINT) "
            "/ GREATEST(CAST(len(string_split(text, ' ')) AS BIGINT), 1) AS mean_word_len "
            "FROM documents"
        ),
        "quality_score": (
            "SELECT CAST(doc_id AS VARCHAR) AS doc_id, "
            "CAST(length(text) AS BIGINT) AS n_chars, "
            "CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS BIGINT) AS n_punct, "
            "CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS BIGINT) AS n_upper, "
            "CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_space, "
            "CAST(len(list_filter(string_split(lower(text), ' '), "
            "w -> w IN ('the','and','of','a','to','in','is','it','that','for'))) AS BIGINT) AS n_stop, "
            "(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g'))) "
            "/ GREATEST(length(text), 1) AS punct_ratio, "
            "(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g'))) "
            "/ GREATEST(length(text), 1) AS upper_ratio "
            "FROM documents"
        ),
        "sample_bottomk": (
            "SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n_chars AS BIGINT) AS n_chars "
            "FROM (SELECT doc_id, n_chars, hash(CAST(doc_id AS BIGINT)) AS h "
            "FROM documents ORDER BY h, doc_id LIMIT 20)"
        ),
        "token_freq_top50": (
            f"{_SEQ} "
            "SELECT CAST(t.token AS BIGINT) AS token, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM (SELECT unnest(tokens) AS token FROM seq) t "
            "GROUP BY t.token ORDER BY n DESC, token LIMIT 50"
        ),
        "revenue_per_segment": (
            "SELECT c_mktsegment, "
            "SUM(CAST(round(o_totalprice * 100.0) AS BIGINT)) / 100.0 AS revenue, "
            "CAST(COUNT(*) AS BIGINT) AS n_orders "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "GROUP BY c_mktsegment"
        ),
        "rolling_sum": (
            "SELECT event_id, user_id, epoch_us(ts) AS ts_us, "
            "SUM(CAST(round(value * 10000.0) AS BIGINT)) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) / 10000.0 AS roll5 "
            "FROM events"
        ),
        "customers_without_orders": (
            "SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_mktsegment "
            "FROM customer c WHERE NOT EXISTS ("
            "SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
            "AND o.o_orderdate >= TIMESTAMP '1998-06-01')"
        ),
        "rank_events": (
            "SELECT event_id, user_id, CAST(row_number() OVER ("
            "PARTITION BY user_id ORDER BY value DESC, event_id) AS BIGINT) AS rnk "
            "FROM events"
        ),
        "cumsum_events": (
            "SELECT event_id, user_id, epoch_us(ts) AS ts_us, "
            "SUM(CAST(round(value * 10000.0) AS BIGINT)) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) / 10000.0 AS cum_value "
            "FROM events"
        ),
        "median_value_per_type": (
            "SELECT event_type, "
            "quantile_disc(CAST(round(value * 100.0) AS BIGINT), 0.5) / 100.0 "
            "AS median_value FROM events GROUP BY event_type"
        ),
        "sliding_hourly": (
            "WITH e AS (SELECT epoch_us(ts) AS t, "
            "CAST(round(value * 10000.0) AS BIGINT) AS v FROM events), "
            "x AS (SELECT t, v, unnest(generate_series(0, 1)) AS k FROM e), "
            "w AS (SELECT (CAST(floor(t / 1800000000.0) AS BIGINT) - k) * 1800000000 "
            "AS ws, t, v FROM x) "
            "SELECT CAST(ws AS BIGINT) AS window_start_us, "
            "CAST(COUNT(*) AS BIGINT) AS n, SUM(v) / 10000.0 AS sum_value "
            "FROM w WHERE ws > t - 3600000000 GROUP BY ws"
        ),
        "distinct_users_per_type": (
            "SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct "
            "FROM events GROUP BY event_type"
        ),
        "user_type_counts": (
            "SELECT user_id, "
            "CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS n_click, "
            "CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS n_error, "
            "CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase, "
            "CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup, "
            "CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS n_view "
            "FROM events GROUP BY user_id"
        ),
        "time_since_prev": (
            "SELECT event_id, user_id, epoch_us(ts) AS ts_us, "
            "CAST(COALESCE(epoch_us(ts) - lag(epoch_us(ts)) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id), -1) AS BIGINT) AS gap_us "
            "FROM events"
        ),
        "top100_events": (
            "SELECT event_id, user_id, epoch_us(ts) AS ts_us, value "
            "FROM events ORDER BY value DESC, event_id LIMIT 100"
        ),
        "asof_features_forward": (
            f"{_SEQ}, w AS ({_W1_WINDOWS}), "
            "grid AS (SELECT d.doc_id, g.g * 937.0 AS ts_q "
            "FROM (SELECT CAST(doc_id AS VARCHAR) AS doc_id FROM documents) d "
            "CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS g) g) "
            "SELECT grid.doc_id, grid.ts_q, "
            "CAST(COALESCE(w.window_id, -1) AS BIGINT) AS window_id_r, "
            "COALESCE(w.ts_ms, -1.0) AS win_ts_r "
            "FROM grid ASOF LEFT JOIN w "
            "ON grid.doc_id = w.doc_id AND grid.ts_q <= w.ts_ms"
        ),
        "session_enriched": (
            "WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events), "
            "m AS (SELECT *, CASE WHEN lag(t) OVER w IS NULL "
            "OR t - lag(t) OVER w > 1800000000 THEN 1 ELSE 0 END AS new "
            "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)), "
            "s AS (SELECT *, CAST(SUM(new) OVER (PARTITION BY user_id ORDER BY t, event_id "
            "ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id FROM m), "
            "c AS (SELECT user_id, session_id, CAST(COUNT(*) AS BIGINT) AS n_events "
            "FROM s GROUP BY user_id, session_id) "
            "SELECT s.event_id, s.user_id, s.session_id, c.n_events "
            "FROM s JOIN c ON s.user_id = c.user_id AND s.session_id = c.session_id"
        ),
        "top3_per_user": (
            "SELECT event_id, user_id, value, CAST(rnk AS BIGINT) AS rnk FROM ("
            "SELECT event_id, user_id, value, row_number() OVER ("
            "PARTITION BY user_id ORDER BY value DESC, event_id) AS rnk "
            "FROM events) WHERE rnk <= 3"
        ),
        "session_range_join": (
            "WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events), "
            "m AS (SELECT *, CASE WHEN lag(t) OVER w IS NULL "
            "OR t - lag(t) OVER w > 1800000000 THEN 1 ELSE 0 END AS new "
            "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)), "
            "s AS (SELECT *, CAST(SUM(new) OVER (PARTITION BY user_id ORDER BY t, event_id "
            "ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id FROM m), "
            "iv AS (SELECT user_id, session_id, MIN(t) AS t_start, MAX(t) AS t_end "
            "FROM s GROUP BY user_id, session_id) "
            "SELECT e.event_id, e.user_id, e.t AS ts_us, "
            "CAST(iv.session_id AS BIGINT) AS session_id "
            "FROM e JOIN iv ON e.user_id = iv.user_id "
            "AND e.t BETWEEN iv.t_start AND iv.t_end"
        ),
        "term_df_topk": (
            "WITH w AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id, "
            "unnest(string_split(text, ' ')) AS term FROM documents), "
            "tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM w GROUP BY doc_id, term), "
            "dfq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM w GROUP BY term), "
            "top AS (SELECT doc_id, term, tf, row_number() OVER ("
            "PARTITION BY doc_id ORDER BY tf DESC, term) AS rn FROM tf) "
            "SELECT t.doc_id, t.term, CAST(t.tf AS BIGINT) AS tf, "
            "CAST(d.df AS BIGINT) AS df "
            "FROM top t JOIN dfq d ON t.term = d.term WHERE t.rn <= 3"
        ),
        "pack_sequences": (
            "WITH c AS (SELECT doc_id, "
            "len(string_split(COALESCE(text, ''), ' ')) AS cnt FROM documents), "
            "o AS (SELECT doc_id, cnt, CAST(COALESCE(SUM(cnt) OVER ("
            "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING"
            "), 0) AS BIGINT) AS o FROM c), "
            "e AS (SELECT doc_id, cnt, o, "
            "unnest(generate_series(o // 512, (o + cnt - 1) // 512)) AS k FROM o) "
            "SELECT CAST(k AS BIGINT) AS chunk_id, doc_id, "
            "CAST(greatest(0, k * 512 - o) AS BIGINT) AS tok_start, "
            "CAST(least(cnt, (k + 1) * 512 - o) AS BIGINT) AS tok_end, "
            "CAST(greatest(0, o - k * 512) AS BIGINT) AS chunk_off "
            "FROM e"
        ),
        "ngram_jaccard": (
            "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t, "
            "len(string_split(text, ' ')) AS nt FROM documents), "
            "grams AS (SELECT DISTINCT doc_id, "
            "array_to_string(t[i:i+2], ' ') AS gram "
            "FROM (SELECT doc_id, t, unnest(generate_series(1, nt - 2)) AS i "
            "FROM toks WHERE nt >= 3) x), "
            "counts AS (SELECT doc_id, COUNT(*) AS ng FROM grams GROUP BY doc_id), "
            "pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "COUNT(*) AS inter FROM grams a "
            "JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id "
            "GROUP BY 1, 2) "
            "SELECT p.id_a, p.id_b, CAST(p.inter AS BIGINT) AS inter, "
            "CAST(ca.ng + cb.ng - p.inter AS BIGINT) AS uni, "
            "p.inter / (ca.ng + cb.ng - p.inter) AS jaccard "
            "FROM pairs p JOIN counts ca ON p.id_a = ca.doc_id "
            "JOIN counts cb ON p.id_b = cb.doc_id "
            "WHERE p.inter / (ca.ng + cb.ng - p.inter) >= 0.1"
        ),
        "shipping_priority": (
            "SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey, "
            "epoch_us(o_orderdate) AS o_date_us, "
            "SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000.0) "
            "AS BIGINT)) / 10000.0 AS revenue "
            "FROM customer, orders, lineitem "
            "WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey "
            "AND l_orderkey = o_orderkey "
            "AND o_orderdate < TIMESTAMP '1997-03-15' "
            "AND l_shipdate > TIMESTAMP '1997-03-15' "
            "GROUP BY 1, 2 ORDER BY revenue DESC, l_orderkey, o_date_us "
            "LIMIT 10"
        ),
        "revenue_cube": (
            "SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus, "
            "COALESCE(o_orderpriority, 'ALL') AS o_orderpriority, "
            "CAST(COUNT(*) AS BIGINT) AS n_orders, "
            "SUM(CAST(round(o_totalprice * 100.0) AS BIGINT)) / 100.0 "
            "AS revenue FROM orders "
            "GROUP BY CUBE(o_orderstatus, o_orderpriority)"
        ),
        "revenue_rollup": (
            "SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus, "
            "COALESCE(o_orderpriority, 'ALL') AS o_orderpriority, "
            "CAST(COUNT(*) AS BIGINT) AS n_orders, "
            "SUM(CAST(round(o_totalprice * 100.0) AS BIGINT)) / 100.0 "
            "AS revenue FROM orders "
            "GROUP BY ROLLUP(o_orderstatus, o_orderpriority)"
        ),
        "local_supplier_revenue": (
            "SELECT n_name, "
            "SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000.0) "
            "AS BIGINT)) / 10000.0 AS revenue, "
            "CAST(COUNT(*) AS BIGINT) AS n_items "
            "FROM customer, orders, lineitem, supplier, nation, region "
            "WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey "
            "AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
            "AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey "
            "AND r_name = 'ASIA' "
            "AND o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o_orderdate < TIMESTAMP '1997-01-01' "
            "GROUP BY n_name"
        ),
        "prev_same_type_event": (
            "SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us, "
            "CAST(COALESCE(lag(event_id) OVER ("
            "PARTITION BY user_id, event_type ORDER BY ts), -1) AS BIGINT) "
            "AS prev_event_r FROM events"
        ),
        "pct_rank_events": (
            "SELECT event_id, user_id, percent_rank() OVER ("
            "PARTITION BY user_id ORDER BY value DESC, event_id) "
            "AS pct_rank FROM events"
        ),
        "bfill_events": (
            "WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, "
            "CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v "
            "FROM events) "
            "SELECT event_id, user_id, ts_us, "
            "COALESCE(first_value(v IGNORE NULLS) OVER ("
            "PARTITION BY user_id ORDER BY ts_us, event_id "
            "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), -1.0) "
            "AS v_bfill FROM e"
        ),
        "rolling_1h_sum": (
            "SELECT event_id, user_id, epoch_us(ts) AS ts_us, "
            "SUM(CAST(round(value * 10000.0) AS BIGINT)) OVER ("
            "PARTITION BY user_id ORDER BY epoch_us(ts) "
            "RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) / 10000.0 "
            "AS roll_1h FROM events"
        ),
        "loyal_customers": (
            "SELECT CAST(c_custkey AS BIGINT) AS c_custkey FROM ("
            "SELECT DISTINCT o_custkey AS c_custkey FROM orders "
            "WHERE o_orderdate < TIMESTAMP '1996-01-01' "
            "INTERSECT SELECT DISTINCT o_custkey FROM orders "
            "WHERE o_orderdate >= TIMESTAMP '1999-01-01')"
        ),
        "churned_customers": (
            "SELECT CAST(c_custkey AS BIGINT) AS c_custkey FROM ("
            "SELECT DISTINCT o_custkey AS c_custkey FROM orders "
            "WHERE o_orderdate < TIMESTAMP '1996-01-01' "
            "EXCEPT SELECT DISTINCT o_custkey FROM orders "
            "WHERE o_orderdate >= TIMESTAMP '1999-01-01')"
        ),
        "asof_click_within_1h": (
            "WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value "
            "FROM events WHERE event_type = 'purchase'), "
            "c AS (SELECT event_id AS c_event, user_id, epoch_us(ts) AS ts_us "
            "FROM events WHERE event_type = 'click') "
            "SELECT p.event_id, p.user_id, p.ts_us, p.value, "
            "CAST(CASE WHEN c.ts_us IS NOT NULL "
            "AND p.ts_us - c.ts_us <= 3600000000 "
            "THEN c.c_event ELSE -1 END AS BIGINT) AS c_event_r "
            "FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id "
            "AND p.ts_us >= c.ts_us"
        ),
        "hourly_active_users": (
            "SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS hour_us, "
            "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users "
            "FROM events GROUP BY 1"
        ),
        "share_of_user_total": (
            "SELECT event_id, user_id, "
            "CAST(round(value * 10000.0) AS BIGINT) / "
            "SUM(CAST(round(value * 10000.0) AS BIGINT)) OVER ("
            "PARTITION BY user_id) AS share FROM events"
        ),
        "user_type_spend": (
            "SELECT user_id, "
            "COALESCE(SUM(CAST(round(value * 10000.0) AS BIGINT)) "
            "FILTER (event_type = 'click'), 0) / 10000.0 AS spend_click, "
            "COALESCE(SUM(CAST(round(value * 10000.0) AS BIGINT)) "
            "FILTER (event_type = 'error'), 0) / 10000.0 AS spend_error, "
            "COALESCE(SUM(CAST(round(value * 10000.0) AS BIGINT)) "
            "FILTER (event_type = 'purchase'), 0) / 10000.0 AS spend_purchase, "
            "COALESCE(SUM(CAST(round(value * 10000.0) AS BIGINT)) "
            "FILTER (event_type = 'signup'), 0) / 10000.0 AS spend_signup, "
            "COALESCE(SUM(CAST(round(value * 10000.0) AS BIGINT)) "
            "FILTER (event_type = 'view'), 0) / 10000.0 AS spend_view "
            "FROM events GROUP BY user_id"
        ),
        "order_stats_per_status": (
            "SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders, "
            "SUM(CAST(round(o_totalprice * 100.0) AS BIGINT)) / 100.0 AS total_price, "
            "MIN(CAST(round(o_totalprice * 100.0) AS BIGINT)) / 100.0 AS min_price, "
            "MAX(CAST(round(o_totalprice * 100.0) AS BIGINT)) / 100.0 AS max_price "
            "FROM orders GROUP BY o_orderstatus"
        ),
        "latest_event_per_user": (
            "SELECT user_id, event_id, epoch_us(ts) AS ts_us, "
            "event_type, value FROM ("
            "SELECT *, row_number() OVER (PARTITION BY user_id "
            "ORDER BY ts DESC, event_id DESC) AS rn FROM events) "
            "WHERE rn = 1"
        ),
        "user_journey": (
            "SELECT user_id, string_agg(event_type, '>' "
            "ORDER BY ts, event_id) AS journey "
            "FROM events GROUP BY user_id"
        ),
        "p90_value_per_type": (
            "SELECT event_type, "
            "quantile_cont(CAST(round(value * 100.0) AS BIGINT), 0.9) / 100.0 "
            "AS p90_value FROM events GROUP BY event_type"
        ),
        "corr_qty_price": (
            "WITH m AS (SELECT l_returnflag, "
            "CAST(floor(l_quantity) AS BIGINT) AS xs, "
            "CAST(floor(l_extendedprice) AS BIGINT) AS ys FROM lineitem), "
            "s AS (SELECT l_returnflag, COUNT(*) AS n, SUM(xs) AS sx, "
            "SUM(ys) AS sy, SUM(xs*xs) AS sxx, SUM(ys*ys) AS syy, "
            "SUM(xs*ys) AS sxy FROM m GROUP BY 1) "
            "SELECT l_returnflag, CAST(n AS BIGINT) AS n, "
            "(CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) "
            "- CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)) / "
            "(sqrt(CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) "
            "- CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) * "
            "sqrt(CAST(n AS DOUBLE)*CAST(syy AS DOUBLE) "
            "- CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))) AS corr "
            "FROM s"
        ),
        "dense_rank_events": (
            "SELECT event_id, user_id, CAST(dense_rank() OVER ("
            "PARTITION BY user_id ORDER BY value DESC) AS BIGINT) AS drnk "
            "FROM events"
        ),
        "ntile_events": (
            "SELECT event_id, user_id, CAST(ntile(4) OVER ("
            "PARTITION BY user_id ORDER BY value DESC, event_id) AS BIGINT) "
            "AS tile FROM events"
        ),
        "mode_event_type": (
            "WITH c AS (SELECT user_id, event_type, COUNT(*) AS cnt "
            "FROM events WHERE event_type IS NOT NULL "
            "GROUP BY user_id, event_type) "
            "SELECT user_id, event_type AS mode_event_type, "
            "CAST(cnt AS BIGINT) AS mode_cnt FROM ("
            "SELECT *, row_number() OVER (PARTITION BY user_id "
            "ORDER BY cnt DESC, event_type) AS rn FROM c) WHERE rn = 1"
        ),
        "stratified_docs": (
            "SELECT source, CAST(doc_id AS BIGINT) AS doc_id, "
            "CAST(n_chars AS BIGINT) AS n_chars FROM ("
            "SELECT source, doc_id, n_chars, row_number() OVER ("
            "PARTITION BY source ORDER BY hash(CAST(doc_id AS BIGINT)), doc_id) AS rn "
            "FROM documents) WHERE rn <= 3"
        ),
        "similarity_topk": _COSINE_TOPK_SQL,
        # IVF with n_probe == n_centroids is provably exact → same oracle
        # as brute force; the bucketed/pruned machinery is what's checked
        "ivf_topk": _COSINE_TOPK_SQL,
        # flagship + checkpointed runs output w1 32/16 window sums (the
        # encoder / checkpoint layers run in-path; features are pinned by
        # the allclose fixture tests, which SQL cannot express)
        "flagship_features": f"{_SEQ} {_W1_WINDOWS}",
        "checkpointed_extract": f"{_SEQ} {_W1_WINDOWS}",
        # chunked hot-entity as-of: MUST equal the plain as-of join —
        # same oracle as asof_purchase_click (chunking is physical only)
        "asof_chunked_hot": (
            "WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value "
            "FROM events WHERE event_type = 'purchase'), "
            "c AS (SELECT event_id AS c_event, user_id, epoch_us(ts) AS ts_us, "
            "value AS c_value FROM events WHERE event_type = 'click') "
            "SELECT p.event_id, p.user_id, p.ts_us, p.value, "
            "CAST(COALESCE(c.c_event, -1) AS BIGINT) AS c_event_r, "
            "COALESCE(c.c_value, -1.0) AS c_value_r "
            "FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts_us >= c.ts_us"
        ),
        # auto-detected + salted fact⨝dim join: salting is physical
        # only — same oracle as revenue_per_nation
        "salted_join_revenue": (
            "SELECT n.n_name AS n_name, "
            "SUM(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 10000.0) AS BIGINT)) / 10000.0 AS revenue, "
            "CAST(COUNT(*) AS BIGINT) AS n_items "
            "FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey "
            "JOIN nation n ON s.s_nationkey = n.n_nationkey GROUP BY n.n_name"
        ),
        # EWMA: adjusted closed form, per-user first-event anchor (the
        # engine's epoch-anchored recurrence agrees to ~3e-12; both
        # sides hash the 1e-4-rounded int — zero boundary hits at
        # sf0.001/sf0.01, verified empirically)
        "ewma_value": (
            "WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, "
            "value FROM events), "
            "c AS (SELECT user_id, ts_us, AVG(value) AS v FROM e "
            "GROUP BY user_id, ts_us), "
            "t0 AS (SELECT user_id, MIN(ts_us) AS t0 FROM c GROUP BY user_id), "
            "m AS (SELECT c.user_id, c.ts_us, c.v, "
            "pow(2.0, (CAST(c.ts_us AS DOUBLE) - CAST(t0.t0 AS DOUBLE)) "
            "/ 3600000000.0) AS u FROM c JOIN t0 USING (user_id)), "
            "w AS (SELECT user_id, ts_us, "
            "SUM(v * u) OVER win / SUM(u) OVER win AS ewma FROM m "
            "WINDOW win AS (PARTITION BY user_id ORDER BY ts_us "
            "ROWS UNBOUNDED PRECEDING)) "
            "SELECT e.event_id, e.user_id, e.ts_us, "
            "CAST(round(w.ewma * 10000.0) AS BIGINT) AS ewma_r4 "
            "FROM e JOIN w ON e.user_id = w.user_id AND e.ts_us = w.ts_us"
        ),
        # DDSketch p99: the sketch estimate can't be SQL-hashed (libm
        # ulp at a log-bucket edge), so the query hashes the sketch's
        # corpus-curation family (round 4)
        "ngram_repetition": (
            "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t, "
            "len(string_split(text, ' ')) AS nt FROM documents), "
            "i2 AS (SELECT doc_id, t, unnest(generate_series(1, nt - 1)) AS i "
            "FROM toks WHERE nt >= 2), "
            "c2 AS (SELECT doc_id, array_to_string(t[i:i+1], ' ') AS gram, "
            "COUNT(*) AS c FROM i2 GROUP BY 1, 2), "
            "a2 AS (SELECT doc_id, SUM(c) AS n2, MAX(c) AS top2 "
            "FROM c2 GROUP BY 1), "
            "i3 AS (SELECT doc_id, t, unnest(generate_series(1, nt - 2)) AS i "
            "FROM toks WHERE nt >= 3), "
            "g3 AS (SELECT doc_id, array_to_string(t[i:i+2], ' ') AS gram "
            "FROM i3), "
            "a3 AS (SELECT doc_id, COUNT(*) AS n3, COUNT(DISTINCT gram) AS d3 "
            "FROM g3 GROUP BY 1) "
            "SELECT k.doc_id AS doc_id, "
            "CAST(COALESCE(a2.n2, 0) AS BIGINT) AS n2, "
            "CAST(COALESCE(a2.top2, 0) AS BIGINT) AS top2, "
            "CASE WHEN COALESCE(a2.n2, 0) = 0 THEN 0.0 "
            "ELSE CAST(a2.top2 AS DOUBLE) / a2.n2 END AS top2_frac, "
            "CAST(COALESCE(a3.n3, 0) AS BIGINT) AS n3, "
            "CAST(COALESCE(a3.n3 - a3.d3, 0) AS BIGINT) AS dup3, "
            "CASE WHEN COALESCE(a3.n3, 0) = 0 THEN 0.0 "
            "ELSE CAST(a3.n3 - a3.d3 AS DOUBLE) / a3.n3 END AS dup3_frac "
            "FROM toks k LEFT JOIN a2 ON k.doc_id = a2.doc_id "
            "LEFT JOIN a3 ON k.doc_id = a3.doc_id"
        ),
        "contamination": (
            "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t, "
            "len(string_split(text, ' ')) AS nt FROM documents), "
            "grams AS (SELECT DISTINCT doc_id, "
            "array_to_string(t[i:i+2], ' ') AS gram "
            "FROM (SELECT doc_id, t, unnest(generate_series(1, nt - 2)) AS i "
            "FROM toks WHERE nt >= 3) x), "
            "bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 50 = 0), "
            "cnt AS (SELECT g.doc_id AS doc_id, COUNT(*) AS nd, "
            "SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS nh "
            "FROM grams g LEFT JOIN bench b ON g.gram = b.gram "
            "WHERE g.doc_id % 50 <> 0 GROUP BY 1) "
            "SELECT doc_id, CAST(nd AS BIGINT) AS n_grams, "
            "CAST(nh AS BIGINT) AS n_hit, "
            "CAST(nh AS DOUBLE) / nd AS contam_frac, "
            "CAST(CASE WHEN nh * 5 >= nd * 1 THEN 1 ELSE 0 END AS BIGINT) "
            "AS contaminated FROM cnt"
        ),
        "bloom_new_docs": (
            "SELECT doc_id, text FROM documents d WHERE doc_id % 5 <> 0 "
            "AND NOT EXISTS (SELECT 1 FROM documents a "
            "WHERE a.doc_id % 5 = 0 AND a.text = d.text)"
        ),
        "token_budget": (
            "WITH c AS (SELECT doc_id, len(string_split(text, ' ')) AS nw "
            "FROM documents), "
            "tot AS (SELECT SUM(nw) AS T FROM c), "
            "w AS (SELECT doc_id, nw, SUM(nw) OVER ("
            "ORDER BY nw DESC, doc_id) AS cum FROM c) "
            "SELECT w.doc_id AS doc_id, CAST(w.nw AS BIGINT) AS n_words, "
            "CAST(w.cum AS BIGINT) AS cum_words "
            "FROM w, tot WHERE w.cum <= tot.T * 0.5"
        ),
        "mixture_sample": (
            "SELECT doc_id, source FROM documents "
            "WHERE hash(doc_id) % 10000 < "
            "(CAST(substr(source, 4) AS INTEGER) % 4 + 1) * 2500"
        ),
        "pivot_event_counts": (
            "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_total, "
            "CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) "
            "AS n_click, "
            "CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) "
            "AS n_error, "
            "CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) "
            "AS n_purchase, "
            "CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) "
            "AS n_signup, "
            "CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) "
            "AS n_view "
            "FROM events GROUP BY user_id"
        ),
        "curation_pipeline": (
            "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t, "
            "len(string_split(text, ' ')) AS nt FROM documents), "
            "g3 AS (SELECT doc_id, array_to_string(t[i:i+2], ' ') AS gram "
            "FROM (SELECT doc_id, t, unnest(generate_series(1, nt - 2)) AS i "
            "FROM toks WHERE nt >= 3) x), "
            "a3 AS (SELECT doc_id, COUNT(*) AS n3, COUNT(DISTINCT gram) AS d3 "
            "FROM g3 GROUP BY 1), "
            "bench AS (SELECT DISTINCT gram FROM g3 WHERE doc_id % 50 = 0), "
            "dg AS (SELECT DISTINCT doc_id, gram FROM g3 "
            "WHERE doc_id % 50 <> 0), "
            "hit AS (SELECT dg.doc_id AS doc_id, COUNT(*) AS nd, "
            "SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS nh "
            "FROM dg LEFT JOIN bench b ON dg.gram = b.gram GROUP BY 1), "
            "surv AS (SELECT k.doc_id AS doc_id, k.nt AS nw FROM toks k "
            "LEFT JOIN a3 ON k.doc_id = a3.doc_id "
            "LEFT JOIN hit h ON k.doc_id = h.doc_id "
            "WHERE k.doc_id % 50 <> 0 AND k.nt >= 20 "
            "AND COALESCE(a3.n3 - a3.d3, 0) <= COALESCE(a3.n3, 0) * 0.2 "
            "AND (COALESCE(h.nh, 0) * 5 < COALESCE(h.nd, 0) * 1 "
            "OR COALESCE(h.nd, 0) = 0)), "
            "tot AS (SELECT SUM(nw) AS T FROM surv), "
            "w AS (SELECT doc_id, nw, "
            "SUM(nw) OVER (ORDER BY nw DESC, doc_id) AS cum FROM surv) "
            "SELECT w.doc_id AS doc_id, CAST(w.nw AS BIGINT) AS n_words, "
            "CAST(w.cum AS BIGINT) AS cum_words "
            "FROM w, tot WHERE w.cum <= tot.T * 0.5"
        ),
        "chunk_dedup": (
            "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t "
            "FROM documents), "
            "ch AS (SELECT doc_id, i AS cidx, "
            "array_to_string(t[(i*8+1):(i*8+8)], ' ') AS chunk "
            "FROM (SELECT doc_id, t, "
            "unnest(generate_series(0, CAST(ceil(len(t)/8.0) AS BIGINT)-1)) "
            "AS i FROM toks WHERE len(t) > 0) x), "
            "win AS (SELECT chunk, MIN(doc_id * 1048576 + cidx) AS wkey "
            "FROM ch GROUP BY 1), "
            "kept AS (SELECT c.doc_id, c.cidx, c.chunk FROM ch c "
            "JOIN win w ON c.chunk = w.chunk "
            "AND c.doc_id * 1048576 + c.cidx = w.wkey) "
            "SELECT doc_id, string_agg(chunk, ' ' ORDER BY cidx) AS text, "
            "CAST(COUNT(*) AS BIGINT) AS n_kept "
            "FROM kept GROUP BY doc_id"
        ),
        "oov_rate": (
            "WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) "
            "AS w FROM documents), "
            "tf AS (SELECT w, COUNT(*) AS c FROM toks GROUP BY 1), "
            "vocab AS (SELECT w FROM tf ORDER BY c DESC, w LIMIT 20), "
            "per AS (SELECT t.doc_id AS doc_id, COUNT(*) AS n_words, "
            "SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS n_oov "
            "FROM toks t LEFT JOIN vocab v ON t.w = v.w GROUP BY 1) "
            "SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, "
            "CAST(n_oov AS BIGINT) AS n_oov, "
            "CAST(n_oov AS DOUBLE) / n_words AS oov_rate FROM per"
        ),
        "balanced_docs": (
            "WITH c AS (SELECT lang, COUNT(*) AS n FROM documents "
            "GROUP BY 1), "
            "m AS (SELECT MIN(n) AS k FROM c), "
            "r AS (SELECT lang, doc_id, row_number() OVER ("
            "PARTITION BY lang "
            "ORDER BY hash(CAST(doc_id AS BIGINT)), doc_id) AS rn "
            "FROM documents) "
            "SELECT lang, CAST(doc_id AS BIGINT) AS doc_id "
            "FROM r, m WHERE rn <= m.k"
        ),
        "chunk_dedup_local": (
            "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t "
            "FROM documents), "
            "ch AS (SELECT doc_id, i AS cidx, "
            "array_to_string(t[(i*8+1):(i*8+8)], ' ') AS chunk "
            "FROM (SELECT doc_id, t, "
            "unnest(generate_series(0, CAST(ceil(len(t)/8.0) AS BIGINT)-1)) "
            "AS i FROM toks WHERE len(t) > 0) x), "
            "k AS (SELECT doc_id, cidx, chunk, row_number() OVER ("
            "PARTITION BY doc_id, chunk ORDER BY cidx) AS rn FROM ch) "
            "SELECT doc_id, string_agg(chunk, ' ' ORDER BY cidx) AS text, "
            "CAST(COUNT(*) AS BIGINT) AS n_kept "
            "FROM k WHERE rn = 1 GROUP BY doc_id"
        ),
        "temperature_sample": (
            "WITH c AS (SELECT lang, COUNT(*) AS n FROM documents "
            "GROUP BY 1), "
            "k AS (SELECT lang, "
            "LEAST(n, CAST(ceil(pow(n, 0.5) * 4.0) AS BIGINT)) AS k "
            "FROM c), "
            "r AS (SELECT lang, doc_id, row_number() OVER ("
            "PARTITION BY lang "
            "ORDER BY hash(CAST(doc_id AS BIGINT)), doc_id) AS rn "
            "FROM documents) "
            "SELECT r.lang, CAST(r.doc_id AS BIGINT) AS doc_id "
            "FROM r JOIN k USING(lang) WHERE rn <= k.k"
        ),
        "ngram_novelty": (
            "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t, "
            "len(string_split(text, ' ')) AS nt FROM documents), "
            "g3 AS (SELECT DISTINCT doc_id, "
            "array_to_string(t[i:i+2], ' ') AS gram "
            "FROM (SELECT doc_id, t, unnest(generate_series(1, nt - 2)) "
            "AS i FROM toks WHERE nt >= 3) x), "
            "f AS (SELECT gram, MIN(doc_id) AS owner FROM g3 GROUP BY 1) "
            "SELECT g.doc_id AS doc_id, "
            "CAST(COUNT(*) AS BIGINT) AS n_grams, "
            "CAST(SUM(CASE WHEN f.owner = g.doc_id THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_novel, "
            "CAST(SUM(CASE WHEN f.owner = g.doc_id THEN 1 ELSE 0 END) "
            "AS DOUBLE) / COUNT(*) AS novelty "
            "FROM g3 g JOIN f USING(gram) GROUP BY 1"
        ),
        "funnel_stages": (
            "WITH s AS (SELECT user_id, MIN(ts) AS t1 FROM events "
            "WHERE event_type = 'signup' GROUP BY 1), "
            "c AS (SELECT e.user_id AS user_id, MIN(e.ts) AS t2 "
            "FROM events e JOIN s USING(user_id) "
            "WHERE e.event_type = 'click' AND e.ts > s.t1 GROUP BY 1), "
            "p AS (SELECT e.user_id AS user_id, MIN(e.ts) AS t3 "
            "FROM events e JOIN c USING(user_id) "
            "WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1) "
            "SELECT s.user_id AS user_id, "
            "CAST(1 + (c.user_id IS NOT NULL)::INT "
            "+ (p.user_id IS NOT NULL)::INT AS BIGINT) AS funnel_stage, "
            "s.t1 AS signup_ts, c.t2 AS click_ts, p.t3 AS purchase_ts "
            "FROM s LEFT JOIN c ON s.user_id = c.user_id "
            "LEFT JOIN p ON s.user_id = p.user_id"
        ),
        "throttle_events": (
            "WITH l AS (SELECT event_id, user_id, event_type, ts, "
            "lag(ts) OVER (PARTITION BY user_id, event_type "
            "ORDER BY ts, event_id) AS pts FROM events) "
            "SELECT event_id, user_id, event_type, ts FROM l "
            "WHERE pts IS NULL OR epoch_us(ts) - epoch_us(pts) > 3600000000"
        ),
        "cohort_retention": (
            "WITH f AS (SELECT user_id, MIN(date_trunc('day', ts)) "
            "AS cohort FROM events GROUP BY 1), "
            "a AS (SELECT DISTINCT f.cohort AS cohort, "
            "datediff('day', f.cohort, date_trunc('day', e.ts)) "
            "AS offset_days, e.user_id AS user_id "
            "FROM events e JOIN f USING(user_id)) "
            "SELECT CAST(datediff('day', TIMESTAMP '1970-01-01', cohort) "
            "AS BIGINT) AS cohort_day, "
            "CAST(offset_days AS BIGINT) AS offset_days, "
            "CAST(COUNT(*) AS BIGINT) AS n_users "
            "FROM a GROUP BY 1, 2"
        ),
        # GUARANTEE — exact interpolated p99 + within_alpha assertion
        "p99_price_sketch": (
            "SELECT o_orderstatus, "
            "quantile_cont(CAST(round(o_totalprice * 100.0) AS BIGINT), 0.99) "
            "/ 100.0 AS p99_exact, TRUE AS within_alpha "
            "FROM orders GROUP BY o_orderstatus"
        ),
        # same guarantee-flag scheme for the global DDSketch quantiles
        # (exact interpolated quantile on the cents grid is bit-stable)
        "approx_quantiles_price": (
            "SELECT 0.5 AS q, "
            "quantile_cont(CAST(round(o_totalprice * 100.0) AS BIGINT), 0.5)"
            " / 100.0 AS exact_q, TRUE AS within_alpha FROM orders "
            "UNION ALL SELECT 0.9, "
            "quantile_cont(CAST(round(o_totalprice * 100.0) AS BIGINT), 0.9)"
            " / 100.0, TRUE FROM orders "
            "UNION ALL SELECT 0.99, "
            "quantile_cont(CAST(round(o_totalprice * 100.0) AS BIGINT), 0.99)"
            " / 100.0, TRUE FROM orders"
        ),
        # HLL distinct: exact COUNT(DISTINCT) + the 3-sigma rel-error flag
        "approx_distinct_users": (
            "SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS "
            "exact_distinct, TRUE AS within_rel FROM events"
        ),
        # feature-engineering family — every finish expression mirrors
        # the Ray float64 op order over identical exact integer sums
        "stddev_value_per_type": (
            "WITH e AS (SELECT event_type, "
            "CAST(round(value*100.0) AS BIGINT) AS xs FROM events), "
            "s AS (SELECT event_type, COUNT(*) AS n, SUM(xs) AS sx, "
            "SUM(xs*xs) AS sxx FROM e GROUP BY event_type) "
            "SELECT event_type, CAST(n AS BIGINT) AS n, "
            "((CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) "
            "- CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) "
            "/ (CAST(n AS DOUBLE)*(CAST(n AS DOUBLE)-1.0))) / 1e4 "
            "AS var_value, "
            "sqrt((CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) "
            "- CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) "
            "/ (CAST(n AS DOUBLE)*(CAST(n AS DOUBLE)-1.0))) / 1e2 "
            "AS stddev_value FROM s"
        ),
        "zscore_value": (
            "WITH e AS (SELECT event_id, event_type, "
            "CAST(round(value*100.0) AS BIGINT) AS xs FROM events), "
            "s AS (SELECT event_type, COUNT(*) AS n, SUM(xs) AS sx, "
            "SUM(xs*xs) AS sxx FROM e GROUP BY event_type) "
            "SELECT e.event_id, e.event_type, COALESCE("
            "(CAST(e.xs AS DOUBLE) - CAST(s.sx AS DOUBLE)/CAST(s.n AS DOUBLE)) "
            "/ sqrt((CAST(s.n AS DOUBLE)*CAST(s.sxx AS DOUBLE) "
            "- CAST(s.sx AS DOUBLE)*CAST(s.sx AS DOUBLE)) "
            "/ (CAST(s.n AS DOUBLE)*(CAST(s.n AS DOUBLE)-1.0))), -999.0) AS z "
            "FROM e JOIN s USING (event_type)"
        ),
        "minmax_value": (
            "WITH e AS (SELECT event_id, user_id, "
            "CAST(round(value*100.0) AS BIGINT) AS xs FROM events), "
            "s AS (SELECT user_id, MIN(xs) AS lo, MAX(xs) AS hi "
            "FROM e GROUP BY user_id) "
            "SELECT e.event_id, e.user_id, COALESCE("
            "(CAST(e.xs AS DOUBLE) - CAST(s.lo AS DOUBLE)) "
            "/ (CAST(s.hi AS DOUBLE) - CAST(s.lo AS DOUBLE)), -1.0) AS mm "
            "FROM e JOIN s USING (user_id)"
        ),
        "target_encode_type": (
            "WITH e AS (SELECT event_id, event_type, "
            "CAST(round(value*100.0) AS BIGINT) AS xs FROM events), "
            "s AS (SELECT event_type, COUNT(*) AS n, SUM(xs) AS sx "
            "FROM e GROUP BY event_type) "
            "SELECT e.event_id, e.event_type, COALESCE("
            "(CAST(s.sx AS DOUBLE)/CAST(s.n AS DOUBLE)) / 100.0, -1.0) AS te "
            "FROM e JOIN s USING (event_type)"
        ),
        "lang_onehot_per_source": (
            "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            + ", ".join(
                f"CAST(SUM(CASE WHEN lang = '{c}' THEN 1 ELSE 0 END) "
                f"AS BIGINT) AS n_{c}"
                for c in ("de", "en", "es", "fr", "zh"))
            + " FROM documents GROUP BY source"
        ),
        "value_histogram": (
            "WITH e AS (SELECT CAST(round(value*100.0) AS BIGINT) AS xs "
            "FROM events) "
            "SELECT CAST(floor(CAST(xs AS DOUBLE) / 250.0) AS BIGINT) AS bin, "
            "CAST(COUNT(*) AS BIGINT) AS n_rows FROM e GROUP BY 1"
        ),
        "multi_lag_value": (
            "SELECT event_id, user_id, epoch_us(ts) AS ts_us, value, "
            "COALESCE(lag(value, 1) OVER w, -1.0) AS lag_1, "
            "COALESCE(lag(value, 2) OVER w, -1.0) AS lag_2, "
            "COALESCE(lag(value, 3) OVER w, -1.0) AS lag_3, "
            "COALESCE(lead(value, 1) OVER w, -1.0) AS lead_1 "
            "FROM events WINDOW w AS ("
            "PARTITION BY user_id ORDER BY epoch_us(ts), event_id)"
        ),
        "cume_dist_events": (
            "SELECT event_id, user_id, cume_dist() OVER ("
            "PARTITION BY user_id ORDER BY value, event_id) "
            "AS cume_dist FROM events"
        ),
        "price_qty_regression": (
            "WITH e AS (SELECT l_returnflag, "
            "CAST(floor(l_quantity) AS BIGINT) AS xs, "
            "CAST(floor(l_extendedprice) AS BIGINT) AS ys FROM lineitem), "
            "s AS (SELECT l_returnflag, COUNT(*) AS n, SUM(xs) AS sx, "
            "SUM(ys) AS sy, SUM(xs*xs) AS sxx, SUM(xs*ys) AS sxy "
            "FROM e GROUP BY l_returnflag) "
            "SELECT l_returnflag, CAST(n AS BIGINT) AS n, "
            "(CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) "
            "- CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)) "
            "/ (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) "
            "- CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) AS slope, "
            "(CAST(sy AS DOUBLE) - ((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) "
            "- CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)) "
            "/ (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) "
            "- CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))) * CAST(sx AS DOUBLE)) "
            "/ CAST(n AS DOUBLE) AS intercept FROM s"
        ),
        "daily_order_vs_ship": (
            "WITH o AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day, "
            "COUNT(*) AS n_orders FROM orders GROUP BY 1), "
            "l AS (SELECT epoch_us(l_shipdate) // 86400000000 AS day, "
            "SUM(CAST(floor(l_quantity) AS BIGINT)) AS qty "
            "FROM lineitem GROUP BY 1) "
            "SELECT day, CAST(COALESCE(o.n_orders, -1) AS BIGINT) AS n_orders, "
            "CAST(COALESCE(l.qty, -1) AS BIGINT) AS ship_qty "
            "FROM o FULL OUTER JOIN l USING (day)"
        ),
        "robust_value_per_type": (
            "WITH e AS (SELECT event_id, event_type, "
            "CAST(round(value*100.0) AS BIGINT) AS xs FROM events), "
            "s AS (SELECT event_type, "
            "quantile_cont(xs, 0.25) AS p25, "
            "quantile_cont(xs, 0.50) AS med, "
            "quantile_cont(xs, 0.75) AS p75 FROM e GROUP BY event_type) "
            "SELECT e.event_id, e.event_type, COALESCE("
            "(CAST(e.xs AS DOUBLE) - s.med) / (s.p75 - s.p25), -999.0) "
            "AS rs FROM e JOIN s USING (event_type)"
        ),
        "count_encode_type": (
            "WITH s AS (SELECT event_type, COUNT(*) AS n "
            "FROM events GROUP BY event_type) "
            "SELECT e.event_id, e.event_type, CAST(s.n AS BIGINT) AS ce "
            "FROM events e JOIN s USING (event_type)"
        ),
        "lang_source_cross": (
            "SELECT lang || '|' || source AS lang_source, "
            "CAST(COUNT(*) AS BIGINT) AS n_docs "
            "FROM documents GROUP BY 1"
        ),
        "lineitem_unpivot": (
            "SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, "
            "'l_quantity' AS measure, l_quantity AS value FROM lineitem "
            "UNION ALL SELECT l_orderkey, CAST(l_linenumber AS BIGINT), "
            "'l_extendedprice', l_extendedprice FROM lineitem "
            "UNION ALL SELECT l_orderkey, CAST(l_linenumber AS BIGINT), "
            "'l_discount', l_discount FROM lineitem "
            "UNION ALL SELECT l_orderkey, CAST(l_linenumber AS BIGINT), "
            "'l_tax', l_tax FROM lineitem"
        ),
        "quantile_bin_value": (
            "WITH e AS (SELECT event_id, "
            "CAST(round(value*100.0) AS BIGINT) AS xs FROM events), "
            "s AS (SELECT quantile_cont(xs, 0.25) AS b1, "
            "quantile_cont(xs, 0.50) AS b2, "
            "quantile_cont(xs, 0.75) AS b3 FROM e) "
            "SELECT e.event_id, CAST("
            "(CASE WHEN CAST(e.xs AS DOUBLE) >= s.b1 THEN 1 ELSE 0 END) + "
            "(CASE WHEN CAST(e.xs AS DOUBLE) >= s.b2 THEN 1 ELSE 0 END) + "
            "(CASE WHEN CAST(e.xs AS DOUBLE) >= s.b3 THEN 1 ELSE 0 END) "
            "AS BIGINT) AS qbin FROM e, s"
        ),
        "train_test_split": (
            "SELECT event_id, user_id, "
            "CASE WHEN hash(user_id) % 10000 < 9000 THEN 'train' "
            "WHEN hash(user_id) % 10000 < 9500 THEN 'val' "
            "ELSE 'test' END AS split FROM events"
        ),
        "winsorized_value": (
            "WITH e AS (SELECT event_id, event_type, "
            "CAST(round(value*100.0) AS BIGINT) AS xs FROM events), "
            "s AS (SELECT event_type, "
            "quantile_cont(xs, 0.05) AS lo, "
            "quantile_cont(xs, 0.95) AS hi FROM e GROUP BY event_type) "
            "SELECT e.event_id, e.event_type, "
            "least(greatest(CAST(e.xs AS DOUBLE), s.lo), s.hi) / 100.0 AS w "
            "FROM e JOIN s USING (event_type)"
        ),
        "ordered_te_value": (
            "WITH e AS (SELECT event_id, event_type, epoch_us(ts) AS ts_us, "
            "CAST(round(value*100.0) AS BIGINT) AS xs FROM events) "
            "SELECT event_id, event_type, COALESCE("
            "(CAST(SUM(xs) OVER w AS DOUBLE) "
            "/ CAST(COUNT(*) OVER w AS DOUBLE)) / 100.0, -1.0) AS ote "
            "FROM e WINDOW w AS (PARTITION BY event_type "
            "ORDER BY ts_us, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
        ),
        "running_peak_value": (
            "SELECT event_id, user_id, epoch_us(ts) AS ts_us, "
            "MAX(value) OVER w AS vmax, MIN(value) OVER w AS vmin "
            "FROM events WINDOW w AS (PARTITION BY user_id "
            "ORDER BY epoch_us(ts), event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        ),
        "impute_value": (
            "WITH e AS (SELECT event_id, event_type, "
            "CASE WHEN event_id % 7 = 0 THEN NULL "
            "ELSE CAST(round(value*100.0) AS BIGINT) END AS xs FROM events), "
            "s AS (SELECT event_type, SUM(xs) AS sx, COUNT(xs) AS n "
            "FROM e GROUP BY event_type) "
            "SELECT e.event_id, e.event_type, "
            "COALESCE(CAST(e.xs AS DOUBLE), "
            "CAST(s.sx AS DOUBLE)/CAST(s.n AS DOUBLE)) / 100.0 AS v_filled "
            "FROM e JOIN s USING (event_type)"
        ),
        "ordinal_encode_type": (
            "WITH v AS (SELECT event_type, "
            "CAST(row_number() OVER (ORDER BY event_type) - 1 AS BIGINT) "
            "AS oe FROM (SELECT DISTINCT event_type FROM events)) "
            "SELECT e.event_id, e.event_type, v.oe "
            "FROM events e JOIN v USING (event_type)"
        ),
        "rolling_1h_stats": (
            "WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, "
            "CAST(round(value*100.0) AS BIGINT) AS xs FROM events) "
            "SELECT event_id, user_id, ts_us, "
            "(CAST(SUM(xs) OVER w AS DOUBLE) "
            "/ CAST(COUNT(*) OVER w AS DOUBLE)) / 100.0 AS roll_mean_v, "
            "COALESCE(sqrt((CAST(COUNT(*) OVER w AS DOUBLE)"
            "*CAST(SUM(xs*xs) OVER w AS DOUBLE) "
            "- CAST(SUM(xs) OVER w AS DOUBLE)*CAST(SUM(xs) OVER w AS DOUBLE))"
            " / (CAST(COUNT(*) OVER w AS DOUBLE)"
            "*(CAST(COUNT(*) OVER w AS DOUBLE)-1.0))) / 100.0, -1.0) "
            "AS roll_std_v "
            "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us "
            "RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)"
        ),
        "feature_store_events": (
            "WITH e AS (SELECT event_id, user_id, event_type, "
            "epoch_us(ts) AS ts_us, value, "
            "CAST(round(value*100.0) AS BIGINT) AS xs FROM events), "
            "s AS (SELECT event_type, COUNT(*) AS n, SUM(xs) AS sx, "
            "SUM(xs*xs) AS sxx FROM e GROUP BY event_type) "
            "SELECT e.event_id, e.user_id, e.ts_us, e.value, "
            "COALESCE(lag(e.value, 1) OVER wo, -1.0) AS lag_1, "
            "COALESCE(lag(e.value, 2) OVER wo, -1.0) AS lag_2, "
            "COALESCE(lead(e.value, 1) OVER wo, -1.0) AS lead_1, "
            "COALESCE(CAST(e.ts_us - lag(e.ts_us) OVER wo AS DOUBLE), -1.0) "
            "AS dt_prev, "
            "MAX(e.value) OVER wc AS vmax, MIN(e.value) OVER wc AS vmin, "
            "(CAST(SUM(e.xs) OVER wr AS DOUBLE) "
            "/ CAST(COUNT(*) OVER wr AS DOUBLE)) / 100.0 AS roll_mean_v, "
            "COALESCE(sqrt((CAST(COUNT(*) OVER wr AS DOUBLE)"
            "*CAST(SUM(e.xs*e.xs) OVER wr AS DOUBLE) "
            "- CAST(SUM(e.xs) OVER wr AS DOUBLE)"
            "*CAST(SUM(e.xs) OVER wr AS DOUBLE)) "
            "/ (CAST(COUNT(*) OVER wr AS DOUBLE)"
            "*(CAST(COUNT(*) OVER wr AS DOUBLE)-1.0))) / 100.0, -1.0) "
            "AS roll_std_v, "
            "COALESCE((CAST(e.xs AS DOUBLE) "
            "- CAST(s.sx AS DOUBLE)/CAST(s.n AS DOUBLE)) "
            "/ sqrt((CAST(s.n AS DOUBLE)*CAST(s.sxx AS DOUBLE) "
            "- CAST(s.sx AS DOUBLE)*CAST(s.sx AS DOUBLE)) "
            "/ (CAST(s.n AS DOUBLE)*(CAST(s.n AS DOUBLE)-1.0))), -999.0) "
            "AS z, "
            "CASE WHEN hash(e.user_id) % 10000 < 9000 THEN 'train' "
            "WHEN hash(e.user_id) % 10000 < 9500 THEN 'val' "
            "ELSE 'test' END AS split "
            "FROM e JOIN s USING (event_type) "
            "WINDOW wo AS (PARTITION BY e.user_id ORDER BY e.ts_us, e.event_id), "
            "wc AS (PARTITION BY e.user_id ORDER BY e.ts_us, e.event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), "
            "wr AS (PARTITION BY e.user_id ORDER BY e.ts_us "
            "RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)"
        ),
        "skew_kurt_per_type": (
            "WITH e AS (SELECT event_type, "
            "CAST(floor(value) AS BIGINT) AS xs FROM events), "
            "s AS (SELECT event_type, COUNT(*) AS n, SUM(xs) AS s1, "
            "SUM(xs*xs) AS s2, SUM(xs*xs*xs) AS s3, "
            "SUM(xs*xs*xs*xs) AS s4 FROM e GROUP BY event_type), "
            "t AS (SELECT event_type, CAST(n AS BIGINT) AS n, "
            "CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE) AS m, "
            "CAST(s2 AS DOUBLE)/CAST(n AS DOUBLE) AS r2, "
            "CAST(s3 AS DOUBLE)/CAST(n AS DOUBLE) AS r3, "
            "CAST(s4 AS DOUBLE)/CAST(n AS DOUBLE) AS r4 FROM s), "
            "u AS (SELECT event_type, n, m, r2 - m*m AS m2, "
            "r3 - 3.0*m*r2 + 2.0*m*m*m AS m3, "
            "r4 - 4.0*m*r3 + 6.0*m*m*r2 - 3.0*m*m*m*m AS m4 FROM t) "
            "SELECT event_type, n, "
            "COALESCE(CASE WHEN m2 > 0 THEN m3/(sqrt(m2)*m2) END, -999.0) "
            "AS skew, "
            "COALESCE(CASE WHEN m2 > 0 THEN m4/(m2*m2) - 3.0 END, -999.0) "
            "AS kurt FROM u"
        ),
        "value_percentile": (
            "WITH e AS (SELECT event_id, "
            "CAST(round(value*100.0) AS BIGINT) AS xs FROM events) "
            "SELECT event_id, cume_dist() OVER (ORDER BY xs) AS pctl FROM e"
        ),
        "profile_events": (
            "SELECT 'event_id' AS column, CAST(COUNT(*) AS BIGINT) AS n_rows, "
            "CAST(COUNT(*) - COUNT(event_id) AS BIGINT) AS n_nulls, "
            "CAST(MIN(event_id) AS DOUBLE) AS min_v, "
            "CAST(MAX(event_id) AS DOUBLE) AS max_v FROM events "
            "UNION ALL SELECT 'user_id', CAST(COUNT(*) AS BIGINT), "
            "CAST(COUNT(*) - COUNT(user_id) AS BIGINT), "
            "CAST(MIN(user_id) AS DOUBLE), CAST(MAX(user_id) AS DOUBLE) "
            "FROM events "
            "UNION ALL SELECT 'value', CAST(COUNT(*) AS BIGINT), "
            "CAST(COUNT(*) - COUNT(value) AS BIGINT), "
            "MIN(value), MAX(value) FROM events"
        ),
        "kfold_users": (
            "SELECT event_id, user_id, "
            "CAST((hash(user_id) % 10000) % 5 AS BIGINT) AS fold FROM events"
        ),
        # PII scrub: DuckDB regexp_* run the same RE2 engine as the
        # pyarrow kernels, and the patterns are imported verbatim from
        # stages/pii.py — counts and redacted text are bit-identical.
        "redact_pii": f"""WITH aug AS ({_PII_AUG})
            SELECT doc_id,
            CAST(length(regexp_extract_all(text, '{_PII_E}')) AS BIGINT) AS n_email,
            CAST(length(regexp_extract_all(text, '{_PII_I}')) AS BIGINT) AS n_ipv4,
            CAST(length(regexp_extract_all(text, '{_PII_P}')) AS BIGINT) AS n_phone,
            regexp_replace(regexp_replace(regexp_replace(text,
                '{_PII_E}', '<EMAIL>', 'g'),
                '{_PII_I}', '<IP>', 'g'),
                '{_PII_P}', '<PHONE>', 'g') AS text_redacted
            FROM aug""",
        "pii_per_source": f"""WITH aug AS ({_PII_AUG}),
            c AS (SELECT source,
              CAST(length(regexp_extract_all(text, '{_PII_E}')) AS BIGINT) AS n_email,
              CAST(length(regexp_extract_all(text, '{_PII_I}')) AS BIGINT) AS n_ipv4,
              CAST(length(regexp_extract_all(text, '{_PII_P}')) AS BIGINT) AS n_phone
              FROM aug)
            SELECT source, CAST(SUM(n_email) AS BIGINT) AS sum_n_email,
            CAST(SUM(n_ipv4) AS BIGINT) AS sum_n_ipv4,
            CAST(SUM(n_phone) AS BIGINT) AS sum_n_phone,
            CAST(SUM(CASE WHEN n_email + n_ipv4 + n_phone > 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS sum_pii_docs,
            CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM c GROUP BY source""",
        # count-weighted bigram familiarity: integer fields exact; the
        # familiarity ratio is ONE division of exact ints on both sides
        "lm_familiarity": (
            "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t, "
            "len(string_split(text, ' ')) AS nt FROM documents), "
            "b AS (SELECT doc_id, array_to_string(t[i:i+1], ' ') AS gram "
            "FROM (SELECT doc_id, t, unnest(generate_series(1, nt - 1)) "
            "AS i FROM toks WHERE nt >= 2) x), "
            "g AS (SELECT gram, COUNT(*) AS c FROM b GROUP BY 1) "
            "SELECT b.doc_id AS doc_id, "
            "CAST(COUNT(*) AS BIGINT) AS n_grams, "
            "CAST(SUM(g.c) AS BIGINT) AS sum_count, "
            "CAST(SUM(CASE WHEN g.c = 1 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_hapax, "
            "CAST(SUM(g.c) AS DOUBLE) / COUNT(*) AS familiarity "
            "FROM b JOIN g USING(gram) GROUP BY b.doc_id"
        ),
        # hash % 2^53 keeps the priority inside double's exact-integer
        # range, so the numpy and DuckDB priorities are bit-identical
        "weighted_sample_docs": (
            "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
            "CAST(n_chars AS BIGINT) AS n_chars FROM documents "
            "WHERE n_chars > 0 "
            "ORDER BY CAST(hash(doc_id) % 9007199254740992 AS DOUBLE) "
            "/ n_chars, doc_id LIMIT 20"
        ),
        "orders_per_customer_dist": (
            "SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM ("
            "SELECT c.c_custkey, CAST(COUNT(o.o_custkey) AS BIGINT) "
            "AS c_count FROM customer c LEFT JOIN orders o "
            "ON c.c_custkey = o.o_custkey GROUP BY c.c_custkey) "
            "GROUP BY c_count"
        ),
        "large_orders": (
            "WITH s AS (SELECT l_orderkey AS orderkey, "
            "SUM(l_quantity) AS sq FROM lineitem GROUP BY 1 "
            "HAVING SUM(l_quantity) > 250) "
            "SELECT o.o_orderkey AS orderkey, o.o_custkey, c.c_name, "
            "o.o_totalprice, CAST(round(s.sq) AS BIGINT) AS sum_qty "
            "FROM orders o JOIN s ON o.o_orderkey = s.orderkey "
            "JOIN customer c ON o.o_custkey = c.c_custkey "
            "ORDER BY o.o_totalprice DESC, orderkey LIMIT 100"
        ),
        "rolling_median_value": (
            "SELECT event_id, user_id, epoch_us(ts) AS ts_us, "
            "median(CAST(round(value * 100.0) AS BIGINT)) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) / 100.0 "
            "AS roll5_median FROM events"
        ),
        # Markov transitions: exact int counts; p is ONE division of
        # exact int64s on both sides (n / per-from total)
        "event_transitions": (
            "WITH s AS (SELECT event_type, lead(event_type) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id) AS nxt "
            "FROM events) "
            "SELECT event_type AS from_type, nxt AS to_type, "
            "CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER ("
            "PARTITION BY event_type) AS p "
            "FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2"
        ),
        # snapshot diff: md5-equality in the engine == text equality
        # here (same contract as exact_dedup's md5 oracle)
        "corpus_diff": (
            "WITH old AS (SELECT doc_id, text FROM documents "
            "WHERE doc_id % 10 != 7), "
            "new AS (SELECT doc_id, CASE WHEN doc_id % 6 = 0 "
            "THEN text || ' v2' ELSE text END AS text FROM documents "
            "WHERE doc_id % 10 != 4) "
            "SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id, "
            "CASE WHEN o.doc_id IS NULL THEN 'added' "
            "WHEN n.doc_id IS NULL THEN 'removed' "
            "WHEN o.text = n.text THEN 'unchanged' "
            "ELSE 'changed' END AS status "
            "FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id"
        ),
        # MAD: engine works on the doubled cent grid (2*median always
        # integral) so both medians are the pinned quantile_cont walk
        "mad_value_per_type": (
            "WITH v AS (SELECT event_type, "
            "CAST(round(value * 100.0) AS BIGINT) AS vc FROM events), "
            "m AS (SELECT event_type, quantile_cont(vc, 0.5) AS med "
            "FROM v GROUP BY 1) "
            "SELECT v.event_type, m.med / 100.0 AS median_value, "
            "quantile_cont(abs(v.vc - m.med), 0.5) / 100.0 AS mad_value "
            "FROM v JOIN m USING(event_type) GROUP BY v.event_type, m.med"
        ),
        # Welch t-test: exact int moments; the float expression tree is
        # mirrored token-for-token with the engine's driver combine
        "ab_test_value": (
            "WITH m AS (SELECT event_type, hash(user_id) % 2 AS cohort, "
            "CAST(COUNT(*) AS DOUBLE) AS n, "
            "CAST(SUM(CAST(round(value * 100.0) AS BIGINT)) AS DOUBLE) AS s, "
            "CAST(SUM(CAST(round(value * 100.0) AS BIGINT) * "
            "CAST(round(value * 100.0) AS BIGINT)) AS DOUBLE) AS ss "
            "FROM events GROUP BY 1, 2), "
            "a AS (SELECT * FROM m WHERE cohort = 0), "
            "b AS (SELECT * FROM m WHERE cohort = 1) "
            "SELECT a.event_type, "
            "CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b, "
            "(a.s / a.n) / 100.0 AS mean_a, (b.s / b.n) / 100.0 AS mean_b, "
            "((a.s / a.n) - (b.s / b.n)) / sqrt("
            "((a.ss - a.s * a.s / a.n) / (a.n - 1.0)) / a.n + "
            "((b.ss - b.s * b.s / b.n) / (b.n - 1.0)) / b.n) AS t_stat "
            "FROM a JOIN b USING(event_type)"
        ),
        # chi-square cells: full cross product incl. zero-observed
        # cells; per-cell contributions avoid an order-dependent sum
        "lang_source_independence": (
            "WITH c AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) "
            "AS n FROM documents GROUP BY 1, 2), "
            "x AS (SELECT l.lang, s.source, COALESCE(c.n, 0) AS n "
            "FROM (SELECT DISTINCT lang FROM c) l "
            "CROSS JOIN (SELECT DISTINCT source FROM c) s "
            "LEFT JOIN c USING(lang, source)), "
            "m AS (SELECT *, CAST(SUM(n) OVER (PARTITION BY lang) "
            "AS DOUBLE) AS rn, CAST(SUM(n) OVER (PARTITION BY source) "
            "AS DOUBLE) AS sn, CAST(SUM(n) OVER () AS DOUBLE) AS tn "
            "FROM x) "
            "SELECT lang, source, n, rn * sn / tn AS expected, "
            "(CAST(n AS DOUBLE) - rn * sn / tn) * "
            "(CAST(n AS DOUBLE) - rn * sn / tn) / (rn * sn / tn) "
            "AS contrib FROM m"
        ),
        # gaps-and-islands: day − row_number island key, max run
        "longest_streak": (
            "WITH d AS (SELECT DISTINCT user_id, "
            "epoch_us(ts) // 86400000000 AS day FROM events), "
            "g AS (SELECT user_id, day, day - row_number() OVER ("
            "PARTITION BY user_id ORDER BY day) AS isl FROM d), "
            "r AS (SELECT user_id, isl, COUNT(*) AS run FROM g "
            "GROUP BY 1, 2) "
            "SELECT user_id, CAST(MAX(run) AS BIGINT) AS longest_streak "
            "FROM r GROUP BY user_id"
        ),
        # RFM: exact ints everywhere except monetary's single /100
        "rfm_segments": (
            "WITH u AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS "
            "frequency, CAST(SUM(CAST(round(value * 100.0) AS BIGINT)) "
            "AS BIGINT) AS monetary_c, "
            "MAX(epoch_us(ts) // 86400000000) AS last_day "
            "FROM events GROUP BY 1), "
            "g AS (SELECT MAX(last_day) AS gday FROM u), "
            "q AS (SELECT quantile_disc(monetary_c, 0.2) AS q20, "
            "quantile_disc(monetary_c, 0.4) AS q40, "
            "quantile_disc(monetary_c, 0.6) AS q60, "
            "quantile_disc(monetary_c, 0.8) AS q80 FROM u) "
            "SELECT u.user_id, CAST(g.gday - u.last_day AS BIGINT) AS "
            "recency_days, u.frequency, u.monetary_c / 100.0 AS monetary, "
            "CAST(1 + CAST(u.monetary_c > q.q20 AS INT) + "
            "CAST(u.monetary_c > q.q40 AS INT) + "
            "CAST(u.monetary_c > q.q60 AS INT) + "
            "CAST(u.monetary_c > q.q80 AS INT) AS BIGINT) AS m_code "
            "FROM u, g, q"
        ),
        # TPC-H Q7 shape: cross-nation shipping volume by year
        "volume_shipping": (
            "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
            "CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year, "
            "SUM(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) "
            "* 10000.0) AS BIGINT)) / 10000.0 AS revenue "
            "FROM lineitem l "
            "JOIN orders o ON l.l_orderkey = o.o_orderkey "
            "JOIN customer c ON o.o_custkey = c.c_custkey "
            "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
            "JOIN nation n1 ON s.s_nationkey = n1.n_nationkey "
            "JOIN nation n2 ON c.c_nationkey = n2.n_nationkey "
            "WHERE s.s_nationkey <> c.c_nationkey "
            "AND l.l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l.l_shipdate < TIMESTAMP '1998-01-01' "
            "GROUP BY 1, 2, 3"
        ),
        # TPC-H Q10 shape: top-20 customers by returned-item revenue
        "returned_top20": (
            "SELECT c.c_custkey, c.c_name, "
            "SUM(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) "
            "* 10000.0) AS BIGINT)) / 10000.0 AS revenue, "
            "c.c_acctbal, n.n_name "
            "FROM lineitem l "
            "JOIN orders o ON l.l_orderkey = o.o_orderkey "
            "JOIN customer c ON o.o_custkey = c.c_custkey "
            "JOIN nation n ON c.c_nationkey = n.n_nationkey "
            "WHERE l.l_returnflag = 'R' "
            "AND o.o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o.o_orderdate < TIMESTAMP '1996-04-01' "
            "GROUP BY 1, 2, 4, 5 "
            "ORDER BY revenue DESC, c.c_custkey LIMIT 20"
        ),
        # TPC-H Q14 shape: promo revenue share per ship-month of 1996
        "promo_revenue": (
            "WITH j AS (SELECT CAST(EXTRACT(month FROM l.l_shipdate) "
            "AS BIGINT) AS l_month, "
            "CAST(round(l.l_extendedprice * (1.0 - l.l_discount) "
            "* 10000.0) AS BIGINT) AS rev_s, "
            "CASE WHEN p.p_type = 'PROMO' THEN 1 ELSE 0 END AS promo "
            "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
            "WHERE l.l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l.l_shipdate < TIMESTAMP '1997-01-01') "
            "SELECT l_month, SUM(promo * rev_s) / 10000.0 AS promo_revenue, "
            "SUM(rev_s) / 10000.0 AS total_revenue, "
            "100.0 * CAST(SUM(promo * rev_s) AS DOUBLE) / "
            "CAST(SUM(rev_s) AS DOUBLE) AS promo_share "
            "FROM j GROUP BY 1"
        ),
        # TPC-H Q19 shape: disjunctive brand/size/qty predicate revenue
        "disjunctive_revenue": (
            "SELECT SUM(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) "
            "* 10000.0) AS BIGINT)) / 10000.0 AS revenue "
            "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
            "WHERE (p.p_brand = 'Brand#1' AND p.p_size <= 5 "
            "AND l.l_quantity BETWEEN 1 AND 11) "
            "OR (p.p_brand = 'Brand#2' AND p.p_size <= 10 "
            "AND l.l_quantity BETWEEN 10 AND 20) "
            "OR (p.p_brand = 'Brand#3' AND p.p_size <= 15 "
            "AND l.l_quantity BETWEEN 20 AND 30)"
        ),
        # TPC-H Q4 shape: orders with any lineitem shipped >90d late
        "late_order_priority": (
            "SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_late "
            "FROM orders o WHERE EXISTS (SELECT 1 FROM lineitem l "
            "WHERE l.l_orderkey = o.o_orderkey "
            "AND epoch_us(l.l_shipdate) > epoch_us(o.o_orderdate) "
            "+ 7776000000000) "
            "GROUP BY 1"
        ),
        # TPC-H Q8 shape: target-nation market share by order year
        "market_share": (
            "WITH j AS (SELECT CAST(EXTRACT(year FROM o.o_orderdate) "
            "AS BIGINT) AS o_year, "
            "CAST(round(l.l_extendedprice * (1.0 - l.l_discount) "
            "* 10000.0) AS BIGINT) AS rev_s, "
            "CASE WHEN s.s_nationkey = 3 THEN 1 ELSE 0 END AS tgt "
            "FROM lineitem l "
            "JOIN orders o ON l.l_orderkey = o.o_orderkey "
            "JOIN customer c ON o.o_custkey = c.c_custkey "
            "JOIN nation n ON c.c_nationkey = n.n_nationkey "
            "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
            "JOIN part p ON l.l_partkey = p.p_partkey "
            "WHERE n.n_regionkey = 0 AND p.p_type = 'ECONOMY' "
            "AND o.o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o.o_orderdate < TIMESTAMP '1998-01-01') "
            "SELECT o_year, SUM(tgt * rev_s) / 10000.0 AS nation_revenue, "
            "SUM(rev_s) / 10000.0 AS total_revenue, "
            "CAST(SUM(tgt * rev_s) AS DOUBLE) / CAST(SUM(rev_s) AS DOUBLE) "
            "AS mkt_share FROM j GROUP BY 1"
        ),
        # TPC-H Q9 shape: PROMO revenue by supplier nation x ship year
        "profit_by_nation_year": (
            "SELECT n.n_name, CAST(EXTRACT(year FROM l.l_shipdate) "
            "AS BIGINT) AS l_year, "
            "SUM(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) "
            "* 10000.0) AS BIGINT)) / 10000.0 AS revenue "
            "FROM lineitem l "
            "JOIN part p ON l.l_partkey = p.p_partkey "
            "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
            "JOIN nation n ON s.s_nationkey = n.n_nationkey "
            "WHERE p.p_type = 'PROMO' GROUP BY 1, 2"
        ),
        # TPC-H Q15 shape: max-revenue supplier(s) of 1996Q1
        "top_supplier": (
            "WITH r AS (SELECT l_suppkey, "
            "SUM(CAST(round(l_extendedprice * (1.0 - l_discount) "
            "* 10000.0) AS BIGINT)) AS rev_s FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY 1) "
            "SELECT s.s_suppkey, s.s_name, r.rev_s / 10000.0 AS "
            "total_revenue FROM r JOIN supplier s "
            "ON r.l_suppkey = s.s_suppkey "
            "WHERE r.rev_s = (SELECT MAX(rev_s) FROM r)"
        ),
        # TPC-H Q17 shape: small-quantity (qty < 0.2*avg per part)
        # revenue for two brands; 5*qty*n < sum_qty keeps it exact-int
        "small_qty_revenue": (
            "WITH li AS (SELECT l_partkey, CAST(l_quantity AS BIGINT) AS "
            "qty, CAST(round(l_extendedprice * 100.0) AS BIGINT) AS "
            "price_c FROM lineitem), "
            "pt AS (SELECT p_partkey, p_brand FROM part "
            "WHERE p_brand IN ('Brand#1', 'Brand#2')), "
            "st AS (SELECT l_partkey, SUM(qty) AS sq, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM li "
            "JOIN pt ON li.l_partkey = pt.p_partkey GROUP BY 1) "
            "SELECT pt.p_brand, SUM(li.price_c) / 700.0 AS avg_yearly "
            "FROM li JOIN pt ON li.l_partkey = pt.p_partkey "
            "JOIN st ON li.l_partkey = st.l_partkey "
            "WHERE 5 * li.qty * st.n < st.sq GROUP BY 1"
        ),
        # TPC-H Q22 shape: above-avg-balance customers with no orders,
        # per nation; bal*n > sum keeps the avg comparison exact-int
        "idle_rich_customers": (
            "WITH b AS (SELECT c_custkey, c_nationkey, "
            "CAST(round(c_acctbal * 100.0) AS BIGINT) AS bal_c "
            "FROM customer), "
            "a AS (SELECT SUM(bal_c) AS s, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM b WHERE bal_c > 0), "
            "r AS (SELECT b.* FROM b, a WHERE b.bal_c * a.n > a.s "
            "AND NOT EXISTS (SELECT 1 FROM orders o "
            "WHERE o.o_custkey = b.c_custkey)) "
            "SELECT n.n_name, CAST(COUNT(*) AS BIGINT) AS n_cust, "
            "SUM(r.bal_c) / 100.0 AS total_acctbal "
            "FROM r JOIN nation n ON r.c_nationkey = n.n_nationkey "
            "GROUP BY 1"
        ),
        # Benford: leading digit of the cent-exact integer total
        "benford_totalprice": (
            "WITH d AS (SELECT CAST(substr(CAST(abs(CAST(round("
            "o_totalprice * 100.0) AS BIGINT)) AS VARCHAR), 1, 1) "
            "AS BIGINT) AS digit FROM orders) "
            "SELECT digit, CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM d) AS share "
            "FROM d GROUP BY 1"
        ),
        # Gini over per-user cent spend; Σi·x exact in BIGINT
        "gini_user_spend": (
            "WITH u AS (SELECT user_id, SUM(CAST(round(value * 100.0) "
            "AS BIGINT)) AS x FROM events GROUP BY 1), "
            "r AS (SELECT x, row_number() OVER (ORDER BY x) AS i FROM u) "
            "SELECT CAST(COUNT(*) AS BIGINT) AS n_users, "
            "(2.0 * SUM(i * x) - (COUNT(*) + 1.0) * SUM(x)) / "
            "(CAST(COUNT(*) AS DOUBLE) * SUM(x)) AS gini FROM r"
        ),
        # per-cell entropy contributions (no order-dependent sum)
        "source_lang_entropy": (
            "WITH c AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) "
            "AS n FROM documents GROUP BY 1, 2), "
            "m AS (SELECT *, CAST(SUM(n) OVER (PARTITION BY source) "
            "AS DOUBLE) AS sn FROM c) "
            "SELECT source, lang, n, CAST(n AS DOUBLE) / sn AS p, "
            "round(-(CAST(n AS DOUBLE) / sn) * ln(CAST(n AS DOUBLE) / sn)"
            ", 12) AS contrib FROM m"
        ),
        # lag-1 Pearson autocorrelation from exact int pair moments
        "autocorr_value_lag1": (
            "WITH v AS (SELECT event_type, event_id, ts, "
            "CAST(round(value * 100.0) AS BIGINT) AS v FROM events), "
            "p AS (SELECT event_type, lag(v) OVER (PARTITION BY "
            "event_type ORDER BY ts, event_id) AS x, v AS y FROM v), "
            "m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, "
            "SUM(x) AS sx, SUM(y) AS sy, SUM(x * x) AS sxx, "
            "SUM(y * y) AS syy, SUM(x * y) AS sxy FROM p "
            "WHERE x IS NOT NULL GROUP BY 1) "
            "SELECT event_type, n AS n_pairs, "
            "(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / "
            "(sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) * "
            "sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)) "
            "AS corr_lag1 FROM m"
        ),
        # exact result; the engine prunes the shuffle with a CMS
        "heavy_hitters": (
            "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM events "
            "GROUP BY 1 HAVING COUNT(*) >= 70"
        ),
        # per-user inter-arrival gap moments (whole seconds, exact)
        "interarrival_stats": (
            "WITH p AS (SELECT user_id, (epoch_us(ts) - lag(epoch_us(ts))"
            " OVER (PARTITION BY user_id ORDER BY ts, event_id)) "
            "// 1000000 AS gap FROM events), "
            "m AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps, "
            "CAST(SUM(gap) AS BIGINT) AS sum_gap_s, "
            "CAST(SUM(gap * gap) AS BIGINT) AS sum_gap2_s FROM p "
            "WHERE gap IS NOT NULL GROUP BY 1) "
            "SELECT user_id, n_gaps, sum_gap_s, sum_gap2_s, "
            "CAST(sum_gap_s AS DOUBLE) / CAST(n_gaps AS DOUBLE) "
            "AS mean_gap_s FROM m"
        ),
        # left-constant step integral: value holds until next event
        "time_weighted_value": (
            "WITH e AS (SELECT user_id, epoch_us(ts) AS t, "
            "CAST(round(value * 100.0) AS BIGINT) AS v, event_id "
            "FROM events), "
            "p AS (SELECT user_id, v, (lead(t) OVER (PARTITION BY "
            "user_id ORDER BY t, event_id) - t) // 1000000 AS gap "
            "FROM e), "
            "m AS (SELECT user_id, CAST(SUM(gap) AS BIGINT) AS t_sum, "
            "CAST(SUM(v * gap) AS BIGINT) AS w_sum FROM p "
            "WHERE gap IS NOT NULL GROUP BY 1) "
            "SELECT user_id, t_sum, w_sum, (CAST(w_sum AS DOUBLE) / "
            "CAST(t_sum AS DOUBLE)) / 100.0 AS twa FROM m "
            "WHERE t_sum > 0"
        ),
        # TPC-H Q6 shape: discount-window revenue, scaled-int filter
        "discount_revenue": (
            "SELECT COALESCE(SUM(CAST(round(l_extendedprice * l_discount "
            "* 10000.0) AS BIGINT)), 0) / 10000.0 AS revenue "
            "FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1997-01-01' "
            "AND CAST(round(l_discount * 100.0) AS BIGINT) BETWEEN 5 AND 7 "
            "AND l_quantity < 24"
        ),
        # TPC-H Q2 shape: cheapest region-0 supplier per size-25 part
        "cheapest_supplier": (
            "WITH li AS (SELECT l.l_partkey AS partkey, "
            "l.l_suppkey AS suppkey, "
            "CAST(round(l.l_extendedprice * 100.0) AS BIGINT) AS price_c "
            "FROM lineitem l "
            "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
            "JOIN nation n ON s.s_nationkey = n.n_nationkey "
            "JOIN part p ON l.l_partkey = p.p_partkey "
            "WHERE n.n_regionkey = 0 AND p.p_size = 25), "
            "m AS (SELECT partkey, MIN(price_c) AS min_c FROM li "
            "GROUP BY 1), "
            "w AS (SELECT li.partkey, MIN(li.suppkey) AS suppkey, m.min_c "
            "FROM li JOIN m ON li.partkey = m.partkey "
            "AND li.price_c = m.min_c GROUP BY 1, 3) "
            "SELECT w.partkey AS p_partkey, w.suppkey AS s_suppkey, "
            "s.s_name, w.min_c / 100.0 AS min_price "
            "FROM w JOIN supplier s ON w.suppkey = s.s_suppkey"
        ),
        # TPC-H Q11 shape: parts with revenue > 1.5x the mean part
        # revenue (scale-free exact-int cut: 2*s*n > 3*total)
        "important_parts": (
            "WITH r AS (SELECT l_partkey AS p_partkey, "
            "SUM(CAST(round(l_extendedprice * (1.0 - l_discount) "
            "* 10000.0) AS BIGINT)) AS s FROM lineitem GROUP BY 1) "
            "SELECT p_partkey, s / 10000.0 AS value FROM r "
            "WHERE 2 * s * (SELECT COUNT(*) FROM r) "
            "> 3 * (SELECT SUM(s) FROM r)"
        ),
        # TPC-H Q12 shape: urgent-vs-other counts of >60d-late lines
        "late_ship_priority": (
            "SELECT l.l_linestatus, "
            "CAST(SUM(CASE WHEN o.o_orderpriority IN "
            "('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) "
            "AS high_n, "
            "CAST(SUM(CASE WHEN o.o_orderpriority IN "
            "('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) "
            "AS low_n "
            "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
            "WHERE epoch_us(l.l_shipdate) > epoch_us(o.o_orderdate) "
            "+ 5184000000000 GROUP BY 1"
        ),
        # TPC-H Q16 shape: distinct suppliers per (brand, size)
        "supplier_part_counts": (
            "SELECT p.p_brand, CAST(p.p_size AS BIGINT) AS p_size, "
            "CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt "
            "FROM lineitem l "
            "JOIN part p ON l.l_partkey = p.p_partkey "
            "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
            "WHERE p.p_brand <> 'Brand#1' AND s.s_acctbal >= 1000.0 "
            "GROUP BY 1, 2"
        ),
        # TPC-H Q20 shape: suppliers with >50% of a large-part's 1997
        # volume (2*pair > part keeps the share test exact-int)
        "dominant_suppliers": (
            "WITH li AS (SELECT l.l_partkey AS partkey, "
            "l.l_suppkey AS suppkey, CAST(l.l_quantity AS BIGINT) AS qty "
            "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
            "WHERE p.p_name LIKE 'large%' "
            "AND l.l_shipdate >= TIMESTAMP '1997-01-01' "
            "AND l.l_shipdate < TIMESTAMP '1998-01-01'), "
            "pair AS (SELECT partkey, suppkey, SUM(qty) AS q FROM li "
            "GROUP BY 1, 2), "
            "tot AS (SELECT partkey, SUM(qty) AS q FROM li GROUP BY 1) "
            "SELECT DISTINCT s.s_suppkey, s.s_name "
            "FROM pair JOIN tot ON pair.partkey = tot.partkey "
            "JOIN supplier s ON pair.suppkey = s.s_suppkey "
            "WHERE 2 * pair.q > tot.q"
        ),
        # TPC-H Q21 shape: sole-latest shipper of multi-supplier orders
        "waiting_suppliers": (
            "WITH pairs AS (SELECT l_orderkey, l_suppkey, "
            "MAX(epoch_us(l_shipdate)) AS mx FROM lineitem GROUP BY 1, 2), "
            "o AS (SELECT l_orderkey, MAX(mx) AS omx, "
            "CAST(COUNT(*) AS BIGINT) AS ns FROM pairs GROUP BY 1), "
            "a AS (SELECT p.l_orderkey, MIN(p.l_suppkey) AS only_s, "
            "CAST(COUNT(*) AS BIGINT) AS natmax, MIN(o.ns) AS ns "
            "FROM pairs p JOIN o ON p.l_orderkey = o.l_orderkey "
            "WHERE p.mx = o.omx GROUP BY 1) "
            "SELECT s.s_suppkey, s.s_name, "
            "CAST(COUNT(*) AS BIGINT) AS numwait "
            "FROM a JOIN supplier s ON a.only_s = s.s_suppkey "
            "WHERE a.natmax = 1 AND a.ns >= 2 GROUP BY 1, 2"
        ),
        # metadata-filtered ANN: top-10 cosine among label-1 vectors
        "filtered_topk": (
            "WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe "
            "FROM embeddings WHERE vec_id = 0), "
            "sims AS (SELECT e.vec_id, "
            "list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe) "
            "AS sim FROM embeddings e, q WHERE e.label = 1) "
            "SELECT CAST(vec_id AS BIGINT) AS vec_id, "
            "CAST(rank AS BIGINT) AS rank "
            "FROM (SELECT vec_id, row_number() OVER "
            "(ORDER BY sim DESC, vec_id) AS rank FROM sims) "
            "WHERE rank <= 10"
        ),
        # incremental refresh == full recompute (algebraic merge proof)
        "incremental_agg": (
            "SELECT event_type, "
            "SUM(CAST(round(value * 10000.0) AS BIGINT)) / 10000.0 "
            "AS total, CAST(COUNT(*) AS BIGINT) AS n, "
            "MAX(CAST(round(value * 10000.0) AS BIGINT)) / 10000.0 "
            "AS max_value FROM events GROUP BY 1"
        ),
        # per-user NTILE(4) quartile bucket, total order via event_id
        "ntile_value": (
            "SELECT event_id, user_id, CAST(NTILE(4) OVER ("
            "PARTITION BY user_id ORDER BY value, event_id) AS BIGINT) "
            "AS tile FROM events"
        ),
        # per-user ordered event-type path
        "user_event_paths": (
            "SELECT user_id, string_agg(event_type, ',' "
            "ORDER BY ts, event_id) AS path FROM events GROUP BY user_id"
        ),
        # unordered event-type pair → distinct-user support counts
        "type_cooccurrence": (
            "WITH d AS (SELECT DISTINCT user_id, event_type FROM events) "
            "SELECT a.event_type AS type_a, b.event_type AS type_b, "
            "CAST(COUNT(*) AS BIGINT) AS n_users "
            "FROM d a JOIN d b ON a.user_id = b.user_id "
            "AND a.event_type < b.event_type GROUP BY 1, 2"
        ),
        # pairwise distinct-term Jaccard between sources
        "source_jaccard": (
            "WITH w AS (SELECT DISTINCT source, "
            "unnest(string_split(COALESCE(text, ''), ' ')) AS term "
            "FROM documents), "
            "sz AS (SELECT source, COUNT(*) AS n FROM w GROUP BY 1), "
            "i AS (SELECT a.source AS source_a, b.source AS source_b, "
            "COUNT(*) AS n_inter FROM w a JOIN w b ON a.term = b.term "
            "AND a.source < b.source GROUP BY 1, 2) "
            "SELECT i.source_a, i.source_b, "
            "CAST(i.n_inter AS BIGINT) AS n_inter, "
            "CAST(sa.n + sb.n - i.n_inter AS BIGINT) AS n_union, "
            "CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter) "
            "AS jaccard "
            "FROM i JOIN sz sa ON i.source_a = sa.source "
            "JOIN sz sb ON i.source_b = sb.source"
        ),
        # per-source top-3 terms by document frequency
        "source_top_terms": (
            "WITH w AS (SELECT DISTINCT source, doc_id, "
            "unnest(string_split(COALESCE(text, ''), ' ')) AS term "
            "FROM documents), "
            "dfq AS (SELECT source, term, COUNT(*) AS df "
            "FROM w GROUP BY 1, 2), "
            "r AS (SELECT source, term, df, row_number() OVER ("
            "PARTITION BY source ORDER BY df DESC, term) AS rn FROM dfq) "
            "SELECT source, term, CAST(df AS BIGINT) AS df "
            "FROM r WHERE rn <= 3"
        ),
        # audience growth: first-seen day per user → running sum
        "cumulative_new_users": (
            "WITH f AS (SELECT user_id, "
            "MIN(epoch_us(ts) // 86400000000) AS day "
            "FROM events GROUP BY 1), "
            "c AS (SELECT day, COUNT(*) AS new_users FROM f GROUP BY 1) "
            "SELECT day, CAST(new_users AS BIGINT) AS new_users, "
            "CAST(SUM(new_users) OVER (ORDER BY day) AS BIGINT) "
            "AS cum_users FROM c"
        ),
        # global top-20 word bigrams (ties by bigram asc)
        "bigram_topk": (
            "WITH s AS (SELECT string_split(COALESCE(text, ''), ' ') AS l "
            "FROM documents), "
            "x AS (SELECT l, unnest(range(1, len(l))) AS i FROM s), "
            "b AS (SELECT l[i] || ' ' || l[i+1] AS bigram FROM x), "
            "c AS (SELECT bigram, COUNT(*) AS n FROM b GROUP BY 1), "
            "r AS (SELECT bigram, n, row_number() OVER ("
            "ORDER BY n DESC, bigram) AS rn FROM c) "
            "SELECT bigram, CAST(n AS BIGINT) AS n FROM r WHERE rn <= 20"
        ),
        # top-20 part pairs co-ordered (ties by part keys asc)
        "copurchase_pairs": (
            "WITH d AS (SELECT DISTINCT l_orderkey, l_partkey "
            "FROM lineitem), "
            "p AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, "
            "COUNT(*) AS n FROM d a JOIN d b ON "
            "a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey "
            "GROUP BY 1, 2), "
            "r AS (SELECT part_a, part_b, n, row_number() OVER ("
            "ORDER BY n DESC, part_a, part_b) AS rn FROM p) "
            "SELECT CAST(part_a AS BIGINT) AS part_a, "
            "CAST(part_b AS BIGINT) AS part_b, "
            "CAST(n AS BIGINT) AS n_orders FROM r WHERE rn <= 20"
        ),
        # power-law engagement histogram
        "events_per_user_hist": (
            "WITH c AS (SELECT user_id, COUNT(*) AS n FROM events "
            "GROUP BY 1) "
            "SELECT n AS events_per_user, "
            "CAST(COUNT(*) AS BIGINT) AS n_users FROM c GROUP BY 1"
        ),
        # per-source hapax-legomena vocabulary share
        "hapax_ratio": (
            "WITH w AS (SELECT DISTINCT source, doc_id, "
            "unnest(string_split(COALESCE(text, ''), ' ')) AS term "
            "FROM documents), "
            "dfq AS (SELECT source, term, COUNT(*) AS df "
            "FROM w GROUP BY 1, 2) "
            "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_terms, "
            "CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_hapax, "
            "CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE) "
            "/ COUNT(*) AS hapax_ratio FROM dfq GROUP BY source"
        ),
        # diurnal average-value heat-map per event type
        "hourly_profile": (
            "SELECT event_type, "
            "(epoch_us(ts) // 3600000000) % 24 AS hour, "
            "CAST(COUNT(*) AS BIGINT) AS n, "
            "SUM(CAST(round(value * 10000.0) AS BIGINT)) "
            "/ (COUNT(*) * 10000.0) AS avg_value "
            "FROM events GROUP BY 1, 2"
        ),
        # exact median order→ship delay per priority
        "ship_delay_median": (
            "SELECT o_orderpriority AS priority, "
            "CAST(quantile_disc((epoch_us(l_shipdate) "
            "- epoch_us(o_orderdate)) // 86400000000, 0.5) AS BIGINT) "
            "AS median_delay_days FROM orders "
            "JOIN lineitem ON o_orderkey = l_orderkey GROUP BY 1"
        ),
        # corpus-global NTILE(10) of per-user total spend
        "spend_decile": (
            "WITH t AS (SELECT user_id, "
            "SUM(CAST(round(value * 10000.0) AS BIGINT)) AS total_s "
            "FROM events GROUP BY 1) "
            "SELECT user_id, total_s / 10000.0 AS total, "
            "CAST(NTILE(10) OVER (ORDER BY total_s, user_id) AS BIGINT) "
            "AS decile FROM t"
        ),
        # deterministic 10-per-source sample (Knuth multiplicative hash)
        "stratified_sample": (
            "WITH r AS (SELECT source, doc_id, row_number() OVER ("
            "PARTITION BY source ORDER BY "
            "(doc_id * 2654435761) % 4294967296, doc_id) AS rn "
            "FROM documents) "
            "SELECT source, doc_id FROM r WHERE rn <= 10"
        ),
        # distinct active users per 6-hour tumbling window
        "distinct_users_6h": (
            "SELECT epoch_us(ts) // 21600000000 AS win, "
            "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users "
            "FROM events GROUP BY 1"
        ),
        # docs sharing a 64-char text prefix (boilerplate groups)
        "prefix_dup_groups": (
            "WITH p AS (SELECT substr(COALESCE(text, ''), 1, 64) "
            "AS prefix FROM documents) "
            "SELECT prefix, CAST(COUNT(*) AS BIGINT) AS n_docs "
            "FROM p GROUP BY 1 HAVING COUNT(*) > 1"
        ),
        # per-user modal event type (grouped argmax, ties by type asc)
        "per_user_top_type": (
            "WITH c AS (SELECT user_id, event_type, COUNT(*) AS n "
            "FROM events GROUP BY 1, 2), "
            "r AS (SELECT user_id, event_type, n, row_number() OVER ("
            "PARTITION BY user_id ORDER BY n DESC, event_type) AS rn "
            "FROM c) "
            "SELECT user_id, event_type AS top_type, "
            "CAST(n AS BIGINT) AS n FROM r WHERE rn = 1"
        ),
        # sessionize → span → corpus-global duration deciles
        "session_duration_decile": (
            "WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS t "
            "FROM events), "
            "m AS (SELECT *, CASE WHEN lag(t) OVER w IS NULL "
            "OR t - lag(t) OVER w > 1800000000 THEN 1 ELSE 0 END AS new "
            "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)), "
            "lab AS (SELECT user_id, t, SUM(new) OVER ("
            "PARTITION BY user_id ORDER BY t, event_id "
            "ROWS UNBOUNDED PRECEDING) - 1 AS session_id FROM m), "
            "s AS (SELECT user_id, session_id, "
            "MAX(t) - MIN(t) AS duration_us FROM lab GROUP BY 1, 2) "
            "SELECT user_id, CAST(session_id AS BIGINT) AS session_id, "
            "CAST(duration_us AS BIGINT) AS duration_us, "
            "CAST(NTILE(10) OVER (ORDER BY duration_us, "
            "user_id * 1000000 + session_id) AS BIGINT) AS decile FROM s"
        ),
        # JSON k extraction → per-type stats (RE2-replayable regex)
        "props_k_stats": (
            "WITH x AS (SELECT event_type, COALESCE(TRY_CAST("
            "regexp_extract(COALESCE(props, ''), '\"k\": (\\d+)', 1) "
            "AS BIGINT), -1) AS k FROM events) "
            "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(k) AS BIGINT) AS sum_k, "
            "CAST(MAX(k) AS BIGINT) AS max_k, "
            "CAST(SUM(k) AS DOUBLE) / COUNT(*) AS avg_k "
            "FROM x GROUP BY 1"
        ),
        # running distinct-type breadth per user
        "cum_distinct_types": (
            "WITH e AS (SELECT event_id, user_id, event_type, "
            "epoch_us(ts) AS t FROM events), "
            "f AS (SELECT event_id, user_id, t, CASE WHEN row_number() "
            "OVER (PARTITION BY user_id, event_type ORDER BY t, event_id) "
            "= 1 THEN 1 ELSE 0 END AS first FROM e) "
            "SELECT event_id, user_id, CAST(SUM(first) OVER ("
            "PARTITION BY user_id ORDER BY t, event_id "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_types_seen FROM f"
        ),
        # month-over-month revenue (cent-exact, -1 sentinel first month)
        "monthly_revenue_growth": (
            "WITH m AS (SELECT year(o_orderdate) * 12 "
            "+ (month(o_orderdate) - 1) AS month_id, "
            "SUM(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS c "
            "FROM orders GROUP BY 1) "
            "SELECT month_id, c / 100.0 AS revenue, "
            "COALESCE(lag(c) OVER (ORDER BY month_id), -1) / 100.0 "
            "AS prev_revenue, "
            "(c - COALESCE(lag(c) OVER (ORDER BY month_id), c)) / 100.0 "
            "AS delta FROM m"
        ),
        # per-source exact-duplicate pressure
        "dup_rate_by_source": (
            "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(COUNT(DISTINCT text) AS BIGINT) AS n_unique, "
            "CAST(COUNT(*) - COUNT(DISTINCT text) AS DOUBLE) / COUNT(*) "
            "AS dup_rate FROM documents GROUP BY 1"
        ),
        # zone-map pruned 3-day range read == raw-table recompute
        "zonemap_prune": (
            "WITH x AS (SELECT epoch_us(ts) // 86400000000 AS day, "
            "CAST(round(value * 10000.0) AS BIGINT) AS v_s FROM events "
            "WHERE epoch_us(ts) >= 19727 * 86400000000 "
            "AND epoch_us(ts) < 19730 * 86400000000) "
            "SELECT day, CAST(COUNT(*) AS BIGINT) AS n, "
            "SUM(v_s) / 10000.0 AS total FROM x GROUP BY 1"
        ),
        # duplicated 40-char spans across distinct docs (ExactSubstr-k)
        "dup_span_stats": (
            "WITH g0 AS (SELECT doc_id, source, text, "
            "unnest(generate_series(1, length(text) - 39)) AS i "
            "FROM documents WHERE length(text) >= 40), "
            "g AS (SELECT doc_id, source, "
            "substr(text, CAST(i AS INT), 40) AS gram FROM g0), "
            "d AS (SELECT gram FROM (SELECT DISTINCT doc_id, gram FROM g) "
            "GROUP BY gram HAVING COUNT(*) >= 2) "
            "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_positions, "
            "CAST(SUM(CASE WHEN gram IN (SELECT gram FROM d) "
            "THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_positions, "
            "CAST(SUM(CASE WHEN gram IN (SELECT gram FROM d) "
            "THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS dup_frac "
            "FROM g GROUP BY source"
        ),
        # exact all-pairs bag-of-words cosine, top-20
        "cosine_pairs": (
            "WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) "
            "AS term FROM documents), "
            "tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf "
            "FROM w GROUP BY 1, 2), "
            "nrm AS (SELECT doc_id, SUM(tf * tf) AS na FROM tf GROUP BY 1), "
            "d AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
            "SUM(a.tf * b.tf) AS dot FROM tf a JOIN tf b "
            "ON a.term = b.term AND a.doc_id < b.doc_id GROUP BY 1, 2) "
            "SELECT doc_a, doc_b, CAST(dot AS BIGINT) AS dot, "
            "CAST(dot AS DOUBLE) / sqrt(CAST(x.na * y.na AS DOUBLE)) AS cos "
            "FROM d JOIN nrm x ON doc_a = x.doc_id "
            "JOIN nrm y ON doc_b = y.doc_id WHERE dot > 0 "
            "ORDER BY cos DESC, doc_a, doc_b LIMIT 20"
        ),
        # triangles of the part co-purchase graph (support >= 2 orders)
        "triangle_count": (
            "WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), "
            "pp AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb "
            "FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey "
            "AND a.l_partkey < b.l_partkey), "
            "e AS (SELECT pa, pb FROM pp GROUP BY pa, pb "
            "HAVING COUNT(*) >= 2), "
            "t AS (SELECT COUNT(*) AS n_tri FROM e e1 "
            "JOIN e e2 ON e2.pa = e1.pa AND e2.pb > e1.pb "
            "JOIN e e3 ON e3.pa = e1.pb AND e3.pb = e2.pb) "
            "SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM "
            "(SELECT pa AS v FROM e UNION SELECT pb FROM e)) AS n_nodes, "
            "(SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges, "
            "CAST(n_tri AS BIGINT) AS n_triangles FROM t"
        ),
        # deterministic 16-shard pseudo-shuffle export (Knuth hash)
        "shuffle_shards": (
            "SELECT ((doc_id * 2654435761) % 4294967296) % 16 AS shard, "
            "CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id, "
            "CAST(SUM(n_chars) AS BIGINT) AS sum_chars "
            "FROM documents GROUP BY 1"
        ),
        # calendar-spine densification incl. zero-order days
        "daily_spine_orders": (
            "WITH o AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day, "
            "CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents "
            "FROM orders), "
            "b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM o), "
            "s AS (SELECT unnest(generate_series(d0, d1)) AS day FROM b), "
            "a AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS n_orders, "
            "SUM(cents) AS c FROM o GROUP BY 1) "
            "SELECT s.day, COALESCE(a.n_orders, 0) AS n_orders, "
            "COALESCE(a.c, 0) / 100.0 AS revenue "
            "FROM s LEFT JOIN a ON s.day = a.day"
        ),
        # edit-distance-1 name neighbor degree histogram (FastSS vs
        # DuckDB's quadratic levenshtein join)
        "edit1_name_hist": (
            "WITH d AS (SELECT a.c_custkey AS k, "
            "COUNT(b.c_custkey) AS deg FROM customer a "
            "LEFT JOIN customer b ON a.c_custkey <> b.c_custkey "
            "AND levenshtein(a.c_name, b.c_name) <= 1 "
            "GROUP BY a.c_custkey) "
            "SELECT CAST(deg AS BIGINT) AS n_neighbors, "
            "CAST(COUNT(*) AS BIGINT) AS n_customers "
            "FROM d GROUP BY deg"
        ),
        # per-label embedding centroids (scaled-int exact array agg)
        "label_centroids": (
            "WITH e AS (SELECT label, embedding, "
            "unnest(generate_series(1, len(embedding))) AS i "
            "FROM embeddings), "
            "v AS (SELECT CAST(label AS BIGINT) AS label, i AS dim, "
            "CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1000000.0 "
            "AS sx FROM e), "
            "v2 AS (SELECT label, dim, CAST(CASE WHEN sx >= 0 "
            "THEN floor(sx + 0.5) ELSE -floor(-sx + 0.5) END AS BIGINT) "
            "AS xs FROM v) "
            "SELECT label, CAST(dim AS BIGINT) AS dim, "
            "CAST(COUNT(*) AS BIGINT) AS n, "
            "SUM(xs) / (COUNT(*) * 1000000.0) AS mean "
            "FROM v2 GROUP BY 1, 2"
        ),
        # A-priori level-3: part triples in >= 2 distinct orders
        # (oracle counts unpruned; equality proves pruning lossless)
        "frequent_triples": (
            "WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey "
            "FROM lineitem), "
            "p2 AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb, "
            "a.l_orderkey AS o FROM lp a JOIN lp b "
            "ON a.l_orderkey = b.l_orderkey "
            "AND a.l_partkey < b.l_partkey), "
            "t3 AS (SELECT a.pa AS part_a, a.pb AS part_b, "
            "b.pb AS part_c FROM p2 a JOIN p2 b "
            "ON a.o = b.o AND a.pa = b.pa AND a.pb < b.pb) "
            "SELECT part_a, part_b, part_c, "
            "CAST(COUNT(*) AS BIGINT) AS support "
            "FROM t3 GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2"
        ),
        # degree assortativity of the co-purchase graph (exact-int
        # Pearson sums, one closed-form double expression)
        "degree_assortativity": (
            "WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey "
            "FROM lineitem), "
            "pp AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb "
            "FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey "
            "AND a.l_partkey < b.l_partkey), "
            "e AS (SELECT pa, pb FROM pp GROUP BY pa, pb "
            "HAVING COUNT(*) >= 2), "
            "b AS (SELECT pa AS s, pb AS d FROM e "
            "UNION ALL SELECT pb, pa FROM e), "
            "deg AS (SELECT s AS node, CAST(COUNT(*) AS BIGINT) AS deg "
            "FROM b GROUP BY 1), "
            "j AS (SELECT x.deg AS dx, y.deg AS dy FROM b "
            "JOIN deg x ON b.s = x.node JOIN deg y ON b.d = y.node), "
            "su AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
            "SUM(dx) AS sx, SUM(dy) AS sy, SUM(dx * dy) AS sxy, "
            "SUM(dx * dx) AS sxx, SUM(dy * dy) AS syy FROM j) "
            "SELECT n, CAST(n * sxy - sx * sy AS DOUBLE) / "
            "(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * "
            "sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS assortativity "
            "FROM su"
        ),
        # majority-class next-event predictor scored on its own stream
        "markov_accuracy": (
            "WITH s AS (SELECT event_type, lead(event_type) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id) AS nxt "
            "FROM events), "
            "m AS (SELECT event_type AS from_type, nxt AS to_type, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM s "
            "WHERE nxt IS NOT NULL GROUP BY 1, 2), "
            "r AS (SELECT from_type, to_type AS pred, n AS n_correct, "
            "row_number() OVER (PARTITION BY from_type "
            "ORDER BY n DESC, to_type) AS rn FROM m), "
            "t AS (SELECT from_type, SUM(n) AS n_transitions FROM m "
            "GROUP BY 1) "
            "SELECT t.from_type, r.pred, "
            "CAST(t.n_transitions AS BIGINT) AS n_transitions, "
            "CAST(r.n_correct AS BIGINT) AS n_correct, "
            "CAST(r.n_correct AS DOUBLE) / t.n_transitions AS accuracy "
            "FROM t JOIN r ON t.from_type = r.from_type AND r.rn = 1"
        ),
        # reciprocal best co-purchase partner (ties to smaller id)
        "mutual_top_partner": (
            "WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey "
            "FROM lineitem), "
            "pp AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb "
            "FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey "
            "AND a.l_partkey < b.l_partkey), "
            "e AS (SELECT pa, pb, CAST(COUNT(*) AS BIGINT) AS n_ord "
            "FROM pp GROUP BY pa, pb HAVING COUNT(*) >= 2), "
            "b AS (SELECT pa AS s, pb AS d, n_ord FROM e "
            "UNION ALL SELECT pb, pa, n_ord FROM e), "
            "top AS (SELECT s, d AS top, n_ord, row_number() OVER ("
            "PARTITION BY s ORDER BY n_ord DESC, d) AS rn FROM b) "
            "SELECT x.s AS part_a, x.top AS part_b, "
            "CAST(x.n_ord AS BIGINT) AS support "
            "FROM top x JOIN top y ON x.rn = 1 AND y.rn = 1 "
            "AND y.s = x.top AND y.top = x.s AND x.s < x.top"
        ),
        # multi-term AND search, tf-ranked top 10
        "search_docs": (
            "WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) "
            "AS term FROM documents), "
            "tf AS (SELECT doc_id, "
            "SUM(CASE WHEN term = 'data' THEN 1 ELSE 0 END) AS t1, "
            "SUM(CASE WHEN term = 'query' THEN 1 ELSE 0 END) AS t2 "
            "FROM w GROUP BY 1) "
            "SELECT doc_id, CAST(t1 + t2 AS BIGINT) AS tf_total "
            "FROM tf WHERE t1 > 0 AND t2 > 0 "
            "ORDER BY tf_total DESC, doc_id LIMIT 10"
        ),
        # deterministic 3-step hash-chosen walks (node2vec corpus prep)
        "random_walks": (
            "WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey "
            "FROM lineitem), "
            "pp AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb "
            "FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey "
            "AND a.l_partkey < b.l_partkey), "
            "e AS (SELECT pa, pb, CAST(COUNT(*) AS BIGINT) AS n_ord "
            "FROM pp GROUP BY pa, pb HAVING COUNT(*) >= 2), "
            "b AS (SELECT pa AS s, pb AS d, n_ord FROM e "
            "UNION ALL SELECT pb, pa, n_ord FROM e), "
            "r AS (SELECT s, d, row_number() OVER (PARTITION BY s "
            "ORDER BY n_ord DESC, d) - 1 AS rn, "
            "COUNT(*) OVER (PARTITION BY s) AS deg FROM b), "
            "s1 AS (SELECT s AS start, d AS hop1 FROM r "
            "WHERE rn = ((s * 31 + 1) * 2654435761) % 4294967296 % deg), "
            "s2 AS (SELECT s1.start, s1.hop1, r.d AS hop2 FROM s1 "
            "JOIN r ON r.s = s1.hop1 AND r.rn = "
            "((s1.hop1 * 31 + 2) * 2654435761) % 4294967296 % r.deg), "
            "s3 AS (SELECT s2.start, s2.hop1, s2.hop2, r.d AS hop3 "
            "FROM s2 JOIN r ON r.s = s2.hop2 AND r.rn = "
            "((s2.hop2 * 31 + 3) * 2654435761) % 4294967296 % r.deg) "
            "SELECT start, hop1, hop2, hop3 FROM s3"
        ),
        # PSI drift: first vs second chronological half, per-bin
        # contributions rounded to 12 dp (no order-dependent float sum)
        "psi_value_drift": (
            "WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day, "
            "value FROM events), "
            "s AS (SELECT (MIN(day) + MAX(day) + 1) // 2 AS split FROM d), "
            "c AS (SELECT CASE WHEN day >= split THEN 1 ELSE 0 END "
            "AS half, CAST(floor(value) AS BIGINT) AS bin, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM d, s GROUP BY 1, 2), "
            "a AS (SELECT bin, n AS n_a FROM c WHERE half = 0), "
            "b AS (SELECT bin, n AS n_b FROM c WHERE half = 1), "
            "t AS (SELECT (SELECT SUM(n_a) FROM a) AS ta, "
            "(SELECT SUM(n_b) FROM b) AS tb) "
            "SELECT a.bin, n_a, n_b, "
            "CAST(n_a AS DOUBLE) / ta AS p_a, "
            "CAST(n_b AS DOUBLE) / tb AS p_b, "
            "round((CAST(n_a AS DOUBLE) / ta - CAST(n_b AS DOUBLE) / tb) "
            "* ln((CAST(n_a AS DOUBLE) / ta) / (CAST(n_b AS DOUBLE) / tb)"
            "), 12) AS psi "
            "FROM a JOIN b ON a.bin = b.bin, t"
        ),
        # exact tie-corrected Mann-Whitney AUC over the distinct-score
        # CDF; HUGEINT-exact numerator, ONE mirrored float division
        "auc_purchase_value": (
            "WITH s AS (SELECT CAST(round(value * 100.0) AS BIGINT) "
            "AS sc, CAST(event_type = 'purchase' AS BIGINT) AS lab "
            "FROM events), "
            "c AS (SELECT sc, SUM(lab) AS cp, SUM(1 - lab) AS cn "
            "FROM s GROUP BY 1), "
            "w AS (SELECT sc, cp, cn, COALESCE(SUM(cn) OVER (ORDER BY "
            "sc ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
            "AS cnb FROM c), "
            "t AS (SELECT CAST(SUM(cp) AS BIGINT) AS p, "
            "CAST(SUM(cn) AS BIGINT) AS nn FROM c) "
            "SELECT t.p AS n_pos, t.nn AS n_neg, "
            "CASE WHEN t.p = 0 OR t.nn = 0 THEN -1.0 ELSE "
            "CAST((SELECT SUM(cp * (2 * cnb + cn)) FROM w) AS DOUBLE) "
            "/ (2.0 * CAST(t.p AS DOUBLE) * CAST(t.nn AS DOUBLE)) END "
            "AS auc FROM t"
        ),
        # reliability deciles: quantile_disc bounds (rank ceil(n*q)),
        # integral per-bin sums, three mirrored float divisions
        "calibration_value": (
            "WITH s AS (SELECT CAST(round(value * 100.0) AS BIGINT) "
            "AS sc, CAST(event_type = 'purchase' AS BIGINT) AS lab "
            "FROM events), "
            "q AS (SELECT quantile_disc(sc, 0.1) AS b1, "
            "quantile_disc(sc, 0.2) AS b2, quantile_disc(sc, 0.3) AS "
            "b3, quantile_disc(sc, 0.4) AS b4, quantile_disc(sc, 0.5) "
            "AS b5, quantile_disc(sc, 0.6) AS b6, quantile_disc(sc, "
            "0.7) AS b7, quantile_disc(sc, 0.8) AS b8, "
            "quantile_disc(sc, 0.9) AS b9 FROM s), "
            "t AS (SELECT CAST(SUM(lab) AS DOUBLE) / "
            "CAST(COUNT(*) AS DOUBLE) AS overall FROM s), "
            "g AS (SELECT CAST(1 + CAST(sc > b1 AS INT) + "
            "CAST(sc > b2 AS INT) + CAST(sc > b3 AS INT) + "
            "CAST(sc > b4 AS INT) + CAST(sc > b5 AS INT) + "
            "CAST(sc > b6 AS INT) + CAST(sc > b7 AS INT) + "
            "CAST(sc > b8 AS INT) + CAST(sc > b9 AS INT) AS BIGINT) "
            "AS bin, CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(sc) AS BIGINT) AS ss, "
            "CAST(SUM(lab) AS BIGINT) AS cp FROM s, q GROUP BY 1) "
            "SELECT bin, n, "
            "CAST(ss AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS "
            "mean_score, CAST(cp AS DOUBLE) / CAST(n AS DOUBLE) AS "
            "pos_rate, (CAST(cp AS DOUBLE) / CAST(n AS DOUBLE)) "
            "/ t.overall AS lift FROM g, t"
        ),
        # all-pairs Pearson matrix from ONE set of integer moment sums;
        # each cell spells grouped_corr's exact float expression tree
        "corr_matrix_lineitem": _CORR_MATRIX_SQL,
        # 2-D skyline: no other part cheaper-or-equal AND
        # bigger-or-equal with one strict (cent-rounded price)
        "pareto_parts": (
            "WITH p AS (SELECT p_partkey, "
            "CAST(round(p_retailprice * 100.0) AS BIGINT) AS pc, "
            "CAST(p_size AS BIGINT) AS p_size FROM part) "
            "SELECT a.p_partkey, a.pc / 100.0 AS price, a.p_size "
            "FROM p a WHERE NOT EXISTS (SELECT 1 FROM p b "
            "WHERE b.pc <= a.pc AND b.p_size >= a.p_size "
            "AND (b.pc < a.pc OR b.p_size > a.p_size))"
        ),
        # per-node clustering coefficient over the co-purchase graph;
        # triangles per node from the three-way self-join, degrees
        # from the exploded endpoints, one mirrored float division
        "clustering_coeff": (
            "WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey "
            "FROM lineitem), "
            "pp AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb "
            "FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey "
            "AND a.l_partkey < b.l_partkey), "
            "e AS (SELECT pa, pb FROM pp GROUP BY pa, pb "
            "HAVING COUNT(*) >= 2), "
            "tr AS (SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c "
            "FROM e e1 JOIN e e2 ON e2.pa = e1.pa AND e2.pb > e1.pb "
            "JOIN e e3 ON e3.pa = e1.pb AND e3.pb = e2.pb), "
            "t AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS tri FROM "
            "(SELECT a AS v FROM tr UNION ALL SELECT b FROM tr "
            "UNION ALL SELECT c FROM tr) GROUP BY 1), "
            "d AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS degree FROM "
            "(SELECT pa AS v FROM e UNION ALL SELECT pb FROM e) "
            "GROUP BY 1) "
            "SELECT d.v AS node, d.degree, "
            "COALESCE(t.tri, 0) AS triangles, "
            "CASE WHEN d.degree < 2 THEN 0.0 ELSE "
            "(2.0 * CAST(COALESCE(t.tri, 0) AS DOUBLE)) / "
            "(CAST(d.degree AS DOUBLE) * "
            "CAST(d.degree - 1 AS DOUBLE)) END AS coeff "
            "FROM d LEFT JOIN t ON d.v = t.v"
        ),
        # 2-D box question the Z-order layout answers via pruned reads;
        # the oracle recomputes from the raw table (round-trip proof)
        "zorder_prune_2d": (
            "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, "
            "SUM(CAST(round(value * 10000.0) AS BIGINT)) / 10000.0 "
            "AS total FROM events "
            "WHERE epoch_us(ts) // 86400000000 >= 19727 "
            "AND epoch_us(ts) // 86400000000 < 19730 "
            "AND user_id >= 0 AND user_id < 50 "
            "GROUP BY 1"
        ),
        # Lorenz-curve deciles: int64 spend sums through the cumsum,
        # shares as single mirrored divisions
        "spend_concentration": (
            "WITH t AS (SELECT user_id, "
            "SUM(CAST(round(value * 10000.0) AS BIGINT)) AS total_s "
            "FROM events GROUP BY 1), "
            "d AS (SELECT CAST(NTILE(10) OVER (ORDER BY total_s, "
            "user_id) AS BIGINT) AS decile, total_s FROM t), "
            "g AS (SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_users, "
            "CAST(SUM(total_s) AS BIGINT) AS s FROM d GROUP BY 1), "
            "w AS (SELECT *, SUM(s) OVER (ORDER BY decile) AS cum, "
            "(SELECT CAST(SUM(s) AS DOUBLE) FROM g) AS tot FROM g) "
            "SELECT decile, n_users, s / 10000.0 AS spend, "
            "CAST(s AS DOUBLE) / tot AS share, "
            "CAST(cum AS DOUBLE) / tot AS cum_share FROM w"
        ),
        # MI cells beside the chi-square test: full cross product,
        # zero-observed cells contribute 0.0, 12-dp rounded
        "mi_lang_source": (
            "WITH c AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) "
            "AS n FROM documents GROUP BY 1, 2), "
            "x AS (SELECT l.lang, s.source, COALESCE(c.n, 0) AS n "
            "FROM (SELECT DISTINCT lang FROM c) l "
            "CROSS JOIN (SELECT DISTINCT source FROM c) s "
            "LEFT JOIN c USING(lang, source)), "
            "m AS (SELECT *, CAST(SUM(n) OVER (PARTITION BY lang) "
            "AS DOUBLE) AS rn, CAST(SUM(n) OVER (PARTITION BY source) "
            "AS DOUBLE) AS sn, CAST((SELECT SUM(n) FROM x) AS DOUBLE) "
            "AS tn FROM x) "
            "SELECT lang, source, n, CASE WHEN n > 0 THEN round("
            "(CAST(n AS DOUBLE) / tn) * log2((CAST(n AS DOUBLE) / tn) "
            "/ ((rn / tn) * (sn / tn))), 12) ELSE 0.0 END "
            "AS mi_contrib FROM m"
        ),
        # Count-Min estimates: collision-free at this width/key-count,
        # so the sketch answer equals the exact count (see docstring)
        "cms_type_counts": (
            "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS est_n "
            "FROM events GROUP BY 1"
        ),
        # Flesch-style readability + exact TTR; the engine's counts
        # restated as split/regexp lengths, float trees mirrored
        "readability_docs": (
            "WITH w AS (SELECT doc_id, unnest(string_split("
            "coalesce(text, ''), ' ')) AS word FROM documents), "
            "dw AS (SELECT doc_id, CAST(COUNT(DISTINCT word) AS BIGINT) "
            "AS nd FROM w GROUP BY 1), "
            "c AS (SELECT doc_id, "
            "CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT) "
            "AS n_words, "
            "CAST(len(regexp_extract_all(coalesce(text, ''), "
            "'[.!?]+')) AS BIGINT) AS n_sentences, "
            "CAST(len(regexp_extract_all(coalesce(text, ''), "
            "'[aeiouyAEIOUY]+')) AS BIGINT) AS n_vowel_groups "
            "FROM documents) "
            "SELECT CAST(c.doc_id AS VARCHAR) AS doc_id, c.n_words, "
            "c.n_sentences, c.n_vowel_groups, "
            "dw.nd AS n_distinct_words, "
            "206.835 - 1.015 * (CAST(c.n_words AS DOUBLE) "
            "/ CAST(greatest(c.n_sentences, 1) AS DOUBLE)) "
            "- 84.6 * (CAST(c.n_vowel_groups AS DOUBLE) "
            "/ CAST(c.n_words AS DOUBLE)) AS fk_score, "
            "CAST(dw.nd AS DOUBLE) / CAST(c.n_words AS DOUBLE) AS ttr "
            "FROM c JOIN dw ON c.doc_id = dw.doc_id"
        ),
        # 3-MAD outlier flags on pure integer grids (d2 doubled cents,
        # mad4 quadrupled) — no float threshold exists to disagree
        "mad_outliers_value": (
            "WITH s AS (SELECT event_id, event_type, value, "
            "CAST(round(value * 100.0) AS BIGINT) AS vc FROM events), "
            "m AS (SELECT event_type, CAST(round(2 * quantile_cont(vc, "
            "0.5)) AS BIGINT) AS med2 FROM s GROUP BY 1), "
            "d AS (SELECT s.*, abs(2 * s.vc - m.med2) AS d2 "
            "FROM s JOIN m USING(event_type)), "
            "md AS (SELECT event_type, CAST(round(2 * quantile_cont(d2, "
            "0.5)) AS BIGINT) AS mad4 FROM d GROUP BY 1) "
            "SELECT d.event_id, d.event_type, d.value "
            "FROM d JOIN md USING(event_type) "
            "WHERE 2 * d.d2 > 3 * md.mad4"
        ),
        # leave-one-out 1-NN label accuracy; rank order robust to
        # low-bit cosine noise (the similarity_topk precedent), ties
        # toward the smaller neighbor id on both sides
        "knn_label_accuracy": (
            "WITH e AS (SELECT vec_id, label, "
            "CAST(embedding AS DOUBLE[]) AS v FROM embeddings), "
            "s AS (SELECT a.vec_id, a.label, b.vec_id AS bid, "
            "b.label AS blabel, list_cosine_similarity(a.v, b.v) AS "
            "sim FROM e a JOIN e b ON a.vec_id <> b.vec_id), "
            "nn AS (SELECT vec_id, label, blabel, row_number() OVER "
            "(PARTITION BY vec_id ORDER BY sim DESC, bid) AS rn "
            "FROM s) "
            "SELECT CAST(label AS BIGINT) AS label, "
            "CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(CAST(label = blabel AS INT)) AS BIGINT) AS "
            "correct, CAST(SUM(CAST(label = blabel AS INT)) AS DOUBLE) "
            "/ CAST(COUNT(*) AS DOUBLE) AS accuracy "
            "FROM nn WHERE rn = 1 GROUP BY 1"
        ),
        # dense per-user daily grid with last-known-value carry;
        # day-internal ties to the latest (ts, event_id)
        "user_daily_grid": (
            "WITH s AS (SELECT user_id, epoch_us(ts) // 86400000000 "
            "AS day, ts, event_id, value FROM events), "
            "l AS (SELECT user_id, day, value FROM (SELECT *, "
            "row_number() OVER (PARTITION BY user_id, day ORDER BY "
            "ts DESC, event_id DESC) AS rn FROM s) WHERE rn = 1), "
            "b AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 "
            "FROM s GROUP BY 1), "
            "g AS (SELECT user_id, unnest(generate_series(d0, d1)) "
            "AS day FROM b) "
            "SELECT g.user_id, CAST(g.day AS BIGINT) AS day, l.value "
            "FROM g ASOF LEFT JOIN l ON g.user_id = l.user_id "
            "AND g.day >= l.day"
        ),
        # two-sample KS drift: integer argmax over the joint CDF,
        # ties to the smallest value, one mirrored division
        "ks_value_drift": (
            "WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day, "
            "CAST(round(value * 100.0) AS BIGINT) AS vc FROM events), "
            "bo AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM d), "
            "s AS (SELECT CAST(day >= (d0 + d1 + 1) // 2 AS BIGINT) "
            "AS half, vc FROM d, bo), "
            "c AS (SELECT vc, SUM(CAST(half = 0 AS BIGINT)) AS a, "
            "SUM(CAST(half = 1 AS BIGINT)) AS bb FROM s GROUP BY 1), "
            "w AS (SELECT vc, SUM(a) OVER (ORDER BY vc) AS ca, "
            "SUM(bb) OVER (ORDER BY vc) AS cb FROM c), "
            "t AS (SELECT CAST(SUM(a) AS BIGINT) AS na, "
            "CAST(SUM(bb) AS BIGINT) AS nb FROM c), "
            "m AS (SELECT w.vc, abs(ca * nb - cb * na) AS diff "
            "FROM w, t), "
            "best AS (SELECT vc, diff FROM m ORDER BY diff DESC, vc "
            "LIMIT 1) "
            "SELECT t.na AS n_a, t.nb AS n_b, "
            "best.vc / 100.0 AS at_value, "
            "CAST(best.diff AS DOUBLE) / (CAST(t.na AS DOUBLE) * "
            "CAST(t.nb AS DOUBLE)) AS ks_stat FROM best, t"
        ),
        # CUSUM change point on the zero-filled day spine; integer
        # argmax |D*C_k - N*k|, ties to the earliest day
        "cusum_daily_events": (
            "WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day "
            "FROM events), "
            "b AS (SELECT MIN(day) AS d0, MAX(day) AS d1, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM d), "
            "sp AS (SELECT unnest(generate_series(d0, d1)) AS day "
            "FROM b), "
            "c AS (SELECT sp.day, CAST(COUNT(d.day) AS BIGINT) AS nd "
            "FROM sp LEFT JOIN d ON sp.day = d.day GROUP BY 1), "
            "w AS (SELECT day, SUM(nd) OVER (ORDER BY day) AS ck, "
            "row_number() OVER (ORDER BY day) AS k FROM c), "
            "t AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd_days, "
            "(SELECT n FROM b) AS total FROM c), "
            "m AS (SELECT w.day, abs(t.nd_days * w.ck "
            "- t.total * w.k) AS stat FROM w, t), "
            "best AS (SELECT day, stat FROM m ORDER BY stat DESC, day "
            "LIMIT 1) "
            "SELECT t.nd_days AS n_days, t.total, "
            "CAST(best.day AS BIGINT) AS at_day, "
            "CAST(best.stat AS DOUBLE) / (CAST(t.nd_days AS DOUBLE) * "
            "CAST(t.total AS DOUBLE)) AS cusum FROM best, t"
        ),
        # daily grid with LINEAR interpolation between observed days;
        # backward+forward ASOF pair, one mirrored float expression
        "user_daily_interp": (
            "WITH s AS (SELECT user_id, epoch_us(ts) // 86400000000 "
            "AS day, ts, event_id, value FROM events), "
            "l AS (SELECT user_id, day, value FROM (SELECT *, "
            "row_number() OVER (PARTITION BY user_id, day ORDER BY "
            "ts DESC, event_id DESC) AS rn FROM s) WHERE rn = 1), "
            "b AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 "
            "FROM s GROUP BY 1), "
            "g AS (SELECT user_id, unnest(generate_series(d0, d1)) "
            "AS day FROM b), "
            "p AS (SELECT g.user_id, g.day, l.day AS pd, l.value AS "
            "pv FROM g ASOF LEFT JOIN l ON g.user_id = l.user_id "
            "AND g.day >= l.day), "
            "x AS (SELECT p.*, l.day AS nd, l.value AS nv FROM p "
            "ASOF LEFT JOIN l ON p.user_id = l.user_id "
            "AND p.day <= l.day) "
            "SELECT user_id, CAST(day AS BIGINT) AS day, "
            "CASE WHEN nd = pd THEN pv ELSE pv + (nv - pv) * "
            "(CAST(day - pd AS DOUBLE) / CAST(nd - pd AS DOUBLE)) END "
            "AS value FROM x"
        ),
        # Mann-Whitney U between chronological halves: doubled average
        # ranks keep everything integer (HUGEINT sums); /2 and the AUC
        # division are the two mirrored float ops
        "mannwhitney_value": (
            "WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day, "
            "CAST(round(value * 100.0) AS BIGINT) AS vc FROM events), "
            "bo AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM d), "
            "s AS (SELECT CAST(day >= (d0 + d1 + 1) // 2 AS BIGINT) "
            "AS half, vc FROM d, bo), "
            "c AS (SELECT vc, SUM(CAST(half = 0 AS BIGINT)) AS a, "
            "SUM(CAST(half = 1 AS BIGINT)) AS bb FROM s GROUP BY 1), "
            "w AS (SELECT vc, a, bb, a + bb AS t, "
            "COALESCE(SUM(a + bb) OVER (ORDER BY vc ROWS BETWEEN "
            "UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cl FROM c), "
            "t AS (SELECT CAST(SUM(a) AS BIGINT) AS na, "
            "CAST(SUM(bb) AS BIGINT) AS nb FROM c), "
            "r AS (SELECT SUM(a * (2 * cl + t + 1)) AS r2a FROM w) "
            "SELECT na AS n_a, nb AS n_b, "
            "CAST(r2a - na * (na + 1) AS DOUBLE) / 2.0 AS u_a, "
            "(CAST(r2a - na * (na + 1) AS DOUBLE) / 2.0) / "
            "(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS auc_a "
            "FROM t, r"
        ),
        # Spearman rank corr via doubled average ranks
        # (2*RANK + peer-count - 1); HUGEINT moments, one mirrored
        # float expression
        "spearman_qty_price": (
            "WITH b AS (SELECT CAST(round(l_quantity) AS BIGINT) AS "
            "qc, CAST(round(l_extendedprice * 100.0) AS BIGINT) AS pc "
            "FROM lineitem), "
            "r AS (SELECT 2 * RANK() OVER (ORDER BY qc) + "
            "COUNT(*) OVER (PARTITION BY qc) - 1 AS x, "
            "2 * RANK() OVER (ORDER BY pc) + "
            "COUNT(*) OVER (PARTITION BY pc) - 1 AS y FROM b), "
            "s AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, "
            "SUM(CAST(x AS HUGEINT)) AS sx, "
            "SUM(CAST(y AS HUGEINT)) AS sy, "
            "SUM(CAST(x AS HUGEINT) * x) AS sxx, "
            "SUM(CAST(y AS HUGEINT) * y) AS syy, "
            "SUM(CAST(x AS HUGEINT) * y) AS sxy FROM r) "
            "SELECT CAST(n AS BIGINT) AS n_rows, "
            "CAST(n * sxy - sx * sy AS DOUBLE) / "
            "sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * "
            "CAST(n * syy - sy * sy AS DOUBLE)) AS spearman FROM s"
        ),
        # day-of-week profile on epoch-anchored day indexes; both
        # divisions mirrored
        "dow_seasonality": (
            "WITH d AS (SELECT (epoch_us(ts) // 86400000000) % 7 AS "
            "dow, CAST(round(value * 100.0) AS BIGINT) AS vc "
            "FROM events), "
            "c AS (SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_events, "
            "SUM(vc) AS sv FROM d GROUP BY 1), "
            "t AS (SELECT CAST(SUM(n_events) AS BIGINT) AS tot FROM c) "
            "SELECT dow, n_events, "
            "CAST(n_events AS DOUBLE) / CAST(tot AS DOUBLE) AS share, "
            "(CAST(sv AS DOUBLE) / CAST(n_events AS DOUBLE)) / 100.0 "
            "AS avg_value FROM c, t ORDER BY dow"
        ),
        # HHI market concentration per supplier nation; revenue stays
        # the exact integer pc*(100-dc), squares in HUGEINT, one
        # mirrored division
        "hhi_supplier_nation": (
            "WITH r AS (SELECT s_nationkey AS nation, l_suppkey, "
            "SUM(CAST(round(l_extendedprice * 100.0) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100.0) AS BIGINT))) AS rev "
            "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
            "GROUP BY 1, 2), "
            "h AS (SELECT nation, CAST(COUNT(*) AS BIGINT) AS "
            "n_suppliers, SUM(CAST(rev AS HUGEINT) * rev) AS sq, "
            "SUM(rev) AS tot FROM r GROUP BY 1) "
            "SELECT n_name, n_suppliers, CAST(sq AS DOUBLE) / "
            "(CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)) AS hhi "
            "FROM h JOIN nation ON nation = n_nationkey "
            "ORDER BY n_name"
        ),
        # Mann-Kendall S over the zero-filled day spine + tie-corrected
        # tau_b; integer S, one mirrored sqrt expression
        "mann_kendall_daily": (
            "WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day, "
            "CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1), "
            "bo AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM d), "
            "g AS (SELECT unnest(generate_series(d0, d1)) AS day "
            "FROM bo), "
            "x AS (SELECT g.day, COALESCE(d.c, 0) AS c FROM g "
            "LEFT JOIN d ON g.day = d.day), "
            "p AS (SELECT CAST(SUM(CASE WHEN b.c > a.c THEN 1 "
            "WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT) AS s "
            "FROM x a JOIN x b ON b.day > a.day), "
            "ties AS (SELECT CAST(SUM(cnt * (cnt - 1) // 2) AS BIGINT) "
            "AS n1 FROM (SELECT COUNT(*) AS cnt FROM x GROUP BY c)), "
            "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS d FROM x) "
            "SELECT d AS n_days, s AS s_stat, CAST(s AS DOUBLE) / "
            "sqrt(CAST(d * (d - 1) // 2 - n1 AS DOUBLE) * "
            "CAST(d * (d - 1) // 2 AS DOUBLE)) AS tau_b "
            "FROM p, ties, nn"
        ),
        # sequential rule support: ordered type pairs within 1h per
        # user (strictly later ts, not necessarily adjacent)
        "followed_within_1h": (
            "SELECT a.event_type AS type_a, b.event_type AS type_b, "
            "CAST(COUNT(*) AS BIGINT) AS n "
            "FROM events a JOIN events b ON a.user_id = b.user_id "
            "AND epoch_us(b.ts) > epoch_us(a.ts) "
            "AND epoch_us(b.ts) <= epoch_us(a.ts) + 3600000000 "
            "GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        # asymmetric containment (doc-in-doc): same grams CTE as
        # ngram_jaccard, final score inter / least(|A|, |B|)
        "containment_neardup": (
            "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS "
            "t, len(string_split(text, ' ')) AS nt FROM documents), "
            "grams AS (SELECT DISTINCT doc_id, "
            "array_to_string(t[i:i+2], ' ') AS gram "
            "FROM (SELECT doc_id, t, unnest(generate_series(1, nt - 2)"
            ") AS i FROM toks WHERE nt >= 3) x), "
            "counts AS (SELECT doc_id, COUNT(*) AS ng FROM grams "
            "GROUP BY doc_id), "
            "pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "COUNT(*) AS inter FROM grams a "
            "JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id "
            "GROUP BY 1, 2) "
            "SELECT p.id_a, p.id_b, CAST(p.inter AS BIGINT) AS inter, "
            "CAST(least(ca.ng, cb.ng) AS BIGINT) AS nmin, "
            "p.inter / least(ca.ng, cb.ng) AS containment "
            "FROM pairs p JOIN counts ca ON p.id_a = ca.doc_id "
            "JOIN counts cb ON p.id_b = cb.doc_id "
            "WHERE p.inter / least(ca.ng, cb.ng) >= 0.5"
        ),
        # quantile normalization across event types: integer
        # cross-multiplied CDF probe (ceiling division), forward ASOF
        # to the smallest global value reaching the quantile
        "quantile_normalize_value": (
            "WITH v AS (SELECT event_id, event_type, value, "
            "CAST(round(value * 100.0) AS BIGINT) AS vc FROM events), "
            "c AS (SELECT event_type, vc, CAST(COUNT(*) AS BIGINT) AS "
            "cnt FROM v GROUP BY 1, 2), "
            "tcum AS (SELECT event_type, vc, cnt, "
            "SUM(cnt) OVER (PARTITION BY event_type ORDER BY vc) AS "
            "cum, SUM(cnt) OVER (PARTITION BY event_type) AS ns "
            "FROM c), "
            "r AS (SELECT event_type, vc, 2 * cum - cnt + 1 AS r2, ns "
            "FROM tcum), "
            "gc AS (SELECT vc, SUM(cnt) AS gcnt FROM c GROUP BY 1), "
            "gcum AS (SELECT vc AS gv, SUM(gcnt) OVER (ORDER BY vc) "
            "AS gcm FROM gc), "
            "tt AS (SELECT CAST(SUM(gcnt) AS BIGINT) AS n FROM gc), "
            "m AS (SELECT r.event_type, r.vc, "
            "(tt.n * r.r2 + 2 * r.ns - 1) // (2 * r.ns) AS k "
            "FROM r, tt), "
            "j AS (SELECT m.event_type, m.vc, g.gv FROM m "
            "ASOF JOIN gcum g ON m.k <= g.gcm) "
            "SELECT v.event_id, v.event_type, v.value, "
            "j.gv / 100.0 AS qn_value FROM v JOIN j "
            "ON v.event_type = j.event_type AND v.vc = j.vc"
        ),
        # 5-fold out-of-fold target encoding (fold = event_id mod 5);
        # integer sums, one mirrored division
        "oof_target_encode": (
            "WITH v AS (SELECT event_id, event_type, "
            "event_id % 5 AS fold, "
            "CAST(round(value * 100.0) AS BIGINT) AS vc FROM events), "
            "f AS (SELECT event_type, fold, SUM(vc) AS sv, "
            "CAST(COUNT(*) AS BIGINT) AS cnt FROM v GROUP BY 1, 2), "
            "t AS (SELECT event_type, SUM(sv) AS tsv, SUM(cnt) AS "
            "tcnt FROM f GROUP BY 1) "
            "SELECT v.event_id, v.event_type, "
            "CASE WHEN t.tcnt - f.cnt > 0 THEN "
            "(CAST(t.tsv - f.sv AS DOUBLE) / "
            "CAST(t.tcnt - f.cnt AS DOUBLE)) / 100.0 "
            "ELSE NULL END AS oof_te "
            "FROM v JOIN f ON v.event_type = f.event_type "
            "AND v.fold = f.fold "
            "JOIN t ON v.event_type = t.event_type"
        ),
        # day-over-day active-user Jaccard; per-user consecutive-day
        # pairs = the distributed intersection
        "day_user_overlap": (
            "WITH du AS (SELECT DISTINCT user_id, "
            "epoch_us(ts) // 86400000000 AS day FROM events), "
            "c AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS n FROM du "
            "GROUP BY 1), "
            "i AS (SELECT a.day, CAST(COUNT(*) AS BIGINT) AS inter "
            "FROM du a JOIN du b ON a.user_id = b.user_id "
            "AND b.day = a.day + 1 GROUP BY 1) "
            "SELECT CAST(ca.day AS BIGINT) AS day, ca.n AS n_day, "
            "cb.n AS n_next, COALESCE(i.inter, 0) AS inter, "
            "CAST(COALESCE(i.inter, 0) AS DOUBLE) / "
            "CAST(ca.n + cb.n - COALESCE(i.inter, 0) AS DOUBLE) AS "
            "jaccard FROM c ca JOIN c cb ON cb.day = ca.day + 1 "
            "LEFT JOIN i ON i.day = ca.day ORDER BY ca.day"
        ),
        # Fano factor (variance/mean) of daily counts per type over the
        # global zero-filled day spine; integer-exact, one division
        "fano_factor_daily": (
            "WITH d AS (SELECT event_type, epoch_us(ts) // "
            "86400000000 AS day FROM events), "
            "bo AS (SELECT MAX(day) - MIN(day) + 1 AS dd FROM d), "
            "c AS (SELECT event_type, day, CAST(COUNT(*) AS BIGINT) "
            "AS cnt FROM d GROUP BY 1, 2), "
            "s AS (SELECT event_type, SUM(cnt * cnt) AS sq, "
            "SUM(cnt) AS nn FROM c GROUP BY 1) "
            "SELECT event_type, CAST(bo.dd AS BIGINT) AS n_days, "
            "CAST(nn AS BIGINT) AS n_events, "
            "CAST(bo.dd * sq - nn * nn AS DOUBLE) / "
            "CAST(bo.dd * nn AS DOUBLE) AS fano "
            "FROM s, bo ORDER BY event_type"
        ),
        # neighborhood-Jaccard link prediction over the synthetic
        # citation graph; one mirrored division, deterministic tiebreak
        "link_pred_jaccard": (
            "WITH nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n "
            "FROM documents), "
            "e0 AS (SELECT doc_id AS s, (7 * doc_id + 3) % nn.n AS d "
            "FROM documents, nn UNION ALL "
            "SELECT doc_id, (3 * doc_id + 1) % nn.n "
            "FROM documents, nn), "
            "und AS (SELECT DISTINCT least(s, d) AS a, "
            "greatest(s, d) AS b FROM e0 WHERE s <> d), "
            "adj AS (SELECT a AS c, b AS x FROM und "
            "UNION ALL SELECT b, a FROM und), "
            "deg AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS dg "
            "FROM adj GROUP BY 1), "
            "w AS (SELECT a1.x AS a, a2.x AS b, "
            "CAST(COUNT(*) AS BIGINT) AS cn FROM adj a1 "
            "JOIN adj a2 ON a1.c = a2.c AND a1.x < a2.x "
            "GROUP BY 1, 2), "
            "cand AS (SELECT w.a, w.b, w.cn FROM w LEFT JOIN und u "
            "ON w.a = u.a AND w.b = u.b WHERE u.a IS NULL) "
            "SELECT c.a AS node_a, c.b AS node_b, c.cn, "
            "CAST(c.cn AS DOUBLE) / "
            "CAST(da.dg + db.dg - c.cn AS DOUBLE) AS jaccard "
            "FROM cand c JOIN deg da ON c.a = da.c "
            "JOIN deg db ON c.b = db.c "
            "ORDER BY jaccard DESC, node_a, node_b LIMIT 50"
        ),
        # one-way ANOVA F on the 1e-6 grid (same cast-then-divide tree
        # per group; the k-term sum order sits ~5 decimal orders under
        # the grid — the link_pagerank convention)
        "anova_value_by_type": (
            "WITH v AS (SELECT event_type, "
            "CAST(round(value * 100.0) AS BIGINT) AS vc FROM events), "
            "m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, "
            "SUM(vc) AS s, SUM(vc * vc) AS q FROM v GROUP BY 1), "
            "t AS (SELECT CAST(SUM(n) AS BIGINT) AS nn, "
            "CAST(COUNT(*) AS BIGINT) AS k, "
            "CAST(SUM(s) AS DOUBLE) AS st, "
            "CAST(SUM(q) AS DOUBLE) AS qt, "
            "SUM(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / "
            "CAST(n AS DOUBLE)) AS term FROM m), "
            "f AS (SELECT nn, k, "
            "((term - st * st / CAST(nn AS DOUBLE)) / "
            "CAST(k - 1 AS DOUBLE)) / "
            "((qt - term) / CAST(nn - k AS DOUBLE)) AS fv FROM t) "
            "SELECT nn AS n_rows, k AS n_groups, "
            "CAST(CASE WHEN sx >= 0 THEN floor(sx + 0.5) "
            "ELSE -floor(-sx + 0.5) END AS BIGINT) AS f_e6 "
            "FROM (SELECT nn, k, fv * 1000000.0 AS sx FROM f)"
        ),
        # Kruskal-Wallis H (tie-corrected) via doubled average ranks;
        # 1e-6 grid
        "kruskal_value_by_type": (
            "WITH v AS (SELECT event_type, "
            "CAST(round(value * 100.0) AS BIGINT) AS vc FROM events), "
            "c AS (SELECT event_type, vc, CAST(COUNT(*) AS BIGINT) AS "
            "cnt FROM v GROUP BY 1, 2), "
            "gt AS (SELECT vc, SUM(cnt) AS t FROM c GROUP BY 1), "
            "gr AS (SELECT vc, t, 2 * (SUM(t) OVER (ORDER BY vc)) "
            "- t + 1 AS r2 FROM gt), "
            "rj AS (SELECT c.event_type, SUM(c.cnt * gr.r2) AS r2j, "
            "SUM(c.cnt) AS nj FROM c JOIN gr ON c.vc = gr.vc "
            "GROUP BY 1), "
            "tot AS (SELECT CAST(SUM(nj) AS BIGINT) AS nn, "
            "CAST(COUNT(*) AS BIGINT) AS k FROM rj), "
            "ties AS (SELECT SUM(t * t * t - t) AS tie FROM gt), "
            "s AS (SELECT SUM(CAST(r2j AS DOUBLE) * "
            "CAST(r2j AS DOUBLE) / (4.0 * CAST(nj AS DOUBLE))) AS "
            "num FROM rj), "
            "h AS (SELECT nn, k, ((12.0 / (CAST(nn AS DOUBLE) * "
            "CAST(nn + 1 AS DOUBLE))) * num - 3.0 * "
            "CAST(nn + 1 AS DOUBLE)) / (1.0 - CAST(tie AS DOUBLE) / "
            "CAST(nn * nn * nn - nn AS DOUBLE)) AS hv "
            "FROM tot, ties, s) "
            "SELECT nn AS n_rows, k AS n_groups, "
            "CAST(CASE WHEN sx >= 0 THEN floor(sx + 0.5) "
            "ELSE -floor(-sx + 0.5) END AS BIGINT) AS h_e6 "
            "FROM (SELECT nn, k, hv * 1000000.0 AS sx FROM h)"
        ),
        # pairwise KS drift matrix on the union doc-length CDF grid;
        # integer argmax, ties to the smallest length, one division
        "ks_source_matrix": (
            "WITH c AS (SELECT source, n_chars AS v, "
            "CAST(COUNT(*) AS BIGINT) AS cnt FROM documents "
            "GROUP BY 1, 2), "
            "tot AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS n "
            "FROM c GROUP BY 1), "
            "vals AS (SELECT DISTINCT v FROM c), "
            "grid AS (SELECT t.source, v.v FROM tot t "
            "CROSS JOIN vals v), "
            "cdf AS (SELECT g.source, g.v, CAST(SUM(COALESCE(c.cnt, "
            "0)) OVER (PARTITION BY g.source ORDER BY g.v) AS BIGINT) "
            "AS cum FROM grid g LEFT JOIN c ON c.source = g.source "
            "AND c.v = g.v), "
            "pairs AS (SELECT a.source AS sa, a.n AS na, b.source AS "
            "sb, b.n AS nb FROM tot a JOIN tot b "
            "ON a.source < b.source), "
            "j AS (SELECT p.sa, p.sb, p.na, p.nb, a.v, a.cum AS ca, "
            "b.cum AS cb FROM pairs p JOIN cdf a ON a.source = p.sa "
            "JOIN cdf b ON b.source = p.sb AND b.v = a.v), "
            "m AS (SELECT sa, sb, na, nb, v, "
            "abs(ca * nb - cb * na) AS diff FROM j), "
            "best AS (SELECT sa, sb, na, nb, v, diff, ROW_NUMBER() "
            "OVER (PARTITION BY sa, sb ORDER BY diff DESC, v) AS rn "
            "FROM m) "
            "SELECT sa AS source_a, sb AS source_b, na AS n_a, "
            "nb AS n_b, CAST(v AS BIGINT) AS at_value, "
            "CAST(diff AS DOUBLE) / (CAST(na AS DOUBLE) * "
            "CAST(nb AS DOUBLE)) AS ks FROM best WHERE rn = 1 "
            "ORDER BY source_a, source_b"
        ),
        # pairwise 1-Wasserstein: integer Σ |ΔCDF|·gap (HUGEINT),
        # one mirrored division
        "wasserstein_source_pairs": (
            "WITH c AS (SELECT source, n_chars AS v, "
            "CAST(COUNT(*) AS BIGINT) AS cnt FROM documents "
            "GROUP BY 1, 2), "
            "tot AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS n "
            "FROM c GROUP BY 1), "
            "vals AS (SELECT DISTINCT v FROM c), "
            "grid AS (SELECT t.source, v.v FROM tot t "
            "CROSS JOIN vals v), "
            "cdf AS (SELECT g.source, g.v, CAST(SUM(COALESCE(c.cnt, "
            "0)) OVER (PARTITION BY g.source ORDER BY g.v) AS BIGINT) "
            "AS cum FROM grid g LEFT JOIN c ON c.source = g.source "
            "AND c.v = g.v), "
            "pairs AS (SELECT a.source AS sa, a.n AS na, b.source AS "
            "sb, b.n AS nb FROM tot a JOIN tot b "
            "ON a.source < b.source), "
            "j AS (SELECT p.sa, p.sb, p.na, p.nb, a.v, a.cum AS ca, "
            "b.cum AS cb FROM pairs p JOIN cdf a ON a.source = p.sa "
            "JOIN cdf b ON b.source = p.sb AND b.v = a.v), "
            "w AS (SELECT sa, sb, na, nb, v, "
            "abs(ca * nb - cb * na) AS diff, "
            "LEAD(v) OVER (PARTITION BY sa, sb ORDER BY v) AS nv "
            "FROM j), "
            "s AS (SELECT sa, sb, na, nb, SUM(diff * (nv - v)) AS tv "
            "FROM w WHERE nv IS NOT NULL GROUP BY 1, 2, 3, 4) "
            "SELECT sa AS source_a, sb AS source_b, na AS n_a, "
            "nb AS n_b, CAST(tv AS DOUBLE) / (CAST(na AS DOUBLE) * "
            "CAST(nb AS DOUBLE)) AS w1 FROM s "
            "ORDER BY source_a, source_b"
        ),
        # pairwise total-variation: integer Σ |pmf gap| on the union
        # grid, one mirrored division (×2 in the denominator)
        "tv_source_pairs": (
            "WITH c AS (SELECT source, n_chars AS v, "
            "CAST(COUNT(*) AS BIGINT) AS cnt FROM documents "
            "GROUP BY 1, 2), "
            "tot AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS n "
            "FROM c GROUP BY 1), "
            "vals AS (SELECT DISTINCT v FROM c), "
            "grid AS (SELECT t.source, v.v FROM tot t "
            "CROSS JOIN vals v), "
            "pmf AS (SELECT g.source, g.v, "
            "CAST(COALESCE(c.cnt, 0) AS BIGINT) AS f FROM grid g "
            "LEFT JOIN c ON c.source = g.source AND c.v = g.v), "
            "pairs AS (SELECT a.source AS sa, a.n AS na, b.source AS "
            "sb, b.n AS nb FROM tot a JOIN tot b "
            "ON a.source < b.source), "
            "j AS (SELECT p.sa, p.sb, p.na, p.nb, "
            "abs(a.f * p.nb - b.f * p.na) AS gap FROM pairs p "
            "JOIN pmf a ON a.source = p.sa "
            "JOIN pmf b ON b.source = p.sb AND b.v = a.v) "
            "SELECT sa AS source_a, sb AS source_b, na AS n_a, "
            "nb AS n_b, CAST(SUM(gap) AS DOUBLE) / "
            "(2.0 * CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS tv "
            "FROM j GROUP BY 1, 2, 3, 4 ORDER BY 1, 2"
        ),
        # pairwise unigram-count cosine: integer dots and norms, one
        # mirrored sqrt expression; inner term join drops
        # disjoint-vocabulary pairs
        "unigram_cosine_sources": (
            "WITH e AS (SELECT source, "
            "unnest(string_split(text, ' ')) AS term FROM documents), "
            "c AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM e GROUP BY 1, 2), "
            "d AS (SELECT a.source AS sa, b.source AS sb, "
            "SUM(a.n * b.n) AS dot FROM c a JOIN c b "
            "ON a.term = b.term AND a.source < b.source "
            "GROUP BY 1, 2), "
            "nrm AS (SELECT source, SUM(n * n) AS n2 FROM c "
            "GROUP BY 1) "
            "SELECT d.sa AS source_a, d.sb AS source_b, "
            "CAST(d.dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * "
            "CAST(nb.n2 AS DOUBLE)) AS cosine FROM d "
            "JOIN nrm na ON d.sa = na.source "
            "JOIN nrm nb ON d.sb = nb.source "
            "ORDER BY source_a, source_b"
        ),
        # TextRank keywords: unrolled PageRank over the distinct
        # word-adjacency graph, 1e-9 grid, word tiebreak
        "textrank_keywords": _textrank_oracle_sql(iters=3,
                                                  damping=0.85),
        # STL-lite period-7 decomposition over the zero-filled day
        # spine; trend kept ×7 integer, two mirrored divisions
        "stl_daily_decomp": (
            "WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day, "
            "CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1), "
            "bo AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM d), "
            "g AS (SELECT unnest(generate_series(d0, d1)) AS day "
            "FROM bo), "
            "x AS (SELECT g.day, COALESCE(d.c, 0) AS c FROM g "
            "LEFT JOIN d ON g.day = d.day), "
            "w AS (SELECT day, c, day % 7 AS dow, "
            "SUM(c) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND "
            "3 FOLLOWING) AS t7, COUNT(*) OVER (ORDER BY day ROWS "
            "BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS wn FROM x), "
            "v AS (SELECT day, dow, c, "
            "CASE WHEN wn = 7 THEN t7 END AS trend7, "
            "CASE WHEN wn = 7 THEN 7 * c - t7 END AS detr FROM w), "
            "s AS (SELECT dow, (CAST(SUM(detr) AS DOUBLE) / "
            "CAST(COUNT(detr) AS DOUBLE)) / 7.0 AS seasonal FROM v "
            "WHERE detr IS NOT NULL GROUP BY 1) "
            "SELECT CAST(v.day AS BIGINT) AS day, "
            "CAST(v.dow AS BIGINT) AS dow, v.c AS n_events, "
            "CAST(v.trend7 AS DOUBLE) AS trend7_sum, s.seasonal, "
            "CASE WHEN v.detr IS NOT NULL THEN "
            "CAST(v.detr AS DOUBLE) / 7.0 - s.seasonal END AS "
            "residual FROM v LEFT JOIN s ON v.dow = s.dow "
            "ORDER BY v.day"
        ),
        # Theil-Sen: discrete median (quantile_disc picks sorted
        # element ceil(n·q)−1) of the bit-identical pairwise slopes
        "theilsen_daily_slope": (
            "WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day, "
            "CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1), "
            "bo AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM d), "
            "g AS (SELECT unnest(generate_series(d0, d1)) AS day "
            "FROM bo), "
            "x AS (SELECT g.day, COALESCE(d.c, 0) AS c FROM g "
            "LEFT JOIN d ON g.day = d.day), "
            "s AS (SELECT CAST(b.c - a.c AS DOUBLE) / "
            "CAST(b.day - a.day AS DOUBLE) AS slope "
            "FROM x a JOIN x b ON b.day > a.day) "
            "SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM x) AS "
            "n_days, CAST(COUNT(*) AS BIGINT) AS n_pairs, "
            "quantile_disc(slope, 0.5) AS slope FROM s"
        ),
        # linear attribution: per-purchase equal credit over the
        # user's clicks in [t−1h, t); one mirrored division per row
        "linear_attribution": (
            "WITH e AS (SELECT event_id, user_id, event_type, "
            "epoch_us(ts) AS t, value FROM events), "
            "p AS (SELECT event_id, user_id, t, "
            "CAST(round(value * 100.0) AS BIGINT) AS vc FROM e "
            "WHERE event_type = 'purchase'), "
            "c AS (SELECT user_id, t FROM e "
            "WHERE event_type = 'click'), "
            "j AS (SELECT p.event_id, p.t, p.vc, "
            "CAST(COUNT(*) AS BIGINT) AS n_clicks FROM p JOIN c "
            "ON c.user_id = p.user_id AND c.t >= p.t - 3600000000 "
            "AND c.t < p.t GROUP BY 1, 2, 3) "
            "SELECT event_id, CAST(t // 86400000000 AS BIGINT) AS "
            "day, vc / 100.0 AS value, n_clicks, "
            "(vc / 100.0) / CAST(n_clicks AS DOUBLE) AS credit_each "
            "FROM j"
        ),
        # power-of-two padding buckets via forward ASOF against a
        # generated powers table (no float log2); mirrored waste ratio
        "pad_waste_by_bucket": (
            "WITH p AS (SELECT (CAST(1 AS BIGINT) << e) AS b FROM "
            "(SELECT unnest(generate_series(0, 40)) AS e)), "
            "d AS (SELECT greatest(n_chars, 1) AS n, n_chars "
            "FROM documents), "
            "a AS (SELECT d.n_chars, p.b FROM d ASOF JOIN p "
            "ON d.n <= p.b) "
            "SELECT b AS bucket, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(n_chars) AS BIGINT) AS real_tokens, "
            "CAST(b * COUNT(*) AS BIGINT) AS padded_tokens, "
            "CAST(b * COUNT(*) - SUM(n_chars) AS DOUBLE) / "
            "CAST(b * COUNT(*) AS DOUBLE) AS waste_ratio "
            "FROM a GROUP BY 1 ORDER BY 1"
        ),
        # PPJoin prefix-filtered join must EQUAL the quadratic
        # posting-join result at tau=0.5 (lossless-pruning proof)
        "ppjoin_neardup": (
            "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS "
            "t, len(string_split(text, ' ')) AS nt FROM documents), "
            "grams AS (SELECT DISTINCT doc_id, "
            "array_to_string(t[i:i+2], ' ') AS gram "
            "FROM (SELECT doc_id, t, unnest(generate_series(1, nt - "
            "2)) AS i FROM toks WHERE nt >= 3) x), "
            "counts AS (SELECT doc_id, COUNT(*) AS ng FROM grams "
            "GROUP BY doc_id), "
            "pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "COUNT(*) AS inter FROM grams a "
            "JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id "
            "GROUP BY 1, 2) "
            "SELECT p.id_a, p.id_b, CAST(p.inter AS BIGINT) AS "
            "inter, CAST(ca.ng + cb.ng - p.inter AS BIGINT) AS uni, "
            "p.inter / (ca.ng + cb.ng - p.inter) AS jaccard "
            "FROM pairs p JOIN counts ca ON p.id_a = ca.doc_id "
            "JOIN counts cb ON p.id_b = cb.doc_id "
            "WHERE p.inter / (ca.ng + cb.ng - p.inter) >= 0.5"
        ),
        # segmented-regression breakpoint: same exact-integer-moment
        # SSE tree per candidate, argmin ties to the earliest day
        "breakpoint_daily_trend": (
            "WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day, "
            "CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1), "
            "bo AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM d), "
            "g AS (SELECT unnest(generate_series(d0, d1)) AS day "
            "FROM bo), "
            "x AS (SELECT g.day, COALESCE(d.c, 0) AS c FROM g "
            "LEFT JOIN d ON g.day = d.day), "
            "z AS (SELECT day, c, ROW_NUMBER() OVER (ORDER BY day) "
            "- 1 AS xi FROM x), "
            "p AS (SELECT day, SUM(xi) OVER w AS px, SUM(c) OVER w "
            "AS py, SUM(xi * xi) OVER w AS pxx, SUM(xi * c) OVER w "
            "AS pxy, SUM(c * c) OVER w AS pyy, ROW_NUMBER() OVER "
            "(ORDER BY day) AS rn FROM z WINDOW w AS (ORDER BY day "
            "ROWS UNBOUNDED PRECEDING)), "
            "t AS (SELECT px AS tx, py AS ty, pxx AS txx, pxy AS "
            "txy, pyy AS tyy, rn AS nd FROM p WHERE rn = "
            "(SELECT MAX(rn) FROM p)), "
            "cand AS (SELECT p.day, p.rn AS nl, t.nd - p.rn AS nr, "
            "((CAST(p.pyy AS DOUBLE) - CAST(p.py AS DOUBLE) * "
            "CAST(p.py AS DOUBLE) / CAST(p.rn AS DOUBLE)) - "
            "(CAST(p.pxy AS DOUBLE) - CAST(p.px AS DOUBLE) * "
            "CAST(p.py AS DOUBLE) / CAST(p.rn AS DOUBLE)) * "
            "(CAST(p.pxy AS DOUBLE) - CAST(p.px AS DOUBLE) * "
            "CAST(p.py AS DOUBLE) / CAST(p.rn AS DOUBLE)) / "
            "(CAST(p.pxx AS DOUBLE) - CAST(p.px AS DOUBLE) * "
            "CAST(p.px AS DOUBLE) / CAST(p.rn AS DOUBLE))) + "
            "((CAST(t.tyy - p.pyy AS DOUBLE) - "
            "CAST(t.ty - p.py AS DOUBLE) * CAST(t.ty - p.py AS "
            "DOUBLE) / CAST(t.nd - p.rn AS DOUBLE)) - "
            "(CAST(t.txy - p.pxy AS DOUBLE) - CAST(t.tx - p.px AS "
            "DOUBLE) * CAST(t.ty - p.py AS DOUBLE) / "
            "CAST(t.nd - p.rn AS DOUBLE)) * (CAST(t.txy - p.pxy AS "
            "DOUBLE) - CAST(t.tx - p.px AS DOUBLE) * "
            "CAST(t.ty - p.py AS DOUBLE) / CAST(t.nd - p.rn AS "
            "DOUBLE)) / (CAST(t.txx - p.pxx AS DOUBLE) - "
            "CAST(t.tx - p.px AS DOUBLE) * CAST(t.tx - p.px AS "
            "DOUBLE) / CAST(t.nd - p.rn AS DOUBLE))) AS sse "
            "FROM p, t WHERE p.rn >= 2 AND t.nd - p.rn >= 2), "
            "pick AS (SELECT *, ROW_NUMBER() OVER (ORDER BY sse, "
            "day) AS k FROM cand) "
            "SELECT CAST(day AS BIGINT) AS split_day, "
            "CAST(nl AS BIGINT) AS n_left, CAST(nr AS BIGINT) AS "
            "n_right, sse FROM pick WHERE k = 1"
        ),
        # lead-lag cross-correlation at lags 0..7 on the zero-filled
        # spine; exact integer moments, one mirrored sqrt per lag
        "ccf_daily_lags": (
            "WITH e AS (SELECT event_type, epoch_us(ts) // "
            "86400000000 AS day FROM events), "
            "bo AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM e), "
            "g AS (SELECT unnest(generate_series(d0, d1)) AS day "
            "FROM bo), "
            "ac AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS c FROM "
            "e WHERE event_type = 'click' GROUP BY 1), "
            "bc AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS c FROM "
            "e WHERE event_type = 'purchase' GROUP BY 1), "
            "a AS (SELECT g.day, COALESCE(ac.c, 0) AS c FROM g "
            "LEFT JOIN ac ON g.day = ac.day), "
            "b AS (SELECT g.day, COALESCE(bc.c, 0) AS c FROM g "
            "LEFT JOIN bc ON g.day = bc.day), "
            "lags AS (SELECT unnest(generate_series(0, 7)) AS lag), "
            "j AS (SELECT l.lag, a.c AS av, b.c AS bv FROM lags l "
            "JOIN a ON TRUE JOIN b ON b.day = a.day + l.lag), "
            "m AS (SELECT lag, CAST(COUNT(*) AS BIGINT) AS n, "
            "SUM(av) AS sa, SUM(bv) AS sb, SUM(av * av) AS saa, "
            "SUM(bv * bv) AS sbb, SUM(av * bv) AS sab FROM j "
            "GROUP BY 1) "
            "SELECT CAST(lag AS BIGINT) AS lag, n AS n_days, "
            "CAST(n * sab - sa * sb AS DOUBLE) / "
            "sqrt(CAST(n * saa - sa * sa AS DOUBLE) * "
            "CAST(n * sbb - sb * sb AS DOUBLE)) AS ccf "
            "FROM m ORDER BY lag"
        ),
        # Wald-Wolfowitz runs test on day-over-day diff signs (zero
        # diffs dropped); one mirrored z expression
        "runs_test_daily": (
            "WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day, "
            "CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1), "
            "bo AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM d), "
            "g AS (SELECT unnest(generate_series(d0, d1)) AS day "
            "FROM bo), "
            "x AS (SELECT g.day, COALESCE(d.c, 0) AS c FROM g "
            "LEFT JOIN d ON g.day = d.day), "
            "df AS (SELECT day, c - LAG(c) OVER (ORDER BY day) AS dd "
            "FROM x), "
            "s AS (SELECT day, CASE WHEN dd > 0 THEN 1 ELSE -1 END "
            "AS sg FROM df WHERE dd IS NOT NULL AND dd <> 0), "
            "r AS (SELECT CAST(SUM(CASE WHEN prev IS NULL OR "
            "sg <> prev THEN 1 ELSE 0 END) AS BIGINT) AS runs FROM "
            "(SELECT sg, LAG(sg) OVER (ORDER BY day) AS prev "
            "FROM s)), "
            "ab AS (SELECT CAST(SUM(CASE WHEN sg = 1 THEN 1 ELSE 0 "
            "END) AS BIGINT) AS a, CAST(SUM(CASE WHEN sg = -1 THEN "
            "1 ELSE 0 END) AS BIGINT) AS b FROM s) "
            "SELECT a AS n_up, b AS n_down, runs AS n_runs, "
            "(CAST(runs AS DOUBLE) - (1.0 + 2.0 * CAST(a AS DOUBLE) "
            "* CAST(b AS DOUBLE) / (CAST(a AS DOUBLE) + "
            "CAST(b AS DOUBLE)))) / sqrt(2.0 * CAST(a AS DOUBLE) * "
            "CAST(b AS DOUBLE) * (2.0 * CAST(a AS DOUBLE) * "
            "CAST(b AS DOUBLE) - CAST(a AS DOUBLE) - "
            "CAST(b AS DOUBLE)) / ((CAST(a AS DOUBLE) + "
            "CAST(b AS DOUBLE)) * (CAST(a AS DOUBLE) + "
            "CAST(b AS DOUBLE)) * (CAST(a AS DOUBLE) + "
            "CAST(b AS DOUBLE) - 1.0))) AS z FROM ab, r"
        ),
        # Durbin-Watson: the residual denominator cancels in the
        # ratio, so scaled residuals are HUGEINT-exact; one division
        "durbin_watson_daily": (
            "WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day, "
            "CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1), "
            "bo AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM d), "
            "g AS (SELECT unnest(generate_series(d0, d1)) AS day "
            "FROM bo), "
            "x AS (SELECT g.day, COALESCE(d.c, 0) AS c FROM g "
            "LEFT JOIN d ON g.day = d.day), "
            "z AS (SELECT day, c, ROW_NUMBER() OVER (ORDER BY day) "
            "- 1 AS xi FROM x), "
            "m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, "
            "SUM(CAST(xi AS HUGEINT)) AS sx, "
            "SUM(CAST(c AS HUGEINT)) AS sy, "
            "SUM(CAST(xi AS HUGEINT) * xi) AS sxx, "
            "SUM(CAST(xi AS HUGEINT) * c) AS sxy FROM z), "
            "k AS (SELECT n, n * sxy - sx * sy AS bn, "
            "n * sxx - sx * sx AS bd, "
            "sy * (n * sxx - sx * sx) - (n * sxy - sx * sy) * sx "
            "AS cst FROM m), "
            "e AS (SELECT z.day, k.n * k.bd * z.c - k.cst - "
            "k.n * k.bn * z.xi AS ev FROM z, k), "
            "dd AS (SELECT ev, ev - LAG(ev) OVER (ORDER BY day) AS "
            "dv FROM e) "
            "SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM z) AS "
            "n_days, CAST(SUM(dv * dv) AS DOUBLE) / "
            "CAST(SUM(ev * ev) AS DOUBLE) AS dw FROM dd"
        ),
        # Brown-Forsythe: ANOVA F tree over |2v − 2·median| integer
        # deviations (2·median integral on the doubled grid); 1e-6
        "levene_value_by_type": (
            "WITH v AS (SELECT event_type, "
            "CAST(round(value * 100.0) AS BIGINT) AS vc FROM events), "
            "md AS (SELECT event_type, quantile_cont(vc, 0.5) AS med "
            "FROM v GROUP BY 1), "
            "d AS (SELECT v.event_type, abs(2 * v.vc - "
            "CAST(2.0 * md.med AS BIGINT)) AS dv FROM v JOIN md "
            "USING(event_type)), "
            "m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, "
            "SUM(dv) AS s, SUM(dv * dv) AS q FROM d GROUP BY 1), "
            "t AS (SELECT CAST(SUM(n) AS BIGINT) AS nn, "
            "CAST(COUNT(*) AS BIGINT) AS k, "
            "CAST(SUM(s) AS DOUBLE) AS st, "
            "CAST(SUM(q) AS DOUBLE) AS qt, "
            "SUM(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / "
            "CAST(n AS DOUBLE)) AS term FROM m), "
            "f AS (SELECT nn, k, "
            "((term - st * st / CAST(nn AS DOUBLE)) / "
            "CAST(k - 1 AS DOUBLE)) / "
            "((qt - term) / CAST(nn - k AS DOUBLE)) AS fv FROM t) "
            "SELECT nn AS n_rows, k AS n_groups, "
            "CAST(CASE WHEN sx >= 0 THEN floor(sx + 0.5) "
            "ELSE -floor(-sx + 0.5) END AS BIGINT) AS f_e6 "
            "FROM (SELECT nn, k, fv * 1000000.0 AS sx FROM f)"
        ),
    }
