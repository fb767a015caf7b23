"""Query registry: the engine's declared operator surface.

Every operator from SURVEY.md §2.3 registers here with
  - a Spark builder ``(spark, sf_dir) -> DataFrame`` and
  - (when SQL-expressible) an equivalent ANSI/DuckDB oracle SQL string.

``__spark_entry__.py`` re-exports these for the driver's verify
harness. The decorator keeps the two sides adjacent in source so the
column aliases provably line up (the harness hashes values under
name-sorted columns).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query builder, optionally with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str, *a: Any, **kw: Any) -> DataFrame:
            from ..session import tune

            tune(spark)
            return fn(spark, sf_dir, *a, **kw)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco


#: Keys a prior round's driver already attested (green hash-match row in
#: CORRECTNESS_r01/r02.json, or — for declared rows-only keys — a recorded
#: rows-only row).  The driver walks ``queries()`` in registration order
#: under a bounded 50-entry budget, so keys WITHOUT a recorded row yet —
#: plus any newly added key — must register first.  Keys in this set are
#: pushed to the back of the dict; everything else keeps its relative
#: registration order at the front.
_ATTESTED_PRIOR_ROUNDS: frozenset[str] = frozenset(
    {
        # --- round 1 green (CORRECTNESS_r01.json) ---
        "q3_shipping_priority", "q5_local_supplier_volume", "q10_returned_items",
        "subquery_above_avg", "pivot_event_matrix", "agg_statistics",
        "agg_percentiles", "q7_nation_trade_volume", "q8_market_share",
        "scan_parquet", "scan_csv_roundtrip", "scan_jsonl_roundtrip",
        "project", "filter_predicate", "join_inner_equi", "join_left_outer",
        "join_right_outer", "join_full_outer", "join_semi", "join_anti",
        "join_broadcast", "join_theta_range", "agg_hash_group", "agg_distinct",
        "grouping_sets_cube_rollup", "sort_limit_topk",
        "set_union_intersect_except", "scalar_string_fns", "scalar_date_fns",
        "scalar_math_fns", "json_extract", "join_skew_salted",
        "join_bucketed_colocated", "scan_orc_roundtrip", "train_test_split",
        "histogram_fixed_width", "sql_surface", "agg_argmax_mode",
        "agg_collect_ordered", "sample_stratified", "data_profile",
        "window_ranking", "window_analytic", "window_running_agg",
        "sessionize_events", "window_range_time", "window_distribution",
        "array_map_fns", "text_tokenize_stats",
        # --- round 2 green (CORRECTNESS_r02.json) ---
        "agg_approx_distinct", "asof_join", "corpus_mix_weighted",
        "decontaminate_ngram", "dedup_cluster_cc", "dedup_exact",
        "dedup_ngram_jaccard", "doc_chunk_sliding", "embedding_neardup",
        "embedding_quantize", "funnel_conversion", "fuzzy_join_levenshtein",
        "merge_upsert", "multimodal_columns", "multimodal_frame_sample",
        "multimodal_resize", "outlier_zscore", "pack_sequences",
        "partitioned_sink_roundtrip", "q14_promo_revenue", "q19_bracket_or",
        "q2_min_cost_supplier", "q4_order_priority", "q6_forecast_revenue",
        "retention_cohorts", "scd2_intervals", "semantic_dedup",
        "similarity_topk", "stream_dedup_watermark",
        "stream_sessionize_stateful", "stream_static_join",
        "stream_tumbling_agg", "text_bm25", "text_fingerprint",
        "text_lang_id", "text_quality_score", "text_redact_pii", "text_tfidf",
        "text_token_count", "time_bucket_rollup", "udaf", "udf_scalar",
        "udtf_expand",
        # --- round 2 rows-only recorded (declared no-oracle keys) ---
        "dedup_near_minhash", "dedup_simhash", "similarity_topk_lsh",
        "similarity_topk_ivf",
        # --- round 3 green (CORRECTNESS_r03.json) ---
        "q9_product_profit", "q11_important_parts", "q12_priority_class",
        "q13_order_distribution", "q15_top_supplier",
        "q16_part_supplier_variety", "q17_small_qty_revenue",
        "q18_large_volume", "q20_promotion_suppliers", "q21_late_shippers",
        "q22_idle_customers", "agg_approx_percentile", "unpivot_metrics",
        "sql_lateral_topn", "join_null_safe", "join_range_binned",
        "agg_correlation", "agg_boolean", "session_window_native",
        "ngram_topk", "corpus_shuffle_shard", "sample_reservoir_per_key",
        "corpus_clean_pipeline", "text_gopher_rules", "text_rare_token_stats",
        "embedding_normalize", "embedding_centroid_per_label",
        "scan_binaryfile", "stream_stream_join", "time_spine_gapfill",
        "incremental_rollup_merge", "skyline_pareto", "window_fill_forward",
        "cumulative_distinct_users", "asof_join_nearest",
        "interval_merge_islands", "time_weighted_avg", "sketch_rollup_hll",
        "agg_bitmap_distinct", "sql_recursive_cte", "json_variant_extract",
        "regexp_extract_all", "map_fns", "dedup_lines_c4",
        "text_repetition_filter", "q3_shipping_priority",
        "q5_local_supplier_volume", "q10_returned_items",
        # round 3 rows-only recorded
        "embedding_neardup_lsh",
    }
)


#: Keys whose ATTESTATION changed in the CURRENT round (round 4): new
#: keys, keys whose rows-only declaration was upgraded to a real
#: oracle (report ingest via the pure-Python golden CSV; PCA via
#: invariant booleans), and keys whose oracle text changed (the
#: shingle-df cap).  They must re-run through the driver's bounded
#: 50-key window, so they sort FIRST.
_ADDED_THIS_ROUND: frozenset[str] = frozenset(
    {
        "report_ingest", "stream_report_ingest", "embedding_pca_per_label",
        "data_profile_approx", "dedup_ngram_jaccard", "dedup_cluster_cc",
        # rows-only → attested conversions (quality booleans + oracle-
        # recomputed exact-side counts; see each key's docstring)
        "dedup_near_minhash", "dedup_simhash", "similarity_topk_lsh",
        "similarity_topk_ivf", "embedding_neardup_lsh",
        # new round-4 operators
        "dedup_minhash_portable", "agg_bitmap_intersect", "agg_approx_topk",
        "scan_xml_roundtrip", "stream_incremental_hll", "dedup_corpus_end2end",
        "feature_quantile_bin", "feature_minmax_scale", "feature_onehot_topk",
        "agg_linear_regression", "graph_pagerank",
        "graph_triangle_count", "market_basket_pairs", "anomaly_mad",
        "rfm_segmentation", "join_interval_overlap", "quality_linear_score",
        "stream_foreachbatch_upsert", "join_spatial_grid",
        "pattern_detect_sequence", "window_ewma", "table_diff_audit",
        "time_bucket_ohlc", "sql_pipe_syntax", "sql_parameterized",
        "backlog_open_orders", "knn_label_accuracy",
        "eval_classification_metrics", "join_scd2_pointintime",
        "window_ratio_to_report", "scan_schema_evolution",
        "sample_class_balanced", "cluster_kmeans_lloyd",
        # round-4 continuation batch (fills the 50-key window exactly;
        # sql_group_by_all and the later-session keys deliberately stay
        # tier-1 — locally parity-green, driver row lands next round)
        "cdc_apply_changes", "agg_skew_salted", "dedup_containment",
        "zorder_cluster", "text_entropy_quality",
        "udf_map_in_arrow",
    }
)


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from . import analytics  # noqa: F401
    from . import relational  # noqa: F401
    from . import windows  # noqa: F401
    from . import text  # noqa: F401
    from . import dedup  # noqa: F401
    from . import similarity  # noqa: F401
    from . import udfs  # noqa: F401
    from . import ingest_queries  # noqa: F401
    from . import multimodal  # noqa: F401
    from . import streaming_queries  # noqa: F401
    from . import temporal  # noqa: F401
    from . import sketches  # noqa: F401
    from . import sql_features  # noqa: F401
    from . import corpus  # noqa: F401
    from . import features  # noqa: F401
    from . import spatial  # noqa: F401

    # Reorder for the driver's bounded attestation window (round 1 cut off
    # at exactly 50 entries): keys added/changed this round first (their
    # recorded rows are stale or absent), any unattested backlog next,
    # already-attested keys last.  If the window truncates, it drops keys
    # that already hold a green row, never one waiting for attestation.
    def tier(k: str) -> int:
        if k in _ADDED_THIS_ROUND:
            return 0
        if k in _ATTESTED_PRIOR_ROUNDS:
            return 2
        return 1

    ordered = sorted(QUERIES.items(), key=lambda kv: tier(kv[0]))
    QUERIES.clear()
    QUERIES.update(ordered)
