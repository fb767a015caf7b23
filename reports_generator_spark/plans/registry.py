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


#: Keys the round-1 driver already attested green (CORRECTNESS_r01.json).
#: The driver walks ``queries()`` in registration order under a bounded
#: budget (round 1 stopped at entry #50), so keys WITHOUT a green row yet
#: — plus any newly added key — must register first.  Keys in this set are
#: pushed to the back of the dict; everything else keeps its relative
#: registration order at the front.
_ATTESTED_PRIOR_ROUNDS: frozenset[str] = frozenset(
    {
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
        # NOTE: agg_approx_distinct is deliberately NOT here — its round-1
        # row was err:no_oracle; it re-runs in the front block.
    }
)


#: Keys first registered in the CURRENT round.  They sort after the
#: older unattested backlog so a truncated driver window never starves
#: a key that has already waited a round.
_ADDED_THIS_ROUND: frozenset[str] = frozenset(
    {
        "q4_order_priority", "q12_priority_class", "q14_promo_revenue",
        "q19_bracket_or", "funnel_conversion", "retention_cohorts",
        "outlier_zscore", "ngram_topk", "embedding_neardup_lsh",
        "q2_min_cost_supplier", "q6_forecast_revenue", "q9_product_profit",
        "q11_important_parts", "q13_order_distribution", "q15_top_supplier",
        "q16_part_supplier_variety", "q17_small_qty_revenue",
        "q18_large_volume", "q20_promotion_suppliers", "q21_late_shippers",
        "q22_idle_customers", "stream_stream_join", "corpus_shuffle_shard",
        "sample_reservoir_per_key", "corpus_clean_pipeline",
        "agg_approx_percentile", "unpivot_metrics", "sql_lateral_topn",
        "time_spine_gapfill", "scan_binaryfile", "text_gopher_rules",
        "join_null_safe", "join_range_binned", "embedding_normalize",
        "embedding_centroid_per_label", "text_rare_token_stats",
        "session_window_native", "embedding_pca_per_label",
        "incremental_rollup_merge", "agg_correlation", "agg_boolean",
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

    # Reorder for the driver's bounded attestation window (round 1 cut off
    # at exactly 50 entries): oldest-unattested keys first, keys added in
    # the current round next, already-attested keys last.  If the window
    # truncates, it drops the newest work (attestable next round), never a
    # key that has been waiting since a prior round.
    def tier(k: str) -> int:
        if k in _ATTESTED_PRIOR_ROUNDS:
            return 2
        if k in _ADDED_THIS_ROUND:
            return 1
        return 0

    ordered = sorted(QUERIES.items(), key=lambda kv: tier(kv[0]))
    QUERIES.clear()
    QUERIES.update(ordered)
