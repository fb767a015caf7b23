"""Physical-plan assertions: the 100 TB posture is checkable locally.

A correct answer with the wrong plan shape (no pushdown, no broadcast,
global sort for a top-k) would still pass the oracle tests but die at
scale — these tests pin the plan properties that matter.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from reports_generator_spark.plans import registry

from conftest import SF_DIR

registry.load_all()


def plan_str(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark):
    """A simple equality predicate must reach the parquet reader.
    (filter_predicate's OR-of-modulo is deliberately non-pushable, so
    the pushdown check uses join_inner_equi's status filter.)"""
    df = registry.QUERIES["join_inner_equi"](spark, SF_DIR)
    plan = plan_str(df)
    assert "EqualTo(o_orderstatus,F)" in plan


def test_projection_prunes_columns(spark):
    df = registry.QUERIES["project"](spark, SF_DIR)
    plan = plan_str(df)
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read, plan
    schema_line = read[0]
    assert "p_partkey" in schema_line and "p_retailprice" in schema_line
    # untouched columns must NOT be read
    assert "p_brand" not in schema_line and "p_size" not in schema_line


def test_dim_join_broadcasts(spark):
    df = registry.QUERIES["join_broadcast"](spark, SF_DIR)
    plan = plan_str(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # dims must never shuffle the fact side


def test_topk_is_take_ordered(spark):
    df = registry.QUERIES["sort_limit_topk"](spark, SF_DIR)
    plan = plan_str(df)
    assert "TakeOrderedAndProject" in plan
    # no global sort stage for a LIMIT 10


def test_flagship_has_partial_aggregation(spark):
    df = registry.QUERIES["agg_hash_group"](spark, SF_DIR)
    plan = plan_str(df)
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert "partial_" in plan


def test_semi_join_stays_semi(spark):
    df = registry.QUERIES["join_semi"](spark, SF_DIR)
    plan = plan_str(df)
    assert "LeftSemi" in plan


def test_ingest_has_no_single_partition_exchange(spark):
    """The reference forced repartition(1) (Proof.scala:111); the
    rebuilt ingest must never serialize onto one partition."""
    df = registry.QUERIES["report_ingest"](spark, SF_DIR)
    plan = plan_str(df, "extended")
    assert "SinglePartition" not in plan


def test_whole_stage_codegen_covers_scalar_fns(spark):
    df = registry.QUERIES["scalar_math_fns"](spark, SF_DIR)
    # simple mode marks codegen'd operators with a "*(stage)" prefix
    plan = plan_str(df, "simple")
    assert "*(1)" in plan


def test_partitioned_read_prunes_partitions(spark):
    """A filter on the partition column must become a PartitionFilter
    (directory pruning), not a data filter over the full scan."""
    df = registry.QUERIES["partitioned_sink_roundtrip"](spark, SF_DIR)
    plan = plan_str(df)
    assert "PartitionFilters" in plan
    pf_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("event_type" in ln for ln in pf_lines), plan


def test_asof_join_is_single_shuffle_window(spark):
    """The as-of join must plan as union + window (one hash exchange
    on the key), never a BroadcastNestedLoopJoin / cartesian range
    join."""
    df = registry.QUERIES["asof_join"](spark, SF_DIR)
    plan = plan_str(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan


def test_bucketed_join_has_no_exchange_on_join_keys(spark):
    """Both sides are bucketBy(8, custkey): the sort-merge join must
    read co-located buckets without shuffling either side."""
    df = registry.QUERIES["join_bucketed_colocated"](spark, SF_DIR)
    plan = plan_str(df)
    assert "SortMergeJoin" in plan
    ex_lines = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert not any("custkey" in ln for ln in ex_lines), plan


def test_theta_range_bounded_build_is_bhj(spark):
    """The registered join_theta_range bounds its build side (top-2
    suppliers per nation) and must plan as a broadcast hash join with
    the range predicate as a residual — never a nested-loop."""
    df = registry.QUERIES["join_theta_range"](spark, SF_DIR)
    plan = plan_str(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_theta_range_unbounded_didactic_plan(spark):
    """The UNREGISTERED didactic form (all suppliers × same-nation
    customers): Spark still plans the equi part as a hash/merge join
    with the range as a post-join filter — not a pure BNLJ. Kept here
    as a plan-shape note; the registered key bounds its build side
    because the OUTPUT of this form is quadratic-per-nation."""
    from pyspark.sql import functions as F

    s = spark.read.parquet(f"{SF_DIR}/supplier.parquet")
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    df = s.join(
        c, (s.s_nationkey == c.c_nationkey) & (s.s_acctbal > c.c_acctbal)
    ).select("s_suppkey", "c_custkey")
    plan = plan_str(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_salted_join_spreads_hot_keys(spark):
    """The salted join must shuffle on (key, salt), not the bare hot
    key."""
    df = registry.QUERIES["join_skew_salted"](spark, SF_DIR)
    plan = plan_str(df, "extended")
    assert "__salt" in plan


def test_no_antipatterns_in_any_batch_plan(spark):
    """Sweep every batch query's physical plan for scale
    anti-patterns: cartesian/nested-loop joins (except the intentional
    theta-range join) and row-at-a-time Python UDFs (BatchEvalPython —
    everything Python must go through Arrow)."""
    skip = {
        # streaming queries execute at build time
        "stream_tumbling_agg", "stream_dedup_watermark", "stream_static_join",
        "stream_sessionize_stateful", "stream_report_ingest",
        "stream_stream_join",
        # intentional broadcast-cross shapes: brute-force/IVF similarity
        # broadcast a tiny side (query vectors / centroids) against the
        # corpus — that IS the scale plan; tfidf broadcasts a 1-row
        # corpus-size aggregate
        "similarity_topk", "similarity_topk_ivf", "embedding_neardup",
        "semantic_dedup", "knn_label_accuracy",
        # k-means broadcasts the k-row centroid state against the corpus
        # each round — map-side argmin IS the scale plan
        "cluster_kmeans_lloyd",
        "text_tfidf",
        # bm25 broadcasts its 1-row (n_docs, avgdl) corpus-stats frame
        "text_bm25",
        # scalar-threshold queries attach a 1-row aggregate via broadcast
        # cross-join (map-side, zero shuffle of the big side) — the
        # inequality against the scalar leaves no equi-key to hash on
        "q11_important_parts", "q22_idle_customers", "feature_minmax_scale",
        # same 1-row-stats broadcast-cross shape: zorder attaches the
        # min/max frame, approx binning attaches the 9 GK cut-points
        "zorder_cluster", "feature_quantile_bin_approx", "feature_winsorize",
        # round-5 members of the same 1-row-stats broadcast-cross class:
        # benford attaches the 9-digit total, target-encode the global
        # mean, robust-scale the median/IQR frame, seasonality the
        # overall-average frame; eval_ranking_metrics broadcasts the
        # bounded 200-probe set against the corpus (the knn posture)
        "benford_first_digit", "feature_target_encode", "feature_robust_scale",
        "seasonality_dow_index", "eval_ranking_metrics",
        # calendar-spine cross type-dimension: both sides are provably
        # tiny derived frames (days × event types); the broadcast cross
        # is the intended plan
        "time_spine_gapfill",
        # 1-row-stats broadcast-cross again: the holdout cutoff date is
        # a 1-row max aggregate attached to the date-cardinality series
        "forecast_seasonal_naive",
        # same class: PSI attaches the 1-row period totals to 10 bins,
        # CUSUM the 1-row series mean to the date-cardinality series
        "drift_psi", "anomaly_cusum_changepoint",
        # round-6 members of the 1-row-stats broadcast-cross class:
        # bootstrap joins its two 1-row frames (full mean × CI pick),
        # time-decay attaches the 1-row corpus-max timestamp anchor,
        # assoc-rules the 1-row basket total, impute-median the 1-row
        # global median, streaks / Kaplan-Meier / ACF their 1-row
        # series totals (ACF also crosses the 7-row lag dimension —
        # a bounded spine, same class as time_spine_gapfill)
        "bootstrap_ci_mean", "time_decay_score", "assoc_rules_lift",
        "feature_impute_median", "streak_consecutive_days",
        "survival_kaplan_meier", "timeseries_acf",
        # recall audit folds its three 1-row pair counts (truth /
        # candidates / hits) into one row — same 1-row-stats class,
        # as does consistent-sampling's three-count consistency row
        "dedup_minhash_recall_audit", "sample_consistent_multitable",
        # round-7 members of the 1-row-stats broadcast-cross class:
        # the Bloom filter is a 1-row 64 KiB broadcast build side
        # (test_bloom_prefilter_is_selective separately proves the
        # pre-filter prunes), compaction folds its two 1-row
        # file-count frames into the audit row
        "join_bloom_pruned", "compact_small_files_binpack",
        # bounded broadcast probe set against the packed corpus with a
        # != residual (the knn/similarity posture)
        "embedding_bitpack_hamming_topk",
        # t-closeness crosses three provably tiny derived frames
        # (segments × bins × 1-row total) to densify the EMD grid —
        # the time_spine_gapfill bounded-spine class
        "tcloseness_audit",
        # HLL intersect folds its two 1-row aggregate frames (exact
        # counts × sketch estimates) into the audit row — the
        # 1-row-stats broadcast-cross class
        "agg_hll_intersect_estimate",
        # round-8 members of the 1-row-stats broadcast-cross class: the
        # zone-map audit folds its three 1-row frames (file totals ×
        # overlap stats × selected rows) into the audit row, the
        # incremental scan its two (incremental slice × full table)
        "scan_file_zonemap_skipping_audit", "scan_incremental_since_snapshot",
        # round-9 member: the commit-conflict audit folds its two 1-row
        # frames (v2 count/checksum × final count/checksum+protocol
        # facts) into the audit row — 1-row-stats broadcast-cross class
        "manifest_commit_conflict_detect",
        # round-10 members of the same class: the MERGE audit folds its
        # two 1-row frames (post-merge count/checksum × CDC counts) into
        # the audit row; the AS-OF key folds its mid-resolution and
        # boundary-resolution 1-row frames the same way
        "merge_mor_transactional", "scan_time_travel_as_of_timestamp",
        # round-10 fifth batch, same 1-row-stats class: RESTORE folds
        # its restored-head frame with the bad-version frame; the refs
        # key folds main-before × dev-head × tag-after-ff scalar frames
        "table_rollback_restore", "scan_branch_tag_refs",
        # round-10 ninth batch, same class: branch-WAP folds the final
        # main frame with the red-batch count frame
        "sink_wap_branch_publish",
        # round-11 members: NB crosses the 5-row class dim with the
        # broadcast 200-row vocab to densify the model grid (the
        # time_spine_gapfill bounded-spine class; the corpus-side joins
        # are BroadcastHashJoin, separately plan-asserted); the
        # clone-vacuum key folds its two 1-row head frames (src ×
        # clone count/checksum) into the audit row
        "train_naive_bayes_multinomial", "vacuum_clone_reference_safe",
    }
    bad = {}
    for name, fn in sorted(registry.QUERIES.items()):
        if name in skip:
            continue
        plan = plan_str(fn(spark, SF_DIR))
        hits = [
            p
            for p in ("CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython")
            if p in plan
        ]
        if hits:
            bad[name] = hits
    assert not bad, bad


def test_decontaminate_broadcasts_eval_set(spark):
    """The eval shingle set must broadcast — the corpus side of the
    contamination semi-join must not shuffle (that's what makes the
    sweep runnable per-release on the full corpus)."""
    df = registry.QUERIES["decontaminate_ngram"](spark, SF_DIR)
    plan = plan_str(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_data_profile_is_single_scan(spark):
    """All five column profiles come out of ONE scan+aggregate (the
    oracle spells it as 5 scans; the engine must not)."""
    df = registry.QUERIES["data_profile"](spark, SF_DIR)
    plan = plan_str(df, "simple")
    assert plan.count("FileScan parquet") == 1, plan


def test_chunking_is_shuffle_free(spark):
    """Sliding-window chunking is embarrassingly parallel — any
    Exchange in the plan would be a scale bug."""
    df = registry.QUERIES["doc_chunk_sliding"](spark, SF_DIR)
    plan = plan_str(df, "simple")
    assert "Exchange" not in plan, plan


def test_quantize_is_shuffle_free(spark):
    df = registry.QUERIES["embedding_quantize"](spark, SF_DIR)
    plan = plan_str(df, "simple")
    assert "Exchange" not in plan, plan


def test_ivf_assignment_never_shuffles_corpus(spark):
    """IVF cell assignment is a map-side array argmax over broadcast
    centroids: the corpus must never hash-partition by vector id (the
    old explode-n_cells×-then-window form did exactly that)."""
    from reports_generator_spark.operators.similarity import cosine_topk_ivf
    from reports_generator_spark.sources import load_table

    df = cosine_topk_ivf(load_table(spark, SF_DIR, "embeddings"), [0, 1, 2, 3, 4], k=5)
    plan = plan_str(df)
    ex_lines = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert not any("vec_id" in ln for ln in ex_lines), plan


def test_semantic_dedup_is_argmax_plus_partial_agg(spark):
    """SemDeDup assignment must be shuffle-free (no per-id window) and
    the per-cell representative a partial-aggregable max_by — the only
    wide op is the final n_cells-row groupBy."""
    df = registry.QUERIES["semantic_dedup"](spark, SF_DIR)
    plan = plan_str(df)
    # no window over the corpus (the 16-row centroid ranking window is fine)
    assert "windowspecdefinition(vec_id" not in plan, plan
    ex_lines = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert not any("vec_id" in ln for ln in ex_lines), plan
    assert "partial_max_by" in plan


def test_q6_predicates_reach_parquet_scan(spark):
    """Q6 is pure scan+agg: its date/discount/quantity predicates must
    all push into the parquet reader, and the only exchange is the
    1-row final combine."""
    df = registry.QUERIES["q6_forecast_revenue"](spark, SF_DIR)
    plan = plan_str(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed, plan
    line = pushed[0]
    for frag in ("l_shipdate", "l_discount", "l_quantity"):
        assert frag in line, line


def test_corpus_shuffle_shard_single_exchange(spark):
    """The deterministic shuffle must cost exactly ONE hash exchange
    (on shard) — no global sort, no extra repartition."""
    df = registry.QUERIES["corpus_shuffle_shard"](spark, SF_DIR)
    plan = plan_str(df, "simple")
    assert plan.count("Exchange") == 1, plan
    assert "rangepartitioning" not in plan.lower(), plan
    assert "SinglePartition" not in plan, plan


def test_corpus_clean_dedup_is_partial_agg(spark):
    """The fingerprint dedup must partial-aggregate (min_by combines
    map-side) so the shuffle carries at most one candidate per
    (partition, fp) — never a collect-all-rows-per-key pattern."""
    df = registry.QUERIES["corpus_clean_pipeline"](spark, SF_DIR)
    phys = plan_str(df, "simple")
    # min_by's struct buffer plans as SortAggregate; what matters is the
    # partial (map-side) phase before the fp exchange
    assert "partial_min_by" in phys, phys


def test_q9_dims_broadcast_fact_shuffles_once(spark):
    """Q9's three dimension joins must all broadcast; the lineitem side
    shuffles only for the final group-by."""
    df = registry.QUERIES["q9_product_profit"](spark, SF_DIR)
    plan = plan_str(df, "simple")
    assert plan.count("BroadcastHashJoin") == 3, plan
    assert "SortMergeJoin" not in plan, plan


def test_gopher_rules_shuffle_free(spark):
    """Quality rules are per-row array expressions — any Exchange
    would mean the filter no longer runs at scan speed."""
    df = registry.QUERIES["text_gopher_rules"](spark, SF_DIR)
    plan = plan_str(df, "simple")
    assert "Exchange" not in plan, plan


def test_range_binned_join_is_hash_join(spark):
    """The binned interval join must plan as a bucket equi-join —
    the whole point is avoiding the nested-loop fallback."""
    df = registry.QUERIES["join_range_binned"](spark, SF_DIR)
    plan = plan_str(df, "simple")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "HashJoin" in plan, plan


def test_repetition_filter_shuffle_free(spark):
    """Both repetition metrics (distinct fraction + max equal-run over
    the sorted word array) are per-row array expressions — an Exchange
    would mean the filter no longer runs at scan speed."""
    df = registry.QUERIES["text_repetition_filter"](spark, SF_DIR)
    plan = plan_str(df, "simple")
    assert "Exchange" not in plan, plan


def test_regexp_extract_all_shuffle_free(spark):
    df = registry.QUERIES["regexp_extract_all"](spark, SF_DIR)
    plan = plan_str(df, "simple")
    assert "Exchange" not in plan, plan


def test_interval_islands_single_exchange(spark):
    """Both islands windows and the final groupBy share the user_id
    hash partitioning: exactly ONE data exchange (plus AQE's optional
    coalesce) — a second hashpartitioning would mean the sort/group
    didn't reuse the window's shuffle."""
    df = registry.QUERIES["interval_merge_islands"](spark, SF_DIR)
    plan = plan_str(df, "simple")
    ex_lines = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert len(ex_lines) == 1, plan


def test_bitmap_distinct_has_partial_agg(spark):
    """The bitmap state build must partial-aggregate (map-side
    bitmap_construct_agg) so the shuffle carries per-bucket bitmaps,
    not raw ids."""
    df = registry.QUERIES["agg_bitmap_distinct"](spark, SF_DIR)
    plan = plan_str(df)
    assert "partial_bitmap_construct_agg" in plan.lower().replace(" ", "_") or (
        "HashAggregate" in plan and "bitmap_construct_agg" in plan
    ), plan


def test_dpp_injects_dynamic_pruning(spark):
    """join_dpp_partition_pruned's fact scan must carry a
    dynamicpruningexpression in PartitionFilters — the whole point of
    the partition layout."""
    df = registry.QUERIES["join_dpp_partition_pruned"](spark, SF_DIR)
    plan = plan_str(df)
    assert "dynamicpruning" in plan.lower(), plan


def test_zorder_scan_prunes_partitions(spark):
    """zorder_pruned_scan must push the Morton-prefix set into the
    scan's PartitionFilters (directory-level pruning, 15/16 skipped)."""
    df = registry.QUERIES["zorder_pruned_scan"](spark, SF_DIR)
    plan = plan_str(df)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "zp" in pf[0], plan
    # the box residual must also be present (exactness does not rely
    # on the partition filter alone)
    assert "bx" in plan and "bby" in plan


def test_bloom_prefilter_is_selective(spark):
    """The Bloom pre-filter must actually prune: rows entering the
    join shuffle ≈ urgent fraction (~20%) + ~1% false positives, far
    under the full fact table."""
    from pyspark.sql import functions as F

    from reports_generator_spark.plans.scale_joins import (
        bloom_build,
        bloom_might_contain_sql,
    )
    from reports_generator_spark.sources import load_table

    o = load_table(spark, SF_DIR, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    words = bloom_build(o.select("o_orderkey"), "o_orderkey")
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey")
    total = li.count()
    bf = spark.createDataFrame([(words,)], "bf_words: array<bigint>")
    passed = (
        li.join(F.broadcast(bf))
        .filter(F.expr(bloom_might_contain_sql("l_orderkey")))
        .count()
    )
    truth = (
        li.join(o.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"))
        .count()
    )
    assert passed >= truth  # no false negatives, ever
    # selectivity: pass-rate bounded by truth + 5% FP headroom
    assert passed <= truth + 0.05 * total, (passed, truth, total)


def test_pruning_layout_builders_idempotent(spark):
    """ensure_dpp_tables / ensure_zorder_table must be no-ops on the
    second call (bench warmup contract: layout is written once and
    found, not rebuilt, by every subsequent session)."""
    import os
    import time
    from urllib.parse import urlparse

    from reports_generator_spark.plans.scale_joins import (
        ensure_dpp_tables,
        ensure_zorder_table,
    )

    t_fact, t_dim = ensure_dpp_tables(spark, SF_DIR)
    t_z = ensure_zorder_table(spark, SF_DIR)
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path

    def mtime(table):
        loc = os.path.join(warehouse, table.lower())
        return max(
            os.path.getmtime(os.path.join(dp, f))
            for dp, _, fs in os.walk(loc)
            for f in fs
        )

    before = [mtime(t) for t in (t_fact, t_dim, t_z)]
    time.sleep(1.1)
    assert ensure_dpp_tables(spark, SF_DIR) == (t_fact, t_dim)
    assert ensure_zorder_table(spark, SF_DIR) == t_z
    assert [mtime(t) for t in (t_fact, t_dim, t_z)] == before


def test_zonemap_filtered_scan_actually_skips(spark):
    """scan_file_zonemap_skipping_audit's output proves overlap math;
    this proves the READER skips: a filtered scan over the sorted
    layout must emit no more rows than the overlapping files hold
    (parquet footer min/max pruning), far below the table total, and
    the range predicate must reach the scan as PushedFilters."""
    from reports_generator_spark.plans.scale_joins import (
        _ZM_HI_FRAC,
        _ZM_LO_FRAC,
        ensure_zonemap_table,
    )

    path, mx = ensure_zonemap_table(spark, SF_DIR)
    lo, hi = int((mx + 1) * _ZM_LO_FRAC), int((mx + 1) * _ZM_HI_FRAC)
    lake = spark.read.parquet(path)
    total = lake.count()

    filtered = lake.filter(F.col("o_orderkey").between(lo, hi))
    n_sel = filtered.count()
    plan = plan_str(filtered)
    assert "GreaterThanOrEqual(o_orderkey" in plan and "LessThanOrEqual(o_orderkey" in plan

    # overlapping-file row budget, computed relationally like the key
    per_file = (
        lake.select("o_orderkey", F.col("_metadata.file_path").alias("fp"))
        .groupBy("fp")
        .agg(F.min("o_orderkey").alias("mn"), F.max("o_orderkey").alias("mxk"),
             F.count(F.lit(1)).alias("n"))
    )
    budget = (
        per_file.filter((F.col("mn") <= hi) & (F.col("mxk") >= lo))
        .agg(F.sum("n")).first()[0]
    )
    # actual reader output rows from the executed scan's SQL metrics
    filtered.collect()
    ep = filtered._jdf.queryExecution().executedPlan()
    leaves = ep.collectLeaves()
    scan_rows = None
    for i in range(leaves.size()):
        node = leaves.apply(i)
        m = node.metrics()
        if m.contains("numOutputRows"):
            scan_rows = m.apply("numOutputRows").value()
            break
    assert scan_rows is not None
    assert scan_rows <= budget < total, (scan_rows, budget, total)


def test_aqe_skew_join_splits_hot_partition(spark):
    """join_skew_aqe_adaptive must show skew=true on its SortMergeJoin
    in the AQE FINAL plan (only observable after execution — the split
    decision comes from runtime map-output sizes)."""
    df = registry.QUERIES["join_skew_aqe_adaptive"](spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan
    # restore the lowered thresholds for subsequent tests in this session
    from reports_generator_spark.session import tune

    tune(spark)


def test_bucket_point_lookup_prunes_buckets(spark):
    """The point lookup on the bucket key must read 1 of 8 buckets."""
    df = registry.QUERIES["bucket_pruned_point_lookup"](spark, SF_DIR)
    plan = plan_str(df)
    assert "SelectedBucketsCount: 1 out of 8" in plan, plan


def test_aqe_coalesces_small_shuffles(spark):
    """Session-wide AQE partition coalescing must actually fire: the
    flagship aggregation's 32-partition shuffle collapses to a few
    post-shuffle partitions at fixture sizes (the runtime behavior the
    adaptive configs in session.RUNTIME_CONF exist for)."""
    from reports_generator_spark.session import tune

    tune(spark)  # restore defaults in case a skew/threshold test ran first
    df = registry.QUERIES["agg_hash_group"](spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead coalesced" in plan, plan


def test_udtf_table_argument_is_arrow(spark):
    """The TABLE-argument UDTF must cross via Arrow, not row pickling."""
    df = registry.QUERIES["udtf_table_argument"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPythonUDTF" in plan
    assert "BatchEvalPythonUDTF" not in plan


def test_parquet_aggregate_pushdown_reaches_footer_stats(spark):
    """COUNT/MIN/MAX must be answered by the scan itself (footer
    statistics), not by aggregating decoded rows."""
    df = registry.QUERIES["agg_pushdown_parquet_stats"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedAggregation: [COUNT(*)" in plan, plan
    from reports_generator_spark.session import tune

    tune(spark)  # restore the V1 source list for subsequent tests


def test_topk_per_group_uses_window_group_limit(spark):
    """rank()<=k per group must trigger WindowGroupLimit (per-partition
    top-k maintained during the sort, not a full window over every
    row — the Spark 3.5+ rank-limit pushdown)."""
    df = registry.QUERIES["sql_qualify_topn"](spark, SF_DIR)
    plan = plan_str(df)
    assert "WindowGroupLimit" in plan, plan


def test_asof_tolerance_keeps_single_shuffle_window(spark):
    """Tolerance must stay a post-window expression — the plan is the
    SAME union+window as the plain as-of (no range join, no second
    exchange class reintroduced by the interval predicate)."""
    df = registry.QUERIES["asof_join_tolerance"](spark, SF_DIR)
    plan = plan_str(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan


def test_naive_bayes_broadcasts_vocab_grid(spark):
    """The NB trainer's vocab joins must broadcast (the model grid is
    classes x 200 — shuffling the token stream against it would be a
    plan bug) and the corpus-side counts must partial-aggregate."""
    df = registry.QUERIES["train_naive_bayes_multinomial"](spark, SF_DIR)
    plan = plan_str(df)
    assert "BroadcastHashJoin" in plan
    assert "partial_count" in plan or "partial" in plan.lower()


def test_unigram_trainer_estep_is_arrow_not_pickle(spark):
    """The Viterbi E-step crosses to Python exactly once per round via
    Arrow batches — row-pickling eval would be the 10-100x slow
    path."""
    df = registry.QUERIES["tokenizer_unigram_lm_em"](spark, SF_DIR)
    plan = plan_str(df)
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan, plan
    assert "BatchEvalPython" not in plan


def test_knn_graph_lsh_shuffles_buckets_not_pairs(spark):
    """The full-graph kNN builder's only corpus-sized exchanges are the
    (tbl, bucket) packing and the bounded edge relation — never an
    all-pairs join: no CartesianProduct / BroadcastNestedLoopJoin
    anywhere, hashing crosses to Python via Arrow (ArrowEvalPython),
    and the per-node top-k window runs over the pruned edge relation
    (≤ n_tables·k rows per node by the per-bucket partial top-k)."""
    from reports_generator_spark.operators.similarity import knn_graph_lsh
    from reports_generator_spark.sources import load_table

    df = knn_graph_lsh(load_table(spark, SF_DIR, "embeddings"), k=3)
    plan = plan_str(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "ArrowEvalPython" in plan, plan  # the matmul hashing pass
    assert "MapInPandas" in plan, plan      # the bucket top-k kernel


def test_vector_index_assignment_never_shuffles_vectors(spark):
    """The persisted-index build/maintenance kernel is the IVF
    discipline: broadcast centroid array + map-side argmax — the
    vector relation must never hash-partition by vec_id (an append
    batch's assignment is a pure map stage over the batch)."""
    from reports_generator_spark.plans.similarity import _vix_assign
    from reports_generator_spark.sources import load_table

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    hkey = "((vec_id % 2147483648) * 2654435761) % 1000003"
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.orderBy(F.expr(hkey).asc(), F.col("vec_id").asc())
    from reports_generator_spark.operators.similarity import with_norm

    cents = (
        with_norm(emb, "embedding")
        .orderBy(F.expr(hkey).asc(), F.col("vec_id").asc())
        .limit(16)
        .select(
            (F.row_number().over(w) - 1).cast("int").alias("cell"),
            F.col("v").alias("cv"),
            F.col("v_norm").alias("cnrm"),
        )
    )
    plan = plan_str(_vix_assign(emb, cents))
    ex_lines = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert not any("vec_id" in ln for ln in ex_lines), plan


def test_wordpiece_trainer_rounds_are_vocab_sized(spark):
    """The WordPiece round state is the word-frequency frame, not the
    corpus: the per-round pair/symbol aggregations must read the
    localCheckpointed vocab (zero FileScans in the round plan — the
    corpus was scanned exactly once, before the loop)."""
    from pyspark.sql import functions as F

    from reports_generator_spark.plans.registry import QUERIES
    from reports_generator_spark.sources import load_table
    from reports_generator_spark.functions import tokens_col

    docs = load_table(spark, SF_DIR, "documents")
    words = (
        docs.select(F.explode(tokens_col(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn(
            "sym",
            F.concat(
                F.lit(" "),
                F.substring("word", 1, 1),
                F.lit(" "),
                F.regexp_replace(F.expr("substring(word, 2)"), "(.)", "##$1 "),
            ),
        )
        .localCheckpoint()
    )
    pairs = words.select("freq", F.split(F.trim("sym"), " ").alias("a")).filter(
        F.size("a") >= 2
    )
    plan = plan_str(pairs.groupBy("a").count(), "simple")
    assert "FileScan" not in plan, plan


def test_ivf_pq_serving_no_cartesian_no_corpus_broadcast(spark):
    """IVF+PQ serving: the candidate restriction is an equi-join of
    the bounded probe relation against the cell-keyed code table and
    the ADC scoring joins a broadcast LUT — never a cartesian product
    or a nested-loop join, and the corpus-side index crosses to
    Python exactly once (the Arrow encode/assign pass)."""
    from reports_generator_spark.plans import registry

    registry.load_all()
    df = registry.QUERIES["similarity_topk_ivf_pq"](spark, SF_DIR)
    plan = plan_str(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "MapInPandas" in plan, plan          # the encode/assign pass
    assert "BroadcastHashJoin" in plan, plan    # probes + LUT broadcast
