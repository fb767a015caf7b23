"""Composition tests for corpus_release_end2end — the properties
per-key tests cannot see: no diamond re-execution (every stage is a
materialized barrier, the stats plan re-scans nothing), telemetry
nodes present, and chain-monotonicity of the stage counts."""

from __future__ import annotations

import pytest

from conftest import SF_DIR


@pytest.fixture(scope="module")
def release_df(spark):
    from reports_generator_spark.plans import registry

    registry.load_all()
    return registry.QUERIES["corpus_release_end2end"](spark, SF_DIR)


def test_release_stage_chain_monotone(release_df):
    rows = {r["stage"]: r for r in release_df.collect()}
    assert set(rows) == {
        "raw", "clean", "neardup", "decontaminated", "mixed", "packed"
    }
    # each stage only ever removes documents
    order = ["raw", "clean", "neardup", "decontaminated", "mixed"]
    for a, b in zip(order, order[1:]):
        assert rows[a]["n_docs"] >= rows[b]["n_docs"], (a, b)
    # packing reorders but neither adds nor drops
    assert rows["packed"]["n_docs"] == rows["mixed"]["n_docs"]
    assert rows["packed"]["id_checksum"] == rows["mixed"]["id_checksum"]
    assert rows["packed"]["n_tokens"] == rows["mixed"]["n_tokens"]
    # bins exist and every bin holds >= 1 doc
    assert 0 < rows["packed"]["n_bins"] <= rows["packed"]["n_docs"]


def test_release_stats_plan_reads_only_checkpoints(release_df):
    """The returned stats plan must read ONLY the localCheckpoint
    barriers — a parquet scan in it means some stage re-derives the
    chain instead of reusing the materialized barrier (the diamond
    re-execution bug this composed key exists to expose)."""
    plan = release_df._jdf.queryExecution().executedPlan().toString()
    assert "FileScan parquet" not in plan, plan
    assert "Scan ExistingRDD" in plan  # the checkpoint barriers


def test_release_observe_telemetry_in_returned_plan(release_df):
    analyzed = release_df._jdf.queryExecution().analyzed().toString()
    assert "release_stages" in analyzed  # CollectMetrics node survives
