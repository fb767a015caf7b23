"""Regression for the r5 driver-hash failure class: DuckDB
``sum(BIGINT)`` returns HUGEINT (float64/object through ``fetchdf``),
which the driver's type-sensitive value hash sees as ``506627.0``
against Spark's bigint ``506627``.  The local comparator must FAIL on
that shape (it silently passed in r5 — VERDICT r5 item #3)."""

from __future__ import annotations

import pytest

from conftest import SF_DIR, assert_matches_oracle


def test_uncast_hugeint_sum_fails(spark, duck):
    sdf = spark.read.parquet(f"{SF_DIR}/nation.parquet").groupBy().agg(
        {"n_regionkey": "sum"}
    ).withColumnRenamed("sum(n_regionkey)", "s")
    # un-cast sum(BIGINT) → HUGEINT → float64 in pandas: must be caught
    with pytest.raises(AssertionError, match="dtype-kind mismatch"):
        assert_matches_oracle(sdf, duck, "SELECT sum(n_regionkey) AS s FROM nation")


def test_cast_hugeint_sum_passes(spark, duck):
    sdf = spark.read.parquet(f"{SF_DIR}/nation.parquet").groupBy().agg(
        {"n_regionkey": "sum"}
    ).withColumnRenamed("sum(n_regionkey)", "s")
    assert_matches_oracle(
        sdf, duck, "SELECT CAST(sum(n_regionkey) AS BIGINT) AS s FROM nation"
    )
