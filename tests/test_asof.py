"""Behavioral tests for the as-of join operator: at-or-before
semantics, left-outer nulls, deterministic tie-break, and key
isolation — on a hand-computed fixture."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from reports_generator_spark.operators.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [
            Row(lid=1, k=1, t=_ts("2024-01-01T10:00:00")),  # after r1, before r2
            Row(lid=2, k=1, t=_ts("2024-01-01T12:00:00")),  # == r2.t (inclusive)
            Row(lid=3, k=1, t=_ts("2024-01-01T08:00:00")),  # before all → null
            Row(lid=4, k=2, t=_ts("2024-01-01T23:00:00")),  # other key
            Row(lid=5, k=3, t=_ts("2024-01-01T10:00:00")),  # key with no rights
        ]
    )
    right = spark.createDataFrame(
        [
            Row(rid=10, k=1, t=_ts("2024-01-01T09:00:00"), v="r1"),
            Row(rid=11, k=1, t=_ts("2024-01-01T12:00:00"), v="r2a"),
            Row(rid=12, k=1, t=_ts("2024-01-01T12:00:00"), v="r2b"),  # tie: rid wins
            Row(rid=13, k=2, t=_ts("2024-01-01T09:30:00"), v="k2"),
        ]
    )
    out = {
        r["lid"]: (r["rid"], r["v"])
        for r in asof_join(
            left, right, on="k", ts="t", right_payload=["rid", "v"], tiebreak="rid"
        ).collect()
    }
    assert out[1] == (10, "r1")        # latest at-or-before 10:00 is 09:00
    assert out[2] == (12, "r2b")       # equal-t included; max rid wins tie
    assert out[3] == (None, None)      # nothing before 08:00
    assert out[4] == (13, "k2")        # keys don't leak across partitions
    assert out[5] == (None, None)      # key with no right rows at all


def test_asof_collision_suffix(spark):
    left = spark.createDataFrame([Row(k=1, t=1, v="L")])
    right = spark.createDataFrame([Row(k=1, t=0, v="R")])
    row = asof_join(left, right, on="k", ts="t", right_payload=["v"]).collect()[0]
    assert row["v"] == "L" and row["v_r"] == "R"


def test_asof_null_payload_not_backfilled(spark):
    """Row-level semantics: if the LATEST right row has a NULL payload
    field, the left row must see that NULL — not a value backfilled
    from an older right row (payload columns must never mix rows)."""
    left = spark.createDataFrame([Row(lid=1, k=1, t=10)])
    right = spark.createDataFrame(
        [
            Row(rid=1, k=1, t=5, a="old_a", b="old_b"),
            Row(rid=2, k=1, t=8, a=None, b="new_b"),  # latest: a is NULL
        ]
    )
    row = asof_join(
        left, right, on="k", ts="t", right_payload=["rid", "a", "b"], tiebreak="rid"
    ).collect()[0]
    assert row["rid"] == 2
    assert row["a"] is None          # NOT "old_a"
    assert row["b"] == "new_b"


def test_asof_forward_semantics(spark):
    """direction="forward": earliest right row at-or-after each left
    row; equal-t rows included with greatest-tiebreak winning; nulls
    when nothing follows."""
    left = spark.createDataFrame(
        [Row(lid=1, k=1, t=10), Row(lid=2, k=1, t=15), Row(lid=3, k=1, t=21)]
    )
    right = spark.createDataFrame(
        [
            Row(rid=10, k=1, t=12, v="a"),
            Row(rid=11, k=1, t=15, v="eq1"),
            Row(rid=12, k=1, t=15, v="eq2"),  # tie at t=15: max rid wins
            Row(rid=13, k=1, t=20, v="b"),
        ]
    )
    out = {
        r["lid"]: (r["rid"], r["v"])
        for r in asof_join(
            left, right, on="k", ts="t", right_payload=["rid", "v"],
            tiebreak="rid", direction="forward",
        ).collect()
    }
    assert out[1] == (10, "a")       # earliest at-or-after 10 is t=12
    assert out[2] == (12, "eq2")     # equal-t included; max rid wins tie
    assert out[3] == (None, None)    # nothing at-or-after 21


def test_asof_direction_validated(spark):
    left = spark.createDataFrame([Row(k=1, t=1)])
    with pytest.raises(ValueError):
        asof_join(left, left, on="k", ts="t", right_payload=["t"], direction="sideways")


def test_asof_tolerance_boundary_and_null_out(spark):
    """The tolerance contract on a hand-built frame: a right row
    exactly tolerance-old SURVIVES (>= boundary, matching the
    oracle's >=), one second staler nulls out, an in-tolerance match
    carries, and a keyless left row stays null — all through the same
    one-window plan (tolerance must not change the match choice, only
    null it: the stale case would otherwise fall back to an even
    older row, which merge_asof semantics forbid)."""
    import pyspark.sql.functions as F

    from reports_generator_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 12:00:00"),
         (3, "2024-01-01 23:00:00"), (4, "2024-01-01 10:00:00")],
        "k int, ts string",
    ).select("k", F.col("ts").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:00:00", 100.0),   # exactly 1h old: survives
         (2, "2024-01-01 10:59:59", 200.0),   # 1h1s old: nulled
         (3, "2024-01-01 22:30:00", 300.0)],  # 30min old: survives
        "k int, ts string, v double",
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "v")

    out = {
        r["k"]: r["v_r"]
        for r in asof_join(
            left.withColumn("v", F.lit(None).cast("double")),
            right,
            on="k",
            ts="ts",
            right_payload=["v"],
            tolerance="1 hour",
        ).select("k", F.col("v_r")).collect()
    }
    assert out == {1: 100.0, 2: None, 3: 300.0, 4: None}
