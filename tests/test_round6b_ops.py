"""Behavioral tests for the round-6 backlog operators — planted-case
and closed-form properties beyond DuckDB parity: chi-square exactly
zero under perfect independence, the Lorenz diagonal under equal
spend, to-the-cent proration conservation, FIFO interval matches on a
hand-traceable ledger, Theil-Sen recovering an exact linear slope,
the time-decay closed form, windowed-funnel level boundaries, and a
planted rolling correlation of exactly 1."""

from __future__ import annotations

import datetime
import math
import tempfile

from pyspark.sql import functions as F

from reports_generator_spark.plans import registry

from conftest import SF_DIR

registry.load_all()

_TS = datetime.datetime


def _mini_sf(spark, tmp, **tables):
    for name, df in tables.items():
        df.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/{name}.parquet")
    return tmp


_CUST_SCHEMA = (
    "c_custkey long, c_name string, c_nationkey long, c_acctbal double, "
    "c_mktsegment string"
)
_ORDER_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def test_chisq_zero_under_perfect_independence(spark):
    """A contingency table with exactly proportional cells (every
    segment 3 positive / 1 negative) must yield chi2_term == 0.0 in
    every cell."""
    with tempfile.TemporaryDirectory() as tmp:
        rows = []
        k = 0
        for seg in ["A", "B", "C"]:
            for bal in [10.0, 10.0, 10.0, -5.0]:
                k += 1
                rows.append((k, f"c{k}", 1, bal, seg))
        cust = spark.createDataFrame(rows, _CUST_SCHEMA)
        _mini_sf(spark, tmp, customer=cust)
        out = registry.QUERIES["chisq_independence"](spark, tmp).collect()
        assert len(out) == 6
        assert all(r.chi2_term == 0.0 for r in out)
        assert all(r.expected == float(r.n_obs) for r in out)


def test_lorenz_is_diagonal_under_equal_spend(spark):
    """40 customers, one equal-price order each → every decile holds
    exactly 10% of revenue; cum_share at decile d is d/10."""
    with tempfile.TemporaryDirectory() as tmp:
        d = _TS(2000, 1, 1)
        orders = spark.createDataFrame(
            [(i, i, "F", 100.0, d, "1-URGENT") for i in range(1, 41)],
            _ORDER_SCHEMA,
        )
        _mini_sf(spark, tmp, orders=orders)
        out = sorted(
            registry.QUERIES["lorenz_curve_deciles"](spark, tmp).collect(),
            key=lambda r: r.decile,
        )
        assert [r.n_cust for r in out] == [4] * 10
        for r in out:
            assert abs(r.cum_share - r.decile / 10) < 1e-6


def test_interval_allocation_conserves_cents(spark):
    """Summed daily allocations must equal the total source cents of
    the January-1995 lineitems to the cent — the accounting constraint
    the remainder-to-earliest-days scheme guarantees."""
    alloc = registry.QUERIES["interval_allocate_daily"](spark, SF_DIR)
    total_alloc = alloc.agg(F.sum("alloc_cents")).collect()[0][0]
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-02-01").cast("timestamp"))
    )
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    total_src = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint")
            )
        )
        .collect()[0][0]
    )
    assert total_alloc == total_src


def test_fifo_matching_on_hand_traceable_ledger(spark):
    """One part, supply lots [5, 5] (even orderkeys), demands [3, 4]
    (odd): FIFO gives s1→d1:3, s1→d2:2, s2→d2:2 — three matches,
    matched qty 7 = min(supply, demand)."""
    with tempfile.TemporaryDirectory() as tmp:
        rows = [
            # (orderkey, partkey, suppkey, lineno, qty, price, disc, tax,
            #  rflag, lstatus, shipdate) — even orderkey = supply lot
            (2, 1, 1, 1, 5.0, 10.0, 0.0, 0.0, "N", "O", _TS(2000, 1, 1)),
            (4, 1, 1, 1, 5.0, 10.0, 0.0, 0.0, "N", "O", _TS(2000, 1, 2)),
            (1, 1, 1, 1, 3.0, 10.0, 0.0, 0.0, "N", "O", _TS(2000, 1, 1)),
            (3, 1, 1, 1, 4.0, 10.0, 0.0, 0.0, "N", "O", _TS(2000, 1, 3)),
        ]
        li = spark.createDataFrame(
            rows,
            "l_orderkey long, l_partkey long, l_suppkey long, "
            "l_linenumber int, l_quantity double, l_extendedprice double, "
            "l_discount double, l_tax double, l_returnflag string, "
            "l_linestatus string, l_shipdate timestamp",
        )
        _mini_sf(spark, tmp, lineitem=li)
        out = registry.QUERIES["fifo_inventory_matching"](spark, tmp).collect()
        assert len(out) == 1
        assert out[0].n_matches == 3
        assert out[0].matched_qty == 7


def test_theil_sen_recovers_exact_linear_slope(spark):
    """A perfectly linear monthly revenue series (+$100/month) has
    every pairwise slope equal, so the Theil-Sen median is exactly
    100.0 dollars/month."""
    with tempfile.TemporaryDirectory() as tmp:
        li_rows = [
            (m, m, 1, 1, 1.0, 100.0 * m, 0.0, 0.0, "N", "O",
             _TS(2000, m, 15))
            for m in range(1, 9)
        ]
        li = spark.createDataFrame(
            li_rows,
            "l_orderkey long, l_partkey long, l_suppkey long, "
            "l_linenumber int, l_quantity double, l_extendedprice double, "
            "l_discount double, l_tax double, l_returnflag string, "
            "l_linestatus string, l_shipdate timestamp",
        )
        part = spark.createDataFrame(
            [(m, f"part{m}", "BRAND#1", "T", 1, 1.0) for m in range(1, 9)],
            "p_partkey long, p_name string, p_brand string, p_type string, "
            "p_size int, p_retailprice double",
        )
        _mini_sf(spark, tmp, lineitem=li, part=part)
        out = registry.QUERIES["theil_sen_trend"](spark, tmp).collect()
        assert len(out) == 1
        assert out[0].n_pairs == 8 * 7 // 2
        assert abs(out[0].ts_slope - 100.0) < 1e-6


def test_time_decay_score_closed_form(spark):
    """Two $1.00 events, ages 0 and 30 days → score = 1 + e^{-1}."""
    with tempfile.TemporaryDirectory() as tmp:
        ev = spark.createDataFrame(
            [
                (1, _TS(2024, 1, 1), 7, "view", 1.0, "{}"),
                (2, _TS(2024, 1, 31), 7, "view", 1.0, "{}"),
            ],
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
        _mini_sf(spark, tmp, events=ev)
        out = registry.QUERIES["time_decay_score"](spark, tmp).collect()
        assert len(out) == 1
        assert out[0].n_events == 2
        assert abs(out[0].decay_score - (1.0 + math.exp(-1.0))) < 1e-6


def test_funnel_window_level_boundaries(spark):
    """User A completes view→click→purchase inside 24 h (level 3);
    user B's purchase lands past the 24 h horizon (level 2); user C
    clicks before ever viewing (level 1)."""
    with tempfile.TemporaryDirectory() as tmp:
        rows = [
            (1, _TS(2024, 1, 1, 0), 1, "view", 0.0, "{}"),
            (2, _TS(2024, 1, 1, 1), 1, "click", 0.0, "{}"),
            (3, _TS(2024, 1, 1, 2), 1, "purchase", 0.0, "{}"),
            (4, _TS(2024, 1, 1, 0), 2, "view", 0.0, "{}"),
            (5, _TS(2024, 1, 1, 1), 2, "click", 0.0, "{}"),
            (6, _TS(2024, 1, 2, 12), 2, "purchase", 0.0, "{}"),
            (7, _TS(2024, 1, 1, 0), 3, "click", 0.0, "{}"),
            (8, _TS(2024, 1, 1, 1), 3, "view", 0.0, "{}"),
        ]
        ev = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
        _mini_sf(spark, tmp, events=ev)
        got = {
            r.level: r.n_users
            for r in registry.QUERIES["funnel_window"](spark, tmp).collect()
        }
        assert got == {3: 1, 2: 1, 1: 1}


def test_rolling_corr_is_one_on_proportional_series(spark):
    """Daily revenue exactly proportional to daily order count
    (every order $100,000) → 30-day Pearson correlation is 1.0 once
    the frame is full and counts vary."""
    with tempfile.TemporaryDirectory() as tmp:
        rows = []
        k = 0
        base = datetime.date(2000, 1, 1)
        for day in range(40):
            n = 1 + (day % 5)  # varying daily counts 1..5
            for _ in range(n):
                k += 1
                d = base + datetime.timedelta(days=day)
                rows.append(
                    (k, k, "F", 100000.0,
                     _TS(d.year, d.month, d.day), "1-URGENT")
                )
        orders = spark.createDataFrame(rows, _ORDER_SCHEMA)
        _mini_sf(spark, tmp, orders=orders)
        out = registry.QUERIES["rolling_corr_pair"](spark, tmp).collect()
        full = [r for r in out if r[1] is not None]
        assert len(full) == 11  # days 30..40 have a full varying frame
        assert all(abs(r[1] - 1.0) < 1e-6 for r in full)
