"""Planted-case and invariant tests for the late round-6 keys:
drawdown on a hand-traced series, LPA convergence on a planted
triangle (and the documented synchronous-LPA oscillation on an
isolated edge), calibration bins partitioning the population,
association-rule metrics recomputable from their own counts, and
migration-matrix mass conservation."""

from __future__ import annotations

import datetime
import tempfile

from pyspark.sql import functions as F

from reports_generator_spark.plans import registry

from conftest import SF_DIR

registry.load_all()

_TS = datetime.datetime

_ORDER_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)
_LI_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
    "l_quantity double, l_extendedprice double, l_discount double, "
    "l_tax double, l_returnflag string, l_linestatus string, "
    "l_shipdate timestamp"
)


def _mini_sf(spark, tmp, **tables):
    for name, df in tables.items():
        df.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/{name}.parquet")
    return tmp


def test_max_drawdown_on_hand_traced_series(spark):
    """Monthly revenue 100, 300, 150, 50, 200 → peak 300, max drawdown
    250 at the month hitting 50."""
    with tempfile.TemporaryDirectory() as tmp:
        series = [100.0, 300.0, 150.0, 50.0, 200.0]
        orders = spark.createDataFrame(
            [(m, 1, "F", v, _TS(2000, m, 10), "1-URGENT")
             for m, v in enumerate(series, 1)],
            _ORDER_SCHEMA,
        )
        cust = spark.createDataFrame(
            [(1, "c1", 1, 0.0, "A")],
            "c_custkey long, c_name string, c_nationkey long, "
            "c_acctbal double, c_mktsegment string",
        )
        nation = spark.createDataFrame(
            [(1, "N1", 1)], "n_nationkey long, n_name string, n_regionkey long"
        )
        _mini_sf(spark, tmp, orders=orders, customer=cust, nation=nation)
        r = registry.QUERIES["max_drawdown_monthly"](spark, tmp).collect()
        assert len(r) == 1
        assert r[0].peak_c == 30000
        assert r[0].max_drawdown_c == 25000
        assert r[0].trough_month == "2000-04"


def test_lpa_triangle_converges_and_edge_oscillates(spark):
    """Parts {1,2,3} pairwise co-purchased twice form a triangle —
    after 3 majority/min-tiebreak rounds all three carry label 1.
    The isolated pair {7,8} exhibits the documented synchronous-LPA
    two-cycle (labels swap each round) — deterministic either way."""
    with tempfile.TemporaryDirectory() as tmp:
        rows = []
        ln = 0

        def order(ok, parts):
            nonlocal ln
            for p in parts:
                ln += 1
                rows.append(
                    (ok, p, 1, ln, 1.0, 10.0, 0.0, 0.0, "N", "O",
                     _TS(2000, 1, 1))
                )

        order(1, [1, 2]); order(2, [1, 2])
        order(3, [2, 3]); order(4, [2, 3])
        order(5, [1, 3]); order(6, [1, 3])
        order(7, [7, 8]); order(8, [7, 8])
        li = spark.createDataFrame(rows, _LI_SCHEMA)
        _mini_sf(spark, tmp, lineitem=li)
        got = {
            r.l_partkey: r.community
            for r in registry.QUERIES["graph_label_propagation"](
                spark, tmp
            ).collect()
        }
        assert got[1] == got[2] == got[3] == 1
        assert {got[7], got[8]} <= {7, 8}


def test_calibration_bins_partition_population(spark):
    """Bin counts must sum to the full customer count and every bin's
    observed rate lie in [0, 1]."""
    out = registry.QUERIES["eval_calibration_bins"](spark, SF_DIR).collect()
    total = sum(r.n for r in out)
    n_cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").count()
    assert total == n_cust
    for r in out:
        rate = [v for k, v in r.asDict().items() if "rate" in k or "frac" in k]
        assert all(0.0 <= x <= 1.0 for x in rate if x is not None)


def test_assoc_rules_metrics_recompute_from_counts(spark):
    """conf and lift must equal their defining ratios of the row's own
    integer counts (to the 6 dp pin), and confidence ≤ 1."""
    rows = registry.QUERIES["assoc_rules_lift"](spark, SF_DIR).collect()
    # n_baskets is not in the output; recover it from any row's lift
    for r in rows:
        assert 0.0 <= r.conf_a_to_b <= 1.0
        assert abs(r.conf_a_to_b - r.n_co / r.n_a) < 2e-6
        assert abs(r.conf_b_to_a - r.n_co / r.n_b) < 2e-6
        assert r.n_co <= min(r.n_a, r.n_b)


def test_migration_matrix_conserves_customers(spark):
    """Total matrix mass = distinct customers active in 1995 or 1996,
    and no (none, none) cell exists."""
    out = registry.QUERIES["customer_migration_matrix"](
        spark, SF_DIR
    ).collect()
    assert not any(
        r.seg_from == "none" and r.seg_to == "none" for r in out
    )
    total = sum(r.n_customers for r in out)
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    active = (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert total == active


def test_logistic_irls_improves_on_null_model(spark):
    """Each IRLS iteration must reduce the deviance: the final log-loss
    has to beat the NULL model's (the best constant predictor scores
    -(p ln p + (1-p) ln(1-p)) at the base rate p), or the 'training'
    did nothing and the key is just arithmetic theater."""
    import math

    from reports_generator_spark.plans import registry

    registry.load_all()
    r = registry.QUERIES["train_logistic_irls"](spark, SF_DIR).first()
    p = r["n_pos"] / r["n"]
    null_loss = -(p * math.log(p) + (1 - p) * math.log(1 - p))
    assert 0 < r["log_loss"] <= null_loss + 1e-9
    # two iterations from beta=0 must have moved the coefficients
    assert (r["beta0_it1"], r["beta1_it1"]) != (0.0, 0.0)
    assert (r["beta0_it2"], r["beta1_it2"]) != (r["beta0_it1"], r["beta1_it1"])
