"""Behavioral tests for the round-6 operators — planted-case and
closed-form properties the DuckDB parity harness can't express: the
PVM bridge's exact algebraic decomposition, KS/MWU on hand-computable
distributions, bootstrap-CI sanity, XYZ boundary classification on
constructed series, path-ranking tie semantics."""

from __future__ import annotations

import datetime
import math
import tempfile

from pyspark.sql import functions as F

from reports_generator_spark.plans import registry

from conftest import SF_DIR

registry.load_all()


def _mini_sf(spark, tmp, **tables):
    for name, df in tables.items():
        df.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/{name}.parquet")
    return tmp


def test_revenue_bridge_effects_sum_to_delta_revenue(spark):
    """volume_effect + price_effect must equal rev2 − rev1 exactly
    (up to the 4 dp pin) for every brand — the defining algebraic
    property of the two-factor decomposition."""
    rows = registry.QUERIES["revenue_bridge_pvm"](spark, SF_DIR).collect()
    assert rows, "bridge produced no brands"
    for r in rows:
        delta = (r.rev2_c - r.rev1_c) / 100.0
        assert abs((r.volume_effect + r.price_effect) - delta) < 2e-4, r


def test_ks_and_mwu_on_planted_distributions(spark):
    """Group 1 = urgent orders. Plant orders where urgent prices are
    uniformly ABOVE the rest: KS D must be 1.0 and the MWU z must be
    strongly positive (group-1 ranks maximal)."""
    with tempfile.TemporaryDirectory() as tmp:
        d = datetime.datetime(2000, 1, 1)
        rows = [
            (i, 1, "1-URGENT" if i < 20 else "5-LOW",
             1000.0 + i if i < 20 else 10.0 + i, d, "F")
            for i in range(40)
        ]
        orders = spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, o_orderpriority string, "
            "o_totalprice double, o_orderdate timestamp, o_orderstatus string",
        )
        _mini_sf(spark, tmp, orders=orders)
        ks = registry.QUERIES["ks_test_two_sample"](spark, tmp).collect()[0]
        assert ks.n1 == 20 and ks.n2 == 20
        assert ks.ks_d == 1.0
        mw = registry.QUERIES["mann_whitney_u_test"](spark, tmp).collect()[0]
        # group 1 holds ranks 21..40: U1 = n1*n2 (max), z = +sqrt(3n... )
        assert mw.u1_x2 == 2 * 20 * 20
        assert mw.z > 5.0


def test_bootstrap_ci_brackets_the_mean(spark):
    """The 95% Poisson-bootstrap CI must contain the full-sample mean
    and be properly ordered (lo < mean < hi) on the fixture data."""
    r = registry.QUERIES["bootstrap_ci_mean"](spark, SF_DIR).collect()[0]
    assert r.b_replicas == 64
    assert r.ci_lo < r.mean_full < r.ci_hi
    # CI half-width should be a small fraction of the mean at n≈1.5k
    assert (r.ci_hi - r.ci_lo) / r.mean_full < 0.2


def test_xyz_classification_boundaries(spark):
    """Constructed monthly series: constant demand (CV=0) → X; a
    2x-alternating series (CV≈0.333) → Y; a bursty one-month spike
    (CV≈2.2) → Z."""
    with tempfile.TemporaryDirectory() as tmp:
        rows = []
        lineno = 0
        # part 1: constant 10/month over 6 months → CV 0 → X
        # part 2: alternating 10,20 → mean 15, sd 5 → CV 1/3 → Y
        # part 3: one month 60, five months 1 → CV ≈ 2.03 → Z
        series = {1: [10] * 6, 2: [10, 20, 10, 20, 10, 20],
                  3: [60, 1, 1, 1, 1, 1]}
        for pk, qs in series.items():
            for m, q in enumerate(qs, start=1):
                lineno += 1
                rows.append(
                    (lineno, pk, 1, lineno, float(q), 100.0, 0.0, 0.0,
                     "N", "O", datetime.datetime(2000, m, 15))
                )
        li = spark.createDataFrame(
            rows,
            "l_orderkey long, l_partkey long, l_suppkey long, "
            "l_linenumber int, l_quantity double, l_extendedprice double, "
            "l_discount double, l_tax double, l_returnflag string, "
            "l_linestatus string, l_shipdate timestamp",
        )
        _mini_sf(spark, tmp, lineitem=li)
        got = {
            r.xyz_class: (r.n_parts, r.avg_cv)
            for r in registry.QUERIES["demand_variability_xyz"](
                spark, tmp
            ).collect()
        }
        assert got["X"][0] == 1 and got["X"][1] == 0.0
        assert got["Y"][0] == 1
        assert abs(got["Y"][1] - 1 / 3) < 1e-6
        assert got["Z"][0] == 1
        exp_cv = math.sqrt(6 * 3605 - 65 * 65) / 65
        assert abs(got["Z"][1] - exp_cv) < 1e-6


def test_duplicate_payment_pairs_are_adjacent_and_bounded(spark):
    """Every flagged pair shares (custkey, bucket) and is ≤180 days
    apart; an isolated order never flags."""
    rows = registry.QUERIES["duplicate_payment_audit"](
        spark, SF_DIR
    ).collect()
    for r in rows:
        assert 0 <= r.day_gap <= 180
        assert abs(r.amt_c - r.prev_amt_c) < 1000 * 100 * 2  # same bucket ⇒ <$2000


def test_session_path_rank_has_no_gap_cut(spark):
    """rank()-based top-k: every returned rnk ≤ 10, ranks start at 1,
    and counts are non-increasing with rank."""
    rows = sorted(
        registry.QUERIES["session_path_topk"](spark, SF_DIR).collect(),
        key=lambda r: (r.rnk, r.path),
    )
    assert rows and rows[0].rnk == 1
    assert all(r.rnk <= 10 for r in rows)
    counts = [r.n_sessions for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_otif_rates_bounded_and_consistent(spark):
    """OTIF ≤ min(on-time, in-full) per nation, all rates in [0,1]."""
    for r in registry.QUERIES["otif_delivery_metrics"](
        spark, SF_DIR
    ).collect():
        assert 0.0 <= r.otif_rate <= min(r.on_time_rate, r.in_full_rate) + 1e-9
        assert r.on_time_rate <= 1.0 and r.in_full_rate <= 1.0
