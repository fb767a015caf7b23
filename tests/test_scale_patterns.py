"""Behavioral tests for the scale-pattern operators: the two-pass
median against hand-computable odd/even planted sets, sampling
consistency as a hard invariant, and DBSCAN core classification on a
planted dense cluster + isolated point (including a sparse-cell pair
that straddles two cells — the case the dense-cell shortcut alone
would miss)."""

from __future__ import annotations

import datetime
import tempfile

from pyspark.sql import functions as F

from reports_generator_spark.plans import registry

from conftest import SF_DIR

registry.load_all()

_ORDER_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def _mini_sf(spark, tmp, **tables):
    for name, df in tables.items():
        df.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/{name}.parquet")
    return tmp


def test_two_pass_median_odd_and_even(spark):
    """Planted values: odd count → exact middle; even count → mean of
    the two middles, both through the histogram-narrowing path."""
    d = datetime.datetime(2000, 1, 1)
    with tempfile.TemporaryDirectory() as tmp:
        odd = spark.createDataFrame(
            [(i, i, "F", float(v), d, "1-URGENT")
             for i, v in enumerate([10.0, 20.0, 30.0, 1000.0, 5000.0], 1)],
            _ORDER_SCHEMA,
        )
        _mini_sf(spark, tmp, orders=odd)
        r = registry.QUERIES["exact_median_histogram_2pass"](
            spark, tmp
        ).collect()[0]
        assert r.n == 5 and r.median_dollars == 30.0
    with tempfile.TemporaryDirectory() as tmp:
        even = spark.createDataFrame(
            [(i, i, "F", float(v), d, "1-URGENT")
             for i, v in enumerate([10.0, 20.0, 40.0, 5000.0], 1)],
            _ORDER_SCHEMA,
        )
        _mini_sf(spark, tmp, orders=even)
        r = registry.QUERIES["exact_median_histogram_2pass"](
            spark, tmp
        ).collect()[0]
        assert r.n == 4 and r.median_dollars == 30.0


def test_two_pass_median_matches_naive_on_fixture(spark):
    """On the real fixture the narrowed median must equal the naive
    exact median computed with a full sort."""
    r = registry.QUERIES["exact_median_histogram_2pass"](
        spark, SF_DIR
    ).collect()[0]
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("v")
    )
    naive = o.agg(F.expr("percentile(v, 0.5)")).collect()[0][0] / 100
    assert abs(r.median_dollars - naive) < 1e-6


def test_consistent_sampling_invariant_holds(spark):
    """n_join == n_orders_sample (every sampled order's customer is
    sampled) — the defining property of entity-keyed sampling."""
    r = registry.QUERIES["sample_consistent_multitable"](
        spark, SF_DIR
    ).collect()[0]
    assert bool(r.consistent_ok) is True
    assert r.n_join == r.n_orders_sample
    assert 0 < r.n_cust_sample


def test_dbscan_planted_cluster_and_outlier(spark):
    """Customers engineered so keys 1-5 land within one tight disc
    (all core), key 6 isolated (not core). Points are chosen via the
    actual coordinate hash: we search key space for 5 keys mapping
    within a 30-unit box and one far away, so the test exercises the
    real hash path and the sparse-probe path (5 points straddle cell
    borders freely)."""
    HX, HY, MASK, GRID = 2654435761, 2246822519, 2147483648, 1000

    def pt(k):
        return ((k % MASK) * HX) % GRID, ((k % MASK) * HY) % GRID

    anchor = None
    cluster = []
    for k in range(1, 300000):
        x, y = pt(k)
        if anchor is None:
            if 300 < x < 700 and 300 < y < 700:
                anchor = (x, y)
                cluster.append(k)
            continue
        if abs(x - anchor[0]) <= 20 and abs(y - anchor[1]) <= 20:
            cluster.append(k)
            if len(cluster) == 5:
                break
    assert len(cluster) == 5, "key search failed to find a tight cluster"
    outlier = None
    for k in range(1, 300000):
        if k in cluster:
            continue
        x, y = pt(k)
        if abs(x - anchor[0]) > 300 and abs(y - anchor[1]) > 300:
            outlier = k
            break
    with tempfile.TemporaryDirectory() as tmp:
        cust = spark.createDataFrame(
            [(k, f"c{k}", 1, 0.0, "A") for k in cluster + [outlier]],
            "c_custkey long, c_name string, c_nationkey long, "
            "c_acctbal double, c_mktsegment string",
        )
        _mini_sf(spark, tmp, customer=cust)
        core = {
            r.c_custkey
            for r in registry.QUERIES["spatial_dbscan_corepoints"](
                spark, tmp
            ).collect()
        }
        assert core == set(cluster)
        assert outlier not in core


def test_vacuum_idempotent_within_session(spark):
    """A retry/timing re-run of the vacuum key must find (and remove)
    a freshly staged orphan, not bake 0 into the attested row."""
    from conftest import SF_DIR

    from reports_generator_spark.plans import registry

    registry.load_all()
    for _ in range(2):
        row = registry.QUERIES["vacuum_orphan_files_safe"](spark, SF_DIR).first()
        assert row["n_orphans_removed"] == 1
