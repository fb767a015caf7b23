"""Shared test fixtures: one SparkSession per run + the DuckDB
differential harness mirroring the driver's correctness gate
(row-count + schema + order-insensitive value comparison)."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reports_generator_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    s = get_spark("rg-spark-tests", master=os.environ.get("SPARK_GRAFT_TEST_MASTER", "local[4]"))
    yield s


@pytest.fixture(autouse=True)
def _restore_runtime_conf():
    """Conf-mutating keys (scan_binaryfile, join_skew_aqe_adaptive,
    agg_pushdown_parquet_stats, …) deliberately leave their degraded
    conf in place until the returned lazy frame executes; in the
    driver/bench loop the NEXT key's tune() restores it. Tests have no
    such next key, so restore after EVERY test — a leaked
    openCostInBytes/advisory-size would silently degrade every later
    test in the session (ADVICE r9)."""
    yield
    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    if s is not None:
        from reports_generator_spark.session import tune

        tune(s)


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _dtype_kind(dtype) -> str:
    """Collapse a pandas dtype into the kind class the driver's value
    hash is sensitive to.  DuckDB HUGEINT / DECIMAL surface as float64
    or object(Decimal) in ``fetchdf()`` while Spark's bigint surfaces
    as int64 — the r5 failure class (`agg_weighted_median`,
    `feature_target_encode`).  Nullable ints become float64 on BOTH
    engines (pandas), so strict kind equality stays fair."""
    k = getattr(dtype, "kind", "O")
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k in ("M", "m"):
        return "time"
    return "obj"


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style: floats already rounded upstream; normalize -0.0
        # and integral floats (nullable-int columns surface as float64)
        r = round(v + 0.0, 9)
        return int(r) if r == int(r) and abs(r) < 2**53 else r
    if hasattr(v, "isoformat"):
        return v.isoformat()
    try:  # Decimal → float-ish string
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 9)
    except Exception:
        pass
    return v


def assert_matches_oracle(spark_df, duck_con, sql, check_types=True):
    """Order-insensitive, column-name-sorted value comparison — strict
    superset of the driver's row-count + schema + value-hash check."""
    sdf = spark_df.toPandas()
    ddf = duck_con.execute(sql).fetchdf()
    s_cols = sorted(sdf.columns)
    d_cols = sorted(ddf.columns)
    assert s_cols == d_cols, f"column mismatch: spark={s_cols} oracle={d_cols}"
    assert len(sdf) == len(ddf), f"row count: spark={len(sdf)} oracle={len(ddf)}"
    if check_types:
        # dtype-kind agreement per column: the driver's value hash is
        # type-sensitive (bigint 506627 != HUGEINT-as-float 506627.0),
        # so an int column on one engine must be an int column on the
        # other.  Exception: an all-NULL column collapses to object/
        # float ambiguously — skip kind check for those.
        for c in s_cols:
            if sdf[c].isna().all() and ddf[c].isna().all():
                continue
            sk, dk = _dtype_kind(sdf[c].dtype), _dtype_kind(ddf[c].dtype)
            # pandas object columns (strings, Decimals with nulls) are
            # opaque; only flag the unambiguous int-vs-float/obj splits
            if sk != dk and not (sk == "obj" or dk == "obj"):
                raise AssertionError(
                    f"dtype-kind mismatch on '{c}': spark={sdf[c].dtype}"
                    f" ({sk}) oracle={ddf[c].dtype} ({dk}) — un-cast"
                    " HUGEINT/DECIMAL oracle output?"
                )
            if (sk, dk) in (("int", "obj"), ("float", "obj"), ("obj", "int"), ("obj", "float")):
                raise AssertionError(
                    f"dtype-kind mismatch on '{c}': spark={sdf[c].dtype}"
                    f" ({sk}) oracle={ddf[c].dtype} ({dk}) — numeric vs"
                    " object (Decimal?) would hash-diverge on the driver"
                )
    s_rows = sorted(
        (
            tuple(_norm_cell(v) for v in row)
            for row in sdf[s_cols].itertuples(index=False, name=None)
        ),
        key=repr,
    )
    d_rows = sorted(
        (
            tuple(_norm_cell(v) for v in row)
            for row in ddf[d_cols].itertuples(index=False, name=None)
        ),
        key=repr,
    )
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        assert a == b, f"row {i} differs:\n  spark={a}\n  oracle={b}"
