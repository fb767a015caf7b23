"""Differential correctness: every registered query with an oracle must
value-match DuckDB on the fixture tables — the same gate the driver
runs at sf0.01 (here at the test SF for speed).

Rows-only queries (no oracle) are smoke-checked: they run, have a
stable schema, and return a sane row count.
"""

from __future__ import annotations

import pytest

from reports_generator_spark.plans import registry

from conftest import SF_DIR, assert_matches_oracle

registry.load_all()

WITH_ORACLE = sorted(k for k in registry.QUERIES if k in registry.ORACLES)
ROWS_ONLY = sorted(k for k in registry.QUERIES if k not in registry.ORACLES)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, duck, name):
    sdf = registry.QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(sdf, duck, registry.ORACLES[name])


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_smoke(spark, name):
    sdf = registry.QUERIES[name](spark, SF_DIR)
    n = sdf.count()
    assert n >= 0
    assert len(sdf.schema.fields) > 0
