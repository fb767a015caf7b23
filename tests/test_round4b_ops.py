"""Behavioral tests for the round-4 continuation operators — the
properties the DuckDB parity harness can't express: planted-case
semantics (containment vs Jaccard) and structural bounds (Z-order
cell locality, entropy range)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from reports_generator_spark.operators.dedup import (
    dedup_containment,
    dedup_ngram_jaccard,
)
from reports_generator_spark.plans import registry

from conftest import SF_DIR

registry.load_all()


def test_containment_finds_subset_dup_jaccard_misses(spark):
    """A short doc fully quoted inside a long one: containment 1.0,
    Jaccard far below threshold — the asymmetric metric's reason to
    exist."""
    short = "alpha beta gamma delta epsilon"
    long_ = short + " " + " ".join(f"filler{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, short), (2, long_), (3, "totally unrelated content here now")],
        "doc_id long, text string",
    )
    cont = dedup_containment(docs, threshold=0.8).collect()
    assert [(r.id_a, r.id_b, r.containment) for r in cont] == [(1, 2, 1.0)]
    jac = dedup_ngram_jaccard(docs, threshold=0.2).collect()
    assert all((r.id_a, r.id_b) != (1, 2) for r in jac)


def test_containment_symmetric_on_equal_docs(spark):
    docs = spark.createDataFrame(
        [(1, "one two three four"), (2, "one two three four")],
        "doc_id long, text string",
    )
    rows = dedup_containment(docs, threshold=0.8).collect()
    assert [(r.id_a, r.id_b, r.containment) for r in rows] == [(1, 2, 1.0)]


def test_zorder_cell_span_bound(spark):
    """Each Z-cell maps to exactly one (bx, bby) bucket pair, so the
    raw-key span inside any cell is bounded by the bucket width on
    BOTH dimensions — the zone-map pruning guarantee."""
    cells = registry.QUERIES["zorder_cluster"](spark, SF_DIR).collect()
    assert cells, "no z-cells produced"
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    s = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
    ).collect()[0]
    pk_width = (s[1] - s[0] + 1) / 16.0
    sk_width = (s[3] - s[2] + 1) / 16.0
    for c in cells:
        assert 0 <= c.zval < 256
        assert c.max_pk - c.min_pk < pk_width
        assert c.max_sk - c.min_sk < sk_width


def test_entropy_within_bounds(spark):
    """0 ≤ H ≤ log2(n_tokens); TTR in (0, 1]; H == 0 iff one distinct
    token."""
    rows = registry.QUERIES["text_entropy_quality"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.token_entropy <= math.log2(max(r.n_tokens, 2)) + 1e-6
        assert 0.0 < r.type_token_ratio <= 1.0
