"""Behavioral tests for similarity search: exact ranking on known
geometry, and LSH recall on planted clusters (the scale path's gate)."""

from __future__ import annotations

import math
import random

from reports_generator_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_ivf,
    cosine_topk_lsh,
    embedding_neardup,
)

DIM = 8


def _vec(*axes: float) -> list[float]:
    v = list(axes) + [0.0] * (DIM - len(axes))
    return v


def test_exact_topk_known_geometry(spark):
    rows = [
        (0, _vec(1.0, 0.0)),            # query
        (1, _vec(1.0, 0.1)),            # closest
        (2, _vec(1.0, 0.5)),            # second
        (3, _vec(0.0, 1.0)),            # orthogonal
        (4, _vec(-1.0, 0.0)),           # opposite
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = cosine_topk(emb, [0], k=4).orderBy("rank").collect()
    assert [r["neighbor_id"] for r in out] == [1, 2, 3, 4]
    assert out[0]["score"] > 0.99
    assert abs(out[2]["score"]) < 1e-6      # orthogonal ⇒ 0
    assert out[3]["score"] == -1.0          # opposite ⇒ -1


def test_lsh_recall_on_planted_clusters(spark):
    """10 clusters of 20 vectors; LSH top-5 must recover most of the
    exact top-5 (same-cluster vectors collide in sign-LSH buckets)."""
    rng = random.Random(7)
    rows = []
    vid = 0
    for c in range(10):
        centroid = [rng.gauss(0, 1) for _ in range(64)]
        n = math.sqrt(sum(x * x for x in centroid))
        centroid = [x / n for x in centroid]
        for _ in range(20):
            noise = [rng.gauss(0, 0.05) for _ in range(64)]
            rows.append((vid, [c + n2 for c, n2 in zip(centroid, noise)]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = [0, 20, 40, 60, 80]

    exact = cosine_topk(emb, queries, k=5).collect()
    approx = cosine_topk_lsh(emb, queries, k=5, n_planes=4, dim=64).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    hits = total = 0
    for q in queries:
        total += len(exact_sets[q])
        hits += len(exact_sets[q] & approx_sets.get(q, set()))
    recall = hits / total
    assert recall >= 0.8, f"LSH recall@5 too low: {recall}"


def test_ivf_recall_on_planted_clusters(spark):
    """Same planted geometry as the LSH test: IVF with enough probes
    must recover most of the exact top-5 (cluster members land in the
    same coarse cell as their query)."""
    rng = random.Random(7)
    rows = []
    vid = 0
    for c in range(10):
        centroid = [rng.gauss(0, 1) for _ in range(64)]
        n = math.sqrt(sum(x * x for x in centroid))
        centroid = [x / n for x in centroid]
        for _ in range(20):
            noise = [rng.gauss(0, 0.05) for _ in range(64)]
            rows.append((vid, [c + n2 for c, n2 in zip(centroid, noise)]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = [0, 20, 40, 60, 80]

    exact = cosine_topk(emb, queries, k=5).collect()
    approx = cosine_topk_ivf(emb, queries, k=5, n_cells=16, n_probe=4).collect()
    exact_sets: dict[int, set[int]] = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx_sets: dict[int, set[int]] = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    hits = total = 0
    for q in queries:
        total += len(exact_sets[q])
        hits += len(exact_sets[q] & approx_sets.get(q, set()))
    recall = hits / total
    assert recall >= 0.8, f"IVF recall@5 too low: {recall}"


def test_neardup_lsh_recall_on_planted_clusters(spark):
    """LSH-prefiltered near-dup must recover most of the exact
    above-threshold pairs on planted clusters (same-cluster vectors
    agree on most hyperplane signs)."""
    from reports_generator_spark.operators.similarity import embedding_neardup_lsh

    rng = random.Random(11)
    rows = []
    vid = 0
    for _ in range(8):
        centroid = [rng.gauss(0, 1) for _ in range(64)]
        n = math.sqrt(sum(x * x for x in centroid))
        centroid = [x / n for x in centroid]
        for _ in range(10):
            noise = [rng.gauss(0, 0.05) for _ in range(64)]
            rows.append((vid, [c + n2 for c, n2 in zip(centroid, noise)]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_neardup(emb, threshold=0.8).collect()
    }
    approx = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_neardup_lsh(emb, threshold=0.8, dim=64).collect()
    }
    assert exact, "fixture must plant above-threshold pairs"
    recall = len(exact.keys() & approx.keys()) / len(exact)
    assert recall >= 0.8, f"LSH near-dup recall too low: {recall}"
    # no false positives, identical scores where found
    assert set(approx) <= set(exact)
    for pair, score in approx.items():
        assert score == exact[pair]


def test_neardup_symmetric_pairs(spark):
    rows = [
        (0, _vec(1.0, 0.0)),
        (1, _vec(1.0, 0.01)),   # near-dup of 0
        (2, _vec(0.0, 1.0)),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {(r["id_a"], r["id_b"]) for r in embedding_neardup(emb, threshold=0.9).collect()}
    assert out == {(0, 1)}  # id_a < id_b exactly once, no self-pairs


def test_signlsh_codes_udf_matches_expression_form(spark):
    """The vectorized multi-table hashing (signlsh_codes_udf, the hot
    path) must produce BIT-IDENTICAL bucket codes to the expression
    spelling (signlsh_bucket, the semantic reference) — same plane
    seeds, same sign rule, same bit packing — at both registered
    parameterizations. This is the contract that made the round-10
    swap value-neutral."""
    from pyspark.sql import functions as F

    from conftest import SF_DIR
    from reports_generator_spark.operators.similarity import (
        random_hyperplanes,
        signlsh_bucket,
        signlsh_codes_udf,
    )
    from reports_generator_spark.sources import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    base = emb.select(
        F.col("vec_id").cast("long").alias("vid"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    for n_planes, n_tables, seed in [(5, 6, 7), (4, 4, 42)]:
        ref = base.select(
            "vid",
            F.array(*[
                signlsh_bucket(
                    F.col("v"), random_hyperplanes(64, n_planes, seed + 1000 * t)
                )
                for t in range(n_tables)
            ]).alias("ref_codes"),
        )
        fast = base.select(
            "vid",
            signlsh_codes_udf(n_planes, n_tables, 64, seed)(F.col("v")).alias(
                "fast_codes"
            ),
        )
        n_diff = ref.join(fast, "vid").filter(
            F.col("ref_codes") != F.col("fast_codes")
        ).count()
        assert n_diff == 0
