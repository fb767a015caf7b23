"""Similarity search over embedding columns (array<float>).

Two paths, as the north star prescribes:

- brute-force exact cosine top-k: broadcast the (small) query set,
  stream the candidate corpus through a JVM-side dot product
  (zip_with + aggregate — no Python, no UDF), rank per query.
  At 100 TB the corpus side never shuffles: the only wide op is the
  per-query top-k, which TakeOrdered-style reduces.

- sign-LSH (random-hyperplane) bucketed ANN: H fixed hyperplanes give
  a 2^H-bucket code; queries probe only their own bucket, cutting the
  candidate set by ~2^H. Hyperplanes are seeded-deterministic and
  shipped as literal arrays (no fit step, no driver state).

Cosine is computed in float64 after an explicit cast so results are
reproducible against any float64 oracle.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (matches a left-to-right sum)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Adds float64 vector `v` and its L2 norm `v_norm` (computed once)."""
    v = F.col(vec_col).cast("array<double>")
    return df.withColumn("v", v).withColumn("v_norm", F.sqrt(_dot(F.col("v"), F.col("v"))))


def cosine_topk(
    emb: DataFrame,
    query_ids: list[int] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, score, rank).

    Ranking uses the 4-dp-rounded score with id tiebreak so the top-k
    set is deterministic under float reassociation.
    """
    base = with_norm(emb, vec_col)
    q = base.select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv"), F.col("v_norm").alias("q_norm")
    )
    if query_ids is not None:
        q = q.filter(F.col("query_id").isin(query_ids))
    c = base.select(
        F.col(id_col).alias("neighbor_id"), F.col("v").alias("cv"), F.col("v_norm").alias("c_norm")
    )
    score = F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("q_norm") * F.col("c_norm")), 4)
    pairs = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", score.alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Seeded-deterministic Gaussian hyperplanes (driver-side literals)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def signlsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Bucket code: one sign bit per hyperplane, packed into a long."""
    code = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        d = _dot(vec, F.array(*[F.lit(x) for x in plane]))
        bit = F.when(d >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        code = code.bitwiseXOR(F.shiftleft(bit, i))
    return code


def cosine_topk_lsh(
    emb: DataFrame,
    query_ids: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 4,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k via multi-table sign-LSH.

    L independent tables of P hyperplanes each; a candidate is scored
    if it shares the query's bucket in ANY table (recall ≈
    1-(1-p^P)^L for per-plane agreement p). Candidate volume is
    ~L/2^P of the corpus — the knob the deployment tunes. The
    per-table join is an equi-join on (table, bucket), hash-
    partitionable at any scale; candidates are deduped before the
    (more expensive) exact scoring.
    """
    base = with_norm(emb, vec_col)
    buckets = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                signlsh_bucket(
                    F.col("v"), random_hyperplanes(dim, n_planes, seed + 1000 * t)
                ).alias("bucket"),
            )
            for t in range(n_tables)
        ]
    )
    hashed = base.withColumn("tb", F.explode(buckets)).select(
        id_col, "v", "v_norm", F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket")
    )
    q = hashed.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), "tbl", "bucket"
    )
    cand = (
        hashed.select(F.col(id_col).alias("neighbor_id"), "tbl", "bucket")
        .join(F.broadcast(q), ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = base.select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv"), F.col("v_norm").alias("q_norm")
    ).filter(F.col("query_id").isin(query_ids))
    cv = base.select(
        F.col(id_col).alias("neighbor_id"), F.col("v").alias("cv"), F.col("v_norm").alias("c_norm")
    )
    score = F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("q_norm") * F.col("c_norm")), 4)
    pairs = (
        cand.join(cv, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select("query_id", "neighbor_id", score.alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def cosine_topk_ivf(
    emb: DataFrame,
    query_ids: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k via an IVF (inverted-file) index, pure DataFrame ops.

    Coarse quantizer: n_cells centroids chosen deterministically (the
    n_cells corpus vectors with the smallest xxhash64(seed, id) — a
    seeded uniform sample; no iterative k-means fit step, so the index
    build is a single broadcast-join pass, which is the right trade at
    ingest time). Every corpus vector is assigned to its nearest
    centroid's cell; a query probes its n_probe nearest cells and
    exact-scores only those candidates.

    Scale shape: centroids are O(n_cells·dim) — always broadcastable;
    cell assignment is one map-side broadcast join + per-id top-1
    window; the probe join is equi-key on `cell` so candidate volume is
    ~ (n_probe / n_cells) of the corpus per query.
    """
    base = with_norm(emb, vec_col)
    w_cent = Window.orderBy(F.xxhash64(F.lit(seed), F.col(id_col)))
    cents = (
        base.orderBy(F.xxhash64(F.lit(seed), F.col(id_col)))
        .limit(n_cells)
        .select(
            # row_number over the same hash order: a stable dense cell id
            # (the window runs over only n_cells rows post-limit)
            (F.row_number().over(w_cent) - 1).alias("cell"),
            F.col("v").alias("cv_cent"),
            F.col("v_norm").alias("cent_norm"),
        )
    )
    cent_score = _dot(F.col("v"), F.col("cv_cent")) / (
        F.col("v_norm") * F.col("cent_norm")
    )
    ranked = (
        base.select(id_col, "v", "v_norm")
        .crossJoin(F.broadcast(cents))
        .select(id_col, "v", "v_norm", "cell", cent_score.alias("cscore"))
    )
    w_assign = Window.partitionBy(id_col).orderBy(
        F.col("cscore").desc(), F.col("cell").asc()
    )
    assigned = ranked.withColumn("crank", F.row_number().over(w_assign))
    cells = assigned.filter(F.col("crank") == 1).select(id_col, "v", "v_norm", "cell")
    probes = (
        assigned.filter(F.col(id_col).isin(query_ids))
        .filter(F.col("crank") <= n_probe)
        .select(F.col(id_col).alias("query_id"), "cell")
    )
    qv = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv"), F.col("v_norm").alias("q_norm")
    )
    score = F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("q_norm") * F.col("c_norm")), 4)
    pairs = (
        cells.select(F.col(id_col).alias("neighbor_id"), F.col("v").alias("cv"),
                     F.col("v_norm").alias("c_norm"), "cell")
        .join(F.broadcast(probes), ["cell"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "cv", "c_norm")
        .dropDuplicates(["query_id", "neighbor_id"])
        .join(F.broadcast(qv), "query_id")
        .select("query_id", "neighbor_id", score.alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def embedding_neardup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.38,
) -> DataFrame:
    """All pairs with cosine ≥ threshold — simple pure-DataFrame form.

    O(n²) pair rows through the JVM expression path; correct at any
    size but the blocked variant below is the one to run (vectorized
    matmul, ~50× less per-pair overhead)."""
    base = with_norm(emb, vec_col)
    a = base.select(F.col(id_col).alias("id_a"), F.col("v").alias("va"), F.col("v_norm").alias("na"))
    b = base.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"), F.col("v_norm").alias("nb"))
    score = F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 4)
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", score.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def embedding_neardup_blocked(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.38,
    n_blocks: int = 8,
) -> DataFrame:
    """All-pairs cosine ≥ threshold via block-matrix products.

    Vectors hash into n_blocks blocks; each of the B(B+1)/2 block
    pairs becomes one task computing a numpy matmul over its two
    (s×dim) matrices and emitting only the above-threshold pairs.
    Per-pair cost is a SIMD multiply-add instead of an interpreted
    expression; shuffle volume is O(n·dim·B) (each block ships to B
    partners), and the pair space never materializes as rows.

    At 100 TB scale the same operator runs after LSH bucketing (join
    blocks on bucket instead of all-pairs) — the matmul kernel is
    unchanged.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    blk = emb.select(
        F.col(id_col).alias("vid").cast("long"),
        F.col(vec_col).cast("array<double>").alias("v"),
        F.pmod(F.col(id_col).cast("long"), F.lit(n_blocks)).alias("blk"),
    )
    packed = blk.groupBy("blk").agg(
        F.collect_list(F.struct("vid", "v")).alias("vecs")
    )
    pa = packed.select(F.col("blk").alias("blk_a"), F.col("vecs").alias("vecs_a"))
    pb = packed.select(F.col("blk").alias("blk_b"), F.col("vecs").alias("vecs_b"))
    block_pairs = pa.join(pb, F.col("blk_a") <= F.col("blk_b")).repartition(
        n_blocks * (n_blocks + 1) // 2
    )

    out_schema = StructType(
        [
            StructField("id_a", LongType()),
            StructField("id_b", LongType()),
            StructField("cosine", DoubleType()),
        ]
    )

    def score_blocks(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                ids_a = np.array([x["vid"] for x in row["vecs_a"]], dtype=np.int64)
                mat_a = np.array([x["v"] for x in row["vecs_a"]], dtype=np.float64)
                ids_b = np.array([x["vid"] for x in row["vecs_b"]], dtype=np.int64)
                mat_b = np.array([x["v"] for x in row["vecs_b"]], dtype=np.float64)
                na = np.linalg.norm(mat_a, axis=1)
                nb = np.linalg.norm(mat_b, axis=1)
                sim = (mat_a @ mat_b.T) / np.outer(na, nb)
                sim = np.floor(sim * 10000 + 0.5) / 10000  # dround(4)
                ia, ib = np.nonzero(sim >= threshold)
                lhs, rhs = ids_a[ia], ids_b[ib]
                if row["blk_a"] == row["blk_b"]:
                    # same block: each unordered pair appears twice +
                    # the diagonal; keep the ordered half
                    keep = lhs < rhs
                    lo, hi, sc = lhs[keep], rhs[keep], sim[ia, ib][keep]
                else:
                    # disjoint blocks: each pair appears exactly once;
                    # normalize id order
                    lo = np.minimum(lhs, rhs)
                    hi = np.maximum(lhs, rhs)
                    sc = sim[ia, ib]
                yield pd.DataFrame({"id_a": lo, "id_b": hi, "cosine": sc})

    return block_pairs.mapInPandas(score_blocks, out_schema)


def semantic_dedup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
) -> DataFrame:
    """SemDeDup-style semantic dedup: partition the embedding space
    into n_cells (seedless deterministic coarse quantizer), keep ONE
    representative per cell — the member closest to its centroid.

    Returns (cell, n_members, rep_id, rep_score). Everything except
    the final per-cell pick is the IVF assignment pass: centroids are
    O(n_cells·dim) and broadcast; assignment is a map-side cross +
    per-id top-1 window. Centroid choice is the n_cells vectors
    minimizing (id·2654435761) mod 1000003 — a fixed multiplicative
    hash both engines can compute (unlike xxhash64), so the whole
    operator is oracle-checkable. At corpus scale n_cells grows ~√N so
    the per-cell window never concentrates (documented upgrade:
    k-means centroids refreshed per ingest batch; the plan shape is
    unchanged).
    """
    base = with_norm(emb, vec_col)
    hkey = (F.col(id_col) * F.lit(2654435761)) % F.lit(1000003)
    w_cent = Window.orderBy(hkey.asc(), F.col(id_col).asc())
    cents = (
        base.orderBy(hkey.asc(), F.col(id_col).asc())
        .limit(n_cells)
        .select(
            (F.row_number().over(w_cent) - 1).alias("cell"),
            F.col("v").alias("cv"),
            F.col("v_norm").alias("cnrm"),
        )
    )
    cscore = F.round(
        _dot(F.col("v"), F.col("cv")) / (F.col("v_norm") * F.col("cnrm")), 6
    )
    w_assign = Window.partitionBy(id_col).orderBy(
        F.col("cscore").desc(), F.col("cell").asc()
    )
    best = (
        base.select(id_col, "v", "v_norm")
        .crossJoin(F.broadcast(cents))
        .select(id_col, "cell", cscore.alias("cscore"))
        .withColumn("crank", F.row_number().over(w_assign))
        .filter(F.col("crank") == 1)
    )
    w_cell = Window.partitionBy("cell").orderBy(
        F.col("cscore").desc(), F.col(id_col).asc()
    )
    return (
        best.select(
            "cell",
            F.col(id_col),
            "cscore",
            F.count(F.lit(1)).over(Window.partitionBy("cell")).alias("n_members"),
            F.row_number().over(w_cell).alias("rk"),
        )
        .filter(F.col("rk") == 1)
        .select(
            "cell",
            "n_members",
            F.col(id_col).alias("rep_id"),
            F.col("cscore").alias("rep_score"),
        )
    )
