"""Grouped-map ML feature operators (Arrow `applyInPandas`).

The pattern the multimodal/packing operators also use: Spark handles
partitioning/grouping/shuffle, numpy does the per-group linear
algebra on an Arrow-materialized batch. Per-group state must fit one
task's memory — the right trade for per-class statistics (classes are
bounded); for unbounded groups the power-iteration-via-aggregates
formulation replaces the in-memory SVD (documented, not needed for
class-level PCA).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pca_top_component(
    df: DataFrame,
    vec_col: str = "embedding",
    key_col: str = "label",
) -> DataFrame:
    """First principal component per group: (key, dim, component).

    Each group's vectors are centered and SVD'd in one Arrow batch;
    the component's sign is normalized (largest-|coefficient| entry
    made positive) so the output is deterministic — SVD is otherwise
    sign-ambiguous.
    """
    import pandas as pd

    def fit(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        m = m - m.mean(axis=0)
        _, _, vt = np.linalg.svd(m, full_matrices=False)
        v = vt[0]
        i = int(np.abs(v).argmax())
        if v[i] < 0:
            v = -v
        return pd.DataFrame(
            {
                key_col: pdf[key_col].iloc[0],
                "dim": range(len(v)),
                "component": v,
            }
        )

    return df.select(key_col, vec_col).groupBy(key_col).applyInPandas(
        fit, f"{key_col} int, dim int, component double"
    )


def kmeans_lloyd(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    n_iter: int = 3,
    quant: int = 1_000_000,
) -> DataFrame:
    """Deterministic distributed k-means (Lloyd) over a vector column:
    (id, cluster_id) after ``n_iter`` rounds from a fixed init (the
    vectors with the k smallest ids).

    Built to be BIT-REPRODUCIBLE across engines and runs — the
    property float k-means never has — by keeping every
    order-sensitive reduction in exact integer arithmetic:

    - input vectors quantize once to integers (floor(x·q + 0.5) —
      exact on any engine);
    - centroid state is (per-dim integer SUM, integer COUNT) — both
      order-independent reductions, partial-aggregable, one shuffle
      per round carrying k·dim longs;
    - the only float ops are one division s/c per centroid dim and
      the per-pair distance fold, both index-ordered and
      accumulation-order-free.

    Per round: one broadcast of k centroids (tiny) against the
    corpus — map-side argmin, NO shuffle of the vectors; then one
    groupBy(cluster) over the posexploded dims. At 100 TB that is
    the textbook scalable k-means shape (k·dim state, corpus never
    re-partitioned); k-means‖ init would replace the fixed-id seed.
    """
    q = df.select(
        F.col(id_col).alias("id"),
        F.transform(
            vec_col, lambda x: F.floor(x.cast("double") * quant + 0.5).cast("long")
        ).alias("qv"),
    ).localCheckpoint()

    # init: the k smallest ids' vectors, as 1-row broadcastable state
    init = q.orderBy("id").limit(k).select(
        F.col("id").alias("cid"), F.col("qv").alias("csum")
    ).withColumn("cn", F.lit(1).cast("long"))
    # renumber centroid ids 0..k-1 deterministically by source id
    from pyspark.sql import Window

    init = init.withColumn(
        "cid", F.row_number().over(Window.orderBy("cid")) - 1
    )
    cent = init.localCheckpoint()

    for _ in range(n_iter):
        c = cent.select(
            "cid",
            F.transform(
                "csum", lambda x: x.cast("double") / F.col("cn").cast("double")
            ).alias("cv"),
        )
        # map-side argmin over the k broadcast centroids
        dist = F.aggregate(
            F.zip_with("qv", "cv", lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        assigned = (
            q.crossJoin(F.broadcast(c))
            .select("id", "qv", "cid", dist.alias("d2"))
            .groupBy("id", "qv")
            .agg(F.min(F.struct(F.col("d2"), F.col("cid"))).alias("best"))
            .select("id", "qv", F.col("best.cid").alias("cid"))
        )
        cent = (
            assigned.select("cid", F.posexplode("qv").alias("dim", "v"))
            .groupBy("cid", "dim")
            .agg(F.sum("v").alias("s"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "s"))),
                    lambda t: t["s"],
                ).alias("csum")
            )
            .join(
                assigned.groupBy("cid").agg(F.count(F.lit(1)).cast("long").alias("cn")),
                "cid",
            )
            .localCheckpoint()
        )

    # final assignment against the last centroids
    c = cent.select(
        "cid",
        F.transform(
            "csum", lambda x: x.cast("double") / F.col("cn").cast("double")
        ).alias("cv"),
    )
    dist = F.aggregate(
        F.zip_with("qv", "cv", lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        q.crossJoin(F.broadcast(c))
        .select("id", "cid", dist.alias("d2"))
        .groupBy("id")
        .agg(F.min(F.struct(F.col("d2"), F.col("cid"))).alias("best"))
        .select(F.col("id"), F.col("best.cid").alias("cluster_id"))
    )
