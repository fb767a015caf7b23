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
