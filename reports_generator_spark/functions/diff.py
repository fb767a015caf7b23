"""Multiset-difference counters for attestation twins (r14).

The protocol keys attest `stored ≡ recomputed` with
``a.exceptAll(b).unionAll(b.exceptAll(a)).count()``. Each ``exceptAll``
plans as its own aggregate, so the pattern scans both inputs twice and
shuffles four times for one scalar. The signed-union spelling below
computes the SAME number — Σ |count_a(row) − count_b(row)| over distinct
rows, which is exactly the size of the two-sided multiset difference —
with one scan of each input and one shuffle, in one job.

Grouping semantics match ``exceptAll``'s row comparison: NULLs compare
equal, NaN is canonicalized, -0.0 == 0.0 (both paths run through the
same aggregate-key normalization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _signed_counts(a: DataFrame, b: DataFrame) -> DataFrame:
    cols = a.columns
    return (
        a.withColumn("__sd_sgn", F.lit(1))
        .unionByName(b.select(*cols).withColumn("__sd_sgn", F.lit(-1)))
        .groupBy(*cols)
        .agg(F.sum("__sd_sgn").alias("__sd_d"))
    )


def symmetric_diff_count(a: DataFrame, b: DataFrame) -> int:
    """|a ∖ b| + |b ∖ a| as multisets — equals
    ``a.exceptAll(b).unionAll(b.exceptAll(a)).count()`` — in ONE job."""
    row = (
        _signed_counts(a, b)
        .agg(F.sum(F.abs(F.col("__sd_d"))).alias("n"))
        .collect()[0]
    )
    return int(row["n"] or 0)


def one_sided_diff_count(a: DataFrame, b: DataFrame) -> int:
    """|a ∖ b| as multisets — equals ``a.exceptAll(b).count()`` — in
    ONE job with one shuffle."""
    row = (
        _signed_counts(a, b)
        .agg(
            F.sum(F.greatest(F.col("__sd_d"), F.lit(0))).alias("n")
        )
        .collect()[0]
    )
    return int(row["n"] or 0)


def symmetric_diff_rows(a: DataFrame, b: DataFrame) -> DataFrame:
    """DISTINCT rows of the symmetric multiset difference (the rows an
    exceptAll-both-ways union would contain, deduplicated), lazily."""
    cols = a.columns
    return _signed_counts(a, b).filter(F.col("__sd_d") != 0).select(*cols)
