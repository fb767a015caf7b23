"""Deterministic cross-engine rounding.

Spark's round() converts the double through Java's shortest string
representation and applies BigDecimal HALF_UP; DuckDB rounds the
actual binary double. At half-boundaries (e.g. a product that prints
as x.xx5 but is binarily x.xx4999…) the two disagree. Differential
correctness therefore uses the bit-exact formula

    floor(x * 10^n + 0.5) / 10^n

on BOTH engines: identical IEEE-754 ops on identical doubles give
identical results. Oracle SQL writes the same expression literally.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dround(col: Column, n: int = 2) -> Column:
    """floor(x·10ⁿ + 0.5)/10ⁿ — deterministic round-half-up."""
    f = 10 ** n
    return F.floor(col * f + 0.5) / f


def sql_dround(expr: str, n: int = 2) -> str:
    """The oracle-side spelling of dround for embedding in SQL."""
    f = 10 ** n
    return f"floor(({expr}) * {f} + 0.5) / {f}"


def np_dround(x, n: int = 4):
    """Numpy round-half-AWAY-FROM-ZERO to n decimals.

    The floor(x·f + 0.5) spelling above rounds negative exact halves
    toward +inf; DuckDB's round() (std::round on the binary double)
    rounds them away from zero. Kernels whose oracle SQL says
    round(expr, n) — the kNN-graph cosine family — must therefore use
    this copysign form so a negative cosine landing exactly on a
    half-grid point rounds identically on both engines (a tie there
    would otherwise flip a top-k edge cross-engine). Kernels whose
    oracle literally mirrors floor(x·f+0.5) keep np.floor.
    """
    import numpy as np

    f = 10.0 ** n
    return np.copysign(np.floor(np.abs(x) * f + 0.5), x) / f
