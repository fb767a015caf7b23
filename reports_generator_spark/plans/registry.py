"""Query registry: the engine's declared operator surface.

Every operator from SURVEY.md §2.3 registers here with
  - a Spark builder ``(spark, sf_dir) -> DataFrame`` and
  - (when SQL-expressible) an equivalent ANSI/DuckDB oracle SQL string.

``__spark_entry__.py`` re-exports these for the driver's verify
harness. The decorator keeps the two sides adjacent in source so the
column aliases provably line up (the harness hashes values under
name-sorted columns).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query builder, optionally with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str, *a: Any, **kw: Any) -> DataFrame:
            from ..session import tune

            tune(spark)
            return fn(spark, sf_dir, *a, **kw)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from . import analytics  # noqa: F401
    from . import relational  # noqa: F401
    from . import windows  # noqa: F401
    from . import text  # noqa: F401
    from . import dedup  # noqa: F401
    from . import similarity  # noqa: F401
    from . import udfs  # noqa: F401
    from . import ingest_queries  # noqa: F401
    from . import multimodal  # noqa: F401
    from . import streaming_queries  # noqa: F401
    from . import temporal  # noqa: F401
