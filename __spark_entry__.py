"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the engine's query registry
(reports_generator_spark.plans): every operator from SURVEY.md §2
registers a Spark builder and, when SQL-expressible, a DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from reports_generator_spark.plans import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped aggregation) on sf0.001."""
    registry.load_all()
    return registry.QUERIES["agg_hash_group"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    registry.load_all()
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query key (omitted ⇒ rows-only)."""
    registry.load_all()
    return dict(registry.ORACLES)
