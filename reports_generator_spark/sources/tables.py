"""Parquet table sources for the fixture star schema.

The reference reads parquet with a bare ``spark.read.parquet`` (
Main.scala:40, Proof.scala:231); this is the same, plus a tiny registry
so operators refer to tables by name. Scans stay declarative, so
Catalyst pushes filters/projections into the parquet reader (check
``.explain``: PushedFilters / ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def normalize_nanos_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Parquet TIMESTAMP(NANOS) arrives as raw long (nanosAsLong conf);
    rescale to a micros timestamp with integer division, matching
    DuckDB's nanos→micros truncation."""
    field = next((f_ for f_ in df.schema.fields if f_.name == col), None)
    if field is not None and isinstance(field.dataType, LongType):
        df = df.withColumn(col, F.expr(f"timestamp_micros({col} DIV 1000)"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Plain parquet scan — no caching, no
    repartition; the consumer's plan decides physical layout."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_nanos_ts(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
