"""File-format sources beyond parquet: CSV and JSON-lines.

The reference's only structured sink is header+quoteAll CSV
(Proof.scala:140-145) and its only structured source is parquet
(Main.scala:40). A user switching engines needs the CSV it wrote to be
readable back, plus the JSONL interchange format every pipeline grows.

Both readers take an explicit schema: schema inference is a full extra
pass over the data (prohibitive at 100 TB) and type-unstable between
runs; at scale the schema comes from the catalog, exactly as the
reference derives its schema from config (Proof.scala:276-284).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV scan with explicit schema (PERMISSIVE by default: malformed
    rows become NULLs rather than failing the job — the distributed
    form of the reference's per-file try/catch, Proof.scala:71-87)."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .options(**options)
        .csv(path)
    )


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType | str, **options: str
) -> DataFrame:
    """JSON-lines scan with explicit schema."""
    return spark.read.schema(schema).options(**options).json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink (one object per row; partitioned parallel write)."""
    df.write.mode(mode).json(path)
