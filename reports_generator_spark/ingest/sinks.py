"""Result sinks (SURVEY.md §2.1 K1/K2 + P13 done right).

Reference behavior and its two defects we fix:
- CSV sink overwrote per input file (Proof.scala:140-145) so only the
  last report's CSV survived → here CSV appends like parquet.
- Parquet sink forced `repartition(1)` (Proof.scala:148,151) →
  single-file writes serialize at scale; here the default is a
  partitioned parallel write, single_file is an explicit export option.
- The already-processed check was a stub (Proof.scala:225-234) → here
  it is a left-anti join on RUTA_DE_REPORTE against the existing sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

REPORT_PATH_COL = "RUTA_DE_REPORTE"


def write_csv(df: DataFrame, path: str, mode: str = "append") -> None:
    """K1: header + quote-all CSV (Proof.scala:140-145 options)."""
    df.write.mode(mode).option("header", True).option("quoteAll", True).csv(path)


def write_parquet_idempotent(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    key_col: str = REPORT_PATH_COL,
    single_file: bool = False,
) -> DataFrame:
    """K2+P13: append only not-yet-processed report rows to parquet.

    First write creates the dataset (the reference's overwrite-first
    probe, Proof.scala:51-53, without the mutable driver flag). Returns
    the DataFrame of rows actually written.
    """
    try:
        existing = spark.read.parquet(path).select(key_col).distinct()
        fresh = df.join(F.broadcast(existing), key_col, "left_anti")
        mode = "append"
    except AnalysisException:
        fresh = df
        mode = "overwrite"
    out = fresh.coalesce(1) if single_file else fresh
    out.write.mode(mode).parquet(path)
    return fresh
