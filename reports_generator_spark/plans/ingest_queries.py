"""E1 `report_ingest` as a declared query — hash-attested.

The report grammar is not expressible over the fixture parquet
tables, but the fixture corpus is deterministic, so the oracle is an
independently-derived golden CSV (ingest/golden.py computes the
expected 27-column contract in pure Python) loaded by DuckDB via
read_csv. The driver's value-hash compare therefore covers the
reference's flagship capability (Proof.scala:50-153) at full value
granularity; per-stage goldens additionally live in
tests/test_ingest.py.

RUTA_DE_REPORTE is projected to the report file's basename — the only
environment-dependent part of a row is the absolute URI
scheme/encoding of the source path, which is Spark-internal detail,
not contract output. All 27 columns are attested.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import ReportConfig
from ..ingest import ingest_reports
from ..ingest.fixtures import write_report_files
from ..ingest.golden import expected_erp_rows, write_golden_csv
from .registry import query

_FIXED_GEN_DATE = "2026-01-01 00:00:00"
_N_FILES, _BLOCKS = 5, 6

_GOLDEN_DIR = os.path.join(tempfile.gettempdir(), "rg_spark_report_goldens_v1")
GOLDEN_BATCH_CSV = os.path.join(_GOLDEN_DIR, "report_ingest_batch.csv")
GOLDEN_STREAM_CSV = os.path.join(_GOLDEN_DIR, "report_ingest_stream.csv")


def _fixture_dir() -> str:
    d = os.path.join(tempfile.gettempdir(), "rg_spark_report_fixtures_v1")
    marker = os.path.join(d, ".complete")
    if not os.path.exists(marker):
        os.makedirs(d, exist_ok=True)
        write_report_files(d, n_files=_N_FILES, blocks_per_file=_BLOCKS)
        with open(marker, "w") as fh:
            fh.write("ok")
    return d


def ensure_goldens() -> None:
    """Write the DuckDB oracle CSVs (idempotent, pure Python). Runs at
    import so the oracle table exists regardless of whether the driver
    evaluates the SQL before or after the Spark query."""
    if not os.path.exists(GOLDEN_BATCH_CSV):
        write_golden_csv(
            GOLDEN_BATCH_CSV, expected_erp_rows(_N_FILES, _BLOCKS, _FIXED_GEN_DATE)
        )
    if not os.path.exists(GOLDEN_STREAM_CSV):
        # the streaming key ingests the 3x4 fixture corpus
        write_golden_csv(GOLDEN_STREAM_CSV, expected_erp_rows(3, 4, _FIXED_GEN_DATE))


ensure_goldens()


def basename_ruta(df: DataFrame) -> DataFrame:
    """Project RUTA_DE_REPORTE to the source file's basename (see
    module docstring), preserving column order."""
    return df.withColumn(
        "RUTA_DE_REPORTE", F.regexp_extract("RUTA_DE_REPORTE", r"([^/]+)$", 1)
    )


_ORACLE_TEMPLATE = """
    SELECT * FROM read_csv(
        '{path}', header = true, all_varchar = true,
        allow_quoted_nulls = false
    )
"""

REPORT_INGEST_ORACLE = _ORACLE_TEMPLATE.format(path=GOLDEN_BATCH_CSV)
STREAM_REPORT_INGEST_ORACLE = _ORACLE_TEMPLATE.format(path=GOLDEN_STREAM_CSV)


@query("report_ingest", oracle=REPORT_INGEST_ORACLE)
def report_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full E1: recursive .TXT scan → block parse → normalize → enrich
    → 27-column Spanish string contract (30 rows from 5×6 blocks),
    hash-checked against the pure-Python golden (ingest/golden.py)."""
    cfg = ReportConfig(
        input_dir=_fixture_dir(),
        output_parquet="",  # sinks not exercised here
        output_csv="",
        module="ERP",
        generation_date=_FIXED_GEN_DATE,
    )
    return basename_ruta(ingest_reports(spark, cfg))
