"""E1 `report_ingest` as a declared query.

The report grammar is not SQL-expressible over the fixture tables, so
this is a rows-only entry (the driver's weaker check); full value-level
goldens live in tests/test_ingest.py. The query synthesizes a
deterministic report corpus under /tmp (derived only from constants —
identical every run) and runs the complete E1 pipeline on it.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from ..config import ReportConfig
from ..ingest import ingest_reports
from ..ingest.fixtures import write_report_files
from .registry import query

_FIXED_GEN_DATE = "2026-01-01 00:00:00"


def _fixture_dir() -> str:
    d = os.path.join(tempfile.gettempdir(), "rg_spark_report_fixtures_v1")
    marker = os.path.join(d, ".complete")
    if not os.path.exists(marker):
        os.makedirs(d, exist_ok=True)
        write_report_files(d, n_files=5, blocks_per_file=6)
        with open(marker, "w") as fh:
            fh.write("ok")
    return d


@query("report_ingest")
def report_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full E1: recursive .TXT scan → block parse → normalize → enrich
    → 27-column Spanish string contract (30 rows from 5×6 blocks)."""
    cfg = ReportConfig(
        input_dir=_fixture_dir(),
        output_parquet="",  # sinks not exercised here
        output_csv="",
        module="ERP",
        generation_date=_FIXED_GEN_DATE,
    )
    return ingest_reports(spark, cfg)
