"""Streaming report ingest: batch/stream parity + incremental append.

The streaming path must produce exactly the batch E1 result (same
parser plan per micro-batch) and, across restarts with new files, only
append the not-yet-processed reports (foreachBatch + left-anti sink).
"""

from __future__ import annotations

import os

import pytest

from reports_generator_spark.config import ReportConfig
from reports_generator_spark.ingest import ingest_reports
from reports_generator_spark.ingest.fixtures import write_report_files
from reports_generator_spark.streaming.report_stream import stream_report_ingest

GEN_DATE = "2026-01-01 00:00:00"


def _cfg(d: str) -> ReportConfig:
    return ReportConfig(
        input_dir=d, output_parquet="", output_csv="", generation_date=GEN_DATE
    )


@pytest.fixture()
def stream_dirs(tmp_path):
    reports = tmp_path / "reports"
    reports.mkdir()
    return str(reports), str(tmp_path / "sink"), str(tmp_path / "ckpt")


def test_stream_matches_batch_and_appends(spark, stream_dirs):
    reports_dir, sink, ckpt = stream_dirs
    write_report_files(reports_dir, n_files=2, blocks_per_file=3)
    cfg = _cfg(reports_dir)

    q = stream_report_ingest(spark, cfg, sink, checkpoint_dir=ckpt)
    q.awaitTermination()

    got = spark.read.parquet(sink)
    want = ingest_reports(spark, cfg)
    assert got.count() == 2 * 3
    assert sorted(got.columns) == sorted(want.columns)
    key_cols = ["RUTA_DE_REPORTE", "ARCHIVO_PROCESADO"]
    assert sorted(map(tuple, got.select(*key_cols).collect())) == sorted(
        map(tuple, want.select(*key_cols).collect())
    )

    # second run with 2 more files: only the new reports are appended
    # (streaming checkpoint skips seen files; the idempotent sink guards
    # replays), and reprocessing does not duplicate the old rows
    write_report_files(reports_dir, n_files=4, blocks_per_file=3)
    q2 = stream_report_ingest(spark, cfg, sink, checkpoint_dir=ckpt)
    q2.awaitTermination()

    after = spark.read.parquet(sink)
    assert after.count() == 4 * 3
    assert after.select("RUTA_DE_REPORTE").distinct().count() == 4


def test_stream_decoy_extension_ignored(spark, stream_dirs):
    reports_dir, sink, ckpt = stream_dirs
    write_report_files(reports_dir, n_files=1, blocks_per_file=2)
    with open(os.path.join(reports_dir, "noise.log"), "w", encoding="utf-8") as fh:
        fh.write("status: NOT_A_REPORT\n")

    q = stream_report_ingest(spark, _cfg(reports_dir), sink, checkpoint_dir=ckpt)
    q.awaitTermination()
    got = spark.read.parquet(sink)
    assert got.count() == 2
    assert got.filter(got.RUTA_DE_REPORTE.contains("noise.log")).count() == 0
