from .reports import ingest_reports, read_report_lines
from .sinks import write_csv, write_parquet_idempotent

__all__ = [
    "ingest_reports",
    "read_report_lines",
    "write_csv",
    "write_parquet_idempotent",
]
