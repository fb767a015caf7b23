"""Independent golden-result generator for the E1 report contract.

Computes the EXPECTED 27-column ERP output for the deterministic
fixture corpus (ingest/fixtures.py) in pure Python — no Spark — and
writes it as a CSV that DuckDB loads as the `report_ingest` /
`stream_report_ingest` oracle table. This closes the reference's
flagship capability (Proof.scala:50-153) under the same differential
hash gate as every relational key: the driver compares the Spark
pipeline's output against this independently-derived expectation.

The only non-deterministic output column is RUTA_DE_REPORTE (an
absolute file URI whose scheme/encoding are Spark-internal); the
registered queries project it to the report file's basename, which
this golden reproduces exactly — so all 27 columns are attested, with
the path column attested at basename granularity.

Quoting contract: every CSV field is quoted and the oracle reads with
``allow_quoted_nulls=false`` so an empty TIPO_DE_REPORTE survives as
'' (matching Spark's all-string schema), not NULL.
"""

from __future__ import annotations

import csv
import os

from ..config import ERP_HEADERS, ReportConfig
from .fixtures import block_values, report_file_name


def expected_erp_rows(
    n_files: int, blocks_per_file: int, generation_date: str
) -> list[dict[str, str]]:
    """Expected ERP output rows (header name -> value), one per block,
    derived independently from the fixture value grammar + the public
    contract (incl. the reference's swapped-count quirk, see
    ingest/reports.py ERP_FIELD_ORDER)."""
    cfg = ReportConfig(input_dir="", output_parquet="", output_csv="")
    rows: list[dict[str, str]] = []
    for f in range(n_files):
        fname = report_file_name(f)
        gen_ts = f"{(f % 28) + 1:02d}-{(f % 12) + 1:02d}-2019T13_{f % 60:02d}_30"
        for b in range(blocks_per_file):
            v = block_values(f, b)
            bb = f * 1000 + b
            dif_col = str(int(v["fileAntColForCountColumns"]) - int(v["fileColForCountColumns"]))
            dif_row = str(int(v["fileAntColForCountRows"]) - int(v["fileColForCountRows"]))
            vals = (
                "ERP",
                cfg.report_type_message if bb % 2 == 0 else "",
                fname,
                gen_ts,
                v["file"],
                v["tableNameFromFile"],
                v["tableNameFromJson"],
                v["headersFromJson"],
                v["countHeadersFromJson"],
                v["countHeadersFromFile"],
                v["headersFromFile"],
                "SI" if v["equalsHeaders"] == "true" else "NO",
                v["fileDirectory"],
                v["filePath"],
                v["fileSize"],
                v["fileValidSha"],
                v["fileColForSchema"],
                v["fileTableName"],
                v["fileColForPathTable"],
                v["fileAntColForCountColumns"],
                v["fileAntColForCountRows"],
                # contract quirk: DIFERENCIA_* carries the official
                # counts; TOTAL_*_OFICIAL carries the differences
                v["fileColForCountColumns"],
                v["fileColForCountRows"],
                dif_col,
                dif_row,
                v["status"],
                generation_date,
            )
            rows.append(dict(zip(ERP_HEADERS, vals, strict=True)))
    return rows


def write_golden_csv(path: str, rows: list[dict[str, str]]) -> str:
    """Write the expected rows as a fully-quoted CSV (idempotent)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w", newline="", encoding="utf-8") as fh:
        w = csv.DictWriter(fh, fieldnames=list(ERP_HEADERS), quoting=csv.QUOTE_ALL)
        w.writeheader()
        w.writerows(rows)
    os.replace(tmp, path)
    return path
