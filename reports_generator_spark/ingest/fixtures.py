"""Deterministic report-file fixture generator.

Synthesizes `.TXT` report files in the reference's exact input grammar
(derived from Proof.scala:106-130,157-214): one record = 22
`key: value` lines, terminated by the `status` line; the
`equalsHeaders` value is a raw boolean the pipeline localizes to
SI/NO; file names follow the Main.scala:18 convention with the
bracketed generation timestamp.

Used by the E1 golden tests and by the `report_ingest` query entry
(which must be reproducible run-to-run — everything here derives from
(file_idx, block_idx) only).
"""

from __future__ import annotations

import os

#: input keys by position (9/10 are real lines the contract drops)
INPUT_KEYS: tuple[str, ...] = (
    "file",
    "tableNameFromFile",
    "tableNameFromJson",
    "headersFromJson",
    "countHeadersFromJson",
    "countHeadersFromFile",
    "headersFromFile",
    "equalsHeaders",
    "ignoredChecksumA",
    "ignoredChecksumB",
    "fileDirectory",
    "filePath",
    "fileSize",
    "fileValidSha",
    "fileColForSchema",
    "fileTableName",
    "fileColForPathTable",
    "fileAntColForCountColumns",
    "fileAntColForCountRows",
    "fileColForCountColumns",
    "fileColForCountRows",
    "status",
)


def block_values(file_idx: int, block_idx: int) -> dict[str, str]:
    """The 22 deterministic input values for one record block."""
    b = file_idx * 1000 + block_idx
    return {
        "file": f"data_{b:05d}.csv",
        "tableNameFromFile": f"tbl_file_{b % 7}",
        "tableNameFromJson": f"tbl_json_{b % 7}",
        "headersFromJson": "c1;c2;c3;c4",
        "countHeadersFromJson": str(4 + b % 3),
        "countHeadersFromFile": str(4),
        "headersFromFile": "c1;c2;c3;c4",
        "equalsHeaders": "true" if b % 3 == 0 else "false",
        "ignoredChecksumA": f"ignA_{b}",
        "ignoredChecksumB": f"ignB_{b}",
        "fileDirectory": f"/landing/dir_{file_idx}",
        "filePath": f"/landing/dir_{file_idx}/data_{b:05d}.csv",
        "fileSize": str(1024 + 13 * b),
        "fileValidSha": "OK" if b % 5 else "FAIL",
        "fileColForSchema": "parquet" if b % 2 == 0 else "avro",
        "fileTableName": f"official_tbl_{b % 7}",
        "fileColForPathTable": f"/official/tbl_{b % 7}",
        "fileAntColForCountColumns": str(10 + b % 4),
        "fileAntColForCountRows": str(1000 + 17 * b),
        "fileColForCountColumns": str(10),
        "fileColForCountRows": str(1000 + 17 * b - (b % 5)),
        "status": "FINISHED" if b % 4 else "FAILED",
    }


def report_file_name(file_idx: int) -> str:
    ts = f"{(file_idx % 28) + 1:02d}-{(file_idx % 12) + 1:02d}-2019T13_{file_idx % 60:02d}_30"
    return f"[ERP]_REPORT_PARQUET_DATE_OF_PROCESSS[{ts}].TXT"


def write_report_files(
    out_dir: str, n_files: int = 3, blocks_per_file: int = 4, nested: bool = True
) -> list[str]:
    """Write fixture reports (some in nested subdirs to exercise the
    recursive scan, Proof.scala:70). Idempotent for fixed args."""
    paths = []
    for i in range(n_files):
        sub = os.path.join(out_dir, f"batch_{i % 2}") if nested and i % 2 else out_dir
        os.makedirs(sub, exist_ok=True)
        path = os.path.join(sub, report_file_name(i))
        lines: list[str] = []
        for blk in range(blocks_per_file):
            vals = block_values(i, blk)
            lines.extend(f"{k}: {vals[k]}" for k in INPUT_KEYS)
        with open(path, "w", encoding="utf-8") as fh:
            fh.write("\n".join(lines) + "\n")
        paths.append(path)
    # a decoy with the wrong extension must be ignored by the scan
    with open(os.path.join(out_dir, "ignore_me.log"), "w", encoding="utf-8") as fh:
        fh.write("status: NOT_A_REPORT\n")
    return paths
