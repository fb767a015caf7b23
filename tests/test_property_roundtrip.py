"""Property test (SURVEY.md §5.2): report-grammar round-trip.

Generate random record blocks → serialize them in the reference's
`key: value` grammar → ingest → every field must land in its public
column, trimmed, with SI/NO normalization applied. This covers the
parser against arbitrary values (colons inside values, unicode,
whitespace padding, empties) that the deterministic goldens don't.
"""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from reports_generator_spark.config import ReportConfig
from reports_generator_spark.ingest import ingest_reports
from reports_generator_spark.ingest.fixtures import INPUT_KEYS

GEN_DATE = "2026-01-01 00:00:00"

# printable, no control chars (the grammar is line-oriented)
_value = st.text(
    alphabet=st.characters(blacklist_categories=("Cs", "Cc")),
    max_size=40,
)

#: input key -> public (Spanish) column, per the golden mapping
_CHECK = {
    "tableNameFromFile": "NOMBRE_DE_TABLA_ASIGNADO_EN_LANDING_RAW_POR_ARCHIVO",
    "headersFromJson": "CABECERA_ASIGNADA",
    "fileDirectory": "NOMBRE_DE_DIRECTORIO",
    "fileSize": "TAMANO_DE_ARCHIVO_BYTES",
    "fileTableName": "NOMBRE_TABLA",
    "status": "ESTADO_DEL_PROCESO",
}


@st.composite
def _blocks(draw):
    n = draw(st.integers(min_value=1, max_value=3))
    out = []
    for i in range(n):
        vals = {k: draw(_value) for k in INPUT_KEYS}
        vals["file"] = f"doc_{i}.csv"  # stable row locator
        vals["equalsHeaders"] = draw(
            st.sampled_from(["true", "false", "TRUE", "", "maybe"])
        )
        out.append(vals)
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(blocks=_blocks())
def test_roundtrip_random_blocks(spark, tmp_path_factory, blocks):
    d = str(tmp_path_factory.mktemp("prop_reports"))
    path = os.path.join(d, "[ERP]_REPORT_PARQUET_DATE_OF_PROCESSS[01-01-2019T00_00_00].TXT")
    with open(path, "w", encoding="utf-8") as fh:
        for vals in blocks:
            for k in INPUT_KEYS:
                fh.write(f"{k}: {vals[k]}\n")

    cfg = ReportConfig(
        input_dir=d, output_parquet="", output_csv="", generation_date=GEN_DATE
    )
    df = ingest_reports(spark, cfg)
    rows = {r["ARCHIVO_PROCESADO"]: r for r in df.collect()}
    assert len(rows) == len(blocks)
    for vals in blocks:
        row = rows[vals["file"]]
        for in_key, pub_col in _CHECK.items():
            # Spark trim strips ASCII spaces only (\xa0 etc. survive, as
            # with the reference's Java String.trim)
            assert row[pub_col] == vals[in_key].strip(" "), (in_key, pub_col)
        expect_si = "SI" if vals["equalsHeaders"].strip() == "true" else "NO"
        assert row["CABECERAS_IGUALES"] == expect_si
