"""Report-file ingest: the reference's actual capability (SURVEY.md §2.1
S1-S2, P1-P13), rebuilt as ONE declarative Catalyst plan.

Reference shape (Proof.scala:68-137): driver-side recursive listing →
per-file sequential loop → driver reads all lines → parallelize →
repartition(1) → mutable-closure block assembly → positional split.
Every step serializes on the driver or on a single task.

This rebuild:
- S1/S2: `spark.read.text` with recursiveFileLookup + pathGlobFilter —
  executors read; all files in one scan; per-file parallelism free.
  Files are read wholetext so per-file line order is *data*, not
  partition luck (report files are small; a >128 MB report would use
  the mapPartitions line-number path instead).
- P2: block segmentation via cumulative-sum window over the terminator
  marker — the reference's `concat` mutable closure (Proof.scala:104,
  124-130) without the repartition(1).
- P4: SI/NO normalization keyed by the equalsHeaders regex, pre-pivot.
- P6: positional projection with the skip-9/10 mapping
  (Proof.scala:157-185) done as a pure select.
- P8: enrichment done *right*: real filename-date regex, real content
  classification, real count-difference arithmetic — replacing the
  reference's placeholder literals ("cualquier cosa"/"Proof"/"Proof2",
  Proof.scala:250-253) while keeping column positions identical.

Known deviations from reference bugs (documented, intentional):
- values containing ':' are kept whole (split limit 2); the reference
  truncates at the second ':' (Proof.scala:112 split without limit).
- reportType is actually computed; the reference's classification loop
  never runs (no action on the RDD, Proof.scala:260-270) so it always
  embedded the literal "parquet".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import ReportConfig
from ..schemas import generate_schema

#: positional source layout of one record block, after the leading
#: empty slot (Proof.scala:157-185): index -> logical field. Indices
#: 9 and 10 are present in the input but dropped by the contract.
BLOCK_POSITIONS: dict[int, str] = {
    1: "file",
    2: "tableNameFromFile",
    3: "tableNameFromJson",
    4: "headersFromJson",
    5: "countHeadersFromJson",
    6: "countHeadersFromFile",
    7: "headersFromFile",
    8: "equalsHeaders",
    # 9, 10: skipped (Proof.scala:157-185 reads neither)
    11: "fileDirectory",
    12: "filePath",
    13: "fileSize",
    14: "fileValidSha",
    15: "fileColForSchema",
    16: "fileTableName",
    17: "fileColForPathTable",
    18: "fileAntColForCountColumns",
    19: "fileAntColForCountRows",
    20: "fileColForCountColumns",
    21: "fileColForCountRows",
    22: "status",
}

BLOCK_LEN = 22  # values per record block, terminator included

#: ISU zip-archive fields (ISU.scala:19-23). The reference declared
#: them but never defined their input grammar (readFilesISU is an
#: empty TODO, Proof.scala:219-224). Completed here BY KEY, not by
#: position: an ISU block is an ERP block plus up to five optional
#: `infoFile:/zipName:/zipDirectory:/zipPath:/zipSize:` lines anywhere
#: before the terminator — keyed extraction keeps the 22 positional
#: slots (and the skip-9/10 mapping) byte-identical to ERP.
ZIP_KEYS: tuple[str, ...] = ("infoFile", "zipName", "zipDirectory", "zipPath", "zipSize")

#: logical field order of the ERP output row (ERP.scala:2-34 /
#: Proof.scala:187-213) — position i here gets public name
#: ERP_HEADERS[i].
#:
#: CONTRACT QUIRK (faithful to the reference): the header list
#: (Proof.scala:27) and the Row field order (Proof.scala:187-213) are
#: semantically misaligned in the last count block — public
#: DIFERENCIA_TOTAL_COLUMNAS/REGISTROS receive the *official counts*
#: (fileColForCountColumns/Rows) while TOTAL_COLUMNAS/REGISTROS_OFICIAL
#: receive the *differences* (difCountCol/Row). Downstream consumers of
#: the reference's parquet depend on this layout, so we preserve it.
ERP_FIELD_ORDER: tuple[str, ...] = (
    "module",
    "reportType",
    "reportPath",
    "fileGeneratedDate",
    "file",
    "tableNameFromFile",
    "tableNameFromJson",
    "headersFromJson",
    "countHeadersFromJson",
    "countHeadersFromFile",
    "headersFromFile",
    "equalsHeaders",
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
    "difCountCol",
    "difCountRow",
    "status",
    "generationDate",
)

#: filename-embedded generation timestamp, e.g.
#: [ISU]_REPORT_PARQUET_DATE_OF_PROCESSS[04-08-2019T13_51_30].TXT
#: (Main.scala:18 naming convention; the reference left this as the
#: "regrex" TODO at Proof.scala:249)
_FILE_DATE_RE = r"\[(\d{2}-\d{2}-\d{4}T\d{2}_\d{2}_\d{2})\]"


def lines_from_wholetext(raw: DataFrame) -> DataFrame:
    """(value=whole file text) → (report_path, line_no, line).

    Shared by the batch and streaming ingest paths (foreachBatch hands
    the streaming micro-batch to this same function)."""
    return raw.select(
        F.input_file_name().alias("report_path"),
        F.posexplode(F.split(F.col("value"), r"\r?\n")).alias("line_no", "line"),
    )


def read_report_lines(spark: SparkSession, cfg: ReportConfig) -> DataFrame:
    """S1+S2: one recursive scan of all report files → (report_path,
    line_no, line). Executor-side IO; no driver listing loop.

    The reference DECLARES a charset property but leaves it empty and
    unused (Proof.scala:26); completed here like ISU/idempotency: a
    non-UTF-8 charset routes through the binaryFile source + decode()
    (the text source is UTF-8-only), so legacy ISO-8859-1 report dumps
    ingest losslessly. Same executor-side parallel scan either way."""
    cs = (cfg.charset or "UTF-8").upper().replace("-", "").replace("_", "")
    if cs != "UTF8":
        raw = (
            spark.read.format("binaryFile")
            .option("recursiveFileLookup", "true")
            .option("pathGlobFilter", f"*{cfg.ext_file}")
            .load(cfg.input_dir)
        )
        return raw.select(
            F.col("path").alias("report_path"),
            F.posexplode(
                F.split(F.decode(F.col("content"), cfg.charset), r"\r?\n")
            ).alias("line_no", "line"),
        )
    raw = (
        spark.read.option("recursiveFileLookup", "true")
        .option("pathGlobFilter", f"*{cfg.ext_file}")
        # NOTE: must be the boolean kwarg — .option("wholetext","true")
        # is silently ignored by the text source in Spark 4.x
        .text(cfg.input_dir, wholetext=True)
    )
    return lines_from_wholetext(raw)


def parse_blocks_raw(lines: DataFrame, cfg: ReportConfig) -> DataFrame:
    """P1-P6: key/value split, SI/NO normalization, cumulative-sum block
    ids, ordered block assembly — WITHOUT the completeness filter (P7),
    so the quarantine path can route rejects. Returns one row per block
    with `vals`, `has_term`, and `any_parquet`."""
    kv = lines.filter(F.col("line").contains(":")).select(
        "report_path",
        "line_no",
        F.trim(F.split(F.col("line"), ":", 2).getItem(0)).alias("key"),
        F.trim(F.coalesce(F.split(F.col("line"), ":", 2).getItem(1), F.lit(""))).alias("value"),
    )

    # P4 — boolean -> localized SI/NO, keyed like Proof.scala:113-123
    bool_key = rf"\b({cfg.boolean_caster_key})\b"
    norm = kv.withColumn(
        "value",
        F.when(
            F.col("key").rlike(bool_key),
            F.when(F.col("value") == "true", "SI").otherwise("NO"),
        ).otherwise(F.col("value")),
    )

    # P2 — terminator-keyed block segmentation via exclusive cumsum
    term_key = rf"\b({cfg.limit_block_key})\b"
    is_term = F.when(F.col("key").rlike(term_key), 1).otherwise(0)
    w = Window.partitionBy("report_path").orderBy("line_no")
    blocks = norm.withColumn(
        "block_id",
        F.coalesce(
            F.sum(is_term).over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
        ),
    ).withColumn("is_term", is_term)

    # ordered assembly: one aggregation, values sorted by line_no.
    # Zip-keyed lines (ISU extension) are extracted as named columns and
    # EXCLUDED from the positional array so ERP positions never shift.
    is_zip = F.col("key").isin(*ZIP_KEYS)
    assembled = blocks.groupBy("report_path", "block_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.when(~is_zip, F.struct("line_no", "value")))
            ),
            lambda s: s["value"],
        ).alias("vals"),
        F.max("is_term").alias("has_term"),
        F.max(
            F.when(F.col("value").rlike(rf"\b({cfg.report_type_match})\b"), 1).otherwise(0)
        ).alias("any_parquet"),
        *[
            F.max(F.when(F.col("key") == k, F.col("value"))).alias(f"zip_{k}")
            for k in ZIP_KEYS
        ],
    )
    return assembled


def parse_blocks(lines: DataFrame, cfg: ReportConfig) -> DataFrame:
    """P1-P7: parse_blocks_raw + the completeness filter — only
    complete (terminated, full-length) blocks survive."""
    assembled = parse_blocks_raw(lines, cfg)
    return assembled.filter((F.col("has_term") == 1) & (F.size("vals") >= BLOCK_LEN))


def ingest_reports(spark: SparkSession, cfg: ReportConfig) -> DataFrame:
    """Full E1 pipeline → DataFrame with the module's public (Spanish)
    all-string schema, one row per report record."""
    return ingest_report_lines(read_report_lines(spark, cfg), cfg)


def ingest_report_lines(lines: DataFrame, cfg: ReportConfig) -> DataFrame:
    """E1 transform stages (P1-P13) over an already-built line frame —
    the batch/streaming-shared core of `ingest_reports`."""
    return project_blocks(parse_blocks(lines, cfg), cfg)


def project_blocks(blocks: DataFrame, cfg: ReportConfig) -> DataFrame:
    """P6-P13 over an assembled (and completeness-filtered) block frame
    — shared by the plain ingest and the quarantine router, so both
    build on the SAME parsed-block plan."""
    # P6 — positional projection (1-based element_at; skip 9/10)
    fields = {
        name: F.element_at(F.col("vals"), pos) for pos, name in BLOCK_POSITIONS.items()
    }

    # P8 — enrichment, computed for real (cf. Proof.scala:236-274).
    # input_file_name() returns a URL-encoded URI; decode it so the
    # stored path (and the filename-date regex, whose brackets arrive
    # as %5B/%5D otherwise) see the real file name.
    decoded_path = F.coalesce(
        F.expr("try_url_decode(report_path)"), F.col("report_path")
    )
    fields["module"] = F.lit(cfg.module)
    fields["reportType"] = F.when(
        F.col("any_parquet") == 1, cfg.report_type_message
    ).otherwise(F.lit(""))
    fields["reportPath"] = decoded_path
    fields["fileGeneratedDate"] = F.regexp_extract(decoded_path, _FILE_DATE_RE, 1)

    def count_diff(prep: str, oficial: str):
        # try_cast: non-numeric/empty counts yield NULL -> "" instead of
        # failing the whole job under ANSI mode (per-record tolerance).
        d = fields[prep].try_cast("bigint") - fields[oficial].try_cast("bigint")
        return F.coalesce(d.cast("string"), F.lit(""))

    fields["difCountCol"] = count_diff("fileAntColForCountColumns", "fileColForCountColumns")
    fields["difCountRow"] = count_diff("fileAntColForCountRows", "fileColForCountRows")
    fields["generationDate"] = (
        F.lit(cfg.generation_date)
        if cfg.generation_date is not None
        else F.date_format(F.current_timestamp(), "yyyy-MM-dd HH:mm:ss")
    )

    # ISU (ISU.scala:3-37) = ERP row + the zip block after the date
    # column. Zip values arrive by key (see ZIP_KEYS) — absent keys
    # surface as empty strings, matching the all-string contract.
    # MAIN (Main.scala:44-63,109-112) = the 20-column prototype: bare
    # positional fields only, no enrichment columns.
    field_order = list(ERP_FIELD_ORDER)
    if cfg.module == "ISU":
        field_order[4:4] = ZIP_KEYS
        for zf in ZIP_KEYS:
            fields[zf] = F.coalesce(F.trim(F.col(f"zip_{zf}")), F.lit(""))
    elif cfg.module == "MAIN":
        field_order = [name for _, name in sorted(BLOCK_POSITIONS.items())]

    public = [
        fields[logical].cast("string").alias(public_name)
        for logical, public_name in zip(field_order, cfg.headers, strict=True)
    ]
    out = blocks.select(*public)
    # contract check: names/types match generate_schema(headers)
    # (nullability differs per-column: literals are non-nullable)
    expect = generate_schema(cfg.headers)
    got = [(f.name, f.dataType) for f in out.schema.fields]
    want = [(f.name, f.dataType) for f in expect.fields]
    assert got == want, f"schema contract violated: {got} != {want}"
    return out


def ingest_with_quarantine(
    lines: DataFrame, cfg: ReportConfig, materialize: bool = True
) -> tuple[DataFrame, DataFrame]:
    """P12 done right: (good, quarantined).

    The reference swallows a failing file with a printStackTrace and
    moves on (Proof.scala:71-87) — errors vanish. Here malformed
    blocks are *routed*, not dropped: the good side is the normal
    ingest output; the quarantine side is one row per rejected block
    with the source path, block id, a reject reason (`no_terminator` |
    `short_block`), the observed length, and the raw values for
    replay. Both sides branch off the same parsed-block frame; with
    ``materialize=True`` (default) the assembled blocks are eagerly
    localCheckpoint-ed so writing BOTH sides parses the input once —
    without it, each side's action would re-scan and re-parse."""
    blocks = parse_blocks_raw(lines, cfg)
    if materialize:
        blocks = blocks.localCheckpoint()
    good_pred = (F.col("has_term") == 1) & (F.size("vals") >= BLOCK_LEN)
    good = project_blocks(blocks.filter(good_pred), cfg)
    quarantined = blocks.filter(~good_pred).select(
        "report_path",
        "block_id",
        F.when(F.col("has_term") == 0, "no_terminator")
        .otherwise("short_block")
        .alias("reject_reason"),
        F.size("vals").alias("n_values"),
        F.col("vals").alias("raw_values"),
    )
    return good, quarantined
