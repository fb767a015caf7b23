"""E1 report ingest as a CUSTOM PYTHON DATA SOURCE (Spark 4's
``pyspark.sql.datasource`` API): ``spark.read.format("reports")``.

The DataFrame pipeline (ingest/reports.py) is the engine's primary E1
path — declarative, codegen'd, quarantine-routed. This module is the
CONNECTOR form of the same contract: the parse runs inside the source,
one InputPartition per report file, rows stream out Arrow-batched.
It exists for two reasons:

- it exercises the modern extension point a user would reach for to
  wrap a proprietary format the DataFrame API can't scan natively
  (the reference's whole program is exactly such a format, so it is
  the honest demo case — cf. Proof.scala:50-153);
- it proves the contract twice-independently: the connector's pure-
  Python parser and the DataFrame pipeline are attested against the
  SAME golden CSV (ingest/golden.py), so a drift in either fails the
  differential gate.

The class is built by a FACTORY so cloudpickle serializes it (and the
parser closure) BY VALUE: executors never need this package on their
import path — the registration survives any driver cwd/PYTHONPATH,
which module-level classes (pickled by reference) would not.

Scale posture: partition = file, so parallelism equals file count
(the same unit the DataFrame path gets from input_file_name
partitioning); per-partition state is one file's lines. The reader
implements BOTH pruning axes of the DSv2-for-Python contract:

- **Filter pushdown** (``pushFilters``, requires
  ``spark.sql.python.filterPushdown.enabled=true``): equality /
  IN / prefix / substring / suffix / IS NOT NULL predicates on any
  output column are absorbed. Predicates on ``RUTA_DE_REPORTE`` (the
  file path) and ``MODULO`` (constant per source) prune at the FILE
  level inside ``partitions()`` — non-matching report files are never
  opened, the honest analogue of partition pruning for a
  file-per-partition source. Everything else is applied per-block
  after the parse, before Arrow serialization. A pushed filter is
  FULLY evaluated here (Spark does not re-check), so the supported
  set is exactly the string-typed single-column predicates whose
  semantics this parser can guarantee; anything else is yielded back
  for Spark-side evaluation.
- **Column pruning** via user-specified schema: ``.schema("MODULO
  string, RUTA_DE_REPORTE string")`` makes the reader emit ONLY the
  requested columns (any subset, any order, of the 27 public
  headers) — the parse still reads the file (the grammar is
  line-oriented; there is no sub-file projection), but the Arrow
  transfer and everything downstream carry just the requested
  columns.
"""

from __future__ import annotations

from ..config import ERP_HEADERS
from ..ingest.reports import (
    _FILE_DATE_RE,
    BLOCK_LEN,
    BLOCK_POSITIONS,
    ERP_FIELD_ORDER,
    ZIP_KEYS,
)


def build_report_datasource():
    """Return the ReportDataSource class, with every contract constant
    captured by value in closures (see module docstring). The one
    class serves BOTH ``spark.read`` and ``spark.readStream`` — the
    batch reader partitions per file; the streaming reader tracks a
    files-consumed offset (new files = new micro-batch rows) with
    deterministic offset-range replay for recovery."""
    from dataclasses import dataclass

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceStreamWriter,
        DataSourceWriter,
        EqualTo,
        In,
        InputPartition,
        IsNotNull,
        SimpleDataSourceStreamReader,
        StringContains,
        StringEndsWith,
        StringStartsWith,
        WriterCommitMessage,
    )

    field_order = tuple(ERP_FIELD_ORDER)
    positions = dict(BLOCK_POSITIONS)
    block_len = int(BLOCK_LEN)
    file_date_re = str(_FILE_DATE_RE)
    headers = tuple(ERP_HEADERS)
    zip_keys = frozenset(ZIP_KEYS)
    limit_block_key, boolean_key = "status", "equalsHeaders"
    type_match, type_message = "parquet", "Generación de Parquet"

    def scan_files(input_dir: str, ext: str) -> list[str]:
        """S1: recursive scan + extension filter (Proof.scala:70)."""
        import os

        out = []
        for root, _dirs, files in os.walk(input_dir):
            out.extend(os.path.join(root, f) for f in files if f.endswith(ext))
        return sorted(out)

    def parse_report_blocks(path: str, generation_date: str):
        """P1-P8 in pure Python over ONE report file — the
        per-partition body, yielding one complete logical-field DICT
        per block. Semantics mirror ingest/reports.py
        stage-for-stage: first-':' split + trim, SI/NO localization on
        the boolean key, status-terminated blocks, completeness filter
        (terminator present AND >= BLOCK_LEN values), positional
        projection skipping 9/10, enrichment (module, parquet-match
        report type, path, filename date, swapped-count differences
        with per-record try semantics)."""
        import re

        with open(path, encoding="utf-8") as fh:
            raw_lines = fh.read().splitlines()

        blocks = [[]]
        for ln in raw_lines:
            if ":" not in ln:
                continue
            k, _, v = ln.partition(":")
            k, v = k.strip(), v.strip()
            if re.search(rf"\b({boolean_key})\b", k):
                v = "SI" if v == "true" else "NO"
            blocks[-1].append((k, v))
            if re.search(rf"\b({limit_block_key})\b", k):
                blocks.append([])  # terminator closes the block

        date_m = re.search(file_date_re, path)
        file_date = date_m.group(1) if date_m else ""

        for blk in blocks:
            has_term = any(
                re.search(rf"\b({limit_block_key})\b", k) for k, _ in blk
            )
            # ZIP_KEYS lines are keyed (ISU extension), never positional
            # — exclude them exactly as the DataFrame path's ~is_zip
            # filter does, so ERP positions cannot shift
            vals = [v for k, v in blk if k not in zip_keys]
            if not has_term or len(vals) < block_len:
                continue  # P7/P12: incomplete blocks are not emitted here
            fields = {name: vals[pos - 1] for pos, name in positions.items()}
            # over ALL block values — INCLUDING zip-keyed lines — to
            # match parse_blocks_raw's any_parquet, which aggregates
            # the rlike over every line before the ~is_zip positional
            # exclusion (ingest/reports.py); ADVICE r10 pinned the two
            # implementations apart on a parquet-matching zip value
            any_parquet = any(
                re.search(rf"\b({type_match})\b", v) for _k, v in blk
            )
            fields["module"] = "ERP"
            fields["reportType"] = type_message if any_parquet else ""
            fields["reportPath"] = path
            fields["fileGeneratedDate"] = file_date

            def as_bigint(s: str):
                # mirror try_cast(BIGINT)'s grammar exactly — Python
                # int() is more permissive ('1_0', unicode digits,
                # arbitrary precision) and would diverge the two
                # attested implementations on dirty counts
                if not re.fullmatch(r"[+-]?[0-9]+", s, re.ASCII):
                    return None
                n = int(s)
                return n if -(2**63) <= n <= 2**63 - 1 else None

            def diff(prep: str, oficial: str) -> str:
                a, b = as_bigint(fields[prep]), as_bigint(fields[oficial])
                if a is None or b is None:
                    return ""  # the try_cast tolerance of the DF path
                return str(a - b)

            fields["difCountCol"] = diff(
                "fileAntColForCountColumns", "fileColForCountColumns"
            )
            fields["difCountRow"] = diff(
                "fileAntColForCountRows", "fileColForCountRows"
            )
            fields["generationDate"] = generation_date
            yield fields

    def parse_report_file(path: str, generation_date: str):
        """parse_report_blocks projected to the full contract tuple —
        the streaming reader's body and the stable test hook."""
        for fields in parse_report_blocks(path, generation_date):
            yield tuple(fields[logical] for logical in field_order)

    pub2log = dict(zip(headers, field_order))

    def eval_pushed(pushed, get, *, partial: bool = False):
        """AND of the pushed predicates. ``get(logical) -> str | None``.
        With ``partial=True`` (file-level pruning, which only sees
        path-derived and constant fields) a None value means "not
        derivable at this stage" and the predicate defers to the row
        stage. At the row stage (``partial=False``) every field must be
        a concrete string — a pushed filter is fully absorbed and Spark
        never re-checks it, so a None there is raised loudly instead of
        silently passing the predicate (ADVICE r11)."""
        for kind, log, val in pushed:
            v = get(log)
            if v is None:
                if not partial:
                    raise ValueError(
                        f"pushed predicate on '{log}' found no value at "
                        "the row stage; absorbed filters must never "
                        "evaluate against a missing field"
                    )
                continue
            if kind == "eq":
                ok = v == val
            elif kind == "in":
                ok = v in val
            elif kind == "sw":
                ok = v.startswith(val)
            elif kind == "ct":
                ok = val in v
            else:  # "ew"
                ok = v.endswith(val)
            if not ok:
                return False
        return True

    class ReportReader(DataSourceReader):
        def __init__(self, options: dict, schema) -> None:
            self._dir = options["path"]
            self._ext = options.get("ext", ".TXT")
            self._gen_date = options["generation_date"]
            # column pruning: Spark hands the ACTUAL read schema —
            # self.schema() (all 27) or the user's declared subset;
            # emit exactly those columns, in that order
            requested = (
                [f.name for f in schema.fields]
                if schema is not None
                else list(headers)
            )
            unknown = [c for c in requested if c not in pub2log]
            if unknown:
                raise ValueError(
                    f"unknown report columns {unknown}; the contract "
                    f"columns are {list(headers)}"
                )
            self._project = tuple(pub2log[c] for c in requested)
            self._pushed: list[tuple[str, str, object]] = []

        def pushFilters(self, filters):
            """Absorb the string-typed single-column predicates this
            parser can fully guarantee; yield everything else back for
            Spark-side evaluation (the contract: a pushed filter is
            never re-checked by Spark)."""
            for f in filters:
                attr = getattr(f, "attribute", None)
                log = (
                    pub2log.get(attr[0])
                    if attr is not None and len(attr) == 1
                    else None
                )
                if log is None:
                    yield f
                elif isinstance(f, IsNotNull):
                    pass  # every emitted field is a non-null string
                elif isinstance(f, EqualTo) and isinstance(f.value, str):
                    self._pushed.append(("eq", log, f.value))
                elif isinstance(f, In) and all(
                    isinstance(v, str) for v in f.value
                ):
                    self._pushed.append(("in", log, frozenset(f.value)))
                elif isinstance(f, StringStartsWith):
                    self._pushed.append(("sw", log, f.value))
                elif isinstance(f, StringContains):
                    self._pushed.append(("ct", log, f.value))
                elif isinstance(f, StringEndsWith):
                    self._pushed.append(("ew", log, f.value))
                else:
                    yield f

        def _file_level_fields(self, path: str) -> dict:
            """The fields decidable WITHOUT opening the file: the path
            itself, the filename-embedded date, and the per-source
            constants. Predicates on these prune whole files at
            partition-planning time."""
            import re

            date_m = re.search(file_date_re, path)
            return {
                "reportPath": path,
                "fileGeneratedDate": date_m.group(1) if date_m else "",
                "module": "ERP",
                "generationDate": self._gen_date,
            }

        def partitions(self):
            files = scan_files(self._dir, self._ext)
            if self._pushed:
                files = [
                    p
                    for p in files
                    if eval_pushed(
                        self._pushed,
                        self._file_level_fields(p).get,
                        partial=True,
                    )
                ]
            return [InputPartition(p) for p in files]

        def read(self, partition):
            if partition is None:
                return  # planner placeholder when partitions() == []
            for fields in parse_report_blocks(partition.value, self._gen_date):
                if self._pushed and not eval_pushed(self._pushed, fields.get):
                    continue
                yield tuple(fields[logical] for logical in self._project)

    class ReportStreamReader(SimpleDataSourceStreamReader):
        """Offset = the SEEN-FILE SET (sorted relative paths) — the
        same design as Spark's own FileStreamSource, because the
        obvious alternative (a consumed-count or lexicographic
        watermark over the sorted listing) silently re-reads or MISSES
        a late file that sorts before the consumed point (nested
        report subdirs do exactly that; pinned in
        tests/test_ingest.py::test_datasource_stream_reader_offsets_and_replay).
        Each micro-batch carries exactly the files not in the start
        offset's seen set; ``readBetweenOffsets`` replays end.seen −
        start.seen deterministically after a restart. Reads run on the
        driver (the Simple reader contract) — right for report-sized
        files; a high-throughput source would graduate to
        DataSourceStreamReader's partitioned API, and a 100 TB-scale
        dir would add seen-set retention exactly as FileStreamSource
        does."""

        def __init__(self, options: dict) -> None:
            self._dir = options["path"]
            self._ext = options.get("ext", ".TXT")
            self._gen_date = options["generation_date"]

        def _rel(self, p: str) -> str:
            import os

            return os.path.relpath(p, self._dir)

        def initialOffset(self) -> dict:
            return {"seen": []}

        def read(self, start: dict):
            files = scan_files(self._dir, self._ext)
            seen = set(start["seen"])
            # a LIST, not a generator: the engine's prefetching wrapper
            # pickles the (rows, offset) pair when planning partitions
            rows = [
                r
                for p in files
                if self._rel(p) not in seen
                for r in parse_report_file(p, self._gen_date)
            ]
            return rows, {"seen": sorted(self._rel(p) for p in files)}

        def readBetweenOffsets(self, start: dict, end: dict):
            new = set(end["seen"]) - set(start["seen"])
            files = scan_files(self._dir, self._ext)
            return [
                r
                for p in files
                if self._rel(p) in new
                for r in parse_report_file(p, self._gen_date)
            ]

    @dataclass
    class _Staged(WriterCommitMessage):
        pairs: list  # [(tmp_path, final_path), ...] this task staged

    class ReportWriter(DataSourceWriter):
        """The WRITE path: ERP rows back into the report-file grammar.
        Atomicity contract, stated precisely: staging is all-or-nothing
        (no file becomes visible unless EVERY task succeeds) and each
        individual file publish is atomic (os.replace — a reader sees
        the old file, the new file, never a partial). Corpus-LEVEL
        atomicity is NOT claimed: commit renames file-by-file, so a
        concurrent directory scan can observe a mix of old and new
        files mid-commit — closing that window is what the engine's
        manifest-log family (scale_joins/lakehouse_meta) exists for,
        and a production deployment would publish the corpus through
        one of those commits. Driver and executors must share the
        output filesystem (local mode / NFS / fuse mount): tasks stage
        the temps, the DRIVER renames them — on a shared-nothing
        cluster this writer would stage to the object store and
        commit through a manifest instead.

        Each task stages one ``.tmp-{uuid}`` per distinct report name
        in its partition and returns the (tmp, final) pairs as its
        commit message. A report name must be owned by exactly ONE
        task (the caller repartitions by RUTA_DE_REPORTE) — commit
        REFUSES duplicate final names across messages rather than
        letting last-wins os.replace silently drop the other task's
        rows. ``mode("overwrite")`` removes the pre-existing report
        files not re-written by this job AFTER the renames (documented
        brief union window, same scoping as above). Values containing
        newlines are REJECTED at write (the grammar is line-oriented;
        an embedded 'status:' line would silently terminate a block
        early on re-ingest). The inverse projection drops the
        enrichment columns (they re-derive on ingest), localizes
        SI/NO back to the raw boolean, and emits placeholders at the
        contract's ignored positions 9/10 (their values are dropped by
        every reader by design — the one lossy slot in the grammar)."""

        def __init__(self, options: dict, overwrite: bool) -> None:
            self._dir = options["path"]
            self._ext = options.get("ext", ".TXT")
            self._overwrite = overwrite

        def write(self, rows) -> "_Staged":
            import os
            import uuid

            by_file: dict = {}
            for r in rows:
                by_file.setdefault(r["RUTA_DE_REPORTE"], []).append(r)
            os.makedirs(self._dir, exist_ok=True)
            pairs = []
            for fname, rws in sorted(by_file.items()):
                lines = []
                for r in rws:
                    vals = dict(zip(field_order, r))
                    raw = {
                        name: vals[name] for name in positions.values()
                    }
                    raw["equalsHeaders"] = (
                        "true" if vals["equalsHeaders"] == "SI" else "false"
                    )
                    # ONE source of truth for the block layout: walk the
                    # contract positions, placeholder at the ignored slots
                    for pos in range(1, block_len + 1):
                        if pos in positions:
                            k, v = positions[pos], raw[positions[pos]]
                        else:  # 9/10: present in the grammar, dropped
                            k = "ignoredChecksumA" if pos == 9 else "ignoredChecksumB"
                            v = "rewritten"
                        if "\n" in str(v) or "\r" in str(v):
                            raise ValueError(
                                f"field {k!r} contains a newline — the "
                                "report grammar is line-oriented and an "
                                "embedded line would corrupt the block"
                            )
                        lines.append(f"{k}: {v}")
                tmp = os.path.join(
                    self._dir, f".tmp-{uuid.uuid4().hex[:12]}"
                )
                with open(tmp, "w", encoding="utf-8") as fh:
                    fh.write("\n".join(lines) + "\n")
                pairs.append((tmp, os.path.join(self._dir, fname)))
            return _Staged(pairs=pairs)

        def commit(self, messages) -> None:
            import os

            all_pairs = [
                pair for m in messages if m for pair in m.pairs
            ]
            finals = [f for _t, f in all_pairs]
            dups = {f for f in finals if finals.count(f) > 1}
            if dups:
                # last-wins os.replace would silently drop the other
                # task's rows — refuse instead (the caller must
                # repartition by report name)
                self.abort(messages)
                raise ValueError(
                    f"report names written by multiple tasks: "
                    f"{sorted(os.path.basename(d) for d in dups)} — "
                    "repartition by RUTA_DE_REPORTE before writing"
                )
            for tmp, final in all_pairs:
                os.replace(tmp, final)
            if self._overwrite:
                keep = set(finals)
                for root, _dirs, files in os.walk(self._dir):
                    for f in files:
                        full = os.path.join(root, f)
                        if f.endswith(self._ext) and full not in keep:
                            os.remove(full)

        def abort(self, messages) -> None:
            import os

            for m in messages:
                for tmp, _final in (m.pairs if m else []):
                    try:
                        os.remove(tmp)
                    except FileNotFoundError:
                        pass

    class ReportStreamWriter(ReportWriter, DataSourceStreamWriter):
        """STREAMING report-format sink (DataSourceStreamWriter) —
        completes the connector matrix's fourth quadrant (batch read,
        stream read, batch write, stream write). Reuses the batch
        writer's staging verbatim (tasks stage .tmp files, one report
        name per task); commit is per-MICRO-BATCH with an
        exactly-once epoch guard: an ``_epoch-<batchId>`` marker is
        written AFTER every rename has succeeded (marker-last) — a
        re-delivered batch (crash between sink commit and checkpoint
        ack, the Structured Streaming retry contract) finds the
        marker and discards its staged temps instead of
        double-publishing; a crash BEFORE the marker merely
        re-publishes the identical re-staged bytes on retry
        (os.replace over the same final names is idempotent), so no
        window loses the batch. Marker-first would claim the epoch
        before publishing and silently drop the batch if the process
        died between claim and rename — or on the duplicate-name
        validation error, which must fail the batch un-claimed so the
        retry still runs (ADVICE r11). Duplicate report names across
        tasks are refused exactly as in batch. overwrite mode is
        rejected: a streaming sink appends micro-batches; full-corpus
        replacement is a batch operation."""

        def __init__(self, options: dict) -> None:
            super().__init__(options, overwrite=False)

        def commit(self, messages, batchId: int) -> None:  # noqa: N803
            import os

            marker = os.path.join(self._dir, f"_epoch-{batchId}")
            if os.path.exists(marker):
                # re-delivered micro-batch: already published — drop temps
                self.abort(messages, batchId)
                return
            # validate + publish first (raises un-claimed on duplicate
            # report names; re-publish of the same staged batch is
            # idempotent), then claim the epoch marker
            super().commit(messages)
            fd = os.open(marker, os.O_CREAT | os.O_WRONLY)
            os.close(fd)

        def abort(self, messages, batchId: int = None) -> None:  # noqa: N803
            # batchId defaults to None so the batch writer's internal
            # ``self.abort(messages)`` (duplicate-name refusal path)
            # dispatches here without a TypeError masking the ValueError
            super().abort(messages)

    class ReportDataSource(DataSource):
        """``spark.read.format("reports")`` / ``spark.readStream.
        format("reports")`` / ``df.write.format("reports")`` —
        options: ``path`` (input dir, scanned recursively), ``ext``
        (default .TXT), ``generation_date`` (the deterministic
        FECHA_GENERACION; read side only)."""

        @classmethod
        def name(cls) -> str:
            return "reports"

        def schema(self) -> str:
            return ", ".join(f"`{h}` string" for h in headers)

        def reader(self, schema):  # noqa: ANN001
            return ReportReader(self.options, schema)

        def simpleStreamReader(self, schema):  # noqa: ANN001
            return ReportStreamReader(self.options)

        def writer(self, schema, overwrite):  # noqa: ANN001
            return ReportWriter(self.options, overwrite)

        def streamWriter(self, schema, overwrite):  # noqa: ANN001, N802
            if overwrite:
                raise ValueError(
                    "the streaming report sink appends micro-batches; "
                    "overwrite is a batch-writer mode"
                )
            return ReportStreamWriter(self.options)

    # test hooks: the parsers, reachable without registering the source
    ReportDataSource.parse_report_file = staticmethod(parse_report_file)
    ReportDataSource.parse_report_blocks = staticmethod(parse_report_blocks)
    return ReportDataSource
