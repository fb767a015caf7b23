"""E7 multimodal registration.

`multimodal_columns` carries a full SQL oracle for the codec-free
subset of the features (byte length = octet_length(text) for UTF-8
payloads); the md5 feature hash is also SQL-expressible, so the only
rows-only part (the decode stub) is excluded from the declared output.
The checksum/mapInPandas plumbing is value-tested in
tests/test_multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import attach_payload, extract_features
from ..sources import load_table
from .registry import query


@query(
    "multimodal_columns",
    oracle="""
    SELECT doc_id,
           'text/plain' AS mime,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           md5(text) AS feature_hash
    FROM documents
    """,
)
def multimodal_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + metadata struct → mapInPandas feature extract.
    (ASCII fixture text ⇒ md5(bytes) == md5(text) in the oracle.)"""
    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(attach_payload(docs))
    return feats.select("doc_id", "mime", "n_bytes", "feature_hash")


@query(
    "multimodal_resize",
    oracle="""
    WITH idx AS (
        SELECT doc_id, text,
               UNNEST(range(1, length(text) + 1, 4)) AS i
        FROM documents
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bytes_resized,
           md5(string_agg(substring(text, CAST(i AS INTEGER), 1),
                          '' ORDER BY i)) AS resized_hash
    FROM idx
    GROUP BY doc_id
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1:1 payload transform plumbing (fake resize = byte stride 4;
    real hook is operators.multimodal.resize_image). Oracle rebuilds
    the strided bytes char-by-char — ASCII fixture text makes byte and
    char slicing identical."""
    from ..operators.multimodal import resize_payloads

    docs = load_table(spark, sf_dir, "documents")
    return resize_payloads(attach_payload(docs), stride=4)


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH idx AS (
        SELECT doc_id, text,
               UNNEST(range(0, CAST(floor((length(text) + 255) / 256) AS BIGINT),
                            2)) AS i
        FROM documents
    )
    SELECT doc_id,
           i AS frame_idx,
           md5(substring(text, CAST(i * 256 + 1 AS INTEGER), 256)) AS frame_hash
    FROM idx
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1:N frame-sampling plumbing: payload split into 256-byte frames,
    every 2nd frame digested — mapInPandas emitting more rows than it
    consumes, exactly a video frame-sampler's shape."""
    from ..operators.multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(attach_payload(docs), frame_bytes=256, frame_stride=2)


# --------------------------------------------------------------------------
# binaryFile source: opaque-payload ingestion from a file tree
# --------------------------------------------------------------------------
def _binary_fixture_dir(spark: SparkSession, sf_dir: str) -> str:
    """One payload file per document (content = the doc's UTF-8 bytes),
    built once per sf into a tmp cache. The build is executor-parallel
    (foreachPartition), not a driver loop — the same pattern that
    would lay fixture objects onto a shared store on a cluster."""
    import hashlib
    import os
    import tempfile

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    d = os.path.join(tempfile.gettempdir(), f"rg_binfiles_{tag}")
    marker = os.path.join(d, "_SUCCESS")
    if not os.path.exists(marker):
        os.makedirs(d, exist_ok=True)

        def write_part(rows):
            for r in rows:
                with open(os.path.join(d, f"doc_{r['doc_id']}.bin"), "wb") as fh:
                    fh.write(r["text"].encode("utf-8"))

        load_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        ).foreachPartition(write_part)
        with open(marker, "w") as fh:
            fh.write("ok")
    return d


@query(
    "scan_binaryfile",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           md5(text) AS content_hash
    FROM documents
    """,
)
def scan_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal ingest path: `binaryFile` datasource over a payload
    tree (pathGlobFilter-pruned), id parsed from the file name, bytes
    hashed JVM-side. This is how image/audio blobs enter the engine as
    opaque binary columns at scale — one task per file group, no
    Python in the scan. (ASCII fixture ⇒ md5(bytes) == md5(text).)"""
    d = _binary_fixture_dir(spark, sf_dir)
    bf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(d)
    )
    return bf.select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin$", 1)
        .cast("bigint")
        .alias("doc_id"),
        F.col("length").alias("n_bytes"),
        F.md5("content").alias("content_hash"),
    )
