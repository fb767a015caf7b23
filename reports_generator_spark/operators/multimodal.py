"""Multimodal columns (SURVEY.md §2.3 E7 / north star).

Images/audio/video are opaque `binary` payloads + a typed metadata
struct; decode/feature-extraction runs as Arrow-batched
``mapInPandas`` so payload bytes never cross row-at-a-time.

The decode step itself is STUBBED (this container ships no image/audio
codecs): ``decode_image`` raises NotImplementedError unless PIL is
importable, and the pipeline substitutes a deterministic fake feature
extractor. The Spark-side plumbing — schema, batch iteration, UDF
signature, partition behavior — is real and tested; swapping in a real
codec changes one function body.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: output schema of the feature extractor
FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", LongType()),
        StructField("feature_hash", StringType()),
    ]
)


def attach_payload(docs: DataFrame) -> DataFrame:
    """Simulate a multimodal table: text bytes as the opaque payload +
    typed metadata struct. At 100 TB the payload column would come from
    the lakehouse as-is; everything downstream is payload-agnostic."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").cast(BinaryType()).alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length("text").cast("long").alias("declared_size"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):  # pragma: no cover - stub by design
    """Real decode hook. Container has no codecs → NotImplementedError.
    Replace with PIL/torchaudio/PyAV in a full deployment."""
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as exc:
        raise NotImplementedError("no image codec available in this environment") from exc


def _fake_features(payload: pd.Series) -> pd.DataFrame:
    """Deterministic stand-in for codec-derived features: byte length,
    mod-checksum, and a stable content hash."""
    import hashlib

    n_bytes = payload.map(len)
    checksum = payload.map(lambda b: sum(b) % 1_000_003)
    feature_hash = payload.map(lambda b: hashlib.md5(b).hexdigest())
    return pd.DataFrame(
        {"n_bytes": n_bytes, "checksum": checksum, "feature_hash": feature_hash}
    )


def extract_features(multimodal: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over (payload, meta).

    mapInPandas: each Arrow batch becomes one pandas frame; output rows
    need not align 1:1 with input (frame-sampling/patching fits the
    same signature)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = _fake_features(pdf["payload"])
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["meta"].map(lambda m: m["mime"]),
                    "n_bytes": feats["n_bytes"],
                    "checksum": feats["checksum"],
                    "feature_hash": feats["feature_hash"],
                }
            )
            yield out

    return multimodal.mapInPandas(run, FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes_resized", LongType()),
        StructField("resized_hash", StringType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_hash", StringType()),
    ]
)


def resize_image(payload: bytes, size: tuple[int, int]):  # pragma: no cover - stub
    """Real resize hook (PIL thumbnail). No codec in this container →
    NotImplementedError; the pipeline uses the deterministic fake."""
    img = decode_image(payload)
    return img.resize(size)


def resize_payloads(multimodal: DataFrame, stride: int = 4) -> DataFrame:
    """1:1 Arrow-batched "resize": the deterministic fake keeps every
    `stride`-th byte (the real hook is resize_image). Same mapInPandas
    shape a real thumbnailer would use — payload-in, payload-digest-out,
    no row-at-a-time Python."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf["payload"].map(lambda b: bytes(b)[::stride])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes_resized": resized.map(len),
                    "resized_hash": resized.map(lambda b: hashlib.md5(b).hexdigest()),
                }
            )

    return multimodal.mapInPandas(run, RESIZE_SCHEMA)


def sample_frames(
    multimodal: DataFrame, frame_bytes: int = 256, frame_stride: int = 2
) -> DataFrame:
    """1:N frame sampling: payload = concatenated fixed-size "frames";
    emit every `frame_stride`-th frame's digest. Output cardinality
    differs from input — mapInPandas yields however many rows each
    batch produces (a video frame-sampler's exact shape)."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, frame_stride):
                    ids.append(doc_id)
                    idxs.append(i)
                    hashes.append(
                        hashlib.md5(b[i * frame_bytes : (i + 1) * frame_bytes]).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_hash": hashes}
            )

    return multimodal.mapInPandas(run, FRAME_SCHEMA)
