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
