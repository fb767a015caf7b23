"""Multimodal column plumbing: payload/metadata schema, Arrow-batched
feature extraction values, and the stubbed codec hook."""

from __future__ import annotations

import hashlib

import pytest

from reports_generator_spark.operators.multimodal import (
    attach_payload,
    decode_image,
    extract_features,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(0, "hello world", "en", "srcA", 11), (1, "abc", "en", "srcB", 3)]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_payload_schema(docs):
    mm = attach_payload(docs)
    kinds = dict((f.name, f.dataType.simpleString()) for f in mm.schema.fields)
    assert kinds["payload"] == "binary"
    assert kinds["meta"].startswith("struct<mime:string")


def test_feature_values(docs):
    feats = {r["doc_id"]: r for r in extract_features(attach_payload(docs)).collect()}
    raw = b"hello world"
    assert feats[0]["n_bytes"] == len(raw)
    assert feats[0]["checksum"] == sum(raw) % 1_000_003
    assert feats[0]["feature_hash"] == hashlib.md5(raw).hexdigest()
    assert feats[0]["mime"] == "text/plain"
    assert feats[1]["n_bytes"] == 3


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG fake")
