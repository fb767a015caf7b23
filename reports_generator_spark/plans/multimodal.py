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
    opaque binary columns at scale — one task per file GROUP, no
    Python in the scan. (ASCII fixture ⇒ md5(bytes) == md5(text).)

    Small-object packing (round-9 sf1 sweep finding): the default
    ``spark.sql.files.openCostInBytes`` of 4 MB packs only
    maxPartitionBytes/4MB ≈ 4 tiny files per task — the 50k-file sf1
    fixture planned 12,500 tasks of pure open/schedule overhead
    (13.2 s, ratio 11.8× on 10× data). Tiny-object ingest lowers the
    modeled open cost so hundreds of objects pack per task; restored
    for subsequent keys by tune() (default carried in
    session.RUNTIME_CONF). On a real blob store the same knob trades
    request count against parallelism."""
    d = _binary_fixture_dir(spark, sf_dir)
    # conf-mutating-builder convention (see join_skew_aqe_adaptive):
    # the lowered open cost must stay live until the CALLER executes
    # the lazy frame (split packing happens at planning), so success-
    # path restore is the next key's tune(); restore eagerly only if
    # the builder itself fails
    spark.conf.set("spark.sql.files.openCostInBytes", str(64 * 1024))
    try:
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
    except BaseException:
        from ..session import tune

        tune(spark)
        raise


@query(
    "multimodal_dedup_phash",
    oracle="""
    WITH h AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS ph
      FROM documents
    ),
    bb AS (
      SELECT doc_id, ph, band, (ph >> (band * 15)) & 32767 AS v
      FROM h, (SELECT unnest([0, 1, 2, 3]) AS band)
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, a.ph AS ph_a,
                      c.doc_id AS id_b, c.ph AS ph_b
      FROM bb a JOIN bb c ON a.band = c.band AND a.v = c.v
                         AND a.doc_id < c.doc_id
    )
    SELECT id_a, id_b,
           CAST(bit_count(xor(ph_a, ph_b)) AS INT) AS hamming
    FROM pairs
    WHERE bit_count(xor(ph_a, ph_b)) <= 6
    """,
)
def multimodal_dedup_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-dup for binary media — the image/video
    counterpart of MinHash-LSH: a 60-bit fingerprint per asset, split
    into 4×15-bit bands; assets sharing ANY band become candidates
    (band equi-join — by pigeonhole, any pair within Hamming ≤ 3 of a
    4-band split MUST collide on a whole band, and the ≤6 cutoff
    still gets strong recall in practice), then the exact Hamming
    distance (bit_count∘xor, pure integer codegen) filters. Never an
    all-pairs stage: candidate volume is bounded by band-bucket sizes,
    exactly the shingle-df story of dedup_near_minhash but over media
    fingerprints. The fingerprint here is a deterministic md5-derived
    stand-in (this sandbox ships no image codecs — a real pHash/DCT
    kernel drops into the same column via mapInPandas, see
    operators/multimodal.py); md5 has no locality, so the fixture
    finds exact-payload duplicates (hamming 0), and BOTH engines
    recompute the identical pipeline value-for-value."""
    d = load_table(spark, sf_dir, "documents")
    ph = F.conv(F.substring(F.md5(F.col("text").cast("binary")), 1, 15), 16, 10).cast(
        "bigint"
    )
    h = d.select("doc_id", ph.alias("ph"))
    bands = h.select(
        "doc_id",
        "ph",
        F.explode(F.array(*[F.lit(b) for b in range(4)])).alias("band"),
    ).select(
        "doc_id",
        "ph",
        "band",
        F.expr("shiftright(ph, band * 15) & 32767").alias("v"),
    )
    a = bands.select(
        F.col("doc_id").alias("id_a"), F.col("ph").alias("ph_a"), "band", "v"
    )
    c = bands.select(
        F.col("doc_id").alias("id_b"), F.col("ph").alias("ph_b"), "band", "v"
    )
    pairs = (
        a.join(c, ["band", "v"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "ph_a", "id_b", "ph_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
    return pairs.select(
        "id_a", "id_b", hamming.cast("int").alias("hamming")
    ).filter(F.col("hamming") <= 6)
