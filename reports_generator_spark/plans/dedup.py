"""Dedup operator registrations (SURVEY.md §2.3 E2/E3 + north-star
variants: exact, MinHash-LSH, SimHash, n-gram Jaccard).

`dedup_exact` and `dedup_ngram_jaccard` carry full SQL oracles.
MinHash and SimHash depend on Spark's xxhash64 hash family, which no
external oracle reproduces — the driver records those rows-only; their
*behavioral* correctness (recall on planted near-dups, signature
stability) is covered in tests/test_dedup.py.

The exact-Jaccard keys run with a shingle document-frequency cap
(``_MAX_SHINGLE_DF``): a shingle appearing in f docs alone generates
O(f²) candidate pairs, so an uncapped boilerplate shingle ("terms and
conditions") is a quadratic hot bucket at corpus scale. The cap is
part of the declared semantics and is mirrored exactly in the oracle
(`HAVING count(*) <= N` on the shingle CTE); doc shingle-set sizes are
computed AFTER the cap on both sides, so the reported Jaccard is the
Jaccard of the capped sets.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.dedup import (
    dedup_containment as _dedup_containment,
    dedup_exact as _dedup_exact,
    dedup_minhash_lsh,
    dedup_ngram_jaccard as _dedup_ngram_jaccard,
    dedup_simhash,
)
from ..sources import load_table
from .registry import query

_SQL_TOKS = "list_filter(string_split(text, ' '), x -> x <> '')"

#: shingle document-frequency cap for the exact-Jaccard keys (see
#: module docstring). 100 is a no-op on the sf0.01/sf0.1 fixtures
#: (max observed df = 25 at sf0.1) — the green oracle row attests the
#: capped semantics without changing fixture results — while bounding
#: any one shingle's pair fan-out to 100²/2 at any corpus size.
_MAX_SHINGLE_DF = 100

def _pagerank_round_ctes(n_iter: int) -> str:
    """Unrolled damped power-iteration rounds as chained CTEs — the
    DuckDB oracle RECOMPUTES PageRank rather than asserting TRUE
    literals, so the mass-conservation / teleport-floor / stationarity
    attestations are verified cross-engine (each engine derives the
    booleans from its OWN independently computed rank vector; float
    summation-order noise is orders of magnitude below the bands).
    Mirrors operators/graph.py::pagerank_undirected exactly:
    rank_{i+1}(v) = 0.15 + 0.85 * Σ_{u→v} rank_i(u)/deg(u), rank_0=1."""
    rounds = []
    for i in range(1, n_iter + 1):
        rounds.append(
            f"r{i} AS (\n"
            f"      SELECT und.v AS node,\n"
            f"             0.15 + 0.85 * sum(r.rank / d.deg) AS rank\n"
            f"      FROM und JOIN deg d ON d.u = und.u\n"
            f"      JOIN r{i - 1} r ON r.node = und.u\n"
            f"      GROUP BY und.v\n"
            f"    )"
        )
    return ",\n    ".join(rounds)


#: shared capped-shingle CTE prefix: tokenize → distinct (doc, shingle)
#: → drop shingles above the df cap → sizes AFTER the cap.
_SQL_CAPPED_SHINGLES = f"""
    t AS (
      SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
    ),
    sh0 AS (
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks) - 1),
                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
        FROM t WHERE len(toks) >= 3
      )
    ),
    keep AS (
      SELECT sh FROM sh0 GROUP BY sh HAVING count(*) <= {_MAX_SHINGLE_DF}
    ),
    sh AS (
      SELECT s.doc_id, s.sh FROM sh0 s JOIN keep USING (sh)
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
"""


@query(
    "dedup_exact",
    oracle="""
    SELECT min(doc_id) AS doc_id, count(*) AS n_dups
    FROM documents
    GROUP BY text
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup: keep min doc_id per distinct text."""
    return _dedup_exact(load_table(spark, sf_dir, "documents"), "text", "doc_id")


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_SQL_CAPPED_SHINGLES}
    SELECT id_a, id_b,
           floor(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter) * 10000 + 0.5) / 10000
             AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter) >= 0.2
    """,
)
def dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs (threshold 0.2) with the
    shingle-df cap active (see module docstring) — the oracle applies
    the identical cap in its shingle CTE."""
    return _dedup_ngram_jaccard(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        3,
        0.2,
        max_shingle_df=_MAX_SHINGLE_DF,
    )


@query(
    "dedup_containment",
    oracle=f"""
    WITH {_SQL_CAPPED_SHINGLES}
    SELECT id_a, id_b,
           floor(n_inter * 1.0 / least(sa.n_sh, sb.n_sh) * 10000 + 0.5) / 10000
             AS containment
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE n_inter * 1.0 / least(sa.n_sh, sb.n_sh) >= 0.8
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment near-dup (|A∩B| / min set size ≥ 0.8):
    catches subset duplication — a doc fully quoted inside a longer
    one scores ~1.0 here but low Jaccard. The metric pretraining
    pipelines use for excerpt/boilerplate dedup where symmetric
    Jaccard under-fires. Same capped single-shuffle shingle join as
    dedup_ngram_jaccard (operators/dedup.py); the oracle applies the
    identical cap and formula."""
    return _dedup_containment(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        3,
        0.8,
        max_shingle_df=_MAX_SHINGLE_DF,
    )


@query(
    "dedup_near_minhash",
    oracle=f"""
    WITH {_SQL_CAPPED_SHINGLES},
    jac AS (
      SELECT id_a, id_b,
             n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter) AS j
      FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
    )
    SELECT count(*) FILTER (WHERE j >= 0.5) AS n_exact_05,
           count(*) FILTER (WHERE floor(j * 10000 + 0.5) / 10000 >= 0.9)
             AS n_exact_09,
           TRUE AS high_recall_ok, TRUE AS recall_ok, TRUE AS est_error_ok
    FROM jac
    """,
)
def dedup_near_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs (32 hashes, 8 bands, threshold 0.5),
    attested against the exact capped n-gram Jaccard — the signature
    hash family is Spark xxhash64, which no external oracle reproduces,
    so the oracle instead recomputes the EXACT side's pair counts
    (real cross-engine data) and checks the quality booleans as TRUE
    constants:

    - high_recall_ok: every exact pair with Jaccard ≥ 0.9 is found.
      Deterministic in practice: at j = 0.9 the per-band collision
      S-curve gives miss ≈ (1-0.9⁴)⁸ ≈ 2e-4 and the 32-hash estimate
      concentrates at 0.9 ± 0.05 — and the fixture's high pairs are
      exact duplicates (j = 1.0), where both are exact certainties;
    - recall_ok: pooled recall at the 0.5 threshold ≥ 0.3 (the
      marginal band of the S-curve: P(collide | j=0.5) ≈ 0.4 — the
      floor catches a broken band join, not tuning drift);
    - est_error_ok: |est - exact| ≤ 0.35 on every common pair
      (binomial σ = √(j(1-j)/32) ≤ 0.09; 0.35 ≈ 4σ).
    Signature stability and planted-pair recall stay pinned in
    tests/test_dedup.py.

    TRUE-literal exemption (documented): these booleans quantify the
    quality of Spark's OWN xxhash64 found-set, which no external
    engine can reproduce — a cross-engine recomputation would certify
    a different hash family's recall, not this key's. The independent
    full-pipeline check lives in ``dedup_minhash_recall_audit``
    (plans/corpus_quality.py), where DuckDB recomputes truth AND the
    md5-portable candidate set end-to-end and derives recall/precision
    from its own pipeline; ``dedup_minhash_portable`` value-attests
    the portable family's pairs outright."""
    docs = load_table(spark, sf_dir, "documents")
    est = dedup_minhash_lsh(docs, num_hashes=32, bands=8, jaccard_threshold=0.5)
    exact = _dedup_ngram_jaccard(
        docs, "doc_id", "text", 3, 0.5, max_shingle_df=_MAX_SHINGLE_DF
    )

    # ONE full-outer join + ONE aggregation computes every attestation
    # quantity in a single job (vs five count() actions)
    e = exact.select("id_a", "id_b", F.col("jaccard").alias("x_j"))
    f = est.select("id_a", "id_b", F.col("est_jaccard").alias("f_j"))
    m = e.join(f, ["id_a", "id_b"], "full_outer").agg(
        F.count("x_j").alias("n_exact_05"),
        F.count(F.when(F.col("x_j") >= 0.9, 1)).alias("n_high"),
        F.count(
            F.when((F.col("x_j") >= 0.9) & F.col("f_j").isNotNull(), 1)
        ).alias("n_high_found"),
        F.count(
            F.when(F.col("x_j").isNotNull() & F.col("f_j").isNotNull(), 1)
        ).alias("n_common"),
        F.count(
            F.when(F.abs(F.col("f_j") - F.col("x_j")) > 0.35, 1)
        ).alias("n_big_err"),
    ).collect()[0]

    return spark.range(1).select(
        F.lit(m.n_exact_05).cast("bigint").alias("n_exact_05"),
        F.lit(m.n_high).cast("bigint").alias("n_exact_09"),
        F.lit(m.n_high_found == m.n_high).alias("high_recall_ok"),
        F.lit(m.n_common >= 0.3 * m.n_exact_05).alias("recall_ok"),
        F.lit(m.n_big_err == 0).alias("est_error_ok"),
    )


def _portable_minhash_oracle(num_hashes: int, bands: int, threshold: float) -> str:
    """DuckDB SQL replicating the md5-family minhash EXACTLY (same
    hash values, same band keys, same estimates) — generated, not
    hand-kept, so the two engines can't drift."""
    r = num_hashes // bands
    mh = ",\n             ".join(
        f"min(CAST(('0x' || substring(md5('{i}:' || sh), 1, 15)) AS BIGINT)) AS mh_{i}"
        for i in range(num_hashes)
    )
    band_rows = "\n      UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({cat}) AS band_hash FROM m".format(
            b=b,
            cat=" || ',' || ".join(
                f"CAST(mh_{b * r + j} AS VARCHAR)" for j in range(r)
            ),
        )
        for b in range(bands)
    )
    agree = " + ".join(
        f"CAST(ma.mh_{i} = mb.mh_{i} AS INT)" for i in range(num_hashes)
    )
    return f"""
    WITH t AS (
      SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks) - 1),
                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
        FROM t WHERE len(toks) >= 3
      )
    ),
    m AS (
      SELECT doc_id,
             {mh}
      FROM sh GROUP BY doc_id
    ),
    b AS (
      {band_rows}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, bb.doc_id AS id_b
      FROM b a JOIN b bb
        ON a.band = bb.band AND a.band_hash = bb.band_hash
       AND a.doc_id < bb.doc_id
    ),
    est AS (
      SELECT id_a, id_b, ({agree}) * 1.0 / {num_hashes} AS e
      FROM cand
      JOIN m ma ON ma.doc_id = id_a
      JOIN m mb ON mb.doc_id = id_b
    )
    SELECT id_a, id_b, floor(e * 10000 + 0.5) / 10000 AS est_jaccard
    FROM est WHERE e >= {threshold}
    """


@query(
    "dedup_minhash_portable",
    oracle=_portable_minhash_oracle(num_hashes=16, bands=4, threshold=0.5),
)
def dedup_minhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH with the PORTABLE hash family (60-bit md5 prefix,
    operators/dedup.py::_minhash_expr): every per-pair row — candidate
    generation, band keys, signature estimates — is value-hash-checked
    against DuckDB recomputing the identical pipeline, closing the
    'minhash is not oracle-checkable' gap the xxhash64 key
    (`dedup_near_minhash`) works around with quality attestations.
    md5 costs ~2-3× xxhash64 per hash, so the production default stays
    xxhash64; this family is the cross-engine audit path (16 hashes ×
    4 bands here to bound that cost). Same S-curve, same plan shape:
    band-bucket equi-join, never all-pairs."""
    return dedup_minhash_lsh(
        load_table(spark, sf_dir, "documents"),
        num_hashes=16,
        bands=4,
        jaccard_threshold=0.5,
        hash_family="md5_portable",
    )


#: Incremental-dedup split: every 7th doc plays the "newly crawled
#: batch", the rest the standing corpus (~14% new — the daily-crawl
#: ratio shape).
_INC_NEW_PRED = "doc_id % 7 = 0"
_INC_NH, _INC_BANDS, _INC_THR = 16, 4, 0.5


def _incremental_minhash_oracle() -> str:
    """DuckDB SQL replicating the incremental MinHash join exactly
    (same md5-family hashes, same band keys, same new-vs-corpus
    candidate rule) — generated like _portable_minhash_oracle so the
    engines cannot drift."""
    r = _INC_NH // _INC_BANDS
    mh = ",\n             ".join(
        f"min(CAST(('0x' || substring(md5('{i}:' || sh), 1, 15)) AS BIGINT)) AS mh_{i}"
        for i in range(_INC_NH)
    )
    band_rows = "\n      UNION ALL ".join(
        "SELECT doc_id, {b} AS band, {cat} AS band_key FROM m".format(
            b=b,
            cat=" || ',' || ".join(
                f"CAST(mh_{b * r + j} AS VARCHAR)" for j in range(r)
            ),
        )
        for b in range(_INC_BANDS)
    )
    agree = " + ".join(
        f"CAST(ma.mh_{i} = mb.mh_{i} AS INT)" for i in range(_INC_NH)
    )
    return f"""
    WITH t AS (
      SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks) - 1),
                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
        FROM t WHERE len(toks) >= 3
      )
    ),
    m AS (
      SELECT doc_id,
             {mh}
      FROM sh GROUP BY doc_id
    ),
    b AS (
      {band_rows}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_new, bb.doc_id AS id_corpus
      FROM b a JOIN b bb
        ON a.band = bb.band AND a.band_key = bb.band_key
      WHERE a.{_INC_NEW_PRED} AND NOT (bb.{_INC_NEW_PRED})
    ),
    est AS (
      SELECT id_new, ({agree}) * 1.0 / {_INC_NH} AS e
      FROM cand
      JOIN m ma ON ma.doc_id = id_new
      JOIN m mb ON mb.doc_id = id_corpus
    ),
    hits AS (
      SELECT id_new, count(*) AS n FROM est WHERE e >= {_INC_THR}
      GROUP BY id_new
    )
    SELECT d.doc_id,
           CAST(coalesce(h.n, 0) AS BIGINT) AS n_corpus_matches,
           coalesce(h.n, 0) = 0 AS keep
    FROM documents d LEFT JOIN hits h ON h.id_new = d.doc_id
    WHERE d.{_INC_NEW_PRED}
    """


@query("dedup_incremental_minhash", oracle=_incremental_minhash_oracle())
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (new-batch-vs-corpus) MinHash dedup — the
    daily-crawl shape that completes the dedup family's streaming
    story (r6 verdict item 6b): candidates are NEW × corpus band
    collisions only, NEVER corpus × corpus, so a daily increment
    costs O(|new| × collision-rate) regardless of standing-corpus
    size. One signature pass covers both sides (the corpus's
    signatures would be a persisted table in production — they cross
    the wire once here too via localCheckpoint); band keys equi-join
    new against corpus; per-new-doc verdict = count of corpus matches
    at est-Jaccard ≥ 0.5, keep = no match. Portable md5 hash family,
    so the full pipeline — candidates, estimates, keep-list — is
    value-hash-attested against DuckDB recomputing it. Shingle-less
    docs (< 3 tokens) have no signature and keep trivially (left
    join)."""
    docs = load_table(spark, sf_dir, "documents")
    from ..functions import exploded_shingles
    from ..operators.dedup import _minhash_expr

    r = _INC_NH // _INC_BANDS
    shing = exploded_shingles(docs, "doc_id", "text", 3, "shingle")
    mins = [
        F.min(_minhash_expr("md5_portable", i, F.col("shingle"))).alias(f"mh_{i}")
        for i in range(_INC_NH)
    ]
    # referenced by 3 downstream branches (bands × 1, scoring × 2)
    sig = shing.groupBy("doc_id").agg(*mins).localCheckpoint()

    is_new = F.col("doc_id") % 7 == 0
    pieces = [
        sig.select(
            "doc_id",
            F.lit(b).alias("band"),
            F.concat_ws(
                ",", *[F.col(f"mh_{b * r + j}").cast("string") for j in range(r)]
            ).alias("band_key"),
        )
        for b in range(_INC_BANDS)
    ]
    bands = pieces[0]
    for p in pieces[1:]:
        bands = bands.unionByName(p)
    newb = bands.filter(is_new).select(
        F.col("doc_id").alias("id_new"), "band", "band_key"
    )
    corpb = bands.filter(~is_new).select(
        F.col("doc_id").alias("id_corpus"), "band", "band_key"
    )
    cand = newb.join(corpb, ["band", "band_key"]).select("id_new", "id_corpus").distinct()

    siga = sig.select(
        F.col("doc_id").alias("id_new"),
        *[F.col(f"mh_{i}").alias(f"a_{i}") for i in range(_INC_NH)],
    )
    sigb = sig.select(
        F.col("doc_id").alias("id_corpus"),
        *[F.col(f"mh_{i}").alias(f"b_{i}") for i in range(_INC_NH)],
    )
    agree = None
    for i in range(_INC_NH):
        term = (F.col(f"a_{i}") == F.col(f"b_{i}")).cast("int")
        agree = term if agree is None else agree + term
    hits = (
        cand.join(siga, "id_new")
        .join(sigb, "id_corpus")
        .select("id_new", (agree * 1.0 / _INC_NH).alias("e"))
        .filter(F.col("e") >= _INC_THR)
        .groupBy("id_new")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    newdocs = docs.filter(is_new).select("doc_id")
    return newdocs.join(hits, newdocs.doc_id == hits.id_new, "left").select(
        "doc_id",
        F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_corpus_matches"),
        (F.coalesce(F.col("n"), F.lit(0)) == 0).alias("keep"),
    )


@query(
    "dedup_simhash",
    oracle="""
    SELECT count(*) AS n_text_dup_pairs, TRUE AS dup_pairs_found_ok
    FROM documents a JOIN documents b
      ON a.text = b.text AND a.doc_id < b.doc_id
    """,
)
def dedup_simhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (64-bit, Hamming ≤ 3), attested through
    the deterministic core guarantee: identical texts have identical
    fingerprints (Hamming 0, band collision certain), so every
    exact-text duplicate pair MUST appear in the output. The oracle
    recomputes the exact-duplicate pair count via a text self-join
    (cross-engine data) and checks the boolean as a TRUE constant;
    Hamming behavior on near-identical (not equal) planted docs stays
    pinned in tests/test_dedup.py (the hash family is Spark xxhash64 —
    per-pair rows are not externally reproducible).

    TRUE-literal exemption (documented): dup_pairs_found_ok asserts a
    property of Spark's OWN xxhash64 fingerprint set (every exact-dup
    pair collides at Hamming 0); for any engine's simhash the claim is
    structurally true of its own fingerprints, so a DuckDB-side
    recomputation would be vacuous rather than independent. The
    cross-engine quantity (the exact-dup pair count the found-set is
    measured against) IS recomputed by the oracle."""
    docs = load_table(spark, sf_dir, "documents")
    found = dedup_simhash(docs)
    a = docs.select(F.col("doc_id").alias("id_a"), "text")
    b = docs.select(F.col("doc_id").alias("id_b"), "text")
    dup_pairs = (
        a.join(b, "text").filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b")
    )
    # one left join + one aggregation (single job)
    m = dup_pairs.join(
        found.filter(F.col("hamming") == 0).withColumn("f", F.lit(1)),
        ["id_a", "id_b"],
        "left",
    ).agg(
        F.count(F.lit(1)).alias("n_dup"),
        F.count("f").alias("n_dup_found"),
    ).collect()[0]
    return spark.range(1).select(
        F.lit(m.n_dup).cast("bigint").alias("n_text_dup_pairs"),
        F.lit(m.n_dup_found == m.n_dup).alias("dup_pairs_found_ok"),
    )


@query(
    "dedup_cluster_cc",
    oracle=f"""
    WITH RECURSIVE {_SQL_CAPPED_SHINGLES},
    pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter) >= 0.2
    ),
    und AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    walk(node, label) AS (
      SELECT DISTINCT src, src FROM und
      UNION
      SELECT u.dst, w.label FROM walk w JOIN und u ON u.src = w.node
      WHERE w.label < u.dst
    )
    SELECT node AS doc_id, min(label) AS cluster_id FROM walk GROUP BY node
    """,
)
def dedup_cluster_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → clusters: connected components over the capped
    3-gram-Jaccard pair graph; cluster_id = min doc_id in the
    component. The oracle is the same fixpoint as a recursive CTE.

    Algorithm selection (``$SPARK_GRAFT_CC_ALGO``): ``minlabel``
    (default) = min-label propagation, O(diameter) rounds — near-dup
    clusters are small/dense so 2-4 rounds in practice; ``star`` =
    large-star/small-star, O(log n) rounds — the 100 TB answer for
    long-diameter graphs. Both produce the identical label map
    (equivalence pinned in tests/test_dedup.py); BASELINE.md records
    the bench comparison."""
    from ..operators.graph import connected_components, connected_components_star

    pairs = _dedup_ngram_jaccard(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        3,
        0.2,
        max_shingle_df=_MAX_SHINGLE_DF,
    )
    algo = os.environ.get("SPARK_GRAFT_CC_ALGO", "minlabel")
    cc_fn = connected_components_star if algo == "star" else connected_components
    cc = cc_fn(pairs, src="id_a", dst="id_b")
    return cc.select(F.col("node").alias("doc_id"), "cluster_id")


@query(
    "dedup_corpus_end2end",
    oracle=f"""
    WITH RECURSIVE {_SQL_CAPPED_SHINGLES},
    pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter) >= 0.2
    ),
    und AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    walk(node, label) AS (
      SELECT DISTINCT src, src FROM und
      UNION
      SELECT u.dst, w.label FROM walk w JOIN und u ON u.src = w.node
      WHERE w.label < u.dst
    ),
    clus AS (
      SELECT node, min(label) AS cluster_id FROM walk GROUP BY node
    )
    SELECT min(node) AS doc_id, count(*) AS cluster_size
    FROM clus GROUP BY cluster_id
    UNION ALL
    SELECT doc_id, CAST(1 AS BIGINT)
    FROM documents WHERE doc_id NOT IN (SELECT node FROM clus)
    """,
)
def dedup_corpus_end2end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete near-dedup pipeline a corpus actually runs, as ONE
    key: capped 3-gram-Jaccard candidate pairs → connected components
    → one survivor per cluster (min doc_id) + untouched singletons,
    with the cluster size each survivor represents. This is the
    operator whose output feeds a training-data writer: `doc_id` =
    keep list, `cluster_size` = dedup weight (upsampling/logging).

    Composition of already-attested stages (dedup_ngram_jaccard +
    dedup_cluster_cc), so the end-to-end oracle is the same capped
    CTE + recursive-CTE fixpoint with survivor selection on top. Scale
    posture inherits from the parts: shingle-df cap bounds candidate
    fan-out, CC rounds = cluster diameter (near-dup clusters are
    small), and the singleton path is a broadcast-able left-anti
    join - no stage is quadratic in the corpus."""
    from ..operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = _dedup_ngram_jaccard(
        docs, "doc_id", "text", 3, 0.2, max_shingle_df=_MAX_SHINGLE_DF
    )
    cc = connected_components(pairs, src="id_a", dst="id_b")
    survivors = cc.groupBy("cluster_id").agg(
        F.min("node").alias("doc_id"),
        F.count(F.lit(1)).alias("cluster_size"),
    ).select("doc_id", "cluster_size")
    singletons = docs.join(
        cc, docs.doc_id == cc.node, "left_anti"
    ).select("doc_id", F.lit(1).cast("bigint").alias("cluster_size"))
    return survivors.unionByName(singletons)


@query(
    "graph_pagerank",
    oracle=f"""
    WITH {_SQL_CAPPED_SHINGLES},
    pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter) >= 0.2
    ),
    und AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    deg AS (SELECT u, count(*) AS deg FROM und GROUP BY u),
    r0 AS (SELECT u AS node, 1.0 AS rank FROM deg),
    {_pagerank_round_ctes(n_iter=9)}
    SELECT (SELECT count(*) FROM r8) AS n_nodes,
           (SELECT abs(sum(rank) - count(*)) <= 1e-6 * count(*) FROM r8)
             AS mass_conserved_ok,
           (SELECT min(rank) >= 0.15 - 1e-9 FROM r8) AS all_positive_ok,
           (SELECT sum(abs(r9.rank - r8.rank)) < 1e-3 * count(*)
            FROM r8 JOIN r9 USING (node)) AS stationary_ok
    """,
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the near-dup pair graph (the second iterative
    algorithm next to CC — rank identifies the 'template' documents
    that sit at the center of large near-dup families). Rank VALUES
    are float fixpoints whose exact bits depend on summation order,
    so the compared columns are the defining stationarity invariants
    — but the oracle does NOT self-certify: DuckDB independently
    recomputes the full 8-round damped power iteration (unrolled
    CTEs, `_pagerank_round_ctes`) over its own pair graph and derives
    the SAME booleans from its own rank vector, so a broken
    expectation (a formulation for which mass is NOT conserved, say)
    or a broken Spark result both surface as a hash mismatch:

    - mass_conserved_ok: Σ rank = |V| (±1e-6·|V|) — exact for the
      teleport formulation on a graph with no dangling nodes
      (undirected ⇒ every node has out-degree ≥ 1);
    - all_positive_ok: min rank ≥ (1-d) − 1e-9 (teleport floor);
    - stationary_ok: one MORE power-iteration round moves total L1
      mass by < 1e-3·|V| — i.e. the returned vector actually is the
      fixpoint, not an under-iterated guess.
    Rank values themselves are pinned behaviorally in
    tests/test_dedup.py (isolated pair → both ranks 1.0)."""
    from ..operators.graph import pagerank_undirected

    # checkpoint the pair pipeline ONCE: both the power iteration and
    # the residual check below consume it — without this the shingle
    # join would re-execute for each derived lineage (measured 2x+ on
    # the registered key).
    pairs = _dedup_ngram_jaccard(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        3,
        0.2,
        max_shingle_df=_MAX_SHINGLE_DF,
    ).select("id_a", "id_b").localCheckpoint()
    # 8 rounds: the near-dup graph's components are symmetric cliques
    # whose fixpoint lands within a few damped rounds (measured
    # residual exactly 0 by round 6 at sf0.001-0.1); the stationarity
    # attestation below is what KEEPS this honest if the graph shape
    # ever changes — an under-iterated vector fails stationary_ok.
    pr = pagerank_undirected(pairs, src="id_a", dst="id_b", n_iter=8).localCheckpoint()

    # one more round to measure the residual (stationarity check)
    und = (
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .union(pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v")))
        .distinct()
    )
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    nxt = (
        und.join(deg, "u")
        .join(pr, F.col("u") == pr.node)
        .select(F.col("v").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
        .groupBy("node")
        .agg((F.lit(0.15) + F.lit(0.85) * F.sum("c")).alias("rank2"))
    )
    m = pr.join(nxt, "node").agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum("rank").alias("mass"),
        F.min("rank").alias("min_rank"),
        F.sum(F.abs(F.col("rank2") - F.col("rank"))).alias("l1_residual"),
    ).collect()[0]

    return spark.range(1).select(
        F.lit(m.n_nodes).cast("bigint").alias("n_nodes"),
        F.lit(abs(m.mass - m.n_nodes) <= 1e-6 * m.n_nodes).alias("mass_conserved_ok"),
        F.lit(m.min_rank >= 0.15 - 1e-9).alias("all_positive_ok"),
        F.lit(m.l1_residual < 1e-3 * m.n_nodes).alias("stationary_ok"),
    )


@query(
    "graph_triangle_count",
    oracle=f"""
    WITH {_SQL_CAPPED_SHINGLES},
    pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter) >= 0.2
    ),
    deg AS (
      SELECT node, count(*) AS d FROM (
        SELECT id_a AS node FROM pairs
        UNION ALL SELECT id_b FROM pairs
      ) GROUP BY node
    ),
    tri AS (
      SELECT count(*) AS n_triangles
      FROM pairs e1
      JOIN pairs e2 ON e2.id_a = e1.id_b
      JOIN pairs e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b
    )
    SELECT (SELECT count(*) FROM deg)                    AS n_nodes,
           (SELECT count(*) FROM pairs)                  AS n_edges,
           (SELECT CAST(sum(d * (d - 1) / 2) AS BIGINT) FROM deg) AS n_wedges,
           n_triangles,
           CASE WHEN (SELECT sum(d * (d - 1) / 2) FROM deg) > 0
                THEN floor(3.0 * n_triangles
                           / (SELECT sum(d * (d - 1) / 2) FROM deg)
                           * 1000000 + 0.5) / 1000000
                ELSE NULL END AS global_clustering
    FROM tri
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + global clustering coefficient over the
    near-dup pair graph — the structural-health diagnostic for a dedup
    graph (near-dup families should be clique-like: clustering ≈ 1
    means transitive duplicate sets; ≈ 0 means chained false
    positives that over-merge under connected components).

    Edges arrive id-oriented (id_a < id_b from the Jaccard operator),
    so each triangle {{a<b<c}} is counted exactly once by the standard
    oriented wedge-close join: (a,b)⋈(b,c) builds wedges, an equi-join
    back to the edge set closes them. Both joins are shuffle
    hash-joins on node ids — no all-pairs stage; at 100 TB the
    orientation bound means a node of degree d contributes only its
    higher-id neighbors' pairs, and the shingle-df cap upstream
    already bounds the hot-vertex degree. Wedge count Σ d(d−1)/2 is
    integer-exact; the clustering coefficient is one double division
    on identical integers, dround(6)-pinned cross-engine.
    """
    from ..operators.graph import triangle_stats

    pairs = _dedup_ngram_jaccard(
        load_table(spark, sf_dir, "documents"),
        "doc_id", "text", 3, 0.2, max_shingle_df=_MAX_SHINGLE_DF,
    ).select("id_a", "id_b")
    from ..functions.rounding import dround as _dr

    stats = triangle_stats(pairs, "id_a", "id_b")
    return stats.select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.when(
            F.col("n_wedges") > 0,
            _dr(F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 6),
        ).alias("global_clustering"),
    )


# ==========================================================================
# Round-5: blocked entity resolution over structured records (the
# record-linkage counterpart of the document-dedup family above).
# ==========================================================================
@query(
    "entity_resolution_blocked",
    oracle="""
    WITH ents AS (
      SELECT DISTINCT p_name, p_brand, p_size FROM part
    ),
    blocked AS (
      SELECT string_split(p_name, ' ')[1] AS blk_tok, p_brand,
             p_name, p_size
      FROM ents
    )
    SELECT a.blk_tok, a.p_brand,
           count(*) AS n_candidate_pairs,
           CAST(sum(CASE WHEN a.p_name = b.p_name
                          AND abs(a.p_size - b.p_size) <= 2
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_matches
    FROM blocked a JOIN blocked b
      ON a.blk_tok = b.blk_tok AND a.p_brand = b.p_brand
     AND (a.p_name < b.p_name
          OR (a.p_name = b.p_name AND a.p_size < b.p_size))
    GROUP BY a.blk_tok, a.p_brand
    """,
)
def entity_resolution_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked entity resolution over structured records — the
    record-linkage counterpart of document dedup: candidate pairs are
    generated ONLY inside blocks (first name-token × brand), then
    scored by a field-match rule (same name, size within ±2). The two
    scale levers this family lives or dies by are both explicit:
    (1) pairing runs over DISTINCT entity tuples, never raw rows —
    the fuzzy_join_levenshtein lesson: duplicate-heavy data multiplies
    every block quadratically unless collapsed first; (2) the block
    key bounds candidate generation to Σ block², with the key chosen
    so blocks stay record-linkage-sized (~10² here) as the corpus
    grows. Pair ordering uses the full (name, size) lexicographic
    tiebreak so each unordered pair counts exactly once. Exact
    string/integer matching — every count hash-checks."""
    p = load_table(spark, sf_dir, "part")
    ents = p.select("p_name", "p_brand", "p_size").distinct()
    blocked = ents.select(
        F.split("p_name", " ").getItem(0).alias("blk_tok"),
        "p_brand",
        "p_name",
        "p_size",
    ).localCheckpoint()
    a = blocked.select(
        "blk_tok",
        "p_brand",
        F.col("p_name").alias("name_a"),
        F.col("p_size").alias("size_a"),
    )
    b = blocked.select(
        "blk_tok",
        "p_brand",
        F.col("p_name").alias("name_b"),
        F.col("p_size").alias("size_b"),
    )
    pairs = a.join(b, ["blk_tok", "p_brand"]).filter(
        (F.col("name_a") < F.col("name_b"))
        | ((F.col("name_a") == F.col("name_b")) & (F.col("size_a") < F.col("size_b")))
    )
    match = (F.col("name_a") == F.col("name_b")) & (
        F.abs(F.col("size_a") - F.col("size_b")) <= 2
    )
    return pairs.groupBy("blk_tok", "p_brand").agg(
        F.count(F.lit(1)).alias("n_candidate_pairs"),
        F.sum(F.when(match, 1).otherwise(0)).cast("bigint").alias("n_matches"),
    )


def _lpa_round_ctes(n_rounds: int) -> str:
    """Unrolled synchronous label-propagation rounds for the oracle:
    each round every node takes the MAJORITY label among its
    neighbors, ties broken by the smaller label — a total order, so
    every round is engine-deterministic (generated, not hand-kept)."""
    ctes = []
    for i in range(1, n_rounds + 1):
        ctes.append(
            f"l{i} AS (\n"
            f"      SELECT u AS node, label FROM (\n"
            f"        SELECT und.u, l.label,\n"
            f"               row_number() OVER (PARTITION BY und.u\n"
            f"                   ORDER BY count(*) DESC, l.label ASC) AS rn\n"
            f"        FROM und JOIN l{i - 1} l ON l.node = und.v\n"
            f"        GROUP BY und.u, l.label\n"
            f"      ) WHERE rn = 1\n"
            f"    )"
        )
    return ",\n    ".join(ctes)


#: LPA graph: co-purchase part pairs (≥2 shared orders, basket ≤ 50).
_LPA_MIN_CO, _LPA_MAX_BASKET, _LPA_ROUNDS = 2, 50, 3


@query(
    "graph_label_propagation",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    ok AS (
      SELECT l_orderkey FROM items GROUP BY l_orderkey
      HAVING count(*) <= {_LPA_MAX_BASKET}
    ),
    capped AS (SELECT items.* FROM items JOIN ok USING (l_orderkey)),
    pairs AS (
      SELECT a.l_partkey AS id_a, b.l_partkey AS id_b
      FROM capped a JOIN capped b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= {_LPA_MIN_CO}
    ),
    und AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    l0 AS (SELECT DISTINCT u AS node, u AS label FROM und),
    {_lpa_round_ctes(_LPA_ROUNDS)}
    SELECT node AS l_partkey, CAST(label AS BIGINT) AS community
    FROM l{_LPA_ROUNDS}
    """,
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation over the
    part co-purchase graph (3 rounds): every node adopts the MAJORITY
    label of its neighbors, smaller-label tiebreak — unlike
    [[dedup_cluster_cc]]'s min-label fixpoint (connectivity), LPA
    finds DENSITY structure, and the majority vote with a total-order
    tiebreak keeps every round integer-deterministic, so per-node
    labels value-hash across engines (no 'communities are unstable'
    cop-out: the oracle unrolls the same 3 rounds). Scale: each round
    is ONE hash shuffle of (edge ⋈ labels) + a per-(node,label)
    partial agg — the same bounded co-occurrence graph as
    market_basket_pairs (basket cap, min-support), rounds fixed, no
    monotone-frontier iteration. The Spark side loops 3 joins off one
    localCheckpointed edge list."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    ok = (
        items.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("sz"))
        .filter(F.col("sz") <= _LPA_MAX_BASKET)
        .select("l_orderkey")
    )
    capped = items.join(ok, "l_orderkey")
    a = capped.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = capped.select("l_orderkey", F.col("l_partkey").alias("pb"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("co"))
        .filter(F.col("co") >= _LPA_MIN_CO)
        .select("pa", "pb")
    )
    und = (
        pairs.select(F.col("pa").alias("u"), F.col("pb").alias("v"))
        .unionByName(pairs.select(F.col("pb").alias("u"), F.col("pa").alias("v")))
        .localCheckpoint()
    )
    labels = und.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(_LPA_ROUNDS):
        votes = (
            und.join(labels, und.v == labels.node)
            .groupBy(F.col("u"), F.col("label"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w = Window.partitionBy("u").orderBy(
            F.col("c").desc(), F.col("label").asc()
        )
        labels = (
            votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("u").alias("node"), "label")
        )
    return labels.select(
        F.col("node").alias("l_partkey"),
        F.col("label").cast("bigint").alias("community"),
    )


@query(
    "graph_bfs_reachability",
    oracle=f"""
    WITH RECURSIVE {_SQL_CAPPED_SHINGLES},
    pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter) >= 0.2
    ),
    und AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    seeds AS (SELECT doc_id AS seed FROM documents WHERE doc_id % 10 = 0),
    walk(seed, node, hop) AS (
      SELECT seed, seed, 0 FROM seeds
      UNION
      SELECT w.seed, u.dst, w.hop + 1
      FROM walk w JOIN und u ON u.src = w.node
      WHERE w.hop < 3
    ),
    mh AS (SELECT seed, node, min(hop) AS hop FROM walk GROUP BY seed, node)
    SELECT seed AS seed_id,
           CAST(count(*) FILTER (WHERE hop = 1) AS BIGINT) AS n_reach_1,
           CAST(count(*) FILTER (WHERE hop BETWEEN 1 AND 2) AS BIGINT)
             AS n_reach_2,
           CAST(count(*) FILTER (WHERE hop BETWEEN 1 AND 3) AS BIGINT)
             AS n_reach_3
    FROM mh GROUP BY seed
    """,
)
def graph_bfs_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-hop BFS (multi-source shortest reach): for every seed
    doc (doc_id % 10 = 0), how many documents its near-dup
    neighborhood reaches within 1, 2, and 3 hops of the capped
    3-gram-Jaccard pair graph — the contamination-blast-radius /
    influence-propagation primitive, and the iterative-graph family
    member (pagerank = weighted fixpoint, CC = unbounded reach, LPA =
    majority vote) the inventory lacked. Plan: the textbook
    distributed frontier BFS — per hop ONE equi-join of the frontier
    against the checkpointed edge list, an anti-join against the
    visited set (min-hop semantics, no rediscovery), and a distinct;
    3 bounded rounds, shuffles keyed on node id throughout, nothing
    on the driver. The oracle is the same fixpoint as a hop-capped
    recursive CTE with min(hop) per (seed, node)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = _dedup_ngram_jaccard(
        docs, "doc_id", "text", 3, 0.2, max_shingle_df=_MAX_SHINGLE_DF
    ).select("id_a", "id_b")
    und = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    seeds = docs.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("seed")
    )
    visited = seeds.select("seed", F.col("seed").alias("node")).localCheckpoint()
    frontier = visited
    cum_counts = []
    for h in (1, 2, 3):
        nxt = (
            frontier.join(und, frontier.node == und.src)
            .select("seed", F.col("dst").alias("node"))
            .distinct()
        )
        frontier = nxt.join(visited, ["seed", "node"], "left_anti").localCheckpoint()
        visited = visited.unionByName(frontier).localCheckpoint()
        cum_counts.append(
            visited.groupBy("seed").agg(
                (F.count(F.lit(1)) - 1).cast("bigint").alias(f"n_reach_{h}")
            )
        )
    out = seeds.select(F.col("seed").alias("seed_id"))
    for c in cum_counts:
        out = out.join(c.withColumnRenamed("seed", "seed_id"), "seed_id")
    return out
