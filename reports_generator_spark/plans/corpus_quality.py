"""Corpus-level quality/composition analytics for a pretraining-data
pipeline: per-source dataset-card profiles, cross-slice unigram KL
divergence, tokenizer-fertility by language, and a cross-engine
recall audit of the MinHash-LSH banding against exact Jaccard truth.

Tier-1 backlog for the round-7 attestation window (the round-6
window's 50 slots are spoken for: 48 changed/new keys plus
funnel_window and fifo_inventory_matching in the two spare slots);
locally parity-verified at sf0.001/0.01 meanwhile.
The reference computes none of these (SURVEY §0) — north-star surface
on the `documents` corpus fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import dround
from ..sources import load_table
from .registry import query

#: Space-tokenizer shared with the dedup family (plans/dedup.py
#: _SQL_TOKS): split on ' ', drop empties. Spark mirror below.
_TOKS_SQL = "list_filter(string_split(text, ' '), x -> x <> '')"


def _toks_col() -> F.Column:
    return F.filter(F.split(F.col("text"), " "), lambda t: t != "")


#: Long-document threshold for the profile's share metric.
_LONG_CHARS = 800


@query(
    "corpus_source_profile",
    oracle=f"""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(len({_TOKS_SQL})) AS BIGINT) AS total_tokens,
           floor(CAST(sum(n_chars) AS DOUBLE) / count(*) * 1000000 + 0.5)
             / 1000000 AS mean_chars,
           floor(CAST(sum(len({_TOKS_SQL})) AS DOUBLE) / count(*)
                 * 1000000 + 0.5) / 1000000 AS mean_tokens,
           floor(CAST(count(*) FILTER (WHERE n_chars > {_LONG_CHARS})
                      AS DOUBLE) / count(*) * 1000000 + 0.5) / 1000000
             AS pct_long
    FROM documents
    GROUP BY source
    """,
)
def corpus_source_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset-card profile: doc/language counts, total and
    mean chars/tokens, long-document share — the composition table
    every corpus release ships (and the input to mixing weights,
    [[corpus_mix_weighted]]). Integer counts until three pinned
    ratios; one partial-agg shuffle on source. At 100 TB this IS the
    dataset card generator: the aggregate state is a handful of longs
    per source."""
    d = load_table(spark, sf_dir, "documents").select(
        "source",
        "lang",
        "n_chars",
        F.size(_toks_col()).cast("bigint").alias("n_toks"),
    )
    cnt = F.count(F.lit(1))
    return d.groupBy("source").agg(
        cnt.cast("bigint").alias("n_docs"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum("n_toks").cast("bigint").alias("total_tokens"),
        dround(F.sum("n_chars").cast("double") / cnt, 6).alias("mean_chars"),
        dround(F.sum("n_toks").cast("double") / cnt, 6).alias("mean_tokens"),
        dround(
            F.sum(F.when(F.col("n_chars") > _LONG_CHARS, 1).otherwise(0))
            .cast("double")
            / cnt,
            6,
        ).alias("pct_long"),
    )


#: KL slices: P = the 'en' slice, Q = the 'fr' slice.
_KL_P, _KL_Q = "en", "fr"


@query(
    "corpus_kl_divergence",
    oracle=f"""
    WITH toks AS (
      SELECT lang, unnest({_TOKS_SQL}) AS w
      FROM documents WHERE lang IN ('{_KL_P}', '{_KL_Q}')
    ),
    wc AS (
      SELECT w,
             CAST(sum(CASE WHEN lang = '{_KL_P}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c_p,
             CAST(sum(CASE WHEN lang = '{_KL_Q}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c_q
      FROM toks GROUP BY w
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS v,
             CAST(sum(c_p) AS BIGINT) AS n_p,
             CAST(sum(c_q) AS BIGINT) AS n_q,
             sum((c_p + 1) * ln(CAST(c_p + 1 AS DOUBLE) / (c_q + 1)))
               AS s_term
      FROM wc
    )
    SELECT n_p AS n_tokens_p, n_q AS n_tokens_q, v AS vocab,
           floor((s_term / (n_p + v)
                  + ln(CAST(n_q + v AS DOUBLE) / (n_p + v)))
                 * 1000000 + 0.5) / 1000000 AS kl_p_q
    FROM s
    """,
)
def corpus_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram KL divergence KL(P‖Q) between two corpus slices (en vs
    fr) with add-1 smoothing over the union vocabulary — the drift /
    domain-shift measure between corpus versions or sources. Algebra
    does the scaling: KL = Σ p·ln(p/q) rearranges to
    S/(n_p+V) + ln((n_q+V)/(n_p+V)) with S = Σ (c_p+1)·ln((c_p+1)/(c_q+1)),
    so the ENTIRE statistic is one word-level aggregate (integer
    counts, ln of integer ratios) plus one scalar row — no broadcast
    of corpus totals back to the word level, no second pass. Two
    shuffles total (word counts, scalar fold) at any corpus size.
    Determinism note: S is a float fold over the vocabulary, so its
    last ulps are merge-order dependent (the same documented
    concession as time_decay_score); the 6 dp pin absorbs it — this
    key is NOT in the bit-identical integer-moment class of
    ks_test_two_sample."""
    toks = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("lang").isin(_KL_P, _KL_Q))
        .select("lang", F.explode(_toks_col()).alias("w"))
    )
    wc = toks.groupBy("w").agg(
        F.sum(F.when(F.col("lang") == _KL_P, 1).otherwise(0))
        .cast("bigint")
        .alias("c_p"),
        F.sum(F.when(F.col("lang") == _KL_Q, 1).otherwise(0))
        .cast("bigint")
        .alias("c_q"),
    )
    s = wc.agg(
        F.count(F.lit(1)).cast("bigint").alias("v"),
        F.sum("c_p").cast("bigint").alias("n_p"),
        F.sum("c_q").cast("bigint").alias("n_q"),
        F.sum(
            (F.col("c_p") + 1)
            * F.log((F.col("c_p") + 1).cast("double") / (F.col("c_q") + 1))
        ).alias("s_term"),
    )
    return s.select(
        F.col("n_p").alias("n_tokens_p"),
        F.col("n_q").alias("n_tokens_q"),
        F.col("v").alias("vocab"),
        dround(
            F.col("s_term") / (F.col("n_p") + F.col("v"))
            + F.log(
                (F.col("n_q") + F.col("v")).cast("double")
                / (F.col("n_p") + F.col("v"))
            ),
            6,
        ).alias("kl_p_q"),
    )


@query(
    "token_fertility_by_lang",
    oracle=f"""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len({_TOKS_SQL})) AS BIGINT) AS total_tokens,
           CAST(sum(length(text)) AS BIGINT) AS total_chars,
           floor(CAST(sum(length(text)) AS DOUBLE)
                 / sum(len({_TOKS_SQL})) * 1000000 + 0.5) / 1000000
             AS chars_per_token,
           floor(CAST(sum(len({_TOKS_SQL})) AS DOUBLE) / count(*)
                 * 1000000 + 0.5) / 1000000 AS tokens_per_doc
    FROM documents
    GROUP BY lang
    """,
)
def token_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: chars per (space) token and
    tokens per document — the metric that exposes how a tokenizer's
    unit economics differ across languages (whitespace tokenization
    degrades on zh exactly as this table shows; a BPE drop-in changes
    only the token expression, [[bpe_pair_counts]]). Integer totals,
    two pinned ratios, one partial-agg shuffle on lang."""
    d = load_table(spark, sf_dir, "documents").select(
        "lang",
        F.size(_toks_col()).cast("bigint").alias("n_toks"),
        F.length("text").cast("bigint").alias("n_ch"),
    )
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_toks").cast("bigint").alias("total_tokens"),
        F.sum("n_ch").cast("bigint").alias("total_chars"),
        dround(F.sum("n_ch").cast("double") / F.sum("n_toks"), 6).alias(
            "chars_per_token"
        ),
        dround(
            F.sum("n_toks").cast("double") / F.count(F.lit(1)), 6
        ).alias("tokens_per_doc"),
    )


#: Recall-audit parameters: truth = exact capped-shingle Jaccard ≥ τ;
#: candidates = portable-minhash band collisions (16 hashes, 4 bands).
_AUDIT_TAU = 0.5
_AUDIT_HASHES, _AUDIT_BANDS = 16, 4


def _recall_audit_oracle() -> str:
    """DuckDB recomputation of BOTH sides of the audit: exact capped
    Jaccard truth pairs AND the portable-minhash band-collision
    candidate set (same md5 hash family as
    plans/dedup.py::_portable_minhash_oracle — generated, not
    hand-kept)."""
    from .dedup import _MAX_SHINGLE_DF  # shared df cap

    n, b = _AUDIT_HASHES, _AUDIT_BANDS
    r = n // b
    mh = ",\n             ".join(
        f"min(CAST(('0x' || substring(md5('{i}:' || sh), 1, 15)) AS BIGINT))"
        f" AS mh_{i}"
        for i in range(n)
    )
    band_rows = "\n      UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({cat}) AS band_hash FROM m".format(
            b=bi,
            cat=" || ',' || ".join(
                f"CAST(mh_{bi * r + j} AS VARCHAR)" for j in range(r)
            ),
        )
        for bi in range(b)
    )
    return f"""
    WITH t AS (
      SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
    ),
    sh_all AS (
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks) - 1),
                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                 AS sh
        FROM t WHERE len(toks) >= 3
      )
    ),
    keep AS (
      SELECT sh FROM sh_all GROUP BY sh
      HAVING count(*) <= {_MAX_SHINGLE_DF}
    ),
    shc AS (SELECT s.doc_id, s.sh FROM sh_all s JOIN keep USING (sh)),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM shc GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
      FROM shc a JOIN shc b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter) >= {_AUDIT_TAU}
    ),
    m AS (
      SELECT doc_id,
             {mh}
      FROM sh_all GROUP BY doc_id
    ),
    bands AS (
      {band_rows}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, bb.doc_id AS id_b
      FROM bands a JOIN bands bb
        ON a.band = bb.band AND a.band_hash = bb.band_hash
       AND a.doc_id < bb.doc_id
    ),
    counts AS (
      SELECT
        (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_true,
        (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_candidates,
        (SELECT CAST(count(*) AS BIGINT)
         FROM truth JOIN cand USING (id_a, id_b)) AS n_hit
    )
    SELECT n_true, n_candidates, n_hit,
           floor(CAST(n_hit AS DOUBLE) / n_true * 1000000 + 0.5) / 1000000
             AS recall,
           floor(CAST(n_hit AS DOUBLE) / n_candidates * 1000000 + 0.5)
             / 1000000 AS precision_proxy
    FROM counts
    """


@query("dedup_minhash_recall_audit", oracle=_recall_audit_oracle())
def dedup_minhash_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine recall audit of the LSH banding: DuckDB
    independently recomputes BOTH the exact capped-shingle Jaccard
    truth set (τ≥0.5) and the portable-minhash band-collision
    candidate set, so recall AND precision of the S-curve are
    value-hash-attested, not asserted — the quality loop a production
    dedup pipeline runs per corpus release (tune bands/hashes until
    measured recall clears the bar; 16×4 here gives the audit
    something to measure). Spark side composes the two existing
    operators (candidates BEFORE the estimate threshold — banding
    recall is what's audited) plus one broadcast-able pair join.
    Scale: both sides are the bounded equi-joins already attested
    (shingle-df cap, band buckets); the audit adds only pair-key
    joins on their outputs. It IS the suite's deliberate cost center
    (it runs the exact pipeline AND the sketch pipeline to compare
    them); at 100 TB the audit runs on a deterministic hash-sample of
    docs (recall is a ratio — a 1-5% sample estimates it tightly),
    which the fixture skips only because a 500-doc sample would leave
    ~1 truth pair."""
    from ..operators.dedup import dedup_minhash_lsh, dedup_ngram_jaccard
    from .dedup import _MAX_SHINGLE_DF

    from ..functions.overlap import concurrent_values

    docs = load_table(spark, sf_dir, "documents")
    # each side feeds TWO consumers (its count agg and the hit join);
    # without a barrier the lazy plan re-executes the full exact and
    # sketch pipelines once per consumer. Materialize each pipeline
    # exactly once — concurrently, they are independent (guide §2.6) —
    # and let the three aggregates read the checkpoints.
    truth, cand = concurrent_values(
        lambda: dedup_ngram_jaccard(
            docs, threshold=_AUDIT_TAU, max_shingle_df=_MAX_SHINGLE_DF
        )
        .select("id_a", "id_b")
        .localCheckpoint(),
        lambda: dedup_minhash_lsh(
            docs,
            num_hashes=_AUDIT_HASHES,
            bands=_AUDIT_BANDS,
            jaccard_threshold=0.0,
            hash_family="md5_portable",
        )
        .select("id_a", "id_b")
        .localCheckpoint(),
    )
    hit = truth.join(cand, ["id_a", "id_b"])
    counts = (
        truth.agg(F.count(F.lit(1)).cast("bigint").alias("n_true"))
        .crossJoin(
            cand.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_candidates")
            )
        )
        .crossJoin(F.broadcast(
            hit.agg(F.count(F.lit(1)).cast("bigint").alias("n_hit"))
        ))
    )
    return counts.select(
        "n_true",
        "n_candidates",
        "n_hit",
        dround(F.col("n_hit").cast("double") / F.col("n_true"), 6).alias(
            "recall"
        ),
        dround(
            F.col("n_hit").cast("double") / F.col("n_candidates"), 6
        ).alias("precision_proxy"),
    )
