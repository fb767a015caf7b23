"""Text-analysis operators over `documents` (SURVEY.md §2.3 E5/E6 +
north-star text ops: language-ID, quality scoring, token counting,
fingerprinting) and the array/higher-order function surface (R22).

All pure built-in column expressions — no Python in the hot path; a
100 TB corpus streams through whole-stage codegen with one shuffle per
aggregation.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import (
    EN_STOPWORDS,
    quality_score_col,
    en_stopword_ratio,
    exploded_shingles,
    fingerprint_col,
    tokens_col,
    with_token_array,
)
from ..functions.rounding import dround
from ..sources import load_table
from .registry import query

# The oracle-side token expression, kept in lockstep with tokens_col().
_SQL_TOKS = "list_filter(string_split(text, ' '), x -> x <> '')"


# --------------------------------------------------------------------------
# R22 arrays / explode / higher-order functions
# --------------------------------------------------------------------------
@query(
    "array_map_fns",
    oracle=f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, unnest({_SQL_TOKS}) AS token
      FROM documents
    )
    SELECT token, count(*) AS n_occurrences, count(DISTINCT doc_id) AS n_docs
    FROM toks
    WHERE length(token) >= 3
    GROUP BY token
    """,
)
def array_map_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split → filter (higher-order) → explode → aggregate."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens_col("text")).alias("token"))
    return (
        toks.filter(F.length("token") >= 3)
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )


# --------------------------------------------------------------------------
# E5 per-document token statistics
# --------------------------------------------------------------------------
@query(
    "text_tokenize_stats",
    oracle=f"""
    SELECT doc_id, lang,
           length(text)                               AS n_chars,
           CAST(len({_SQL_TOKS}) AS BIGINT)           AS n_tokens,
           CAST(len(list_distinct({_SQL_TOKS})) AS BIGINT) AS n_unique_tokens,
           floor(length(replace(text, ' ', '')) * 1.0
                 / greatest(len({_SQL_TOKS}), 1) * 10000 + 0.5) / 10000
                                                      AS avg_token_len
    FROM documents
    """,
)
def text_tokenize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = tokens_col("text")
    n_tokens = F.size(toks)
    return d.select(
        "doc_id",
        "lang",
        F.length("text").cast("bigint").alias("n_chars"),
        n_tokens.cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_unique_tokens"),
        dround(
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            / F.greatest(n_tokens, F.lit(1)),
            4,
        ).alias("avg_token_len"),
    )


# --------------------------------------------------------------------------
# E6 TF-IDF (pure DataFrame: token counts ⋈ doc-frequency ⋈ corpus size)
# --------------------------------------------------------------------------
@query(
    "text_tfidf",
    oracle=f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, unnest({_SQL_TOKS}) AS token FROM documents
    ),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token),
    df AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY token),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.token,
           floor(tf.tf * (ln((1.0 + n.n_docs) / (1.0 + df.df)) + 1.0)
                 * 1000000 + 0.5) / 1000000 AS tfidf
    FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
    """,
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed TF-IDF: tf * (ln((1+N)/(1+df)) + 1).

    The doc-frequency join carries NO broadcast hint: vocabulary is
    heavy-tailed (billions of tokens on a web-scale corpus), so a
    forced broadcast would OOM; AQE converts it to a broadcast join at
    runtime when the df side is actually small. The corpus count N is a
    provably-1-row aggregate and stays broadcast. The only full-data
    shuffles are the two token aggregations, both partial-aggregated.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens_col("text")).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    idf = F.log((1.0 + F.col("n_docs")) / (1.0 + F.col("df"))) + 1.0
    return (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n))
        .select("doc_id", "token", dround(F.col("tf") * idf, 6).alias("tfidf"))
    )


# --------------------------------------------------------------------------
# Language ID (n-gram/stopword heuristic)
# --------------------------------------------------------------------------
_STOP_SQL = ", ".join(f"'{w}'" for w in EN_STOPWORDS)


def quality_sql(toks: str, text: str = "text") -> str:
    """DuckDB twin of functions/text.py::quality_score_col — one SQL
    spelling of the composite quality score, parameterized by the toks
    expression so CTE-staged and inline callers share it."""
    return (
        f"(0.4 * least(length({text}) / 200.0, 1.0)"
        f" + 0.4 * (len(list_distinct({toks})) * 1.0"
        f"          / greatest(len({toks}), 1))"
        f" + 0.2 * (len(list_filter({toks}, x -> x IN ({_STOP_SQL}))) * 1.0"
        f"          / greatest(len({toks}), 1)))"
    )


@query(
    "text_lang_id",
    oracle=f"""
    SELECT doc_id, lang,
           floor(len(list_filter({_SQL_TOKS}, x -> x IN ({_STOP_SQL}))) * 1.0
                 / greatest(len({_SQL_TOKS}), 1) * 10000 + 0.5) / 10000 AS en_score,
           CASE WHEN len(list_filter({_SQL_TOKS}, x -> x IN ({_STOP_SQL}))) * 1.0
                     / greatest(len({_SQL_TOKS}), 1) >= 0.15
                THEN 'en' ELSE 'other' END AS lang_pred
    FROM documents
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-density language ID (deterministic heuristic)."""
    d = load_table(spark, sf_dir, "documents")
    score = en_stopword_ratio(tokens_col("text"))
    return d.select(
        "doc_id",
        "lang",
        dround(score, 4).alias("en_score"),
        F.when(score >= 0.15, "en").otherwise("other").alias("lang_pred"),
    )


# --------------------------------------------------------------------------
# Quality scoring (length / punctuation / stopword / repetition ratios)
# --------------------------------------------------------------------------
@query(
    "text_quality_score",
    oracle=f"""
    SELECT doc_id,
           floor(least(length(text) / 200.0, 1.0) * 10000 + 0.5) / 10000   AS len_score,
           floor(len(list_distinct({_SQL_TOKS})) * 1.0
                 / greatest(len({_SQL_TOKS}), 1) * 10000 + 0.5) / 10000    AS diversity,
           floor(len(list_filter({_SQL_TOKS}, x -> x IN ({_STOP_SQL}))) * 1.0
                 / greatest(len({_SQL_TOKS}), 1) * 10000 + 0.5) / 10000    AS stopword_ratio,
           floor({quality_sql(_SQL_TOKS)} * 10000 + 0.5) / 10000 AS quality
    FROM documents
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score: 0.4·length + 0.4·lexical-diversity +
    0.2·stopword-density (a standard pretraining-filter shape)."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens_col("text")
    n = F.greatest(F.size(toks), F.lit(1))
    len_score = F.least(F.length("text") / 200.0, F.lit(1.0))
    diversity = F.size(F.array_distinct(toks)) / n
    stop_ratio = F.size(F.filter(toks, lambda x: x.isin(*EN_STOPWORDS))) / n
    quality = quality_score_col("text", toks)
    return d.select(
        "doc_id",
        dround(len_score, 4).alias("len_score"),
        dround(diversity, 4).alias("diversity"),
        dround(stop_ratio, 4).alias("stopword_ratio"),
        dround(quality, 4).alias("quality"),
    )


# --------------------------------------------------------------------------
# Token counting: whitespace + a BPE-ish regex segmentation
# --------------------------------------------------------------------------
@query(
    "text_token_count",
    oracle=r"""
    SELECT doc_id,
           CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
             AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT)
             AS bpeish_tokens,
           CAST(ceil(length(replace(text, ' ', '')) / 4.0) AS BIGINT)
             AS char4_tokens
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three token-count estimators: whitespace, regex word-pieces, and
    the chars/4 heuristic used for budget estimates."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(tokens_col("text")).cast("bigint").alias("ws_tokens"),
        F.size(
            F.regexp_extract_all("text", F.lit(r"([a-z]+|[0-9]+|[^a-z0-9 ])"), 1)
        ).cast("bigint").alias("bpeish_tokens"),
        F.ceil(F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))) / 4.0).alias(
            "char4_tokens"
        ),
    )


# --------------------------------------------------------------------------
# Document fingerprinting (normalized content hash)
# --------------------------------------------------------------------------
@query(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct({_SQL_TOKS})), ' ')) AS fp
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint_col(tokens_col("text")).alias("fp"))


# --------------------------------------------------------------------------
# PII redaction (regexp_replace sweep; Java and RE2 share this subset)
# --------------------------------------------------------------------------
@query(
    "text_redact_pii",
    oracle=r"""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               text || ' contact user' || doc_id ||
                 '@example.com or +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\+1-555-[0-9]{4}', '<PHONE>', 'g') AS redacted
    FROM documents
    """,
)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: email + phone regexes over the corpus (PII is
    synthesized deterministically from doc_id since the fixture text
    has none — the redaction path is what's under test). Pure
    regexp_replace: JVM-side, codegen'd, no UDF."""
    d = load_table(spark, sf_dir, "documents")
    with_pii = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            with_pii, r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"
        ),
        r"\+1-555-[0-9]{4}",
        "<PHONE>",
    )
    return d.select("doc_id", redacted.alias("redacted"))


# --------------------------------------------------------------------------
# Blocked fuzzy join (edit distance with a length-band blocking key)
# --------------------------------------------------------------------------
@query(
    "fuzzy_join_levenshtein",
    oracle="""
    WITH probes AS (
      SELECT c_custkey AS probe_id, substring(c_name, 3) AS probe FROM customer
    )
    SELECT p.probe_id, c.c_custkey AS match_id,
           levenshtein(p.probe, c.c_name) AS dist
    FROM probes p JOIN customer c
      ON substring(p.probe, length(p.probe) - 7, 8)
         = substring(c.c_name, length(c.c_name) - 7, 8)
     AND levenshtein(p.probe, c.c_name) <= 2
    QUALIFY row_number() OVER (PARTITION BY p.probe_id
                               ORDER BY dist, match_id) = 1
    """,
)
def fuzzy_join_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity match: probes (customer names with the first two
    chars cut) matched back by edit distance ≤ 2. NOT a cross join:
    the blocking key is the 8-char suffix — under the head-edit noise
    model (≤ 2 edits, none in the tail), the suffix survives
    verbatim, so the join is EQUI on a highly selective key and the
    quadratic verify runs only inside tiny blocks. Like LSH banding,
    blocking trades bounded recall (a tail edit escapes the block) for
    candidate volume — length-only blocking is the classic trap (every
    fixture name has the SAME length, collapsing it to a cross join).
    Best match per probe via window (min dist, then min key).

    Duplicate hardening: the quadratic verify runs over DISTINCT
    strings per block, not raw rows — on duplicate-heavy data (the
    sf1 probe carries every name 10×) raw-row blocking pays dup²
    Levenshtein calls per block; distinct-side matching pays them
    once and fans the result back to ids. Semantics are unchanged:
    ids sharing a name share its distance, so min(dist, match_id)
    over raw rows ≡ min(dist, min-id-per-name) over distinct names
    (the driver hash-checks this equivalence against the raw-row
    oracle; the duplicate-heavy case is pinned in
    tests/test_corpus_ops.py::test_fuzzy_join_distinct_verify_equals_raw)."""
    return fuzzy_best_match(load_table(spark, sf_dir, "customer"))


def fuzzy_best_match(cust: DataFrame, max_dist: int = 2) -> DataFrame:
    """Core of `fuzzy_join_levenshtein` over any (c_custkey, c_name)
    frame — separated so duplicate-heavy inputs are unit-testable."""
    from pyspark.sql import Window

    probes = cust.select(
        F.col("c_custkey").alias("probe_id"),
        F.substring("c_name", 3, 2_000_000).alias("probe"),
    )
    # distinct probe strings (the verify side)
    dprobes = probes.select("probe").distinct().select(
        "probe", F.substring("probe", -8, 8).alias("bkey")
    )
    # distinct candidate names; min id per name resolves the tiebreak
    dnames = (
        cust.select(F.col("c_custkey").alias("match_id"), "c_name")
        .groupBy("c_name")
        .agg(F.min("match_id").alias("match_id"))
        .select("match_id", "c_name", F.substring("c_name", -8, 8).alias("bkey"))
    )
    j = (
        dprobes.join(dnames, "bkey")
        .withColumn("dist", F.levenshtein("probe", "c_name").cast("bigint"))
        .filter(F.col("dist") <= max_dist)
    )
    w = Window.partitionBy("probe").orderBy("dist", "match_id")
    best = (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("probe", "match_id", "dist")
    )
    # fan the per-string result back out to every probe id
    return probes.join(best, "probe").select("probe_id", "match_id", "dist")


# --------------------------------------------------------------------------
# Sequence packing (LLM batch prep; operators/packing.py)
# --------------------------------------------------------------------------
@query(
    "pack_sequences",
    oracle="""
    WITH RECURSIVE d AS (
      SELECT doc_id, lang,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS BIGINT) AS n_tok,
             row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
      FROM documents
    ),
    packed AS (
      SELECT doc_id, lang, n_tok, rn, CAST(0 AS BIGINT) AS bin_id, n_tok AS fill
      FROM d WHERE rn = 1
      UNION ALL
      SELECT d.doc_id, d.lang, d.n_tok, d.rn,
             CASE WHEN p.fill + d.n_tok <= 256 THEN p.bin_id ELSE p.bin_id + 1 END,
             CASE WHEN p.fill + d.n_tok <= 256 THEN p.fill + d.n_tok ELSE d.n_tok END
      FROM packed p JOIN d ON d.lang = p.lang AND d.rn = p.rn + 1
    )
    SELECT doc_id, lang AS shard, n_tok, bin_id FROM packed
    """,
)
def pack_sequences_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy next-fit sequence packing into 256-token bins, sharded
    by lang. The sequential scan is applyInPandas per shard; the
    oracle replays the same fold as a recursive CTE."""
    from ..operators.packing import pack_sequences

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(tokens_col("text")).cast("long").alias("n_tok"),
    )
    return pack_sequences(d, capacity=256, shard_col="lang", tokens_col="n_tok")


# --------------------------------------------------------------------------
# BM25 relevance scoring — the retrieval-side complement to TF-IDF.
# --------------------------------------------------------------------------
BM25_TERMS = ("join", "hash", "filter")
BM25_K1 = 1.2
BM25_B = 0.75

_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_TERMS)


@query(
    "text_bm25",
    oracle=f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, unnest({_SQL_TOKS}) AS token FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    tf AS (
      SELECT doc_id, token, count(*) AS tf FROM toks
      WHERE token IN ({_BM25_TERMS_SQL}) GROUP BY doc_id, token
    ),
    df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tf GROUP BY token),
    stats AS (
      SELECT (SELECT count(*) FROM documents) AS n_docs,
             (SELECT count(*) * 1.0 FROM toks)
               / (SELECT count(*) FROM documents) AS avgdl
    )
    SELECT tf.doc_id,
           floor(sum(
             ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
             * tf * ({BM25_K1} + 1.0)
             / (tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl / avgdl))
           ) * 1000000 + 0.5) / 1000000 AS bm25
    FROM tf
    JOIN dl ON tf.doc_id = dl.doc_id
    JOIN df ON tf.token = df.token
    CROSS JOIN stats
    GROUP BY tf.doc_id
    """,
)
def text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 score of a fixed term set per document.

    Scale shape: one full-corpus shuffle (the (doc_id, token) partial
    count); doc-frequency and the (n_docs, avgdl) scalars are
    vocabulary-/unit-sized and broadcast. The per-term filter is pushed
    below the tf aggregation so the big shuffle only carries query
    terms, not the whole vocabulary.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens_col("text")).alias("token"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    tf = (
        toks.filter(F.col("token").isin(*BM25_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    stats = (
        toks.agg(F.count(F.lit(1)).alias("total_toks"))
        .crossJoin(d.agg(F.count(F.lit(1)).alias("n_docs")))
        .select(
            "n_docs",
            (F.col("total_toks") * 1.0 / F.col("n_docs")).alias("avgdl"),
        )
    )
    idf = F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    contrib = idf * F.col("tf") * (BM25_K1 + 1.0) / (
        F.col("tf") + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(dl, "doc_id")
        .join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(dround(F.sum(contrib), 6).alias("bm25"))
    )


# --------------------------------------------------------------------------
# Sliding-window chunking — the context-window prep step of an LLM
# corpus pipeline: each doc becomes ⌈n_tok/stride⌉ overlapping chunks.
# --------------------------------------------------------------------------
CHUNK_SIZE = 64
CHUNK_STRIDE = 48


@query(
    "doc_chunk_sliding",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
    ),
    starts AS (
      SELECT doc_id, toks,
             unnest(range(0, greatest(len(toks), 1), {CHUNK_STRIDE})) AS start
      FROM t WHERE len(toks) >= 1
    )
    SELECT doc_id,
           CAST(start / {CHUNK_STRIDE} AS INTEGER) AS chunk_id,
           CAST(len(toks[start + 1 : start + {CHUNK_SIZE}]) AS INTEGER)
             AS n_chunk_tokens,
           array_to_string(toks[start + 1 : start + {CHUNK_SIZE}], ' ')
             AS chunk_text
    FROM starts
    """,
)
def doc_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{CHUNK_SIZE}-token chunks at stride {CHUNK_STRIDE} (16-token
    overlap). sequence+explode+slice — all JVM built-ins; the explode
    multiplies rows ~n_tok/stride with no shuffle at all (chunking is
    embarrassingly parallel; the downstream writer decides layout)."""
    d = load_table(spark, sf_dir, "documents")
    starts = (
        with_token_array(d)
        .filter(F.size("toks") >= 1)
        .select(
            "doc_id",
            "toks",
            F.explode(
                F.sequence(F.lit(0), F.size("toks") - 1, F.lit(CHUNK_STRIDE))
            ).alias("start"),
        )
    )
    chunk = F.slice(F.col("toks"), F.col("start") + 1, CHUNK_SIZE)
    return starts.select(
        "doc_id",
        (F.col("start") / CHUNK_STRIDE).cast("int").alias("chunk_id"),
        F.size(chunk).cast("int").alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


# --------------------------------------------------------------------------
# Corpus mixture reweighting — per-language keep-rates applied with a
# deterministic key hash (the "data mixing" step of pretraining prep).
# --------------------------------------------------------------------------
MIX_RATES = {"en": 500, "de": 1000, "es": 1000, "fr": 1000, "zh": 250}  # per-mille

_MIX_VALUES_SQL = ", ".join(f"('{k}', {v})" for k, v in MIX_RATES.items())


@query(
    "corpus_mix_weighted",
    oracle=f"""
    WITH rates(lang, keep_permille) AS (VALUES {_MIX_VALUES_SQL})
    SELECT d.lang, r.keep_permille,
           count(*) AS n_kept,
           CAST(sum(d.n_chars) AS BIGINT) AS kept_chars
    FROM documents d
    JOIN rates r ON d.lang = r.lang
    WHERE ((d.doc_id % 2147483648) * 2654435761) % 1000 < r.keep_permille
    GROUP BY d.lang, r.keep_permille
    """,
)
def corpus_mix_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Down-weight over-represented languages by hash-thresholding on
    the doc key. The rate table is a broadcast-joined config frame
    (not a when-chain), so mixtures with thousands of (source, lang)
    strata cost the same plan; the filter is deterministic — re-runs
    and backfills keep exactly the same documents."""
    d = load_table(spark, sf_dir, "documents")
    rates = d.sparkSession.createDataFrame(
        list(MIX_RATES.items()), "lang string, keep_permille int"
    )
    kept = d.join(F.broadcast(rates), "lang").filter(
        ((F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761)) % 1000 < F.col("keep_permille")
    )
    return kept.groupBy("lang", "keep_permille").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").cast("bigint").alias("kept_chars"),
    )


# --------------------------------------------------------------------------
# Benchmark decontamination — flag training docs sharing any 5-gram
# with a held-out eval set (n-gram-overlap decontamination, the
# standard pre-release hygiene step for LLM corpora).
# --------------------------------------------------------------------------
DECON_K = 5
EVAL_MOD = 97  # doc_id % 97 == 0 plays the role of the benchmark set

_DECON_SH_SQL = f"""
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks) - {DECON_K - 2}),
                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                           || ' ' || toks[i+3] || ' ' || toks[i+4])) AS sh
        FROM t WHERE len(toks) >= {DECON_K}
      )
"""


@query(
    "decontaminate_ngram",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
    ),
    sh AS ({_DECON_SH_SQL}),
    eval_sh AS (
      SELECT DISTINCT sh FROM sh WHERE doc_id % {EVAL_MOD} = 0
    ),
    train_sh AS (
      SELECT doc_id, sh FROM sh WHERE doc_id % {EVAL_MOD} <> 0
    )
    SELECT doc_id,
           count(*) AS n_shared_ngrams
    FROM train_sh JOIN eval_sh USING (sh)
    GROUP BY doc_id
    """,
)
def decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contaminated-doc report: training docs ranked by how many
    distinct 5-grams they share with the eval split.

    The eval shingle set is benchmark-sized (tiny next to the corpus)
    and is broadcast — the corpus side never shuffles: flagging is a
    map-side semi-join at scan speed, which is what makes this
    runnable per-release on the full 100 TB corpus."""
    d = load_table(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % EVAL_MOD == 0

    def shingle_rows(docs):
        # codegen'd lead()-window shingles (HOF lambdas are interpreted)
        return exploded_shingles(docs, "doc_id", "text", DECON_K, "sh")

    # split BEFORE exploding: the eval branch shingles 1/97 of the
    # corpus (filter pushed to the scan). The train side is NEVER
    # pre-deduplicated — that would shuffle the whole corpus; instead
    # countDistinct after the broadcast join dedups only the matching
    # rows, so the lone shuffle carries contaminated shingles only.
    eval_sh = shingle_rows(d.filter(is_eval)).select("sh").distinct()
    train_sh = shingle_rows(d.filter(~is_eval))
    return (
        train_sh.join(F.broadcast(eval_sh), "sh")
        .groupBy("doc_id")
        .agg(F.countDistinct("sh").alias("n_shared_ngrams"))
    )


# --------------------------------------------------------------------------
# Corpus n-gram statistics: top-k bigrams (LM-style corpus profiling)
# --------------------------------------------------------------------------
@query(
    "ngram_topk",
    oracle=f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, {_SQL_TOKS} AS t FROM documents
    ),
    bigrams AS (
      SELECT unnest(list_transform(range(1, len(t)),
                                   i -> t[i] || ' ' || t[i + 1])) AS bigram
      FROM toks
      WHERE len(t) >= 2
    )
    SELECT bigram, count(*) AS n_occurrences
    FROM bigrams
    GROUP BY bigram
    ORDER BY n_occurrences DESC, bigram ASC
    LIMIT 20
    """,
)
def ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus bigrams: posexplode + lead()-window shingling (the
    codegen'd spelling the dedup family shares), one partial-aggregated
    count, TakeOrdered top-k (no global sort). The id-ordered tiebreak
    makes the cut deterministic."""
    d = load_table(spark, sf_dir, "documents")
    bi = exploded_shingles(
        d.select("doc_id", "text"), "doc_id", "text", 2, "bigram"
    ).select("bigram")
    return (
        bi.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("bigram").asc())
        .limit(20)
    )


# --------------------------------------------------------------------------
# Deterministic corpus shuffle + sharding (training-order assignment)
# --------------------------------------------------------------------------
_ORD_KEY_SQL = "((doc_id % 2147483648) * 2654435761) % 4294967296"


@query(
    "corpus_shuffle_shard",
    oracle=f"""
    SELECT doc_id, shard,
           CAST(row_number() OVER (PARTITION BY shard
                                   ORDER BY ord_key, doc_id) AS BIGINT) AS pos
    FROM (SELECT doc_id,
                 {_ORD_KEY_SQL} AS ord_key,
                 ({_ORD_KEY_SQL}) % 8 AS shard
          FROM documents)
    """,
)
def corpus_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training-order assignment:
    a Knuth multiplicative hash of doc_id gives a reproducible
    pseudo-random order, sharded so each output file sorts
    independently.

    Physical plan: ONE hash shuffle on shard + a per-shard sort — the
    row_number window partitioned by shard is exactly
    repartition(shard) + sortWithinPartitions. At 100 TB you raise
    n_shards to ≥ the cluster's write parallelism (it only changes the
    modulus); nothing here is a global sort or single partition.
    """
    d = load_table(spark, sf_dir, "documents")
    key = ((F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761)) % F.lit(4294967296)
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy("ord_key", "doc_id")
    return (
        d.select(
            "doc_id", key.alias("ord_key"), (key % 8).alias("shard")
        )
        .select(
            "doc_id", "shard",
            F.row_number().over(w).cast("bigint").alias("pos"),
        )
    )


# --------------------------------------------------------------------------
# Deterministic per-key reservoir sample (top-n by hash order)
# --------------------------------------------------------------------------
@query(
    "sample_reservoir_per_key",
    oracle=f"""
    SELECT source, doc_id, rn
    FROM (SELECT source, doc_id,
                 CAST(row_number() OVER (PARTITION BY source
                                         ORDER BY {_ORD_KEY_SQL}, doc_id)
                      AS BIGINT) AS rn
          FROM documents)
    WHERE rn <= 3
    """,
)
def sample_reservoir_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key fixed-size sample, reservoir semantics made
    deterministic: rank by a multiplicative hash of the id and keep
    the first n per key. Unlike rand()-based sampling this is
    reproducible across runs/engines AND stable under re-partitioning;
    one shuffle on the key, partial TopK per partition via the window.
    """
    d = load_table(spark, sf_dir, "documents")
    key = ((F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761)) % F.lit(4294967296)
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(key.asc(), F.col("doc_id").asc())
    return (
        d.select("source", "doc_id", F.row_number().over(w).cast("bigint").alias("rn"))
        .filter(F.col("rn") <= 3)
    )


# --------------------------------------------------------------------------
# End-to-end corpus cleaning (quality filter -> exact dedup keep-first)
# --------------------------------------------------------------------------
@query(
    "corpus_clean_pipeline",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, source,
             {quality_sql(_SQL_TOKS)} AS q,
             md5(array_to_string(list_sort(list_distinct({_SQL_TOKS})), ' ')) AS fp
      FROM documents
    ),
    kept AS (SELECT * FROM scored WHERE q >= 0.55)
    SELECT doc_id, source, floor(q * 10000 + 0.5) / 10000 AS quality
    FROM (SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
          FROM kept)
    WHERE rn = 1
    """,
)
def corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed pretraining-cleanup pass: quality-score every doc,
    drop the low-quality tail, exact-dedup the survivors on the
    normalized-token fingerprint keeping the lowest doc_id.

    One scan computes score + fingerprint in codegen; the dedup is a
    single groupBy(fp) with min_by — partial-aggregable, so the
    shuffle carries at most one candidate row per (partition, fp).
    This is the integration query that proves the text layer composes.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = tokens_col("text")
    q = quality_score_col("text", toks)
    scored = d.select(
        "doc_id", "source", q.alias("q"), fingerprint_col(toks).alias("fp")
    ).filter(F.col("q") >= 0.55)
    best = scored.groupBy("fp").agg(
        F.min_by(F.struct("doc_id", "source", "q"), "doc_id").alias("r")
    )
    return best.select(
        F.col("r.doc_id").alias("doc_id"),
        F.col("r.source").alias("source"),
        dround(F.col("r.q"), 4).alias("quality"),
    )


# --------------------------------------------------------------------------
# Gopher-style quality rules (per-doc, shuffle-free)
# --------------------------------------------------------------------------
@query(
    "text_gopher_rules",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
    ),
    m AS (
      SELECT doc_id,
             len(toks) AS n_words,
             list_sum(list_transform(toks, x -> length(x))) * 1.0
               / greatest(len(toks), 1) AS mwl,
             len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) * 1.0
               / greatest(len(toks), 1) AS alpha_frac,
             len(list_distinct(list_filter(toks, x -> x IN ({_STOP_SQL}))))
               AS n_stopwords
      FROM t
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           floor(mwl * 10000 + 0.5) / 10000 AS mean_word_len,
           floor(alpha_frac * 10000 + 0.5) / 10000 AS alpha_word_frac,
           CAST(n_stopwords AS BIGINT) AS n_stopwords,
           (n_words >= 50 AND n_words <= 100000
            AND mwl >= 3 AND mwl <= 10
            AND alpha_frac > 0.8
            AND n_stopwords >= 2) AS passes_gopher
    FROM m
    """,
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style (Rae et al. 2021) document quality rules: word
    count bounds, mean word length 3–10, ≥80% alphabetic words, ≥2
    distinct stopwords. Every measure is a higher-order array
    expression over the tokenized column — per-row codegen, ZERO
    shuffle; at 100 TB this filter runs at scan speed. Thresholds use
    int-sum/int-count double arithmetic so the pass flag is
    bit-deterministic cross-engine."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens_col("text")
    n = F.size(toks)
    safe_n = F.greatest(n, F.lit(1))
    mwl = (
        F.aggregate(
            F.transform(toks, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
        )
        * 1.0
        / safe_n
    )
    alpha = F.size(F.filter(toks, lambda x: x.rlike("[a-z]"))) * 1.0 / safe_n
    n_stop = F.size(
        F.array_distinct(F.filter(toks, lambda x: x.isin(*EN_STOPWORDS)))
    )
    passes = (
        (n >= 50) & (n <= 100000)
        & (mwl >= 3) & (mwl <= 10)
        & (alpha > 0.8)
        & (n_stop >= 2)
    )
    return d.select(
        "doc_id",
        n.cast("bigint").alias("n_words"),
        dround(mwl, 4).alias("mean_word_len"),
        dround(alpha, 4).alias("alpha_word_frac"),
        n_stop.cast("bigint").alias("n_stopwords"),
        passes.alias("passes_gopher"),
    )


# --------------------------------------------------------------------------
# Rare-token statistics (perplexity proxy with exact arithmetic)
# --------------------------------------------------------------------------
@query(
    "text_rare_token_stats",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_SQL_TOKS}) AS t FROM documents
    ),
    dfreq AS (
      SELECT t, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1
    )
    SELECT tok.doc_id,
           count(*) AS n_tokens,
           floor(sum(dfreq.df) * 1.0 / count(*) * 10000 + 0.5) / 10000
             AS avg_token_df,
           floor(count(*) FILTER (WHERE dfreq.df <= 2) * 1.0 / count(*)
                 * 10000 + 0.5) / 10000 AS rare_token_frac
    FROM tok JOIN dfreq ON tok.t = dfreq.t
    GROUP BY tok.doc_id
    """,
)
def text_rare_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality signal with exact arithmetic: per-doc
    mean corpus document-frequency of its tokens and the fraction of
    rare (df ≤ 2) tokens. Integer sums / integer counts make the
    scores bit-deterministic where a log-prob float sum would not be.
    Same scale shape as tfidf: token df table joined back with NO
    forced broadcast (heavy-tailed vocabulary — AQE decides)."""
    d = load_table(spark, sf_dir, "documents")
    tok = with_token_array(d.select("doc_id", "text")).select(
        "doc_id", F.explode("toks").alias("t")
    )
    dfreq = tok.groupBy("t").agg(F.countDistinct("doc_id").alias("df"))
    j = tok.join(dfreq, "t")
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        dround(F.sum("df") * 1.0 / F.count(F.lit(1)), 4).alias("avg_token_df"),
        dround(
            F.sum((F.col("df") <= 2).cast("long")) * 1.0 / F.count(F.lit(1)), 4
        ).alias("rare_token_frac"),
    )


@query(
    "text_entropy_quality",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_SQL_TOKS}) AS token FROM documents
    ),
    tc AS (
      SELECT doc_id, token, count(*) AS c FROM tok GROUP BY doc_id, token
    ),
    agg AS (
      SELECT doc_id,
             CAST(sum(c) AS BIGINT) AS n_tokens,
             count(*) AS n_distinct,
             sum(c * log2(c)) AS sum_clog
      FROM tc GROUP BY doc_id
    )
    SELECT doc_id,
           n_tokens,
           floor((log2(n_tokens) - sum_clog / n_tokens) * 10000 + 0.5) / 10000
             AS token_entropy,
           floor(n_distinct * 1.0 / n_tokens * 10000 + 0.5) / 10000
             AS type_token_ratio
    FROM agg
    """,
)
def text_entropy_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon token entropy + type/token ratio per document — the
    information-density quality signal: machine-generated or
    template-repeated text scores low entropy, keyboard-mash scores
    anomalously high, natural prose sits in a stable band (filters of
    this family appear in C4/Gopher-style pipelines next to the
    repetition rules this engine registers as text_repetition_filter).
    H = log2(n) − Σ c·log2(c)/n over per-doc token counts: one
    Generate (explode) + two partial-aggregable groupBys, both keyed
    by doc_id so a 100 TB corpus never concentrates — per-doc token
    multisets are bounded by doc length. Entropy rounded to 4 dp for
    the cross-engine hash (libm log2 agrees to well under 1e-10 on
    identical doubles)."""
    docs = load_table(spark, sf_dir, "documents")
    tc = (
        with_token_array(docs, "text")
        .select("doc_id", F.explode("toks").alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    agg = tc.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.col("c") * F.log2("c")).alias("sum_clog"),
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        dround(F.log2("n_tokens") - F.col("sum_clog") / F.col("n_tokens"), 4).alias(
            "token_entropy"
        ),
        dround(F.col("n_distinct") * 1.0 / F.col("n_tokens"), 4).alias(
            "type_token_ratio"
        ),
    )


@query(
    "text_oov_rate",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_SQL_TOKS}) AS token FROM documents
    ),
    vocab AS (
      SELECT token FROM (
        SELECT token, count(*) AS c,
               row_number() OVER (ORDER BY count(*) DESC, token ASC) AS rk
        FROM tok GROUP BY token
      ) WHERE rk <= 1000
    ),
    per AS (
      SELECT t.doc_id,
             count(*) AS n_tok,
             count(v.token) AS n_in
      FROM tok t LEFT JOIN vocab v USING (token)
      GROUP BY t.doc_id
    )
    SELECT doc_id, n_tok,
           floor((1 - n_in * 1.0 / n_tok) * 10000 + 0.5) / 10000 AS oov_rate
    FROM per
    """,
)
def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus's own
    top-1000 token vocabulary — the tokenizer-fit signal: docs with
    high OOV against the training vocabulary fragment into rare
    tokens (inflating sequence length and degrading model quality),
    so pipelines gate or reroute them. Vocabulary = one corpus
    aggregate with a deterministic (count DESC, token ASC) tiebreak,
    tiny by construction (k rows) and BROADCAST back — the corpus
    side tokenizes and probes map-side; the only big shuffle is the
    per-doc count aggregation, keyed by doc_id so it never
    concentrates."""
    docs = load_table(spark, sf_dir, "documents")
    tok = with_token_array(docs, "text").select(
        "doc_id", F.explode("toks").alias("token")
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("c").desc(), F.col("token").asc())
    vocab = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 1000)
        .select("token", F.lit(True).alias("__in_vocab"))
    )
    per = (
        tok.join(F.broadcast(vocab), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.count("__in_vocab").alias("n_in"),
        )
    )
    return per.select(
        "doc_id",
        "n_tok",
        dround(F.lit(1) - F.col("n_in") * 1.0 / F.col("n_tok"), 4).alias("oov_rate"),
    )


# ==========================================================================
# Round-5 text batch: normalization, PMI co-occurrence, unigram-LM
# perplexity, BPE pair counts.
# ==========================================================================


@query(
    "text_clean_normalize",
    oracle="""
    WITH cleaned AS (
      SELECT c_custkey,
             trim(regexp_replace(
                    regexp_replace(lower(c_name), '[^a-z0-9 ]', ' ', 'g'),
                    ' +', ' ', 'g')) AS clean
      FROM customer
    )
    SELECT c_custkey, clean,
           length(clean) AS n_chars,
           len(list_filter(string_split(clean, ' '), x -> x <> '')) AS n_tokens
    FROM cleaned
    """,
)
def text_clean_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization — the first stage of every text
    pipeline: lowercase, non-alphanumerics to spaces, whitespace
    collapse, trim. Kept to regex constructs whose semantics are
    identical in Java regex and RE2 (character classes and ' +' only
    — no \\b, no lookaround, the dialect-portability lesson of
    text_redact_pii), so the normalized STRING itself is the
    hash-checked value, not a statistic of it. Pure map work in
    whole-stage codegen; Unicode NFC folding (no JVM-builtin
    expression) would slot in here as the documented Arrow-UDF
    upgrade for non-ASCII corpora."""
    c = load_table(spark, sf_dir, "customer")
    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("c_name")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return c.select("c_custkey", clean.alias("clean")).select(
        "c_custkey",
        "clean",
        F.length("clean").alias("n_chars"),
        F.size(F.filter(F.split(F.col("clean"), " "), lambda x: x != "")).alias(
            "n_tokens"
        ),
    )


#: Per-document distinct-token cap for PMI pair generation — bounds the
#: self-join fan-out to cap²/doc (the market_basket_pairs discipline).
_PMI_MAX_DOC_TOKENS = 200


@query(
    "text_pmi_cooccurrence",
    oracle=f"""
    WITH dw0 AS (
      SELECT DISTINCT doc_id, unnest({_SQL_TOKS}) AS w FROM documents
    ),
    keep AS (
      SELECT doc_id FROM dw0 GROUP BY doc_id
      HAVING count(*) <= {_PMI_MAX_DOC_TOKENS}
    ),
    dw AS (SELECT dw0.* FROM dw0 JOIN keep USING (doc_id)),
    n_docs AS (SELECT count(DISTINCT doc_id) AS nd FROM dw),
    wf AS (SELECT w, count(*) AS f FROM dw GROUP BY w),
    pairs AS (
      SELECT a.w AS w_a, b.w AS w_b, count(*) AS n_co
      FROM dw a JOIN dw b ON a.doc_id = b.doc_id AND a.w < b.w
      GROUP BY a.w, b.w
      HAVING count(*) >= 5
    )
    SELECT w_a, w_b, n_co,
           floor(ln(n_co * 1.0 * nd / (fa.f * fb.f)) * 1000000 + 0.5) / 1000000
             AS pmi
    FROM pairs
    JOIN wf fa ON fa.w = w_a
    JOIN wf fb ON fb.w = w_b
    CROSS JOIN n_docs
    """,
)
def text_pmi_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of word pairs co-occurring in the
    same document — the association-mining step behind collocation
    extraction and distributional embeddings:
    PMI = ln(P(a,b)/(P(a)P(b))) over document-level presence. The
    market_basket_pairs shape applied to text: distinct (doc, word),
    self-equi-join on doc_id with an ordering filter, min-support 5.
    Documents above _PMI_MAX_DOC_TOKENS distinct tokens are DROPPED
    before the join (oracle-mirrored) — the same in-plan fan-out cap
    as market_basket_pairs, so one token-rich document can never fan
    out quadratically. The remaining pair space is bounded by
    cap²·docs; the shuffle carries distinct pairs per task, not
    occurrences. PMI is one ln() of an exact integer rational —
    identical doubles cross-engine."""
    d = load_table(spark, sf_dir, "documents")
    dw0 = d.select(
        "doc_id", F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("w")
    ).distinct()
    keep = (
        dw0.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("ntok"))
        .filter(F.col("ntok") <= _PMI_MAX_DOC_TOKENS)
        .select("doc_id")
    )
    dw = dw0.join(keep, "doc_id").localCheckpoint()
    nd = dw.select("doc_id").distinct().count()
    wf = dw.groupBy("w").agg(F.count(F.lit(1)).alias("f"))
    a = dw.select("doc_id", F.col("w").alias("w_a"))
    b = dw.select("doc_id", F.col("w").alias("w_b"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("w_a") < F.col("w_b"))
        .groupBy("w_a", "w_b")
        .agg(F.count(F.lit(1)).alias("n_co"))
        .filter(F.col("n_co") >= 5)
    )
    fa = wf.select(F.col("w").alias("w_a"), F.col("f").alias("fa"))
    fb = wf.select(F.col("w").alias("w_b"), F.col("f").alias("fb"))
    return (
        pairs.join(fa, "w_a")
        .join(fb, "w_b")
        .select(
            "w_a",
            "w_b",
            "n_co",
            dround(
                F.log(F.col("n_co") * F.lit(1.0) * nd / (F.col("fa") * F.col("fb"))),
                6,
            ).alias("pmi"),
        )
    )


@query(
    "text_unigram_lm_perplexity",
    oracle=f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, unnest({_SQL_TOKS}) AS w FROM documents
    ),
    wf AS (SELECT w, count(*) AS f FROM toks GROUP BY w),
    corpus AS (
      SELECT (SELECT count(*) FROM toks) AS total,
             (SELECT count(*) FROM wf) AS vocab
    )
    SELECT t.doc_id,
           count(*) AS n_tokens,
           floor(-sum(ln((f + 1.0) / (total + vocab))) / count(*)
                 * 1000000 + 0.5) / 1000000 AS cross_entropy
    FROM toks t JOIN wf USING (w) CROSS JOIN corpus
    GROUP BY t.doc_id
    """,
)
def text_unigram_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document cross-entropy under an add-1-smoothed unigram
    language model trained on the corpus itself — the classic cheap
    LM-quality filter (documents whose token distribution diverges
    from the corpus score high = surprising = gibberish or off-domain;
    the heavy-LM perplexity filter's shape with a train-free model).
    Two passes: token counts (partial-agg groupBy), then per-doc
    −Σ ln P(w)/n with the count table joined back (broadcast at
    vocabulary size). P(w) = (f+1)/(N+V) is an exact integer rational
    → identical ln() doubles; the per-doc sum reassociates at ~1e-15
    against a 1e-6 rounding band."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("w")
    ).localCheckpoint()
    wf = toks.groupBy("w").agg(F.count(F.lit(1)).alias("f"))
    total = toks.count()
    vocab = wf.count()
    lp = F.log((F.col("f") + 1.0) / F.lit(float(total + vocab)))
    return (
        toks.join(F.broadcast(wf), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            dround(-F.sum(lp) / F.count(F.lit(1)), 6).alias("cross_entropy"),
        )
    )


@query(
    "bpe_pair_counts",
    oracle=f"""
    WITH words AS (
      SELECT unnest({_SQL_TOKS}) AS w FROM documents
    ),
    pairs AS (
      SELECT unnest(list_transform(range(1, length(w)),
                                   i -> substr(w, CAST(i AS INT), 2))) AS pair
      FROM words WHERE length(w) >= 2
    )
    SELECT pair, count(*) AS n
    FROM pairs
    GROUP BY pair
    HAVING count(*) >= 10
    """,
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent character-pair frequencies over the corpus — the
    candidate-scoring step of byte-pair-encoding tokenizer training
    (each BPE merge round picks argmax of exactly this table; the
    iterative merge loop re-runs this count over re-segmented text,
    so its cost model IS tokenizer training's cost model). Explode
    words → explode the length-1 positions per word via sequence()
    (a generator, not a join) → one partial-agg groupBy bounded by
    alphabet², with a min-count floor mirroring BPE's merge
    threshold. Pure integer/string ops — exact cross-engine."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("w")
    ).filter(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair")
    )
    return pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("n")).filter(
        F.col("n") >= 10
    )


#: Winnowing parameters: 3-word shingles, window of 4 consecutive
#: hashes, fingerprint df-cap, and the shared-fingerprint pair floor.
_WIN_W = 4
_WIN_MAX_DF = 50
_WIN_MIN_SHARED = 2


@query(
    "corpus_winnowing_fingerprint",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
    ),
    sh AS (
      SELECT doc_id,
             CAST(generate_subscripts(shl, 1) AS BIGINT) AS pos,
             unnest(shl) AS sh
      FROM (
        SELECT doc_id,
               list_transform(range(1, len(toks) - 1),
                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS shl
        FROM t WHERE len(toks) >= 3
      )
    ),
    h AS (
      SELECT doc_id, pos,
             CAST(('0x' || substring(md5(sh), 1, 15)) AS BIGINT) AS hv,
             count(*) OVER (PARTITION BY doc_id) AS n_sh
      FROM sh
    ),
    wmin AS (
      SELECT doc_id, pos, n_sh,
             min(hv) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN CURRENT ROW AND {_WIN_W - 1} FOLLOWING)
               AS fp
      FROM h
    ),
    fps AS (
      SELECT DISTINCT doc_id, fp FROM wmin WHERE pos <= n_sh - {_WIN_W - 1}
    ),
    capped AS (
      SELECT fp FROM fps GROUP BY fp HAVING count(*) <= {_WIN_MAX_DF}
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
      WHERE a.fp IN (SELECT fp FROM capped)
    )
    SELECT id_a, id_b, count(*) AS n_shared
    FROM pairs GROUP BY id_a, id_b
    HAVING count(*) >= {_WIN_MIN_SHARED}
    """,
)
def corpus_winnowing_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
    MOSS algorithm): hash every 3-word shingle, slide a window of 4
    consecutive hashes per document, keep each window's MINIMUM as a
    fingerprint — guaranteeing any shared run of ≥ w+k−1 words
    produces at least one shared fingerprint, at ~2/(w+1) the density
    of full shingling. Distinct from text_fingerprint (one rolling
    hash per doc: exact-dup detection) — winnowing detects PARTIAL
    overlap with positional guarantees, the plagiarism/provenance
    primitive. Plan: posexplode + one window min per doc (no shuffle
    beyond the doc repartition), fingerprint equi-join with the
    df-cap discipline (a fingerprint in f docs alone yields O(f²)
    pairs — same O(f²) bound as the shingle keys). Portable md5
    hashes, so candidates AND shared-count are value-attested."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.filter(F.split(F.col("text"), " "), lambda x: x != "").alias("toks"),
    ).filter(F.size("toks") >= 3)
    # shingles via codegen'd lead() windows, NOT a transform() lambda:
    # higher-order-function lambdas evaluate INTERPRETED (no
    # whole-stage codegen) — the HOF spelling of this stage measured
    # 4.3 s vs 0.75 s at sf0.1. The lead window shuffles on doc_id,
    # the SAME partitioning the sliding-min window needs, so the
    # exchange is reused and the swap costs no extra shuffle.
    wlead = Window.partitionBy("doc_id").orderBy("p")
    tok = toks.select("doc_id", F.posexplode("toks").alias("p", "tok"))
    sh = (
        tok.select(
            "doc_id",
            (F.col("p") + 1).cast("bigint").alias("pos"),
            F.concat_ws(
                " ", "tok", F.lead("tok", 1).over(wlead), F.lead("tok", 2).over(wlead)
            ).alias("sh3"),
            F.lead("tok", 2).over(wlead).alias("guard"),
        )
        .filter(F.col("guard").isNotNull())
        .select(
            "doc_id",
            "pos",
            F.conv(F.substring(F.md5("sh3"), 1, 15), 16, 10)
            .cast("bigint")
            .alias("hv"),
        )
    )
    wdoc = Window.partitionBy("doc_id")
    wslide = (
        Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, _WIN_W - 1)
    )
    wmin = sh.select(
        "doc_id",
        "pos",
        F.count(F.lit(1)).over(wdoc).alias("n_sh"),
        F.min("hv").over(wslide).alias("fp"),
    )
    # two downstream branches (df-cap agg + probe side) — materialize
    # or the shingle→md5→window chain executes twice (operators/dedup
    # _materialize discipline; measured ~2x on this, the key's most
    # expensive stage)
    fps = (
        wmin.filter(F.col("pos") <= F.col("n_sh") - (_WIN_W - 1))
        .select("doc_id", "fp")
        .distinct()
        .localCheckpoint()
    )
    capped = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("df")).filter(
        F.col("df") <= _WIN_MAX_DF
    ).select("fp")
    fpc = fps.join(capped, "fp")
    a = fpc.select(F.col("doc_id").alias("id_a"), "fp")
    b = fpc.select(F.col("doc_id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= _WIN_MIN_SHARED)
    )


@query(
    "text_sentence_split_stats",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             list_filter(
               list_transform(string_split_regex(text, '[.!?]+'),
                              x -> trim(x)),
               x -> x <> '') AS sents
      FROM documents
    )
    SELECT doc_id,
           CAST(len(sents) AS BIGINT) AS n_sentences,
           CAST(coalesce(list_sum(
                 list_transform(sents,
                   x -> len(list_filter(string_split(x, ' '),
                                        w -> w <> '')))), 0) AS BIGINT)
             AS n_words,
           floor(coalesce(list_sum(
                 list_transform(sents,
                   x -> len(list_filter(string_split(x, ' '),
                                        w -> w <> '')))), 0) * 1.0
                 / greatest(len(sents), 1) * 10000 + 0.5) / 10000
             AS avg_sentence_len
    FROM s
    """,
)
def text_sentence_split_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation statistics: split on terminal punctuation
    runs ([.!?]+), trim, drop empties; per doc the sentence count,
    total word count over sentences, and mean sentence length — the
    readability/quality features (a Gopher rule input) at the
    SENTENCE granularity the token-level keys (text_tokenize_stats)
    don't see. Pure codegen string/array work — split, transform,
    filter, aggregate — zero shuffle beyond the scan, dialect-portable
    regex ([.!?]+ means the same in Java and RE2-ish engines), exact
    integer counts with one 4 dp-pinned ratio."""
    d = load_table(spark, sf_dir, "documents")
    sents = F.filter(
        F.transform(F.split(F.col("text"), "[.!?]+"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    words_per = F.transform(
        F.col("sents"),
        lambda x: F.size(F.filter(F.split(x, " "), lambda w: w != "")),
    )
    staged = d.select("doc_id", sents.alias("sents")).select(
        "doc_id",
        F.size("sents").cast("bigint").alias("n_sentences"),
        F.coalesce(F.aggregate(words_per, F.lit(0), lambda a, x: a + x), F.lit(0))
        .cast("bigint")
        .alias("n_words"),
    )
    return staged.select(
        "doc_id",
        "n_sentences",
        "n_words",
        dround(
            F.col("n_words") * 1.0 / F.greatest(F.col("n_sentences"), F.lit(1)), 4
        ).alias("avg_sentence_len"),
    )


# --------------------------------------------------------------------------
# PII scrubbing — the redaction pass every training-corpus release runs
# --------------------------------------------------------------------------
#: portable regexes (plain char classes + bounded quantifiers — the
#: subset Java regex and RE2 agree on; no lookaround, no backrefs)
_PII_EMAIL = r"[A-Za-z0-9._]+@[A-Za-z0-9._]+\.[A-Za-z]{2,}"
_PII_IPV4 = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"
_PII_PHONE = r"[0-9]{3}-[0-9]{4}"

#: deterministic PII injection, spelled identically in Spark and SQL —
#: the synthetic corpus carries no PII, so the fixture plants it as
#: part of the query spec (doc_id-derived, both engines compute it)
_PII_INJECT_SQL = """
  text
  || CASE WHEN doc_id % 3 = 0
          THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
          ELSE '' END
  || CASE WHEN doc_id % 5 = 0
          THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
          ELSE '' END
  || CASE WHEN doc_id % 7 = 0
          THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
               || '.' || CAST((doc_id * 3) % 256 AS VARCHAR)
          ELSE '' END
"""


def _pii_injected_col() -> "F.Column":
    d = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.when(
            d % 3 == 0,
            F.concat(F.lit(" contact user"), d.cast("string"),
                     F.lit("@example.com now")),
        ).otherwise(F.lit("")),
        F.when(
            d % 5 == 0,
            F.concat(F.lit(" call 555-"),
                     F.lpad((d % 10000).cast("string"), 4, "0")),
        ).otherwise(F.lit("")),
        F.when(
            d % 7 == 0,
            F.concat(F.lit(" from 10.0."), (d % 256).cast("string"),
                     F.lit("."), ((d * 3) % 256).cast("string")),
        ).otherwise(F.lit("")),
    )


def pii_scrub_col(text: "F.Column") -> "F.Column":
    """Redact emails → [EMAIL], IPv4 → [IP], then phone fragments →
    [PHONE] — order matters: the email pattern consumes dotted tokens
    the IP pattern could otherwise bite into. Pure built-in
    regexp_replace: codegen'd JVM regex over the corpus, no Python."""
    scrubbed = F.regexp_replace(text, _PII_EMAIL, "[EMAIL]")
    scrubbed = F.regexp_replace(scrubbed, _PII_IPV4, "[IP]")
    return F.regexp_replace(scrubbed, _PII_PHONE, "[PHONE]")


@query(
    "corpus_pii_scrub",
    oracle=f"""
    WITH inj AS (
      SELECT doc_id, {_PII_INJECT_SQL} AS t FROM documents
    ),
    scrub AS (
      SELECT doc_id,
             len(regexp_extract_all(t, '{_PII_EMAIL}')) AS n_email,
             regexp_replace(
               regexp_replace(
                 regexp_replace(t, '{_PII_EMAIL}', '[EMAIL]', 'g'),
                 '{_PII_IPV4}', '[IP]', 'g'),
               '{_PII_PHONE}', '[PHONE]', 'g') AS clean,
             regexp_replace(t, '{_PII_EMAIL}', '[EMAIL]', 'g') AS after_email
      FROM inj
    ),
    counted AS (
      SELECT doc_id, n_email,
             len(regexp_extract_all(after_email, '{_PII_IPV4}')) AS n_ip,
             len(regexp_extract_all(
                 regexp_replace(after_email, '{_PII_IPV4}', '[IP]', 'g'),
                 '{_PII_PHONE}')) AS n_phone,
             clean,
             len(regexp_extract_all(clean, '{_PII_EMAIL}'))
               + len(regexp_extract_all(clean, '{_PII_IPV4}'))
               + len(regexp_extract_all(clean, '{_PII_PHONE}')) AS resid
      FROM scrub
    )
    SELECT count(*) AS n_docs,
           CAST(sum(n_email) AS BIGINT) AS n_emails_redacted,
           CAST(sum(n_ip) AS BIGINT) AS n_ips_redacted,
           CAST(sum(n_phone) AS BIGINT) AS n_phones_redacted,
           CAST(sum(length(clean)) AS BIGINT) AS scrubbed_len_checksum,
           CAST(sum(resid) AS BIGINT) AS n_residual_pii
    FROM counted
    """,
)
def corpus_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over the corpus — the redaction pass every
    training-data release runs before packing. The synthetic corpus
    carries no PII, so deterministic doc_id-derived emails / IPv4s /
    phone fragments are INJECTED identically on both engines (the
    injection is part of the query spec), then redacted with three
    portable regexes (char classes + bounded quantifiers only — the
    Java-regex ∩ RE2 subset, since Spark compiles Java patterns and
    DuckDB RE2). Counts are taken stage-by-stage in scrub ORDER
    (emails first — the email pattern consumes dotted tokens the IP
    pattern could bite into), and the audit's strongest column is
    n_residual_pii = matches REMAINING after the scrub, which must be
    0 cross-engine; scrubbed_len_checksum pins the exact redacted
    text. Pure regexp_replace/regexp_count expressions — the 100 TB
    pass is one codegen'd map stage, no Python, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    inj = docs.select("doc_id", _pii_injected_col().alias("t"))
    after_email = F.regexp_replace(F.col("t"), _PII_EMAIL, "[EMAIL]")
    after_ip = F.regexp_replace(after_email, _PII_IPV4, "[IP]")
    clean = pii_scrub_col(F.col("t"))
    staged = inj.select(
        F.regexp_count(F.col("t"), F.lit(_PII_EMAIL)).alias("n_email"),
        F.regexp_count(after_email, F.lit(_PII_IPV4)).alias("n_ip"),
        F.regexp_count(after_ip, F.lit(_PII_PHONE)).alias("n_phone"),
        clean.alias("clean"),
        (
            F.regexp_count(clean, F.lit(_PII_EMAIL))
            + F.regexp_count(clean, F.lit(_PII_IPV4))
            + F.regexp_count(clean, F.lit(_PII_PHONE))
        ).alias("resid"),
    )
    return staged.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_email").cast("bigint").alias("n_emails_redacted"),
        F.sum("n_ip").cast("bigint").alias("n_ips_redacted"),
        F.sum("n_phone").cast("bigint").alias("n_phones_redacted"),
        F.sum(F.length("clean")).cast("bigint").alias("scrubbed_len_checksum"),
        F.sum("resid").cast("bigint").alias("n_residual_pii"),
    )


# --------------------------------------------------------------------------
# BPE merge learning — the tokenizer-training aggregation
# --------------------------------------------------------------------------
_BPE_ROUNDS = 3

#: DuckDB twin of one pair-count round over a (word, freq, sym) frame.
#: a[i] is 1-based in DuckDB; the engine side uses element_at (also
#: 1-based), so the two spellings walk the same windows.
_BPE_PAIRS_SQL = """
  SELECT unnest(list_transform(range(1, len(a)),
                               i -> a[i] || ' ' || a[i+1])) AS pair,
         freq
  FROM (SELECT freq,
               list_filter(string_split(trim(sym), ' '), x -> x <> '') AS a
        FROM {src})
  WHERE len(a) >= 2
"""


def _bpe_oracle() -> str:
    """Unrolled 3-round DuckDB twin: pair-count → argmax (freq desc,
    pair asc) → literal space-delimited replace, repeated."""
    parts = [
        """
    WITH words AS (
      SELECT word, count(*) AS freq FROM (
        SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                 AS word
        FROM documents
      ) WHERE regexp_matches(word, '^[a-z]+$')
      GROUP BY word
    ),
    w0 AS (SELECT word, freq,
                  ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS sym
           FROM words)"""
    ]
    for r in range(1, _BPE_ROUNDS + 1):
        parts.append(
            f""",
    p{r} AS ({_BPE_PAIRS_SQL.format(src=f'w{r - 1}')}),
    best{r} AS (
      SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt
      FROM p{r} GROUP BY pair ORDER BY cnt DESC, pair ASC LIMIT 1
    ),
    w{r} AS (
      SELECT word, freq,
             replace(sym,
                     ' ' || (SELECT pair FROM best{r}) || ' ',
                     ' ' || replace((SELECT pair FROM best{r}), ' ', '')
                         || ' ') AS sym
      FROM w{r - 1}
    )"""
        )
    selects = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS round,"
        f" (SELECT pair FROM best{r}) AS merged_pair,"
        f" (SELECT cnt FROM best{r}) AS pair_count"
        for r in range(1, _BPE_ROUNDS + 1)
    )
    return "".join(parts) + "\n    " + selects


@query("tokenizer_bpe_merges", oracle=_bpe_oracle())
def tokenizer_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first 3 BPE merges from the corpus — the tokenizer-
    TRAINING aggregation (token counting covers inference; this is the
    other half a training-data platform runs). Classic BPE over the
    word-frequency table: words symbolize to space-delimited
    characters; each round counts adjacent symbol pairs weighted by
    word frequency (pairs inside one word count once per occurrence),
    merges the argmax pair (ties broken lexicographically — the
    determinism contract), and rewrites the symbol strings with a
    LITERAL leftmost-non-overlapping replace (same algorithm in the
    JVM and RE2-free DuckDB ``replace``, so the engines walk identical
    merge trajectories). Overlap boundary, pinned in tests: in a run
    like ``a n a n``, the shared delimiter means only the FIRST
    occurrence merges within a round — the survivor competes again in
    later rounds. Classic scan-left-to-right BPE would merge both in
    one round; this variant trades that for a merge rule both engines
    execute bit-identically, and converges to the same vocabulary as
    rounds proceed.

    Scale shape: the iteration state is the (vocab-sized) word-freq
    frame, NOT the corpus — the corpus is scanned ONCE to build it;
    each round is one groupBy over exploded symbol pairs of the vocab
    plus a scalar argmax collect (the documented kmeans/pagerank
    driver-state pattern). At 100 TB the corpus pass dominates and
    parallelizes trivially; rounds cost O(vocab), independent of
    corpus size. The pair explode stages the split array as a named
    column first (the Catalyst lambda-inlining boundary: referencing
    an O(d) expression inside an element lambda of the same projection
    inlines it per element)."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(tokens_col(F.col("text"))).alias("word"))
        .filter(F.col("word").rlike("^[a-z]+$"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn(
            "sym",
            F.concat(F.lit(" "), F.regexp_replace("word", "(.)", "$1 ")),
        )
        .localCheckpoint()  # the vocab state: tiny, reused every round
    )

    merges: list[tuple[int, str, int]] = []
    for r in range(1, _BPE_ROUNDS + 1):
        pairs = (
            words.select("freq", F.split(F.trim("sym"), " ").alias("a"))
            .filter(F.size("a") >= 2)
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(a)-1),"
                        " i -> element_at(a, i) || ' ' || element_at(a, i+1))"
                    )
                ).alias("pair"),
            )
        )
        best = (
            pairs.groupBy("pair")
            .agg(F.sum("freq").cast("bigint").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .first()  # scalar-only collect: the argmax merge decision
        )
        merges.append((r, best["pair"], best["cnt"]))
        merged_sym = best["pair"].replace(" ", "")
        words = words.withColumn(
            "sym",
            F.expr(
                f"replace(sym, ' {best['pair']} ', ' {merged_sym} ')"
            ),
        ).localCheckpoint()

    out = None
    for r, pair, cnt in merges:
        row = spark.range(1).select(
            F.lit(r).cast("bigint").alias("round"),
            F.lit(pair).alias("merged_pair"),
            F.lit(cnt).cast("bigint").alias("pair_count"),
        )
        out = row if out is None else out.unionByName(row)
    return out


# --------------------------------------------------------------------------
# Kneser-Ney-smoothed bigram language model (absolute discounting)
# --------------------------------------------------------------------------
@query(
    "text_bigram_lm_kneser_ney",
    oracle=f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, {_SQL_TOKS} AS t FROM documents
    ),
    bg AS (
      SELECT unnest(list_transform(range(1, len(t)),
                                   i -> t[i] || ' ' || t[i + 1])) AS bigram
      FROM toks
      WHERE len(t) >= 2
    ),
    bc AS (
      SELECT split_part(bigram, ' ', 1) AS w1,
             split_part(bigram, ' ', 2) AS w2,
             count(*) AS c
      FROM bg GROUP BY 1, 2
    ),
    ctx AS (
      SELECT w1, sum(c) AS c1, count(*) AS n1f FROM bc GROUP BY w1
    ),
    cont AS (
      SELECT w2, count(*) AS n1b FROM bc GROUP BY w2
    ),
    total AS (SELECT count(*) AS t_types FROM bc)
    SELECT bc.w1, bc.w2, bc.c,
           floor((greatest(bc.c - 0.75, 0) / ctx.c1
                  + 0.75 * ctx.n1f / ctx.c1 * (cont.n1b * 1.0 / total.t_types))
                 * 1000000 + 0.5) / 1000000 AS p_kn
    FROM bc
    JOIN ctx USING (w1)
    JOIN cont USING (w2)
    CROSS JOIN total
    WHERE bc.c >= 5
    """,
)
def text_bigram_lm_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM estimation (absolute discount
    d = 0.75) — the classic n-gram smoothing used by corpus-quality
    perplexity filters one step up from `text_unigram_lm_perplexity`'s
    add-1 model: P(w2|w1) = max(c−d,0)/c(w1·) + d·N₁₊(w1·)/c(w1·) ·
    N₁₊(·w2)/|bigram types| — probability mass freed by discounting
    observed bigrams is given to CONTINUATION-frequent words (how many
    contexts a word follows), not raw-frequent ones.

    Dataflow: codegen'd lead() shingling (the dedup family's spelling)
    → ONE bigram-count aggregation, from which all three model tables
    derive (prefix totals + distinct-successor counts by w1,
    distinct-predecessor counts by w2, type total) — re-aggregations
    of the counts table, never rescans of text. The probability
    arithmetic is exact-rational (d = 0.75 is binary-exact, every
    count an integer), so cross-engine equality is structural;
    reported at 6 dp over the c ≥ 5 head. At 100 TB: count tables are
    vocab²-bounded and shrink with Zipf — the standard KN-training
    shape (SRILM/KenLM's count-of-counts pass is this same
    aggregation)."""
    d = load_table(spark, sf_dir, "documents")
    bi = exploded_shingles(
        d.select("doc_id", "text"), "doc_id", "text", 2, "bigram"
    ).select(
        F.split("bigram", " ").getItem(0).alias("w1"),
        F.split("bigram", " ").getItem(1).alias("w2"),
    )
    bc = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c")).localCheckpoint()
    ctx = bc.groupBy("w1").agg(
        F.sum("c").alias("c1"), F.count(F.lit(1)).alias("n1f")
    )
    cont = bc.groupBy("w2").agg(F.count(F.lit(1)).alias("n1b"))
    t_types = bc.count()  # driver scalar: |distinct bigram types|

    p_kn = (
        F.greatest(F.col("c") - 0.75, F.lit(0)) / F.col("c1")
        + 0.75 * F.col("n1f") / F.col("c1")
        * (F.col("n1b") * 1.0 / F.lit(float(t_types)))
    )
    return (
        bc.filter(F.col("c") >= 5)
        .join(F.broadcast(ctx), "w1")
        .join(F.broadcast(cont), "w2")
        .select("w1", "w2", "c", dround(p_kn, 6).alias("p_kn"))
    )


# --------------------------------------------------------------------------
# Unigram-LM (SentencePiece-style) tokenizer trainer — Viterbi hard-EM
# --------------------------------------------------------------------------
#: trainer scope constants (part of the query spec — both engines and
#: the tests derive from these)
_UNI_MAX_WLEN = 8     # words longer than this are out of trainer scope
_UNI_MAX_PLEN = 4     # max piece length
_UNI_WORDS = 250      # trainer word-table size (freq desc, word asc)
_UNI_SEED_MULTI = 150 # seed multi-char pieces (substring count desc)
_UNI_KEEP_MULTI = 50  # multi-char pieces surviving the prune


def _uni_viterbi(word: str, vocab: dict) -> list:
    """Viterbi segmentation of ONE word under integer piece weights.
    Objective (EXACTLY the SQL twin's rn=1 ordering — np ASC, tw DESC,
    kc DESC — as a Python tuple min over (np, -tw, -k)): fewest
    pieces, then highest total weight, ties to the longer final
    piece. All decisions are exact integer comparisons, so Spark and
    the unrolled DuckDB oracle walk bit-identical trajectories."""
    n = len(word)
    best = [(0, 0)] + [None] * n  # (np, -tw) at each position
    choice = [0] * (n + 1)
    for i in range(1, n + 1):
        cands = []
        for k in range(1, min(_UNI_MAX_PLEN, i) + 1):
            if best[i - k] is None:
                continue
            w = vocab.get(word[i - k:i])
            if w is None:
                continue
            np_, ntw = best[i - k]
            cands.append(((np_ + 1, ntw - w, -k), k))
        c, k = min(cands)  # single chars are always in vocab: non-empty
        best[i] = (c[0], c[1])
        choice[i] = k
    pieces = []
    p = n
    while p > 0:
        k = choice[p]
        pieces.append(word[p - k:p])
        p -= k
    return pieces


def _uni_viterbi_usage(words: DataFrame, vocab: DataFrame) -> DataFrame:
    """One hard-EM E-step: Viterbi-segment every word under the
    current vocab and return per-piece usage counts (weighted by word
    frequency). The vocab is BOUNDED BY CONSTRUCTION (≤ seed-150
    multi-char pieces + single chars), so it collects to a driver
    dict and ships inside the Arrow-batched segmenter — exactly how
    SentencePiece distributes (model state broadcast, corpus
    partitioned); the per-word DP is imperative by nature, so this is
    the documented Pandas-UDF escape hatch, ONE stage per E-step
    instead of the per-position join ladder (measured 55 s → ~3 s at
    sf0.1: a hundred vocab-sized shuffles was the pathological
    shape). The M-step reduction is a partial-aggregable groupBy —
    the only shuffle."""
    import pandas as pd

    vocab_map = {r["piece"]: int(r["w"]) for r in vocab.collect()}

    def seg_batches(it):
        for pdf in it:
            pieces, freqs = [], []
            for word, freq in zip(pdf["word"], pdf["freq"]):
                f = int(freq)
                for piece in _uni_viterbi(word, vocab_map):
                    pieces.append(piece)
                    freqs.append(f)
            yield pd.DataFrame({"piece": pieces, "freq": freqs})

    used = words.select("word", "freq").mapInPandas(
        seg_batches, "piece string, freq long"
    )
    return used.groupBy("piece").agg(
        F.sum("freq").cast("long").alias("n_uses")
    )


def _uni_words_and_seed(spark: SparkSession, sf_dir: str):
    """The ONE corpus-touching stage: word frequencies and seed
    substring counts (both partial-aggregable groupBys)."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(tokens_col(F.col("text"))).alias("word"))
        .filter(F.col("word").rlike("^[a-z]+$"))
        .filter(F.length("word") <= _UNI_MAX_WLEN)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("word").asc())
        .limit(_UNI_WORDS)
        .localCheckpoint()
    )
    subs = (
        words.select(
            "freq",
            F.explode(
                F.expr(
                    f"flatten(transform(sequence(1, length(word)),"
                    f" s -> transform(sequence(1, least({_UNI_MAX_PLEN},"
                    f" length(word) - s + 1)),"
                    f" l -> substring(word, s, l))))"
                )
            ).alias("piece"),
        )
        .groupBy("piece")
        .agg(F.sum("freq").cast("long").alias("w"))
    )
    chars = subs.filter(F.length("piece") == 1)
    multi = (
        subs.filter(F.length("piece") >= 2)
        .orderBy(F.col("w").desc(), F.col("piece").asc())
        .limit(_UNI_SEED_MULTI)
    )
    vocab1 = chars.unionByName(multi).localCheckpoint()
    return words, chars, vocab1


def _uni_dp_ctes(r: int, vocab: str, src: str = "uwords") -> str:
    """One unrolled Viterbi DP over the `src` word relation (module
    level so the APPLY key's oracle can run the identical DP over the
    full corpus word table; src='uwords' reproduces the trainer's
    text byte-for-byte)."""
    W, P = _UNI_MAX_WLEN, _UNI_MAX_PLEN
    out = [
        f"dp{r}_0 AS MATERIALIZED (SELECT word, freq, wlen, 0 AS np,"
        f" CAST(0 AS BIGINT) AS tw, 0 AS kc FROM {src})"
    ]
    for i in range(1, W + 1):
        cands = []
        for k in range(1, min(P, i) + 1):
            cands.append(
                f"SELECT d.word, d.freq, d.wlen, d.np + 1 AS np,"
                f" d.tw + v.w AS tw, {k} AS kc"
                f" FROM dp{r}_{i - k} d JOIN {vocab} v"
                f" ON v.piece = substr(d.word, {i - k + 1}, {k})"
                f" WHERE d.wlen >= {i}"
            )
        u = " UNION ALL ".join(cands)
        out.append(
            f"dp{r}_{i} AS MATERIALIZED (SELECT word, freq, wlen, np, tw, kc FROM ("
            f"SELECT *, row_number() OVER (PARTITION BY word"
            f" ORDER BY np ASC, tw DESC, kc DESC) AS rn FROM ({u})"
            f") WHERE rn = 1)"
        )
    out.append(
        f"dpall{r} AS MATERIALIZED ("
        + " UNION ALL ".join(
            f"SELECT word, {i} AS i, kc FROM dp{r}_{i}"
            for i in range(1, W + 1)
        )
        + ")"
    )
    return ",\n".join(out)


def _uni_walk_ctes(r: int, src: str = "uwords") -> str:
    """The matching unrolled backwalk + usage aggregation (see
    `_uni_dp_ctes`)."""
    W = _UNI_MAX_WLEN
    out = [
        f"walk{r}_0 AS MATERIALIZED (SELECT word, freq, wlen AS p FROM {src})"
    ]
    for s in range(1, W + 1):
        out.append(
            f"emit{r}_{s} AS MATERIALIZED (SELECT w.word, w.freq,"
            f" substr(w.word, w.p - d.kc + 1, d.kc) AS piece,"
            f" w.p - d.kc AS p FROM walk{r}_{s - 1} w"
            f" JOIN dpall{r} d ON d.word = w.word AND d.i = w.p"
            f" WHERE w.p > 0)"
        )
        out.append(
            f"walk{r}_{s} AS MATERIALIZED (SELECT word, freq, p FROM emit{r}_{s}"
            f" WHERE p > 0)"
        )
    u = " UNION ALL ".join(
        f"SELECT piece, freq FROM emit{r}_{s}" for s in range(1, W + 1)
    )
    out.append(
        f"usage{r} AS MATERIALIZED (SELECT piece, CAST(sum(freq) AS BIGINT) AS n_uses"
        f" FROM ({u}) GROUP BY piece)"
    )
    return ",\n".join(out)


def _unigram_oracle() -> str:
    """Generate the unrolled DuckDB twin: the same word/seed
    aggregations, then BOTH hard-EM rounds' Viterbi DPs and backwalks
    unrolled position-by-position (no recursion — the max word length
    bounds the unroll), with the identical integer tie rule."""
    W, P = _UNI_MAX_WLEN, _UNI_MAX_PLEN
    dp_ctes, walk_ctes = _uni_dp_ctes, _uni_walk_ctes

    return f"""
    WITH toks AS MATERIALIZED (
      SELECT unnest({_SQL_TOKS}) AS word FROM documents
    ),
    uwords AS MATERIALIZED (
      SELECT word, count(*) AS freq, len(word) AS wlen FROM toks
      WHERE regexp_full_match(word, '[a-z]+') AND len(word) <= {W}
      GROUP BY word ORDER BY freq DESC, word ASC LIMIT {_UNI_WORDS}
    ),
    subs AS MATERIALIZED (
      SELECT substr(w.word, CAST(s.s AS INT), CAST(l.l AS INT)) AS piece,
             CAST(sum(w.freq) AS BIGINT) AS w
      FROM uwords w, range(1, {W + 1}) s(s), range(1, {P + 1}) l(l)
      WHERE s.s + l.l - 1 <= w.wlen
      GROUP BY 1
    ),
    uchars AS MATERIALIZED (SELECT piece, w FROM subs WHERE len(piece) = 1),
    umulti AS MATERIALIZED (SELECT piece, w FROM subs WHERE len(piece) >= 2
               ORDER BY w DESC, piece ASC LIMIT {_UNI_SEED_MULTI}),
    vocab1 AS MATERIALIZED (SELECT * FROM uchars UNION ALL SELECT * FROM umulti),
    {dp_ctes(1, "vocab1")},
    {walk_ctes(1)},
    vocab2 AS MATERIALIZED (
      SELECT c.piece, COALESCE(u.n_uses, 0) AS w
      FROM uchars c LEFT JOIN usage1 u ON u.piece = c.piece
      UNION ALL
      SELECT piece, n_uses AS w FROM usage1 WHERE len(piece) >= 2
      ORDER BY w DESC, piece ASC
      LIMIT 100000 OFFSET 0
    ),
    vocab2m AS MATERIALIZED (SELECT piece, w FROM vocab2 WHERE len(piece) >= 2
                ORDER BY w DESC, piece ASC LIMIT {_UNI_KEEP_MULTI}),
    vocab2f AS MATERIALIZED (SELECT piece, w FROM vocab2 WHERE len(piece) = 1
                UNION ALL SELECT * FROM vocab2m),
    {dp_ctes(2, "vocab2f")},
    {walk_ctes(2)}
    SELECT piece, n_uses FROM usage2
    """


@query("tokenizer_unigram_lm_em", oracle=_unigram_oracle())
def tokenizer_unigram_lm_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SentencePiece-style unigram-LM tokenizer TRAINING (VERDICT r10
    item 4 — the EM counterpart to tokenizer_bpe_merges): seed a piece
    vocabulary from corpus substring counts, then run TWO hard-EM
    rounds — E-step Viterbi-segments every trainer word under the
    current piece weights; M-step re-weights pieces by their Viterbi
    usage and PRUNES to the top-{_UNI_KEEP_MULTI} multi-char pieces
    (single chars always survive, the unigram-LM invariant that keeps
    every string segmentable). The Viterbi objective is the integer
    lexicographic surrogate of the unigram likelihood — fewest pieces,
    then highest total piece weight, ties to the longer piece — the
    same determinism trade the BPE key documents: decisions live on an
    exact integer grid, so Spark and the unrolled DuckDB twin (the
    full DP + backwalk of BOTH rounds, generated position-by-position)
    walk bit-identical trajectories. Scale: the corpus is touched by
    exactly ONE partial-aggregable pass (word + substring counts);
    the EM loop is per-word-parallel joins over vocab-bounded state,
    independent of corpus size."""
    words, _chars, vocab2 = _uni_trained_state(spark, sf_dir)
    return _uni_viterbi_usage(words, vocab2)


def _uni_trained_state(spark: SparkSession, sf_dir: str):
    """Run the unigram-LM EM training (round-1 E/M step) and return
    (trainer words, char vocab, the round-2 vocab) — shared by the
    trainer key and the APPLY key, building the identical plan the
    trainer always built."""
    words, chars, vocab1 = _uni_words_and_seed(spark, sf_dir)
    usage1 = _uni_viterbi_usage(words, vocab1)

    chars2 = (
        chars.select("piece")
        .join(usage1, "piece", "left")
        .select("piece", F.coalesce("n_uses", F.lit(0)).cast("long").alias("w"))
    )
    multi2 = (
        usage1.filter(F.length("piece") >= 2)
        .select("piece", F.col("n_uses").cast("long").alias("w"))
        .orderBy(F.col("w").desc(), F.col("piece").asc())
        .limit(_UNI_KEEP_MULTI)
    )
    vocab2 = chars2.unionByName(multi2).localCheckpoint()
    return words, chars, vocab2


# --------------------------------------------------------------------------
# WordPiece merge learning — the likelihood-scored trainer (completes
# the trainer trio: BPE r10, unigram-LM r11, WordPiece r12)
# --------------------------------------------------------------------------
_WP_ROUNDS = 3

#: DuckDB twin of one WordPiece round's pair relation over a
#: (word, freq, sym) frame — identical windows to _BPE_PAIRS_SQL.
_WP_PAIRS_SQL = _BPE_PAIRS_SQL


def _wordpiece_oracle() -> str:
    """Unrolled 3-round DuckDB twin of the WordPiece trainer: symbol
    freqs + pair freqs → argmax by score = cnt/(fa·fb) (IEEE-double
    division of exact integers — deterministically identical in both
    engines; ties to pair asc) → literal ' ##'-collapsing replace."""
    parts = [
        """
    WITH words AS (
      SELECT word, count(*) AS freq FROM (
        SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                 AS word
        FROM documents
      ) WHERE regexp_matches(word, '^[a-z]+$')
      GROUP BY word
    ),
    w0 AS (SELECT word, freq,
                  ' ' || substr(word, 1, 1) || ' ' ||
                  regexp_replace(substr(word, 2), '(.)', '##\\1 ', 'g')
                    AS sym
           FROM words)"""
    ]
    for r in range(1, _WP_ROUNDS + 1):
        parts.append(
            f""",
    p{r} AS ({_WP_PAIRS_SQL.format(src=f'w{r - 1}')}),
    pc{r} AS (SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt
              FROM p{r} GROUP BY pair),
    sf{r} AS (
      SELECT s, CAST(sum(freq) AS BIGINT) AS f FROM (
        SELECT unnest(list_filter(string_split(trim(sym), ' '),
                                  x -> x <> '')) AS s,
               freq
        FROM w{r - 1}
      ) GROUP BY s
    ),
    best{r} AS (
      SELECT pair, cnt, fa.f AS fa, fb.f AS fb,
             CAST(cnt AS DOUBLE) / (CAST(fa.f AS DOUBLE)
                                    * CAST(fb.f AS DOUBLE)) AS score
      FROM pc{r}
      JOIN sf{r} fa ON fa.s = split_part(pair, ' ', 1)
      JOIN sf{r} fb ON fb.s = split_part(pair, ' ', 2)
      ORDER BY score DESC, pair ASC LIMIT 1
    ),
    w{r} AS (
      SELECT word, freq,
             replace(sym,
                     ' ' || (SELECT pair FROM best{r}) || ' ',
                     ' ' || replace((SELECT pair FROM best{r}), ' ##', '')
                         || ' ') AS sym
      FROM w{r - 1}
    )"""
        )
    selects = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS round,"
        f" (SELECT pair FROM best{r}) AS merged_pair,"
        f" (SELECT cnt FROM best{r}) AS pair_count,"
        f" (SELECT fa FROM best{r}) AS freq_a,"
        f" (SELECT fb FROM best{r}) AS freq_b,"
        f" (SELECT CAST(floor(score * 1000000000 + 0.5) AS BIGINT)"
        f"  FROM best{r}) AS score_e9"
        for r in range(1, _WP_ROUNDS + 1)
    )
    return "".join(parts) + "\n    " + selects


@query("tokenizer_wordpiece_merges", oracle=_wordpiece_oracle())
def tokenizer_wordpiece_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first 3 WordPiece merges (VERDICT r11 item 6 — the
    likelihood-scored trainer that completes the trio with BPE and
    unigram-LM): symbols carry the ## continuation prefix
    (word → 'w ##o ##r ##d'), each round counts symbol and adjacent-
    pair frequencies weighted by word freq and merges the pair
    maximizing score = freq(ab) / (freq(a)·freq(b)) — BPE's raw-count
    argmax normalized by the parts' own frequencies, which is what
    makes WordPiece prefer cohesive units over merely-common ones.

    Determinism contract: the score is an IEEE-double division of
    exact integers (both < 2^53, so the quotient is identically
    rounded in the JVM and DuckDB); ties break to pair asc; the merge
    rewrite is the same literal leftmost-non-overlapping
    space-delimited replace as the BPE key (merged symbol =
    pair with ' ##' collapsed — the second element of an adjacent
    pair is ALWAYS a continuation symbol, so the collapse is total).
    The oracle unrolls all three rounds (symbol-freq CTE + pair CTE +
    scored argmax + rewrite per round), so the full trajectory —
    winners, counts, and e9-scaled scores — is value-attested
    cross-engine.

    Scale shape: identical to tokenizer_bpe_merges — ONE corpus scan
    builds the word-frequency state; each round is two vocab-sized
    aggregations (symbol freqs, pair freqs) joined item-dimension
    sized, plus a scalar argmax collect. Rounds cost O(vocab),
    independent of corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(tokens_col(F.col("text"))).alias("word"))
        .filter(F.col("word").rlike("^[a-z]+$"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn(
            "sym",
            F.concat(
                F.lit(" "),
                F.substring("word", 1, 1),
                F.lit(" "),
                F.regexp_replace(F.expr("substring(word, 2)"), "(.)", "##$1 "),
            ),
        )
        .localCheckpoint()  # the vocab state: tiny, reused every round
    )

    merges: list[tuple[int, str, int, int, int, int]] = []
    for r in range(1, _WP_ROUNDS + 1):
        split_syms = words.select(
            "freq", F.split(F.trim("sym"), " ").alias("a")
        ).localCheckpoint(eager=False)
        sym_freq = (
            split_syms.select("freq", F.explode("a").alias("s"))
            .groupBy("s")
            .agg(F.sum("freq").cast("bigint").alias("f"))
        )
        pairs = (
            split_syms.filter(F.size("a") >= 2)
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(a)-1),"
                        " i -> element_at(a, i) || ' ' || element_at(a, i+1))"
                    )
                ).alias("pair"),
            )
            .groupBy("pair")
            .agg(F.sum("freq").cast("bigint").alias("cnt"))
        )
        fa = sym_freq.select(F.col("s").alias("_sa"), F.col("f").alias("fa"))
        fb = sym_freq.select(F.col("s").alias("_sb"), F.col("f").alias("fb"))
        scored = (
            pairs.join(fa, F.split_part(F.col("pair"), F.lit(" "), F.lit(1)) == F.col("_sa"))
            .join(fb, F.split_part(F.col("pair"), F.lit(" "), F.lit(2)) == F.col("_sb"))
            .select(
                "pair",
                "cnt",
                "fa",
                "fb",
                (
                    F.col("cnt").cast("double")
                    / (F.col("fa").cast("double") * F.col("fb").cast("double"))
                ).alias("score"),
            )
        )
        best = scored.orderBy(
            F.col("score").desc(), F.col("pair").asc()
        ).first()  # scalar-only collect: the argmax merge decision
        merges.append(
            (
                r,
                best["pair"],
                best["cnt"],
                best["fa"],
                best["fb"],
                int(math.floor(best["score"] * 1_000_000_000 + 0.5)),
            )
        )
        merged_sym = best["pair"].replace(" ##", "")
        words = words.withColumn(
            "sym",
            F.expr(f"replace(sym, ' {best['pair']} ', ' {merged_sym} ')"),
        ).localCheckpoint()

    out = None
    for r, pair, cnt, f_a, f_b, s_e9 in merges:
        row = spark.range(1).select(
            F.lit(r).cast("bigint").alias("round"),
            F.lit(pair).alias("merged_pair"),
            F.lit(cnt).cast("bigint").alias("pair_count"),
            F.lit(f_a).cast("bigint").alias("freq_a"),
            F.lit(f_b).cast("bigint").alias("freq_b"),
            F.lit(s_e9).cast("bigint").alias("score_e9"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def _wordpiece_vocab_ctes() -> str:
    """DuckDB CTEs producing the applied-vocabulary relation
    ``vocab(piece, stem, is_initial, plen)`` from the trainer's 3
    unrolled rounds (`_wordpiece_oracle` CTE chain is embedded
    verbatim up through w{_WP_ROUNDS}): every single char seen
    word-initially (bare) or word-internally (## form), plus the
    merge winners. ``stem`` = the raw letters (## stripped),
    ``plen`` = len(stem) — what greedy longest-match consumes."""
    trainer = _wordpiece_oracle()
    # reuse the trainer's WITH chain; cut before its final SELECT, and
    # promote to WITH RECURSIVE (the walk CTE below self-references)
    head, _sep, _tail = trainer.rpartition("\n    SELECT")
    head = head.replace("WITH words AS", "WITH RECURSIVE words AS", 1)
    return (
        head
        + f""",
    merged AS (
      SELECT replace(pair, ' ##', '') AS piece FROM best1
      UNION ALL SELECT replace(pair, ' ##', '') FROM best2
      UNION ALL SELECT replace(pair, ' ##', '') FROM best3
    ),
    singles AS (
      SELECT DISTINCT substr(word, 1, 1) AS piece FROM words
      UNION
      SELECT DISTINCT '##' || x
      FROM (SELECT unnest(list_transform(range(2, length(word) + 1),
                                         i -> substr(word, i, 1))) AS x
            FROM words WHERE length(word) >= 2)
    ),
    vocab AS (
      SELECT piece,
             replace(piece, '##', '') AS stem,
             CASE WHEN piece LIKE '##%' THEN 0 ELSE 1 END AS is_initial,
             length(replace(piece, '##', '')) AS plen
      FROM (SELECT piece FROM singles UNION SELECT piece FROM merged)
    )"""
    )


@query(
    "tokenizer_wordpiece_apply",
    oracle=f"""{_wordpiece_vocab_ctes()},
    walk AS (
      SELECT word, freq, 0 AS pos, CAST(NULL AS VARCHAR) AS piece
      FROM words
      UNION ALL
      SELECT w.word, w.freq, w.pos + v.plen AS pos, v.piece
      FROM (
        SELECT word, freq, pos, piece,
               row_number() OVER (PARTITION BY word, pos
                                  ORDER BY plen DESC) AS rnk
        FROM (
          SELECT k.word, k.freq, k.pos, v.piece, v.plen
          FROM walk k JOIN vocab v
            ON v.is_initial = CASE WHEN k.pos = 0 THEN 1 ELSE 0 END
           AND substr(k.word, k.pos + 1, v.plen) = v.stem
          WHERE k.pos < length(k.word)
        )
      ) w JOIN vocab v ON v.piece = w.piece
      WHERE w.rnk = 1
    )
    SELECT piece, CAST(sum(freq) AS BIGINT) AS n_uses
    FROM walk WHERE piece IS NOT NULL
    GROUP BY piece
    """,
)
def tokenizer_wordpiece_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece INFERENCE — greedy longest-match tokenization under
    the vocabulary the trainer learned (all single chars in their
    initial/## forms + the {_WP_ROUNDS} merge winners), returning
    per-piece usage counts over the corpus: the serving-side half of
    `tokenizer_wordpiece_merges`, and the LLM-pipeline primitive that
    turns a trained vocab into token streams.

    Greedy longest-match (the HF WordPiece decoder): at position 0
    match the longest INITIAL-form piece prefixing the word, then
    repeatedly the longest ##-form piece prefixing the remainder;
    ties are impossible (one piece per (form, string)). Every corpus
    char appears in the vocab by construction, so no UNK path
    (asserted in-code: the walk's consumed length re-sums to the
    corpus's total letters).

    Cross-engine: the oracle embeds the trainer's full 3-round CTE
    chain (so the vocab itself is re-derived, not copied), then walks
    every word with a recursive CTE whose per-(word, pos) argmax is
    the same longest-match rule — full value attestation of the
    tokenization, not a spot check.

    Scale shape: ONE corpus scan builds the word-freq table; the walk
    runs over the VOCAB-SIZED word table in an Arrow-batched pandas
    UDF against a broadcast piece list (per-word Python cost is
    O(word length), corpus never crosses to Python); usage counts are
    one vocab-sized aggregation."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(tokens_col(F.col("text"))).alias("word"))
        .filter(F.col("word").rlike("^[a-z]+$"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .localCheckpoint()
    )

    # the trained vocab: re-run the trainer (vocab-sized work) and
    # assemble singles + merge winners exactly as the oracle does
    merges = tokenizer_wordpiece_merges(spark, sf_dir).collect()
    merged_pieces = [r["merged_pair"].replace(" ##", "") for r in merges]
    singles = (
        words.select(F.substring("word", 1, 1).alias("piece"))
        .union(
            words.filter(F.length("word") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(2, length(word)),"
                        " i -> '##' || substring(word, i, 1))"
                    )
                ).alias("piece")
            )
        )
        .distinct()
    )
    vocab = sorted(
        {r["piece"] for r in singles.collect()} | set(merged_pieces)
    )
    # longest-match tables, initial vs continuation, sorted by stem
    # length DESC so the first prefix hit IS the greedy choice
    init_pieces = sorted(
        [p for p in vocab if not p.startswith("##")],
        key=lambda p: (-len(p), p),
    )
    cont_pieces = sorted(
        [(p, p[2:]) for p in vocab if p.startswith("##")],
        key=lambda ps: (-len(ps[1]), ps[0]),
    )

    def tok(w: str) -> list[str]:
        out: list[str] = []
        pos = 0
        n = len(w)
        while pos < n:
            if pos == 0:
                for p in init_pieces:
                    if w.startswith(p):
                        out.append(p)
                        pos = len(p)
                        break
                else:
                    raise ValueError(f"no initial piece for {w!r}")
            else:
                for p, stem in cont_pieces:
                    if w.startswith(stem, pos):
                        out.append(p)
                        pos += len(stem)
                        break
                else:
                    raise ValueError(f"no continuation piece for {w!r}")
        return out

    def wp_tokenize(batches):
        for pdf in batches:
            toks = pdf["word"].map(tok)
            lens = toks.map(len)
            yield pd.DataFrame(
                {
                    "piece": [p for ts in toks for p in ts],
                    "freq": pdf["freq"].repeat(lens).to_numpy(),
                }
            )

    pieces = words.select("word", "freq").mapInPandas(
        wp_tokenize, "piece string, freq bigint"
    )
    out = pieces.groupBy("piece").agg(
        F.sum("freq").cast("bigint").alias("n_uses")
    )
    # no-UNK coverage assert: consumed letters re-sum to corpus letters
    consumed = out.agg(
        F.sum(
            F.length(F.regexp_replace("piece", "#", "")) * F.col("n_uses")
        ).cast("long")
    ).collect()[0][0]
    total = words.agg(
        F.sum(F.length("word") * F.col("freq")).cast("long")
    ).collect()[0][0]
    assert consumed == total, "wordpiece walk lost characters"
    return out


def _bpe_symframe_ctes() -> str:
    """The trainer's full CTE chain (verbatim, so the merge list is
    re-derived cross-engine, never copied) cut before its final
    SELECT: ends with w{_BPE_ROUNDS}, the word-freq frame whose `sym`
    carries all trained merges applied."""
    trainer = _bpe_oracle()
    head, _sep, _tail = trainer.rpartition("\n    SELECT")
    return head


@query(
    "tokenizer_bpe_apply",
    oracle=f"""{_bpe_symframe_ctes()}
    SELECT piece, CAST(sum(freq) AS BIGINT) AS n_uses
    FROM (
      SELECT freq,
             unnest(list_filter(string_split(trim(sym), ' '),
                                x -> x <> '')) AS piece
      FROM w{_BPE_ROUNDS}
    )
    GROUP BY piece
    """,
)
def tokenizer_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE INFERENCE — apply the trained merge list (VERDICT r12
    item 3: the distributed apply path that makes the trainer usable;
    tokenizing is the single most-run LLM-pipeline operator at
    100 TB). Greedy merge application in TRAINED ORDER under the same
    literal space-delimited leftmost-non-overlapping replace rule the
    trainer's rewrite step uses — so a word tokenizes exactly as the
    trainer left it, and the merge trajectory needs no re-scoring at
    apply time. Returns per-piece usage counts (piece, n_uses) over
    the corpus word-freq table, the same contract as
    `tokenizer_wordpiece_apply`.

    Cross-engine: the oracle embeds the trainer's full 3-round CTE
    chain (merge list re-derived, not copied) and reads the final
    symbol frame — full value attestation of the applied
    tokenization.

    Scale shape: ONE corpus scan builds the word-freq table; the
    apply itself is {_BPE_ROUNDS} chained JVM `replace` expressions
    over the VOCAB-SIZED word table (no Python at all — BPE apply
    under a trained merge list is pure string rewriting, unlike
    WordPiece's longest-match walk), then one explode + one
    partial-aggregable groupBy. At 100 TB: corpus pass → vocab-sized
    state → merges applied map-side; per-word cost is O(merges),
    independent of corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(tokens_col(F.col("text"))).alias("word"))
        .filter(F.col("word").rlike("^[a-z]+$"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn(
            "sym",
            F.concat(F.lit(" "), F.regexp_replace("word", "(.)", "$1 ")),
        )
    )

    # the trained merge list, in order (vocab-sized work; the collect
    # is the trainer's own scalar-argmax protocol)
    merges = tokenizer_bpe_merges(spark, sf_dir).orderBy("round").collect()
    sym = F.col("sym")
    for m in merges:
        pair = m["merged_pair"]
        sym = F.call_function(
            "replace",
            sym,
            F.lit(f" {pair} "),
            F.lit(f" {pair.replace(' ', '')} "),
        )

    pieces = (
        words.select("freq", F.split(F.trim(sym), " ").alias("a"))
        .select("freq", F.explode("a").alias("piece"))
        .filter(F.col("piece") != "")
    )
    return pieces.groupBy("piece").agg(
        F.sum("freq").cast("bigint").alias("n_uses")
    )


def _unigram_apply_oracle() -> str:
    """APPLY-key twin: the trainer's full CTE chain verbatim (vocab
    re-derived, not copied), then the SAME unrolled Viterbi DP +
    backwalk (round label 3) over the FULL corpus word relation —
    restricted to words whose every char the trainer saw (the char
    vocab is derived from trainer words; a word with an unseen char
    has no segmentation under the model on either engine)."""
    trainer = _unigram_oracle()
    head, _sep, _tail = trainer.rpartition("\n    SELECT")
    W = _UNI_MAX_WLEN
    return (
        head
        + f""",
    awords AS MATERIALIZED (
      SELECT word, count(*) AS freq, len(word) AS wlen FROM toks
      WHERE regexp_full_match(word, '[a-z]+') AND len(word) <= {W}
      GROUP BY word
    ),
    wc AS (
      SELECT word, unnest(list_transform(range(1, len(word) + 1),
                                         i -> substr(word, i, 1))) AS c
      FROM awords
    ),
    covered AS (
      SELECT wc.word FROM wc LEFT JOIN uchars u ON u.piece = wc.c
      GROUP BY wc.word
      HAVING count(*) FILTER (WHERE u.piece IS NULL) = 0
    ),
    aw2 AS MATERIALIZED (
      SELECT a.* FROM awords a JOIN covered c ON c.word = a.word
    ),
    {_uni_dp_ctes(3, "vocab2f", src="aw2")},
    {_uni_walk_ctes(3, src="aw2")}
    SELECT piece, n_uses FROM usage3
    """
    )


@query("tokenizer_unigram_apply", oracle=_unigram_apply_oracle())
def tokenizer_unigram_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM INFERENCE — Viterbi segmentation of the FULL corpus
    word table under the EM-trained vocabulary (VERDICT r12 item 3:
    the distributed apply path; the trainer's E-step only ever touched
    its top-{_UNI_WORDS} trainer words). Returns per-piece usage
    counts (piece, n_uses), the tokenizer-apply contract shared with
    `tokenizer_bpe_apply` / `tokenizer_wordpiece_apply`.

    Same integer Viterbi objective as training (np ASC, tw DESC, kc
    DESC — fewest pieces, highest total weight, ties to the longer
    piece), so both engines walk bit-identical segmentations. Words
    containing a character the trainer never saw are out of model
    scope (no segmentation exists) and are excluded by an exploded
    char anti-join on BOTH engines — a deterministic, value-checked
    coverage rule, not a silent drop.

    Scale shape: ONE corpus scan builds the word-freq table; the
    trained vocab is bounded (≤ 26 chars + {_UNI_KEEP_MULTI} pieces)
    and ships inside the Arrow-batched segmenter exactly as the
    E-step does (model broadcast, corpus partitioned — the
    SentencePiece deployment shape); usage is one partial-aggregable
    groupBy. Per-word cost is O(wlen·{_UNI_MAX_PLEN}); corpus size
    only widens the embarrassingly parallel map stage."""
    _words, chars, vocab2 = _uni_trained_state(spark, sf_dir)

    docs = load_table(spark, sf_dir, "documents")
    all_words = (
        docs.select(F.explode(tokens_col(F.col("text"))).alias("word"))
        .filter(F.col("word").rlike("^[a-z]+$"))
        .filter(F.length("word") <= _UNI_MAX_WLEN)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    wchars = all_words.select(
        "word",
        F.explode(
            F.expr("transform(sequence(1, length(word)),"
                   " i -> substring(word, i, 1))")
        ).alias("c"),
    )
    uncovered = (
        wchars.join(chars.select(F.col("piece").alias("c")), "c", "left_anti")
        .select("word")
        .distinct()
    )
    segmentable = all_words.join(uncovered, "word", "left_anti")
    return _uni_viterbi_usage(segmentable, vocab2)


@query(
    "corpus_tokenize_pack",
    oracle=f"""{_bpe_symframe_ctes().replace("WITH words AS", "WITH RECURSIVE words AS", 1)},
    wp AS MATERIALIZED (
      SELECT word,
             CAST(len(list_filter(string_split(trim(sym), ' '),
                                  x -> x <> '')) AS BIGINT) AS np
      FROM w{_BPE_ROUNDS}
    ),
    dt AS MATERIALIZED (
      SELECT doc_id,
             unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
      FROM documents
    ),
    dagg AS MATERIALIZED (
      SELECT dt.doc_id, CAST(sum(COALESCE(wp.np, 1)) AS BIGINT) AS n_tok
      FROM dt LEFT JOIN wp ON wp.word = dt.w
      GROUP BY dt.doc_id
    ),
    d AS MATERIALIZED (
      SELECT doc.doc_id, doc.lang, COALESCE(dagg.n_tok, 0) AS n_tok,
             row_number() OVER (PARTITION BY doc.lang
                                ORDER BY doc.doc_id) AS rn
      FROM documents doc LEFT JOIN dagg ON dagg.doc_id = doc.doc_id
    ),
    packfold AS (
      SELECT doc_id, lang, n_tok, rn, CAST(0 AS BIGINT) AS bin_id,
             n_tok AS fill
      FROM d WHERE rn = 1
      UNION ALL
      SELECT d.doc_id, d.lang, d.n_tok, d.rn,
             CASE WHEN p.fill + d.n_tok <= 256 THEN p.bin_id
                  ELSE p.bin_id + 1 END,
             CASE WHEN p.fill + d.n_tok <= 256 THEN p.fill + d.n_tok
                  ELSE d.n_tok END
      FROM packfold p JOIN d ON d.lang = p.lang AND d.rn = p.rn + 1
    )
    SELECT doc_id, lang AS shard, n_tok, bin_id FROM packfold
    """,
)
def corpus_tokenize_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LLM-pretraining data chain closed end-to-end with a TRAINED
    tokenizer: train BPE on the corpus → apply the merge list → pack
    documents into 256-token context windows by their REAL tokenized
    lengths (`pack_sequences` packed by whitespace token counts; a
    production run packs by what the trainer will actually see).

    Per-doc length under the trained tokenizer: alpha words cost
    their BPE piece count (the applied symbol frame, vocab-sized);
    every other token costs 1 (pass-through — numbers/punctuation are
    out of the trainer's ^[a-z]+$ scope, the same convention both
    engines state literally). Docs with zero tokens pack at length 0.

    Cross-engine: the oracle embeds the BPE trainer's full 3-round
    CTE chain (merges re-derived), derives the word→piece-count map
    from the final symbol frame, folds per-doc sums through the SAME
    recursive next-fit CTE as `pack_sequences` — the packing of the
    tokenized corpus is value-attested end-to-end.

    Scale shape: corpus scanned ONCE into word freqs (trainer) and
    ONCE exploded for doc lengths; the word→piece map is vocab-sized
    and broadcast-joins against the exploded tokens; packing is the
    per-shard O(n) applyInPandas scan. No stage touches more than
    corpus + vocab."""
    from ..operators.packing import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(tokens_col(F.col("text"))).alias("word"))
        .filter(F.col("word").rlike("^[a-z]+$"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn(
            "sym",
            F.concat(F.lit(" "), F.regexp_replace("word", "(.)", "$1 ")),
        )
    )
    merges = tokenizer_bpe_merges(spark, sf_dir).orderBy("round").collect()
    sym = F.col("sym")
    for m in merges:
        pair = m["merged_pair"]
        sym = F.call_function(
            "replace",
            sym,
            F.lit(f" {pair} "),
            F.lit(f" {pair.replace(' ', '')} "),
        )
    wp = words.select(
        "word",
        F.size(F.filter(F.split(F.trim(sym), " "), lambda x: x != "")).cast(
            "long"
        ).alias("np"),
    )

    dt = docs.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("w"))
    dagg = (
        dt.join(F.broadcast(wp), dt["w"] == wp["word"], "left")
        .groupBy("doc_id")
        .agg(F.sum(F.coalesce("np", F.lit(1))).cast("long").alias("n_tok"))
    )
    d = (
        docs.select("doc_id", "lang")
        .join(dagg, "doc_id", "left")
        .select(
            "doc_id", "lang", F.coalesce("n_tok", F.lit(0)).alias("n_tok")
        )
    )
    return pack_sequences(d, capacity=256, shard_col="lang", tokens_col="n_tok")
