"""Corpus-hygiene operators for LLM pretraining data: cross-document
segment-level dedup (C4-style) and within-document repetition filters
(the Gopher repetition section — complements plans/text.py's
text_gopher_rules, which covers the non-repetition rules).

Both are designed scan-first: the repetition filter is entirely
shuffle-free array expressions; the segment dedup's only shuffle is
the dedup hash partition itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import dround, sql_dround
from ..sources import load_table
from .registry import query

_CHUNK_WORDS = 10


@query(
    "dedup_lines_c4",
    oracle=f"""
    WITH docs AS (SELECT doc_id, str_split(text, ' ') AS w FROM documents),
    chunks AS (
      SELECT doc_id, i AS pos,
             array_to_string(w[(i*{_CHUNK_WORDS}+1):(i*{_CHUNK_WORDS}+{_CHUNK_WORDS})], ' ') AS chunk
      FROM docs, UNNEST(range(CAST(ceil(len(w) / {_CHUNK_WORDS}.0) AS BIGINT))) AS t(i)
    ),
    keep AS (
      SELECT doc_id, pos, chunk
      FROM chunks
      QUALIFY row_number() OVER (PARTITION BY chunk ORDER BY doc_id, pos) = 1
    )
    SELECT doc_id,
           string_agg(chunk, ' ' ORDER BY pos) AS cleaned_text,
           count(*) AS n_chunks_kept
    FROM keep GROUP BY doc_id
    """,
)
def dedup_lines_c4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style cross-document segment dedup: documents split into
    fixed 10-word segments (the corpus has no newlines — segments
    stand in for C4's lines), every segment kept only at its first
    corpus occurrence (min doc_id, then position), surviving segments
    reassembled in order. Documents whose every segment is boilerplate
    vanish — exactly C4's behavior.

    Scale: segmentation is a shuffle-free higher-order expression; the
    single shuffle is the hash partition on segment text for the keep-
    first window. At 100 TB you shuffle xxhash64(segment) + (doc, pos)
    instead of the raw text and join winners back by (doc, pos) — same
    plan shape, thinner shuffle rows."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    n_chunks = F.ceil(F.size(w) / F.lit(float(_CHUNK_WORDS))).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(
            F.slice(w, i * _CHUNK_WORDS + 1, _CHUNK_WORDS), " "
        ),
    )
    exploded = docs.select(
        "doc_id", F.posexplode(chunks).alias("pos", "chunk")
    ).select("doc_id", F.col("pos").cast("bigint").alias("pos"), "chunk")
    first = Window.partitionBy("chunk").orderBy("doc_id", "pos")
    kept = (
        exploded.withColumn("rn", F.row_number().over(first))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return kept.groupBy("doc_id").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(pos, chunk))),"
            " s -> s.chunk), ' ')"
        ).alias("cleaned_text"),
        F.count(F.lit(1)).alias("n_chunks_kept"),
    )


@query(
    "text_repetition_filter",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, unnest(str_split(text, ' ')) AS word FROM documents
    ),
    freq AS (
      SELECT doc_id, word, count(*) AS c FROM words GROUP BY 1, 2
    ),
    agg AS (
      SELECT doc_id, sum(c) AS n_words, count(*) AS n_distinct,
             max(c) AS max_freq
      FROM freq GROUP BY 1
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           {sql_dround("1 - n_distinct / CAST(n_words AS DOUBLE)", 6)}
             AS dup_word_fraction,
           {sql_dround("max_freq / CAST(n_words AS DOUBLE)", 6)}
             AS top_word_share,
           CASE WHEN 1 - n_distinct / CAST(n_words AS DOUBLE) <= 0.55
                 AND max_freq / CAST(n_words AS DOUBLE) <= 0.10
                THEN 1 ELSE 0 END AS keep_doc
    FROM agg
    """,
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition rules: per-document duplicate-word
    fraction and most-frequent-word share, with the keep/drop flag.

    The oracle states it relationally (explode → group twice); the
    engine computes BOTH metrics shuffle-free per row — distinct count
    via array_distinct, and the top-word frequency as a single
    aggregate() pass over the SORTED word array tracking the longest
    equal-run (O(n log n) per doc, no explode, no shuffle) — so the
    filter runs at scan speed over 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    run0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("bigint").alias("run"),
        F.lit(0).cast("bigint").alias("best"),
    )

    def step(acc, x):  # noqa: ANN001 - Column lambda
        new_run = F.when(acc.prev.isNotNull() & (acc.prev == x), acc.run + 1).otherwise(
            F.lit(1).cast("bigint")
        )
        return F.struct(
            x.alias("prev"),
            new_run.alias("run"),
            F.greatest(acc.best, new_run).alias("best"),
        )

    max_freq = F.aggregate(F.array_sort(w), run0, step).getField("best")
    n_words = F.size(w).cast("bigint")
    n_distinct = F.size(F.array_distinct(w)).cast("bigint")
    dup_frac = 1 - n_distinct / n_words.cast("double")
    top_share = max_freq / n_words.cast("double")
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        dround(dup_frac, 6).alias("dup_word_fraction"),
        dround(top_share, 6).alias("top_word_share"),
        F.when((dup_frac <= 0.55) & (top_share <= 0.10), 1)
        .otherwise(0)
        .alias("keep_doc"),
    )
