"""Reusable text column builders (all JVM-side, codegen-friendly).

These are the building blocks of the text-analysis operators (language
ID, quality scoring, fingerprinting, shingling for near-dup). They are
plain Column expressions — no UDFs — so they inline into whole-stage
codegen and scale linearly with input bytes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny deterministic English stopword list for the language-ID
#: heuristic. Fixed and ordered so the oracle SQL can embed the same set.
EN_STOPWORDS: tuple[str, ...] = (
    "the", "a", "of", "and", "to", "in", "is", "on", "for", "with",
)


def tokens_col(text: Column | str) -> Column:
    """Whitespace tokens with empties dropped.

    `split` + `filter` (higher-order) — stays columnar; equivalent
    oracle: list_filter(string_split(text, ' '), x -> x <> '').
    """
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, " "), lambda x: x != "")


def shingles_col(toks: Column, k: int = 3) -> Column:
    """k-word shingles (space-joined) from a token array.

    transform(sequence(1, n-k+1), i -> concat_ws(' ', t[i..i+k-1])),
    1-based via element_at. Empty array when n < k.
    """
    n = F.size(toks)
    # sequence(1, x) DESCENDS for x < 1, so guard short docs explicitly
    sh = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + off).cast("int")) for off in range(k)]
        ),
    )
    return F.when(n >= k, sh).otherwise(F.expr("CAST(array() AS ARRAY<STRING>)"))


def exploded_shingles(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    out: str = "shingle",
):
    """(id, shingle) rows — one row per k-word shingle — via
    posexplode + lead() windows, the whole-stage-codegen'd spelling.

    Produces the exact multiset ``explode(shingles_col(tokens, k))``
    yields, but compiled: higher-order-function lambdas
    (transform/filter) evaluate INTERPRETED in Spark — no whole-stage
    codegen — and the HOF shingle stage measured 4.3 s vs 0.75 s at
    sf0.1 (SURVEY §8, the winnowing conversion). The swap costs one
    hash shuffle on ``id_col`` (the lead window), which every
    downstream consumer in the dedup family — groupBy(id) minhash
    aggregation, (id, shingle) distinct — reuses or would pay anyway.

    Docs with fewer than k tokens contribute no rows (the trailing
    lead(k-1) guard is NULL for the last k-1 positions, and for every
    position of a short doc), matching shingles_col's empty-array
    guard. Position order within a doc is the same 1..n-k+1 walk.

    Distribution: the DOC relation is hash-repartitioned on ``id_col``
    with an EXPLICIT partition count BEFORE the posexplode — Generate
    preserves its child's partitioning, so the lead() window (which
    only needs ClusteredDistribution(id)) adds NO exchange, just a
    partition-local sort, and downstream groupBy(id)/distinct(id, sh)
    consumers reuse the same partitioning (HashPartitioning(id) is a
    subset of their clustering keys). The explicit count matters
    twice: an implicit repartition(col) is AQE-coalesceable, and the
    first cut of this helper let AQE squeeze the token shuffle to 3
    partitions at sf0.1 — the whole shingle/hash stage then ran at
    parallelism 3 and measured SLOWER than the interpreted HOF it
    replaced (85 s vs 50 s for the family). Shuffling docs (not
    tokens) also moves each text byte across the wire once, not once
    per token row.
    """
    from pyspark.sql import Window

    # the temp columns below are reserved: a caller whose frame already
    # carries one would get silently blended shingles, so fail loudly
    # (ADVICE r8)
    reserved = {"__uid", "__pos", "__tok", "__guard_uid"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            f"exploded_shingles: input columns {sorted(clash)} collide with "
            "reserved temp names __uid/__pos/__tok/__guard_uid — rename them"
        )

    spark = df.sparkSession
    try:
        conf_par = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    except ValueError:  # e.g. "auto" under some deployments
        conf_par = 200
    par = max(conf_par, spark.sparkContext.defaultParallelism)
    # __uid distinguishes physical ROWS that share an id_col value: the
    # window below partitions by id (so downstream id-keyed consumers
    # reuse the exchange), ordering by (__uid, __pos) — without the uid
    # in the sort AND the row-boundary guard, two rows with the same id
    # would interleave tokens at colliding positions and lead() would
    # emit blended garbage shingles. Under unique ids (every current
    # call site) this is behavior-neutral; with duplicates it matches
    # the reference HOF spelling's per-row shingle multiset.
    tok = (
        df.repartition(par, F.col(id_col))
        .withColumn("__uid", F.monotonically_increasing_id())
        .select(
            F.col(id_col),
            F.col("__uid"),
            F.posexplode(tokens_col(F.col(text_col))).alias("__pos", "__tok"),
        )
    )
    if k == 1:
        return tok.select(F.col(id_col), F.col("__tok").alias(out))
    w = Window.partitionBy(id_col).orderBy("__uid", "__pos")
    parts = [F.col("__tok")] + [F.lead("__tok", i).over(w) for i in range(1, k)]
    return (
        tok.select(
            F.col(id_col),
            F.col("__uid"),
            F.concat_ws(" ", *parts).alias(out),
            # row-boundary guard: the (k-1)-ahead token must exist AND
            # belong to the SAME physical row — NULL marks positions
            # past n-k+1 of the LAST row, a uid change marks the seam
            # between rows (concat_ws would silently skip NULLs / blend
            # across the seam otherwise)
            F.lead("__uid", k - 1).over(w).alias("__guard_uid"),
        )
        .filter(F.col("__guard_uid") == F.col("__uid"))
        .drop("__guard_uid", "__uid")
    )


def quality_score_col(text: Column | str, toks: Column) -> Column:
    """Composite pretraining quality score: 0.4·length-score +
    0.4·lexical-diversity + 0.2·stopword-density. THE single Spark-side
    spelling — text_quality_score, corpus_clean_pipeline, and the
    composed release pipeline all call this, and the SQL twin lives in
    plans/text.py::quality_sql, so the q >= threshold boundary cannot
    drift between copies (it previously existed in three hand-kept
    copies per engine)."""
    t = F.col(text) if isinstance(text, str) else text
    n = F.greatest(F.size(toks), F.lit(1))
    return (
        0.4 * F.least(F.length(t) / 200.0, F.lit(1.0))
        + 0.4 * (F.size(F.array_distinct(toks)) / n)
        + 0.2 * (F.size(F.filter(toks, lambda x: x.isin(*EN_STOPWORDS))) / n)
    )


def en_stopword_ratio(toks: Column) -> Column:
    """Fraction of tokens that are English stopwords (language-ID score)."""
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*EN_STOPWORDS)))
    return n_stop / F.greatest(F.size(toks), F.lit(1))


def fingerprint_col(toks: Column) -> Column:
    """Content fingerprint: md5 over the sorted distinct token set.

    Normalization (sort + distinct) makes the fingerprint invariant to
    token order and repetition — two docs with the same vocabulary
    collide, which is the intent for near-dup candidate generation.
    """
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks))))


def with_token_array(df, text_col: str = "text", out: str = "toks"):
    """Materialize the token array ONCE per row, behind a Generate
    barrier.

    `tokens_col()` is a split+filter expression; Catalyst's
    CollapseProject inlines it into every downstream consumer, so a
    k-word shingle built from k `element_at` calls re-splits the whole
    document k times per shingle — quadratic in document length.
    `explode(array(x))` is a 1:1 generator: Generate materializes its
    output attribute, and projection collapse cannot cross it, so the
    split runs exactly once per row (measured 9.3s → 0.8s on the
    sf0.1 5-gram explode).
    """
    keep = [c for c in df.columns if c != text_col]
    return df.select(*keep, F.explode(F.array(tokens_col(F.col(text_col)))).alias(out))
