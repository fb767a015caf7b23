"""The composed "corpus release" pipeline — the end-to-end chain a
training-data release actually runs, registered as ONE key:

    clean (quality filter + exact dedup)
      → near-dedup keep-list (capped 3-gram Jaccard → CC → cluster min)
      → decontaminate (drop eval split + 5-gram overlap with it)
      → mix (per-language hash-threshold down-weighting)
      → shuffle-shard (deterministic training order)
      → pack (greedy next-fit 256-token bins per shard)

Every stage is an already-attested key (corpus_clean_pipeline,
dedup_corpus_end2end, decontaminate_ngram, corpus_mix_weighted,
corpus_shuffle_shard, pack_sequences); the COMPOSITION is what a real
pipeline runs, and it is exactly the shape that exposes diamond
re-execution and barrier mistakes per-key tests cannot: the cleaned
corpus feeds four consumers (pair-gen twice, decon shingling, stage
stats), so each stage is localCheckpoint()ed exactly once and the
returned stats plan reads ONLY those materialized barriers — zero
parquet re-scans (pinned in tests/test_release.py). `df.observe()`
telemetry is attached at each boundary, the production pattern for
per-stage row accounting without extra actions.

Output: one row per stage — (stage, n_docs, id_checksum, n_tokens,
n_bins) — and the DuckDB oracle recomputes the ENTIRE chain
(recursive-CTE connected components and per-shard packing fold
included), so survivor counts, id checksums, token totals, and the
packed bin count are all cross-engine value-attested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import (
    exploded_shingles,
    fingerprint_col,
    quality_score_col,
    tokens_col,
)
from ..sources import load_table
from .dedup import _MAX_SHINGLE_DF
from .registry import query
from .text import (
    DECON_K,
    EVAL_MOD,
    MIX_RATES,
    _MIX_VALUES_SQL,
    _SQL_TOKS,
    quality_sql,
)

#: release knobs — shared by the Spark plan and the oracle SQL
_REL_Q_MIN = 0.55
_REL_JACC = 0.2
_REL_SHARDS = 8
_REL_CAPACITY = 256

_HASH_SQL = "((doc_id % 2147483648) * 2654435761)"


def _stage_row(name: str, df: DataFrame, packed: DataFrame | None = None):
    """One (stage, n_docs, id_checksum, n_tokens, n_bins) summary row.

    Cheap single-row aggregations off a checkpointed stage — the whole
    stats union costs one job over materialized RDDs, never a rebuild
    of the chain."""
    n_bins = (
        F.countDistinct("shard", "bin_id").cast("bigint")
        if packed is not None
        else F.lit(None).cast("bigint")
    )
    src = packed if packed is not None else df
    return src.agg(
        F.lit(name).alias("stage"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("doc_id").cast("bigint").alias("id_checksum"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
        n_bins.alias("n_bins"),
    )


_RELEASE_ORACLE = f"""
    WITH RECURSIVE
    t AS (
      SELECT doc_id, lang, text, {_SQL_TOKS} AS toks FROM documents
    ),
    scored AS (
      SELECT doc_id, lang, toks, CAST(len(toks) AS BIGINT) AS n_tok,
             {quality_sql("toks")} AS q,
             md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fp
      FROM t
    ),
    clean AS (
      SELECT doc_id, lang, toks, n_tok
      FROM (SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
            FROM scored WHERE q >= {_REL_Q_MIN})
      WHERE rn = 1
    ),
    sh0 AS (
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks) - 1),
                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
        FROM clean WHERE len(toks) >= 3
      )
    ),
    keep_sh AS (
      SELECT sh FROM sh0 GROUP BY sh HAVING count(*) <= {_MAX_SHINGLE_DF}
    ),
    sh AS (SELECT s.doc_id, s.sh FROM sh0 s JOIN keep_sh USING (sh)),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter) >= {_REL_JACC}
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
    clus AS (SELECT node, min(label) AS cluster_id FROM walk GROUP BY node),
    near AS (
      SELECT c.* FROM clean c
      WHERE c.doc_id NOT IN (SELECT node FROM clus WHERE node <> cluster_id)
    ),
    evsh AS (
      SELECT DISTINCT sh FROM (
        SELECT unnest(list_transform(range(1, len(toks) - {DECON_K - 2}),
                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                           || ' ' || toks[i+3] || ' ' || toks[i+4])) AS sh
        FROM t WHERE doc_id % {EVAL_MOD} = 0 AND len(toks) >= {DECON_K}
      )
    ),
    contaminated AS (
      SELECT DISTINCT n.doc_id FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks) - {DECON_K - 2}),
                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                           || ' ' || toks[i+3] || ' ' || toks[i+4])) AS sh
        FROM near WHERE len(toks) >= {DECON_K}
      ) n JOIN evsh USING (sh)
    ),
    decon AS (
      SELECT doc_id, lang, n_tok FROM near
      WHERE doc_id % {EVAL_MOD} <> 0
        AND doc_id NOT IN (SELECT doc_id FROM contaminated)
    ),
    rates(lang, keep_permille) AS (VALUES {_MIX_VALUES_SQL}),
    mixed AS (
      SELECT d.doc_id, d.n_tok FROM decon d JOIN rates r USING (lang)
      WHERE {_HASH_SQL} % 1000 < r.keep_permille
    ),
    sharded AS (
      SELECT doc_id, n_tok,
             CAST(({_HASH_SQL} % 4294967296) % {_REL_SHARDS} AS VARCHAR) AS shard,
             row_number() OVER (
               PARTITION BY ({_HASH_SQL} % 4294967296) % {_REL_SHARDS}
               ORDER BY {_HASH_SQL} % 4294967296, doc_id) AS rn
      FROM mixed
    ),
    packfold(doc_id, n_tok, shard, rn, bin_id, fill) AS (
      SELECT doc_id, n_tok, shard, rn, CAST(0 AS BIGINT), n_tok
      FROM sharded WHERE rn = 1
      UNION ALL
      SELECT s.doc_id, s.n_tok, s.shard, s.rn,
             CASE WHEN p.fill + s.n_tok <= {_REL_CAPACITY}
                  THEN p.bin_id ELSE p.bin_id + 1 END,
             CASE WHEN p.fill + s.n_tok <= {_REL_CAPACITY}
                  THEN p.fill + s.n_tok ELSE s.n_tok END
      FROM packfold p JOIN sharded s ON s.shard = p.shard AND s.rn = p.rn + 1
    ),
    stage_rows AS (
      SELECT 'raw' AS stage, count(*) AS n_docs, sum(doc_id) AS id_checksum,
             sum(CAST(len(toks) AS BIGINT)) AS n_tokens,
             CAST(NULL AS BIGINT) AS n_bins
      FROM t
      UNION ALL
      SELECT 'clean', count(*), sum(doc_id), sum(n_tok), NULL FROM clean
      UNION ALL
      SELECT 'neardup', count(*), sum(doc_id), sum(n_tok), NULL FROM near
      UNION ALL
      SELECT 'decontaminated', count(*), sum(doc_id), sum(n_tok), NULL FROM decon
      UNION ALL
      SELECT 'mixed', count(*), sum(doc_id), sum(n_tok), NULL FROM mixed
      UNION ALL
      SELECT 'packed', count(*), sum(doc_id), sum(n_tok),
             (SELECT count(*) FROM (SELECT DISTINCT shard, bin_id FROM packfold))
      FROM packfold
    )
    SELECT stage, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(id_checksum AS BIGINT) AS id_checksum,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_bins AS BIGINT) AS n_bins
    FROM stage_rows
"""


@query("corpus_release_end2end", oracle=_RELEASE_ORACLE)
def corpus_release_end2end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See module docstring. Plan shape (the part per-key tests can't
    check): `scored` is tokenized ONCE behind a Generate barrier and
    checkpointed; each later stage checkpoints before fan-out, so the
    3-gram pair self-join, the decon shingling, and every stats row
    read a materialized barrier instead of re-deriving the chain (a
    naive composition re-executes the clean stage 4× and the scan 7×).
    At cluster scale the localCheckpoints become persist(DISK_ONLY) or
    intermediate tables; the stage structure is unchanged."""
    from ..operators.dedup import dedup_ngram_jaccard
    from ..operators.graph import connected_components
    from ..operators.packing import pack_sequences

    docs = load_table(spark, sf_dir, "documents")

    # tokenize once: explode(array(·)) is a 1:1 Generate barrier, so the
    # split cannot be inlined into each downstream consumer. _spread
    # first: the single-file fixture scan is ONE partition, which would
    # serialize the whole tokenize+score pass on one task; a production
    # read is already partitioned and _spread is a no-op (guide §2.4)
    from ..operators.dedup import _spread

    bar = _spread(docs).select(
        "doc_id", "lang", "text",
        F.explode(F.array(tokens_col(F.col("text")))).alias("toks"),
    )
    q = quality_score_col("text", F.col("toks"))
    scored = bar.select(
        "doc_id", "lang", "text",
        F.size("toks").cast("bigint").alias("n_tok"),
        q.alias("q"),
        fingerprint_col(F.col("toks")).alias("fp"),
    ).observe("release_raw", F.count(F.lit(1)).alias("n_docs")).localCheckpoint()

    # stage 1: quality floor + exact dedup (keep min doc_id per fp)
    w_fp = Window.partitionBy("fp").orderBy("doc_id")
    clean = (
        scored.filter(F.col("q") >= _REL_Q_MIN)
        .withColumn("rn", F.row_number().over(w_fp))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "text", "n_tok")
        .observe("release_clean", F.count(F.lit(1)).alias("n_docs"))
        .localCheckpoint()
    )

    # stage 2: near-dup keep-list — capped 3-gram Jaccard pairs over the
    # CLEAN survivors, connected components, drop everything but each
    # cluster's min id (singletons survive via the anti-join)
    pairs = dedup_ngram_jaccard(
        clean.select("doc_id", "text"), "doc_id", "text", 3, _REL_JACC,
        max_shingle_df=_MAX_SHINGLE_DF,
    ).select("id_a", "id_b")
    cc = connected_components(pairs, src="id_a", dst="id_b")
    dropped = cc.filter(F.col("node") != F.col("cluster_id")).select("node")
    near = (
        clean.join(dropped, clean.doc_id == dropped.node, "left_anti")
        .observe("release_neardup", F.count(F.lit(1)).alias("n_docs"))
        .localCheckpoint()
    )

    # stage 3: decontaminate — drop the eval split itself plus any
    # survivor sharing a 5-gram with it (eval shingles are benchmark-
    # sized → broadcast; the corpus side never shuffles for this)
    is_eval = F.col("doc_id") % EVAL_MOD == 0
    eval_sh = (
        exploded_shingles(docs.filter(is_eval), "doc_id", "text", DECON_K, "sh")
        .select("sh").distinct()
    )
    contaminated = (
        exploded_shingles(near, "doc_id", "text", DECON_K, "sh")
        .join(F.broadcast(eval_sh), "sh")
        .select("doc_id").distinct()
    )
    decon = (
        near.filter(~is_eval)
        .join(contaminated, "doc_id", "left_anti")
        .select("doc_id", "lang", "n_tok")
        .observe("release_decontaminated", F.count(F.lit(1)).alias("n_docs"))
        .localCheckpoint()
    )

    # stage 4: mix — per-language hash-threshold down-weighting off a
    # broadcast rate table (deterministic: re-runs keep the same docs)
    rates = spark.createDataFrame(
        list(MIX_RATES.items()), "lang string, keep_permille int"
    )
    key = ((F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761))
    mixed = (
        decon.join(F.broadcast(rates), "lang")
        .filter(key % 1000 < F.col("keep_permille"))
        .select("doc_id", "n_tok")
        .observe("release_mixed", F.count(F.lit(1)).alias("n_docs"))
        .localCheckpoint()
    )

    # stage 5+6: deterministic shuffle-shard, then greedy next-fit
    # packing per shard in shuffled training order
    ord_key = (key % F.lit(4294967296)).alias("ord_key")
    sharded = mixed.select(
        "doc_id", "n_tok", ord_key,
        ((key % F.lit(4294967296)) % _REL_SHARDS).cast("string").alias("shard"),
    )
    packed = pack_sequences(
        sharded, capacity=_REL_CAPACITY, shard_col="shard",
        tokens_col="n_tok", order_col="ord_key",
    ).localCheckpoint()

    stats = (
        _stage_row("raw", scored)
        .unionByName(_stage_row("clean", clean))
        .unionByName(_stage_row("neardup", near))
        .unionByName(_stage_row("decontaminated", decon))
        .unionByName(_stage_row("mixed", mixed))
        .unionByName(_stage_row("packed", None, packed=packed))
    )
    # final-frame telemetry survives into the returned plan (the
    # per-stage observes above are consumed at their checkpoints)
    return stats.observe(
        "release_stages", F.count(F.lit(1)).alias("n_stage_rows")
    )
