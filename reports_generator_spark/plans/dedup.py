"""Dedup operator registrations (SURVEY.md §2.3 E2/E3 + north-star
variants: exact, MinHash-LSH, SimHash, n-gram Jaccard).

`dedup_exact` and `dedup_ngram_jaccard` carry full SQL oracles.
MinHash and SimHash depend on Spark's xxhash64 hash family, which no
external oracle reproduces — the driver records those rows-only; their
*behavioral* correctness (recall on planted near-dups, signature
stability) is covered in tests/test_dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    dedup_exact as _dedup_exact,
    dedup_minhash_lsh,
    dedup_ngram_jaccard as _dedup_ngram_jaccard,
    dedup_simhash,
)
from ..sources import load_table
from .registry import query

_SQL_TOKS = "list_filter(string_split(text, ' '), x -> x <> '')"


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
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
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
    """Exact 3-gram Jaccard near-dup pairs (threshold 0.2)."""
    return _dedup_ngram_jaccard(load_table(spark, sf_dir, "documents"), "doc_id", "text", 3, 0.2)


@query("dedup_near_minhash")
def dedup_near_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs (32 hashes, 8 bands). Rows-only:
    signature hash family is Spark xxhash64."""
    return dedup_minhash_lsh(
        load_table(spark, sf_dir, "documents"),
        num_hashes=32,
        bands=8,
        jaccard_threshold=0.5,
    )


@query("dedup_simhash")
def dedup_simhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (64-bit, Hamming ≤ 3). Rows-only."""
    return dedup_simhash(load_table(spark, sf_dir, "documents"))


@query(
    "dedup_cluster_cc",
    oracle=f"""
    WITH RECURSIVE t AS (
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
    """Near-dup pairs → clusters: connected components (min-label
    propagation, operators/graph.py) over the 3-gram-Jaccard pair
    graph; cluster_id = min doc_id in the component. The oracle is the
    same fixpoint as a recursive CTE."""
    from ..operators.graph import connected_components

    pairs = _dedup_ngram_jaccard(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", 3, 0.2
    )
    cc = connected_components(pairs, src="id_a", dst="id_b")
    return cc.select(F.col("node").alias("doc_id"), "cluster_id")
