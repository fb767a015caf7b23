"""Physical scale patterns as registered, oracle-checked operators:
the two-pass histogram-narrowing exact median and hash-consistent
multi-table sampling.

Several docstrings across the surface say "at 100 TB use two-pass
narrowing" or "sample consistently by entity key" — this module makes
those claims executable and differentially verified instead of
rhetorical. Tier-1 backlog for the round-7 attestation window;
locally parity-verified at sf0.001/0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import dround
from ..sources import load_table
from .registry import query

#: Histogram resolution for pass 1 of the exact median.
_MED_BUCKETS = 256


@query(
    "exact_median_histogram_2pass",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n,
           floor(median(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                 / 100 * 1000000 + 0.5) / 1000000 AS median_dollars
    FROM orders
    """,
)
def exact_median_histogram_2pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global median without a global sort — the two-pass
    histogram narrowing several keys cite as their 100 TB posture
    (agg_weighted_median, agg_percentiles), implemented and attested:
    pass 1 histograms the value range into 256 buckets (one partial-agg
    shuffle of ≤256 rows) and locates the bucket(s) holding the two
    middle ranks; pass 2 sorts ONLY those buckets' rows (expected
    n/256) and picks the order statistics. Driver traffic is scalar
    boundaries (min/max/n and two bucket ids + one cumulative
    offset) — the accepted scalar-collect class, no row round-trip.
    The oracle is DuckDB's one-shot median, so the narrowing is
    value-attested to agree with the naive spelling. Each extra pass
    divides the candidate set by the bucket count: two passes cover
    10^4.8 rows per final-sort row at 256 buckets; 100 TB wants three
    passes or 64k buckets, same operator."""
    o = load_table(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("v")
    )
    lo, hi, n = o.agg(
        F.min("v"), F.max("v"), F.count(F.lit(1))
    ).collect()[0]
    k1, k2 = (n + 1) // 2, n // 2 + 1
    span = hi - lo + 1
    bucket = F.expr(f"(v - {lo}) * {_MED_BUCKETS} div {span}")
    hist = (
        o.groupBy(bucket.alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy("b")
        .collect()
    )
    cum = 0
    b1 = b2 = None
    cum_before_b1 = 0
    for r in hist:
        if b1 is None and cum + r.c >= k1:
            b1, cum_before_b1 = r.b, cum
        if cum + r.c >= k2:
            b2 = r.b
            break
        cum += r.c
    sel = o.filter((bucket >= b1) & (bucket <= b2))
    w = Window.orderBy("v")
    ranked = sel.select(
        "v", (F.row_number().over(w) + cum_before_b1).alias("rk")
    )
    med = ranked.filter(F.col("rk").isin(k1, k2)).agg(
        F.sum("v").cast("double").alias("s"),
        F.count(F.lit(1)).alias("m"),
    )
    return med.select(
        F.lit(n).cast("bigint").alias("n"),
        dround(F.col("s") / F.col("m") / 100, 6).alias("median_dollars"),
    )


#: Entity-sampling parameters: Knuth multiplicative hash on the
#: CUSTOMER key, keep 10% — the same masked-hash family as
#: sample_stratified; applied to the same entity column on every
#: table so samples stay join-consistent.
_S_HX, _S_MASK, _S_PCT = 2654435761, 2147483648, 10


def _keep_sql(col: str) -> str:
    return f"((({col} % {_S_MASK}) * {_S_HX}) % 100) < {_S_PCT}"


def _keep(col: str) -> F.Column:
    return ((F.col(col) % _S_MASK) * _S_HX) % 100 < _S_PCT


@query(
    "sample_consistent_multitable",
    oracle=f"""
    WITH cs AS (
      SELECT c_custkey FROM customer WHERE {_keep_sql('c_custkey')}
    ),
    os AS (
      SELECT o_orderkey, o_custkey FROM orders
      WHERE {_keep_sql('o_custkey')}
    ),
    j AS (
      SELECT o_orderkey FROM os JOIN cs ON o_custkey = c_custkey
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM cs) AS n_cust_sample,
           (SELECT CAST(count(*) AS BIGINT) FROM os) AS n_orders_sample,
           (SELECT CAST(count(*) AS BIGINT) FROM j) AS n_join,
           (SELECT count(*) FROM os) = (SELECT count(*) FROM j)
             AS consistent_ok
    """,
)
def sample_consistent_multitable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-consistent sampling: hash the ENTITY key (custkey) with
    the same function on every table, keep the same 10% of entities
    everywhere — so the join of the samples equals the sample of the
    join, attested by n_join == n_orders_sample (every sampled
    order's customer is guaranteed sampled). The contrast is
    per-table row sampling (TABLESAMPLE / rand()), where a 10%+10%
    independent draw keeps only ~1% of joinable pairs and biases
    every per-entity statistic. This is how a 100 TB dev slice must
    be cut: the predicate pushes to every scan (no shuffle to
    sample), downstream joins and per-entity aggregates stay
    exact on the kept entities."""
    cs = load_table(spark, sf_dir, "customer").filter(
        _keep("c_custkey")
    ).select("c_custkey")
    os_ = load_table(spark, sf_dir, "orders").filter(
        _keep("o_custkey")
    ).select("o_orderkey", "o_custkey")
    j = os_.join(cs, os_.o_custkey == cs.c_custkey).select("o_orderkey")
    counts = (
        cs.agg(F.count(F.lit(1)).cast("bigint").alias("n_cust_sample"))
        .crossJoin(
            os_.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_orders_sample")
            )
        )
        .crossJoin(F.broadcast(
            j.agg(F.count(F.lit(1)).cast("bigint").alias("n_join"))
        ))
    )
    return counts.select(
        "n_cust_sample",
        "n_orders_sample",
        "n_join",
        (F.col("n_join") == F.col("n_orders_sample")).alias("consistent_ok"),
    )
