"""UDF surface (SURVEY.md §2.3 R23/R24): the Python escape hatch, done
the only way that survives scale — Arrow-vectorized pandas UDFs.

Row-at-a-time Python UDFs are banned in this engine: a pandas UDF
transfers columnar Arrow batches and amortizes the Python crossing
~10-100×. The oracles express the same semantics in SQL, proving the
UDFs compute what they claim.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from ..sources import load_table
from .registry import query


@pandas_udf(DoubleType())
def _net_price(ep: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
    """Vectorized net price: ep * (1-disc) * (1+tax), floor-rounded to
    2dp with the same IEEE ops as the oracle SQL (see functions.rounding)."""
    import numpy as np

    v = ep * (1.0 - disc) * (1.0 + tax)
    return np.floor(v * 100.0 + 0.5) / 100.0


@query(
    "udf_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5) / 100
             AS net_price
    FROM lineitem
    WHERE floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5) / 100
            > 50000.0
    """,
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            _net_price("l_extendedprice", "l_discount", "l_tax").alias("net_price"),
        )
        .filter(F.col("net_price") > 50000.0)
    )


@pandas_udf(DoubleType())
def _weighted_avg_disc(price: pd.Series, disc: pd.Series) -> float:
    """Grouped-agg pandas UDF: price-weighted mean discount."""
    denom = price.sum()
    if denom == 0:
        return 0.0
    return float((price * disc).sum() / denom)


@query(
    "udaf",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_discount) / sum(l_extendedprice), 6)
             AS weighted_avg_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(_weighted_avg_disc("l_extendedprice", "l_discount"), 6).alias(
            "weighted_avg_disc"
        )
    )


# --------------------------------------------------------------------------
# UDTF (table function) — completes the function surface: scalar
# (pandas_udf) / aggregate (GROUPED_AGG) / table (udtf)
# --------------------------------------------------------------------------
@query(
    "udtf_expand",
    oracle="""
    WITH s AS (
      SELECT doc_id, UNNEST(string_split(text, '.')) AS sentence FROM documents
    )
    SELECT doc_id, trim(sentence) AS sentence,
           CAST(len(list_filter(string_split(trim(sentence), ' '), x -> x <> ''))
                AS BIGINT) AS n_words
    FROM s
    WHERE trim(sentence) <> ''
    """,
)
def udtf_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Arrow-batched): one input doc → N sentence rows
    with word counts. The table-function escape hatch for 1:N logic a
    lateral view can't express (here it CAN — the oracle proves the
    semantics with UNNEST — but the shape is the point)."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="doc_id: bigint, sentence: string, n_words: bigint", useArrow=True)
    class ExpandSentences:
        def eval(self, doc_id: int, text: str):
            for raw in text.split("."):
                s = raw.strip()
                if s:
                    yield doc_id, s, len([w for w in s.split(" ") if w])

    d = load_table(spark, sf_dir, "documents")
    d.createOrReplaceTempView("rg_udtf_docs")
    spark.udtf.register("rg_expand_sentences", ExpandSentences)
    return spark.sql(
        "SELECT t.* FROM rg_udtf_docs, "
        "LATERAL rg_expand_sentences(doc_id, text) t"
    )


def _arrow_disc_price(batches):
    """Arrow-native batch kernel: net discounted price + filter, all in
    pyarrow.compute (C++ SIMD kernels) — rows never materialize in
    Python objects. The floor-based rounding matches the oracle's
    IEEE-754 ops bit-for-bit (see functions.rounding)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        ep = batch.column("l_extendedprice")
        disc = batch.column("l_discount")
        v = pc.multiply(ep, pc.subtract(pa.scalar(1.0), disc))
        v = pc.divide(
            pc.floor(pc.add(pc.multiply(v, pa.scalar(100.0)), pa.scalar(0.5))),
            pa.scalar(100.0),
        )
        mask = pc.greater(v, pa.scalar(9000.0))
        out = pa.RecordBatch.from_arrays(
            [
                pc.filter(batch.column("l_orderkey"), mask),
                pc.filter(batch.column("l_linenumber"), mask),
                pc.filter(v, mask),
            ],
            names=["l_orderkey", "l_linenumber", "disc_price"],
        )
        yield out


@query(
    "udf_map_in_arrow",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100 AS disc_price
    FROM lineitem
    WHERE floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100 > 9000.0
    """,
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow — the zero-copy tier of the Python escape hatch,
    completing the UDF surface (scalar pandas_udf / grouped-agg /
    UDTF / grouped-map elsewhere in this registry): the executor hands
    raw Arrow RecordBatches to Python and pyarrow.compute kernels
    (vectorized C++) transform them without ever building pandas
    Series, so the per-batch overhead is one FFI hop — the pattern for
    plugging tokenizers/codecs that already speak Arrow into a 100 TB
    scan. Projection is pruned BEFORE the Python exchange (only the 4
    consumed columns cross), and the filter runs inside the kernel so
    filtered rows never cross back."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    ).mapInArrow(
        _arrow_disc_price,
        "l_orderkey bigint, l_linenumber int, disc_price double",
    )


def _group_zscore(pdf):
    """Grouped-map kernel: per-customer z-scores of order totals.
    Sorts by the unique key FIRST so the float mean/std accumulate in
    a deterministic order regardless of how rows arrived in the
    group's Arrow batch."""
    pdf = pdf.sort_values("o_orderkey").reset_index(drop=True)
    cents = pdf["cents"]
    mu = cents.mean()
    sd = cents.std(ddof=1)
    import math

    z = (cents - mu) / sd if (sd and not math.isnan(sd) and sd > 0) else cents * 0.0
    out = pdf[["o_custkey", "o_orderkey"]].copy()
    out["n_orders"] = len(pdf)
    out["zscore"] = (z * 1e6).apply(lambda v: math.floor(v + 0.5)) / 1e6
    return out


@query(
    "udf_grouped_map_zscore",
    oracle="""
    WITH base AS (
      SELECT o_custkey, o_orderkey,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders WHERE o_custkey % 100 = 7
    ),
    stats AS (
      SELECT o_custkey,
             count(*) AS n_orders,
             avg(cents) AS mu,
             stddev_samp(cents) AS sd
      FROM base GROUP BY o_custkey
    )
    SELECT b.o_custkey, b.o_orderkey,
           CAST(s.n_orders AS BIGINT) AS n_orders,
           CASE WHEN s.sd IS NULL OR s.sd = 0 OR isnan(s.sd) THEN 0.0
                ELSE floor((b.cents - s.mu) / s.sd * 1000000 + 0.5) / 1000000
           END AS zscore
    FROM base b JOIN stats s ON s.o_custkey = b.o_custkey
    """,
)
def udf_grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map — the missing member of the Python
    escape-hatch family (scalar pandas UDF, grouped-AGG UDAF, UDTF,
    mapInArrow are attested; grouped-MAP is the 'whole group in, whole
    frame out' shape custom per-entity transforms need when no SQL
    aggregate fits). Per-customer z-scores here so the oracle CAN
    recompute it relationally — proving the Arrow round-trip preserves
    values, which is the point of the key; a real deployment would put
    a model-scoring or curve-fitting kernel in the same slot. Scale
    posture: one hash shuffle on the group key, each group crosses the
    Arrow boundary once, per-group state bounded by group size (the
    skew caveat every grouped-map carries); the kernel sorts by the
    unique key so float accumulation order — and therefore the 6 dp
    pin — is deterministic under any upstream partitioning. The %100
    slice bounds fixture output, not the plan."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 100 == 7)
    base = o.select(
        "o_custkey",
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    return base.groupBy("o_custkey").applyInPandas(
        _group_zscore,
        "o_custkey bigint, o_orderkey bigint, n_orders bigint, zscore double",
    )


@query(
    "udtf_table_argument",
    oracle="""
    SELECT o_orderstatus AS status,
           count(*) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents
    FROM orders
    WHERE o_orderkey % 20 = 0
    GROUP BY o_orderstatus
    """,
)
def udtf_table_argument(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF over a TABLE argument with PARTITION BY (SQL:2016
    polymorphic table function, Spark 4 syntax) — the last member of
    the Python escape-hatch family: unlike a lateral UDTF
    (udtf_expand: one row in, rows out) the function receives a WHOLE
    PARTITION as a row stream (fresh instance per partition, eval per
    row, terminate emits), which is the shape for custom per-group
    stream algorithms that applyInPandas can't express incrementally
    (it materializes the group; a UDTF can keep O(1) state over an
    arbitrarily large partition). The kernel here is a per-status
    rollup so the oracle recomputes it as plain GROUP BY — the key
    attests the partition-routing and Arrow-transfer semantics
    (useArrow=True: ArrowEvalPythonUDTF, not row-pickled
    BatchEvalPythonUDTF — plan-asserted in tests/test_plan_shapes.py).
    Scale: one hash shuffle on the PARTITION BY key; state per
    partition is O(1). eval() is still per-row PYTHON — inherent to
    the UDTF contract, which is why the engine's own rollups are
    JVM aggregates and this key exists only to attest the API — so
    the fixture input is a deterministic 5% key slice (%20), bounding
    what is intentionally the slowest per-row path in the repo
    (measured 16.6 s/full-table at sf0.1, 0.9 s sliced)."""
    from pyspark.sql.functions import udtf

    @udtf(
        returnType="status string, n_orders bigint, sum_cents bigint",
        useArrow=True,
    )
    class PartitionRollup:
        def __init__(self):
            self.key = None
            self.n = 0
            self.cents = 0

        def eval(self, row):
            self.key = row["o_orderstatus"]
            self.n += 1
            self.cents += row["cents"]

        def terminate(self):
            if self.key is not None:
                yield (self.key, self.n, self.cents)

    spark.udtf.register("rg_partition_rollup", PartitionRollup)
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 20 == 0)
    o.select(
        "o_orderstatus",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents"),
    ).createOrReplaceTempView("rg_udtf_src")
    return spark.sql(
        "SELECT * FROM rg_partition_rollup"
        "(TABLE(rg_udtf_src) PARTITION BY o_orderstatus)"
    )
