"""Composed analytic queries (TPC-H-shaped) + statistical aggregates.

These exercise the engine's operators in combination — multi-way
joins with selective filters, grouped revenue, top-k, correlated
scalar subqueries, pivots — the shapes a user of the reference's data
would actually run against the result store.

Scale notes: every join key is an equi-key (AQE picks broadcast for
the dim sides); revenue sums run in exact DECIMAL; top-k is
TakeOrdered (no global sort). The correlated subquery is expressed as
a window average, which Spark executes with one shuffle instead of a
per-row subquery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import dround
from ..sources import load_table
from .registry import query

_REV = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"


def _revenue():
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )


# --------------------------------------------------------------------------
# TPC-H Q3 shape: shipping priority
# --------------------------------------------------------------------------
@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT o.o_orderkey,
           CAST(sum({_REV}) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1999-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1999-03-15 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderkey ASC
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1999-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1999-03-15 00:00:00").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


# --------------------------------------------------------------------------
# TPC-H Q5 shape: local supplier volume (6-way join)
# --------------------------------------------------------------------------
@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name, CAST(sum({_REV}) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


# --------------------------------------------------------------------------
# TPC-H Q10 shape: returned-item revenue per customer (top 20)
# --------------------------------------------------------------------------
@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           CAST(sum({_REV}) AS DOUBLE) AS revenue,
           n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey ASC
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "n_name")
    )


# --------------------------------------------------------------------------
# Correlated scalar subquery: parts priced above their type's average
# (decorrelated to a window average — one shuffle, no per-row subquery)
# --------------------------------------------------------------------------
@query(
    "subquery_above_avg",
    oracle="""
    SELECT p_partkey, p_name, p_type, p_retailprice
    FROM part p
    WHERE p_retailprice > (SELECT avg(p2.p_retailprice)
                           FROM part p2 WHERE p2.p_type = p.p_type)
    """,
)
def subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_type")
    return (
        p.withColumn("type_avg", F.avg("p_retailprice").over(w))
        .filter(F.col("p_retailprice") > F.col("type_avg"))
        .select("p_partkey", "p_name", "p_type", "p_retailprice")
    )


# --------------------------------------------------------------------------
# Pivot: per-user event-type matrix
# --------------------------------------------------------------------------
_EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


@query(
    "pivot_event_matrix",
    oracle="""
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click')    AS click,
           count(*) FILTER (WHERE event_type = 'view')     AS view,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup')   AS signup,
           count(*) FILTER (WHERE event_type = 'error')    AS error
    FROM events
    GROUP BY user_id
    """,
)
def pivot_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    out = (
        e.groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves NULL for absent combinations; FILTER counts give 0
    return out.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _EVENT_TYPES],
    )


# --------------------------------------------------------------------------
# Statistical aggregates: stddev/variance/correlation/covariance
# --------------------------------------------------------------------------
@query(
    "agg_statistics",
    oracle="""
    SELECT l_returnflag,
           floor(stddev_samp(l_extendedprice) * 10000 + 0.5) / 10000 AS price_stddev,
           floor(var_samp(l_quantity) * 10000 + 0.5) / 10000         AS qty_var,
           floor(corr(l_extendedprice, l_quantity) * 1000000 + 0.5) / 1000000 AS price_qty_corr,
           floor(covar_samp(l_extendedprice, l_discount) * 10000 + 0.5) / 10000 AS price_disc_covar,
           min(l_extendedprice) AS min_price,
           max(l_extendedprice) AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        dround(F.stddev_samp("l_extendedprice"), 4).alias("price_stddev"),
        dround(F.var_samp("l_quantity"), 4).alias("qty_var"),
        dround(F.corr("l_extendedprice", "l_quantity"), 6).alias("price_qty_corr"),
        dround(F.covar_samp("l_extendedprice", "l_discount"), 4).alias("price_disc_covar"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


# --------------------------------------------------------------------------
# Percentiles (exact, interpolated)
# --------------------------------------------------------------------------
@query(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           floor(quantile_cont(l_extendedprice, 0.5) * 10000 + 0.5) / 10000 AS median_price,
           floor(quantile_cont(l_extendedprice, 0.9) * 10000 + 0.5) / 10000 AS p90_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        dround(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("median_price"),
        dround(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90_price"),
    )
