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

from ..functions.rounding import dround, sql_dround
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


# --------------------------------------------------------------------------
# TPC-H Q7 shape: bilateral nation trade volume by ship year
# --------------------------------------------------------------------------
@query(
    "q7_nation_trade_volume",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(sum(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l.l_shipdate) AS l_year,
             {_REV} AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: the two nation dims broadcast; the OR-of-pairs
    predicate evaluates after both (cheap, bounded), so the only big
    shuffles are the lineitem⋈orders⋈customer equi-joins Catalyst
    already reorders by size."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


# --------------------------------------------------------------------------
# TPC-H Q8 shape: market share of one nation within a part type
# --------------------------------------------------------------------------
@query(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           floor(CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS mkt_share
    FROM (
      SELECT year(o.o_orderdate) AS o_year,
             {_REV} AS volume,
             n1.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      WHERE p.p_type = 'PROMO'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: conditional-sum market share. DECIMAL volume keeps the
    numerator/denominator exact under any partial-agg order; the final
    ratio is rounded at the boundary."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    n = load_table(spark, sf_dir, "nation")
    vol = _revenue()
    return (
        p.join(li, p.p_partkey == li.l_partkey)
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            dround(
                (
                    F.sum(F.when(F.col("n_name") == "NATION_3", vol).otherwise(F.lit(0)))
                    / F.sum(vol)
                ).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q4 shape: order-priority count over an EXISTS semi-join
# --------------------------------------------------------------------------
@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: EXISTS decorrelates to a left-semi join on the order
    key (one hash shuffle; the non-equi shipdate predicate rides along
    as the join condition's residual)."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# --------------------------------------------------------------------------
# TPC-H Q12 shape: two-class CASE WHEN counting per group
# --------------------------------------------------------------------------
@query(
    "q12_priority_class",
    oracle="""
    SELECT l.l_linestatus,
           count(*) FILTER (WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH'))
             AS high_count,
           count(*) FILTER (WHERE o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
             AS low_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_linestatus
    """,
)
def q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: conditional two-class counting after an equi-join;
    the date filter prunes the fact side before the shuffle."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_count"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q14 shape: promo revenue share (conditional ratio)
# --------------------------------------------------------------------------
@query(
    "q14_promo_revenue",
    oracle=f"""
    SELECT floor(100.0 * sum(CASE WHEN p.p_type = 'PROMO' THEN {_REV} ELSE 0 END)
                 / sum({_REV}) * 1000000 + 0.5) / 1000000 AS promo_share_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-08-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: global conditional ratio. Exact DECIMAL numerator and
    denominator, one rounding at the output boundary; the brand-pruned
    part side is left to AQE (it scales with SF — no forced hint)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-08-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    vol = _revenue()
    promo = F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            dround(
                (F.lit(100.0) * F.sum(promo) / F.sum(vol)).cast("double"), 6
            ).alias("promo_share_pct")
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q19 shape: OR-of-ANDs bracket predicate (pushdown stress)
# --------------------------------------------------------------------------
@query(
    "q19_bracket_or",
    oracle=f"""
    SELECT CAST(sum({_REV}) AS DOUBLE) AS revenue, count(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 35)
       OR (p.p_brand = 'Brand#33' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 50)
    """,
)
def q19_bracket_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: disjunction of conjunctive brackets across both join
    sides. Catalyst extracts the common single-side conjuncts (brand OR
    brand OR brand; quantity envelope) below the join; the cross-side
    residual evaluates post-join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(p, p.p_partkey == li.l_partkey)
    qty = F.col("l_quantity")
    bracket = (
        ((F.col("p_brand") == "Brand#11") & F.col("p_size").between(1, 15) & qty.between(1, 20))
        | ((F.col("p_brand") == "Brand#22") & F.col("p_size").between(10, 30) & qty.between(10, 35))
        | ((F.col("p_brand") == "Brand#33") & F.col("p_size").between(20, 50) & qty.between(20, 50))
    )
    return j.filter(bracket).agg(
        F.sum(_revenue()).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# --------------------------------------------------------------------------
# Event funnel: view -> click -> purchase conversion per user
# --------------------------------------------------------------------------
@query(
    "funnel_conversion",
    oracle="""
    WITH stage AS (
      SELECT user_id,
             min(ts) FILTER (WHERE event_type = 'view')     AS t_view,
             min(ts) FILTER (WHERE event_type = 'click')    AS t_click,
             min(ts) FILTER (WHERE event_type = 'purchase') AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT count(*) AS n_users,
           count(*) FILTER (WHERE t_view IS NOT NULL) AS viewed,
           count(*) FILTER (WHERE t_view IS NOT NULL AND t_click > t_view)
             AS clicked_after_view,
           count(*) FILTER (WHERE t_view IS NOT NULL AND t_click > t_view
                            AND t_purchase > t_click) AS purchased_after_click
    FROM stage
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel conversion: first-touch timestamps per stage in
    ONE pass (conditional min aggregation), then stage predicates —
    no per-stage self-joins, so the event table is scanned once and
    shuffled once on user_id."""
    e = load_table(spark, sf_dir, "events")

    def first_ts(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    stage = e.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    return stage.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(viewed.cast("long")).alias("viewed"),
        F.sum(clicked.cast("long")).alias("clicked_after_view"),
        F.sum(purchased.cast("long")).alias("purchased_after_click"),
    )


# --------------------------------------------------------------------------
# Weekly retention cohorts (cohort week x activity-week offset)
# --------------------------------------------------------------------------
@query(
    "retention_cohorts",
    oracle="""
    WITH cohort AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY user_id
    )
    SELECT c.cohort_week,
           CAST(datediff('week', c.cohort_week,
                         date_trunc('week', e.ts)) AS BIGINT) AS week_offset,
           count(DISTINCT e.user_id) AS active_users
    FROM events e JOIN cohort c ON e.user_id = c.user_id
    GROUP BY 1, 2
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort-retention matrix. The cohort table is one row per
    user (broadcastable at dim scale; AQE decides), the offset is pure
    date arithmetic, and the matrix is a single distinct-count
    aggregation — no per-week self-joins."""
    e = load_table(spark, sf_dir, "events")
    cohort = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    joined = e.join(cohort, "user_id")
    offset = (
        F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week")) / 7
    ).cast("bigint")
    return (
        joined.groupBy("cohort_week", offset.alias("week_offset"))
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


# --------------------------------------------------------------------------
# Per-group z-score outliers (data-quality sweep)
# --------------------------------------------------------------------------
@query(
    "outlier_zscore",
    oracle="""
    WITH stats AS (
      SELECT event_type,
             avg(value) AS mu,
             stddev_pop(value) AS sigma
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           floor((e.value - s.mu) / s.sigma * 10000 + 0.5) / 10000 AS zscore
    FROM events e JOIN stats s ON e.event_type = s.event_type
    WHERE abs((e.value - s.mu) / s.sigma) > 2.5
    """,
)
def outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outliers. Group stats are a tiny aggregate
    joined back (AQE broadcasts); the z-score and threshold evaluate
    in one codegen stage — the pattern for distributed data-quality
    sweeps over any 100 TB fact table."""
    e = load_table(spark, sf_dir, "events")
    stats = e.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_pop("value").alias("sigma")
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        e.join(stats, "event_type")
        .filter(F.abs(z) > 2.5)
        .select("event_id", "event_type", dround(z, 4).alias("zscore"))
    )


# ==========================================================================
# Round-2 closure of the TPC-H query-shape suite (Q2/Q6/Q9/Q11/Q13/Q15/
# Q16/Q17/Q18/Q20/Q21/Q22).  The testdata star schema has no partsupp
# table and no comment/phone/commitdate columns, so the queries that
# need them are ADAPTED: the (part, supplier) relationship is derived
# from lineitem, and text filters target the columns that exist.  The
# join/subquery SHAPE of each original — correlated scalar subqueries,
# NOT IN null-aware anti joins, HAVING over grouped sums, scalar
# thresholds against global aggregates — is preserved, because the
# shapes are what exercise the engine.
#
# Scalar subqueries join back on a literal key instead of crossJoin:
# the 1-row aggregate broadcasts into a BroadcastHashJoin, which keeps
# every plan inside the no-BNLJ/no-Cartesian anti-pattern sweep.
# ==========================================================================


def _with_scalar(big: DataFrame, scalar: DataFrame) -> DataFrame:
    """Attach a 1-row aggregate to every row of ``big`` as a broadcast
    cross-join.

    This IS the scale-correct plan for a scalar subquery: the 1-row
    side broadcasts and the attach is map-side work with zero shuffle
    of ``big``. (A fabricated constant equi-key does not survive the
    optimizer — Catalyst folds it away and the plan degenerates to the
    same BroadcastNestedLoopJoin, so we write the intent explicitly.)
    Queries built on this helper carry a justification entry in the
    anti-pattern sweep's skip list, same as text_tfidf / text_bm25's
    1-row corpus-stats broadcasts. When an equality predicate against
    the scalar exists (q15's ``total_rev = max_rev``), Catalyst
    promotes it to the equi-key and the join becomes a
    BroadcastHashJoin on its own."""
    return big.crossJoin(F.broadcast(scalar))


# --------------------------------------------------------------------------
# TPC-H Q6 shape: forecast revenue change (pure filter + global agg)
# --------------------------------------------------------------------------
@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: the canonical scan-heavy filter+agg. Every predicate reaches
    the parquet scan (PushedFilters) and the sum is exact DECIMAL —
    at 100 TB this query is pure I/O + codegen, zero shuffle beyond
    the final 1-row combine."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_discount").cast("decimal(4,2)")
            ).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q2 shape: min-cost supplier per part (correlated min subquery)
# --------------------------------------------------------------------------
@query(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH costs AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY 1, 2
    )
    SELECT s.s_acctbal, s.s_name, n.n_name AS nation, p.p_partkey, p.p_type,
           {sql_dround('c.unit_cost', 4)} AS unit_cost
    FROM costs c
    JOIN part p ON p.p_partkey = c.partkey
    JOIN supplier s ON s.s_suppkey = c.suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_size BETWEEN 10 AND 20 AND p.p_type = 'ECONOMY'
      AND c.unit_cost = (SELECT min(c2.unit_cost) FROM costs c2
                         WHERE c2.partkey = c.partkey)
    ORDER BY s.s_acctbal DESC, nation, s.s_name, p.p_partkey
    LIMIT 20
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape, partsupp derived from lineitem: per-(part, supplier)
    unit cost, keep suppliers matching the per-part minimum (the
    correlated subquery collapses to one groupBy + an equi-join back —
    one shuffle on partkey, dims broadcast)."""
    li = load_table(spark, sf_dir, "lineitem")
    costs = li.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    best = costs.groupBy("partkey").agg(F.min("unit_cost").alias("best_cost"))
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "ECONOMY")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        costs.join(best, "partkey")
        .filter(F.col("unit_cost") == F.col("best_cost"))
        .join(p, F.col("p_partkey") == F.col("partkey"))
        .join(s, F.col("s_suppkey") == F.col("suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            "s_acctbal", "s_name", F.col("n_name").alias("nation"),
            "p_partkey", "p_type", dround(F.col("unit_cost"), 4).alias("unit_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "nation", "s_name", "p_partkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# TPC-H Q9 shape: product-line profit by nation and year
# --------------------------------------------------------------------------
@query(
    "q9_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation, year(l.l_shipdate) AS o_year,
           CAST(sum({_REV}) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY 1, 2
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape without ps_supplycost: revenue-profit per supplier
    nation per ship year for one product line. part filters before the
    join; no forced broadcast — part/supplier scale with SF, so the
    planner/AQE picks broadcast only while they fit. The fact table
    shuffles once on the group keys."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(_revenue()).cast("double").alias("profit"))
    )


# --------------------------------------------------------------------------
# TPC-H Q11 shape: important parts (HAVING vs a global scalar)
# --------------------------------------------------------------------------
@query(
    "q11_important_parts",
    oracle=f"""
    WITH pv AS (
      SELECT l_partkey, sum({_REV}) AS value_dec
      FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(value_dec) AS DOUBLE) * 0.001 AS thr FROM pv)
    SELECT pv.l_partkey, CAST(pv.value_dec AS DOUBLE) AS part_value
    FROM pv, tot
    WHERE CAST(pv.value_dec AS DOUBLE) > tot.thr
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: per-part value vs a fraction-of-total threshold. The
    threshold is a 1-row re-aggregate of the grouped frame joined back
    on a literal key (BroadcastHashJoin) — the fact table aggregates
    once; exact DECIMAL sums, one double cast at the compare."""
    li = load_table(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(F.sum(_revenue()).alias("value_dec"))
    tot = pv.agg((F.sum("value_dec").cast("double") * 0.001).alias("thr"))
    return (
        _with_scalar(pv, tot)
        .filter(F.col("value_dec").cast("double") > F.col("thr"))
        .select("l_partkey", F.col("value_dec").cast("double").alias("part_value"))
    )


# --------------------------------------------------------------------------
# TPC-H Q13 shape: customer order-count distribution
# --------------------------------------------------------------------------
@query(
    "q13_order_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY 1
    )
    SELECT c_count, count(*) AS custdist
    FROM c_orders GROUP BY 1
    """,
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: double aggregation over an outer join (the filter rides in
    the join condition, NOT a post-filter — left rows must survive).
    count(col) counts only matched rows, mirroring SQL semantics."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --------------------------------------------------------------------------
# TPC-H Q15 shape: top supplier (equality against a scalar max)
# --------------------------------------------------------------------------
@query(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey, sum({_REV}) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_rev
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
    ORDER BY s.s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: revenue view + scalar max. DECIMAL equality is exact, so
    the argmax-by-join is deterministic cross-engine; the 1-row max
    broadcasts back onto the grouped frame."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(_revenue()).alias("total_rev"))
    mx = rev.agg(F.max("total_rev").alias("max_rev"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        _with_scalar(rev, mx)
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_rev"))
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# TPC-H Q16 shape: supplier variety with a NOT IN (null-aware anti)
# --------------------------------------------------------------------------
@query(
    "q16_part_supplier_variety",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#11'
      AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def q16_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape, partsupp derived from lineitem. The NOT IN list
    (complaint suppliers ≈ negative balance) is non-null, so it
    decorrelates to a left-anti join; part/supplier sides carry no
    forced hints (they scale with SF), the distinct count is the only
    wide shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#11")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# TPC-H Q17 shape: small-quantity revenue (correlated avg per part)
# --------------------------------------------------------------------------
@query(
    "q17_small_qty_revenue",
    oracle="""
    WITH pa AS (
      SELECT l_partkey,
             0.2 * (CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                    / count(*)) AS qty_thr
      FROM lineitem GROUP BY 1
    )
    SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
             AS avg_yearly,
           count(*) AS n_lines
    FROM lineitem l
    JOIN pa ON pa.l_partkey = l.l_partkey
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23' AND l.l_quantity < pa.qty_thr
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: the correlated per-part average decorrelates to one
    groupBy joined back on partkey. The threshold is exact-DECIMAL
    sum / exact count, cast to double identically on both engines, so
    the boundary compare is bit-deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = li.groupBy("l_partkey").agg(
        (
            F.lit(0.2)
            * (
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            )
        ).alias("qty_thr")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    return (
        li.join(pa.withColumnRenamed("l_partkey", "pa_partkey"),
                F.col("pa_partkey") == F.col("l_partkey"))
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thr"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double") / 7.0)
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q18 shape: large-volume orders (HAVING over grouped sum)
# --------------------------------------------------------------------------
@query(
    "q18_large_volume",
    oracle="""
    WITH big AS (
      SELECT l_orderkey,
             sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
      FROM lineitem GROUP BY 1
      HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, CAST(b.sum_qty AS DOUBLE) AS sum_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: HAVING filters the grouped frame BEFORE the joins, so only
    qualifying orderkeys (rare) reach the join — at scale the big
    aggregate output is tiny and AQE broadcasts it."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty_dec"))
        .filter(F.col("sum_qty_dec") > 150)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        big.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
            F.col("sum_qty_dec").cast("double").alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# TPC-H Q20 shape: semi-join chain (suppliers of heavily-shipped parts)
# --------------------------------------------------------------------------
@query(
    "q20_promotion_suppliers",
    oracle="""
    SELECT s.s_name, n.n_name AS nation
    FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (
      SELECT sp.l_suppkey
      FROM (SELECT l_suppkey, l_partkey,
                   sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY 1, 2) sp
      JOIN part p ON p.p_partkey = sp.l_partkey
      WHERE p.p_name LIKE 'red%' AND sp.qty > 50
    )
    ORDER BY s.s_name
    """,
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape, partsupp availability derived from shipped volume:
    IN decorrelates to a left-semi join; the inner aggregate prunes on
    the part name before grouping (no forced hint — part scales with
    SF)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    sp = (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(sp, s.s_suppkey == sp.l_suppkey, "left_semi")
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_name", F.col("n_name").alias("nation"))
        .orderBy("s_name")
    )


# --------------------------------------------------------------------------
# TPC-H Q21 shape: suppliers last to ship on multi-supplier orders
# --------------------------------------------------------------------------
@query(
    "q21_late_shippers",
    oracle="""
    WITH per AS (
      SELECT l_orderkey, l_suppkey, max(l_shipdate) AS supp_last
      FROM lineitem GROUP BY 1, 2
    ),
    ord AS (
      SELECT l_orderkey, max(l_shipdate) AS order_last,
             count(DISTINCT l_suppkey) AS n_suppliers
      FROM lineitem GROUP BY 1
    )
    SELECT s.s_name, count(*) AS numwait
    FROM per
    JOIN ord USING (l_orderkey)
    JOIN supplier s ON s.s_suppkey = per.l_suppkey
    WHERE ord.n_suppliers >= 2 AND per.supp_last = ord.order_last
    GROUP BY 1
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def q21_late_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape without commit/receipt dates: the EXISTS (another
    supplier) / latest-shipper pair is expressed as two aggregates of
    the SAME grouped scan joined on orderkey — Spark reuses the
    shuffle (both group on l_orderkey), where the textbook
    EXISTS/NOT-EXISTS would scan lineitem three times."""
    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("supp_last")
    )
    ord_ = li.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("order_last"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        per.join(ord_, "l_orderkey")
        .filter((F.col("n_suppliers") >= 2) & (F.col("supp_last") == F.col("order_last")))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


# --------------------------------------------------------------------------
# TPC-H Q22 shape: idle customers above average balance (anti + scalar)
# --------------------------------------------------------------------------
@query(
    "q22_idle_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
               AS bal_thr
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_mktsegment AS segment, count(*) AS numcust,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.bal_thr
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY 1
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22: positive-balance average (exact DECIMAL sum / count — the
    double threshold is bit-identical cross-engine), NOT EXISTS as a
    left-anti join on orders, grouped by segment."""
    c = load_table(spark, sf_dir, "customer")
    thr = c.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("bal_thr")
    )
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        _with_scalar(c, thr)
        .filter(F.col("c_acctbal") > F.col("bal_thr"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            .alias("totacctbal"),
        )
    )


# --------------------------------------------------------------------------
# Pareto frontier (skyline): non-dominated customers on (spend, orders)
# --------------------------------------------------------------------------
@query(
    "skyline_pareto",
    oracle="""
    WITH pts AS (
      SELECT o_custkey AS custkey,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_spend,
             count(*) AS n_orders
      FROM orders GROUP BY 1
    )
    SELECT p.custkey, p.total_spend, p.n_orders
    FROM pts p
    WHERE NOT EXISTS (
      SELECT 1 FROM pts q
      WHERE (q.total_spend >= p.total_spend AND q.n_orders > p.n_orders)
         OR (q.total_spend > p.total_spend AND q.n_orders >= p.n_orders)
    )
    """,
)
def skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto frontier: customers not dominated on (total
    spend, order count). The oracle states the O(n²) NOT EXISTS; the
    engine runs the two-phase prune: (1) a LOCAL frontier per spend
    bucket — any point dominated within its bucket is dominated
    globally, so survivors are a superset of the answer and the heavy
    data never sees a global order; (2) the exact windowed frontier
    (max-y-over-strictly-greater-x) on the tiny survivor set. Frontier
    rule: keep iff y == max(y) among equal x AND y > max(y) among
    strictly greater x."""
    o = load_table(spark, sf_dir, "orders")
    pts = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_spend"),
        F.count(F.lit(1)).alias("n_orders"),
    )

    def frontier(df: DataFrame, *partition: str) -> DataFrame:
        # Per distinct x: the best y, and the best y among STRICTLY
        # greater x (rows-frame over one-row-per-x, so "preceding" is
        # exactly x' > x — a RANGE frame on the continuous spend axis
        # could not express strictness). Keep a point iff its y is the
        # best at its x AND beats every greater-x best.
        grp = df.groupBy(*partition, "total_spend").agg(
            F.max("n_orders").alias("_gy")
        )
        w = (
            Window.partitionBy(*partition) if partition else Window.partitionBy()
        ).orderBy(F.col("total_spend").desc()).rowsBetween(
            Window.unboundedPreceding, -1
        )
        keep_x = (
            grp.withColumn("_m", F.max("_gy").over(w))
            .filter(F.col("_m").isNull() | (F.col("_gy") > F.col("_m")))
            .drop("_m")
        )
        return (
            df.join(keep_x, [*partition, "total_spend"])
            .filter(F.col("n_orders") == F.col("_gy"))
            .drop("_gy")
        )

    # Phase 1: distributed bucket-local frontiers (coarse spend bands).
    banded = pts.withColumn(
        "_band", F.floor(F.col("total_spend") / 200000.0)
    )
    survivors = frontier(banded, "_band").drop("_band")
    # Phase 2: exact frontier over the (tiny) survivor set.
    return frontier(survivors)


# --------------------------------------------------------------------------
# ANSI linear-regression aggregates (regr_*) — per-group OLS fit
# --------------------------------------------------------------------------
@query(
    "agg_linear_regression",
    oracle="""
    SELECT event_type,
           CAST(regr_count(value, hr) AS BIGINT) AS n,
           floor(regr_slope(value, hr)     * 1000000 + 0.5) / 1000000 AS slope,
           floor(regr_intercept(value, hr) * 1000000 + 0.5) / 1000000 AS intercept,
           floor(regr_r2(value, hr)        * 1000000 + 0.5) / 1000000 AS r2
    FROM (SELECT event_type, CAST(hour(ts) AS DOUBLE) AS hr,
                 CAST(value AS DOUBLE) AS value
          FROM events)
    GROUP BY event_type
    """,
)
def agg_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group simple OLS (value ~ hour-of-day) via the ANSI regr_*
    aggregates — the trend-fit both engines implement natively, so the
    fit itself is cross-engine value-checked (6 dp; the moment sums
    are partial-aggregable, one shuffle carrying 5 doubles per group —
    the distributed-OLS shape that scales to any row count). The
    grouped-map Arrow path (operators/ml.py) remains for
    per-group fits Spark lacks built-ins for (PCA)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.hour("ts").cast("double").alias("hr"),
        F.col("value").cast("double").alias("value"),
    )
    g = ev.groupBy("event_type").agg(
        F.expr("regr_count(value, hr)").cast("bigint").alias("n"),
        dround(F.expr("regr_slope(value, hr)"), 6).alias("slope"),
        dround(F.expr("regr_intercept(value, hr)"), 6).alias("intercept"),
        dround(F.expr("regr_r2(value, hr)"), 6).alias("r2"),
    )
    return g


# --------------------------------------------------------------------------
# Market-basket affinity: co-occurring part pairs with support + lift
# --------------------------------------------------------------------------
@query(
    "market_basket_pairs",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n_orders AS (SELECT count(DISTINCT l_orderkey) AS n FROM lineitem),
    part_freq AS (
      SELECT l_partkey, count(*) AS f FROM items GROUP BY l_partkey
    ),
    capped AS (
      SELECT l_orderkey FROM items
      GROUP BY l_orderkey HAVING count(*) <= 50
    ),
    bounded AS (
      SELECT i.l_orderkey, i.l_partkey FROM items i
      JOIN capped c ON c.l_orderkey = i.l_orderkey
    ),
    pair AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_co
      FROM bounded a JOIN bounded b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
      HAVING count(*) >= 2
    )
    SELECT part_a, part_b, n_co,
           floor(n_co * 1.0 * (SELECT n FROM n_orders) / (fa.f * fb.f)
                 * 1000000 + 0.5) / 1000000 AS lift
    FROM pair
    JOIN part_freq fa ON fa.l_partkey = part_a
    JOIN part_freq fb ON fb.l_partkey = part_b
    """,
)
def market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise co-occurrence mining (market-basket affinity): part
    pairs appearing in the same order, with lift = P(a,b)/(P(a)P(b)).

    The pair generation is a self-equi-join on the basket key
    (l_orderkey) with an id-ordering filter — fan-out per basket is
    C(k,2) where k is basket size. A BASKET-SIZE CAP (≤50 distinct
    items, the shingle-df-cap pattern) drops pathological baskets
    BEFORE the self-join, so a single hot basket of k items can never
    fan out C(k,2): worst-case pair work is bounded at 1225 pairs per
    basket regardless of corpus size. TPC-H baskets are ≤7 lines so
    the cap is semantics-neutral here, but it is implemented (and
    oracle-mirrored), not just documented — at 100 TB it is the
    difference between a bounded shuffle and an explosion. Support
    counts and lift denominators still use the UNCAPPED corpus (the
    cap only bounds pair generation). A min-support HAVING (n_co ≥ 2)
    prunes the long tail before the frequency joins; lift is one
    double ratio of exact integers, dround(6)-pinned."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct().localCheckpoint()
    n_orders = items.select("l_orderkey").distinct().count()
    part_freq = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("f"))
    capped = (
        items.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("__bsz"))
        .filter(F.col("__bsz") <= 50)
        .select("l_orderkey")
    )
    bounded = items.join(capped, "l_orderkey")
    a = bounded.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = bounded.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    pair = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_co"))
        .filter(F.col("n_co") >= 2)
    )
    fa = part_freq.select(F.col("l_partkey").alias("part_a"), F.col("f").alias("fa"))
    fb = part_freq.select(F.col("l_partkey").alias("part_b"), F.col("f").alias("fb"))
    return (
        pair.join(fa, "part_a")
        .join(fb, "part_b")
        .select(
            "part_a", "part_b", "n_co",
            dround(
                F.col("n_co") * F.lit(1.0) * F.lit(n_orders)
                / (F.col("fa") * F.col("fb")),
                6,
            ).alias("lift"),
        )
    )


# --------------------------------------------------------------------------
# Robust outlier flagging: median absolute deviation per group
# --------------------------------------------------------------------------
@query(
    "anomaly_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, median(value) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, abs(e.value - m.med) AS adev, m.med
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, any_value(med) AS med, median(adev) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT e.event_type,
           count(*) AS n,
           floor(m.med * 1000000 + 0.5) / 1000000 AS med,
           floor(m.mad * 1000000 + 0.5) / 1000000 AS mad,
           CAST(sum(CASE WHEN abs(e.value - m.med) > 3 * 1.4826 * m.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM events e JOIN mad m USING (event_type)
    GROUP BY e.event_type, m.med, m.mad
    """,
)
def anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier detection via median absolute
    deviation — the outlier flag that (unlike `outlier_zscore`) does
    not let the outliers themselves inflate the threshold. Two grouped
    exact medians (percentile(0.5): single shuffle each, sort within
    group) and one re-join to flag |x − med| > 3·1.4826·MAD.

    At 100 TB the exact median becomes approx_percentile (mergeable
    sketch, no per-group sort) — `agg_approx_percentile` pins that
    path; this key pins the exact spelling both engines agree on.
    Both engines interpolate even-count medians identically on
    doubles; outputs dround(6)-pinned."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(med, "event_type").select(
        "event_type", "med", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("event_type").agg(
        F.first("med").alias("med"),
        F.expr("percentile(adev, 0.5)").alias("mad"),
    )
    return (
        ev.join(mad, "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(
                    F.abs(F.col("value") - F.col("med"))
                    > F.lit(3) * F.lit(1.4826) * F.col("mad"),
                    1,
                ).otherwise(0)
            ).cast("bigint").alias("n_outliers"),
        )
        .select(
            "event_type", "n",
            dround(F.col("med"), 6).alias("med"),
            dround(F.col("mad"), 6).alias("mad"),
            "n_outliers",
        )
    )


# --------------------------------------------------------------------------
# RFM customer segmentation (recency / frequency / monetary quintiles)
# --------------------------------------------------------------------------
@query(
    "rfm_segmentation",
    oracle="""
    WITH mx AS (SELECT max(o_orderdate) AS mxd FROM orders),
    rfm AS (
      SELECT o_custkey,
             date_diff('day', max(o_orderdate), (SELECT mxd FROM mx))
               AS recency_days,
             count(*) AS frequency,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS monetary
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT o_custkey,
             ntile(5) OVER (ORDER BY recency_days ASC,  o_custkey) AS r_score,
             ntile(5) OVER (ORDER BY frequency   DESC, o_custkey) AS f_score,
             ntile(5) OVER (ORDER BY monetary    DESC, o_custkey) AS m_score
      FROM rfm
    )
    SELECT r_score, f_score, m_score,
           count(*) AS n_customers
    FROM scored
    GROUP BY r_score, f_score, m_score
    """,
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer recency (days since last order),
    frequency (order count), monetary (exact-DECIMAL spend), scored
    into quintiles and rolled up to segment populations.

    The per-customer rollup is one partial-aggregable shuffle. The
    three ntile windows are global sorts over the CUSTOMER dimension
    (not the fact table) — at 100 TB that dimension is ~10⁷–10⁸ rows,
    still sortable; the truly-massive variant swaps ntile for
    approx_percentile quintile cut points + a map-side CASE, the same
    exact→approx trade `feature_quantile_bin` documents. Ties are
    broken by o_custkey so both engines assign identical quintiles."""
    o = load_table(spark, sf_dir, "orders")
    mxd = o.agg(F.max("o_orderdate").alias("m")).collect()[0].m
    rfm = o.groupBy("o_custkey").agg(
        F.datediff(F.lit(mxd), F.max("o_orderdate")).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("monetary"),
    )
    scored = rfm.select(
        "o_custkey",
        F.ntile(5).over(
            Window.orderBy(F.col("recency_days").asc(), F.col("o_custkey"))
        ).alias("r_score"),
        F.ntile(5).over(
            Window.orderBy(F.col("frequency").desc(), F.col("o_custkey"))
        ).alias("f_score"),
        F.ntile(5).over(
            Window.orderBy(F.col("monetary").desc(), F.col("o_custkey"))
        ).alias("m_score"),
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


# --------------------------------------------------------------------------
# CEP-lite: event-sequence pattern detection over per-user timelines
# --------------------------------------------------------------------------
@query(
    "pattern_detect_sequence",
    oracle="""
    WITH tl AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS timeline
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           length(timeline) AS n_events,
           len(regexp_extract_all(timeline, 'vcp')) AS n_vcp_strict,
           len(regexp_extract_all(timeline, 'v[ces]*p')) AS n_conversions
    FROM tl
    """,
)
def pattern_detect_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-lite: per-user event timelines compressed to a
    symbol string (one char per event, (ts, event_id)-ordered), then
    sequence patterns counted by regex — strict view→click→purchase
    adjacency and view→(non-view, non-purchase)*→purchase conversion
    runs. Complements `funnel_conversion` (which asks IF the stages
    ever happen in order) by counting occurrences with adjacency /
    exclusion constraints — the CEP shapes a dedicated pattern
    operator would express.

    One shuffle (groupBy user); the sort is per-user inside
    array_sort, not a global order; regex runs JVM-side per row.
    Both engines use leftmost non-overlapping regex scan semantics,
    so the counts are value-identical. At 100 TB the per-key timeline
    is bounded by per-user activity — the same assumption every
    sessionizer here makes; a year-scale timeline would window the
    collect by month first."""
    ev = load_table(spark, sf_dir, "events")
    tl = ev.groupBy("user_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda x: F.substring(x.event_type, 1, 1),
            ),
        ).alias("timeline")
    )
    return tl.select(
        "user_id",
        F.length("timeline").alias("n_events"),
        F.size(F.regexp_extract_all("timeline", F.lit("vcp"), F.lit(0))).alias(
            "n_vcp_strict"
        ),
        F.size(
            F.regexp_extract_all("timeline", F.lit("v[ces]*p"), F.lit(0))
        ).alias("n_conversions"),
    )


@query(
    "pivot_multi_agg",
    oracle="""
    SELECT date_trunc('day', ts) AS day,
           count(*) FILTER (WHERE event_type = 'view')     AS view_n,
           CAST(coalesce(sum(CAST(value AS DECIMAL(18,6)))
                 FILTER (WHERE event_type = 'view'), 0) AS DOUBLE)  AS view_sv,
           count(*) FILTER (WHERE event_type = 'click')    AS click_n,
           CAST(coalesce(sum(CAST(value AS DECIMAL(18,6)))
                 FILTER (WHERE event_type = 'click'), 0) AS DOUBLE) AS click_sv,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase_n,
           CAST(coalesce(sum(CAST(value AS DECIMAL(18,6)))
                 FILTER (WHERE event_type = 'purchase'), 0) AS DOUBLE) AS purchase_sv
    FROM events
    GROUP BY 1
    """,
)
def pivot_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-measure pivot: day × event_type matrix carrying BOTH a
    count and a DECIMAL-exact value sum per cell — the wide activity
    dashboard shape (pivot_event_matrix pivots one measure). Spark's
    groupBy().pivot(values).agg(m1, m2) plans ONE partial-agg pass
    with 2·|types| conditional aggregates — same single shuffle as
    one measure, vs the naive per-measure self-join. Explicit pivot
    values keep the schema static (no discovery scan) — mandatory at
    100 TB where the two-pass schema inference would double the
    read."""
    ev = load_table(spark, sf_dir, "events")
    types = ["view", "click", "purchase"]
    out = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .pivot("event_type", types)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sv"),
        )
    )
    cols = [F.col("day")]
    for t in types:
        cols.append(F.coalesce(F.col(f"{t}_n"), F.lit(0)).alias(f"{t}_n"))
        cols.append(F.coalesce(F.col(f"{t}_sv"), F.lit(0.0)).alias(f"{t}_sv"))
    return out.select(*cols)


@query(
    "eval_regression_metrics",
    oracle="""
    WITH j AS (
      SELECT CAST(l.l_extendedprice AS DECIMAL(18,2)) AS y,
             CAST(CAST(p.p_retailprice AS DECIMAL(12,2))
                  * CAST(l.l_quantity AS DECIMAL(8,2)) AS DECIMAL(18,4)) AS pred
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    d AS (
      SELECT y, CAST(y - pred AS DECIMAL(18,4)) AS err FROM j
    ),
    s AS (
      SELECT count(*) AS n,
             CAST(sum(abs(err)) AS DOUBLE) AS sad,
             -- DECIMAL(19,4) operands force DuckDB onto int128
             -- multiplication (int64 overflows on the largest errors);
             -- values are identical to Spark's DECIMAL(18,4) product
             CAST(sum(CAST(err AS DECIMAL(19,4))
                      * CAST(err AS DECIMAL(19,4))) AS DOUBLE) AS sse,
             CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(CAST(y AS DECIMAL(19,2))
                      * CAST(y AS DECIMAL(19,2))) AS DOUBLE) AS syy
      FROM d
    )
    SELECT n,
           floor(sad / n * 10000 + 0.5) / 10000 AS mae,
           floor(sqrt(sse / n) * 10000 + 0.5) / 10000 AS rmse,
           floor((1 - sse / (syy - sy * sy / n)) * 1000000 + 0.5) / 1000000 AS r2
    FROM s
    """,
)
def eval_regression_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regression-model evaluation in ONE aggregation pass: MAE, RMSE
    and R² of a baseline price model (list price × quantity predicting
    the billed extended price). Every sufficient statistic (Σ|e|, Σe²,
    Σy, Σy²) is an exact-DECIMAL sum — bit-deterministic where naive
    float accumulation is shuffle-order-dependent — and R² comes from
    the algebraic identity SST = Σy² − (Σy)²/n, so no second
    mean-centering pass over the data. The join is the only shuffle
    (dim side broadcastable); the metric math happens on one 1-row
    frame. This is the eval loop a 100 TB feature pipeline runs per
    model candidate: cost = one scan, however many metrics."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    y = F.col("l_extendedprice").cast("decimal(18,2)")
    pred = (
        F.col("p_retailprice").cast("decimal(12,2)")
        * F.col("l_quantity").cast("decimal(8,2)")
    ).cast("decimal(18,4)")
    d = li.join(F.broadcast(p.select("p_partkey", "p_retailprice")),
                li.l_partkey == p.p_partkey).select(
        y.alias("y"), (y - pred).cast("decimal(18,4)").alias("err")
    )
    s = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.abs(F.col("err"))).cast("double").alias("sad"),
        F.sum(F.col("err") * F.col("err")).cast("double").alias("sse"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    n = F.col("n")
    return s.select(
        "n",
        dround(F.col("sad") / n, 4).alias("mae"),
        dround(F.sqrt(F.col("sse") / n), 4).alias("rmse"),
        dround(
            F.lit(1) - F.col("sse") / (F.col("syy") - F.col("sy") * F.col("sy") / n),
            6,
        ).alias("r2"),
    )


# ==========================================================================
# Round-5 analytics batch: inequality / concentration / distribution-audit
# operators. All exact-arithmetic (integer cents, DECIMAL sums, window
# cumsums over pinned total orders) so every value hash-matches DuckDB.
# ==========================================================================


@query(
    "abc_pareto_classification",
    oracle=f"""
    WITH rev AS (
      SELECT l_partkey, sum({_REV}) AS revenue
      FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
      SELECT l_partkey, revenue,
             sum(revenue) OVER (ORDER BY revenue DESC, l_partkey
                                ROWS UNBOUNDED PRECEDING) AS cum,
             sum(revenue) OVER () AS total
      FROM rev
    )
    SELECT CASE WHEN cum * 1.0 / total <= 0.7 THEN 'A'
                WHEN cum * 1.0 / total <= 0.9 THEN 'B'
                ELSE 'C' END AS abc_class,
           count(*) AS n_parts,
           CAST(sum(revenue) AS DOUBLE) AS class_revenue
    FROM ranked GROUP BY 1
    """,
)
def abc_pareto_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto inventory classification: parts ranked by revenue,
    class A = the head covering 70% of cumulative revenue, B to 90%,
    C the tail. Revenue is exact DECIMAL; the cumulative share is a
    window cumsum over the pinned total order (revenue DESC, partkey)
    — sequential within the frame on both engines, so the doubles
    compared at the 0.7/0.9 boundaries are bit-identical. The ranked
    cumsum is a global window: fine at dimension cardinality (parts),
    and at 100 TB the same classes come from a two-pass plan
    (approx-percentile revenue cut points + a map-side CASE, the
    feature_quantile_bin_approx pattern) — the classification
    contract, not the sort, is what this key pins."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(F.sum(_revenue()).alias("revenue"))
    w_cum = (
        Window.orderBy(F.col("revenue").desc(), F.col("l_partkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy()
    ranked = rev.select(
        "revenue",
        F.sum("revenue").over(w_cum).alias("cum"),
        F.sum("revenue").over(w_all).alias("total"),
    )
    share = F.col("cum") * F.lit(1.0) / F.col("total")
    return (
        ranked.select(
            "revenue",
            F.when(share <= 0.7, "A").when(share <= 0.9, "B").otherwise("C").alias(
                "abc_class"
            ),
        )
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("revenue").cast("double").alias("class_revenue"),
        )
    )


@query(
    "gini_coefficient",
    oracle="""
    WITH spend AS (
      SELECT o_custkey,
             CAST(floor(sum(o_totalprice) * 100 + 0.5) AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT cents,
             row_number() OVER (ORDER BY cents ASC, o_custkey ASC) AS i
      FROM spend
    )
    SELECT count(*) AS n_customers,
           CAST(sum(cents) AS DOUBLE) / 100 AS total_spend,
           floor((2.0 * sum(i * cents) - (count(*) + 1) * sum(cents))
                 / (count(*) * sum(cents)) * 1000000 + 0.5) / 1000000 AS gini
    FROM ranked
    """,
)
def gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend — the inequality audit run
    on corpus/source contribution before training-data mixing (a
    0.95-Gini source mix is one crawl domain in disguise). Exact
    integer arithmetic end-to-end: spend folds to integer CENTS, the
    rank-weighted sum Σi·xᵢ and ΣΣx stay BIGINT, and the classic
    closed form G = (2Σi·xᵢ − (n+1)Σx)/(nΣx) divides once into a
    double — no float accumulation anywhere, so both engines produce
    the same bits. The global rank is a window over customer
    cardinality (dimension-sized); at 100 TB rows the same statistic
    comes from a sorted-bucket two-pass (per-bucket partial Σi·xᵢ
    with offset correction), same contract."""
    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.floor(F.sum("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents")
    )
    w = Window.orderBy(F.col("cents").asc(), F.col("o_custkey").asc())
    ranked = spend.select("cents", F.row_number().over(w).alias("i"))
    n = F.count(F.lit(1))
    return ranked.agg(
        n.alias("n_customers"),
        (F.sum("cents").cast("double") / 100).alias("total_spend"),
        dround(
            (
                2.0 * F.sum(F.col("i") * F.col("cents"))
                - (n + 1) * F.sum("cents")
            )
            / (n * F.sum("cents")),
            6,
        ).alias("gini"),
    )


@query(
    "hhi_concentration",
    oracle="""
    WITH spend AS (
      SELECT c.c_nationkey, o.o_custkey,
             CAST(floor(sum(o.o_totalprice) * 100 + 0.5) AS BIGINT) AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY c.c_nationkey, o.o_custkey
    ),
    tot AS (
      SELECT c_nationkey, sum(cents) AS total_cents, count(*) AS n_customers
      FROM spend GROUP BY c_nationkey
    )
    SELECT s.c_nationkey AS nationkey,
           any_value(t.n_customers) AS n_customers,
           floor(sum((s.cents * 1.0 / t.total_cents) ** 2) * 10000
                 * 10000 + 0.5) / 10000 AS hhi
    FROM spend s JOIN tot t ON s.c_nationkey = t.c_nationkey
    GROUP BY s.c_nationkey
    """,
)
def hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration index of customer spend per
    nation (0-10,000 scale): Σ shareᵢ² over exact integer-cent shares
    — the market-concentration audit, and for a data pipeline the
    per-source duplication-concentration check. Two partial-agg
    shuffles (customer spend, nation totals) + one broadcast-sized
    join back; the share-squared sum is a float reduction over exact
    rationals, rounded at 4 dp (reassociation noise ~1e-10, nine
    orders below the band). Scales as a pure groupBy pipeline."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    spend = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey", "o_custkey")
        .agg(F.floor(F.sum("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents"))
    )
    tot = spend.groupBy("c_nationkey").agg(
        F.sum("cents").alias("total_cents"), F.count(F.lit(1)).alias("n_customers")
    )
    share = F.col("cents") * F.lit(1.0) / F.col("total_cents")
    return (
        spend.join(F.broadcast(tot), "c_nationkey")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.any_value(F.col("n_customers")).alias("n_customers"),
            dround(F.sum(share * share) * 10000, 4).alias("hhi"),
        )
    )


@query(
    "benford_first_digit",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS BIGINT) AS digit
      FROM orders WHERE o_totalprice >= 1
    ),
    obs AS (SELECT digit, count(*) AS n_obs FROM d GROUP BY digit),
    tot AS (SELECT sum(n_obs) AS total FROM obs)
    SELECT digit, n_obs,
           floor(n_obs * 1.0 / total * 1000000 + 0.5) / 1000000 AS obs_pct,
           floor(log10(1.0 + 1.0 / digit) * 1000000 + 0.5) / 1000000
             AS benford_pct,
           floor(abs(n_obs * 1.0 / total - log10(1.0 + 1.0 / digit))
                 * 1000000 + 0.5) / 1000000 AS abs_dev
    FROM obs, tot
    """,
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order amounts — the
    classic fabricated-data / synthetic-data detector: natural
    multi-scale amounts put digit d first with probability
    log10(1+1/d); uniform synthetic generators (like TPC-H's! —
    expect large abs_dev here) do not. The first digit is extracted
    through exact integer/string ops (floor → BIGINT → first char),
    NOT floor(log10(x)) whose last-ulp differences could flip a digit
    cross-engine at exact powers of ten. One partial-agg groupBy over
    9 groups + a 1-row total broadcast: scan-bound at any scale."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digit = F.substring(
        F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
    ).cast("bigint")
    obs = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n_obs")
    )
    tot = obs.agg(F.sum("n_obs").alias("total")).withColumn("__k", F.lit(1))
    pct = F.col("n_obs") * F.lit(1.0) / F.col("total")
    benford = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return (
        obs.withColumn("__k", F.lit(1))
        .join(F.broadcast(tot), "__k")
        .select(
            "digit",
            "n_obs",
            dround(pct, 6).alias("obs_pct"),
            dround(benford, 6).alias("benford_pct"),
            dround(F.abs(pct - benford), 6).alias("abs_dev"),
        )
    )


@query(
    "anomaly_iqr",
    oracle="""
    WITH q AS (
      SELECT event_type,
             quantile_cont(value, 0.25) AS q1,
             quantile_cont(value, 0.75) AS q3
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           floor(any_value(q.q1) * 1000000 + 0.5) / 1000000 AS q1,
           floor(any_value(q.q3) * 1000000 + 0.5) / 1000000 AS q3,
           count(*) AS n,
           CAST(sum(CASE WHEN e.value < q.q1 - 1.5 * (q.q3 - q.q1)
                           OR e.value > q.q3 + 1.5 * (q.q3 - q.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM events e JOIN q USING (event_type)
    GROUP BY e.event_type
    """,
)
def anomaly_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence (IQR) outlier counting per event type — the robust
    complement to outlier_zscore (mean/σ) and anomaly_mad (median/MAD):
    the three standard univariate detectors are now all registered.
    Exact interpolated quartiles (Spark percentile = DuckDB
    quantile_cont on the same sorted order → identical doubles), a
    9-row fence frame broadcast back over the scan, and a map-side
    fence test. The exact percentile is groupBy-sized; at 100 TB swap
    approx_percentile like data_profile_approx does."""
    e = load_table(spark, sf_dir, "events")
    q = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.25D)").alias("q1"),
        F.expr("percentile(value, 0.75D)").alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    lo, hi = F.col("q1") - 1.5 * iqr, F.col("q3") + 1.5 * iqr
    out = (F.col("value") < lo) | (F.col("value") > hi)
    return (
        e.join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            dround(F.any_value("q1"), 6).alias("q1"),
            dround(F.any_value("q3"), 6).alias("q3"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(out, 1).otherwise(0)).cast("bigint").alias("n_outliers"),
        )
    )


@query(
    "purchase_interarrival_stats",
    oracle="""
    WITH p AS (
      SELECT user_id, ts, event_id,
             lag(ts) OVER (PARTITION BY user_id
                           ORDER BY ts ASC, event_id ASC) AS prev_ts
      FROM events WHERE event_type = 'purchase'
    ),
    gaps AS (
      SELECT CAST(epoch_us(ts) - epoch_us(prev_ts) AS BIGINT) AS gap_us
      FROM p WHERE prev_ts IS NOT NULL
    )
    SELECT count(*) AS n_gaps,
           floor(avg(gap_us / 1000000.0) * 1000000 + 0.5) / 1000000 AS avg_gap_s,
           floor(quantile_cont(gap_us / 1000000.0, 0.5) * 1000000 + 0.5) / 1000000
             AS median_gap_s,
           floor(quantile_cont(gap_us / 1000000.0, 0.9) * 1000000 + 0.5) / 1000000
             AS p90_gap_s,
           floor(max(gap_us / 1000000.0) * 1000000 + 0.5) / 1000000 AS max_gap_s
    FROM gaps
    """,
)
def purchase_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival (recurrence) statistics of purchase events per
    user, aggregated corpus-wide — the arrival-process audit behind
    retention/frequency models and streaming-watermark sizing (p90
    inter-arrival bounds how much lateness a watermark must absorb).
    One window (partition user, order ts,event_id) computes lag;
    gaps are EXACT integer microseconds (epoch micros subtraction, no
    float time math); avg is exact-sum/count; median/p90 are
    interpolated percentiles over integers (identical doubles on both
    engines). Window state is per-user bounded; the final global agg
    is a 1-row reduce."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gaps = (
        e.withColumn("prev_ts", F.lag("ts").over(w))
        .filter(F.col("prev_ts").isNotNull())
        .select(
            (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.col("prev_ts").cast("timestamp"))
            ).alias("gap_us")
        )
    )
    gap_s = F.col("gap_us") / F.lit(1000000.0)
    return gaps.agg(
        F.count(F.lit(1)).alias("n_gaps"),
        dround(F.avg(gap_s), 6).alias("avg_gap_s"),
        dround(F.expr("percentile(gap_us / 1000000.0, 0.5D)"), 6).alias("median_gap_s"),
        dround(F.expr("percentile(gap_us / 1000000.0, 0.9D)"), 6).alias("p90_gap_s"),
        dround(F.max(gap_s), 6).alias("max_gap_s"),
    )


@query(
    "cohort_ltv_cumulative",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('month', min(ts)) AS cohort_month
      FROM events GROUP BY user_id
    ),
    monthly AS (
      SELECT f.cohort_month, e.user_id,
             datediff('month', f.cohort_month, date_trunc('month', e.ts)) AS age_month,
             sum(CAST(e.value AS DECIMAL(18,6))) AS rev
      FROM events e JOIN firsts f USING (user_id)
      WHERE e.event_type = 'purchase'
      GROUP BY 1, 2, 3
    ),
    cohort_age AS (
      SELECT cohort_month, age_month,
             count(DISTINCT user_id) AS n_active_users,
             sum(rev) AS rev
      FROM monthly GROUP BY 1, 2
    )
    SELECT strftime(cohort_month, '%Y-%m-%d') AS cohort_month,
           age_month, n_active_users,
           CAST(sum(rev) OVER (PARTITION BY cohort_month ORDER BY age_month
                               ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_ltv
    FROM cohort_age
    """,
)
def cohort_ltv_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: users cohorted by first-activity
    month, purchase revenue bucketed by cohort age (months since
    cohort), accumulated along age — the LTV complement of
    retention_cohorts (which counts users; this follows money).
    Revenue stays exact DECIMAL through the cumsum (order-independent
    partials, then a sequential frame — bit-stable cross-engine);
    ages are exact integer month arithmetic. Plan: user-first agg +
    one (cohort,user,age) agg + a cohort-partitioned window over
    (cohorts × ages) rows — every stage partial-aggregable, the
    fact table shuffles once on user_id."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("month", F.min("ts")).alias("cohort_month")
    )
    age = (
        F.months_between(
            F.date_trunc("month", F.col("ts")), F.col("cohort_month")
        )
    ).cast("bigint")
    monthly = (
        e.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .groupBy("cohort_month", "user_id", age.alias("age_month"))
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("rev"))
    )
    cohort_age = monthly.groupBy("cohort_month", "age_month").agg(
        F.countDistinct("user_id").alias("n_active_users"),
        F.sum("rev").alias("rev"),
    )
    w = (
        Window.partitionBy("cohort_month")
        .orderBy("age_month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return cohort_age.select(
        F.date_format("cohort_month", "yyyy-MM-dd").alias("cohort_month"),
        "age_month",
        "n_active_users",
        F.sum("rev").over(w).cast("double").alias("cum_ltv"),
    )


@query(
    "seasonality_dow_index",
    oracle="""
    WITH d AS (
      SELECT (datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) + 4) % 7
               AS dow,
             CAST(o_totalprice AS DECIMAL(18,2)) AS price
      FROM orders
    ),
    per_dow AS (
      SELECT dow, count(*) AS n_orders, sum(price) AS rev FROM d GROUP BY dow
    ),
    overall AS (
      SELECT CAST(sum(rev) AS DOUBLE) / sum(n_orders) AS avg_all FROM per_dow
    )
    SELECT dow, n_orders,
           CAST(rev AS DOUBLE) AS revenue,
           floor((CAST(rev AS DOUBLE) / n_orders) / avg_all * 1000000 + 0.5)
             / 1000000 AS dow_index
    FROM per_dow, overall
    """,
)
def seasonality_dow_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality index: average order value per weekday
    relative to the overall average (1.0 = no seasonality) — the
    periodicity audit before time-series features or traffic-shaped
    sampling. Weekday is EXACT integer arithmetic on epoch days
    ((days+4) % 7, 0=Monday) — deliberately NOT dayofweek(), whose
    0-vs-1-based and Sunday-vs-Monday-first conventions differ across
    engines. Exact DECIMAL revenue; one 7-group partial agg + a 1-row
    overall broadcast."""
    o = load_table(spark, sf_dir, "orders")
    dow = (F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01")) + 4) % 7
    per = o.select(
        dow.alias("dow"), F.col("o_totalprice").cast("decimal(18,2)").alias("price")
    ).groupBy("dow").agg(
        F.count(F.lit(1)).alias("n_orders"), F.sum("price").alias("rev")
    )
    overall = per.agg(
        (F.sum("rev").cast("double") / F.sum("n_orders")).alias("avg_all")
    ).withColumn("__k", F.lit(1))
    return (
        per.withColumn("__k", F.lit(1))
        .join(F.broadcast(overall), "__k")
        .select(
            "dow",
            "n_orders",
            F.col("rev").cast("double").alias("revenue"),
            dround(
                (F.col("rev").cast("double") / F.col("n_orders")) / F.col("avg_all"),
                6,
            ).alias("dow_index"),
        )
    )


@query(
    "agg_weighted_median",
    oracle="""
    WITH w AS (
      SELECT l_returnflag,
             CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
             CAST(l_quantity AS BIGINT) AS wt
      FROM lineitem
    ),
    cum AS (
      SELECT l_returnflag, price, wt,
             sum(wt) OVER (PARTITION BY l_returnflag
                           ORDER BY price ASC
                           ROWS UNBOUNDED PRECEDING) AS cw,
             sum(wt) OVER (PARTITION BY l_returnflag) AS total_w
      FROM w
    )
    SELECT l_returnflag,
           CAST(min(price) AS DOUBLE) AS weighted_median_price,
           CAST(any_value(total_w) AS BIGINT) AS total_weight
    FROM cum
    WHERE cw * 2 >= total_w
    GROUP BY l_returnflag
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median (price weighted by quantity) per return flag —
    the robust central-price statistic plain median misses when line
    sizes vary. Classic cumulative-weight spelling: sort by value
    within group, running Σweight, first value whose cumulative
    weight reaches half the total. All arithmetic exact (BIGINT
    weights, DECIMAL prices; the half test is `2·cw ≥ W` in integers
    — no division); ties on price need no tiebreak because min(price)
    over the qualifying set is order-independent. One window sort per
    group; at 100 TB the same answer comes from a two-pass histogram
    narrowing, but the contract (exact weighted median) is what the
    key pins."""
    li = load_table(spark, sf_dir, "lineitem")
    w = li.select(
        "l_returnflag",
        F.col("l_extendedprice").cast("decimal(18,2)").alias("price"),
        F.col("l_quantity").cast("bigint").alias("wt"),
    )
    win = (
        Window.partitionBy("l_returnflag")
        .orderBy(F.col("price").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    win_all = Window.partitionBy("l_returnflag")
    cum = w.select(
        "l_returnflag",
        "price",
        F.sum("wt").over(win).alias("cw"),
        F.sum("wt").over(win_all).alias("total_w"),
    )
    return (
        cum.filter(F.col("cw") * 2 >= F.col("total_w"))
        .groupBy("l_returnflag")
        .agg(
            F.min("price").cast("double").alias("weighted_median_price"),
            F.any_value("total_w").alias("total_weight"),
        )
    )


#: windowFunnel horizon: all later steps must land within 24 h of the
#: user's first step-1 event (exact integer microseconds).
_FUNNEL_WINDOW_US = 24 * 3600 * 1_000_000


@query(
    "funnel_window",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS us FROM events
      WHERE event_type IN ('view', 'click', 'purchase')
    ),
    s1 AS (
      SELECT user_id, event_type, us,
             min(CASE WHEN event_type = 'view' THEN us END)
               OVER (PARTITION BY user_id) AS t1
      FROM e
    ),
    s2 AS (
      SELECT user_id, event_type, us, t1,
             min(CASE WHEN event_type = 'click' AND us > t1
                       AND us <= t1 + {_FUNNEL_WINDOW_US} THEN us END)
               OVER (PARTITION BY user_id) AS t2
      FROM s1
    ),
    s3 AS (
      SELECT user_id, t1, t2,
             min(CASE WHEN event_type = 'purchase' AND us > t2
                       AND us <= t1 + {_FUNNEL_WINDOW_US} THEN us END)
               OVER (PARTITION BY user_id) AS t3
      FROM s2
    ),
    per_user AS (
      SELECT DISTINCT user_id, t1, t2, t3 FROM s3
    )
    SELECT CASE WHEN t3 IS NOT NULL THEN 3
                WHEN t2 IS NOT NULL THEN 2
                WHEN t1 IS NOT NULL THEN 1
                ELSE 0 END AS level,
           CAST(count(*) AS BIGINT) AS n_users
    FROM per_user
    GROUP BY 1
    """,
)
def funnel_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded ordered funnel (the windowFunnel operator):
    deepest view→click→purchase prefix a user completes with every
    later step inside 24 h of their FIRST view — the time-to-convert
    semantics `funnel_conversion` (unbounded first-touch) cannot
    express; anchoring at the first step-1 event makes the chain
    t1 → t2 = min click after t1 → t3 = min purchase after t2 a total
    order, so the level is deterministic. Plan: ONE hash shuffle on
    user_id, then three chained unordered window aggregates over the
    same partitioning (no sort, no self-joins — the per-stage
    re-join formulation shuffles the event table once per stage;
    this shuffles once, full stop), a per-user distinct, and a 4-row
    rollup. Exact integer microseconds end-to-end."""
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "click", "purchase"))
        .select(
            "user_id",
            "event_type",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        )
    )
    w = Window.partitionBy("user_id")
    s1 = e.withColumn(
        "t1",
        F.min(F.when(F.col("event_type") == "view", F.col("us"))).over(w),
    )
    s2 = s1.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("us") > F.col("t1"))
                & (F.col("us") <= F.col("t1") + _FUNNEL_WINDOW_US),
                F.col("us"),
            )
        ).over(w),
    )
    s3 = s2.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("us") > F.col("t2"))
                & (F.col("us") <= F.col("t1") + _FUNNEL_WINDOW_US),
                F.col("us"),
            )
        ).over(w),
    )
    per_user = s3.select("user_id", "t1", "t2", "t3").distinct()
    level = (
        F.when(F.col("t3").isNotNull(), 3)
        .when(F.col("t2").isNotNull(), 2)
        .when(F.col("t1").isNotNull(), 1)
        .otherwise(0)
    )
    return per_user.select(level.alias("level")).groupBy("level").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )


@query(
    "funnel_time_to_convert",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS us FROM events
      WHERE event_type IN ('view', 'purchase')
    ),
    t1s AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN us END) AS t1
      FROM e GROUP BY user_id
    ),
    conv AS (
      SELECT e.user_id,
             CAST(min(e.us - t.t1) // 1000000 AS BIGINT) AS delay_s
      FROM e JOIN t1s t USING (user_id)
      WHERE e.event_type = 'purchase' AND e.us > t.t1
      GROUP BY e.user_id
    ),
    ranked AS (
      SELECT delay_s,
             row_number() OVER (ORDER BY delay_s, user_id) AS rn,
             count(*) OVER () AS n
      FROM conv
    )
    SELECT CAST(max(n) AS BIGINT) AS n_converted,
           floor(CAST(sum(delay_s) AS DOUBLE) / max(n) * 1000000 + 0.5)
             / 1000000 AS mean_delay_s,
           CAST(max(CASE WHEN rn = (n + 1) // 2 THEN delay_s END) AS BIGINT)
             AS median_delay_s,
           CAST(max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
                         THEN delay_s END) AS BIGINT) AS p90_delay_s
    FROM ranked
    """,
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution for the view→purchase funnel:
    per converting user, the delay from FIRST view to the first
    purchase after it, summarized as count / mean / exact lower
    median / exact p90 — the latency lens `funnel_window` (depth) and
    `funnel_conversion` (reach) don't give. Delays are exact integer
    seconds; the median and p90 are ORDER STATISTICS under a
    (delay, user) total order — never an interpolating percentile, so
    they value-hash across engines. Plan: one user-grain conditional
    aggregate, one join back, one global window over the converted
    users only (the small side of the funnel)."""
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "purchase"))
        .select(
            "user_id",
            "event_type",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        )
    )
    t1s = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("us"))).alias("t1")
    )
    conv = (
        e.filter(F.col("event_type") == "purchase")
        .join(t1s, "user_id")
        .filter(F.col("us") > F.col("t1"))
        .groupBy("user_id")
        .agg(
            F.expr("min(us - t1) div 1000000").cast("bigint").alias("delay_s")
        )
    )
    w = Window.orderBy("delay_s", "user_id")
    ranked = conv.select(
        "delay_s",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    return ranked.agg(
        F.max("n").cast("bigint").alias("n_converted"),
        dround(F.sum("delay_s").cast("double") / F.max("n"), 6).alias(
            "mean_delay_s"
        ),
        F.max(
            F.when(
                F.col("rn") == F.floor((F.col("n") + 1) / 2), F.col("delay_s")
            )
        ).cast("bigint").alias("median_delay_s"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(0.9 * F.col("n")).cast("bigint"),
                F.col("delay_s"),
            )
        ).cast("bigint").alias("p90_delay_s"),
    )


# --------------------------------------------------------------------------
# Iterative ML with driver-scalar state: logistic regression via IRLS
# --------------------------------------------------------------------------
_IRLS_B0 = f"""
    SELECT n, n_pos,
           (swz * swxx - swx * swxz) / (sw * swxx - swx * swx) AS b0,
           (sw * swxz - swx * swz) / (sw * swxx - swx * swx) AS b1
"""


@query(
    "train_logistic_irls",
    oracle=f"""
    WITH pts AS (
      SELECT CAST(value AS DOUBLE) / 100 AS x,
             CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y
      FROM events
    ),
    s0 AS (
      SELECT 0.25 * count(*) AS sw, 0.25 * sum(x) AS swx,
             0.25 * sum(x * x) AS swxx,
             sum(y - 0.5) AS swz, sum(x * (y - 0.5)) AS swxz,
             count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pos
      FROM pts
    ),
    beta1 AS ({_IRLS_B0} FROM s0),
    it1 AS (
      SELECT p.x, p.y, b.b0 + b.b1 * p.x AS eta,
             1 / (1 + exp(-(b.b0 + b.b1 * p.x))) AS prob
      FROM pts p CROSS JOIN beta1 b
    ),
    s1 AS (
      SELECT sum(prob * (1 - prob)) AS sw,
             sum(prob * (1 - prob) * x) AS swx,
             sum(prob * (1 - prob) * x * x) AS swxx,
             sum(prob * (1 - prob) * eta + y - prob) AS swz,
             sum(x * (prob * (1 - prob) * eta + y - prob)) AS swxz,
             max(0) AS n, max(0) AS n_pos
      FROM it1
    ),
    beta2 AS ({_IRLS_B0} FROM s1),
    scored AS (
      SELECT p.y, 1 / (1 + exp(-(b.b0 + b.b1 * p.x))) AS prob
      FROM pts p CROSS JOIN beta2 b
    )
    SELECT (SELECT n FROM beta1) AS n,
           (SELECT n_pos FROM beta1) AS n_pos,
           (SELECT {sql_dround('b0', 6)} FROM beta1) AS beta0_it1,
           (SELECT {sql_dround('b1', 6)} FROM beta1) AS beta1_it1,
           (SELECT {sql_dround('b0', 6)} FROM beta2) AS beta0_it2,
           (SELECT {sql_dround('b1', 6)} FROM beta2) AS beta1_it2,
           {sql_dround('-avg(y * ln(prob) + (1 - y) * ln(1 - prob))', 6)}
             AS log_loss
    FROM scored
    """,
)
def train_logistic_irls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed logistic regression (purchase ~ event value) by
    IRLS — the iterative-ML shape on Spark done right: each iteration
    is ONE partial-aggregable job producing five moment sums (the
    2×2 weighted normal equations), the d×d solve happens on the
    driver with SCALAR state only (the kmeans/pagerank discipline —
    no collect of rows, no Python in the hot path), and the new β
    re-enters the plan as literals. Two fixed iterations from β=0
    keep the whole fit deterministic, and the oracle unrolls the SAME
    two iterations in SQL — moment sums, closed-form solves, exp()
    re-scoring and final log-loss are all cross-engine value-checked
    at 6 dp (β=0 makes iteration 1's weights exactly 0.25, so its
    sums are exact rationals; iteration 2's reassociation noise is
    ~1e-12 against the 1e-6 band). The weighted working response is
    folded as w·z = w·η + (y − p), avoiding the (y−p)/w division and
    its p→{{0,1}} blowup in BOTH engines. At 100 TB each iteration
    shuffles 5 doubles per partition — cost is the scan, β transfer
    is O(d²); 60 iterations of this IS how MLlib fits GLMs."""
    ev = load_table(spark, sf_dir, "events").select(
        (F.col("value").cast("double") / 100).alias("x"),
        F.when(F.col("event_type") == "purchase", 1.0).otherwise(0.0).alias("y"),
    ).localCheckpoint()  # 3 passes over a tiny projection

    def solve(sw, swx, swxx, swz, swxz):
        det = sw * swxx - swx * swx
        return (swz * swxx - swx * swxz) / det, (sw * swxz - swx * swz) / det

    # iteration 1: β = 0 → p = 1/2, w = 1/4, w·z = y − 1/2 (exact)
    r = ev.agg(
        (0.25 * F.count(F.lit(1))).alias("sw"),
        (0.25 * F.sum("x")).alias("swx"),
        (0.25 * F.sum(F.col("x") * F.col("x"))).alias("swxx"),
        F.sum(F.col("y") - 0.5).alias("swz"),
        F.sum(F.col("x") * (F.col("y") - 0.5)).alias("swxz"),
        F.count(F.lit(1)).alias("n"),
        F.sum("y").cast("bigint").alias("n_pos"),
    ).first()
    n, n_pos = r["n"], r["n_pos"]
    b0_1, b1_1 = solve(r["sw"], r["swx"], r["swxx"], r["swz"], r["swxz"])

    # iteration 2: reweight at β₁, same five sums
    eta = F.lit(b0_1) + F.lit(b1_1) * F.col("x")
    prob = 1 / (1 + F.exp(-eta))
    w = prob * (1 - prob)
    wz = w * eta + F.col("y") - prob
    r2 = ev.agg(
        F.sum(w).alias("sw"),
        F.sum(w * F.col("x")).alias("swx"),
        F.sum(w * F.col("x") * F.col("x")).alias("swxx"),
        F.sum(wz).alias("swz"),
        F.sum(F.col("x") * wz).alias("swxz"),
    ).first()
    b0_2, b1_2 = solve(r2["sw"], r2["swx"], r2["swxx"], r2["swz"], r2["swxz"])

    # final model quality: mean negative log-likelihood at β₂
    eta2 = F.lit(b0_2) + F.lit(b1_2) * F.col("x")
    prob2 = 1 / (1 + F.exp(-eta2))
    return ev.agg(
        F.lit(n).cast("bigint").alias("n"),
        F.lit(n_pos).cast("bigint").alias("n_pos"),
        F.lit(b0_1).cast("double").alias("_b01"),
        F.lit(b1_1).cast("double").alias("_b11"),
        F.lit(b0_2).cast("double").alias("_b02"),
        F.lit(b1_2).cast("double").alias("_b12"),
        dround(
            -F.avg(F.col("y") * F.log(prob2) + (1 - F.col("y")) * F.log(1 - prob2)),
            6,
        ).alias("log_loss"),
    ).select(
        "n", "n_pos",
        dround(F.col("_b01"), 6).alias("beta0_it1"),
        dround(F.col("_b11"), 6).alias("beta1_it1"),
        dround(F.col("_b02"), 6).alias("beta0_it2"),
        dround(F.col("_b12"), 6).alias("beta1_it2"),
        "log_loss",
    )


# --------------------------------------------------------------------------
# Multinomial naive Bayes — the aggregation-only trainer
# --------------------------------------------------------------------------
@query(
    "train_naive_bayes_multinomial",
    oracle="""
    WITH toks AS (
      SELECT lang,
             unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
      FROM documents
    ),
    t2 AS (
      SELECT lang, token FROM toks WHERE regexp_full_match(token, '[a-z]+')
    ),
    vocab AS (
      SELECT token, count(*) AS cnt FROM t2 GROUP BY token
      ORDER BY cnt DESC, token ASC LIMIT 200
    ),
    langs AS (SELECT DISTINCT lang FROM documents),
    ct AS (
      SELECT t2.lang, t2.token, count(*) AS c
      FROM t2 JOIN vocab USING (token) GROUP BY 1, 2
    ),
    grid AS (
      SELECT l.lang, v.token, COALESCE(ct.c, 0) AS c
      FROM langs l CROSS JOIN vocab v
      LEFT JOIN ct ON ct.lang = l.lang AND ct.token = v.token
    ),
    tc AS (SELECT lang, sum(c) AS t FROM grid GROUP BY lang),
    nd AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    ntot AS (SELECT count(*) AS n FROM documents)
    SELECT g.lang, g.token, CAST(g.c AS BIGINT) AS cnt,
           CAST(((g.c + 1) * 2000000000 + (tc.t + 200))
                // (2 * (tc.t + 200)) AS BIGINT) AS p_q9
    FROM grid g JOIN tc USING (lang)
    UNION ALL
    SELECT nd.lang, '__prior__' AS token, CAST(nd.n AS BIGINT) AS cnt,
           CAST((nd.n * 2000000000 + ntot.n) // (2 * ntot.n) AS BIGINT) AS p_q9
    FROM nd CROSS JOIN ntot
    """,
)
def train_naive_bayes_multinomial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive Bayes trained by PURE AGGREGATION — the
    classifier whose "training" is exactly the engine's native shape
    (two partial-aggregable groupBys + a broadcast of the bounded
    vocab), complementing the iterative IRLS key. Model state:
    add-one-smoothed token likelihoods p(token|lang) over the
    deterministic top-200 vocab (count desc, token asc) on the FULL
    lang × vocab grid (zero-count cells carry the smoothing mass),
    plus per-class priors as '__prior__' rows. Probabilities are
    emitted on the q9 integer micro-grid via the scaled-BIGINT
    half-up division spelling ((c+1)·2·10⁹ + D) DIV 2D — the engine's
    cross-engine-exact division discipline (the naive double spelling
    is pinned divergent in tests/test_query_fuzz.py), so the oracle
    match is bit-exact, never tolerance-based. Scale: one corpus scan
    builds the counts; everything downstream is vocab-bounded;
    classes × vocab state would stay KB-sized at 100 TB."""
    from ..functions.text import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select("lang", F.explode(tokens_col(F.col("text"))).alias("token"))
        .filter(F.col("token").rlike("^[a-z]+$"))
    )
    vocab = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(200)
        .select("token")
    )
    langs = docs.select("lang").distinct()
    ct = (
        toks.join(F.broadcast(vocab), "token")
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    grid = (
        langs.crossJoin(F.broadcast(vocab))  # 5 x 200 model grid
        .join(ct, ["lang", "token"], "left")
        .select("lang", "token", F.coalesce("c", F.lit(0)).alias("c"))
    )
    tc = grid.groupBy("lang").agg(F.sum("c").alias("t"))
    likelihood = (
        grid.join(tc, "lang")
        .select(
            "lang",
            "token",
            F.col("c").cast("bigint").alias("cnt"),
            F.expr(
                "CAST(((c + 1) * 2000000000 + (t + 200))"
                " DIV (2 * (t + 200)) AS BIGINT)"
            ).alias("p_q9"),
        )
    )
    nd = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    ntot = docs.count()  # scalar-only collect (class-prior denominator)
    priors = nd.select(
        "lang",
        F.lit("__prior__").alias("token"),
        F.col("n").cast("bigint").alias("cnt"),
        F.expr(
            f"CAST((n * 2000000000 + {ntot}) DIV (2 * {ntot}) AS BIGINT)"
        ).alias("p_q9"),
    )
    return likelihood.unionByName(priors)
