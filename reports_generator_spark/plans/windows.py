"""Window-function operators (SURVEY.md §2.3 R13–R15, E8).

The window machinery here is the same primitive that rebuilds the
reference's stateful block-segmentation parser (Proof.scala:104-130):
a cumulative sum over an ordered partition assigns group ids without
ever forcing `repartition(1)`. E8 `sessionize_events` is exactly that
pattern on the events table — gap > threshold starts a new session.

Scale note: every window below partitions by a high-cardinality key
(customer, user) so state per partition is tiny; none uses a global
(unpartitioned) ordering, which would serialize on one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query


# --------------------------------------------------------------------------
# R13 ranking
# --------------------------------------------------------------------------
@query(
    "window_ranking",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(rn AS INTEGER) AS rn, CAST(rnk AS INTEGER) AS rnk,
           CAST(drnk AS INTEGER) AS drnk
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER w AS rn,
             rank()       OVER w AS rnk,
             dense_rank() OVER w AS drnk
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
    ) t
    WHERE rn <= 3
    """,
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price (deterministic tiebreak)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


# --------------------------------------------------------------------------
# R14 analytic (lag/lead/first/last)
# --------------------------------------------------------------------------
@query(
    "window_analytic",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           lag(o_totalprice)  OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           first_value(o_totalprice) OVER w AS first_price,
           CAST(CAST(o_totalprice AS DECIMAL(18,2))
                - CAST(lag(o_totalprice) OVER w AS DECIMAL(18,2))
                AS DOUBLE) AS price_delta
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
)
def window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    lag_p = F.lag("o_totalprice").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        lag_p.alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_totalprice").over(w).alias("first_price"),
        (F.col("o_totalprice").cast("decimal(18,2)") - lag_p.cast("decimal(18,2)"))
        .cast("double")
        .alias("price_delta"),
    )


# --------------------------------------------------------------------------
# R15 running aggregate with an explicit frame
# --------------------------------------------------------------------------
@query(
    "window_running_agg",
    oracle="""
    SELECT user_id, event_id, ts,
           CAST(sum(CAST(value AS DECIMAL(18,2)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_value,
           count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n,
           CAST(sum(CAST(value AS DECIMAL(18,2)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg3
    FROM events
    """,
)
def window_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = w.rowsBetween(-2, Window.currentRow)
    dec_val = F.col("value").cast("decimal(18,2)")
    return e.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(dec_val).over(cum).cast("double").alias("running_value"),
        F.count(F.lit(1)).over(cum).alias("running_n"),
        (F.sum(dec_val).over(mov).cast("double") / F.count(F.lit(1)).over(mov)).alias(
            "moving_avg3"
        ),
    )


# --------------------------------------------------------------------------
# E8 sessionization — gap-based session ids via cumulative sum.
# Same window primitive that replaces the reference's mutable-closure
# block parser (Proof.scala:104-130): "terminator" here is a >30 min gap.
# --------------------------------------------------------------------------
SESSION_GAP_MIN = 30

_SESSIONIZE_ORACLE = f"""
WITH gaps AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL {SESSION_GAP_MIN} MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
),
sess AS (
  SELECT user_id, event_id, ts, value,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM gaps
)
SELECT user_id, session_id,
       count(*)                 AS n_events,
       min(ts)                  AS session_start,
       max(ts)                  AS session_end,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
FROM sess
GROUP BY user_id, session_id
"""


@query("sessionize_events", oracle=_SESSIONIZE_ORACLE)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (gap > 30 min ⇒ new session)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    # unix_timestamp, not cast("long"): the stored type may be
    # TIMESTAMP_NTZ (naive parquet micros), which refuses a numeric cast.
    gap_s = F.unix_timestamp("ts") - F.lag(F.unix_timestamp("ts")).over(w)
    is_new = F.when(gap_s > SESSION_GAP_MIN * 60, 1).otherwise(0)
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = e.withColumn("session_id", F.sum(is_new).over(cum))
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("session_value"),
    )


@query(
    "window_range_time",
    oracle="""
    SELECT event_id, user_id,
           CAST(sum(CAST(value AS DECIMAL(18,6))) OVER (
               PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
               RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS trailing_1h_value,
           count(*) OVER (
               PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
               RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW
           ) AS trailing_1h_events
    FROM events
    """,
)
def window_range_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time: trailing 1-hour sum/count per
    user. rangeBetween on epoch seconds — the frame is value-based
    (all rows within 3599s), not row-count-based; ties in ts share a
    frame, so the result is deterministic without a tiebreak."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3599, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("trailing_1h_value"),
        F.count(F.lit(1)).over(w).alias("trailing_1h_events"),
    )


# --------------------------------------------------------------------------
# R13b distribution / bucketing window functions — ntile is the
# length-bucketing primitive for batch-shaping training data (group
# docs of similar length so padding waste is bounded).
# --------------------------------------------------------------------------
@query(
    "window_distribution",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile,
           floor(percent_rank() OVER w * 1000000 + 0.5) / 1000000 AS pct_rank,
           floor(cume_dist() OVER w * 1000000 + 0.5) / 1000000 AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice ASC, o_orderkey ASC)
    """,
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile/percent_rank/cume_dist per priority class (total order
    within each partition makes every value deterministic)."""
    from ..functions.rounding import dround

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.ntile(4).over(w).alias("quartile"),
        dround(F.percent_rank().over(w), 6).alias("pct_rank"),
        dround(F.cume_dist().over(w), 6).alias("cdist"),
    )


# --------------------------------------------------------------------------
# Native session_window (built-in merging session aggregation)
# --------------------------------------------------------------------------
@query(
    "session_window_native",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                       >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    s AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM g
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) AS last_event_ts,
           count(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's built-in session_window (dynamic-gap merging windows)
    in BATCH mode — the same operator the streaming sessionizer uses,
    so batch and stream share semantics. Boundary: an event exactly
    gap-after the previous one starts a NEW session (window end is
    exclusive), hence the oracle's >= where the cumsum sessionizer
    (sessionize_events) uses >."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("last_event_ts"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start", "last_event_ts", "n_events")
    )


# --------------------------------------------------------------------------
# Forward fill (LOCF) — sparse metric carried to every subsequent row
# --------------------------------------------------------------------------
@query(
    "window_fill_forward",
    oracle="""
    SELECT event_id, user_id, ts,
           last_value(CASE WHEN event_type = 'purchase' THEN value END
                      IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS last_purchase_value
    FROM events
    """,
)
def window_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward: the most recent purchase
    value rides along on every subsequent event of the same user
    (NULL until the first purchase). `last(..., ignorenulls=True)`
    over a running frame is the canonical LOCF spelling — one shuffle
    on user_id, one per-key sort, values copied bit-exact (no
    arithmetic, so no float discipline needed)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sparse = F.when(F.col("event_type") == "purchase", F.col("value"))
    return e.select(
        "event_id", "user_id", "ts",
        F.last(sparse, ignorenulls=True).over(w).alias("last_purchase_value"),
    )


# --------------------------------------------------------------------------
# Cumulative distinct users (growth accounting without a distinct-
# over-window, which neither engine supports)
# --------------------------------------------------------------------------
@query(
    "cumulative_distinct_users",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, min(date_trunc('day', ts)) AS day
      FROM events GROUP BY user_id
    ),
    daily AS (SELECT day, count(*) AS new_users FROM first_seen GROUP BY day)
    SELECT day, new_users,
           CAST(sum(new_users) OVER (ORDER BY day) AS BIGINT)
             AS cumulative_users
    FROM daily
    """,
)
def cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-user counts + cumulative distinct users. COUNT
    (DISTINCT) over a running window is unsupported (and would be
    quadratic anyway); the scalable identity is first-seen-day per
    user → daily news → running sum. Both heavy steps are partial-agg
    shuffles on high-cardinality keys; the only global ordering runs
    over |days| rows — provably tiny, same class as the calendar
    spine in time_spine_gapfill."""
    e = load_table(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("day")
    )
    daily = first_seen.groupBy("day").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "day", "new_users",
        F.sum("new_users").over(w).cast("bigint").alias("cumulative_users"),
    )


@query(
    "window_ewma",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, ts, value,
             row_number() OVER w AS rn,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM events WHERE event_type = 'purchase'
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           floor(sum(value * power(0.5, n - rn)) * 0.5
                 * 1000000 + 0.5) / 1000000 AS ewma_tail
    FROM seq
    GROUP BY user_id
    """,
)
def window_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (α = 0.5) of each user's
    purchase values, evaluated at the end of the series. The
    recurrence ewma_t = α·x_t + (1−α)·ewma_{t−1} unrolls to the
    weighted sum α·Σ (1−α)^(n−i)·x_i, which distributes as ONE
    window row_number + ONE partial-aggregable grouped sum — no
    sequential scan, no UDAF state carried row-to-row. α = 0.5 makes
    every decay weight an exact power of two, so per-term products
    are identical IEEE-754 on both engines; the final sum is
    dround(6)-pinned. The same unrolling turns any linear recurrence
    into a distributed aggregation as long as the decay has bounded
    support (weights underflow past ~60 terms — older terms
    contribute exactly 0 in both engines)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id", "value",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n"),
        )
    )
    from ..functions.rounding import dround

    return ev.groupBy("user_id").agg(
        dround(
            F.sum(F.col("value") * F.pow(F.lit(0.5), F.col("n") - F.col("rn")))
            * F.lit(0.5),
            6,
        ).alias("ewma_tail")
    )


@query(
    "window_ratio_to_report",
    oracle="""
    WITH g AS (
      SELECT l_returnflag, l_linestatus,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
      FROM lineitem GROUP BY l_returnflag, l_linestatus
    )
    SELECT l_returnflag, l_linestatus, revenue,
           floor(revenue / sum(revenue) OVER (PARTITION BY l_returnflag)
                 * 1000000 + 0.5) / 1000000 AS share_of_flag,
           floor(revenue / sum(revenue) OVER ()
                 * 1000000 + 0.5) / 1000000 AS share_of_total
    FROM g
    """,
)
def window_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each group's share of its parent group and of
    the grand total — the BI window everyone writes. The heavy
    aggregation happens FIRST (exact-DECIMAL revenue per
    (flag, status) — partial-aggregable, one shuffle of the fact
    table); the share windows then run over the tiny grouped frame,
    so the unpartitioned total window touches |groups| rows, never
    the fact table. Numerators/denominators are identical
    double-from-DECIMAL values on both engines; shares
    dround(6)-pinned."""
    from ..functions.rounding import dround

    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue")
    )
    w_flag = Window.partitionBy("l_returnflag")
    w_all = Window.partitionBy()
    return g.select(
        "l_returnflag", "l_linestatus", "revenue",
        dround(F.col("revenue") / F.sum("revenue").over(w_flag), 6).alias("share_of_flag"),
        dround(F.col("revenue") / F.sum("revenue").over(w_all), 6).alias("share_of_total"),
    )


@query(
    "window_period_over_period",
    oracle="""
    WITH d AS (
      SELECT date_trunc('day', o_orderdate) AS day,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT day, revenue,
           lag(revenue) OVER (ORDER BY day) AS prev_revenue,
           floor((revenue / nullif(lag(revenue) OVER (ORDER BY day), 0) - 1)
                 * 1000000 + 0.5) / 1000000 AS pct_change
    FROM d
    """,
)
def window_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period delta (the DoD/WoW/MoM reporting primitive):
    daily revenue with previous-period value and % change via lag().
    The unpartitioned window runs over the PRE-AGGREGATED day frame —
    the fact table shuffles once into |days| rows, and only those
    cross the single-task ordering (the window_ratio_to_report
    posture; never lag() over raw facts). Revenue is DECIMAL-exact
    before the ratio, so the % change is bit-identical cross-engine
    after dround(6)."""
    from ..functions.rounding import dround

    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.date_trunc("day", "o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue")
    )
    w = Window.orderBy("day")
    prev = F.lag("revenue").over(w)
    return d.select(
        "day",
        "revenue",
        prev.alias("prev_revenue"),
        dround(F.col("revenue") / F.nullif(prev, F.lit(0)) - 1, 6).alias("pct_change"),
    )


@query(
    "window_rolling_median",
    oracle="""
    SELECT event_id, user_id, ts,
           floor(median(value) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                 * 10000 + 0.5) / 10000 AS med7
    FROM events
    """,
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-row exact rolling median per user — the robust
    smoother for spiky metrics (rolling mean moves 14% on one
    outlier; the median ignores it). Spark spells it percentile(0.5)
    over a ROWS frame; both engines linearly interpolate the
    even-count middle pair, and the frame is bounded (7 rows) so
    per-row state is O(1) — a 100 TB event stream smooths in one
    user-keyed exchange + per-partition sort. Tie-stable total order
    (ts, event_id)."""
    from ..functions.rounding import dround

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-6, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        dround(F.expr("percentile(value, 0.5)").over(w), 4).alias("med7"),
    )
