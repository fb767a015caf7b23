"""Commerce / operations analytics: price-volume-mix revenue bridge,
on-time-in-full delivery metrics, duplicate-payment audit, DAU/WAU
stickiness, and top session paths.

All currency flows as integer cents and all dates as exact day
arithmetic until one final dround-pinned double per metric (the
integer-cents cross-engine determinism recipe). The reference
computes none of these (SURVEY §0); this is north-star engine
surface on the TPC-H-ish fixture tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import dround
from ..sources import load_table
from .registry import query

#: Revenue-bridge comparison periods (ship-year; data spans 1995-2001).
_YR1, _YR2 = 1997, 1998


@query(
    "revenue_bridge_pvm",
    oracle=f"""
    WITH per AS (
      SELECT p_brand,
             year(l_shipdate) AS yr,
             CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS rev_c,
             CAST(floor(sum(l_quantity) + 0.5) AS BIGINT) AS qty
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE year(l_shipdate) IN ({_YR1}, {_YR2})
      GROUP BY 1, 2
    ),
    wide AS (
      SELECT p_brand,
             CAST(max(CASE WHEN yr = {_YR1} THEN rev_c ELSE 0 END) AS BIGINT)
               AS rev1_c,
             CAST(max(CASE WHEN yr = {_YR2} THEN rev_c ELSE 0 END) AS BIGINT)
               AS rev2_c,
             CAST(max(CASE WHEN yr = {_YR1} THEN qty ELSE 0 END) AS BIGINT)
               AS q1,
             CAST(max(CASE WHEN yr = {_YR2} THEN qty ELSE 0 END) AS BIGINT)
               AS q2
      FROM per GROUP BY p_brand
    )
    SELECT p_brand, rev1_c, rev2_c, q1, q2,
           floor((q2 - q1) * (CAST(rev1_c AS DOUBLE) / q1) / 100
                 * 10000 + 0.5) / 10000 AS volume_effect,
           floor(q2 * (CAST(rev2_c AS DOUBLE) / q2
                       - CAST(rev1_c AS DOUBLE) / q1) / 100
                 * 10000 + 0.5) / 10000 AS price_effect
    FROM wide
    WHERE q1 > 0 AND q2 > 0
    """,
)
def revenue_bridge_pvm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume revenue bridge between two ship-years, per brand:
    volume effect = Δqty · avg-price₁, price effect = qty₂ · Δavg-price
    — the two-factor decomposition that sums exactly to Δrevenue
    (volume + price = rev₂ − rev₁ algebraically, a property the test
    asserts). Revenue aggregates as integer cents and quantity as
    integer units; the effects are single double expressions from
    those integers, pinned at 4 dp. Plan: one partial-agg shuffle on
    (brand, year), then a tiny per-brand pivot — the conditional-max
    pivot avoids a second shuffle. Broadcast part join."""
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    per = (
        li.withColumn("yr", F.year("l_shipdate"))
        .filter(F.col("yr").isin(_YR1, _YR2))
        .join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .groupBy("p_brand", "yr")
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint")
            ).cast("bigint").alias("rev_c"),
            F.floor(F.sum("l_quantity") + 0.5).cast("bigint").alias("qty"),
        )
    )
    wide = per.groupBy("p_brand").agg(
        F.max(F.when(F.col("yr") == _YR1, F.col("rev_c")).otherwise(0))
        .cast("bigint").alias("rev1_c"),
        F.max(F.when(F.col("yr") == _YR2, F.col("rev_c")).otherwise(0))
        .cast("bigint").alias("rev2_c"),
        F.max(F.when(F.col("yr") == _YR1, F.col("qty")).otherwise(0))
        .cast("bigint").alias("q1"),
        F.max(F.when(F.col("yr") == _YR2, F.col("qty")).otherwise(0))
        .cast("bigint").alias("q2"),
    )
    p1 = F.col("rev1_c").cast("double") / F.col("q1")
    p2 = F.col("rev2_c").cast("double") / F.col("q2")
    return wide.filter((F.col("q1") > 0) & (F.col("q2") > 0)).select(
        "p_brand",
        "rev1_c",
        "rev2_c",
        "q1",
        "q2",
        dround((F.col("q2") - F.col("q1")) * p1 / 100, 4).alias(
            "volume_effect"
        ),
        dround(F.col("q2") * (p2 - p1) / 100, 4).alias("price_effect"),
    )


#: OTIF thresholds: shipped within 30 days of order = on-time;
#: quantity ≥ 25 units = in-full (fixture semantics, documented).
_OT_DAYS, _IF_QTY = 30, 25


@query(
    "otif_delivery_metrics",
    oracle=f"""
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS n_lines,
           floor(CAST(count(*) FILTER (WHERE on_time = 1) AS DOUBLE)
                 / count(*) * 1000000 + 0.5) / 1000000 AS on_time_rate,
           floor(CAST(count(*) FILTER (WHERE in_full = 1) AS DOUBLE)
                 / count(*) * 1000000 + 0.5) / 1000000 AS in_full_rate,
           floor(CAST(count(*) FILTER (WHERE on_time = 1 AND in_full = 1)
                      AS DOUBLE)
                 / count(*) * 1000000 + 0.5) / 1000000 AS otif_rate
    FROM (
      SELECT n_name,
             CASE WHEN date_diff('day', o_orderdate, l_shipdate)
                       BETWEEN 0 AND {_OT_DAYS} THEN 1 ELSE 0 END AS on_time,
             CASE WHEN l_quantity >= {_IF_QTY} THEN 1 ELSE 0 END AS in_full
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
    )
    GROUP BY n_name
    """,
)
def otif_delivery_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """On-time-in-full (OTIF) delivery scorecard per supplier nation:
    on-time = shipped 0-30 days after order, in-full = quantity ≥ 25
    (fixture thresholds), OTIF = both. Day arithmetic is exact
    integer datediff; the three rates are integer-count ratios pinned
    at 6 dp. Plan: the orders join is the only big shuffle (lineitem ⋈
    orders on orderkey); supplier and nation broadcast. Conditional
    counts ride the same partial aggregate — one pass, no re-scan per
    metric."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    lag_days = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    )
    flags = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "n_name",
            F.when(
                (lag_days >= 0) & (lag_days <= _OT_DAYS), 1
            ).otherwise(0).alias("on_time"),
            F.when(F.col("l_quantity") >= _IF_QTY, 1).otherwise(0).alias(
                "in_full"
            ),
        )
    )
    cnt = F.count(F.lit(1))
    return flags.groupBy("n_name").agg(
        cnt.cast("bigint").alias("n_lines"),
        dround(F.sum("on_time").cast("double") / cnt, 6).alias("on_time_rate"),
        dround(F.sum("in_full").cast("double") / cnt, 6).alias("in_full_rate"),
        dround(
            F.sum(F.col("on_time") * F.col("in_full")).cast("double") / cnt, 6
        ).alias("otif_rate"),
    )


#: Duplicate-payment candidate key: same customer, same $1000 amount
#: bucket, orders ≤ 180 days apart (fixture-scaled audit thresholds).
_DUP_BUCKET, _DUP_DAYS = 1000, 180


@query(
    "duplicate_payment_audit",
    oracle=f"""
    WITH keyed AS (
      SELECT o_custkey,
             CAST(floor(o_totalprice / {_DUP_BUCKET}) AS BIGINT) AS amt_bucket,
             o_orderkey, o_orderdate,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS amt_c
      FROM orders
    ),
    lagged AS (
      SELECT o_custkey, amt_bucket, o_orderkey, amt_c,
             lag(o_orderkey) OVER w AS prev_orderkey,
             lag(amt_c) OVER w AS prev_amt_c,
             date_diff('day', lag(o_orderdate) OVER w, o_orderdate) AS day_gap
      FROM keyed
      WINDOW w AS (PARTITION BY o_custkey, amt_bucket
                   ORDER BY o_orderdate, o_orderkey)
    )
    SELECT o_custkey, amt_bucket, prev_orderkey, o_orderkey,
           prev_amt_c, amt_c, CAST(day_gap AS BIGINT) AS day_gap
    FROM lagged
    WHERE prev_orderkey IS NOT NULL AND day_gap <= {_DUP_DAYS}
    """,
)
def duplicate_payment_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payment audit: flags order pairs from the same
    customer in the same $1000 amount bucket placed ≤ 180 days apart —
    the standard AP double-payment screen (exact-amount duplicates
    don't exist in the fixture, so the bucket IS the semantic). The
    adjacency lag over (customer, bucket) windows finds each
    consecutive pair exactly once — no self-join, no O(k²) per-key
    blow-up; at 100 TB this is one hash shuffle on a two-column key
    whose partitions window-sort locally. All output integer."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.floor(F.col("o_totalprice") / _DUP_BUCKET).cast("bigint").alias(
            "amt_bucket"
        ),
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("od"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias(
            "amt_c"
        ),
    )
    w = Window.partitionBy("o_custkey", "amt_bucket").orderBy(
        "od", "o_orderkey"
    )
    lagged = o.select(
        "o_custkey",
        "amt_bucket",
        "o_orderkey",
        "amt_c",
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        F.lag("amt_c").over(w).alias("prev_amt_c"),
        F.datediff(F.col("od"), F.lag("od").over(w)).cast("bigint").alias(
            "day_gap"
        ),
    )
    return lagged.filter(
        F.col("prev_orderkey").isNotNull() & (F.col("day_gap") <= _DUP_DAYS)
    ).select(
        "o_custkey",
        "amt_bucket",
        "prev_orderkey",
        "o_orderkey",
        "prev_amt_c",
        "amt_c",
        "day_gap",
    )


@query(
    "dau_wau_stickiness",
    oracle="""
    WITH daily AS (
      SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS wk,
             strftime(ts, '%Y-%m-%d') AS d,
             CAST(count(DISTINCT user_id) AS BIGINT) AS dau
      FROM events GROUP BY 1, 2
    ),
    weekly AS (
      SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS wk,
             CAST(count(DISTINCT user_id) AS BIGINT) AS wau
      FROM events GROUP BY 1
    )
    SELECT d.wk,
           CAST(count(*) AS BIGINT) AS n_days,
           floor(CAST(sum(d.dau) AS DOUBLE) / count(*) * 1000000 + 0.5)
             / 1000000 AS avg_dau,
           w.wau,
           floor(CAST(sum(d.dau) AS DOUBLE) / count(*) / w.wau
                 * 1000000 + 0.5) / 1000000 AS stickiness
    FROM daily d JOIN weekly w USING (wk)
    GROUP BY d.wk, w.wau
    """,
)
def dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per ISO week: average daily active users
    over weekly active users — the engagement ratio every growth
    dashboard runs. Two distinct-count aggregates (day grain, week
    grain) joined on the week; integer counts until the two pinned
    ratios. Weeks render as their Monday date string so the grain is
    engine-portable. At 100 TB both distinct-counts are partial-agg
    shuffles on (grain, user); swap in [[sketch_rollup_hll]]'s HLL
    when exactness can yield."""
    e = load_table(spark, sf_dir, "events").select(
        F.date_format(
            F.date_trunc("week", F.col("ts").cast("timestamp")), "yyyy-MM-dd"
        ).alias("wk"),
        F.date_format(F.col("ts").cast("timestamp"), "yyyy-MM-dd").alias("d"),
        "user_id",
    )
    daily = e.groupBy("wk", "d").agg(
        F.countDistinct("user_id").cast("bigint").alias("dau")
    )
    weekly = e.groupBy("wk").agg(
        F.countDistinct("user_id").cast("bigint").alias("wau")
    )
    return (
        daily.join(weekly, "wk")
        .groupBy("wk", "wau")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            dround(F.sum("dau").cast("double") / F.count(F.lit(1)), 6).alias(
                "avg_dau"
            ),
            dround(
                F.sum("dau").cast("double") / F.count(F.lit(1)) / F.col("wau"),
                6,
            ).alias("stickiness"),
        )
        .select("wk", "n_days", "avg_dau", "wau", "stickiness")
    )


#: Session path: 30-min inactivity gap (matches sessionize_events),
#: first 5 event types, top 10 paths by session count (with ties).
_PATH_GAP_MIN, _PATH_LEN, _PATH_TOPK = 30, 5, 10


@query(
    "session_path_topk",
    oracle=f"""
    WITH gaps AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                       > INTERVAL {_PATH_GAP_MIN} MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    sess AS (
      SELECT user_id, event_id, ts, event_type,
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
      FROM gaps
    ),
    numbered AS (
      SELECT user_id, session_id, event_type,
             row_number() OVER (PARTITION BY user_id, session_id
                                ORDER BY ts, event_id) AS rn
      FROM sess
    ),
    paths AS (
      SELECT user_id, session_id,
             string_agg(event_type, '>' ORDER BY rn) AS path
      FROM numbered WHERE rn <= {_PATH_LEN}
      GROUP BY user_id, session_id
    ),
    counted AS (
      SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
      FROM paths GROUP BY path
    )
    SELECT path, n_sessions,
           CAST(rank() OVER (ORDER BY n_sessions DESC) AS BIGINT) AS rnk
    FROM counted
    QUALIFY rnk <= {_PATH_TOPK}
    """,
)
def session_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user-journey paths: sessionize on a 30-minute gap (the E8
    cumulative-sum primitive), take each session's first 5 event
    types as a '>'-joined path, rank paths by session count, keep the
    top 10 WITH ties (rank, not row_number — a tie cut would be
    engine-arbitrary). Path assembly is deterministic: events order
    by (ts, event_id) inside the session, Spark builds the string
    from an array_sorted collect_list (order-insensitive to shuffle),
    DuckDB from ORDER BY string_agg. Scale: sessionize is one window
    over user partitions; path counting is a partial-agg shuffle on
    the path string; the rank is over the (small) distinct-path
    set."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
    )
    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.withColumn(
        "is_new",
        F.when(
            F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w_u))
            > _PATH_GAP_MIN * 60 * 1_000_000,
            1,
        ).otherwise(0),
    )
    sess = gaps.withColumn(
        "session_id",
        F.sum("is_new")
        .over(w_u.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint"),
    )
    w_s = Window.partitionBy("user_id", "session_id").orderBy(
        "ts", "event_id"
    )
    numbered = sess.withColumn("rn", F.row_number().over(w_s)).filter(
        F.col("rn") <= _PATH_LEN
    )
    paths = numbered.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("rn", "event_type"))
                ),
                lambda s: s.event_type,
            ),
            ">",
        ).alias("path")
    )
    counted = paths.groupBy("path").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions")
    )
    w_rank = Window.orderBy(F.col("n_sessions").desc())
    return counted.select(
        "path",
        "n_sessions",
        F.rank().over(w_rank).cast("bigint").alias("rnk"),
    ).filter(F.col("rnk") <= _PATH_TOPK)


#: Reorder-point parameters: 7-day replenishment lead time, z = 1.645
#: (95% service level), both exact decimal constants on both engines.
_ROP_LEAD_DAYS, _ROP_Z = 7, 1.645


@query(
    "inventory_reorder_point",
    oracle=f"""
    WITH daily AS (
      SELECT l_partkey, CAST(l_shipdate AS DATE) AS d,
             CAST(floor(sum(l_quantity) + 0.5) AS BIGINT) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    m AS (
      SELECT l_partkey,
             CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(q) AS BIGINT) AS s,
             sum(q * q) AS s2
      FROM daily GROUP BY 1
    )
    SELECT l_partkey, n_days,
           floor(CAST(s AS DOUBLE) / n_days * 1000000 + 0.5) / 1000000
             AS mean_daily,
           floor(sqrt(CAST(n_days * s2 - s * s AS DOUBLE)
                      / (CAST(n_days AS DOUBLE) * (n_days - 1)))
                 * 1000000 + 0.5) / 1000000 AS sd_daily,
           floor((CAST(s AS DOUBLE) / n_days * {_ROP_LEAD_DAYS}
                  + {_ROP_Z} * sqrt({_ROP_LEAD_DAYS})
                    * sqrt(CAST(n_days * s2 - s * s AS DOUBLE)
                           / (CAST(n_days AS DOUBLE) * (n_days - 1))))
                 * 1000000 + 0.5) / 1000000 AS reorder_point
    FROM m WHERE n_days >= 2
    """,
)
def inventory_reorder_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part reorder point under the standard safety-stock model:
    ROP = μ_daily·L + z·√L·σ_daily (L = 7 days lead, z = 1.645 — 95 %
    service). Demand statistics over the part's OBSERVED demand days
    (a no-demand day is no observation, not a zero — the
    intermittent-demand convention; parts with one day drop). Moments
    are exact integers (Σq as BIGINT, Σq² as HUGEINT/DECIMAL — the
    width-budget discipline) and μ/σ/ROP are single double
    expressions, 6 dp pinned. Two partial-agg shuffles (part×day,
    part) — the replenishment-planning table at any fact scale."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        "l_partkey", F.to_date("l_shipdate").alias("d")
    ).agg(F.floor(F.sum("l_quantity") + 0.5).cast("bigint").alias("q"))
    m = daily.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("q").cast("bigint").alias("s"),
        F.sum((F.col("q") * F.col("q")).cast("decimal(38,0)")).alias("s2"),
    )
    mean = F.col("s").cast("double") / F.col("n_days")
    sd = F.sqrt(
        (F.col("n_days") * F.col("s2") - F.col("s") * F.col("s")).cast("double")
        / (F.col("n_days").cast("double") * (F.col("n_days") - 1))
    )
    import math as _math

    return m.filter(F.col("n_days") >= 2).select(
        "l_partkey",
        "n_days",
        dround(mean, 6).alias("mean_daily"),
        dround(sd, 6).alias("sd_daily"),
        dround(
            mean * _ROP_LEAD_DAYS + _ROP_Z * _math.sqrt(_ROP_LEAD_DAYS) * sd,
            6,
        ).alias("reorder_point"),
    )
