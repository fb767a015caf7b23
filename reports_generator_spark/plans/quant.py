"""Quantitative ops: FIFO lot matching, drawdown, time-decay scoring,
robust Theil-Sen trend, bipartite degree distributions, delta-method
ratio A/B testing, and difference-in-differences.

Registered as tier-1 backlog (same staging the round-5 experiments
batch used): the round-6 window holds 48 changed/new keys, so
`fifo_inventory_matching` rides one of its two spare slots (with
`funnel_window` from analytics.py) and the other six keys here take
their driver rows at the start of round 7; every one is locally
parity-verified at sf0.001/0.01 meanwhile. Determinism: integer cents / integer day arithmetic /
integer moment sums end-to-end, one dround-pinned double per metric
(the integer moment-sum / cents determinism recipes). The reference computes
none of these (SURVEY §0) — north-star engine surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import dround
from ..sources import load_table
from .registry import query


@query(
    "fifo_inventory_matching",
    oracle="""
    WITH flows AS (
      SELECT l_partkey,
             CASE WHEN l_orderkey % 2 = 0 THEN 's' ELSE 'd' END AS side,
             l_orderkey, l_linenumber, l_shipdate,
             CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty
      FROM lineitem
    ),
    iv AS (
      SELECT l_partkey, side, l_orderkey, l_linenumber,
             CAST(sum(qty) OVER w - qty AS BIGINT) AS lo,
             CAST(sum(qty) OVER w AS BIGINT) AS hi
      FROM flows
      WINDOW w AS (PARTITION BY l_partkey, side
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    matched AS (
      SELECT s.l_partkey,
             least(s.hi, d.hi) - greatest(s.lo, d.lo) AS m
      FROM iv s JOIN iv d
        ON s.l_partkey = d.l_partkey AND s.side = 's' AND d.side = 'd'
       AND s.lo < d.hi AND d.lo < s.hi
    )
    SELECT l_partkey,
           CAST(count(*) AS BIGINT) AS n_matches,
           CAST(sum(m) AS BIGINT) AS matched_qty
    FROM matched
    GROUP BY l_partkey
    """,
)
def fifo_inventory_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO lot matching as INTERVAL ALGEBRA: per part, supply lots
    (even orderkeys) and demand lots (odd) each map onto the
    cumulative-quantity number line ([Σqty−qty, Σqty) in arrival
    order); FIFO allocation of demand j to lot i is then EXACTLY the
    overlap of their intervals — least(hi)−greatest(lo) — so the whole
    mutable-queue algorithm becomes one window cumsum and one
    bounded range join, no iteration, no state. Quantities are
    integers, so allocations are exact. Scale: the join is equi on
    partkey with the range as a residual; per-part fan-out is the
    number of OVERLAPPING (lot, demand) pairs — the matching's own
    output size, within a part's own history — never |lots|×|demands|
    across parts. 100 TB shape: hash-shuffle on partkey, window-sort
    within partition, AQE-skew-safe."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.when(F.col("l_orderkey") % 2 == 0, "s").otherwise("d").alias("side"),
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        F.floor(F.col("l_quantity") + 0.5).cast("bigint").alias("qty"),
    )
    w = (
        Window.partitionBy("l_partkey", "side")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    iv = li.select(
        "l_partkey",
        "side",
        (F.sum("qty").over(w) - F.col("qty")).cast("bigint").alias("lo"),
        F.sum("qty").over(w).cast("bigint").alias("hi"),
    )
    s = iv.filter(F.col("side") == "s").select(
        F.col("l_partkey").alias("pk"),
        F.col("lo").alias("s_lo"),
        F.col("hi").alias("s_hi"),
    )
    d = iv.filter(F.col("side") == "d").select(
        F.col("l_partkey").alias("pk2"),
        F.col("lo").alias("d_lo"),
        F.col("hi").alias("d_hi"),
    )
    m = s.join(
        d,
        (F.col("pk") == F.col("pk2"))
        & (F.col("s_lo") < F.col("d_hi"))
        & (F.col("d_lo") < F.col("s_hi")),
    ).select(
        F.col("pk").alias("l_partkey"),
        (
            F.least(F.col("s_hi"), F.col("d_hi"))
            - F.greatest(F.col("s_lo"), F.col("d_lo"))
        ).alias("m"),
    )
    return m.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matches"),
        F.sum("m").cast("bigint").alias("matched_qty"),
    )


@query(
    "max_drawdown_monthly",
    oracle="""
    WITH monthly AS (
      SELECT n_name, strftime(o_orderdate, '%Y-%m') AS m,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS rev_c
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      GROUP BY 1, 2
    ),
    dd AS (
      SELECT n_name, m, rev_c,
             CAST(max(rev_c) OVER (PARTITION BY n_name ORDER BY m
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS peak_c
      FROM monthly
    ),
    ranked AS (
      SELECT n_name, m, rev_c, peak_c,
             CAST(peak_c - rev_c AS BIGINT) AS drawdown_c,
             row_number() OVER (PARTITION BY n_name
                                ORDER BY peak_c - rev_c DESC, m ASC) AS rn
      FROM dd
    )
    SELECT n_name, peak_c, drawdown_c AS max_drawdown_c,
           m AS trough_month
    FROM ranked WHERE rn = 1
    """,
)
def max_drawdown_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of each nation's monthly revenue series: the
    largest peak-to-current drop, with its trough month (earliest-
    month tiebreak, so argmax is total-ordered). Revenue is integer
    cents; the running peak and the drawdown are integer windows —
    nothing float anywhere. Plan: one (nation, month) partial-agg
    shuffle, then two windows over the tiny per-nation series. The
    running-max + argmax pair is the generic 'high-water mark'
    primitive (inventory peaks, queue depth, P&L) at any scale."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    monthly = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", F.date_format("o_orderdate", "yyyy-MM").alias("m"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
            ).cast("bigint").alias("rev_c")
        )
    )
    w_run = (
        Window.partitionBy("n_name")
        .orderBy("m")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dd = monthly.select(
        "n_name",
        "m",
        "rev_c",
        F.max("rev_c").over(w_run).cast("bigint").alias("peak_c"),
    ).withColumn(
        "drawdown_c", (F.col("peak_c") - F.col("rev_c")).cast("bigint")
    )
    w_pick = Window.partitionBy("n_name").orderBy(
        F.col("drawdown_c").desc(), F.col("m").asc()
    )
    return (
        dd.withColumn("rn", F.row_number().over(w_pick))
        .filter(F.col("rn") == 1)
        .select(
            "n_name",
            "peak_c",
            F.col("drawdown_c").alias("max_drawdown_c"),
            F.col("m").alias("trough_month"),
        )
    )


#: Half-life-style decay constant: weight = exp(−age_days / 30).
_DECAY_DAYS = 30


@query(
    "time_decay_score",
    oracle=f"""
    WITH anchored AS (
      SELECT user_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_c,
             CAST(floor((
               (SELECT max(epoch_us(ts)) FROM events) - epoch_us(ts)
             ) / 86400000000.0) AS BIGINT) AS age_days
      FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           floor(sum(v_c * exp(-CAST(age_days AS DOUBLE) / {_DECAY_DAYS}))
                 / 100 * 1000000 + 0.5) / 1000000 AS decay_score
    FROM anchored
    GROUP BY user_id
    """,
)
def time_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential time-decay engagement score per user:
    Σ value·exp(−age/30d), ages anchored to the corpus max timestamp —
    the standard recency-weighted feature (fraud, ranking, churn).
    Age quantizes to WHOLE days from exact integer microseconds, so
    exp() sees identical integer arguments on both engines; value is
    integer cents; the weighted sum is the only float accumulation
    (6 dp pin). One scalar subquery (broadcast max) + one partial-agg
    shuffle on user_id — the same one-pass shape at any scale; decay
    re-anchoring is subtraction, never recomputation."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("v_c"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    max_us = e.agg(F.max("us").alias("max_us"))
    aged = e.crossJoin(F.broadcast(max_us)).select(
        "user_id",
        "v_c",
        F.floor(
            (F.col("max_us") - F.col("us")) / F.lit(86400000000.0)
        ).cast("bigint").alias("age_days"),
    )
    return aged.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        dround(
            F.sum(
                F.col("v_c")
                * F.exp(-F.col("age_days").cast("double") / _DECAY_DAYS)
            )
            / 100,
            6,
        ).alias("decay_score"),
    )


@query(
    "theil_sen_trend",
    oracle="""
    WITH monthly AS (
      SELECT p_brand,
             CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT) AS x,
             CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS y_c
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1, 2
    ),
    slopes AS (
      SELECT a.p_brand,
             CAST(b.y_c - a.y_c AS DOUBLE) / (b.x - a.x) AS slope,
             row_number() OVER (PARTITION BY a.p_brand
                 ORDER BY CAST(b.y_c - a.y_c AS DOUBLE) / (b.x - a.x),
                          a.x, b.x) AS rn,
             count(*) OVER (PARTITION BY a.p_brand) AS np
      FROM monthly a JOIN monthly b
        ON a.p_brand = b.p_brand AND b.x > a.x
    )
    SELECT p_brand,
           CAST(max(np) AS BIGINT) AS n_pairs,
           floor((max(CASE WHEN rn = (np + 1) // 2 THEN slope END)
                  + max(CASE WHEN rn = np // 2 + 1 THEN slope END)) / 2
                 / 100 * 1000000 + 0.5) / 1000000 AS ts_slope
    FROM slopes
    GROUP BY p_brand
    """,
)
def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per brand: the MEDIAN of all pairwise
    slopes of the monthly-revenue series — the 29%-breakdown
    alternative to OLS that one outlier month can't bend. Slopes are
    integer-cents / integer-month ratios, so both engines divide the
    same integers; the median is an exact order statistic (lower+upper
    middle averaged) under a (slope, x1, x2) total order, never an
    interpolating percentile. The pairwise self-join is bounded BY
    CONSTRUCTION: it runs on the aggregated per-brand monthly series
    (≤ ~84 points/brand → ≤ 3.5k pairs), not on raw rows — aggregate
    first, O(k²) on k=months only, the same pre-join discipline as
    market_basket_pairs. Raw-row shuffle happens once, at the monthly
    rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    monthly = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .groupBy(
            "p_brand",
            (F.year("l_shipdate") * 12 + F.month("l_shipdate"))
            .cast("bigint")
            .alias("x"),
        )
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint")
            ).cast("bigint").alias("y_c")
        )
    )
    a = monthly.select(
        F.col("p_brand").alias("brand"),
        F.col("x").alias("x1"),
        F.col("y_c").alias("y1"),
    )
    b = monthly.select(
        F.col("p_brand").alias("brand2"),
        F.col("x").alias("x2"),
        F.col("y_c").alias("y2"),
    )
    pairs = a.join(
        b, (F.col("brand") == F.col("brand2")) & (F.col("x2") > F.col("x1"))
    ).select(
        F.col("brand").alias("p_brand"),
        (
            (F.col("y2") - F.col("y1")).cast("double")
            / (F.col("x2") - F.col("x1"))
        ).alias("slope"),
        "x1",
        "x2",
    )
    w_ord = Window.partitionBy("p_brand").orderBy("slope", "x1", "x2")
    w_all = Window.partitionBy("p_brand")
    ranked = pairs.select(
        "p_brand",
        "slope",
        F.row_number().over(w_ord).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("np"),
    )
    return ranked.groupBy("p_brand").agg(
        F.max("np").cast("bigint").alias("n_pairs"),
        dround(
            (
                F.max(
                    F.when(
                        F.col("rn") == F.floor((F.col("np") + 1) / 2),
                        F.col("slope"),
                    )
                )
                + F.max(
                    F.when(
                        F.col("rn") == F.floor(F.col("np") / 2) + 1,
                        F.col("slope"),
                    )
                )
            )
            / 2
            / 100,
            6,
        ).alias("ts_slope"),
    )


@query(
    "graph_degree_distribution",
    oracle="""
    WITH edges AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pd AS (
      SELECT 'part' AS side, CAST(count(*) AS BIGINT) AS degree
      FROM edges GROUP BY l_partkey
    ),
    od AS (
      SELECT 'order' AS side, CAST(count(*) AS BIGINT) AS degree
      FROM edges GROUP BY l_orderkey
    ),
    both_sides AS (
      SELECT * FROM pd UNION ALL SELECT * FROM od
    )
    SELECT side, degree, CAST(count(*) AS BIGINT) AS n_nodes
    FROM both_sides
    GROUP BY side, degree
    """,
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the order-part bipartite graph, both
    sides: #nodes at each degree — the first diagnostic before any
    graph algorithm (skew detection for [[graph_pagerank]] /
    [[dedup_cluster_cc]]: a power-law hub means salt-or-cap before
    joining). Exact dedup of edges, two per-side degree counts, one
    histogram rollup — three partial-agg shuffles, each output
    strictly smaller; integers end-to-end. The same plan profiles ANY
    edge list at 100 TB (the histogram is at most |distinct degrees|
    rows)."""
    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select("l_orderkey", "l_partkey").distinct()
    pd_ = (
        edges.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
        .select(F.lit("part").alias("side"), "degree")
    )
    od = (
        edges.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
        .select(F.lit("order").alias("side"), "degree")
    )
    return (
        pd_.unionByName(od)
        .groupBy("side", "degree")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    )


@query(
    "ab_test_ratio_delta_method",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             CAST(('0x' || substring(md5('arm:' ||
                    CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 2 AS arm,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS num_c,
             CAST(count(*) AS BIGINT) AS den
      FROM events GROUP BY user_id
    ),
    moments AS (
      -- cross/second moments stay HUGEINT: sums of products of
      -- per-user cents overflow BIGINT at large user counts (same
      -- hardening as diff_in_diff_estimator's sf1 probe catch)
      SELECT arm,
             CAST(count(*) AS BIGINT) AS k,
             CAST(sum(num_c) AS BIGINT) AS sn,
             CAST(sum(den) AS BIGINT) AS sd,
             sum(num_c * num_c) AS snn,
             sum(den * den) AS sdd,
             sum(num_c * den) AS snd
      FROM per_user GROUP BY arm
    ),
    stats AS (
      SELECT arm, k, sn, sd,
             CAST(sn AS DOUBLE) / sd AS r,
             ((CAST(snn AS DOUBLE) - CAST(sn AS DOUBLE) * sn / k)
              - 2 * (CAST(sn AS DOUBLE) / sd)
                  * (CAST(snd AS DOUBLE) - CAST(sn AS DOUBLE) * sd / k)
              + (CAST(sn AS DOUBLE) / sd) * (CAST(sn AS DOUBLE) / sd)
                  * (CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * sd / k))
             / (k - 1) / k
             / ((CAST(sd AS DOUBLE) / k) * (CAST(sd AS DOUBLE) / k)) AS var_r
      FROM moments
    )
    SELECT
      CAST(max(CASE WHEN arm = 0 THEN k END) AS BIGINT) AS k_control,
      CAST(max(CASE WHEN arm = 1 THEN k END) AS BIGINT) AS k_treat,
      floor(max(CASE WHEN arm = 0 THEN r END) / 100 * 1000000 + 0.5)
        / 1000000 AS ratio_control,
      floor(max(CASE WHEN arm = 1 THEN r END) / 100 * 1000000 + 0.5)
        / 1000000 AS ratio_treat,
      floor((max(CASE WHEN arm = 1 THEN r END)
             - max(CASE WHEN arm = 0 THEN r END))
            / sqrt(max(CASE WHEN arm = 1 THEN var_r END)
                   + max(CASE WHEN arm = 0 THEN var_r END))
            * 1000000 + 0.5) / 1000000 AS z
    FROM stats
    """,
)
def ab_test_ratio_delta_method(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B test on a RATIO metric (value per event) with delta-method
    variance: naive per-event z-tests are wrong when the randomization
    unit (user) differs from the analysis unit (event) — the classic
    ratio-metric trap. Var(n̄/d̄) ≈ (var_n − 2r·cov + r²·var_d)/(k·d̄²),
    assembled from SIX integer moment sums (Σn, Σd, Σn², Σd², Σnd, k)
    per arm — exact cents, deterministic md5 arm assignment, one final
    double expression. Complements [[ab_test_zscore]] (mean metric).
    Plan: user rollup shuffle, then a 2-row moment aggregate — the
    cluster-robust A/B shape at any scale."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("v_c"),
    )
    arm = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("arm:"), F.col("user_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % 2
    )
    per_user = e.groupBy("user_id").agg(
        F.sum("v_c").cast("bigint").alias("num_c"),
        F.count(F.lit(1)).cast("bigint").alias("den"),
    ).select(arm.alias("arm"), "num_c", "den")
    moments = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("num_c").cast("bigint").alias("sn"),
        F.sum("den").cast("bigint").alias("sd"),
        F.sum(
            (F.col("num_c") * F.col("num_c")).cast("decimal(38,0)")
        ).alias("snn"),
        F.sum(
            (F.col("den") * F.col("den")).cast("decimal(38,0)")
        ).alias("sdd"),
        F.sum(
            (F.col("num_c") * F.col("den")).cast("decimal(38,0)")
        ).alias("snd"),
    )
    r = F.col("sn").cast("double") / F.col("sd")
    var_r = (
        (
            (F.col("snn").cast("double") - F.col("sn").cast("double") * F.col("sn") / F.col("k"))
            - 2 * r * (F.col("snd").cast("double") - F.col("sn").cast("double") * F.col("sd") / F.col("k"))
            + r * r * (F.col("sdd").cast("double") - F.col("sd").cast("double") * F.col("sd") / F.col("k"))
        )
        / (F.col("k") - 1)
        / F.col("k")
        / ((F.col("sd").cast("double") / F.col("k")) * (F.col("sd").cast("double") / F.col("k")))
    )
    stats = moments.select("arm", "k", r.alias("r"), var_r.alias("var_r"))
    return stats.groupBy().agg(
        F.max(F.when(F.col("arm") == 0, F.col("k"))).cast("bigint").alias("k_control"),
        F.max(F.when(F.col("arm") == 1, F.col("k"))).cast("bigint").alias("k_treat"),
        dround(F.max(F.when(F.col("arm") == 0, F.col("r"))) / 100, 6).alias("ratio_control"),
        dround(F.max(F.when(F.col("arm") == 1, F.col("r"))) / 100, 6).alias("ratio_treat"),
        dround(
            (
                F.max(F.when(F.col("arm") == 1, F.col("r")))
                - F.max(F.when(F.col("arm") == 0, F.col("r")))
            )
            / F.sqrt(
                F.max(F.when(F.col("arm") == 1, F.col("var_r")))
                + F.max(F.when(F.col("arm") == 0, F.col("var_r")))
            ),
            6,
        ).alias("z"),
    )


#: DiD period split: orders up to 1997 = pre, 1998 onward = post.
_DID_SPLIT_YEAR = 1998


@query(
    "diff_in_diff_estimator",
    oracle=f"""
    WITH cells AS (
      SELECT CAST(('0x' || substring(md5('did:' ||
                    CAST(o_custkey AS VARCHAR)), 1, 15)) AS BIGINT) % 2
               AS treat,
             CASE WHEN year(o_orderdate) >= {_DID_SPLIT_YEAR}
                  THEN 1 ELSE 0 END AS post,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS y_c
      FROM orders
    ),
    m AS (
      -- s2 stays HUGEINT: sum of squared cents overflows BIGINT past
      -- ~1.5M rows/cell (caught by the sf1 scale probe)
      SELECT treat, post,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y_c) AS BIGINT) AS s,
             sum(y_c * y_c) AS s2
      FROM cells GROUP BY treat, post
    ),
    wide AS (
      SELECT
        max(CASE WHEN treat = 1 AND post = 1 THEN CAST(s AS DOUBLE) / n END) AS y11,
        max(CASE WHEN treat = 1 AND post = 0 THEN CAST(s AS DOUBLE) / n END) AS y10,
        max(CASE WHEN treat = 0 AND post = 1 THEN CAST(s AS DOUBLE) / n END) AS y01,
        max(CASE WHEN treat = 0 AND post = 0 THEN CAST(s AS DOUBLE) / n END) AS y00,
        max(CASE WHEN treat = 1 AND post = 1 THEN
          ((CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1)) / n END) AS v11,
        max(CASE WHEN treat = 1 AND post = 0 THEN
          ((CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1)) / n END) AS v10,
        max(CASE WHEN treat = 0 AND post = 1 THEN
          ((CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1)) / n END) AS v01,
        max(CASE WHEN treat = 0 AND post = 0 THEN
          ((CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1)) / n END) AS v00,
        CAST(sum(n) AS BIGINT) AS n_total
      FROM m
    )
    SELECT n_total,
           floor((y11 - y10) / 100 * 1000000 + 0.5) / 1000000
             AS treat_delta,
           floor((y01 - y00) / 100 * 1000000 + 0.5) / 1000000
             AS control_delta,
           floor(((y11 - y10) - (y01 - y00)) / 100 * 1000000 + 0.5) / 1000000
             AS did,
           floor(((y11 - y10) - (y01 - y00))
                 / sqrt(v11 + v10 + v01 + v00) * 1000000 + 0.5) / 1000000
             AS t_stat
    FROM wide
    """,
)
def diff_in_diff_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: (treated post − pre) − (control post
    − pre) over a deterministic md5 treatment split and a 1998 period
    split, with the four-cell pooled-variance t statistic. Cell means
    and variances assemble from integer cents moments (n, Σy, Σy²) —
    the whole 2×2 design is ONE partial-agg shuffle into four rows,
    then scalar algebra; the estimator that usually gets a regression
    package is just moment arithmetic at any scale."""
    o = load_table(spark, sf_dir, "orders").select(
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("did:"), F.col("o_custkey").cast("string")
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            % 2
        ).alias("treat"),
        F.when(F.year("o_orderdate") >= _DID_SPLIT_YEAR, 1)
        .otherwise(0)
        .alias("post"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("y_c"),
    )
    # second moment in DECIMAL(38,0): the per-product fits a long, the
    # SUM does not past ~1.5M rows/cell (sf1 scale-probe overflow)
    m = o.groupBy("treat", "post").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y_c").cast("bigint").alias("s"),
        F.sum(
            (F.col("y_c") * F.col("y_c")).cast("decimal(38,0)")
        ).alias("s2"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    sem2 = (
        (F.col("s2").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("n"))
        / (F.col("n") - 1)
        / F.col("n")
    )

    def cell(t: int, p: int, col: F.Column) -> F.Column:
        return F.max(
            F.when((F.col("treat") == t) & (F.col("post") == p), col)
        )

    wide = m.select("treat", "post", "n", mean.alias("mu"), sem2.alias("v"))
    agg = wide.groupBy().agg(
        F.sum("n").cast("bigint").alias("n_total"),
        cell(1, 1, F.col("mu")).alias("y11"),
        cell(1, 0, F.col("mu")).alias("y10"),
        cell(0, 1, F.col("mu")).alias("y01"),
        cell(0, 0, F.col("mu")).alias("y00"),
        cell(1, 1, F.col("v")).alias("v11"),
        cell(1, 0, F.col("v")).alias("v10"),
        cell(0, 1, F.col("v")).alias("v01"),
        cell(0, 0, F.col("v")).alias("v00"),
    )
    did = (F.col("y11") - F.col("y10")) - (F.col("y01") - F.col("y00"))
    return agg.select(
        "n_total",
        dround((F.col("y11") - F.col("y10")) / 100, 6).alias("treat_delta"),
        dround((F.col("y01") - F.col("y00")) / 100, 6).alias("control_delta"),
        dround(did / 100, 6).alias("did"),
        dround(
            did
            / F.sqrt(
                F.col("v11") + F.col("v10") + F.col("v01") + F.col("v00")
            ),
            6,
        ).alias("t_stat"),
    )
