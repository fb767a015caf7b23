"""Time-series analytics over the daily order series: autocorrelation,
seasonal residual anomaly detection, moving-average decomposition,
rolling correlation, consecutive-day streaks, reset running totals,
Kaplan-Meier survival, and exact daily proration.

All correlation/variance statistics are computed from EXACT integer
sums (Σx, Σx², Σxy over bigint counts / floored dollar units) with one
closed-form double expression at the end — not the engines' built-in
``corr``/``stddev`` accumulators, whose partial-merge order is
parallelism-dependent floating point. Exact integer partials make the
statistic bit-reproducible across engines, cluster layouts, and
retries — the only acceptable posture for a 100 TB monitoring metric
that feeds alert thresholds.

The reference has no temporal analytics at all (SURVEY §0: 4 ETL
files); this module is north-star surface (BASELINE.json:6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import dround
from ..sources import load_table
from .registry import query

#: Shared daily rollup of orders: calendar day, order count, exact
#: revenue cents, and whole-dollar / kilodollar integer projections
#: (the units that keep Σy² inside bigint at any SF).
_DAILY_SQL = """
    SELECT CAST(o_orderdate AS DATE) AS d,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS cents
    FROM orders GROUP BY 1
"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")).alias(
            "cents"
        ),
    )


@query(
    "timeseries_acf",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    rn AS (
      SELECT d, n, row_number() OVER (ORDER BY d) AS rn FROM daily
    ),
    lags AS (SELECT unnest(generate_series(1, 7)) AS k),
    pairs AS (
      SELECT l.k, a.n AS x, b.n AS y
      FROM rn a JOIN lags l ON TRUE
      JOIN rn b ON b.rn = a.rn - l.k
    ),
    s AS (
      -- sums stay HUGEINT: the cross-multiplied moment terms
      -- (np*sxx - sx*sx) overflow BIGINT at extreme series scale —
      -- the width-budget discipline of diff_in_diff_estimator
      SELECT k,
             CAST(count(*) AS BIGINT) AS np,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx,
             sum(y * y) AS syy,
             sum(x * y) AS sxy
      FROM pairs GROUP BY k
    )
    SELECT CAST(k AS BIGINT) AS lag, np AS n_pairs,
           CASE WHEN (np * sxx - sx * sx) > 0 AND (np * syy - sy * sy) > 0
                THEN floor(CAST(np * sxy - sx * sy AS DOUBLE)
                           / (sqrt(CAST(np * sxx - sx * sx AS DOUBLE))
                              * sqrt(CAST(np * syy - sy * sy AS DOUBLE)))
                           * 1000000 + 0.5) / 1000000
           END AS acf
    FROM s
    """,
)
def timeseries_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the daily order-count series at row
    lags 1..7 — the seasonality detector (a weekly cycle shows as an
    ACF spike at lag 7) every forecast and anomaly monitor starts
    from. Pearson r per lag from exact integer moment sums (Σx, Σx²,
    Σxy of integer counts, DECIMAL(38,0)/HUGEINT so the derived
    np·Σx²−(Σx)² products can't overflow long at any series scale),
    one closed-form double at the end: the statistic
    is bit-reproducible regardless of partial-agg merge order, which
    built-in corr() is not. Scale: the series is date-cardinality;
    the 7-lag pairing is a dimension-sized self-join after one
    fact-scale partial agg."""
    daily = _daily(spark, sf_dir)
    rn = daily.select(
        "d", "n", F.row_number().over(Window.orderBy("d")).alias("rn")
    )
    lags = spark.range(1, 8).select(F.col("id").alias("k"))
    a = rn.select(F.col("rn").alias("rn_a"), F.col("n").alias("x"))
    b = rn.select(F.col("rn").alias("rn_b"), F.col("n").alias("y"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("rn_b") == F.col("rn_a") - F.col("k"))
        .select("k", "x", "y")
    )
    # DECIMAL(38,0) moments: the derived np*sxx − sx² products overflow
    # long at extreme series scale (same width budget as
    # diff_in_diff_estimator's sf1 probe catch)
    s = pairs.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("np"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
    )
    dx = F.col("np") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("np") * F.col("syy") - F.col("sy") * F.col("sy")
    num = (F.col("np") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    return s.select(
        F.col("k").cast("bigint").alias("lag"),
        F.col("np").alias("n_pairs"),
        F.when(
            (dx > 0) & (dy > 0),
            dround(num / (F.sqrt(dx.cast("double")) * F.sqrt(dy.cast("double"))), 6),
        ).alias("acf"),
    )


@query(
    "anomaly_seasonal_residual",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    keyed AS (
      SELECT d, n,
             (datediff('day', DATE '1970-01-01', d) + 4) % 7 AS dow
      FROM daily
    ),
    stats AS (
      SELECT dow, CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n) AS BIGINT) AS s,
             CAST(sum(n * n) AS BIGINT) AS ss
      FROM keyed GROUP BY dow
    )
    SELECT strftime(a.d, '%Y-%m-%d') AS d,
           a.n,
           CAST(a.dow AS BIGINT) AS dow,
           CASE WHEN st.k > 1 AND (st.k * st.ss - st.s * st.s) > 0
                THEN floor((a.n - CAST(st.s AS DOUBLE) / st.k)
                           / sqrt(CAST(st.k * st.ss - st.s * st.s AS DOUBLE)
                                  / (CAST(st.k AS DOUBLE) * (st.k - 1)))
                           * 1000000 + 0.5) / 1000000
           END AS z,
           coalesce(abs(
             CASE WHEN st.k > 1 AND (st.k * st.ss - st.s * st.s) > 0
                  THEN (a.n - CAST(st.s AS DOUBLE) / st.k)
                       / sqrt(CAST(st.k * st.ss - st.s * st.s AS DOUBLE)
                              / (CAST(st.k AS DOUBLE) * (st.k - 1)))
             END) > 3.0, FALSE) AS is_anomaly
    FROM keyed a JOIN stats st ON st.dow = a.dow
    """,
)
def anomaly_seasonal_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonally-adjusted volume anomaly: each day's order count is
    z-scored against the mean/sample-std of ITS day-of-week — the
    adjustment that stops every Sunday from alarming a naive z-score
    monitor. Variance from exact integer sums ((kΣn² − (Σn)²)/k(k−1)),
    one double expression, dround-pinned; the |z|>3 flag is derived
    independently on each engine. The day is included in its own DOW
    stats (population monitoring, not leave-one-out). Scale: one
    fact-scale daily rollup, then a 7-row broadcast join back."""
    daily = _daily(spark, sf_dir)
    dow = (F.datediff(F.col("d"), F.lit("1970-01-01")) + 4) % 7
    keyed = daily.select("d", "n", dow.alias("dow"))
    stats = keyed.groupBy("dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n").alias("s"),
        F.sum(F.col("n") * F.col("n")).alias("ss"),
    )
    j = keyed.join(F.broadcast(stats), "dow")
    varnum = F.col("k") * F.col("ss") - F.col("s") * F.col("s")
    ok = (F.col("k") > 1) & (varnum > 0)
    z = (F.col("n") - F.col("s").cast("double") / F.col("k")) / F.sqrt(
        varnum.cast("double") / (F.col("k").cast("double") * (F.col("k") - 1))
    )
    return j.select(
        F.date_format("d", "yyyy-MM-dd").alias("d"),
        "n",
        F.col("dow").cast("bigint").alias("dow"),
        F.when(ok, dround(z, 6)).alias("z"),
        F.coalesce(F.abs(F.when(ok, z)) > 3.0, F.lit(False)).alias("is_anomaly"),
    )


@query(
    "seasonal_decompose_ma",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    win AS (
      SELECT d, n,
             CAST(sum(n) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING
                               AND 3 FOLLOWING) AS BIGINT) AS s7,
             count(*) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING
                            AND 3 FOLLOWING) AS c7
      FROM daily
    )
    SELECT strftime(d, '%Y-%m-%d') AS d, n,
           CASE WHEN c7 = 7
                THEN floor(CAST(s7 AS DOUBLE) / 7 * 1000000 + 0.5) / 1000000
           END AS trend,
           CASE WHEN c7 = 7
                THEN floor((n - CAST(s7 AS DOUBLE) / 7) * 1000000 + 0.5)
                     / 1000000
           END AS resid
    FROM win
    """,
)
def seasonal_decompose_ma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical decomposition step 1: centered 7-day moving-average
    trend of the daily series and the detrended residual (NULL at the
    edges where the window is partial — a truncated average would
    bias the trend). Exact Σn over the frame, one double division.
    Scale: date-cardinality windowing after the fact-scale rollup;
    per-key decomposition at scale adds partitionBy to the same
    frame."""
    daily = _daily(spark, sf_dir)
    w = Window.orderBy("d").rowsBetween(-3, 3)
    win = daily.select(
        "d",
        "n",
        F.sum("n").over(w).alias("s7"),
        F.count(F.lit(1)).over(w).alias("c7"),
    )
    full = F.col("c7") == 7
    trend = F.col("s7").cast("double") / 7
    return win.select(
        F.date_format("d", "yyyy-MM-dd").alias("d"),
        "n",
        F.when(full, dround(trend, 6)).alias("trend"),
        F.when(full, dround(F.col("n") - trend, 6)).alias("resid"),
    )


@query(
    "rolling_corr_pair",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    u AS (SELECT d, n AS x, cents // 100000 AS y,
                 row_number() OVER (ORDER BY d) AS rn
          FROM daily),
    win AS (
      -- sums stay HUGEINT: np*sxx - sx*sx overflows BIGINT at extreme
      -- daily volumes (width-budget discipline, see timeseries_acf)
      SELECT d, x, y, rn,
             CAST(count(*) OVER w AS BIGINT) AS np,
             sum(x) OVER w AS sx,
             sum(y) OVER w AS sy,
             sum(x * x) OVER w AS sxx,
             sum(y * y) OVER w AS syy,
             sum(x * y) OVER w AS sxy
      FROM u
      WINDOW w AS (ORDER BY d ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
    )
    SELECT strftime(d, '%Y-%m-%d') AS d,
           CASE WHEN np = 30 AND (np * sxx - sx * sx) > 0
                     AND (np * syy - sy * sy) > 0
                THEN floor(CAST(np * sxy - sx * sy AS DOUBLE)
                           / (sqrt(CAST(np * sxx - sx * sx AS DOUBLE))
                              * sqrt(CAST(np * syy - sy * sy AS DOUBLE)))
                           * 1000000 + 0.5) / 1000000
           END AS corr_30d
    FROM win
    """,
)
def rolling_corr_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-day rolling Pearson correlation between daily order count
    and daily revenue (kilodollar integer units; window moments widen
    to DECIMAL(38,0)/HUGEINT so the derived np·Σy²−(Σy)² products
    can't overflow long at any fact scale). All window sums are
    exact integers; the correlation is one closed-form double per
    row, NULL until the frame is full or when either side is
    constant. The co-movement monitor behind mix-shift detection
    (count up, revenue flat ⇒ basket shrinking). Scale: one ordered
    window over the date-cardinality series."""
    daily = _daily(spark, sf_dir)
    u = daily.select(
        "d",
        F.col("n").alias("x"),
        F.expr("cents div 100000").alias("y"),
    )
    # DECIMAL(38,0) window moments — the np*sxx − sx² products must not
    # overflow long at extreme daily volumes (see timeseries_acf)
    w = Window.orderBy("d").rowsBetween(-29, 0)
    win = u.select(
        "d",
        F.count(F.lit(1)).over(w).cast("bigint").alias("np"),
        F.sum(F.col("x").cast("decimal(38,0)")).over(w).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).over(w).alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).over(w).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).over(w).alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).over(w).alias("sxy"),
    )
    dx = F.col("np") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("np") * F.col("syy") - F.col("sy") * F.col("sy")
    num = (F.col("np") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    return win.select(
        F.date_format("d", "yyyy-MM-dd").alias("d"),
        F.when(
            (F.col("np") == 30) & (dx > 0) & (dy > 0),
            dround(num / (F.sqrt(dx.cast("double")) * F.sqrt(dy.cast("double"))), 6),
        ).alias("corr_30d"),
    )


@query(
    "streak_consecutive_days",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS s,
                   CAST(count(*) AS BIGINT) AS k FROM daily),
    above AS (
      SELECT d FROM daily, tot WHERE n * k > s
    ),
    grouped AS (
      SELECT d,
             datediff('day', DATE '1970-01-01', d)
               - row_number() OVER (ORDER BY d) AS grp
      FROM above
    )
    SELECT strftime(min(d), '%Y-%m-%d') AS start_d,
           strftime(max(d), '%Y-%m-%d') AS end_d,
           CAST(count(*) AS BIGINT) AS len_days
    FROM grouped GROUP BY grp
    HAVING count(*) >= 3
    """,
)
def streak_consecutive_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands streak detection: maximal runs of ≥3
    CONSECUTIVE calendar days with above-average order volume, via
    the epoch_day − row_number() grouping idiom (consecutive days
    share the difference). The above-average test is exact integer
    (n·k > Σn — no float mean), so island membership is
    engine-independent. Scale: the island grouping runs on the
    filtered date-cardinality series; per-key streaks partition the
    row_number by key — same idiom, fully parallel."""
    daily = _daily(spark, sf_dir)
    tot = daily.agg(
        F.sum("n").alias("s"), F.count(F.lit(1)).cast("bigint").alias("k")
    )
    above = (
        daily.crossJoin(F.broadcast(tot))
        .filter(F.col("n") * F.col("k") > F.col("s"))
        .select("d")
    )
    grp = (
        F.datediff(F.col("d"), F.lit("1970-01-01"))
        - F.row_number().over(Window.orderBy("d"))
    )
    return (
        above.select("d", grp.alias("grp"))
        .groupBy("grp")
        .agg(
            F.date_format(F.min("d"), "yyyy-MM-dd").alias("start_d"),
            F.date_format(F.max("d"), "yyyy-MM-dd").alias("end_d"),
            F.count(F.lit(1)).cast("bigint").alias("len_days"),
        )
        .filter(F.col("len_days") >= 3)
        .drop("grp")
    )


@query(
    "window_reset_cumsum",
    oracle="""
    WITH o AS (
      SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS d,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             CASE WHEN o_totalprice > 250000 THEN 1 ELSE 0 END AS boundary
      FROM orders WHERE o_custkey < 300
    ),
    seg AS (
      SELECT *,
             CAST(sum(boundary) OVER (PARTITION BY o_custkey
                                      ORDER BY d, o_orderkey
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS seg_id
      FROM o
    )
    SELECT o_custkey, o_orderkey, strftime(d, '%Y-%m-%d') AS order_date,
           seg_id,
           CAST(sum(cents) OVER (PARTITION BY o_custkey, seg_id
                                 ORDER BY d, o_orderkey
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS running_cents
    FROM seg
    """,
)
def window_reset_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-reset running total: per-customer cumulative spend
    that RESTARTS whenever a boundary event occurs (an order over
    250k — in production: a restock, a statement cut, a counter
    reset). The two-window idiom: cumulative-sum the boundary flags
    to mint a segment id, then cumulative-sum within (key, segment).
    Exact integer cents; deterministic (date, orderkey) ordering.
    Scale: both windows share ONE hash shuffle on the customer key —
    Catalyst collapses same-partitioning windows into one sort."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 300)
        .select(
            "o_custkey",
            "o_orderkey",
            F.to_date("o_orderdate").alias("d"),
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents"),
            F.when(F.col("o_totalprice") > 250000, 1).otherwise(0).alias("boundary"),
        )
    )
    w1 = (
        Window.partitionBy("o_custkey")
        .orderBy("d", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    seg = o.withColumn("seg_id", F.sum("boundary").over(w1).cast("bigint"))
    w2 = (
        Window.partitionBy("o_custkey", "seg_id")
        .orderBy("d", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return seg.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("d", "yyyy-MM-dd").alias("order_date"),
        "seg_id",
        F.sum("cents").over(w2).cast("bigint").alias("running_cents"),
    )


@query(
    "survival_kaplan_meier",
    oracle="""
    WITH u AS (
      SELECT user_id,
             min(ts) AS t0,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp,
             max(ts) AS tlast
      FROM events GROUP BY user_id
    ),
    obs AS (
      SELECT user_id,
             datediff('day', t0, coalesce(tp, tlast)) AS dur,
             CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM u
    ),
    n_tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM obs),
    g AS (
      SELECT dur, CAST(sum(ev) AS BIGINT) AS d_events,
             CAST(count(*) AS BIGINT) AS n_at_dur
      FROM obs GROUP BY dur
    ),
    risk AS (
      SELECT dur, d_events,
             total - (CAST(sum(n_at_dur) OVER (ORDER BY dur
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_at_dur)
               AS n_risk
      FROM g, n_tot
    ),
    km AS (
      SELECT dur, d_events, n_risk,
             exp(sum(ln(greatest(1.0 - CAST(d_events AS DOUBLE) / n_risk,
                                 1e-300)))
                 OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING)) AS surv
      FROM risk WHERE d_events > 0
    )
    SELECT CAST(dur AS BIGINT) AS dur_days, d_events, n_risk,
           floor(surv * 1000000 + 0.5) / 1000000 AS survival
    FROM km
    """,
)
def survival_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for time-to-first-purchase: each
    user is observed from their first event; users who never purchase
    are right-CENSORED at their last event — the estimator that uses
    censored users correctly instead of dropping them (which biases
    conversion-time metrics down). S(t) = Π over event times ≤ t of
    (1 − d/n_risk), computed as exp(Σ ln·) under a deterministic
    ordered window so both engines multiply in the same order;
    ln(greatest(·,1e-300)) guards the d=n_risk terminal factor
    (DuckDB ln(0) errors, Spark returns NULL). Scale: one user-grain
    rollup (the only fact-scale shuffle), then duration-cardinality
    windows."""
    e = load_table(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    u = e.groupBy("user_id").agg(
        F.min(ts).alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase", ts)).alias("tp"),
        F.max(ts).alias("tlast"),
    )
    obs = u.select(
        F.datediff(
            F.to_date(F.coalesce("tp", "tlast")), F.to_date("t0")
        ).alias("dur"),
        F.when(F.col("tp").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    n_tot = obs.agg(F.count(F.lit(1)).cast("bigint").alias("total"))
    g = obs.groupBy("dur").agg(
        F.sum("ev").cast("bigint").alias("d_events"),
        F.count(F.lit(1)).cast("bigint").alias("n_at_dur"),
    )
    w_cum = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    risk = (
        g.crossJoin(F.broadcast(n_tot))
        .withColumn(
            "n_risk",
            F.col("total")
            - (F.sum("n_at_dur").over(w_cum).cast("bigint") - F.col("n_at_dur")),
        )
        .filter(F.col("d_events") > 0)
    )
    factor = F.greatest(
        F.lit(1.0) - F.col("d_events").cast("double") / F.col("n_risk"),
        F.lit(1e-300),
    )
    surv = F.exp(F.sum(F.log(factor)).over(w_cum))
    return risk.select(
        F.col("dur").cast("bigint").alias("dur_days"),
        "d_events",
        "n_risk",
        dround(surv, 6).alias("survival"),
    )


#: Proration span cap (days) — bounds the per-row fan-out of the daily
#: allocation exactly like the basket/shingle caps bound joins.
_ALLOC_MAX_DAYS = 90


@query(
    "interval_allocate_daily",
    oracle=f"""
    WITH base AS (
      SELECT l.l_orderkey, l.l_linenumber,
             CAST(o.o_orderdate AS DATE) AS d0,
             CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
             greatest(least(datediff('day', CAST(o.o_orderdate AS DATE),
                                     CAST(l.l_shipdate AS DATE)) + 1,
                            {_ALLOC_MAX_DAYS}), 1) AS n_days
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1995-02-01 00:00:00'
    ),
    expanded AS (
      SELECT d0 + CAST(i AS INTEGER) AS day,
             cents // n_days
               + CASE WHEN i < cents % n_days THEN 1 ELSE 0 END AS share
      FROM (SELECT *, unnest(generate_series(0, n_days - 1)) AS i FROM base)
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS n_pieces,
           CAST(sum(share) AS BIGINT) AS alloc_cents
    FROM expanded GROUP BY day
    """,
)
def interval_allocate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact daily proration: each January-1995 line item's revenue is
    allocated across the days from order to ship (capped at
    _ALLOC_MAX_DAYS = 90 days), integer-cent exact — base = cents div
    n_days with the remainder given to the EARLIEST days, so the
    shares re-sum to the source to the cent (the accounting
    constraint float proration violates). The revenue-recognition /
    budget-spread primitive. Scale: explode(sequence) is codegen
    generator fan-out bounded by the span cap — n_rows ≤ cap × lines
    with no shuffle until the final daily rollup; the month filter
    prunes the scan (PushedFilters on o_orderdate)."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-02-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    base = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.to_date("o_orderdate").alias("d0"),
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint").alias("cents"),
        # greatest(.,1): a ship-before-order row (present in the
        # synthetic data) must allocate to one day, not fan out a
        # DESCENDING Spark sequence() vs an empty DuckDB series
        F.greatest(
            F.least(
                F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")) + 1,
                F.lit(_ALLOC_MAX_DAYS),
            ),
            F.lit(1),
        ).alias("n_days"),
    )
    expanded = base.select(
        "d0",
        "cents",
        "n_days",
        F.explode(F.sequence(F.lit(0), F.col("n_days") - 1)).alias("i"),
    ).select(
        F.date_add("d0", F.col("i")).alias("day"),
        (
            F.expr("cents div n_days")
            + F.when(F.col("i") < F.col("cents") % F.col("n_days"), 1).otherwise(0)
        ).alias("share"),
    )
    return expanded.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pieces"),
        F.sum("share").cast("bigint").alias("alloc_cents"),
    ).select(
        F.date_format("day", "yyyy-MM-dd").alias("day"), "n_pieces", "alloc_cents"
    )
