"""Experimentation, attribution, forecasting, governance-release and
weighted-sampling operators — the decision-analytics layer on top of
the event/order tables.

Registered late in round 5: the driver's 50-key attestation window is
full, so these keys are deliberately tier-1 backlog (registry.py
sorts them directly after this round's window) and will receive their
driver CORRECTNESS rows at the start of round 6; every one is
value-verified against DuckDB locally at sf0.001/0.01 in the
meantime (tests/test_oracle_parity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import dround
from ..sources import load_table
from .registry import query

#: 7-day attribution lookback, in microseconds (exact integer time).
_LOOKBACK_US = 7 * 86400 * 1_000_000


@query(
    "attribution_multi_touch",
    oracle=f"""
    WITH conv AS (
      SELECT user_id, event_id AS conv_id, epoch_us(ts) AS cts
      FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
      SELECT user_id, event_id AS touch_id, event_type AS channel,
             epoch_us(ts) AS tts
      FROM events WHERE event_type IN ('click', 'view')
    ),
    pairs AS (
      SELECT c.conv_id, t.touch_id, t.channel, t.tts,
             row_number() OVER (PARTITION BY c.conv_id
                                ORDER BY t.tts ASC, t.touch_id ASC) AS rn_first,
             row_number() OVER (PARTITION BY c.conv_id
                                ORDER BY t.tts DESC, t.touch_id DESC) AS rn_last,
             count(*) OVER (PARTITION BY c.conv_id) AS n_touches
      FROM conv c JOIN touch t ON t.user_id = c.user_id
      WHERE t.tts < c.cts AND t.tts >= c.cts - {_LOOKBACK_US}
    )
    SELECT channel,
           CAST(count(*) AS BIGINT) AS n_touch_events,
           CAST(count(*) FILTER (WHERE rn_first = 1) AS BIGINT)
             AS first_touch_credit,
           CAST(count(*) FILTER (WHERE rn_last = 1) AS BIGINT)
             AS last_touch_credit,
           floor(sum(1.0 / n_touches) * 1000000 + 0.5) / 1000000
             AS linear_credit
    FROM pairs
    GROUP BY channel
    """,
)
def attribution_multi_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch marketing attribution: every purchase conversion
    credits the click/view touches of the SAME user inside a 7-day
    lookback, under the three standard models in one pass —
    first-touch (1.0 to the earliest touch), last-touch (1.0 to the
    latest), linear (1/n to each). Credits aggregate per channel.

    Time stays exact integer microseconds; the only float is the
    linear 1/n fraction, dround-pinned. Scale: the conversion-touch
    pairing is a user-key EQUI-join (hash shuffle on user_id) with the
    lookback as a post-join range filter — per-user fan-out is bounded
    by one user's 7-day activity, never cross-user; the two
    row_numbers and the count share ONE per-conversion window
    partition. At 100 TB this is the standard sessionized-attribution
    shape: no range-join explosion, AQE handles hot users."""
    e = load_table(spark, sf_dir, "events")
    conv = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("conv_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("cts"),
    )
    touch = e.filter(F.col("event_type").isin("click", "view")).select(
        "user_id",
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("channel"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tts"),
    )
    pairs = conv.join(touch, "user_id").filter(
        (F.col("tts") < F.col("cts"))
        & (F.col("tts") >= F.col("cts") - F.lit(_LOOKBACK_US))
    )
    w_first = Window.partitionBy("conv_id").orderBy(
        F.col("tts").asc(), F.col("touch_id").asc()
    )
    w_last = Window.partitionBy("conv_id").orderBy(
        F.col("tts").desc(), F.col("touch_id").desc()
    )
    w_n = Window.partitionBy("conv_id")
    scored = pairs.select(
        "channel",
        F.row_number().over(w_first).alias("rn_first"),
        F.row_number().over(w_last).alias("rn_last"),
        F.count(F.lit(1)).over(w_n).alias("n_touches"),
    )
    return scored.groupBy("channel").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_touch_events"),
        F.count(F.when(F.col("rn_first") == 1, 1)).cast("bigint").alias(
            "first_touch_credit"
        ),
        F.count(F.when(F.col("rn_last") == 1, 1)).cast("bigint").alias(
            "last_touch_credit"
        ),
        dround(F.sum(F.lit(1.0) / F.col("n_touches")), 6).alias("linear_credit"),
    )


@query(
    "expectations_audit",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT)
             AS null_custkey,
           CAST(count(*) FILTER (WHERE o_totalprice IS NULL
                                    OR o_totalprice <= 0
                                    OR o_totalprice > 600000) AS BIGINT)
             AS range_viol_totalprice,
           CAST(count(*) FILTER (WHERE o_orderstatus NOT IN ('O', 'F', 'P'))
                AS BIGINT) AS enum_viol_status,
           CAST(count(*) FILTER (WHERE NOT regexp_matches(o_orderpriority,
                                                          '^[1-5]-[A-Z ]+$'))
                AS BIGINT) AS regex_viol_priority,
           CAST(count(*) FILTER (
                  WHERE o_orderdate < TIMESTAMP '1992-01-01 00:00:00'
                     OR o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
                AS BIGINT) AS date_viol_orderdate,
           (count(*) FILTER (WHERE o_custkey IS NULL)
            + count(*) FILTER (WHERE o_totalprice IS NULL
                                  OR o_totalprice <= 0
                                  OR o_totalprice > 600000)
            + count(*) FILTER (WHERE o_orderstatus NOT IN ('O', 'F', 'P'))
            + count(*) FILTER (WHERE NOT regexp_matches(o_orderpriority,
                                                        '^[1-5]-[A-Z ]+$'))
            + count(*) FILTER (
                WHERE o_orderdate < TIMESTAMP '1992-01-01 00:00:00'
                   OR o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')) = 0
             AS all_expectations_pass
    FROM orders
    """,
)
def expectations_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-scan data-expectation suite (the Great-Expectations-style
    contract check run before a table is promoted): not-null, numeric
    range, enum membership, regex shape, and date-freshness rules
    evaluated as conditional counts in ONE aggregation pass — N rules
    never cost N scans. `all_expectations_pass` is derived from the
    violation counts INDEPENDENTLY on each engine (no oracle-side TRUE
    literal). At 100 TB this is a map-side partial agg over the scan —
    the cheapest possible audit shape; rules needing cross-row state
    (uniqueness, FK) live in table_diff_audit / fk_integrity_audit."""
    o = load_table(spark, sf_dir, "orders")
    null_ck = F.count(F.when(F.col("o_custkey").isNull(), 1))
    range_tp = F.count(
        F.when(
            F.col("o_totalprice").isNull()
            | (F.col("o_totalprice") <= 0)
            | (F.col("o_totalprice") > 600000),
            1,
        )
    )
    enum_st = F.count(F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1))
    regex_pr = F.count(
        F.when(~F.col("o_orderpriority").rlike(r"^[1-5]-[A-Z ]+$"), 1)
    )
    date_od = F.count(
        F.when(
            (F.col("o_orderdate") < F.lit("1992-01-01 00:00:00").cast("timestamp"))
            | (
                F.col("o_orderdate")
                >= F.lit("1999-01-01 00:00:00").cast("timestamp")
            ),
            1,
        )
    )
    return o.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        null_ck.cast("bigint").alias("null_custkey"),
        range_tp.cast("bigint").alias("range_viol_totalprice"),
        enum_st.cast("bigint").alias("enum_viol_status"),
        regex_pr.cast("bigint").alias("regex_viol_priority"),
        date_od.cast("bigint").alias("date_viol_orderdate"),
        (
            (null_ck + range_tp + enum_st + regex_pr + date_od) == 0
        ).alias("all_expectations_pass"),
    )


@query(
    "forecast_seasonal_naive",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n
      FROM orders GROUP BY 1
    ),
    split AS (SELECT max(d) - 6 AS cutoff FROM daily),
    train AS (
      SELECT (datediff('day', DATE '1970-01-01', d) + 4) % 7 AS dow,
             sum(n) AS s, count(*) AS k
      FROM daily, split WHERE d < cutoff GROUP BY 1
    ),
    test AS (
      SELECT d, n, (datediff('day', DATE '1970-01-01', d) + 4) % 7 AS dow
      FROM daily, split WHERE d >= cutoff
    )
    SELECT strftime(t.d, '%Y-%m-%d') AS d,
           CAST(t.dow AS BIGINT) AS dow,
           CAST(t.n AS BIGINT) AS actual,
           floor(tr.s * 1.0 / tr.k * 1000000 + 0.5) / 1000000 AS forecast,
           floor(abs(t.n - tr.s * 1.0 / tr.k) * 1000000 + 0.5) / 1000000
             AS abs_err,
           floor(abs(t.n - tr.s * 1.0 / tr.k) / t.n * 1000000 + 0.5) / 1000000
             AS ape
    FROM test t JOIN train tr ON tr.dow = t.dow
    """,
)
def forecast_seasonal_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast with a real holdout backtest: the last
    7 days of the daily order-count series are held out, the forecast
    for each held-out day is the per-day-of-week mean of the training
    span, and the per-day absolute/percentage errors come back with
    the forecast — the baseline every fancier model must beat, and the
    standard data-volume expectation monitor for ingest pipelines.

    Exact arithmetic: integer daily counts, per-DOW mean as exact
    Σn/k (one float division, dround-pinned), epoch-day DOW formula
    shared with calendar_dim_generate. Scale: the series is
    date-cardinality (dimension-sized at any fact scale), the cutoff
    is a broadcast 1-row aggregate, and the DOW-mean join is a
    7-row broadcast — nothing here grows with fact rows except the
    initial partial-agg daily rollup."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    cutoff = daily.agg(F.date_sub(F.max("d"), 6).alias("cutoff"))
    dowf = (F.datediff(F.col("d"), F.lit("1970-01-01")) + 4) % 7
    with_cut = daily.crossJoin(F.broadcast(cutoff))
    train = (
        with_cut.filter(F.col("d") < F.col("cutoff"))
        .groupBy(dowf.alias("dow"))
        .agg(F.sum("n").alias("s"), F.count(F.lit(1)).alias("k"))
    )
    fc = F.col("s") * F.lit(1.0) / F.col("k")
    test = with_cut.filter(F.col("d") >= F.col("cutoff")).select(
        "d", "n", dowf.alias("dow")
    )
    return test.join(F.broadcast(train), "dow").select(
        F.date_format("d", "yyyy-MM-dd").alias("d"),
        F.col("dow").cast("bigint"),
        F.col("n").cast("bigint").alias("actual"),
        dround(fc, 6).alias("forecast"),
        dround(F.abs(F.col("n") - fc), 6).alias("abs_err"),
        dround(F.abs(F.col("n") - fc) / F.col("n"), 6).alias("ape"),
    )


@query(
    "ab_test_zscore",
    oracle="""
    WITH u AS (
      SELECT user_id, user_id % 2 AS variant,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY 1, 2
    ),
    v AS (
      SELECT CAST(count(*) FILTER (WHERE variant = 0) AS BIGINT) AS n_a,
             CAST(sum(conv) FILTER (WHERE variant = 0) AS BIGINT) AS conv_a,
             CAST(count(*) FILTER (WHERE variant = 1) AS BIGINT) AS n_b,
             CAST(sum(conv) FILTER (WHERE variant = 1) AS BIGINT) AS conv_b
      FROM u
    )
    SELECT n_a, conv_a, n_b, conv_b,
           floor(conv_a * 1.0 / n_a * 1000000 + 0.5) / 1000000 AS rate_a,
           floor(conv_b * 1.0 / n_b * 1000000 + 0.5) / 1000000 AS rate_b,
           floor((conv_a * 1.0 / n_a - conv_b * 1.0 / n_b)
                 / nullif(sqrt(((conv_a + conv_b) * 1.0 / (n_a + n_b))
                               * (1 - (conv_a + conv_b) * 1.0 / (n_a + n_b))
                               * (1.0 / n_a + 1.0 / n_b)), 0)
                 * 1000000 + 0.5) / 1000000 AS z_score,
           coalesce(abs((conv_a * 1.0 / n_a - conv_b * 1.0 / n_b)
               / nullif(sqrt(((conv_a + conv_b) * 1.0 / (n_a + n_b))
                             * (1 - (conv_a + conv_b) * 1.0 / (n_a + n_b))
                             * (1.0 / n_a + 1.0 / n_b)), 0)) > 1.96, FALSE)
             AS significant_95
    FROM v
    """,
)
def ab_test_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test for an A/B experiment read straight off
    the event log: variant = user_id % 2 (the deterministic hash-split
    stand-in for an assignment table), conversion = user produced at
    least one purchase, pooled-proportion z statistic and the 95%
    verdict. `significant_95` is derived from each engine's own
    arithmetic (no TRUE literal). Scale: one user-grain partial agg
    (the only shuffle), then a 1-row conditional-aggregation reduce —
    the closed-form test costs nothing beyond the user rollup, which
    is why it belongs in-engine instead of exporting samples."""
    e = load_table(spark, sf_dir, "events")
    u = e.groupBy(
        "user_id", (F.col("user_id") % 2).alias("variant")
    ).agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "conv"
        )
    )
    v = u.agg(
        F.count(F.when(F.col("variant") == 0, 1)).cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("variant") == 0, F.col("conv"))).cast("bigint").alias(
            "conv_a"
        ),
        F.count(F.when(F.col("variant") == 1, 1)).cast("bigint").alias("n_b"),
        F.sum(F.when(F.col("variant") == 1, F.col("conv"))).cast("bigint").alias(
            "conv_b"
        ),
    )
    ra = F.col("conv_a") * F.lit(1.0) / F.col("n_a")
    rb = F.col("conv_b") * F.lit(1.0) / F.col("n_b")
    p = (F.col("conv_a") + F.col("conv_b")) * F.lit(1.0) / (
        F.col("n_a") + F.col("n_b")
    )
    denom = F.sqrt(
        p * (1 - p) * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    # nullif(denom, 0): z undefined when the pooled variance is 0
    # (everyone or no one converted) — NULL z, not-significant verdict
    z = (ra - rb) / F.when(denom != 0, denom)
    return v.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        dround(ra, 6).alias("rate_a"),
        dround(rb, 6).alias("rate_b"),
        dround(z, 6).alias("z_score"),
        F.coalesce(F.abs(z) > 1.96, F.lit(False)).alias("significant_95"),
    )


@query(
    "sample_weighted_priority",
    oracle="""
    WITH pri AS (
      SELECT o_orderkey,
             greatest(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT), 1)
               AS w_cents,
             CAST(('0x' || substring(md5('wr:' || CAST(o_orderkey AS VARCHAR)),
                                     1, 15)) AS BIGINT)
               // greatest(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT), 1)
               AS priority
      FROM orders
    )
    SELECT o_orderkey, w_cents, priority
    FROM pri
    ORDER BY priority ASC, o_orderkey ASC
    LIMIT 50
    """,
)
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement via sequential Poisson
    sampling (Ohlsson): each row draws a deterministic uniform from
    the portable 60-bit md5 hash family, priority = u / weight, and
    the k smallest priorities win — high-weight rows get small
    priorities. ENTIRELY integer arithmetic (u as the raw 60-bit hash,
    weight as exact cents, priority as integer division), so both
    engines produce bit-identical priorities — no ln()/pow() float
    path like exponential (A-ES) keys, and re-running on a retried
    partition reproduces the same sample.

    Scale: priority is map-side scalar work; the global k-smallest is
    TakeOrderedAndProject (per-partition top-k, never a full sort);
    the sample stays k-sized at any corpus size. This complements
    sample_reservoir_per_key (unweighted, per-key) with the
    probability-proportional-to-size draw corpus mixing uses."""
    o = load_table(spark, sf_dir, "orders")
    # greatest(.,1): a zero/negative-price row must not NULL the Spark
    # priority while erroring the oracle's integer division (ADVICE r5)
    w_cents = F.greatest(
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint"), F.lit(1)
    )
    u64 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("wr:"), F.col("o_orderkey").cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    staged = o.select(
        "o_orderkey", w_cents.alias("w_cents"), u64.alias("u64")
    )
    pri = staged.select(
        "o_orderkey", "w_cents", F.expr("u64 div w_cents").alias("priority")
    )
    return pri.orderBy(F.col("priority").asc(), F.col("o_orderkey").asc()).limit(50)


@query(
    "dp_noisy_counts",
    oracle="""
    WITH g AS (
      SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_exact
      FROM orders GROUP BY 1
    ),
    seeded AS (
      SELECT o_orderpriority, n_exact,
             (CAST(('0x' || substring(md5('dp:' || o_orderpriority), 1, 15))
                   AS BIGINT) % 1000000 + 0.5) / 1000000.0 AS u
      FROM g
    )
    SELECT o_orderpriority, n_exact,
           floor((CASE WHEN u >= 0.5 THEN -1.0 ELSE 1.0 END)
                 * ln(1 - 2 * abs(u - 0.5)) * -1.0
                 * 1000000 + 0.5) / 1000000 AS noise,
           floor((n_exact + (CASE WHEN u >= 0.5 THEN -1.0 ELSE 1.0 END)
                            * ln(1 - 2 * abs(u - 0.5)) * -1.0)
                 * 1000000 + 0.5) / 1000000 AS noisy_n
    FROM seeded
    """,
)
def dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release (ε = 1 Laplace mechanism)
    over order priorities: noise = Laplace(1/ε) drawn by inverse-CDF
    from a DETERMINISTIC uniform (portable md5 hash of the group key —
    the seeded-noise pattern that makes a DP release reproducible and
    auditable across engines; a production release swaps in a secret
    per-release seed). `n_exact` is kept in the output for the
    cross-engine attestation and would be DROPPED in an actual
    release — the docstring is the contract, the key checks the
    mechanism arithmetic.

    Scale: group-grain partial agg (5 groups), then pure scalar math
    on the group rows — the noise path costs nothing at any fact
    scale. Sensitivity 1 (count query); ε budget composition across
    multiple releases is the caller's ledger."""
    o = load_table(spark, sf_dir, "orders")
    g = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact")
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("dp:"), F.col("o_orderpriority"))), 1, 15
            ),
            16,
            10,
        ).cast("bigint")
        % 1000000
        + 0.5
    ) / 1000000.0
    sign = F.when(u >= 0.5, F.lit(-1.0)).otherwise(F.lit(1.0))
    noise = sign * F.log(1 - 2 * F.abs(u - 0.5)) * F.lit(-1.0)
    return g.select(
        "o_orderpriority",
        "n_exact",
        dround(noise, 6).alias("noise"),
        dround(F.col("n_exact") + noise, 6).alias("noisy_n"),
    )


@query(
    "drift_psi",
    oracle="""
    WITH binned AS (
      SELECT CAST(least(floor(o_totalprice / 60000.0), 9) AS BIGINT) AS bin,
             CASE WHEN o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
                  THEN 1 ELSE 0 END AS is_train
      FROM orders
    ),
    g AS (
      SELECT bin,
             CAST(sum(is_train) AS BIGINT) AS n_a,
             CAST(sum(1 - is_train) AS BIGINT) AS n_b
      FROM binned GROUP BY 1
    ),
    tot AS (SELECT sum(n_a) AS ta, sum(n_b) AS tb FROM g)
    SELECT bin, n_a, n_b,
           floor((n_a + 0.5) / (ta + 5.0) * 1000000 + 0.5) / 1000000 AS p_a,
           floor((n_b + 0.5) / (tb + 5.0) * 1000000 + 0.5) / 1000000 AS p_b,
           floor(((n_b + 0.5) / (tb + 5.0) - (n_a + 0.5) / (ta + 5.0))
                 * ln(((n_b + 0.5) / (tb + 5.0)) / ((n_a + 0.5) / (ta + 5.0)))
                 * 1000000 + 0.5) / 1000000 AS psi_term
    FROM g, tot
    """,
)
def drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index — THE standard feature-drift monitor
    between a training period and a serving period: order totals fall
    into 10 fixed-width bins, and each bin contributes
    (p_serve − p_train)·ln(p_serve/p_train); Σ psi_term > 0.2 is the
    classic retrain trigger. Laplace-smoothed (+0.5 per bin over the
    10-bin grid) so an empty bin never produces ln(0), with the SAME
    smoothing on both engines. Fixed-width bins keep the bin edges
    engine-independent (the quantile-bin variant of this monitor is
    feature_quantile_bin_approx's GK path).

    Scale: one conditional-count partial agg over the scan (bins ×
    2 counters of state), a 1-row total, and scalar math on 10 rows —
    the monitor costs one map-side pass at any fact scale."""
    o = load_table(spark, sf_dir, "orders")
    binned = o.select(
        F.least(F.floor(F.col("o_totalprice") / 60000.0), F.lit(9))
        .cast("bigint")
        .alias("bin"),
        F.when(
            F.col("o_orderdate")
            < F.lit("1996-01-01 00:00:00").cast("timestamp"),
            1,
        )
        .otherwise(0)
        .alias("is_train"),
    )
    g = binned.groupBy("bin").agg(
        F.sum("is_train").cast("bigint").alias("n_a"),
        F.sum(1 - F.col("is_train")).cast("bigint").alias("n_b"),
    )
    tot = g.agg(F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb"))
    j = g.crossJoin(F.broadcast(tot))
    pa = (F.col("n_a") + 0.5) / (F.col("ta") + 5.0)
    pb = (F.col("n_b") + 0.5) / (F.col("tb") + 5.0)
    return j.select(
        "bin",
        "n_a",
        "n_b",
        dround(pa, 6).alias("p_a"),
        dround(pb, 6).alias("p_b"),
        dround((pb - pa) * F.log(pb / pa), 6).alias("psi_term"),
    )


@query(
    "anomaly_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n
      FROM orders GROUP BY 1
    ),
    tot AS (SELECT sum(n) AS s, count(*) AS k FROM daily),
    cus AS (
      SELECT d, n,
             sum(n) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
               - row_number() OVER (ORDER BY d) * (s * 1.0 / k) AS cusum
      FROM daily, tot
    )
    SELECT strftime(d, '%Y-%m-%d') AS d, CAST(n AS BIGINT) AS n,
           floor(cusum * 1000000 + 0.5) / 1000000 AS cusum,
           abs(cusum) = max(abs(cusum)) OVER () AS is_changepoint
    FROM cus
    """,
)
def anomaly_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection over the daily order-count series:
    the cumulative sum of deviations from the series mean peaks (in
    absolute value) at the most likely level-shift point — the
    classic single-changepoint estimator behind pipeline-volume drift
    alarms. Exact arithmetic: integer running Σn minus
    rank·(exact Σn/k mean), one float multiply at the end,
    dround-pinned; the changepoint flag compares each row's |CUSUM|
    to the series max — computed independently on both engines.

    Scale: the series is date-cardinality (the daily rollup is the
    only fact-scale pass), so the ordered windows run over a
    dimension-sized frame; per-key monitoring at scale partitions
    every window by key, same shape."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = daily.agg(F.sum("n").alias("s"), F.count(F.lit(1)).alias("k"))
    j = daily.crossJoin(F.broadcast(tot))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cus = j.select(
        "d",
        "n",
        (
            F.sum("n").over(w)
            - F.row_number().over(Window.orderBy("d"))
            * (F.col("s") * F.lit(1.0) / F.col("k"))
        ).alias("cusum"),
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return cus.select(
        F.date_format("d", "yyyy-MM-dd").alias("d"),
        F.col("n").cast("bigint"),
        dround(F.col("cusum"), 6).alias("cusum"),
        (F.abs("cusum") == F.max(F.abs("cusum")).over(w_all)).alias(
            "is_changepoint"
        ),
    )


@query(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT event_type AS from_event,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts ASC, event_id ASC) AS to_event
      FROM events
    ),
    pairs AS (
      SELECT from_event, to_event, count(*) AS n
      FROM seq WHERE to_event IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT from_event, to_event, CAST(n AS BIGINT) AS n,
           floor(n * 1.0 / sum(n) OVER (PARTITION BY from_event)
                 * 1000000 + 0.5) / 1000000 AS prob
    FROM pairs
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of the user event stream:
    P(next event type | current event type), estimated from every
    consecutive same-user pair — the path-analysis primitive behind
    next-action prediction, funnel-shortcut discovery, and bot
    detection (a near-deterministic row is a script). Transition
    counts are exact; the row-normalized probability is one float
    division, dround-pinned.

    Scale: ONE per-user window (hash shuffle on user_id, per-user
    sort) produces the lagged pairs; the transition aggregation is
    event-type²-bounded (25 cells here) with map-side partials, and
    the row normalization is a window over those cells — nothing
    downstream of the first shuffle grows with fact rows."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    seq = e.select(
        F.col("event_type").alias("from_event"),
        F.lead("event_type").over(w).alias("to_event"),
    ).filter(F.col("to_event").isNotNull())
    pairs = seq.groupBy("from_event", "to_event").agg(
        F.count(F.lit(1)).alias("n")
    )
    w_from = Window.partitionBy("from_event")
    return pairs.select(
        "from_event",
        "to_event",
        F.col("n").cast("bigint").alias("n"),
        dround(F.col("n") * F.lit(1.0) / F.sum("n").over(w_from), 6).alias(
            "prob"
        ),
    )


#: Splice-detection boundary width (tokens) and hot-boundary cap.
_SPLICE_K = 5
_SPLICE_MAX_DF = 50


@query(
    "dedup_splice_overlap",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '')
               AS w
      FROM documents
    ),
    ok AS (SELECT doc_id, w FROM toks WHERE len(w) >= {_SPLICE_K}),
    tails AS (
      SELECT doc_id AS id_a,
             array_to_string(w[greatest(len(w) - {_SPLICE_K} + 1, 1):], ' ')
               AS boundary
      FROM ok
    ),
    heads AS (
      SELECT doc_id AS id_b,
             array_to_string(w[:{_SPLICE_K}], ' ') AS boundary
      FROM ok
    ),
    capped_t AS (
      SELECT id_a, boundary FROM (
        SELECT id_a, boundary,
               count(*) OVER (PARTITION BY boundary) AS df
        FROM tails) WHERE df <= {_SPLICE_MAX_DF}
    ),
    capped_h AS (
      SELECT id_b, boundary FROM (
        SELECT id_b, boundary,
               count(*) OVER (PARTITION BY boundary) AS df
        FROM heads) WHERE df <= {_SPLICE_MAX_DF}
    )
    SELECT t.id_a, h.id_b, t.boundary
    FROM capped_t t JOIN capped_h h ON h.boundary = t.boundary
    WHERE t.id_a <> h.id_b
    """,
)
def dedup_splice_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-document splice detection: doc A's last k tokens equal
    doc B's first k tokens — the crawl-dedup signal for articles
    split across pages (A's continuation is B), which no whole-doc
    or shingle-set dedup catches because the OVERLAP is tiny relative
    to both docs. One equi-join on the k-token boundary string; both
    sides pre-capped on boundary document-frequency (the same hot-key
    discipline as the shingle-df cap: a boilerplate boundary — '(c)
    all rights reserved …' — in f docs would otherwise fan out f²).

    Scale: boundary extraction is shuffle-free array slicing in
    codegen; the join shuffles k-token strings (at 100 TB, hash the
    boundary to 64 bits first — same plan, thinner rows); output is
    bounded by true splice pairs + capped-collision noise."""
    d = load_table(spark, sf_dir, "documents")
    w = F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
    ok = d.select("doc_id", w.alias("w")).filter(F.size("w") >= _SPLICE_K)
    tails = ok.select(
        F.col("doc_id").alias("id_a"),
        F.concat_ws(
            " ",
            F.slice(
                "w", F.greatest(F.size("w") - _SPLICE_K + 1, F.lit(1)), _SPLICE_K
            ),
        ).alias("boundary"),
    )
    heads = ok.select(
        F.col("doc_id").alias("id_b"),
        F.concat_ws(" ", F.slice("w", 1, _SPLICE_K)).alias("boundary"),
    )
    w_df = Window.partitionBy("boundary")
    capped_t = (
        tails.withColumn("df", F.count(F.lit(1)).over(w_df))
        .filter(F.col("df") <= _SPLICE_MAX_DF)
        .drop("df")
    )
    capped_h = (
        heads.withColumn("df", F.count(F.lit(1)).over(w_df))
        .filter(F.col("df") <= _SPLICE_MAX_DF)
        .drop("df")
    )
    return capped_t.join(capped_h, "boundary").filter(
        F.col("id_a") != F.col("id_b")
    ).select("id_a", "id_b", "boundary")
