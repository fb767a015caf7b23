"""Model-evaluation, association-rule, inequality, statistical-test,
governance, and cohort-migration analytics.

Deterministic-score pattern: where a key needs a "model score", it is
drawn from the portable 60-bit md5 hash family (identical integers on
both engines, SURVEY determinism recipes) — the engine contract under
test is the METRIC arithmetic, not a model. All rank/count inputs stay
exact integers until one final double expression, dround-pinned.

The reference computes no metrics at all (SURVEY §0); this module is
north-star surface (BASELINE.json:6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import dround
from ..sources import load_table
from .registry import query

#: Portable deterministic uniform in [0, 1e6) from a key — Spark side.
def _u6(prefix: str, col: F.Column) -> F.Column:
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(prefix), col.cast("string"))), 1, 15),
            16,
            10,
        ).cast("bigint")
        % 1000000
    )


#: Same uniform — DuckDB spelling.
def _u6_sql(prefix: str, col: str) -> str:
    return (
        f"CAST(('0x' || substring(md5('{prefix}' || CAST({col} AS VARCHAR)),"
        f" 1, 15)) AS BIGINT) % 1000000"
    )


@query(
    "eval_auc_rank",
    oracle=f"""
    WITH scored AS (
      SELECT c_custkey,
             {_u6_sql('auc:', 'c_custkey')} AS u,
             CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END AS y
      FROM customer
    ),
    ranked AS (
      SELECT y, CAST(row_number() OVER (ORDER BY u, c_custkey) AS BIGINT) AS rn
      FROM scored
    ),
    s AS (
      SELECT CAST(sum(CASE WHEN y = 1 THEN rn ELSE 0 END) AS BIGINT)
               AS sum_rank_pos,
             CAST(sum(y) AS BIGINT) AS n_pos,
             CAST(sum(1 - y) AS BIGINT) AS n_neg
      FROM ranked
    )
    SELECT n_pos, n_neg,
           floor(CAST(sum_rank_pos - n_pos * (n_pos + 1) / 2 AS DOUBLE)
                 / (CAST(n_pos AS DOUBLE) * n_neg) * 1000000 + 0.5) / 1000000
             AS auc
    FROM s
    """,
)
def eval_auc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC via the Mann-Whitney rank-sum identity:
    AUC = (Σ rank(positives) − n⁺(n⁺+1)/2) / (n⁺·n⁻) — one sort and
    one aggregation, NO threshold sweep (the O(n·thresholds) naive
    ROC). Ranks are integers under a deterministic (score, key) total
    order, so the statistic is exact until one final division. The
    hash-uniform score makes the fixture engine-portable; a real
    score column drops in unchanged. Scale: the global rank is the
    sort-heavy step — at 100 TB use range-partitioned sort (Spark's
    global window here is the fixture spelling; the identity itself
    parallelizes by scoring per-partition rank offsets)."""
    c = load_table(spark, sf_dir, "customer")
    scored = c.select(
        "c_custkey",
        _u6("auc:", F.col("c_custkey")).alias("u"),
        F.when(F.col("c_acctbal") > 0, 1).otherwise(0).alias("y"),
    )
    ranked = scored.select(
        "y",
        F.row_number().over(Window.orderBy("u", "c_custkey")).cast("bigint").alias("rn"),
    )
    s = ranked.agg(
        F.sum(F.when(F.col("y") == 1, F.col("rn")).otherwise(0)).alias("sum_rank_pos"),
        F.sum("y").cast("bigint").alias("n_pos"),
        F.sum(1 - F.col("y")).cast("bigint").alias("n_neg"),
    )
    auc = (
        F.col("sum_rank_pos") - F.col("n_pos") * (F.col("n_pos") + 1) / 2
    ).cast("double") / (F.col("n_pos").cast("double") * F.col("n_neg"))
    return s.select("n_pos", "n_neg", dround(auc, 6).alias("auc"))


@query(
    "eval_calibration_bins",
    oracle=f"""
    WITH scored AS (
      SELECT {_u6_sql('cal:', 'c_custkey')} AS u,
             CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END AS y
      FROM customer
    ),
    b AS (
      SELECT u // 100000 AS bin,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(u) AS BIGINT) AS sum_u,
             CAST(sum(y) AS BIGINT) AS n_pos
      FROM scored GROUP BY 1
    )
    SELECT CAST(bin AS BIGINT) AS bin, n, n_pos,
           floor(CAST(sum_u AS DOUBLE) / n / 1000000 * 1000000 + 0.5) / 1000000
             AS mean_pred,
           floor(CAST(n_pos AS DOUBLE) / n * 1000000 + 0.5) / 1000000
             AS frac_pos,
           floor(abs(CAST(sum_u AS DOUBLE) / n / 1000000
                     - CAST(n_pos AS DOUBLE) / n) * 1000000 + 0.5) / 1000000
             AS abs_gap
    FROM b
    """,
)
def eval_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram / expected-calibration-error bins: scores
    bucketed into 10 equal-width bins, each reporting mean predicted
    probability vs empirical positive rate and the |gap| that ECE
    weights by n/N. Bin id is integer division of the exact integer
    score (no float binning drift); per-bin sums are exact. One
    partial-agg groupBy over 10 groups — map-side combine makes this
    a single scan at any scale."""
    c = load_table(spark, sf_dir, "customer")
    scored = c.select(
        _u6("cal:", F.col("c_custkey")).alias("u"),
        F.when(F.col("c_acctbal") > 0, 1).otherwise(0).alias("y"),
    )
    b = scored.groupBy(F.expr("u div 100000").alias("bin")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("u").alias("sum_u"),
        F.sum("y").cast("bigint").alias("n_pos"),
    )
    mean_pred = F.col("sum_u").cast("double") / F.col("n") / 1000000
    frac_pos = F.col("n_pos").cast("double") / F.col("n")
    return b.select(
        F.col("bin").cast("bigint").alias("bin"),
        "n",
        "n_pos",
        dround(mean_pred, 6).alias("mean_pred"),
        dround(frac_pos, 6).alias("frac_pos"),
        dround(F.abs(mean_pred - frac_pos), 6).alias("abs_gap"),
    )


#: Association-rule basket cap (distinct items per order) — the
#: market_basket_pairs fan-out discipline.
_RULE_MAX_BASKET = 50
_RULE_MIN_CO = 3


@query(
    "assoc_rules_lift",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
    ),
    ok AS (
      SELECT basket FROM items GROUP BY basket
      HAVING count(*) <= {_RULE_MAX_BASKET}
    ),
    capped AS (SELECT items.* FROM items JOIN ok USING (basket)),
    nb AS (SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n_baskets
           FROM capped),
    freq AS (SELECT item, CAST(count(*) AS BIGINT) AS f FROM capped
             GROUP BY item),
    pairs AS (
      SELECT a.item AS part_a, b.item AS part_b,
             CAST(count(*) AS BIGINT) AS n_co
      FROM capped a JOIN capped b
        ON a.basket = b.basket AND a.item < b.item
      GROUP BY 1, 2
      HAVING count(*) >= {_RULE_MIN_CO}
    )
    SELECT part_a, part_b, n_co,
           fa.f AS n_a, fb.f AS n_b,
           floor(CAST(n_co AS DOUBLE) / fa.f * 1000000 + 0.5) / 1000000
             AS conf_a_to_b,
           floor(CAST(n_co AS DOUBLE) / fb.f * 1000000 + 0.5) / 1000000
             AS conf_b_to_a,
           floor(CAST(n_co AS DOUBLE) * n_baskets / (fa.f * fb.f)
                 * 1000000 + 0.5) / 1000000 AS lift
    FROM pairs
    JOIN freq fa ON fa.item = part_a
    JOIN freq fb ON fb.item = part_b
    CROSS JOIN nb
    """,
)
def assoc_rules_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules with the full metric triple — support count,
    directional confidence, and lift — on order→part baskets: the
    market-basket step AFTER pair counting (market_basket_pairs) that
    turns co-occurrence into ranked rules (lift > 1 ⇒ genuinely
    associated, not just both popular). Baskets above
    _RULE_MAX_BASKET = 50 items are dropped pre-join (bounded fan-out);
    metrics are exact-integer ratios. Scale: pair generation is the
    capped self-equi-join; the two frequency joins are item-dimension
    sized; n_baskets is a 1-row broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
    ).distinct()
    ok = (
        items.groupBy("basket")
        .agg(F.count(F.lit(1)).alias("sz"))
        .filter(F.col("sz") <= _RULE_MAX_BASKET)
        .select("basket")
    )
    capped = items.join(ok, "basket").localCheckpoint()
    nb = capped.agg(
        F.countDistinct("basket").cast("bigint").alias("n_baskets")
    )
    freq = capped.groupBy("item").agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    a = capped.select("basket", F.col("item").alias("part_a"))
    b = capped.select("basket", F.col("item").alias("part_b"))
    pairs = (
        a.join(b, "basket")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_co"))
        .filter(F.col("n_co") >= _RULE_MIN_CO)
    )
    fa = freq.select(F.col("item").alias("part_a"), F.col("f").alias("n_a"))
    fb = freq.select(F.col("item").alias("part_b"), F.col("f").alias("n_b"))
    j = pairs.join(fa, "part_a").join(fb, "part_b").crossJoin(F.broadcast(nb))
    return j.select(
        "part_a",
        "part_b",
        "n_co",
        "n_a",
        "n_b",
        dround(F.col("n_co").cast("double") / F.col("n_a"), 6).alias("conf_a_to_b"),
        dround(F.col("n_co").cast("double") / F.col("n_b"), 6).alias("conf_b_to_a"),
        dround(
            F.col("n_co").cast("double") * F.col("n_baskets")
            / (F.col("n_a") * F.col("n_b")),
            6,
        ).alias("lift"),
    )


@query(
    "lorenz_curve_deciles",
    oracle="""
    WITH spend AS (
      SELECT o_custkey,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey
    ),
    dec AS (
      SELECT cents, ntile(10) OVER (ORDER BY cents, o_custkey) AS decile
      FROM spend
    ),
    g AS (
      SELECT decile, CAST(count(*) AS BIGINT) AS n_cust,
             CAST(sum(cents) AS BIGINT) AS decile_cents
      FROM dec GROUP BY decile
    )
    SELECT CAST(decile AS BIGINT) AS decile, n_cust, decile_cents,
           floor(CAST(sum(decile_cents) OVER (ORDER BY decile
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                 / CAST(sum(decile_cents) OVER () AS DOUBLE)
                 * 1000000 + 0.5) / 1000000 AS cum_share
    FROM g
    """,
)
def lorenz_curve_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve at decile resolution: customers sorted by total
    spend, cut into 10 equal-count groups (deterministic ntile under
    a (spend, key) total order), each reporting its spend mass and
    the cumulative share — the distribution curve the Gini
    coefficient (gini_coefficient) integrates, kept as points for
    concentration dashboards ('bottom 50% of customers hold x% of
    revenue'). Exact cents throughout; one double division per
    decile. Scale: customer-grain rollup shuffles once; the decile
    windows run over 10-row data."""
    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")).alias(
            "cents"
        )
    )
    dec = spend.select(
        "cents",
        F.ntile(10).over(Window.orderBy("cents", "o_custkey")).alias("decile"),
    )
    g = dec.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cust"),
        F.sum("cents").alias("decile_cents"),
    )
    w_cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return g.select(
        F.col("decile").cast("bigint").alias("decile"),
        "n_cust",
        F.col("decile_cents").cast("bigint").alias("decile_cents"),
        dround(
            F.sum("decile_cents").over(w_cum).cast("double")
            / F.sum("decile_cents").over(w_all).cast("double"),
            6,
        ).alias("cum_share"),
    )


@query(
    "feature_impute_median",
    oracle="""
    WITH sim AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 7 = 0 THEN NULL
                  ELSE c_acctbal END AS bal
      FROM customer
    ),
    med AS (
      SELECT CAST(quantile_cont(bal, 0.5) AS DOUBLE) AS m FROM sim
    )
    SELECT c_custkey,
           (bal IS NULL) AS was_missing,
           floor(coalesce(bal, m) * 1000000 + 0.5) / 1000000 AS bal_imputed
    FROM sim, med
    WHERE c_custkey < 500
    """,
)
def feature_impute_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median imputation with a missingness indicator — the baseline
    numeric-feature repair (median, not mean: robust to the heavy
    tail that made feature_robust_scale use IQR). Missing values are
    simulated by key arithmetic (custkey%7 — deterministic, oracle-
    mirrored); the fill value is the EXACT interpolated median of the
    observed values; was_missing is kept as the model feature it
    becomes. Scale: the median is one 1-row aggregate broadcast back
    over the scan — at 100 TB swap percentile for percentile_approx
    and the plan is identical (feature_quantile_bin_approx's GK
    path)."""
    c = load_table(spark, sf_dir, "customer")
    sim = c.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 == 0, F.lit(None)).otherwise(
            F.col("c_acctbal")
        ).alias("bal"),
    )
    med = sim.agg(F.expr("percentile(bal, 0.5)").cast("double").alias("m"))
    return (
        sim.filter(F.col("c_custkey") < 500)
        .crossJoin(F.broadcast(med))
        .select(
            "c_custkey",
            F.col("bal").isNull().alias("was_missing"),
            dround(F.coalesce("bal", "m"), 6).alias("bal_imputed"),
        )
    )


@query(
    "ldiversity_audit",
    oracle="""
    SELECT c_nationkey, c_mktsegment,
           CAST(count(*) AS BIGINT) AS group_n,
           CAST(count(DISTINCT CAST(floor(c_acctbal / 2000.0) AS BIGINT))
                AS BIGINT) AS l_distinct,
           count(DISTINCT CAST(floor(c_acctbal / 2000.0) AS BIGINT)) >= 2
             AS meets_l2
    FROM customer
    GROUP BY c_nationkey, c_mktsegment
    """,
)
def ldiversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — the privacy check k-anonymity
    (kanonymity_audit) misses: a quasi-identifier group can be large
    (k-anonymous) yet expose everyone in it if the SENSITIVE value is
    uniform. Per (nation, segment) group: size, number of distinct
    sensitive-value classes (banded balance), and the l≥2 verdict
    derived independently per engine. One groupBy with a distinct
    count — partial-agg + distinct-aggregate rewrite, scan-bound at
    scale; the release gate is then 'suppress groups failing l'."""
    c = load_table(spark, sf_dir, "customer")
    sens = F.floor(F.col("c_acctbal") / 2000.0).cast("bigint")
    return c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("group_n"),
        F.countDistinct(sens).cast("bigint").alias("l_distinct"),
        (F.countDistinct(sens) >= 2).alias("meets_l2"),
    )


@query(
    "chisq_independence",
    oracle="""
    WITH obs AS (
      SELECT c_mktsegment AS seg,
             CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END AS pos,
             CAST(count(*) AS BIGINT) AS n_obs
      FROM customer GROUP BY 1, 2
    ),
    m AS (
      SELECT seg, pos, n_obs,
             CAST(sum(n_obs) OVER (PARTITION BY seg) AS BIGINT) AS row_tot,
             CAST(sum(n_obs) OVER (PARTITION BY pos) AS BIGINT) AS col_tot,
             CAST(sum(n_obs) OVER () AS BIGINT) AS grand
      FROM obs
    )
    SELECT seg, CAST(pos AS BIGINT) AS pos, n_obs,
           floor(CAST(row_tot AS DOUBLE) * col_tot / grand * 1000000 + 0.5)
             / 1000000 AS expected,
           floor(pow(n_obs - CAST(row_tot AS DOUBLE) * col_tot / grand, 2)
                 / (CAST(row_tot AS DOUBLE) * col_tot / grand)
                 * 1000000 + 0.5) / 1000000 AS chi2_term
    FROM m
    """,
)
def chisq_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence for the segment × solvency
    contingency table: per-cell expected count under independence
    (row·col/N) and the (O−E)²/E contribution whose sum is the χ²
    statistic (df = (r−1)(c−1) — left to the caller with the cell
    grid in hand). Counts exact; expected/terms are one double
    expression. The categorical-association screen run before
    building segment-conditional models. Scale: one conditional
    partial agg to the r×c grid, then windows over ≤10 rows."""
    c = load_table(spark, sf_dir, "customer")
    obs = c.groupBy(
        F.col("c_mktsegment").alias("seg"),
        F.when(F.col("c_acctbal") > 0, 1).otherwise(0).alias("pos"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_obs"))
    w_row = Window.partitionBy("seg")
    w_col = Window.partitionBy("pos")
    w_all = Window.partitionBy()
    m = obs.select(
        "seg",
        "pos",
        "n_obs",
        F.sum("n_obs").over(w_row).cast("bigint").alias("row_tot"),
        F.sum("n_obs").over(w_col).cast("bigint").alias("col_tot"),
        F.sum("n_obs").over(w_all).cast("bigint").alias("grand"),
    )
    e = F.col("row_tot").cast("double") * F.col("col_tot") / F.col("grand")
    return m.select(
        "seg",
        F.col("pos").cast("bigint").alias("pos"),
        "n_obs",
        dround(e, 6).alias("expected"),
        dround(F.pow(F.col("n_obs") - e, 2) / e, 6).alias("chi2_term"),
    )


@query(
    "customer_migration_matrix",
    oracle="""
    WITH y94 AS (
      SELECT o_custkey,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
      GROUP BY 1
    ),
    y95 AS (
      SELECT o_custkey,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY 1
    ),
    j AS (
      SELECT coalesce(a.o_custkey, b.o_custkey) AS ck,
             a.cents AS c94, b.cents AS c95
      FROM y94 a FULL JOIN y95 b ON b.o_custkey = a.o_custkey
    )
    SELECT CASE WHEN c94 IS NULL THEN 'none'
                WHEN c94 < 15000000 THEN 'low'
                WHEN c94 < 40000000 THEN 'mid'
                ELSE 'high' END AS seg_from,
           CASE WHEN c95 IS NULL THEN 'none'
                WHEN c95 < 15000000 THEN 'low'
                WHEN c95 < 40000000 THEN 'mid'
                ELSE 'high' END AS seg_to,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM j GROUP BY 1, 2
    """,
)
def customer_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year segment migration matrix: each customer's spend
    band in 1995 vs 1996 — the first two FULL fixture years; the
    originally drafted 1994 window predates the data (orders start
    1995-01-01) and made every seg_from 'none' (fixed integer-cent
    thresholds — engine-
    independent, unlike quantile bands), with 'none' for customers
    absent from a year — the churn/upgrade/win-back grid behind
    retention planning, and the entity-level complement of
    event_transition_matrix's event-level chain. Scale: two pruned
    year scans aggregate to customer grain (one shuffle each), the
    FULL join is customer-dimension sized, and the matrix is ≤16
    rows via map-side partials."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.sum(
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
    ).alias("cents")

    def year_spend(y0: str, y1: str) -> DataFrame:
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(y0).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(y1).cast("timestamp"))
            )
            .groupBy("o_custkey")
            .agg(cents)
        )

    a = year_spend("1995-01-01 00:00:00", "1996-01-01 00:00:00").select(
        F.col("o_custkey").alias("ck"), F.col("cents").alias("c94")
    )
    b = year_spend("1996-01-01 00:00:00", "1997-01-01 00:00:00").select(
        F.col("o_custkey").alias("ck"), F.col("cents").alias("c95")
    )

    def band(col: str) -> F.Column:
        return (
            F.when(F.col(col).isNull(), "none")
            .when(F.col(col) < 15000000, "low")
            .when(F.col(col) < 40000000, "mid")
            .otherwise("high")
        )

    return (
        a.join(b, "ck", "full")
        .groupBy(band("c94").alias("seg_from"), band("c95").alias("seg_to"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
    )


@query(
    "tcloseness_audit",
    oracle="""
    WITH binned AS (
      SELECT c_mktsegment AS seg,
             CAST(floor(c_acctbal / 2000.0) AS BIGINT) AS sbin
      FROM customer
    ),
    cells AS (
      SELECT seg, sbin, CAST(count(*) AS BIGINT) AS cnt
      FROM binned GROUP BY seg, sbin
    ),
    gbin AS (
      SELECT sbin, CAST(sum(cnt) AS BIGINT) AS gcnt FROM cells GROUP BY sbin
    ),
    grid AS (
      SELECT s.seg, g.sbin,
             coalesce(c.cnt, 0) AS cnt,
             g.gcnt,
             s.n_g,
             t.n
      FROM (SELECT seg, CAST(sum(cnt) AS BIGINT) AS n_g
            FROM cells GROUP BY seg) s
      CROSS JOIN gbin g
      CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS n FROM binned) t
      LEFT JOIN cells c ON c.seg = s.seg AND c.sbin = g.sbin
    ),
    cum AS (
      SELECT seg, n_g, n,
             sum(cnt * n - gcnt * n_g)
               OVER (PARTITION BY seg ORDER BY sbin) AS r,
             CAST(count(*) OVER (PARTITION BY seg) AS BIGINT) AS m
      FROM grid
    )
    SELECT seg, n_g AS group_n,
           floor(sum(abs(CAST(r AS DOUBLE)))
                 / (CAST(n_g AS DOUBLE) * n * (m - 1))
                 * 1000000 + 0.5) / 1000000 AS emd,
           sum(abs(CAST(r AS DOUBLE)))
             / (CAST(n_g AS DOUBLE) * n * (m - 1)) <= 0.2 AS meets_t02
    FROM cum GROUP BY seg, n_g, n, m
    """,
)
def tcloseness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit — the third rung of the privacy-audit ladder
    (k-anonymity → l-diversity → t-closeness): a group can be large
    AND diverse yet still leak if its sensitive-value DISTRIBUTION
    differs from the table's. Per segment: Earth-Mover's Distance
    between the group's banded-balance distribution and the global
    one, under the ordered-attribute ground distance = the mean of
    |cumulative difference| (Li et al.'s formulation). All arithmetic
    exact-integer until the final division: per-bin deviation is the
    cross-multiplied gap cnt·N − gcnt·n_g (no fractions), cumulated
    by a window over the bin order, |·| summed per group, then ONE
    division by n_g·N·(m−1) with a 6 dp pin. Shuffle cost: two
    partial aggs + one window over (segments × bins) — the grid is
    #groups·#bins rows regardless of table size. At extreme row
    counts the cross-product cnt·N wants DECIMAL(38,0) (the
    diff_in_diff width lesson); BIGINT holds to ~3·10^9 rows."""
    c = load_table(spark, sf_dir, "customer")
    binned = c.select(
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") / 2000.0).cast("bigint").alias("sbin"),
    )
    cells = binned.groupBy("seg", "sbin").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    glob = cells.groupBy("sbin").agg(F.sum("cnt").cast("bigint").alias("gcnt"))
    segs = cells.groupBy("seg").agg(F.sum("cnt").cast("bigint").alias("n_g"))
    tot = binned.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    grid = (
        segs.crossJoin(F.broadcast(glob))
        .crossJoin(F.broadcast(tot))
        .join(cells, ["seg", "sbin"], "left")
        .select(
            "seg", "sbin", "n_g", "gcnt", "n",
            F.coalesce(F.col("cnt"), F.lit(0)).cast("bigint").alias("cnt"),
        )
    )
    w = Window.partitionBy("seg").orderBy("sbin")
    cum = grid.select(
        "seg", "n_g", "n",
        F.sum(F.col("cnt") * F.col("n") - F.col("gcnt") * F.col("n_g"))
        .over(w)
        .alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy("seg")).cast("bigint").alias("m"),
    )
    return cum.groupBy("seg").agg(
        F.first("n_g").alias("group_n"),
        dround(
            F.sum(F.abs(F.col("r").cast("double")))
            / (F.first("n_g").cast("double") * F.first("n") * (F.first("m") - 1)),
            6,
        ).alias("emd"),
        (
            F.sum(F.abs(F.col("r").cast("double")))
            / (F.first("n_g").cast("double") * F.first("n") * (F.first("m") - 1))
            <= 0.2
        ).alias("meets_t02"),
    )
