"""Distribution-test and resampling statistics: two-sample KS and
Mann-Whitney U, Poisson-bootstrap confidence intervals, per-group
log-log elasticity, and coefficient-of-variation (XYZ) demand
classification.

Determinism discipline (SURVEY recipes): every test statistic is
assembled from EXACT integer moments — cross-multiplied CDF gaps for
KS, doubled tie-averaged rank sums for U, integer cents and Poisson
weights for the bootstrap, integer quantity moments for CV² — so both
engines compute the SAME final double from the SAME integers, with one
dround pin as belt-and-braces. The reference computes no statistics
(SURVEY §0); this module is north-star engine surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import dround
from ..sources import load_table
from .registry import query

#: Group predicate for the two-sample tests: urgent-ish orders vs rest.
_G1_SQL = "o_orderpriority IN ('1-URGENT', '2-HIGH')"


@query(
    "ks_test_two_sample",
    oracle=f"""
    WITH vals AS (
      SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
             CASE WHEN {_G1_SQL} THEN 1 ELSE 0 END AS g
      FROM orders
    ),
    per_v AS (
      SELECT v, CAST(sum(g) AS BIGINT) AS c1,
             CAST(sum(1 - g) AS BIGINT) AS c2
      FROM vals GROUP BY v
    ),
    cum AS (
      SELECT CAST(sum(c1) OVER (ORDER BY v) AS BIGINT) AS cum1,
             CAST(sum(c2) OVER (ORDER BY v) AS BIGINT) AS cum2,
             CAST(sum(c1) OVER () AS BIGINT) AS n1,
             CAST(sum(c2) OVER () AS BIGINT) AS n2
      FROM per_v
    )
    SELECT n1, n2,
           CAST(max(abs(cum1 * n2 - cum2 * n1)) AS BIGINT) AS d_num,
           floor(CAST(max(abs(cum1 * n2 - cum2 * n1)) AS DOUBLE)
                 / (n1 * n2) * 1000000 + 0.5) / 1000000 AS ks_d
    FROM cum GROUP BY n1, n2
    """,
)
def ks_test_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic, exactly: D is the max
    CDF gap, found as max|cum1·n2 − cum2·n1| over the distinct pooled
    values — an INTEGER cross-multiplication, so the supremum is tie-
    unambiguous and engine-identical; the only float is one final
    division. Plan: one groupBy on the value (partial-agg shuffle
    shrinks the data to distinct values), one global ordered window
    over that already-aggregated set, one scalar max. At 100 TB the
    per-value aggregate is the reducer; the ordered scan runs over
    |distinct values|, not rows (range-partitioned sort if that is
    itself large)."""
    o = load_table(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("v"),
        F.when(F.expr(_G1_SQL), 1).otherwise(0).alias("g"),
    )
    per_v = o.groupBy("v").agg(
        F.sum("g").cast("bigint").alias("c1"),
        F.sum(F.lit(1) - F.col("g")).cast("bigint").alias("c2"),
    )
    w = Window.orderBy("v")
    wall = Window.partitionBy()
    cum = per_v.select(
        F.sum("c1").over(w).alias("cum1"),
        F.sum("c2").over(w).alias("cum2"),
        F.sum("c1").over(wall).alias("n1"),
        F.sum("c2").over(wall).alias("n2"),
    )
    gap = F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1"))
    return cum.groupBy("n1", "n2").agg(
        F.max(gap).cast("bigint").alias("d_num"),
        dround(
            F.max(gap).cast("double") / (F.col("n1") * F.col("n2")), 6
        ).alias("ks_d"),
    )


@query(
    "mann_whitney_u_test",
    oracle=f"""
    WITH vals AS (
      SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
             CASE WHEN {_G1_SQL} THEN 1 ELSE 0 END AS g
      FROM orders
    ),
    per_v AS (
      SELECT v, CAST(sum(g) AS BIGINT) AS c1,
             CAST(count(*) AS BIGINT) AS c
      FROM vals GROUP BY v
    ),
    ranked AS (
      SELECT c1, c,
             CAST(sum(c) OVER (ORDER BY v) - c AS BIGINT) AS cum_before
      FROM per_v
    ),
    s AS (
      SELECT CAST(sum(c1 * (2 * cum_before + c + 1)) AS BIGINT) AS r1_x2,
             CAST(sum(c1) AS BIGINT) AS n1,
             CAST(sum(c - c1) AS BIGINT) AS n2,
             CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(c * c * c - c) AS BIGINT) AS tie_cubes
      FROM ranked
    )
    SELECT n1, n2,
           CAST(r1_x2 - n1 * (n1 + 1) AS BIGINT) AS u1_x2,
           floor((CAST(r1_x2 - n1 * (n1 + 1) AS DOUBLE) / 2
                  - CAST(n1 * n2 AS DOUBLE) / 2)
                 / sqrt(CAST(n1 AS DOUBLE) * n2 / 12
                        * ((n + 1) - CAST(tie_cubes AS DOUBLE)
                                     / (CAST(n AS DOUBLE) * (n - 1))))
                 * 1000000 + 0.5) / 1000000 AS z
    FROM s
    """,
)
def mann_whitney_u_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) with tie-averaged ranks and
    the tie-corrected normal approximation. All rank arithmetic stays
    integer: for a tie group of size c starting after cum_before rows,
    the doubled average rank is 2·cum_before + c + 1, so the doubled
    rank sum r1_x2 and doubled U are exact BIGINTs; the tie correction
    Σ(t³−t) is likewise integer. z is one final double expression from
    those integers — bit-identical across engines, dround-pinned.
    Same scale shape as [[ks_test_two_sample]]: per-value partial agg,
    then a window over distinct values only."""
    o = load_table(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("v"),
        F.when(F.expr(_G1_SQL), 1).otherwise(0).alias("g"),
    )
    per_v = o.groupBy("v").agg(
        F.sum("g").cast("bigint").alias("c1"),
        F.count(F.lit(1)).cast("bigint").alias("c"),
    )
    w = Window.orderBy("v")
    ranked = per_v.select(
        "c1",
        "c",
        (F.sum("c").over(w) - F.col("c")).cast("bigint").alias("cum_before"),
    )
    s = ranked.agg(
        F.sum(
            F.col("c1") * (2 * F.col("cum_before") + F.col("c") + 1)
        ).cast("bigint").alias("r1_x2"),
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum(F.col("c") - F.col("c1")).cast("bigint").alias("n2"),
        F.sum("c").cast("bigint").alias("n"),
        F.sum(
            F.col("c") * F.col("c") * F.col("c") - F.col("c")
        ).cast("bigint").alias("tie_cubes"),
    )
    u1_x2 = F.col("r1_x2") - F.col("n1") * (F.col("n1") + 1)
    mu = (F.col("n1") * F.col("n2")).cast("double") / 2
    var = (
        F.col("n1").cast("double") * F.col("n2") / 12
        * (
            (F.col("n") + 1)
            - F.col("tie_cubes").cast("double")
            / (F.col("n").cast("double") * (F.col("n") - 1))
        )
    )
    return s.select(
        "n1",
        "n2",
        u1_x2.cast("bigint").alias("u1_x2"),
        dround((u1_x2.cast("double") / 2 - mu) / F.sqrt(var), 6).alias("z"),
    )


#: Poisson(1) inverse-CDF thresholds over a u∈[0,1e6) integer uniform:
#: P(X≤k)·1e6 for k = 0..5; u beyond the last threshold draws weight 6.
_POIS = (367879, 735758, 919698, 981011, 996340, 999405)
_B = 64  #: bootstrap replicas


@query(
    "bootstrap_ci_mean",
    oracle=f"""
    WITH drawn AS (
      SELECT b.b,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
             (((o_orderkey * {_B} + b.b) % 2147483648) * 2654435761)
               % 1000000 AS u
      FROM orders CROSS JOIN (SELECT unnest(range({_B})) AS b) b
    ),
    weighted AS (
      SELECT b, v,
             CASE WHEN u < {_POIS[0]} THEN 0
                  WHEN u < {_POIS[1]} THEN 1
                  WHEN u < {_POIS[2]} THEN 2
                  WHEN u < {_POIS[3]} THEN 3
                  WHEN u < {_POIS[4]} THEN 4
                  WHEN u < {_POIS[5]} THEN 5
                  ELSE 6 END AS w
      FROM drawn
    ),
    reps AS (
      SELECT b,
             floor(CAST(sum(w * v) AS DOUBLE) / sum(w) / 100
                   * 1000000 + 0.5) / 1000000 AS mean_b
      FROM weighted GROUP BY b
    ),
    ord AS (
      SELECT mean_b,
             row_number() OVER (ORDER BY mean_b, b) AS rn
      FROM reps
    ),
    full_mean AS (
      SELECT floor(CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                        AS DOUBLE) / count(*) / 100 * 1000000 + 0.5) / 1000000
               AS mean_full
      FROM orders
    )
    SELECT CAST({_B} AS BIGINT) AS b_replicas,
           (SELECT mean_full FROM full_mean) AS mean_full,
           CAST(max(CASE WHEN rn = 2 THEN mean_b END) AS DOUBLE) AS ci_lo,
           CAST(max(CASE WHEN rn = {_B - 1} THEN mean_b END) AS DOUBLE) AS ci_hi
    FROM ord
    """,
)
def bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95 % bootstrap CI for mean(o_totalprice) via the POISSON
    bootstrap — the distributed-bootstrap formulation: instead of
    resampling n rows per replica (a global shuffle per replica), each
    row independently draws a Poisson(1) weight per replica, so all
    _B = 64 replicas materialize as ONE explode → ONE partial-agg
    shuffle of 64 scalar pairs per partition. Weights come from the masked
    multiplicative hash on (orderkey·B + b) — a multiply+mod in
    whole-stage codegen vs a per-(row×replica) string md5, measurably
    cheaper on the exploded relation; its Weyl-sequence structure is
    equidistributed mod 1e6, ample for Poisson draws — through an
    integer inverse-CDF table, so both engines draw the SAME
    multiset. Replica means are dround-pinned BEFORE the
    order-statistic pick (rank 2 / rank B−1 of B=64 ≈ 2.5th/97.5th
    percentile), making the CI endpoints engine-exact. At 100 TB the
    exploded relation never materializes — it streams through the
    hash aggregate; replica count scales the agg state, not the
    shuffle width."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("v"),
    )
    drawn = o.select(
        "v",
        F.explode(F.sequence(F.lit(0), F.lit(_B - 1))).alias("b"),
        F.col("o_orderkey"),
    ).select(
        "b",
        "v",
        (
            (
                (F.col("o_orderkey") * _B + F.col("b"))
                % F.lit(2147483648)
                * F.lit(2654435761)
            )
            % 1000000
        ).alias("u"),
    )
    wcol = (
        F.when(F.col("u") < _POIS[0], 0)
        .when(F.col("u") < _POIS[1], 1)
        .when(F.col("u") < _POIS[2], 2)
        .when(F.col("u") < _POIS[3], 3)
        .when(F.col("u") < _POIS[4], 4)
        .when(F.col("u") < _POIS[5], 5)
        .otherwise(6)
    )
    reps = (
        drawn.select("b", "v", wcol.alias("w"))
        .groupBy("b")
        .agg(
            dround(
                F.sum(F.col("w") * F.col("v")).cast("double")
                / F.sum("w")
                / 100,
                6,
            ).alias("mean_b")
        )
    )
    ordw = Window.orderBy("mean_b", "b")
    ordered = reps.select(
        "mean_b", F.row_number().over(ordw).alias("rn")
    )
    full = o.agg(
        dround(
            F.sum("v").cast("double") / F.count(F.lit(1)) / 100, 6
        ).alias("mean_full")
    )
    ci = ordered.agg(
        F.max(F.when(F.col("rn") == 2, F.col("mean_b")))
        .cast("double")
        .alias("ci_lo"),
        F.max(F.when(F.col("rn") == _B - 1, F.col("mean_b")))
        .cast("double")
        .alias("ci_hi"),
    )
    return full.crossJoin(ci).select(
        F.lit(_B).cast("bigint").alias("b_replicas"),
        "mean_full",
        "ci_lo",
        "ci_hi",
    )


@query(
    "price_elasticity_loglog",
    oracle="""
    WITH pts AS (
      SELECT p_brand,
             ln(l_extendedprice / l_quantity) AS lnp,
             ln(l_quantity) AS lnq
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_quantity > 0 AND l_extendedprice > 0
    )
    SELECT p_brand,
           CAST(regr_count(lnq, lnp) AS BIGINT) AS n,
           floor(regr_slope(lnq, lnp) * 1000000 + 0.5) / 1000000
             AS elasticity,
           floor(regr_r2(lnq, lnp) * 1000000 + 0.5) / 1000000 AS r2
    FROM pts
    GROUP BY p_brand
    """,
)
def price_elasticity_loglog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand price elasticity of demand: the slope of the log-log
    OLS regression ln(qty) ~ ln(unit price) — the standard constant-
    elasticity estimator. Uses the ANSI regr_* aggregates on both
    engines (the same integer moment-sum determinism recipe
    as agg_linear_regression, 6 dp pin). Plan: broadcast-able part
    join, then one partial-agg shuffle carrying 5 moment doubles per
    brand — distributed OLS at any row count."""
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    pts = (
        li.filter((F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0))
        .join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .select(
            "p_brand",
            F.log(F.col("l_extendedprice") / F.col("l_quantity")).alias("lnp"),
            F.log(F.col("l_quantity")).alias("lnq"),
        )
    )
    return pts.groupBy("p_brand").agg(
        F.expr("regr_count(lnq, lnp)").cast("bigint").alias("n"),
        dround(F.expr("regr_slope(lnq, lnp)"), 6).alias("elasticity"),
        dround(F.expr("regr_r2(lnq, lnp)"), 6).alias("r2"),
    )


@query(
    "demand_variability_xyz",
    oracle="""
    WITH monthly AS (
      SELECT l_partkey,
             strftime(l_shipdate, '%Y-%m') AS m,
             CAST(floor(sum(l_quantity) + 0.5) AS BIGINT) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    per_part AS (
      SELECT l_partkey,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(q) AS BIGINT) AS s,
             CAST(sum(q * q) AS BIGINT) AS s2
      FROM monthly GROUP BY 1
    ),
    classed AS (
      SELECT CASE
               WHEN 10000 * (n * s2 - s * s) < 625 * s * s THEN 'X'
               WHEN 4 * (n * s2 - s * s) < s * s THEN 'Y'
               ELSE 'Z'
             END AS xyz_class,
             sqrt(CAST(n * s2 - s * s AS DOUBLE)) / s AS cv
      FROM per_part WHERE s > 0
    )
    SELECT xyz_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           floor(avg(cv) * 1000000 + 0.5) / 1000000 AS avg_cv
    FROM classed
    GROUP BY xyz_class
    """,
)
def demand_variability_xyz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XYZ demand-variability classification: per part, the
    coefficient of variation of its monthly shipped quantity, classed
    X (CV<0.25) / Y (CV<0.5) / Z. The class boundaries are decided by
    INTEGER cross-multiplication of the exact moments (CV² = (nΣq²−S²)
    /S², so CV<t ⟺ (nΣq²−S²)·denom < t²·S²·denom) — no float ever
    reaches a threshold comparison, the classic cross-engine boundary
    flip. Two partial-agg shuffles (part×month, then part); the final
    class rollup is tiny."""
    li = load_table(spark, sf_dir, "lineitem")
    monthly = li.groupBy(
        "l_partkey", F.date_format("l_shipdate", "yyyy-MM").alias("m")
    ).agg(F.floor(F.sum("l_quantity") + 0.5).cast("bigint").alias("q"))
    per_part = monthly.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("q").cast("bigint").alias("s"),
        F.sum(F.col("q") * F.col("q")).cast("bigint").alias("s2"),
    )
    num = F.col("n") * F.col("s2") - F.col("s") * F.col("s")
    s_sq = F.col("s") * F.col("s")
    classed = per_part.filter(F.col("s") > 0).select(
        F.when(10000 * num < 625 * s_sq, "X")
        .when(4 * num < s_sq, "Y")
        .otherwise("Z")
        .alias("xyz_class"),
        (F.sqrt(num.cast("double")) / F.col("s")).alias("cv"),
    )
    return classed.groupBy("xyz_class").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        dround(F.avg("cv"), 6).alias("avg_cv"),
    )


@query(
    "anova_oneway_f",
    oracle="""
    WITH g AS (
      SELECT o_orderpriority AS grp,
             CAST(count(*) AS BIGINT) AS n_g,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS s_g,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                      * CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS DECIMAL(38,0)) AS q_g
      FROM orders GROUP BY o_orderpriority
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n_g) AS BIGINT) AS n,
             CAST(sum(s_g) AS DECIMAL(38,0)) AS s,
             CAST(sum(q_g) AS DECIMAL(38,0)) AS q,
             sum(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE) / n_g) AS between_raw
      FROM g
    )
    SELECT k AS n_groups, n AS n_rows,
           k - 1 AS df_between, n - k AS df_within,
           floor((between_raw - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                 / (k - 1)
                 / ((CAST(q AS DOUBLE) - between_raw) / (n - k))
                 * 1000000 + 0.5) / 1000000 AS f_stat
    FROM tot
    """,
)
def anova_oneway_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F statistic — does order value differ by
    priority class? Assembled from exact integer moments per the
    module discipline: per-group (n, Σcents BIGINT, Σcents²
    DECIMAL(38,0) — the diff_in_diff width lesson), folded into
    SSB = Σ S_g²/n_g − S²/n and SSW = Q − Σ S_g²/n_g with ONE final
    double expression and a 6 dp pin. Two shuffles total (5-row group
    agg + 1-row fold) — partial-aggregable map-side at any scale; the
    k-row fold is the only non-linear step and k = #groups."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    g = o.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum(cents).cast("bigint").alias("s_g"),
        F.sum((cents * cents).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("q_g"),
    )
    tot = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("s_g").cast("decimal(38,0)").alias("s"),
        F.sum("q_g").cast("decimal(38,0)").alias("q"),
        F.sum(
            F.col("s_g").cast("double") * F.col("s_g").cast("double") / F.col("n_g")
        ).alias("between_raw"),
    )
    ssb = F.col("between_raw") - F.col("s").cast("double") * F.col("s").cast(
        "double"
    ) / F.col("n")
    ssw = F.col("q").cast("double") - F.col("between_raw")
    return tot.select(
        F.col("k").alias("n_groups"),
        F.col("n").alias("n_rows"),
        (F.col("k") - 1).alias("df_between"),
        (F.col("n") - F.col("k")).alias("df_within"),
        dround(ssb / (F.col("k") - 1) / (ssw / (F.col("n") - F.col("k"))), 6).alias(
            "f_stat"
        ),
    )
