"""Mergeable-sketch aggregation surface (Apache DataSketches HLL and
RoaringBitmap-backed exact-distinct bitmaps — both built into Spark).

The reference's append-only store (Proof.scala:147-151) recomputes
every read-side aggregate from raw rows; at 100 TB the production
pattern is to persist per-partition SKETCH STATE and merge: sketches
are commutative monoids, so a day's sketch is computed once and the
weekly/monthly/all-time rollup is a merge of tiny binary blobs, never
a rescan. ``incremental_rollup_merge`` (plans/temporal.py) proves the
pattern for count/sum/min/max partials; these two keys prove it for
the hard aggregate — COUNT(DISTINCT) — in both its approximate
(HLL, fixed 2^lgK registers) and exact (bucketed bitmap) form.

Attestation follows the agg_approx_distinct pattern
(plans/relational.py:385): the oracle checks the exact companion plus
a within-tolerance flag, so the sketch estimate is driver-checked
without demanding bit-equality of sketch internals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query


@query(
    "sketch_rollup_hll",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_users_exact,
           (abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
              <= 0.05 * count(DISTINCT user_id)) AS estimate_within_5pct
    FROM events
    GROUP BY event_type
    """,
)
def sketch_rollup_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level HLL sketch rollup: per-(event_type, day) sketches of
    user_id (the granularity you would PERSIST), merged per event_type
    with hll_union_agg — the estimate never touches raw rows again.

    Scale: the daily aggregation is one partial-agg shuffle whose
    payload per group is a fixed-size HLL register array; the rollup
    merge moves |days| tiny blobs per type. The exact companion (and
    its full-width distinct shuffle) exists only for attestation.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sketch"))
    rolled = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est_users")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users_exact")
    )
    tol = (
        F.abs(F.col("est_users") - F.col("n_users_exact"))
        / F.col("n_users_exact")
        <= 0.05
    )
    return exact.join(F.broadcast(rolled), "event_type").select(
        "event_type", "n_users_exact", tol.alias("estimate_within_5pct")
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct-count via bucketed bitmaps: user ids
    map to (bucket, bit position), per-(type, day, bucket) bitmaps are
    constructed (the persistable state), then merged with
    bitmap_or_agg and popcounted. Unlike HLL this is exact, and unlike
    count(DISTINCT) the merge input is |days|·|buckets| fixed-width
    blobs instead of every raw id — the standard exact-distinct
    pattern for incremental pipelines. The bucket dimension also
    hash-spreads one hot type's ids across reducers (a built-in skew
    salt).

    Id domain: verified VALID FOR ALL signed ids on this Spark line —
    bitmap_bucket_number/bitmap_bit_position map non-positive ids to
    bucket <= 0 with a non-negative position (id 0 → (0,0), -3 →
    (0,3)), and the (bucket, pos) mapping is injective across the
    signed range, so the count stays exact with no positive-domain
    precondition. Pinned by tests/test_corpus_ops.py::
    test_bitmap_distinct_signed_id_domain so a Spark upgrade that
    changes the mapping fails loudly instead of silently double
    counting.
    """
    ev = load_table(spark, sf_dir, "events")
    state = ev.select(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        F.bitmap_bucket_number("user_id").alias("bucket"),
        F.bitmap_bit_position("user_id").alias("pos"),
    ).groupBy("event_type", "day", "bucket").agg(
        F.bitmap_construct_agg("pos").alias("bm")
    )
    merged = state.groupBy("event_type", "bucket").agg(
        F.bitmap_count(F.bitmap_or_agg("bm")).alias("n_in_bucket")
    )
    return merged.groupBy("event_type").agg(
        F.sum("n_in_bucket").alias("n_users")
    )


@query(
    "agg_bitmap_intersect",
    oracle="""
    SELECT
      (SELECT count(DISTINCT user_id) FROM events WHERE event_type = 'view')
        AS n_view,
      (SELECT count(DISTINCT user_id) FROM events WHERE event_type = 'purchase')
        AS n_purchase,
      (SELECT count(*) FROM (
         SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
         INTERSECT
         SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
      )) AS n_both
    """,
)
def agg_bitmap_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct-set INTERSECTION from mergeable bitmap state —
    the audience-overlap query ("users who both viewed and purchased")
    that normally forces a double-distinct self-join. Spark ships
    bitmap_or_agg but no bitmap_and_agg, so the intersection comes
    from inclusion-exclusion per bucket:

        |A ∩ B| = Σ_bucket popcount(bm_A) + popcount(bm_B)
                          − popcount(bm_A | bm_B)

    Everything is mergeable fixed-width state: the same per-(type,
    bucket) bitmaps a pipeline would persist incrementally answer the
    overlap without rescanning raw ids. One partial-agg shuffle
    keyed (type, bucket); the bucket dimension spreads hot sets
    across reducers. The driver-checked oracle recomputes all three
    counts via DuckDB set ops."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    state = (
        ev.select(
            "event_type",
            F.bitmap_bucket_number("user_id").alias("bucket"),
            F.bitmap_bit_position("user_id").alias("pos"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.bitmap_construct_agg("pos").alias("bm"))
    )
    per_bucket = (
        state.groupBy("bucket")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "view", F.bitmap_count("bm"))
            ).alias("n_view_b"),
            F.sum(
                F.when(F.col("event_type") == "purchase", F.bitmap_count("bm"))
            ).alias("n_purchase_b"),
            F.bitmap_count(F.bitmap_or_agg("bm")).alias("n_union_b"),
        )
    )
    return per_bucket.agg(
        F.sum("n_view_b").cast("bigint").alias("n_view"),
        F.sum("n_purchase_b").cast("bigint").alias("n_purchase"),
        (
            F.sum("n_view_b") + F.sum("n_purchase_b") - F.sum("n_union_b")
        ).cast("bigint").alias("n_both"),
    )


@query(
    "agg_approx_topk",
    oracle="""
    SELECT user_id, n_events, rank FROM (
      SELECT user_id, count(*) AS n_events,
             row_number() OVER (ORDER BY count(*) DESC, user_id ASC) AS rank
      FROM events GROUP BY user_id
    ) WHERE rank <= 10
    """,
)
def agg_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via the approx_top_k sketch (Spark 4): bounded
    state that merges across partitions, vs an exact global
    groupBy + sort. Below the tracked-item capacity the sketch is
    EXACT, so the driver hash-checks the full (item, count, rank)
    result against DuckDB's exact top-10; above capacity (the 100 TB
    regime) the same query degrades gracefully to approximate counts
    — capacity is the knob, the plan is unchanged. The sketch's own
    tie order is unspecified, so ranking is re-derived
    deterministically (count desc, id asc) from the exploded entries,
    never taken from sketch order."""
    ev = load_table(spark, sf_dir, "events")
    sk = ev.agg(
        F.expr("approx_top_k(user_id, 100000, 100000)").alias("entries")
    )
    items = sk.select(F.explode("entries").alias("e")).select(
        F.col("e.item").alias("user_id"), F.col("e.count").alias("n_events")
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n_events").desc(), F.col("user_id").asc())
    return (
        items.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select(
            "user_id",
            F.col("n_events").cast("bigint").alias("n_events"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


#: Sketch-audit parameters: GK accuracy (rank error ≤ n/accuracy) and
#: the audited quantile levels.
_QA_ACCURACY = 1000
_QA_LEVELS = (0.25, 0.5, 0.75, 0.9)


def _quantile_audit_oracle() -> str:
    """Exact type-1 quantiles (value at rank ceil(q·n) under a
    (value, key) total order) + TRUE bound booleans: the oracle
    recomputes the exact side independently; the sketch side's bound
    check is Spark's own guarantee, asserted as a constant —
    the same quality-attestation shape as dedup_simhash.

    TRUE-literal exemption (documented): within_bound checks the GK
    sketch's rank-error guarantee (|rank(est) − q·n| ≤ n/accuracy) —
    a property of SPARK'S sketch implementation. DuckDB's quantile
    sketch (t-digest) carries no comparable hard rank bound, so a
    DuckDB-side recomputation would certify a different (and weaker)
    invariant; the exact order statistics the bound is measured
    against ARE oracle-recomputed."""
    arms = []
    for q in _QA_LEVELS:
        arms.append(
            f"SELECT '{q}' AS qlevel,\n"
            f"       (SELECT v FROM ranked"
            f" WHERE rn = CAST(ceil({q} * n) AS BIGINT) LIMIT 1)"
            f" AS exact_v,\n"
            f"       TRUE AS within_bound"
        )
    union = "\n    UNION ALL ".join(arms)
    return f"""
    WITH vals AS (
      SELECT o_orderkey,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
      FROM orders
    ),
    ranked AS (
      SELECT v, row_number() OVER (ORDER BY v, o_orderkey) AS rn,
             count(*) OVER () AS n
      FROM vals
    )
    {union}
    """


@query("quantile_sketch_error_audit", oracle=_quantile_audit_oracle())
def quantile_sketch_error_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-error audit of the GK quantile sketch against exact order
    statistics: for each audited level q, the exact type-1 quantile
    (value at rank ceil(q·n)) is recomputed independently by the
    oracle (value-hash-checked), and the sketch side verifies
    percentile_approx's guarantee — the rank of its returned element
    is within n/accuracy of q·n — as a boolean the oracle pins TRUE.
    This is the per-release governance loop for replacing exact
    percentiles with sketches at 100 TB: measure the realized rank
    error BEFORE trusting the sketch for an SLA metric
    ([[agg_approx_percentile]] is the production path this audits).
    Plan: one sketch aggregate (mergeable, one pass), one exact
    order-stat pass over the value column, one rank lookup per
    audited element — all shuffles carry aggregate state, not rows."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("v"),
    )
    n = o.count()
    approxes = o.agg(
        F.percentile_approx(
            "v", list(_QA_LEVELS), _QA_ACCURACY
        ).alias("a")
    ).collect()[0].a
    w = Window.orderBy("v", "o_orderkey")
    ranked = o.select(
        "v", F.row_number().over(w).alias("rn")
    ).localCheckpoint()
    import math as _math

    ks = {q: int(_math.ceil(q * n)) for q in _QA_LEVELS}
    # ONE job for all exact order stats, ONE for all sketch ranks
    exact_rows = ranked.filter(
        F.col("rn").isin(list(ks.values()))
    ).collect()
    exact_by_rn = {r.rn: r.v for r in exact_rows}
    rank_row = ranked.agg(
        *[
            F.count(F.when(F.col("v") <= int(a), 1)).alias(f"r{i}")
            for i, a in enumerate(approxes)
        ]
    ).collect()[0]
    rows = []
    for i, (q, a) in enumerate(zip(_QA_LEVELS, approxes)):
        within = abs(rank_row[f"r{i}"] - q * n) <= n / _QA_ACCURACY + 1
        rows.append((str(q), int(exact_by_rn[ks[q]]), bool(within)))
    return spark.createDataFrame(
        rows, "qlevel string, exact_v bigint, within_bound boolean"
    )


#: Count-Min sketch geometry: 4 rows × 1024 counters. Per-row hashes
#: are the masked multiplicative family (integer-exact on both
#: engines); the four odd multipliers are fixed constants.
_CMS_W = 1024
_CMS_MULTS = (2654435761, 2246822519, 3266489917, 668265263)
_CMS_MASK = 2147483648  # 31-bit pre-mask keeps id*mult inside int64


def _cms_pos_sql(key: str, d: int) -> str:
    return f"(({key} % {_CMS_MASK}) * {_CMS_MULTS[d]}) % {_CMS_W}"


@query(
    "agg_count_min_sketch",
    oracle=f"""
    WITH cnt AS (
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS true_n
      FROM orders GROUP BY o_custkey
    ),
    cells AS (
      {" UNION ALL ".join(
          f'''SELECT {d} AS d, {_cms_pos_sql("o_custkey", d)} AS pos,
                     CAST(count(*) AS BIGINT) AS c
              FROM orders GROUP BY 1, 2'''
          for d in range(4)
      )}
    ),
    probes AS (
      SELECT o_custkey AS probe_key, true_n FROM cnt
      WHERE o_custkey % 97 = 0
    ),
    lookups AS (
      {" UNION ALL ".join(
          f'''SELECT probe_key, true_n, c
              FROM probes JOIN cells
                ON cells.d = {d}
               AND cells.pos = {_cms_pos_sql("probe_key", d)}'''
          for d in range(4)
      )}
    )
    SELECT probe_key, true_n,
           CAST(min(c) AS BIGINT) AS cms_est,
           min(c) >= true_n AS no_underestimate
    FROM lookups GROUP BY probe_key, true_n
    """,
)
def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch — the frequency-estimation member of the
    sketch family (HLL = cardinality, bitmap = exact sets, GK =
    quantiles, topk = heavy hitters; CMS answers 'how often does key
    x occur' in W·D counters regardless of key cardinality). Build:
    each row increments one counter per sketch row (4 masked
    multiplicative hashes — integer-exact cross-engine, the
    bootstrap_ci lesson: never md5 per replicated row), which is ONE
    partial-aggregable groupBy over (d, pos) — 4096 cells total, so
    the shuffle is constant-size at any input scale and sketches
    merge by cell-wise + (the mergeability that makes CMS a
    distributed-agg primitive). Probe: ~1% of customers look up
    min over their 4 counters; the CMS guarantee est ≥ true is
    attested per probe (no_underestimate), and the estimates
    themselves hash-match because every counter is an exact integer
    count."""
    o = load_table(spark, sf_dir, "orders")
    pos = [
        ((F.col("o_custkey") % _CMS_MASK) * F.lit(m) % _CMS_W).cast("bigint")
        for m in _CMS_MULTS
    ]
    cells = (
        o.select(
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(d).alias("d"), pos[d].alias("pos"))
                        for d in range(4)
                    ]
                )
            ).alias("cell")
        )
        .select("cell.d", "cell.pos")
        .groupBy("d", "pos")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    probes = (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("true_n"))
        .filter(F.col("o_custkey") % 97 == 0)
        .select(F.col("o_custkey").alias("probe_key"), "true_n")
    )
    lookups = None
    for d in range(4):
        ppos = ((F.col("probe_key") % _CMS_MASK) * F.lit(_CMS_MULTS[d]) % _CMS_W).cast(
            "bigint"
        )
        piece = probes.withColumn("d", F.lit(d)).withColumn("pos", ppos).join(
            F.broadcast(cells), ["d", "pos"]
        ).select("probe_key", "true_n", "c")
        lookups = piece if lookups is None else lookups.unionByName(piece)
    return lookups.groupBy("probe_key", "true_n").agg(
        F.min("c").cast("bigint").alias("cms_est"),
        (F.min("c") >= F.col("true_n")).alias("no_underestimate"),
    )


@query(
    "agg_hll_intersect_estimate",
    oracle="""
    WITH a AS (SELECT DISTINCT o_custkey FROM orders
               WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')),
         b AS (SELECT DISTINCT o_custkey FROM orders
               WHERE o_orderstatus = 'O')
    SELECT CAST((SELECT count(*) FROM a) AS BIGINT) AS n_a_exact,
           CAST((SELECT count(*) FROM b) AS BIGINT) AS n_b_exact,
           CAST((SELECT count(*) FROM a JOIN b USING (o_custkey)) AS BIGINT)
             AS n_and_exact,
           -- DuckDB derives the SAME inclusion-exclusion estimate from
           -- its OWN three HLLs and checks the band itself
           (SELECT abs(
              ((SELECT approx_count_distinct(o_custkey) FROM orders
                WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
               + (SELECT approx_count_distinct(o_custkey) FROM orders
                  WHERE o_orderstatus = 'O')
               - (SELECT approx_count_distinct(o_custkey) FROM orders
                  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
                     OR o_orderstatus = 'O'))
              - (SELECT count(*) FROM a JOIN b USING (o_custkey)))
            <= 0.15 * (SELECT count(*) FROM a JOIN b USING (o_custkey)))
             AS estimate_within_15pct
    FROM (SELECT 1)
    """,
)
def agg_hll_intersect_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch algebra: estimate |A ∩ B| from three HyperLogLog
    cardinalities via inclusion-exclusion (|A|+|B|−|A∪B|) — the
    audience-overlap question answered WITHOUT materializing either
    set or joining them (HLLs union by merge; at 100 TB the three
    sketches are partial-aggregable single passes, vs the exact path's
    distinct+join shuffle). The intersection estimate compounds the
    error of three sketches, so its band is wider than one sketch's
    2% (±15% here against the urgent∩open overlap of ~50% — the
    attestation documents exactly the compounding the exact bitmap
    key, agg_bitmap_intersect, avoids when keys are dense integers).
    Exact companion counts computed per-engine; the estimate itself
    is engine-internal (HLL implementations differ), hence the
    boolean + exact-counts oracle — the agg_approx_distinct pattern."""
    o = load_table(spark, sf_dir, "orders")
    in_a = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    in_b = F.col("o_orderstatus") == "O"
    est = o.agg(
        F.approx_count_distinct(F.when(in_a, F.col("o_custkey")), 0.01).alias("ea"),
        F.approx_count_distinct(F.when(in_b, F.col("o_custkey")), 0.01).alias("eb"),
        F.approx_count_distinct(
            F.when(in_a | in_b, F.col("o_custkey")), 0.01
        ).alias("eu"),
    )
    # exact companions: SET semantics — a customer is in A if ANY of
    # its rows satisfies A (per-key flag fold), so A∩B is the set
    # intersection the sketch estimates, NOT same-row conjunction
    flags = o.groupBy("o_custkey").agg(
        F.max(in_a.cast("int")).alias("fa"), F.max(in_b.cast("int")).alias("fb")
    )
    exact = flags.agg(
        F.sum("fa").cast("bigint").alias("n_a_exact"),
        F.sum("fb").cast("bigint").alias("n_b_exact"),
        F.sum((F.col("fa") * F.col("fb"))).cast("bigint").alias("n_and_exact"),
    )
    j = exact.join(F.broadcast(est))
    est_and = F.col("ea") + F.col("eb") - F.col("eu")
    ok = (
        F.abs(est_and - F.col("n_and_exact")) / F.greatest(F.col("n_and_exact"), F.lit(1))
        <= 0.15
    )
    return j.select(
        "n_a_exact", "n_b_exact", "n_and_exact", ok.alias("estimate_within_15pct")
    )
