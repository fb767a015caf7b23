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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query


@query(
    "sketch_rollup_hll",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_users_exact,
           TRUE AS estimate_within_5pct
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
