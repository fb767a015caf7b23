"""As-of (point-in-time) join — an operator family the reference's
Spark 2.4 surface lacks entirely (no joins exist in the reference at
all, SURVEY.md §2.2), but which every event/orders-style pipeline
needs: "for each left row, the latest right row at-or-before its
timestamp, per key".

Implementation is the union-and-window trick, NOT a range join:

    1. Tag left rows (is_left=1) and right rows (is_left=0), pad each
       side with nulls for the other side's payload, and UNION them.
    2. One window per key ordered by (t, is_left, tiebreak):
       ``last(right_payload, ignorenulls=True)`` over
       rows UNBOUNDED PRECEDING..CURRENT carries the most recent right
       payload forward onto every subsequent left row.
    3. Keep only left rows.

Why this shape at 100 TB: a naive formulation
(`l JOIN r ON key AND r.t <= l.t` + keep-latest) explodes to
O(|l|·|r| per key) intermediate rows before pruning; this one is a
single hash-partition shuffle on the key plus a per-key sort —
O((|l|+|r|) log) with nothing quadratic, and Spark's window exec
spills the sorted run to disk if a key is huge. Ordering
(t, is_left) puts right rows *before* left rows at equal t, giving
at-or-before (<=) semantics; the tiebreak column makes the winner
among equal-t right rows deterministic (greatest wins, because
``last`` sees it last).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | tuple[str, str],
    ts: str | tuple[str, str],
    right_payload: Sequence[str],
    tiebreak: str | None = None,
    suffix: str = "_r",
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """As-of join: each left row gains the payload of the nearest
    right row on the same key (nulls when no such row — left-outer
    semantics). ``direction="backward"`` (default) picks the latest
    right row with ``right.ts <= left.ts``; ``"forward"`` picks the
    earliest with ``right.ts >= left.ts`` — the same union-and-window
    plan with the time ordering reversed, so both directions stay one
    shuffle + one per-key sort.

    on / ts: column name shared by both sides, or (left_name,
    right_name). right_payload: right columns to carry (renamed with
    `suffix` if they collide with a left column). tiebreak: right
    column ordering equal-t right rows (greatest wins). tolerance:
    optional INTERVAL string (e.g. "1 hour" / "30 minutes", the
    pandas merge_asof tolerance) — a carried match farther than this
    from the left timestamp is nulled out AFTER the window (the plan
    is unchanged: the window still carries the nearest candidate;
    tolerance is a post-filter expression, not a join condition, so
    no range-join explosion is reintroduced).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lkey, rkey = (on, on) if isinstance(on, str) else on
    lts, rts = (ts, ts) if isinstance(ts, str) else ts

    out_names = {
        c: (c + suffix if c in left.columns else c) for c in right_payload
    }

    # All right payload columns ride in ONE struct carried by ONE
    # last(ignorenulls=True): carrying each column independently would
    # backfill a NULL payload field from an OLDER right row — mixing
    # columns of different right rows (row-level as-of semantics demand
    # the whole payload come from the single latest right row, nulls
    # included). The struct is NULL on left rows and non-null on every
    # right row, so `last` skips exactly the left rows.
    payload_type = StructType(
        [StructField(out_names[c], right.schema[c].dataType) for c in right_payload]
        + [StructField("__match_t", right.schema[rts].dataType)]
    )
    l_tagged = left.select(
        F.col(lkey).alias("__key"),
        F.col(lts).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast("long").alias("__tb"),
        *[F.col(c) for c in left.columns],
        F.lit(None).cast(payload_type).alias("__rp"),
    )
    r_tagged = right.select(
        F.col(rkey).alias("__key"),
        F.col(rts).alias("__t"),
        F.lit(0).alias("__is_left"),
        (F.col(tiebreak).cast("long") if tiebreak else F.lit(0).cast("long")).alias("__tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
        F.struct(
            *[F.col(c).alias(out_names[c]) for c in right_payload],
            F.col(rts).alias("__match_t"),
        ).alias("__rp"),
    )

    t_order = F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    w = (
        Window.partitionBy("__key")
        .orderBy(t_order, F.col("__is_left").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        "__is_left",
        *[F.col(c) for c in left.columns],
        F.last("__rp", ignorenulls=True).over(w).alias("__rp"),
    )
    lefts = carried.filter(F.col("__is_left") == 1)
    if tolerance is not None:
        gap_ok = (
            F.col("__rp.__match_t") >= F.col(lts) - F.expr(f"INTERVAL {tolerance}")
            if direction == "backward"
            else F.col("__rp.__match_t") <= F.col(lts) + F.expr(f"INTERVAL {tolerance}")
        )
        lefts = lefts.withColumn(
            "__rp", F.when(gap_ok, F.col("__rp"))  # else NULL: out of tolerance
        )
    return lefts.select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"__rp.{out_names[c]}").alias(out_names[c]) for c in right_payload],
    )
