"""foreachBatch sink: streaming upsert into a keyed snapshot store.

The memory-sink keys (windowed.py) cover append/complete semantics;
this covers the third production sink pattern — ``foreachBatch`` with
a MERGE into a keyed table, the idiom for maintaining a "latest state
per key" serving table from an event stream when the target is a
plain table store (parquet/JDBC) rather than a streaming-native sink.

Per micro-batch: reduce the batch to one row per key (last event +
additive count), full-outer merge with the existing snapshot
(last-writer-wins on (event time, event_id), counts add), atomically
replace the snapshot. Batch-reduction means the merge input is
|keys|, not |events|; the merge itself is one equi-join on the key —
the shape that scales to any retained keyspace. The state carries
(last_ts, last_event_id) so the cross-batch ordering is the same
total order as the within-batch reduction — the final snapshot is
identical no matter how the stream was sliced into micro-batches.
foreachBatch hands us (batch_df, batch_id); idempotent retry would
skip an already-applied batch_id, which this docblock pins as the
production contract.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .windowed import _stream_events, _stream_session


def _latest_per_key(df: DataFrame) -> DataFrame:
    """One row per (user_id, event_type): last (ts, event_id)-ordered
    event's value + row count. max_by on the (ts, event_id) struct is
    a partial-aggregable reduction — no window sort."""
    ord_ = F.struct(F.col("ts"), F.col("event_id"))
    return df.groupBy("user_id", "event_type").agg(
        F.max(ord_).alias("last_key"),
        F.max_by("value", ord_).alias("last_value"),
        F.count(F.lit(1)).alias("n_events"),
    ).select(
        "user_id",
        "event_type",
        F.col("last_key.ts").alias("last_ts"),
        F.col("last_key.event_id").alias("last_event_id"),
        "last_value",
        "n_events",
    )


def merge_snapshot(cur: DataFrame, delta: DataFrame) -> DataFrame:
    """Pure MERGE of a ``_latest_per_key`` delta into the current
    snapshot (same schema): one full-outer equi-join on the key;
    last-writer-wins by the (last_ts, last_event_id) total order,
    counts add. Associative over batch slicing: folding any partition
    of the event stream through this merge yields the same snapshot
    (pinned in tests/test_stateful_stream.py)."""
    d = delta.select(
        "user_id",
        "event_type",
        F.col("last_ts").alias("d_ts"),
        F.col("last_event_id").alias("d_eid"),
        F.col("last_value").alias("d_value"),
        F.col("n_events").alias("d_n"),
    )
    cur_key = F.struct(F.col("last_ts"), F.col("last_event_id"))
    d_key = F.struct(F.col("d_ts"), F.col("d_eid"))
    take_delta = F.col("last_ts").isNull() | (d_key >= cur_key)
    pick = lambda dc, cc: (  # noqa: E731
        F.when(F.col("d_ts").isNotNull() & take_delta, dc).otherwise(cc)
    )
    return cur.join(d, ["user_id", "event_type"], "full_outer").select(
        "user_id",
        "event_type",
        pick(F.col("d_ts"), F.col("last_ts")).alias("last_ts"),
        pick(F.col("d_eid"), F.col("last_event_id")).alias("last_event_id"),
        pick(F.col("d_value"), F.col("last_value")).alias("last_value"),
        (
            F.coalesce("n_events", F.lit(0)) + F.coalesce("d_n", F.lit(0))
        ).alias("n_events"),
    )


def stream_upsert_foreachbatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the file-source event stream through a foreachBatch MERGE
    into a parquet snapshot; return the final snapshot."""
    spark = _stream_session(spark)
    target = os.path.join(
        tempfile.gettempdir(), f"rg_upsert_{uuid.uuid4().hex[:12]}"
    )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        delta = _latest_per_key(batch_df)
        if os.path.isdir(target):
            cur = s.read.parquet(target)
            # materialize BEFORE overwriting the path being read
            merged = merge_snapshot(cur, delta).localCheckpoint()
            merged.write.mode("overwrite").parquet(target)
        else:
            delta.write.mode("overwrite").parquet(target)

    ev = _stream_events(spark, sf_dir).select(
        "user_id", "event_type", "ts", "event_id", "value"
    )
    q = (
        ev.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", target + "_chk")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.read.parquet(target).localCheckpoint()
    shutil.rmtree(target, ignore_errors=True)
    shutil.rmtree(target + "_chk", ignore_errors=True)
    return out
