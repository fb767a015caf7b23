"""applyInPandasWithState sessionization: cross-micro-batch state
continuation — a session split across two batches must merge via the
carried open-session state (the property the batch-parity oracle can't
see, since availableNow at sf fixtures is a single batch)."""

from __future__ import annotations

import datetime as dt
import os
import uuid

from pyspark.sql import Window, functions as F

from reports_generator_spark.streaming.stateful import sessionize_stream

T0 = dt.datetime(2026, 1, 1, 12, 0, 0)


def _mins(m: int) -> dt.datetime:
    return T0 + dt.timedelta(minutes=m)


def _write_mtime_ordered_batches(spark, src_dir, frames):
    """Write each DataFrame as ONE parquet file under src_dir with
    strictly increasing mtimes — the file-source batch-order fixture
    convention (mtime = batch order, one file per micro-batch) shared
    by every multi-batch streaming test."""
    import shutil as _sh
    import tempfile as _tf

    os.makedirs(src_dir, exist_ok=True)
    t0 = 1_600_000_000
    for i, df in enumerate(frames):
        tmp = _tf.mkdtemp(prefix="rg_batchfix_")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        fn = [x for x in os.listdir(tmp) if x.endswith(".parquet")][0]
        dst = os.path.join(src_dir, f"batch-{i}.parquet")
        _sh.copy(os.path.join(tmp, fn), dst)
        os.utime(dst, (t0 + 100 * i, t0 + 100 * i))
        _sh.rmtree(tmp)


def test_session_merges_across_micro_batches(spark, tmp_path):
    src = tmp_path / "events_stream"
    src.mkdir()
    schema = "user_id long, event_id long, ts timestamp, value double"

    # batch 1: two events 10 min apart; batch 2: +20 min (same session,
    # within gap of the open state) and +3 h (new session)
    b1 = [(1, 1, _mins(0), 1.0), (1, 2, _mins(10), 2.0)]
    b2 = [(1, 3, _mins(20), 4.0), (1, 4, _mins(200), 8.0)]
    p1, p2 = str(src / "b1.parquet"), str(src / "b2.parquet")
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(p1)
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(p2)
    # file order = modification time; force b1 strictly older
    past = dt.datetime.now().timestamp() - 1000
    for root, _, files in os.walk(p1):
        for f_ in files:
            os.utime(os.path.join(root, f_), (past, past))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    name = f"sess_{uuid.uuid4().hex[:10]}"
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    out = spark.table(name)
    latest = (
        out.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("user_id", "session_start").orderBy(
                    F.col("session_end").desc(), F.col("n_events").desc()
                )
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .orderBy("session_start")
        .collect()
    )
    assert len(latest) == 2
    first, second = latest
    assert first["n_events"] == 3                      # merged across batches
    assert first["session_end"] == _mins(20)
    assert first["session_value"] == 7.0
    assert second["n_events"] == 1
    assert second["session_start"] == _mins(200)


def test_late_event_extends_session_start(spark, tmp_path):
    """A cross-batch out-of-order event OLDER than the open session's
    start must extend session_start backwards — the emitted interval
    has to cover every event it counted."""
    src = tmp_path / "late_stream"
    src.mkdir()
    schema = "user_id long, event_id long, ts timestamp, value double"

    b1 = [(1, 1, _mins(10), 1.0)]
    b2 = [(1, 2, _mins(5), 2.0)]  # late: before the open session's start
    p1, p2 = str(src / "b1.parquet"), str(src / "b2.parquet")
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(p1)
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(p2)
    past = dt.datetime.now().timestamp() - 1000
    for root, _, files in os.walk(p1):
        for f_ in files:
            os.utime(os.path.join(root, f_), (past, past))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    name = f"late_{uuid.uuid4().hex[:10]}"
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    rows = (
        spark.table(name)
        .orderBy(F.col("session_end").desc(), F.col("n_events").desc())
        .collect()
    )
    final = rows[0]
    assert final["n_events"] == 2
    assert final["session_start"] == _mins(5)   # extended backwards
    assert final["session_end"] == _mins(10)


# --------------------------------------------------------------------------
# foreachBatch upsert: the snapshot merge is micro-batch-slicing-invariant
# --------------------------------------------------------------------------
def test_merge_snapshot_slicing_invariant(spark):
    """Folding the event stream through merge_snapshot in ANY slicing
    (one batch; two batches split by event_id parity, either order)
    yields the identical snapshot — the property that makes the
    foreachBatch MERGE correct regardless of how the file source
    slices micro-batches."""
    from reports_generator_spark.sources import load_table
    from reports_generator_spark.streaming.foreach_sink import (
        _latest_per_key,
        merge_snapshot,
    )
    from conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_type", "ts", "event_id", "value"
    )
    whole = _latest_per_key(ev)
    d0 = _latest_per_key(ev.filter(ev.event_id % 2 == 0))
    d1 = _latest_per_key(ev.filter(ev.event_id % 2 == 1))

    def rows(df):
        return sorted(map(tuple, df.collect()))

    expected = rows(whole)
    assert rows(merge_snapshot(d0, d1)) == expected
    assert rows(merge_snapshot(d1, d0)) == expected


def test_watermark_late_drop_actually_drops(spark):
    """The late-drop key's semantics depend on slice C being dropped by
    the watermark — assert the drop REALLY happened (state metrics),
    not just that the surviving counts match the oracle."""
    from conftest import SF_DIR

    from reports_generator_spark.streaming.windowed import (
        stream_watermark_late_drop,
    )

    out, progress = stream_watermark_late_drop(spark, SF_DIR)
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in progress
        for op in p.get("stateOperators", [])
    )
    assert dropped > 0, [p.get("stateOperators") for p in progress]
    # batches really were separate: 3 input files -> >= 3 progress entries
    assert len(progress) >= 3


# --------------------------------------------------------------------------
# exactly_once_publish: the epoch-idempotent foreachBatch sink
# --------------------------------------------------------------------------
def test_exactly_once_replay_of_same_epoch_is_suppressed(spark, tmp_path):
    from reports_generator_spark.streaming.foreach_sink import (
        exactly_once_publish,
        read_published,
    )

    target = str(tmp_path / "t")
    batch = spark.createDataFrame([(1,), (2,)], "event_id long")
    assert exactly_once_publish(batch, 0, target) == "published"
    # the recovery replay: same batch_id re-delivered
    assert exactly_once_publish(batch, 0, target) == "replay-skipped"
    rows = sorted(r["event_id"] for r in read_published(spark, target).collect())
    assert rows == [1, 2]  # exactly once, not twice


def test_exactly_once_distinct_epochs_all_publish(spark, tmp_path):
    from reports_generator_spark.streaming.foreach_sink import (
        exactly_once_publish,
        read_published,
    )

    target = str(tmp_path / "t")
    for bid in range(3):
        df = spark.createDataFrame([(bid,)], "event_id long")
        assert exactly_once_publish(df, bid, target) == "published"
    assert read_published(spark, target).count() == 3


def test_exactly_once_crash_before_claim_leaves_invisible_orphan(spark, tmp_path):
    """Crash between STAGE and CLAIM: the staged dir exists but no
    marker references it — readers must not see it, and the engine's
    replay of that epoch publishes exactly once."""
    import os

    from reports_generator_spark.streaming.foreach_sink import (
        exactly_once_publish,
        read_published,
    )

    target = str(tmp_path / "t")
    batch = spark.createDataFrame([(7,)], "event_id long")
    # simulate the first attempt dying after staging, before the claim
    orphan = os.path.join(target, "_staged", "epoch-0-deadcafe")
    batch.write.parquet(orphan)
    os.makedirs(os.path.join(target, "_log"), exist_ok=True)

    # the replay (engine re-delivers epoch 0) publishes normally
    assert exactly_once_publish(batch, 0, target) == "published"
    pub = read_published(spark, target)
    assert [r["event_id"] for r in pub.collect()] == [7]  # one copy
    assert os.path.exists(orphan)  # vacuum territory, not the reader's


def test_exactly_once_replay_discards_its_restaged_copy(spark, tmp_path):
    """The suppressed replay must not leak its re-staged dir into the
    reader's view, and must leave exactly one marker for the epoch."""
    import os

    from reports_generator_spark.streaming.foreach_sink import (
        exactly_once_publish,
        read_published,
    )

    target = str(tmp_path / "t")
    batch = spark.createDataFrame([(1,)], "event_id long")
    exactly_once_publish(batch, 5, target)
    exactly_once_publish(batch, 5, target)
    markers = os.listdir(os.path.join(target, "_log"))
    assert markers == ["epoch-5.txt"]
    assert read_published(spark, target).count() == 1


def test_exactly_once_engine_level_replay_after_lost_ack(spark, tmp_path):
    """The REAL recovery path, driven by the engine: run the stream,
    then delete the checkpoint's commit ack for the last batch (the
    crash-between-sink-commit-and-ack window) and RESTART on the same
    checkpoint — Structured Streaming itself re-delivers that batch
    with the same batch_id, and the sink's epoch marker must suppress
    the second publication."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from reports_generator_spark.streaming.foreach_sink import (
        exactly_once_publish,
        read_published,
    )

    src = str(tmp_path / "src")
    target = str(tmp_path / "table")
    chk = str(tmp_path / "chk")
    _write_mtime_ordered_batches(
        spark,
        src,
        [
            spark.range(10 * i, 10 * i + 10).select(F.col("id").alias("event_id"))
            for i in range(3)
        ],
    )

    outcomes = []
    schema = spark.read.parquet(src).schema

    def run_stream():
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .writeStream.foreachBatch(
                lambda df, bid: outcomes.append(
                    (bid, exactly_once_publish(df, bid, target))
                )
            )
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
        finally:
            q.stop()  # fully unregister before the restart reuses chk

    run_stream()
    assert [o for _, o in outcomes] == ["published"] * 3

    # the crash window: the sink committed batch 2 but the engine's
    # ack was lost — remove the checkpoint commit file for batch 2
    # AND its Hadoop local-FS checksum sidecar (.2.crc): a stale crc
    # makes the replay's re-write of commits/2 fail checksum
    # verification, which Spark misreports as a concurrent query
    acks = sorted(glob.glob(os.path.join(chk, "commits", "[0-9]*")))
    os.remove(acks[-1])
    crc = os.path.join(
        os.path.dirname(acks[-1]), f".{os.path.basename(acks[-1])}.crc"
    )
    if os.path.exists(crc):
        os.remove(crc)

    outcomes.clear()
    run_stream()  # the ENGINE re-delivers batch 2 (same batch_id)
    assert (2, "replay-skipped") in outcomes, outcomes
    assert "published" not in [o for _, o in outcomes]

    pub = read_published(spark, target)
    rows = sorted(r["event_id"] for r in pub.collect())
    assert rows == list(range(30))  # every row exactly once
    markers = os.listdir(os.path.join(target, "_log"))
    assert sorted(markers) == ["epoch-0.txt", "epoch-1.txt", "epoch-2.txt"]


def test_left_outer_stream_join_holds_back_watermark_tail(spark):
    """The null-emission boundary: unmatched views whose join window
    the global watermark has NOT yet passed must be withheld — neither
    matched nor null-emitted. The fixture's unmatched-view tail proves
    the boundary bites (at least one view is withheld)."""
    from conftest import SF_DIR
    from reports_generator_spark.plans import registry

    registry.load_all()
    out = registry.QUERIES["stream_stream_join_left_outer_watermark"](
        spark, SF_DIR
    )
    emitted_views = {r["view_event_id"] for r in out.collect()}

    from reports_generator_spark.sources import load_table

    # the production events loader applies the SAME ts normalization
    # as the streaming source — a raw parquet read would surface nanos
    # as long on a TIMESTAMP(NANOS) fixture and break the timedelta
    # arithmetic below
    ev = load_table(spark, SF_DIR, "events")
    all_views = {
        r["event_id"] for r in ev.filter(F.col("event_type") == "view")
        .select("event_id").collect()
    }
    withheld = all_views - emitted_views
    assert withheld, "the watermark tail must hold back at least one view"
    # every withheld view sits inside the watermark horizon: its join
    # window end is >= W = min(max view_ts, max purchase_ts) - 1h
    import datetime as dt

    mx = ev.groupBy("event_type").agg(F.max("ts").alias("m")).collect()
    mx = {r["event_type"]: r["m"] for r in mx}
    w = min(mx["view"], mx["purchase"]) - dt.timedelta(hours=1)
    tail = ev.filter(F.col("event_id").isin(list(withheld))).select("ts").collect()
    assert all(r["ts"] + dt.timedelta(minutes=30) >= w for r in tail)


def test_full_outer_stream_join_emits_and_withholds_both_sides(spark):
    """The full-outer key's two independent null-emission boundaries:
    unmatched VIEWS null-emit only past view_ts + 30min < W, unmatched
    PURCHASES only past purchase_ts < W — and BOTH sides must also
    have a withheld tail on the fixture, or the boundary isn't being
    exercised (at sf0.001: 2 matched / 185 null-views / 1 held view /
    198 null-purchases / 2 held purchases)."""
    import datetime as dt

    from conftest import SF_DIR
    from reports_generator_spark.plans import registry
    from reports_generator_spark.sources import load_table

    registry.load_all()
    out = registry.QUERIES["stream_stream_join_full_outer_watermark"](
        spark, SF_DIR
    ).collect()

    null_views = {r["view_event_id"] for r in out
                  if r["purchase_event_id"] is None}
    null_purchases = {r["purchase_event_id"] for r in out
                      if r["view_event_id"] is None}
    assert null_views and null_purchases, "both orphan classes must emit"

    ev = load_table(spark, SF_DIR, "events")
    mx = {r["event_type"]: r["m"]
          for r in ev.groupBy("event_type").agg(F.max("ts").alias("m")).collect()}
    w = min(mx["view"], mx["purchase"]) - dt.timedelta(hours=1)

    emitted_v = {r["view_event_id"] for r in out if r["view_event_id"] is not None}
    emitted_p = {r["purchase_event_id"] for r in out
                 if r["purchase_event_id"] is not None}
    all_v = {r["event_id"]: r["ts"] for r in
             ev.filter(F.col("event_type") == "view").collect()}
    all_p = {r["event_id"]: r["ts"] for r in
             ev.filter(F.col("event_type") == "purchase").collect()}
    held_v = set(all_v) - emitted_v
    held_p = set(all_p) - emitted_p
    assert held_v and held_p, "both watermark tails must hold rows back"
    # every withheld row sits inside its side's watermark horizon
    assert all(all_v[e] + dt.timedelta(minutes=30) >= w for e in held_v)
    assert all(all_p[e] >= w for e in held_p)


def test_stream_session_window_eviction_and_withheld_tail(spark):
    """The streaming session_window contract, from the query progress:
    (a) nothing emits before the sentinel batch (the 90-day delay
    exceeds the event span — batches 0/1 only build state); (b) the
    sentinel batch evicts/emits every real session; (c) the withheld
    tail is exactly the sentinel's own session — 1 state row after
    completion, user −1 absent from the sink; (d) the emitted relation
    equals the BATCH session_window over the same events (stream ≡
    batch semantics)."""
    import pyspark.sql.functions as F

    from reports_generator_spark.plans.registry import QUERIES, load_all
    from reports_generator_spark.streaming.windowed import stream_session_window

    load_all()
    sf = "/root/testdata/sf0.001"
    out, progress = stream_session_window(spark, sf)

    # (a)+(b): all appended rows land in the final (sentinel) batch
    rows_per_batch = [
        int(p["sink"]["numOutputRows"]) for p in progress
        if p["sink"].get("numOutputRows") is not None
    ]
    assert sum(rows_per_batch[:-1]) <= 0 or rows_per_batch[-1] > 0
    total = out.count()
    assert total > 0 and total == max(rows_per_batch)

    # (c): exactly the sentinel session withheld in state
    with_state = [p for p in progress if p["stateOperators"]]
    assert int(with_state[-1]["stateOperators"][0]["numRowsTotal"]) == 1
    assert out.filter("user_id = -1").count() == 0

    # (d): stream ≡ batch operator on the same input
    batch = QUERIES["session_window_native"](spark, sf).select(
        "user_id", "session_start", "last_event_ts",
        F.col("n_events").cast("bigint").alias("n_events"),
    )
    assert out.exceptAll(batch).count() == 0
    assert batch.exceptAll(out).count() == 0


def test_cdc_scd2_inorder_precondition_pinned(spark):
    """Why stream_cdc_to_scd2 requires time-sliced epochs: change-
    point compression is lossy, so re-compressing (stored change
    points ∪ late events) is NOT equivalent to compressing the full
    history when a late event lands BETWEEN two compressed-away
    same-type events. Pinned concretely: history A@1,A@2 compresses
    to {A@1}; a late B@1.5 then yields {A@1,B@1.5} — the full-history
    answer {A@1,B@1.5,A@2} needs the compressed-away A@2 back. The
    in-order path (B@3 arriving after) IS equivalent."""
    import pyspark.sql.functions as F

    from reports_generator_spark.streaming.foreach_sink import _change_points

    def pts(rows):
        return spark.createDataFrame(
            rows, "user_id long, event_type string, ts timestamp, event_id long"
        )

    import datetime as dt

    def t(h):
        return dt.datetime(2024, 1, 1, h)

    hist = pts([(1, "A", t(1), 10), (1, "A", t(2), 20)])
    stored = _change_points(hist)
    assert [r["event_id"] for r in stored.collect()] == [10]

    # in-order epoch: equivalent to full recompute
    late_ok = pts([(1, "B", t(3), 30)])
    inc = _change_points(stored.unionByName(late_ok))
    full = _change_points(hist.unionByName(late_ok))
    assert sorted(r["event_id"] for r in inc.collect()) == sorted(
        r["event_id"] for r in full.collect()
    )

    # out-of-order: the incremental path LOSES the A@2 change point
    late_bad = pts([(1, "B", t(1) + dt.timedelta(minutes=30), 15)])
    inc_bad = sorted(
        r["event_id"] for r in _change_points(stored.unionByName(late_bad)).collect()
    )
    full_bad = sorted(
        r["event_id"] for r in _change_points(hist.unionByName(late_bad)).collect()
    )
    assert inc_bad == [10, 15] and full_bad == [10, 15, 20]  # the gap, pinned
