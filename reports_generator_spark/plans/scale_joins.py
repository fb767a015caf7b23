"""Scale-path join pruning and storage-maintenance operators.

The four classic 100 TB techniques that cut a query's scan/shuffle
volume BEFORE the join executes, plus the two storage-maintenance
operations every lakehouse deployment schedules:

- ``join_bloom_pruned``: semi-join reduction — a bit-packed Bloom
  filter built from the selective dimension side prunes the fact
  table map-side before the shuffle join. Aggregated distributedly
  (``bit_or`` over one-hot words; only the finished 64 KiB sketch
  crosses the driver once, the same mechanics as Spark's own runtime
  bloom subquery), probed with shift/mask expressions — zero UDFs,
  and exact results regardless of false positives because the real
  join still runs after the pre-filter.
- ``join_dpp_partition_pruned``: dynamic partition pruning — the fact
  table is partition-laid-out on the join key, so the runtime result
  of the filtered dimension side prunes whole partitions from the
  fact scan (``dynamicpruningexpression`` in PartitionFilters;
  plan-asserted in tests/test_plan_shapes.py).
- ``zorder_pruned_scan``: the read-side companion of
  ``zorder_cluster`` (plans/features.py) — a Z-ordered layout is only
  worth its write cost if a 2-D box predicate actually prunes; this
  key reads the Morton-prefix-partitioned layout back with the box's
  derived prefix set as a partition filter and the exact box as
  residual.
- ``delete_copy_on_write``: GDPR-style row deletes on an immutable
  columnar lake — identify the partitions holding matching rows,
  rewrite ONLY those partitions minus the deleted rows (dynamic
  partition overwrite), leave everything else untouched.
- ``compact_small_files_binpack``: small-file compaction — bin-pack a
  64-file fragmented dataset into ceil(rows/target) right-sized files
  and prove rows + checksum survived.

The reference's storage layer is a single overwrite/append parquet
sink (Proof.scala:147-151); none of these exist there — they are the
engine surface a 100 TB deployment cannot run without.
"""

from __future__ import annotations

import hashlib
import os
import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .features import _z_interleave, _ZBITS
from .registry import query


# --------------------------------------------------------------------------
# Bloom-filter-pruned join (semi-join reduction)
# --------------------------------------------------------------------------
#: 2^19 bits = 8192 longs ≈ 64 KiB — at ~30k build keys that is ~17
#: bits/key → ~1% false-positive rate with k=3 probes. On a cluster
#: the same 64 KiB rides the broadcast; size m by n_keys·10–20 bits.
_BLOOM_BITS = 1 << 19
_BLOOM_WORDS = _BLOOM_BITS >> 6
_BLOOM_K = 3


def bloom_build(keys: DataFrame, key_col: str) -> list[int]:
    """Dense word array (length m/64) of a Bloom filter over a key
    column.

    The AGGREGATION is fully distributed: each key emits k bit
    positions (seeded xxhash64), positions partial-aggregate per
    64-bit word with ``bit_or`` — the shuffle carries ≤ m/64 rows.
    Only the FINISHED sketch (≤ 8192 (word, mask) rows ≈ 64 KiB)
    crosses to the driver for densification, exactly the mechanics of
    Spark's own runtime bloom injection (BloomFilterAggregate
    evaluates as a driver-side scalar subquery re-broadcast into the
    probe scan). A first draft densified executor-side via an m/64-
    entry map + per-index element_at — O(W²) interpreted lookups on
    one row, measured 45 s at sf0.1; the O(W) driver loop over the
    collected sketch is the honest spelling of what every engine does
    with a finished bounded sketch."""
    pos = keys.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col(key_col), F.lit(j)), F.lit(_BLOOM_BITS))
                    for j in range(_BLOOM_K)
                ]
            )
        ).alias("pos")
    )
    word_masks = pos.select(
        F.shiftright(F.col("pos"), 6).alias("w"),
        F.expr("shiftleft(1L, CAST(pmod(pos, 64) AS INT))").alias("m"),
    ).groupBy("w").agg(F.bit_or("m").alias("mask"))
    words = [0] * _BLOOM_WORDS
    for r in word_masks.collect():  # bounded: <= m/64 rows, one sketch
        words[int(r["w"])] = int(r["mask"])
    return words


def bloom_might_contain_sql(key_expr: str) -> str:
    """Spark SQL predicate testing all k Bloom bits for ``key_expr``
    against the broadcast ``bf_words`` array (1-based element_at).
    Spelled as SQL because shiftright's amount operand is only
    expression-typed in SQL, not in the Python column API."""
    conds = []
    for j in range(_BLOOM_K):
        p = f"pmod(xxhash64({key_expr}, {j}), {_BLOOM_BITS})"
        conds.append(
            f"((shiftright(element_at(bf_words, CAST(shiftright({p}, 6) AS INT) + 1),"
            f" CAST(pmod({p}, 64) AS INT)) & 1) = 1)"
        )
    return " AND ".join(conds)


@query(
    "join_bloom_pruned",
    oracle="""
    SELECT l.l_returnflag,
           count(*) AS n_items,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY l.l_returnflag
    """,
)
def join_bloom_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned fact-dimension join: the one classic 100 TB join
    optimization not otherwise in the inventory. The selective side
    (urgent orders, ~20%) builds a 64 KiB bit-packed Bloom filter as a
    DataFrame aggregate (``bloom_build``); the fact table tests it
    MAP-SIDE (shift/mask on the broadcast array — whole-stage codegen,
    no UDF) so ~80% of lineitem never enters the shuffle. The real
    equi-join then runs on the survivors, which makes Bloom false
    positives harmless — the oracle is the plain join, and the test
    suite separately asserts the pre-filter's selectivity. Spark's own
    runtime bloom injection (spark.sql.optimizer.runtime.bloomFilter)
    does this automatically above its 10 GB scan threshold; spelling
    it explicitly keeps the plan deterministic at any size and
    documents the technique as engine surface."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    okeys = o.select("o_orderkey")
    words = bloom_build(okeys, "o_orderkey")
    # the sketch re-enters the plan as a 1-row BROADCAST frame, not an
    # expression literal: an 8192-element array literal blows the
    # generated method past Janino's limit and drops the whole stage
    # to interpreted eval (measured 5.6 s vs 0.6 s at sf0.1)
    bf = spark.createDataFrame([(words,)], "bf_words: array<bigint>")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_returnflag", "l_extendedprice")
        .join(F.broadcast(bf))
        .filter(F.expr(bloom_might_contain_sql("l_orderkey")))
        .drop("bf_words")
    )
    joined = li.join(o.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"))
    return joined.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


# --------------------------------------------------------------------------
# Dynamic partition pruning
# --------------------------------------------------------------------------
def _layout_tag(spark: SparkSession, sf_dir: str) -> str:
    return hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]


_DPP_DIM_ROWS = [
    ("1-URGENT", "URGENTISH"),
    ("2-HIGH", "URGENTISH"),
    ("3-MEDIUM", "RELAXED"),
    ("4-NOT SPECIFIED", "RELAXED"),
    ("5-LOW", "RELAXED"),
]


def ensure_dpp_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Build (once) the priority-partitioned orders table + the 5-row
    priority-class dimension that `join_dpp_partition_pruned` reads.
    Same warmup contract as ensure_bucketed_tables
    (plans/relational.py): the layout is an ingest-time cost amortized
    over every subsequent pruned query, so bench warmup builds it
    outside the timed section."""
    tag = _layout_tag(spark, sf_dir)
    t_fact, t_dim = f"rg_orders_p_{tag}", f"rg_prio_dim_{tag}"
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path

    def _stale(table: str) -> bool:
        loc = os.path.join(warehouse, table.lower())
        if spark.catalog.tableExists(table):
            if os.path.exists(loc):
                return False
            spark.sql(f"DROP TABLE {table}")
        if os.path.exists(loc):
            shutil.rmtree(loc)
        return True

    if _stale(t_fact):
        load_table(spark, sf_dir, "orders").write.partitionBy(
            "o_orderpriority"
        ).mode("overwrite").saveAsTable(t_fact)
    if _stale(t_dim):
        spark.createDataFrame(
            _DPP_DIM_ROWS, "prio string, prio_class string"
        ).coalesce(1).write.mode("overwrite").saveAsTable(t_dim)
    return t_fact, t_dim


@query(
    "join_dpp_partition_pruned",
    oracle="""
    WITH dim(prio, prio_class) AS (VALUES
      ('1-URGENT','URGENTISH'), ('2-HIGH','URGENTISH'),
      ('3-MEDIUM','RELAXED'), ('4-NOT SPECIFIED','RELAXED'),
      ('5-LOW','RELAXED'))
    SELECT o.o_orderstatus, count(*) AS n_orders,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders o JOIN dim d ON d.prio = o.o_orderpriority
    WHERE d.prio_class = 'URGENTISH'
    GROUP BY o.o_orderstatus
    """,
)
def join_dpp_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the fact table is partition-laid-out
    on the join key (o_orderpriority), the dimension side carries a
    selective predicate, and Catalyst injects the dim side's runtime
    key set into the fact scan's PartitionFilters
    (``dynamicpruningexpression(... IN dynamicpruning#N)`` —
    plan-asserted in tests/test_plan_shapes.py), so 3 of 5 partitions
    are never read. Two engine boundaries this key documents: (1) the
    DPP trigger requires a comparison-shaped dim predicate —
    ``prio_class = 'URGENTISH'`` injects, a bare boolean column does
    NOT (PartitionPruning's isLikelySelective matches comparisons/IN/
    LIKE, not attribute references); (2) at local fixture sizes the
    stats-based benefit estimate rounds to zero, so the session runs
    with useStats=false — on a real 100 TB table the default stats
    path fires on its own."""
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    t_fact, t_dim = ensure_dpp_tables(spark, sf_dir)
    o = spark.table(t_fact)
    d = spark.table(t_dim).filter(F.col("prio_class") == "URGENTISH")
    return (
        o.join(d, o.o_orderpriority == d.prio)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


# --------------------------------------------------------------------------
# Z-order pruned read-back
# --------------------------------------------------------------------------
#: The query box in bucket space: bx ∈ [4,7] × bby ∈ [0,3] — exactly
#: the Morton range [16, 32) = prefix {1} of 16, so the partition
#: filter prunes 15/16 of the layout.
_ZBOX_X = (4, 7)
_ZBOX_Y = (0, 3)


def _morton_py(bx: int, by: int) -> int:
    z = 0
    for i in range(_ZBITS):
        z |= ((bx >> i) & 1) << (2 * i)
        z |= ((by >> i) & 1) << (2 * i + 1)
    return z


def zbox_prefixes() -> list[int]:
    """Partition prefixes (zval >> 4) covering the query box — the
    driver-side constant-folded equivalent of a BIGMIN/LITMAX Z-range
    decomposition (exact at this 4-bit-per-dim resolution)."""
    return sorted(
        {
            _morton_py(bx, by) >> 4
            for bx in range(_ZBOX_X[0], _ZBOX_X[1] + 1)
            for by in range(_ZBOX_Y[0], _ZBOX_Y[1] + 1)
        }
    )


def ensure_zorder_table(spark: SparkSession, sf_dir: str) -> str:
    """Build (once) the Morton-prefix-partitioned lineitem layout that
    `zorder_pruned_scan` reads: zval from the same bit-interleave as
    zorder_cluster, zp = zval >> 4 as the 16-way partition column."""
    tag = _layout_tag(spark, sf_dir)
    table = f"rg_li_z_{tag}"
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    loc = os.path.join(warehouse, table.lower())
    if spark.catalog.tableExists(table):
        if os.path.exists(loc):
            return table
        spark.sql(f"DROP TABLE {table}")
    if os.path.exists(loc):
        shutil.rmtree(loc)

    li = load_table(spark, sf_dir, "lineitem")
    stats = li.agg(
        F.min("l_partkey").alias("mnp"),
        F.max("l_partkey").alias("mxp"),
        F.min("l_suppkey").alias("mns"),
        F.max("l_suppkey").alias("mxs"),
    )
    g = (
        li.select("l_orderkey", "l_partkey", "l_suppkey")
        .join(F.broadcast(stats))
        .select(
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            F.floor(
                (F.col("l_partkey") - F.col("mnp"))
                * 16.0
                / (F.col("mxp") - F.col("mnp") + 1)
            ).alias("bx"),
            F.floor(
                (F.col("l_suppkey") - F.col("mns"))
                * 16.0
                / (F.col("mxs") - F.col("mns") + 1)
            ).alias("bby"),
        )
    )
    z = g.select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "bx",
        "bby",
        _z_interleave(F.col("bx"), F.col("bby")).alias("zval"),
    ).withColumn("zp", F.shiftright(F.col("zval"), 4))
    # At 100 TB: repartitionByRange(zval) + sortWithinPartitions gives
    # file-level zone maps INSIDE each prefix partition too; here the
    # 16-way directory layout is what the pruning read exercises.
    z.write.partitionBy("zp").mode("overwrite").saveAsTable(table)
    return table


@query(
    "zorder_pruned_scan",
    oracle=f"""
    WITH s AS (
      SELECT min(l_partkey) AS mnp, max(l_partkey) AS mxp,
             min(l_suppkey) AS mns, max(l_suppkey) AS mxs
      FROM lineitem
    ),
    g AS (
      SELECT l_partkey, l_suppkey,
             CAST(floor((l_partkey - mnp) * 16.0 / (mxp - mnp + 1)) AS BIGINT) AS bx,
             CAST(floor((l_suppkey - mns) * 16.0 / (mxs - mns + 1)) AS BIGINT) AS bby
      FROM lineitem, s
    )
    SELECT bx, bby, count(*) AS n_rows, CAST(sum(l_partkey) AS BIGINT) AS sum_pk
    FROM g
    WHERE bx BETWEEN {_ZBOX_X[0]} AND {_ZBOX_X[1]}
      AND bby BETWEEN {_ZBOX_Y[0]} AND {_ZBOX_Y[1]}
    GROUP BY bx, bby
    """,
)
def zorder_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured pay-off of the Z-order layout (r6 verdict item): a 2-D
    box predicate (bx ∈ [4,7] × bby ∈ [0,3]) becomes the Morton-prefix
    set {zval>>4} — computed by exact prefix enumeration over the box,
    the constant-resolution form of BIGMIN/LITMAX — and lands in the
    scan as ``PartitionFilters: zp IN (...)`` pruning 15 of 16
    partitions (plan-asserted in tests/test_plan_shapes.py); the exact
    box predicate stays as the residual filter. A 1-D sort layout
    would leave the second dimension's span at full width and prune
    nothing for this shape — that asymmetry is the whole reason
    zorder_cluster writes Morton keys. Oracle recomputes the
    bucketization from the raw table, proving layout+pruned read ==
    direct scan."""
    t = ensure_zorder_table(spark, sf_dir)
    z = spark.table(t)
    pruned = z.filter(
        F.col("zp").isin(zbox_prefixes())
        & F.col("bx").between(*_ZBOX_X)
        & F.col("bby").between(*_ZBOX_Y)
    )
    return pruned.groupBy("bx", "bby").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_partkey").alias("sum_pk"),
    )


# --------------------------------------------------------------------------
# Copy-on-write delete (dynamic partition overwrite)
# --------------------------------------------------------------------------
_COW_PARTS = 8


@query(
    "delete_copy_on_write",
    oracle=f"""
    WITH s AS (SELECT max(o_orderkey) AS mx FROM orders),
    t AS (
      SELECT o_orderkey,
             CAST(floor(o_orderkey * {_COW_PARTS}.0 / (mx + 1)) AS BIGINT) AS fid,
             -- floor() explicitly: DuckDB's '/' yields DOUBLE and its
             -- double→BIGINT cast rounds-to-nearest, which would drift
             -- from the engine's (mx+1)//4 floor whenever (mx+1)%4 ≥ 2
             (o_orderkey <= CAST(floor((mx + 1) / 4) AS BIGINT)
              AND o_orderkey % 5 = 2) AS hit
      FROM orders, s
    )
    SELECT count(*) AS rows_before,
           CAST(sum(CAST(hit AS BIGINT)) AS BIGINT) AS rows_deleted,
           CAST(count(*) - sum(CAST(hit AS BIGINT)) AS BIGINT) AS rows_after,
           CAST({_COW_PARTS} AS BIGINT) AS n_parts_total,
           count(DISTINCT fid) FILTER (WHERE hit) AS n_parts_rewritten,
           CAST(sum(o_orderkey) FILTER (WHERE NOT hit) AS BIGINT)
             AS survivor_checksum
    FROM t
    """,
)
def delete_copy_on_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level DELETE on an immutable columnar lake via
    copy-on-write at partition granularity — the GDPR-erasure shape.
    The dataset lives range-partitioned on the key (8 dirs); the
    delete predicate (low key range, every 5th key) touches 2 of them.
    Execution: (1) locate partitions holding matches, (2) rewrite ONLY
    those partitions minus the deleted rows using DYNAMIC partition
    overwrite (partitions absent from the frame are untouched — and
    because dynamic overwrite cannot DROP a partition that ends up
    empty, the rewrite unit must keep survivors, which this predicate
    guarantees and a fully-emptying delete would instead handle with
    an explicit drop), (3) audit: read-back rows + survivor checksum
    equal the direct computation (the oracle). At 100 TB the only
    rewritten bytes are the touched partitions — the point of COW;
    file-level COW (Delta/Iceberg) refines the same plan to the file
    granularity. The layout write is part of the run because the op
    MUTATES it (same contract as sink_mode_auto's fixture reset)."""
    import tempfile

    tag = hashlib.md5(
        (os.path.abspath(sf_dir) + ":" + spark.sparkContext.applicationId).encode()
    ).hexdigest()[:10]
    path = os.path.join(tempfile.gettempdir(), f"rg_cow_{tag}")
    shutil.rmtree(path, ignore_errors=True)

    o = load_table(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_orderkey")).first()[0]  # scalar-only collect
    thr = (mx + 1) // 4

    fid = F.floor(F.col("o_orderkey") * float(_COW_PARTS) / (mx + 1)).cast("bigint")
    o.withColumn("fid", fid).write.partitionBy("fid").mode("overwrite").parquet(path)

    lake = spark.read.parquet(path)
    hit = (F.col("o_orderkey") <= thr) & (F.col("o_orderkey") % 5 == 2)
    rows_before = lake.count()
    touched = lake.filter(hit).select("fid").distinct()
    n_rewritten = touched.count()  # bounded by partition count

    # rewrite only the touched partitions, minus the deleted rows
    survivors_in_touched = lake.join(F.broadcast(touched), "fid").filter(~hit)
    survivors_in_touched.write.partitionBy("fid").mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).parquet(path)

    back = spark.read.parquet(path)
    return back.agg(
        F.lit(rows_before).cast("bigint").alias("rows_before"),
        (F.lit(rows_before).cast("bigint") - F.count(F.lit(1))).alias("rows_deleted"),
        F.count(F.lit(1)).alias("rows_after"),
        F.lit(_COW_PARTS).cast("bigint").alias("n_parts_total"),
        F.lit(n_rewritten).cast("bigint").alias("n_parts_rewritten"),
        F.sum("o_orderkey").alias("survivor_checksum"),
    )


# --------------------------------------------------------------------------
# Small-file compaction (bin-packing)
# --------------------------------------------------------------------------
_COMPACT_TARGET_ROWS = 4096


@query(
    "compact_small_files_binpack",
    oracle=f"""
    SELECT CAST(64 AS BIGINT) AS n_files_before,
           CAST(ceil(count(*) / {_COMPACT_TARGET_ROWS}.0) AS BIGINT)
             AS n_files_after,
           count(*) AS n_rows,
           CAST(sum(o_orderkey) AS BIGINT) AS checksum
    FROM orders
    """,
)
def compact_small_files_binpack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction: the nightly maintenance job that keeps a
    streamed-into table scannable. A 64-file fragmented copy of orders
    (the 'too many small files' state every micro-batch sink
    produces) is bin-packed into ceil(rows/4096) right-sized files —
    one round-robin shuffle, no ordering requirement. The audit reads
    BOTH layouts back and counts physical files via the _metadata
    hidden column (distinct file paths — metadata-only, no extra scan
    pass), proving the row count and key checksum survived and the
    file count hit the bin-packing target exactly. At 100 TB the
    target is bytes, not rows (maxRecordsPerFile /
    repartitionByRange on size tiers); rows keep the fixture exact
    and the plan identical."""
    import tempfile

    tag = hashlib.md5(
        (os.path.abspath(sf_dir) + ":" + spark.sparkContext.applicationId).encode()
    ).hexdigest()[:10]
    frag = os.path.join(tempfile.gettempdir(), f"rg_frag_{tag}")
    compacted = os.path.join(tempfile.gettempdir(), f"rg_compact_{tag}")

    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    o.repartition(64).write.mode("overwrite").parquet(frag)

    frag_back = spark.read.parquet(frag)
    n_rows = frag_back.count()
    n_after = -(-n_rows // _COMPACT_TARGET_ROWS)  # ceil
    frag_back.repartition(n_after).write.mode("overwrite").parquet(compacted)

    def n_files(p: str) -> DataFrame:
        return (
            spark.read.parquet(p)
            .select(F.col("_metadata.file_path").alias("fp"))
            .agg(F.count_distinct("fp").alias("n"))
        )

    out = spark.read.parquet(compacted)
    return (
        out.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("o_orderkey").alias("checksum"),
        )
        .join(F.broadcast(n_files(frag).select(F.col("n").alias("n_files_before"))))
        .join(F.broadcast(n_files(compacted).select(F.col("n").alias("n_files_after"))))
        .select("n_files_before", "n_files_after", "n_rows", "checksum")
    )


# --------------------------------------------------------------------------
# Transactional sink: staging + atomic publish via a commit manifest
# --------------------------------------------------------------------------
@query(
    "sink_atomic_commit_protocol",
    oracle="""
    SELECT CAST(count(*) FILTER (WHERE o_orderkey % 3 <> 0) AS BIGINT)
             AS rows_visible,
           CAST(sum(o_orderkey) FILTER (WHERE o_orderkey % 3 <> 0) AS BIGINT)
             AS visible_checksum,
           TRUE AS uncommitted_invisible
    FROM orders
    """,
)
def sink_atomic_commit_protocol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atomic-publish sink: the commit protocol that makes a parquet
    table readable mid-write. Writers land each batch in a staging
    dir, then COMMIT = one directory rename into the table + one
    atomic manifest replace (os.replace — POSIX-atomic; on object
    stores this is the Delta/Iceberg metadata-log commit). Readers
    resolve the manifest FIRST and scan only committed batch dirs, so
    a writer that dies after staging (batch 2 here — staged, never
    committed) is invisible: no torn reads, no half-batches, and
    crash recovery is 'delete unreferenced staging dirs'. The audit
    proves visible rows == exactly the committed batch (oracle
    recomputes the slice) and that the uncommitted batch both exists
    on disk and is absent from the read.

    TRUE-literal exemption (documented): uncommitted_invisible is a
    FILESYSTEM property — "the staged-but-uncommitted directory exists
    on disk yet contributes zero rows to the manifest-resolved scan" —
    observable only by the engine that owns the staging directory; no
    SQL oracle can recompute it. The cross-engine quantities
    (rows_visible, visible_checksum) are recomputed by the oracle from
    the committed slice. Completes the sink family:
    sink_mode_auto (existence-probed mode), merge_upsert (row
    idempotency), this key (atomicity)."""
    import tempfile

    tag = hashlib.md5(
        (os.path.abspath(sf_dir) + ":" + spark.sparkContext.applicationId).encode()
    ).hexdigest()[:10]
    base = os.path.join(tempfile.gettempdir(), f"rg_txn_{tag}")
    shutil.rmtree(base, ignore_errors=True)
    staging = os.path.join(base, "_staging")
    data = os.path.join(base, "data")
    os.makedirs(data)
    manifest = os.path.join(base, "_manifest")

    def commit(batch_id: int) -> None:
        os.rename(
            os.path.join(staging, f"batch-{batch_id}"),
            os.path.join(data, f"batch-{batch_id}"),
        )
        committed = []
        if os.path.exists(manifest):
            with open(manifest) as f:
                committed = f.read().split()
        tmp = manifest + ".tmp"
        with open(tmp, "w") as f:
            f.write("\n".join(committed + [f"batch-{batch_id}"]))
        os.replace(tmp, manifest)  # the atomic publish point

    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    # batch 1: staged AND committed
    o.filter(F.col("o_orderkey") % 3 != 0).write.parquet(
        os.path.join(staging, "batch-1")
    )
    commit(1)
    # batch 2: staged, writer "dies" before commit
    o.filter(F.col("o_orderkey") % 3 == 0).write.parquet(
        os.path.join(staging, "batch-2")
    )

    with open(manifest) as f:
        committed = f.read().split()  # metadata-only driver read
    visible = spark.read.parquet(*[os.path.join(data, b) for b in committed])
    staged_not_visible = os.path.exists(
        os.path.join(staging, "batch-2")
    ) and "batch-2" not in committed
    return visible.agg(
        F.count(F.lit(1)).cast("bigint").alias("rows_visible"),
        F.sum("o_orderkey").cast("bigint").alias("visible_checksum"),
        F.lit(staged_not_visible).alias("uncommitted_invisible"),
    )


# --------------------------------------------------------------------------
# File-level zone-map (footer min/max) skipping audit — completes
# zorder_pruned_scan at the sub-directory level: here NOTHING prunes by
# directory (the predicate is not on the partition column); every
# skipped byte is skipped because the parquet footer's column min/max
# missed the predicate range.
# --------------------------------------------------------------------------
_ZM_FILES = 16
_ZM_LO_FRAC, _ZM_HI_FRAC = 0.25, 0.375  # exact binary fractions — both
# engines compute int(floor((mx+1)·frac)) bit-identically


def ensure_zonemap_table(spark: SparkSession, sf_dir: str) -> tuple[str, int]:
    """Write-once sorted key-range layout: orders split into one file
    per key-range slice (repartition on the slice id gives each slice
    exactly one task; partitionBy then one file per slice), rows sorted
    by o_orderkey inside each file so the footer min/max are tight.
    Returns (path, max_orderkey). A one-time ingest cost amortized like
    the bucketed/zorder layouts (bench warms it)."""
    import tempfile

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    path = os.path.join(tempfile.gettempdir(), f"rg_zonemap_{tag}")
    o = load_table(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_orderkey")).first()[0]  # scalar-only collect
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        shutil.rmtree(path, ignore_errors=True)
        fid = (
            F.floor(F.col("o_orderkey") * float(_ZM_FILES) / (mx + 1))
            .cast("bigint")
            .alias("fid")
        )
        (
            o.select("o_orderkey", fid)
            .repartition(_ZM_FILES, "fid")
            .sortWithinPartitions("o_orderkey")
            .write.partitionBy("fid")
            .mode("overwrite")
            .parquet(path)
        )
    return path, mx


@query(
    "scan_file_zonemap_skipping_audit",
    oracle=f"""
    WITH s AS (SELECT max(o_orderkey) AS mx FROM orders),
    b AS (
      SELECT CAST(floor((mx + 1) * {_ZM_LO_FRAC}) AS BIGINT) AS lo,
             CAST(floor((mx + 1) * {_ZM_HI_FRAC}) AS BIGINT) AS hi
      FROM s
    ),
    t AS (
      SELECT o_orderkey,
             CAST(floor(o_orderkey * {_ZM_FILES}.0 / (mx + 1)) AS BIGINT) AS fid
      FROM orders, s
    ),
    ov AS (
      SELECT DISTINCT fid FROM t, b WHERE o_orderkey BETWEEN lo AND hi
    )
    SELECT (SELECT count(DISTINCT fid) FROM t) AS n_files_total,
           (SELECT count(*) FROM ov) AS n_files_overlapping,
           (SELECT count(*) FROM t JOIN ov USING (fid))
             AS rows_in_overlapping_files,
           (SELECT count(*) FROM t, b WHERE o_orderkey BETWEEN lo AND hi)
             AS n_rows_selected,
           (SELECT CAST(sum(o_orderkey) AS BIGINT) FROM t, b
            WHERE o_orderkey BETWEEN lo AND hi) AS selected_checksum
    """,
)
def scan_file_zonemap_skipping_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map effectiveness, measured relationally: per-file
    min/max/count come from a `_metadata.file_path` groupBy over the
    sorted layout (the engine-side equivalent of reading every footer —
    distributed, no driver loop), a file "overlaps" the predicate range
    iff min ≤ hi AND max ≥ lo, and because each file is a contiguous
    slice of the sort order, overlap == contains-matching-rows, so the
    DuckDB oracle recomputes EVERY column (file counts included) from
    the raw table's slice arithmetic — no engine-internal metrics, no
    TRUE literals. The actual reader-side skip (parquet row-group
    stats dropping non-overlapping files from a filtered scan) is
    asserted on scan metrics in tests/test_plan_shapes.py. At 100 TB
    this audit is the nightly layout-health check: a falling
    skip-ratio means ingest stopped sorting and the layout needs
    re-clustering."""
    path, mx = ensure_zonemap_table(spark, sf_dir)
    lo = int((mx + 1) * _ZM_LO_FRAC)
    hi = int((mx + 1) * _ZM_HI_FRAC)
    lake = spark.read.parquet(path)

    per_file = (
        lake.select("o_orderkey", F.col("_metadata.file_path").alias("fp"))
        .groupBy("fp")
        .agg(
            F.min("o_orderkey").alias("mn"),
            F.max("o_orderkey").alias("mxk"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    ov = per_file.filter((F.col("mn") <= hi) & (F.col("mxk") >= lo))
    totals = per_file.agg(F.count(F.lit(1)).cast("bigint").alias("n_files_total"))
    overlap = ov.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files_overlapping"),
        F.sum("n").cast("bigint").alias("rows_in_overlapping_files"),
    )
    selected = lake.filter(F.col("o_orderkey").between(lo, hi)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows_selected"),
        F.sum("o_orderkey").cast("bigint").alias("selected_checksum"),
    )
    # three 1-row aggregate frames — the documented crossJoin-of-scalars
    # shape (exempted in test_plan_shapes)
    return totals.crossJoin(overlap).crossJoin(selected)


# --------------------------------------------------------------------------
# MERGE with schema evolution: an upsert batch arrives carrying a NEW
# column mid-stream (composes merge_upsert + scan_schema_evolution)
# --------------------------------------------------------------------------
@query(
    "merge_schema_evolution",
    oracle="""
    WITH target AS (
      SELECT o_orderkey,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders WHERE o_orderkey % 3 <> 0
    ),
    incoming AS (
      SELECT o_orderkey,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) + 1 AS cents,
             CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS prio_rank
      FROM orders WHERE o_orderkey % 2 = 0
    ),
    merged AS (
      SELECT o_orderkey, cents, prio_rank FROM incoming
      UNION ALL
      SELECT t.o_orderkey, t.cents, CAST(NULL AS BIGINT)
      FROM target t
      WHERE t.o_orderkey NOT IN (SELECT o_orderkey FROM incoming)
    )
    SELECT count(*) AS n_rows,
           CAST(sum(cents) AS BIGINT) AS cents_checksum,
           count(prio_rank) AS n_evolved_rows,
           CAST(sum(prio_rank) AS BIGINT) AS rank_checksum
    FROM merged
    """,
)
def merge_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE upsert where the incoming batch carries a column the
    target table has never seen (`prio_rank`) — the schema-evolution
    case every long-lived lake table hits mid-stream. The target is
    written v1 (key, cents); the batch appends v2 files (key, cents,
    prio_rank, higher version) into the SAME table directory; the read
    uses parquet `mergeSchema` so v1 files surface the new column as
    NULL; the MERGE itself is last-writer-wins per key (max version —
    one window, no driver state). Updated rows get cents+1 so an
    update that silently failed to win shows up in the checksum, and
    the oracle recomputes the merged table's stats from raw orders.
    At 100 TB: the same plan, with mergeSchema resolved from the table
    format's schema log instead of footer union."""
    import tempfile

    tag = hashlib.md5(
        (os.path.abspath(sf_dir) + ":" + spark.sparkContext.applicationId).encode()
    ).hexdigest()[:10]
    path = os.path.join(tempfile.gettempdir(), f"rg_mergevo_{tag}")
    shutil.rmtree(path, ignore_errors=True)

    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")

    # v1 target: no prio_rank column anywhere in its files
    (
        o.filter(F.col("o_orderkey") % 3 != 0)
        .select("o_orderkey", cents.alias("cents"), F.lit(0).alias("__v"))
        .write.mode("overwrite")
        .parquet(path)
    )
    # v2 incoming batch: evolved schema, appended to the same table dir
    (
        o.filter(F.col("o_orderkey") % 2 == 0)
        .select(
            "o_orderkey",
            (cents + 1).alias("cents"),
            F.substring("o_orderpriority", 1, 1).cast("bigint").alias("prio_rank"),
            F.lit(1).alias("__v"),
        )
        .write.mode("append")
        .parquet(path)
    )

    merged_read = spark.read.option("mergeSchema", "true").parquet(path)
    from pyspark.sql import Window as W

    latest = W.partitionBy("o_orderkey").orderBy(F.col("__v").desc())
    merged = (
        merged_read.withColumn("rn", F.row_number().over(latest))
        .filter(F.col("rn") == 1)
    )
    return merged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("cents").cast("bigint").alias("cents_checksum"),
        F.count("prio_rank").cast("bigint").alias("n_evolved_rows"),
        F.sum("prio_rank").cast("bigint").alias("rank_checksum"),
    )


# --------------------------------------------------------------------------
# AQE skew-join: the RUNTIME answer to the skew join_skew_salted solves
# by hand — AQE observes the actual shuffle-partition sizes and splits
# the oversized ones, no salting column, no plan rewrite by the user.
# --------------------------------------------------------------------------
@query(
    "join_skew_aqe_adaptive",
    oracle="""
    WITH f AS (
      SELECT CASE WHEN event_id % 2 = 0 THEN 0 ELSE user_id END AS k, value
      FROM events
    ),
    d AS (
      SELECT c_custkey AS k, c_mktsegment AS seg FROM customer
      UNION ALL
      SELECT 0, 'HOTKEY'
    )
    SELECT seg, count(*) AS n_rows,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM f JOIN d USING (k)
    GROUP BY seg
    """,
)
def join_skew_aqe_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewed sort-merge join left to AQE: half the fact rows collapse
    onto one hot key (k=0), broadcast is disabled, and the skew-split
    thresholds are scaled to fixture bytes so OptimizeSkewedJoin fires
    exactly as it would with defaults on a 100 TB shuffle — the
    executed plan's SortMergeJoin carries ``skew=true`` (plan-asserted
    AFTER execution in tests/test_plan_shapes.py; AQE decides from
    runtime map-output sizes, so the pre-execution plan cannot show
    it). Values are skew-invariant — the oracle is the plain join.
    Next to join_skew_salted this documents the decision rule: salt by
    hand only when AQE can't see the skew (aggregation keys, or a
    broadcast-ineligible build side you must pre-split); for plain
    fact×dim equi-joins the runtime split is free and plan-stable.
    The lowered thresholds are restored by tune() before the next key
    (session.RUNTIME_CONF carries the defaults).

    Two fixture-visibility boundaries this key measured and documents:
    (1) a skewed reduce partition can only split along MAP-output
    boundaries — the single-file fixture scans as ONE map task (one
    row group), leaving the hot partition one unsplittable block, so
    the fact side repartitions to 16 maps first (a 100 TB scan has
    thousands of maps naturally; the extra exchange exists only to
    give AQE split points); (2) the split introduces an extra shuffle
    before the downstream groupBy, which OptimizeSkewedJoin declines
    by default — forceOptimizeSkewedJoin=true is the real-deployment
    setting when the join dominates the follow-up aggregation."""
    # The lowered confs must stay live until the CALLER executes the
    # returned (lazy) frame — AQE reads them at runtime — so the
    # success path defers restoration to the next key's tune()
    # (session.RUNTIME_CONF carries every default). But an exception
    # inside THIS builder means no frame ever reaches the caller, so
    # restore immediately rather than leak 512-byte advisory sizes
    # into whatever runs next (ADVICE r8).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1KB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512b")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    try:
        return _join_skew_aqe_body(spark, sf_dir)
    except BaseException:
        from ..session import tune

        tune(spark)
        raise


def _join_skew_aqe_body(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").repartition(16)
    f_side = e.select(
        F.when(F.col("event_id") % 2 == 0, F.lit(0))
        .otherwise(F.col("user_id"))
        .cast("bigint")
        .alias("k"),
        "value",
    )
    c = load_table(spark, sf_dir, "customer")
    d_side = c.select(
        F.col("c_custkey").cast("bigint").alias("k"),
        F.col("c_mktsegment").alias("seg"),
    ).unionByName(
        spark.range(1).select(
            F.lit(0).cast("bigint").alias("k"), F.lit("HOTKEY").alias("seg")
        )
    )
    return (
        f_side.join(d_side, "k")
        .groupBy("seg")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


# --------------------------------------------------------------------------
# Versioned (manifest-log) table: time travel, incremental reads, vacuum
# — the three read-side operations the atomic-commit protocol
# (sink_atomic_commit_protocol) exists to enable. The manifest history
# IS the table-format metadata log (Delta/Iceberg snapshots) in its
# minimal honest form: one file per version listing committed batch
# dirs, `current` pointing at the latest.
# --------------------------------------------------------------------------
def _ensure_versioned_table(spark: SparkSession, sf_dir: str, name: str) -> str:
    """Build (once per session+name) a 3-version manifest-logged table:
    v1 = batch-1 (o_orderkey%3=1), v2 = +batch-2 (%3=2),
    v3 = +batch-3 (%3=0), plus one STAGED-BUT-ORPHANED dir no manifest
    references (the vacuum target). Returns the base path."""
    import tempfile

    tag = hashlib.md5(
        (os.path.abspath(sf_dir) + ":" + name + ":" + spark.sparkContext.applicationId)
        .encode()
    ).hexdigest()[:10]
    base = os.path.join(tempfile.gettempdir(), f"rg_tt_{tag}")
    # readiness marker is written LAST (after the orphan and `current`) —
    # probing an intermediate file like manifest-v3.txt would let a
    # crash mid-build cache a half-built fixture forever
    if os.path.exists(os.path.join(base, "_READY")):
        return base
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(os.path.join(base, "data"))

    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    committed: list[str] = []
    for v, residue in ((1, 1), (2, 2), (3, 0)):
        batch = f"batch-{v}"
        o.filter(F.col("o_orderkey") % 3 == residue).write.parquet(
            os.path.join(base, "data", batch)
        )
        committed.append(batch)
        tmp = os.path.join(base, f"manifest-v{v}.txt.tmp")
        with open(tmp, "w") as f:
            f.write("\n".join(committed))
        os.replace(tmp, os.path.join(base, f"manifest-v{v}.txt"))
    # the orphan: staged by a writer that died before commit
    o.filter(F.col("o_orderkey") % 3 == 1).write.parquet(
        os.path.join(base, "data", "batch-orphan")
    )
    with open(os.path.join(base, "current.tmp"), "w") as f:
        f.write("manifest-v3.txt")
    os.replace(os.path.join(base, "current.tmp"), os.path.join(base, "current"))
    open(os.path.join(base, "_READY"), "w").close()
    return base


def _read_version(spark: SparkSession, base: str, v: int) -> DataFrame:
    with open(os.path.join(base, f"manifest-v{v}.txt")) as f:
        batches = f.read().split()  # metadata-only driver read
    return spark.read.parquet(
        *[os.path.join(base, "data", b) for b in batches]
    )


@query(
    "scan_time_travel_versions",
    oracle="""
    SELECT CAST(1 AS BIGINT) AS version, count(*) AS n_rows,
           CAST(sum(o_orderkey) AS BIGINT) AS checksum
    FROM orders WHERE o_orderkey % 3 = 1
    UNION ALL
    SELECT 2, count(*), CAST(sum(o_orderkey) AS BIGINT)
    FROM orders WHERE o_orderkey % 3 IN (1, 2)
    UNION ALL
    SELECT 3, count(*), CAST(sum(o_orderkey) AS BIGINT)
    FROM orders
    """,
)
def scan_time_travel_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel: read the SAME table AS OF each committed version by
    resolving that version's manifest instead of the latest — a
    version is just 'the file list the manifest froze', so historical
    reads cost nothing beyond retaining the files. The oracle
    recomputes each version's expected content from raw orders (the
    batches are deterministic key slices), so every (version, count,
    checksum) row is value-attested. At 100 TB this is the audit/
    reproducibility read path: training-data releases pin a version,
    not a directory listing."""
    base = _ensure_versioned_table(spark, sf_dir, "timetravel")
    out = None
    for v in (1, 2, 3):
        row = _read_version(spark, base, v).agg(
            F.lit(v).cast("bigint").alias("version"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("o_orderkey").cast("bigint").alias("checksum"),
        )
        out = row if out is None else out.unionByName(row)
    return out


@query(
    "scan_incremental_since_snapshot",
    oracle="""
    SELECT CAST(count(*) FILTER (WHERE o_orderkey % 3 IN (2, 0)) AS BIGINT)
             AS n_rows_incremental,
           CAST(sum(o_orderkey) FILTER (WHERE o_orderkey % 3 IN (2, 0))
                AS BIGINT) AS incremental_checksum,
           count(*) AS n_rows_full,
           CAST(sum(o_orderkey) AS BIGINT) AS full_checksum
    FROM orders
    """,
)
def scan_incremental_since_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (CDC-style append) read off the manifest log: the
    batches in version 3 that version 1 had not committed — a consumer
    that checkpointed at v1 catches up by reading EXACTLY the new
    files, never rescanning the standing table. This is the batch-side
    complement of stream_incremental_availablenow: same exactly-once
    contract, driven by manifest diff instead of a streaming
    checkpoint. Oracle recomputes both the incremental slice and the
    full table from raw orders."""
    base = _ensure_versioned_table(spark, sf_dir, "timetravel")

    def batches(v: int) -> list[str]:
        with open(os.path.join(base, f"manifest-v{v}.txt")) as f:
            return f.read().split()

    new = [b for b in batches(3) if b not in set(batches(1))]
    inc = spark.read.parquet(*[os.path.join(base, "data", b) for b in new]).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows_incremental"),
        F.sum("o_orderkey").cast("bigint").alias("incremental_checksum"),
    )
    full = _read_version(spark, base, 3).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows_full"),
        F.sum("o_orderkey").cast("bigint").alias("full_checksum"),
    )
    # two 1-row aggregate frames folded into the audit row (documented
    # crossJoin-of-scalars class)
    return inc.crossJoin(full)


@query(
    "vacuum_orphan_files_safe",
    oracle="""
    SELECT count(*) AS n_rows_after_vacuum,
           CAST(sum(o_orderkey) AS BIGINT) AS checksum_after_vacuum,
           CAST(1 AS BIGINT) AS n_orphans_removed
    FROM orders
    """,
)
def vacuum_orphan_files_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VACUUM: delete staged data no manifest version references (the
    debris of writers that died pre-commit), and PROVE the committed
    read is untouched — the retention guarantee that makes cleanup
    safe to automate. Orphans are found by set difference (on-disk
    dirs minus the union of ALL manifests' file lists — a metadata
    operation, no data scan); the committed content is re-read after
    deletion and checksummed against the oracle's recomputation from
    raw orders.

    TRUE-literal-adjacent exemption (documented): n_orphans_removed=1
    is a FILESYSTEM count (the fixture stages exactly one orphan); no
    SQL oracle can observe the orphan dir, only the invariant that
    vacuum left committed data bit-identical — which the two REAL
    columns attest cross-engine."""
    base = _ensure_versioned_table(spark, sf_dir, "vacuum")
    data = os.path.join(base, "data")
    referenced: set[str] = set()
    for v in (1, 2, 3):
        with open(os.path.join(base, f"manifest-v{v}.txt")) as f:
            referenced.update(f.read().split())
    # idempotent within a session: a PREVIOUS invocation vacuumed the
    # fixture's orphan, so re-stage it (a dying writer leaving debris is
    # the op's precondition, not a one-shot accident) — without this a
    # retry/timing re-run would bake n_orphans_removed=0 into the row
    # and spuriously fail the oracle's pinned 1
    if not os.path.exists(os.path.join(data, "batch-orphan")):
        load_table(spark, sf_dir, "orders").select("o_orderkey").filter(
            F.col("o_orderkey") % 3 == 1
        ).write.parquet(os.path.join(data, "batch-orphan"))
    orphans = [d for d in sorted(os.listdir(data)) if d not in referenced]
    for d in orphans:
        shutil.rmtree(os.path.join(data, d))
    after = _read_version(spark, base, 3)
    return after.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows_after_vacuum"),
        F.sum("o_orderkey").cast("bigint").alias("checksum_after_vacuum"),
        F.lit(len(orphans)).cast("bigint").alias("n_orphans_removed"),
    )


# --------------------------------------------------------------------------
# Bucket-pruned point lookup: the bucketed layout's SECOND payoff
# (join_bucketed_colocated shows the exchange-free join; this shows a
# point predicate reading 1 of 8 buckets)
# --------------------------------------------------------------------------
@query(
    "bucket_pruned_point_lookup",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents
    FROM orders
    WHERE o_custkey = (SELECT min(o_custkey) FROM orders)
    GROUP BY o_custkey
    """,
)
def bucket_pruned_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup on the bucket key of a bucketBy(8) table: Spark
    prunes to the single bucket that can hold the key —
    ``SelectedBucketsCount: 1 out of 8`` in the scan, plan-asserted in
    tests/test_plan_shapes.py — so the lookup reads 1/8 of the files
    with NO index structure beyond the layout itself. At 100 TB this
    is the cheap primary-key-ish access path bucketed fact tables buy
    (the same hash that co-locates the join locates the bucket). The
    lookup key is the min custkey — a scalar-only collect — so the
    oracle recomputes the same deterministic key."""
    from .relational import ensure_bucketed_tables

    t_orders, _ = ensure_bucketed_tables(spark, sf_dir)
    key = load_table(spark, sf_dir, "orders").agg(
        F.min("o_custkey")
    ).first()[0]  # scalar-only collect
    o = spark.table(t_orders).filter(F.col("o_custkey") == key)
    return o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("sum_cents"),
    )


# --------------------------------------------------------------------------
# Partition-spec evolution: the table's partitioning CHANGED mid-life
# (Iceberg partition evolution; in plain parquet lakes, a re-layout cut
# over at a date). Old batches stay in the old layout — rewriting 100 TB
# of history to the new spec is exactly what evolution exists to avoid.
# --------------------------------------------------------------------------
@query(
    "scan_partition_layout_evolution",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(o_orderkey) AS BIGINT) AS checksum
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY o_orderpriority
    """,
)
def scan_partition_layout_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read across a partition-spec change: the table's first half
    (o_orderkey%2=1) was written partitioned by o_orderpriority; the
    second half (%2=0) by o_orderstatus (the spec the team moved to).
    A query filtering on the OLD spec's column gets directory pruning
    on the old batches (PartitionFilters) and ordinary data filtering
    + footer stats on the new ones; the union is seamless because each
    batch is read under ITS OWN layout and the partition column is
    recovered from the directory structure. This is the metadata-level
    operation 100 TB tables need when query patterns shift — evolution
    instead of rewrite. Oracle recomputes the filtered rollup from raw
    orders, proving the two-layout union loses and duplicates
    nothing."""
    import tempfile

    tag = hashlib.md5(
        (os.path.abspath(sf_dir) + ":" + spark.sparkContext.applicationId).encode()
    ).hexdigest()[:10]
    base = os.path.join(tempfile.gettempdir(), f"rg_pevo_{tag}")
    old_p, new_p = os.path.join(base, "spec1"), os.path.join(base, "spec2")
    if not (
        os.path.exists(os.path.join(old_p, "_SUCCESS"))
        and os.path.exists(os.path.join(new_p, "_SUCCESS"))
    ):
        shutil.rmtree(base, ignore_errors=True)
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority", "o_orderstatus"
        )
        o.filter(F.col("o_orderkey") % 2 == 1).write.partitionBy(
            "o_orderpriority"
        ).parquet(old_p)
        o.filter(F.col("o_orderkey") % 2 == 0).write.partitionBy(
            "o_orderstatus"
        ).parquet(new_p)

    wanted = ["1-URGENT", "2-HIGH"]
    cols = ["o_orderkey", "o_orderpriority"]
    old_read = (
        spark.read.parquet(old_p)
        .filter(F.col("o_orderpriority").isin(wanted))  # directory pruning
        .select(*cols)
    )
    new_read = (
        spark.read.parquet(new_p)
        .filter(F.col("o_orderpriority").isin(wanted))  # data filter
        .select(*cols)
    )
    return (
        old_read.unionByName(new_read)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("o_orderkey").cast("bigint").alias("checksum"),
        )
    )


# --------------------------------------------------------------------------
# Parquet aggregate pushdown: MIN/MAX/COUNT answered from footer
# statistics by the V2 reader — zero data pages decoded
# --------------------------------------------------------------------------
@query(
    "agg_pushdown_parquet_stats",
    oracle="""
    SELECT count(*) AS n_rows,
           CAST(min(o_orderkey) AS BIGINT) AS min_key,
           CAST(max(o_orderkey) AS BIGINT) AS max_key,
           CAST(min(o_custkey) AS BIGINT) AS min_cust,
           CAST(max(o_custkey) AS BIGINT) AS max_cust
    FROM orders
    """,
)
def agg_pushdown_parquet_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate pushdown INTO the parquet scan (DataSource V2 +
    spark.sql.parquet.aggregatePushdown): COUNT/MIN/MAX are answered
    from row-group footer statistics — the scan's ReadSchema becomes
    the aggregate values themselves and zero data pages are decoded
    (``PushedAggregation: [COUNT(*), MIN(...), ...]`` plan-asserted in
    tests/test_plan_shapes.py). At 100 TB this turns the row-count /
    key-range probes every orchestrator runs before planning a backfill
    from a full scan into a footer-metadata read — the same class of
    win as the zone-map audit, applied to aggregation instead of
    filtering. Parquet must route through the V2 reader
    (useV1SourceList minus parquet — scoped to this key; tune()
    restores the defaults, carried in session.RUNTIME_CONF, before the
    next key). Oracle recomputes the exact aggregates from raw rows,
    proving stats-answered == data-answered."""
    # As with join_skew_aqe_adaptive: the V2-reader confs must outlive
    # this builder (the caller plans/executes the returned frame), so
    # the success path is restored by the next key's tune(); restore
    # eagerly only on an exception inside the builder (ADVICE r8).
    spark.conf.set(
        "spark.sql.sources.useV1SourceList", "avro,csv,json,kafka,orc,text"
    )
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    try:
        o = spark.read.parquet(f"{sf_dir}/orders.parquet")
        return o.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_orderkey").cast("bigint").alias("min_key"),
            F.max("o_orderkey").cast("bigint").alias("max_key"),
            F.min("o_custkey").cast("bigint").alias("min_cust"),
            F.max("o_custkey").cast("bigint").alias("max_cust"),
        )
    except BaseException:
        from ..session import tune

        tune(spark)
        raise


# --------------------------------------------------------------------------
# Merge-on-read DELETE (deletion-vector sidecar) — the MOR complement of
# delete_copy_on_write. COW pays the rewrite at delete time; MOR writes a
# tiny key-set sidecar and pays a broadcast anti-join at read time. At
# 100 TB with sparse deletes (GDPR erasure: a few thousand keys against
# billions of rows) MOR is the economic path: zero data files rewritten,
# and the sidecar is merged away by the next scheduled compaction.
# --------------------------------------------------------------------------
def _mor_lake_fixture(
    spark: SparkSession, sf_dir: str, suffix: str
) -> tuple[str, str, str, int, int]:
    """Build (fresh, per invocation) the 8-dir key-range-partitioned
    orders lake the COW/MOR/compaction delete keys share, under a
    unique tmp base. Returns (base, data_dir, dv_dir, mx, thr); the
    CALLER writes the deletion vector (MOR wants file-listing
    assertions around that write). One definition so the three delete
    strategies provably operate on the same layout and predicate."""
    base = fixture_base(spark, sf_dir, suffix)
    data = os.path.join(base, "data")
    dv_dir = os.path.join(base, "_deletes")
    shutil.rmtree(base, ignore_errors=True)

    o = load_table(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_orderkey")).first()[0]  # scalar-only collect
    thr = (mx + 1) // 4
    fid = F.floor(
        F.col("o_orderkey") * float(_COW_PARTS) / (mx + 1)
    ).cast("bigint")
    o.withColumn("fid", fid).write.partitionBy("fid").mode(
        "overwrite"
    ).parquet(data)
    return base, data, dv_dir, mx, thr


def _mor_hit(thr: int):
    """The shared delete predicate of the COW/MOR/compaction keys."""
    return (F.col("o_orderkey") <= thr) & (F.col("o_orderkey") % 5 == 2)




@query(
    "delete_merge_on_read_dv",
    oracle=f"""
    WITH s AS (SELECT max(o_orderkey) AS mx FROM orders),
    t AS (
      SELECT o_orderkey,
             (o_orderkey <= CAST(floor((mx + 1) / 4) AS BIGINT)
              AND o_orderkey % 5 = 2) AS hit
      FROM orders, s
    )
    SELECT count(*) AS rows_before,
           CAST(sum(CAST(hit AS BIGINT)) AS BIGINT) AS rows_deleted,
           CAST(count(*) - sum(CAST(hit AS BIGINT)) AS BIGINT) AS rows_after,
           CAST(sum(o_orderkey) FILTER (WHERE NOT hit) AS BIGINT)
             AS survivor_checksum,
           CAST(0 AS BIGINT) AS n_data_files_rewritten
    FROM t
    """,
)
def delete_merge_on_read_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level DELETE via a deletion-vector sidecar (merge-on-read):
    the SAME predicate as ``delete_copy_on_write`` (low key range,
    every 5th key) against the same 8-dir partitioned layout, but
    instead of rewriting the touched partitions the delete writes ONE
    parquet sidecar holding the deleted key set under ``_deletes/``;
    the read path is ``scan LEFT ANTI (broadcast) dv``. The audit row
    carries the identical (rows_before/deleted/after, checksum)
    columns as the COW key — the oracle is the same computation, so a
    green row proves MOR read-back ≡ COW result bit-for-bit — plus
    n_data_files_rewritten, verified against the actual data-file
    listing before/after (asserted unchanged in-code; the plan test
    asserts the read side broadcasts the DV and no partition rewrite
    job ran). n_data_files_rewritten=0 is a FILESYSTEM fact (same
    documented exemption class as vacuum's n_orphans_removed): no SQL
    oracle can observe the file listing, only that the surviving
    relation is value-identical cross-engine — which the three REAL
    columns attest. Reference contrast: Proof.scala:147-151 can only
    overwrite whole outputs; neither delete path exists there."""
    _base, data, dv_dir, _mx, thr = _mor_lake_fixture(spark, sf_dir, "mor")

    def data_files() -> dict[str, float]:
        out: dict[str, float] = {}
        for root, _dirs, files in os.walk(data):
            for fn in files:
                if fn.endswith(".parquet"):
                    p = os.path.join(root, fn)
                    out[p] = os.path.getmtime(p)
        return out

    before = data_files()
    lake = spark.read.parquet(data)
    rows_before = lake.count()

    # the DELETE: write the key-set sidecar — no data file touched
    lake.filter(_mor_hit(thr)).select("o_orderkey").coalesce(1).write.mode(
        "overwrite"
    ).parquet(dv_dir)

    after = data_files()
    assert after == before, "MOR delete must not rewrite any data file"
    n_rewritten = sum(
        1 for p in set(before) | set(after)
        if before.get(p) != after.get(p)
    )

    # the MOR read path: scan + broadcast anti-join of the sidecar
    dv = spark.read.parquet(dv_dir)
    merged = spark.read.parquet(data).join(
        F.broadcast(dv), "o_orderkey", "left_anti"
    )
    return merged.agg(
        F.lit(rows_before).cast("bigint").alias("rows_before"),
        (F.lit(rows_before).cast("bigint") - F.count(F.lit(1))).alias(
            "rows_deleted"
        ),
        F.count(F.lit(1)).alias("rows_after"),
        F.sum("o_orderkey").cast("bigint").alias("survivor_checksum"),
        F.lit(n_rewritten).cast("bigint").alias("n_data_files_rewritten"),
    )


# --------------------------------------------------------------------------
# Optimistic-concurrency commit protocol on the manifest log: conflict
# DETECTION (atomic version-file creation), RESOLUTION (append rebases,
# overlapping rewrite aborts) — completing the lakehouse write path that
# sink_atomic_commit_protocol (single writer) started.
# --------------------------------------------------------------------------
def fixture_base(spark: SparkSession, sf_dir: str, tag: str) -> str:
    """tmp-dir root for a per-(fixture, sf, session) lake fixture:
    ``rg_{tag}_{md5(sf:tag:appid)[:10]}`` under tempfile.gettempdir().
    ONE definition for the dozen fixture builders across
    scale_joins/lakehouse_meta/foreach_sink — the scheme (what keys a
    fixture is scoped by) must evolve in one place, not twelve."""
    import tempfile

    h = hashlib.md5(
        (os.path.abspath(sf_dir) + f":{tag}:" + spark.sparkContext.applicationId)
        .encode()
    ).hexdigest()[:10]
    return os.path.join(tempfile.gettempdir(), f"rg_{tag}_{h}")


class CommitConflict(Exception):
    """A concurrent commit replaced/removed files this writer read."""


def _log_versions(base: str) -> list[int]:
    return sorted(
        int(f.split("-v")[1].split(".")[0])
        for f in os.listdir(base)
        if f.startswith("manifest-v") and f.endswith(".txt")
    )


def _log_read(base: str, v: int) -> list[str]:
    with open(os.path.join(base, f"manifest-v{v}.txt")) as f:
        return f.read().split()


def atomic_claim(path: str, content: str) -> bool:
    """Claim ``path`` with ``content`` atomically: fully write a unique
    temp file (mkstemp — safe across processes AND threads; the .tmp
    suffix keeps it invisible to the *.txt log scans), then hard-LINK
    it to the target name — atomic create-WITH-content (the
    object-store analog is an if-none-match PUT of the whole body).
    Exactly one concurrent writer can win a name, and no reader ever
    observes a claimed-but-empty file (an O_CREAT|O_EXCL-then-write
    scheme would expose exactly that window). Returns False if the
    name was already claimed. ONE definition for every claim site —
    manifest commits, named refs, transaction roots — so a fix (e.g.
    an fsync policy) reaches all of them."""
    import tempfile

    fd, tmp = tempfile.mkstemp(
        prefix=os.path.basename(path) + ".", suffix=".tmp",
        dir=os.path.dirname(path),
    )
    try:
        with os.fdopen(fd, "w") as f:
            f.write(content)
        try:
            os.link(tmp, path)
        except FileExistsError:
            return False
        return True
    finally:
        os.remove(tmp)  # win, lose, or crash: never leak the temp


def commit_with_conflict_detection(
    base: str,
    parent_v: int,
    add: list[str],
    remove: list[str],
    read_set: set[str],
    max_retries: int = 5,
) -> tuple[int, int]:
    """Optimistic commit: attempt to publish ``parent files - remove +
    add`` as version parent+1. The version file is claimed by
    hard-LINKING a fully-written temp file to the version name —
    atomic create-WITH-content (the object-store analog is an
    if-none-match PUT of the whole body): exactly one concurrent
    writer can win a version number, and no reader can ever observe a
    claimed-but-empty manifest (an os.open(O_EXCL)-then-write scheme
    would expose exactly that window). A loser re-reads the log: if
    every file in its ``read_set`` still exists in the new latest
    version the change is independent — REBASE onto it and retry; if
    a concurrent commit removed/replaced any file the writer's
    outcome depends on, raise CommitConflict (ABORT — the lost-update
    this protocol exists to prevent).

    Read-set validation walks EVERY intervening commit
    (parent+1..latest), not just the latest manifest: a file removed
    and later re-added under the same name between the two (the ABA
    case — e.g. a compaction dropped it, then an unrelated writer
    appended a new file reusing the name) is still a conflict,
    because the re-added file is not the bytes this writer read.
    Delta and Iceberg validate per intervening commit for the same
    reason.

    Returns (committed_version, n_retries)."""
    rm = set(remove)
    v = parent_v

    def log_read(base_: str, w: int) -> list[str]:
        # a manifest this writer depends on can disappear mid-flight if
        # snapshot expiry (lakehouse_meta.expire_snapshots) raced us —
        # classify it as the commit conflict it is, never a raw
        # FileNotFoundError the OCC protocol's callers don't handle
        try:
            return _log_read(base_, w)
        except FileNotFoundError:
            raise CommitConflict(
                f"manifest v{w} was expired by a concurrent retention "
                "pass — re-read the table and retry from a live snapshot"
            ) from None

    validated_thru = parent_v  # read_set checked against commits ≤ this
    for attempt in range(max_retries + 1):
        files = [b for b in log_read(base, v) if b not in rm] + add
        target = os.path.join(base, f"manifest-v{v + 1}.txt")
        if not atomic_claim(target, "\n".join(files)):
            latest = _log_versions(base)[-1]
            # validate read_set against EACH intervening commit:
            # removal at any step aborts, even if a same-named file
            # exists again in a later version (ABA)
            prev = set(log_read(base, validated_thru))
            for w in range(validated_thru + 1, latest + 1):
                cur = set(log_read(base, w))
                clobbered = read_set & (prev - cur)
                if clobbered:
                    raise CommitConflict(
                        f"files {sorted(clobbered)} were removed by "
                        f"concurrent commit v{w}"
                    )
                prev = cur
            validated_thru = latest
            v = latest  # independent change: rebase and retry
            continue
        return v + 1, attempt
    raise CommitConflict(f"gave up after {max_retries} rebases")


@query(
    "manifest_commit_conflict_detect",
    oracle="""
    SELECT count(*) FILTER (WHERE o_orderkey % 4 IN (1, 2))
             AS n_rows_v2,
           CAST(sum(o_orderkey) FILTER (WHERE o_orderkey % 4 IN (1, 2))
                AS BIGINT) AS checksum_v2,
           count(*) FILTER (WHERE o_orderkey % 4 IN (1, 2, 3))
             AS n_rows_final,
           CAST(sum(o_orderkey) FILTER (WHERE o_orderkey % 4 IN (1, 2, 3))
                AS BIGINT) AS checksum_final,
           CAST(3 AS BIGINT) AS final_version,
           CAST(1 AS BIGINT) AS n_retries,
           CAST(1 AS BIGINT) AS n_aborts
    FROM orders
    """,
)
def manifest_commit_conflict_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrent-writer commit conflict detection on the manifest log
    — the multi-writer half of the atomic-commit protocol. Three
    writers race against base version v1 = [b1, b2]:

    - writer A (compaction, read_set={b1}) wins v2 = [b1c, b2];
    - writer B (append b3, empty read_set) loses the v2 race, detects
      the existing version file, REBASES onto v2 and commits
      v3 = [b1c, b2, b3] — the retry branch (appends are independent
      of any concurrent change);
    - writer C (a second compaction of b1, read_set={b1}) loses the
      race AND finds b1 gone from the latest manifest — ABORT with
      CommitConflict, the lost-update a last-writer-wins log would
      silently publish.

    The audit attests v2 and the final v3 content cross-engine (the
    batches are deterministic o_orderkey%4 slices, so DuckDB recomputes
    both counts+checksums from raw orders — writer C's staged data must
    NOT appear). final_version / n_retries / n_aborts are protocol
    facts (documented filesystem-count exemption class, like vacuum's
    n_orphans_removed): the REAL cross-engine columns are the four
    count/checksum values. Detection = atomic hard-link of a fully
    written temp file to the version name — claim-with-content, so no
    reader ever sees an empty manifest (object-store equivalent:
    if-none-match PUT of the whole body); resolution = read-set
    validation against the latest manifest, exactly the
    Delta/Iceberg optimistic-concurrency design. Behavior branches
    (retry, abort, rebase-chain) are unit-tested in
    tests/test_lakehouse.py."""
    base = fixture_base(spark, sf_dir, "occ")
    # the protocol run IS the operator — rebuild the log every invocation
    # (same contract as delete_copy_on_write's fixture reset)
    shutil.rmtree(base, ignore_errors=True)
    data = os.path.join(base, "data")
    os.makedirs(data)

    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    for name, residue in (("b1", 1), ("b2", 2)):
        o.filter(F.col("o_orderkey") % 4 == residue).write.parquet(
            os.path.join(data, name)
        )
    with open(os.path.join(base, "manifest-v1.txt"), "w") as f:
        f.write("b1\nb2")

    # all three writers stage against parent v1 BEFORE any commit lands
    o.filter(F.col("o_orderkey") % 4 == 1).coalesce(1).write.parquet(
        os.path.join(data, "b1c")
    )  # A: compaction of b1
    o.filter(F.col("o_orderkey") % 4 == 3).write.parquet(
        os.path.join(data, "b3")
    )  # B: append
    o.filter(F.col("o_orderkey") % 4 == 1).coalesce(1).write.parquet(
        os.path.join(data, "b1c2")
    )  # C: competing compaction of b1

    n_retries = n_aborts = 0
    # A commits first and wins v2
    v_a, r_a = commit_with_conflict_detection(
        base, 1, add=["b1c"], remove=["b1"], read_set={"b1"}
    )
    # B raced against v1: detects A's v2, rebases, lands v3
    v_b, r_b = commit_with_conflict_detection(
        base, 1, add=["b3"], remove=[], read_set=set()
    )
    n_retries += r_a + r_b
    # C raced against v1: its read-set file b1 is gone — must abort
    try:
        commit_with_conflict_detection(
            base, 1, add=["b1c2"], remove=["b1"], read_set={"b1"}
        )
    except CommitConflict:
        n_aborts += 1

    final_v = _log_versions(base)[-1]

    def snap(v: int) -> DataFrame:
        return spark.read.parquet(
            *[os.path.join(data, b) for b in _log_read(base, v)]
        )

    v2 = snap(2).agg(
        F.count(F.lit(1)).alias("n_rows_v2"),
        F.sum("o_orderkey").cast("bigint").alias("checksum_v2"),
    )
    fin = snap(final_v).agg(
        F.count(F.lit(1)).alias("n_rows_final"),
        F.sum("o_orderkey").cast("bigint").alias("checksum_final"),
        F.lit(final_v).cast("bigint").alias("final_version"),
        F.lit(n_retries).cast("bigint").alias("n_retries"),
        F.lit(n_aborts).cast("bigint").alias("n_aborts"),
    )
    # two 1-row aggregate frames folded into the audit row (documented
    # crossJoin-of-scalars class)
    return v2.crossJoin(fin)


# --------------------------------------------------------------------------
# Row-level CDC between table versions (table_changes): compose the
# manifest log's time travel with a file-granularity diff — the consumer
# reads ONLY files that changed between two snapshots, then row-diffs
# those into insert/update/delete records. scan_incremental_since_snapshot
# covers appends; this covers the COW update/delete versions too.
# --------------------------------------------------------------------------
def _ensure_cdc_table(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per session) a 2-version manifest-logged table whose
    v1→v2 transition exercises all three change kinds, each a
    deterministic o_orderkey slice (so the oracle recomputes every CDC
    row from raw orders). Payload = integer cents of o_totalprice.

      del  : k%7==3                      (file f-del dropped in v2)
      upd  : k%7==1                      (f-upd-v1 → f-upd-v2, cents+100)
      ins  : k%5==0 and k%7 not in (1,3) (file f-ins added in v2)
      keep : the rest                    (f-keep in BOTH manifests)

    v1 = [f-keep, f-upd-v1, f-del]; v2 = [f-keep, f-upd-v2, f-ins]."""
    base = fixture_base(spark, sf_dir, "cdc")
    if os.path.exists(os.path.join(base, "_READY")):
        return base
    shutil.rmtree(base, ignore_errors=True)
    data = os.path.join(base, "data")
    os.makedirs(data)

    k = F.col("o_orderkey")
    t = load_table(spark, sf_dir, "orders").select(
        k.alias("o_orderkey"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    slices = {
        "f-del": t.filter(k % 7 == 3),
        "f-upd-v1": t.filter(k % 7 == 1),
        "f-upd-v2": t.filter(k % 7 == 1).withColumn(
            "cents", F.col("cents") + 100
        ),
        "f-ins": t.filter((k % 5 == 0) & ~(k % 7).isin(1, 3)),
        "f-keep": t.filter(~(k % 7).isin(1, 3) & (k % 5 != 0)),
    }
    for name, df in slices.items():
        df.write.parquet(os.path.join(data, name))
    for v, files in ((1, "f-keep\nf-upd-v1\nf-del"), (2, "f-keep\nf-upd-v2\nf-ins")):
        tmp = os.path.join(base, f"manifest-v{v}.txt.tmp")
        with open(tmp, "w") as f:
            f.write(files)
        os.replace(tmp, os.path.join(base, f"manifest-v{v}.txt"))
    open(os.path.join(base, "_READY"), "w").close()
    return base


@query(
    "table_changes_cdc_versions",
    oracle="""
    WITH t AS (
      SELECT o_orderkey AS k,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    )
    SELECT k AS o_orderkey, 'delete' AS change_type,
           cents AS pre_cents, CAST(NULL AS BIGINT) AS post_cents
    FROM t WHERE k % 7 = 3
    UNION ALL
    SELECT k, 'update', cents, cents + 100
    FROM t WHERE k % 7 = 1
    UNION ALL
    SELECT k, 'insert', CAST(NULL AS BIGINT), cents
    FROM t WHERE k % 5 = 0 AND k % 7 NOT IN (1, 3)
    """,
)
def table_changes_cdc_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level CDC between two committed versions
    (``table_changes(v1, v2)``): diff the manifests at FILE granularity
    first — files present in both versions cannot contribute changes
    and are NEVER scanned (asserted via df.inputFiles() in
    tests/test_lakehouse.py: f-keep, the bulk of the table, stays
    cold) — then full-outer-join the removed-file rows against the
    added-file rows on the key:

      post only            → insert   (pre_cents NULL)
      pre only             → delete   (post_cents NULL)
      both, value differs  → update   (one row carrying pre AND post)

    Rows rewritten with IDENTICAL values (pure compaction) are filtered
    out with IS DISTINCT FROM — a file rewrite is not a row change.
    At 100 TB this is the CDC economics that matter: change volume is
    proportional to touched FILES, not table size, and the row diff
    shuffles only those. Emits every CDC row (not a summary) — the
    oracle recomputes the full insert/update/delete relation from raw
    orders, so the driver value-hashes each row. Reference contrast:
    Proof.scala's sink (147-151) can only overwrite/append; no version
    or change feed exists there."""
    base = _ensure_cdc_table(spark, sf_dir)
    data = os.path.join(base, "data")

    def files(v: int) -> list[str]:
        with open(os.path.join(base, f"manifest-v{v}.txt")) as f:
            return f.read().split()

    v1, v2 = files(1), files(2)
    v1s, v2s = set(v1), set(v2)
    removed = [b for b in v1 if b not in v2s]
    added = [b for b in v2 if b not in v1s]

    pre = spark.read.parquet(*[os.path.join(data, b) for b in removed]).select(
        "o_orderkey", F.col("cents").alias("pre_cents")
    )
    post = spark.read.parquet(*[os.path.join(data, b) for b in added]).select(
        "o_orderkey", F.col("cents").alias("post_cents")
    )
    return cdc_row_diff(pre, post)


def cdc_row_diff(pre: DataFrame, post: DataFrame, key: str = "o_orderkey") -> DataFrame:
    """The row-level diff at the heart of ``table_changes``: full-outer
    join of pre-image rows (from files the new version dropped) against
    post-image rows (from files it added), classified into
    insert/delete/update; rows whose value is unchanged — a pure
    compaction rewrite — emit nothing (null-safe inequality). Exposed
    as a helper so tests drive the PRODUCTION diff, not a re-spelling."""
    diff = pre.join(post, key, "full_outer")
    return diff.select(
        key,
        F.when(F.col("pre_cents").isNull(), F.lit("insert"))
        .when(F.col("post_cents").isNull(), F.lit("delete"))
        .otherwise(F.lit("update"))
        .alias("change_type"),
        "pre_cents",
        "post_cents",
    ).filter(
        ~F.col("pre_cents").eqNullSafe(F.col("post_cents"))
    )


@query(
    "compact_merge_deletion_vectors",
    oracle=f"""
    WITH s AS (SELECT max(o_orderkey) AS mx FROM orders),
    t AS (
      SELECT o_orderkey,
             CAST(floor(o_orderkey * {_COW_PARTS}.0 / (mx + 1)) AS BIGINT)
               AS fid,
             (o_orderkey <= CAST(floor((mx + 1) / 4) AS BIGINT)
              AND o_orderkey % 5 = 2) AS hit
      FROM orders, s
    )
    SELECT CAST(count(*) - sum(CAST(hit AS BIGINT)) AS BIGINT) AS rows_after,
           CAST(sum(o_orderkey) FILTER (WHERE NOT hit) AS BIGINT)
             AS survivor_checksum,
           count(DISTINCT fid) FILTER (WHERE hit) AS n_parts_rewritten,
           CAST(0 AS BIGINT) AS dv_files_remaining
    FROM t
    """,
)
def compact_merge_deletion_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third leg of the delete lifecycle: scheduled compaction
    MERGES the deletion-vector sidecar away. MOR made the delete cheap
    (one key-set write, zero data files touched) at the price of a
    broadcast anti-join on every read; this maintenance pass pays the
    COW rewrite ONCE — only for the partitions that actually hold
    deleted keys, located from the DV alone — then drops the sidecar,
    returning the table to plain-scan reads. The audit row re-reads
    the compacted table with NO DV merge and must equal the COW
    delete's result (same predicate — the oracle is the same
    computation), proving write-cheap + read-merged + compacted are
    three routes to one relation. dv_files_remaining=0 is a
    filesystem fact (documented exemption class); the rewrite
    granularity (n_parts_rewritten = 2 of 8) is recomputed by the
    oracle from slice arithmetic. At 100 TB this is the nightly
    OPTIMIZE that keeps read amplification bounded while deletes stay
    O(changed keys) during the day."""
    _base, data, dv_dir, mx, thr = _mor_lake_fixture(spark, sf_dir, "morc")
    spark.read.parquet(data).filter(_mor_hit(thr)).select(
        "o_orderkey"
    ).coalesce(1).write.mode("overwrite").parquet(dv_dir)

    fid_of = F.floor(
        F.col("o_orderkey") * float(_COW_PARTS) / (mx + 1)
    ).cast("bigint")
    n_rewritten = compact_away_dv(spark, data, dv_dir, fid_of)

    dv_remaining = 1 if os.path.exists(dv_dir) else 0
    back = spark.read.parquet(data)  # plain scan — NO read-side merge
    return back.agg(
        F.count(F.lit(1)).alias("rows_after"),
        F.sum("o_orderkey").cast("bigint").alias("survivor_checksum"),
        F.lit(n_rewritten).cast("bigint").alias("n_parts_rewritten"),
        F.lit(dv_remaining).cast("bigint").alias("dv_files_remaining"),
    )


def compact_away_dv(spark, data: str, dv_dir: str, fid_of) -> int:
    """The compaction pass itself, reusable and directly testable:
    rewrite only the partitions the DV implies (``fid_of`` maps the
    key column to its partition id — planning cost O(|DV|), no scan
    of the standing table), apply the anti-join, then handle the
    boundary dynamic overwrite cannot: a partition whose rows are ALL
    deleted receives zero survivor rows, so dynamic overwrite leaves
    its old files in place and a plain rewrite would silently
    RESURRECT the deleted rows — those emptied partition dirs are
    dropped explicitly. Finally the sidecar is removed. Returns the
    number of partitions rewritten or dropped.

    Crash-safety ordering: the sidecar is removed LAST, so a reader
    between a partial compaction and the retry still merges the DV and
    never sees a deleted row; a retry re-derives both the touched and
    the emptied partition sets from the surviving DV (an emptied dir's
    rows are all DV hits, so they anti-join to zero survivors again),
    making every step idempotent. The survivor relation is eagerly
    MATERIALIZED (localCheckpoint) before the overwrite — the write
    job must not lazily re-read the very path it is overwriting;
    dynamic partitionOverwriteMode's stage-then-commit happens to make
    that safe today, but a compaction's correctness shouldn't ride on
    a commit-protocol implementation detail."""
    dv = spark.read.parquet(dv_dir)
    touched = dv.select(fid_of.alias("fid")).distinct()

    lake = spark.read.parquet(data)
    survivors_in_touched = lake.join(F.broadcast(touched), "fid").join(
        F.broadcast(dv), "o_orderkey", "left_anti"
    ).localCheckpoint()  # cut the lineage back to the path being rewritten
    # partitions that keep at least one survivor (tiny: bounded by the
    # touched-partition count) — computed BEFORE the overwrite mutates
    # the directory
    kept = {
        r["fid"]
        for r in survivors_in_touched.select("fid").distinct().collect()
    }
    emptied = {
        r["fid"] for r in touched.collect() if r["fid"] not in kept
    }
    survivors_in_touched.write.partitionBy("fid").mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).parquet(data)
    for f in emptied:  # the dynamic-overwrite-cannot-drop boundary
        shutil.rmtree(os.path.join(data, f"fid={f}"), ignore_errors=True)
    shutil.rmtree(dv_dir)  # the sidecar is merged away
    return len(kept) + len(emptied)


def wap_audit_row_local(spark: SparkSession, staged_path: str) -> DataFrame:
    """The WAP expectation audit for ROW-LOCAL rules (cents > 0, key
    non-null): a violation in the would-be snapshot (base ∪ staged)
    can only come from a staged row, so the audit frame reads the
    staged files ONLY — at 100 TB the quality gate costs one scan of
    the new batch, never of the published table. Module-level so
    tests can assert the frame's inputFiles exclude the base."""
    return spark.read.parquet(staged_path).filter(
        (F.col("cents") <= 0) | F.col("o_orderkey").isNull()
    )


@query(
    "sink_write_audit_publish",
    oracle="""
    WITH a AS (SELECT o_orderkey,
                      CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
               FROM orders WHERE o_orderkey % 3 = 0),
    good AS (SELECT o_orderkey,
                    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
             FROM orders WHERE o_orderkey % 3 = 1),
    bad AS (SELECT o_orderkey,
                   CASE WHEN o_orderkey % 11 = 0
                        THEN -CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                        ELSE CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                   END AS cents
            FROM orders WHERE o_orderkey % 3 = 2)
    SELECT (SELECT count(*) FROM a) + (SELECT count(*) FROM good)
             AS n_rows_final,
           (SELECT CAST(sum(o_orderkey) AS BIGINT) FROM a)
             + (SELECT CAST(sum(o_orderkey) AS BIGINT) FROM good)
             AS key_checksum_final,
           CAST((SELECT count(*) FROM good WHERE cents <= 0) AS BIGINT)
             AS good_batch_violations,
           CAST((SELECT count(*) FROM bad WHERE cents <= 0) AS BIGINT)
             AS bad_batch_violations,
           CAST(2 AS BIGINT) AS final_version,
           CAST(1 AS BIGINT) AS n_published,
           CAST(1 AS BIGINT) AS n_rejected
    """,
)
def sink_write_audit_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-Audit-Publish on the manifest log (the Iceberg WAP
    pattern): a candidate batch is STAGED as data files, the
    expectation suite runs against the staged snapshot (base + staged
    — auditing what readers WOULD see), and only a green audit
    publishes the new manifest version through the optimistic commit
    path; a red audit leaves the log untouched and the staged dir an
    orphan for vacuum. Two candidates against base v1 (orders%3=0):
    the good batch (%3=1) passes (0 violations) and publishes v2; the
    bad batch (%3=2, with cents negated where key%11=0 — the planted
    defect) is REJECTED, so the final table must contain base+good
    exactly and the log must end at v2. The oracle recomputes the
    final count/checksum AND both audit violation counts from the
    planted rule — only final_version/n_published/n_rejected are
    protocol facts (documented exemption class). This is the
    quality gate every production ingestion runs BEFORE making data
    visible; at 100 TB the audit costs one scan of the STAGED FILES
    ONLY — the planted expectations (cents > 0, key non-null) are
    ROW-LOCAL, so a violation in the would-be snapshot can only come
    from a staged row; the already-published base need not be
    rescanned (tests assert the audit's inputFiles exclude it).
    Expectation classes that are NOT row-local — uniqueness/PK (a
    staged key may collide with a base key), FK referential integrity
    (a staged row may reference a base row), cross-row aggregates
    (row-count drift, distribution shift) — genuinely require the
    base side too, though as an index/anti-join probe of the staged
    keys against base statistics, never a full base rescan."""
    base = fixture_base(spark, sf_dir, "wap")
    # the publish decision IS the operator — rebuild per invocation
    shutil.rmtree(base, ignore_errors=True)
    data = os.path.join(base, "data")
    os.makedirs(data)

    k = F.col("o_orderkey")
    t = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    t.filter(k % 3 == 0).write.parquet(os.path.join(data, "base"))
    with open(os.path.join(base, "manifest-v1.txt"), "w") as f:
        f.write("base")

    t.filter(k % 3 == 1).write.parquet(os.path.join(data, "cand-good"))
    t.filter(k % 3 == 2).withColumn(
        "cents",
        F.when(k % 11 == 0, -F.col("cents")).otherwise(F.col("cents")),
    ).write.parquet(os.path.join(data, "cand-bad"))

    def audit(staged: str) -> int:
        """Violations the would-be snapshot (base ∪ staged) adds over
        the published base. The rules here are ROW-LOCAL, so only the
        staged files can introduce one — the audit scans them alone
        (inputFiles asserted base-free in tests). Scalar-only collect."""
        return wap_audit_row_local(spark, os.path.join(data, staged)).count()

    n_published = n_rejected = 0
    violations = {}
    for cand in ("cand-good", "cand-bad"):
        v = audit(cand)
        violations[cand] = v
        if v == 0:
            commit_with_conflict_detection(
                base, _log_versions(base)[-1], add=[cand], remove=[],
                read_set=set(),
            )
            n_published += 1
        else:
            n_rejected += 1  # staged dir stays an orphan for vacuum

    final_v = _log_versions(base)[-1]
    final = spark.read.parquet(
        *[os.path.join(data, b) for b in _log_read(base, final_v)]
    )
    return final.agg(
        F.count(F.lit(1)).alias("n_rows_final"),
        F.sum("o_orderkey").cast("bigint").alias("key_checksum_final"),
        F.lit(violations["cand-good"]).cast("bigint")
        .alias("good_batch_violations"),
        F.lit(violations["cand-bad"]).cast("bigint")
        .alias("bad_batch_violations"),
        F.lit(final_v).cast("bigint").alias("final_version"),
        F.lit(n_published).cast("bigint").alias("n_published"),
        F.lit(n_rejected).cast("bigint").alias("n_rejected"),
    )
