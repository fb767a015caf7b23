"""Spatial operators: grid-partitioned radius join.

The engine has three range-join spellings (theta, binned-1D,
keyed-interval); this adds the 2-D member of the family — the
fixed-grid spatial join every geo workload needs (points within
radius r of a site). The scale pattern is cell indexing: sites index
into their grid cell, probe points replicate to the 3×3 cell
neighborhood (9×, a constant), the join is a cell equi-join with the
exact distance predicate as residual — never an all-pairs cross.
With cell width ≥ r, the 3×3 neighborhood provably contains every
candidate within r.

Coordinates here are derived deterministically from fixture keys
(Knuth multiplicative hash onto a 1000×1000 integer grid) so both
engines compute identical integer points; the distance test runs in
exact integer arithmetic (dx² + dy² ≤ r²) — no float geometry
crosses engines. The same plan with real lat/lon swaps the hash for
a projection and the residual for haversine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query

#: Knuth multiplicative constants for the two pseudo-coordinates.
_HX = 2654435761
_HY = 2246822519
_MASK = 2147483648  # 31-bit pre-mask: keeps id*multiplier inside int64 at any id scale
_GRID = 1000  # coordinate domain [0, 1000)²
_R = 25       # radius; cell width = _R so 3×3 neighborhood suffices


def _pt(key: str, out_x: str, out_y: str) -> list:
    return [
        F.pmod((F.col(key) % F.lit(_MASK)) * F.lit(_HX), F.lit(_GRID)).cast("long").alias(out_x),
        F.pmod((F.col(key) % F.lit(_MASK)) * F.lit(_HY), F.lit(_GRID)).cast("long").alias(out_y),
    ]


def _sql_pt(key: str, out_x: str, out_y: str) -> str:
    return (
        f"((({key} % {_MASK}) * {_HX}) % {_GRID} + {_GRID}) % {_GRID} AS {out_x}, "
        f"((({key} % {_MASK}) * {_HY}) % {_GRID} + {_GRID}) % {_GRID} AS {out_y}"
    )


@query(
    "join_spatial_grid",
    oracle=f"""
    WITH sites AS (
      SELECT s_suppkey, {_sql_pt('s_suppkey', 'sx', 'sy')} FROM supplier
    ),
    pts AS (
      SELECT c_custkey, {_sql_pt('c_custkey', 'px', 'py')} FROM customer
    )
    SELECT s_suppkey,
           count(*) AS n_within,
           CAST(min((sx - px) * (sx - px) + (sy - py) * (sy - py))
                AS BIGINT) AS min_dist2
    FROM sites JOIN pts
      ON (sx - px) * (sx - px) + (sy - py) * (sy - py) <= {_R * _R}
    GROUP BY s_suppkey
    """,
)
def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius join on the grid-index path: customers within r=25 of
    each supplier site, counted per site with the exact nearest
    distance². Sites hash to ONE cell; probes replicate to the 3×3
    neighborhood (constant 9×); the join is a cell equi-join with the
    integer-exact distance residual. The oracle intentionally keeps
    the naive theta spelling — identical answers, so the key attests
    that the grid index loses no matches (the contrast mirrors
    join_theta_range vs join_range_binned in 1-D)."""
    cell = lambda c: F.floor(c / _R).cast("long")  # noqa: E731
    sites = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", *_pt("s_suppkey", "sx", "sy")
    ).select(
        "s_suppkey", "sx", "sy",
        cell(F.col("sx")).alias("cx"), cell(F.col("sy")).alias("cy"),
    )
    pts = load_table(spark, sf_dir, "customer").select(
        "c_custkey", *_pt("c_custkey", "px", "py")
    )
    # probe-side replication to the 3×3 neighborhood
    nb = F.explode(
        F.array(*[F.lit(d) for d in (-1, 0, 1)])
    )
    probes = (
        pts.withColumn("dx", nb)
        .withColumn("dy", F.explode(F.array(*[F.lit(d) for d in (-1, 0, 1)])))
        .select(
            "c_custkey", "px", "py",
            (cell(F.col("px")) + F.col("dx")).alias("cx"),
            (cell(F.col("py")) + F.col("dy")).alias("cy"),
        )
    )
    d2 = (F.col("sx") - F.col("px")) * (F.col("sx") - F.col("px")) + (
        F.col("sy") - F.col("py")
    ) * (F.col("sy") - F.col("py"))
    return (
        sites.join(probes, ["cx", "cy"])
        .filter(d2 <= F.lit(_R * _R))
        .groupBy("s_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_within"),
            F.min(d2).cast("bigint").alias("min_dist2"),
        )
    )


# --------------------------------------------------------------------------
# 2-D heatmap binning (density grid aggregation)
# --------------------------------------------------------------------------
@query(
    "spatial_heatmap_bin",
    oracle=f"""
    WITH pts AS (
      SELECT ((c_custkey % {_MASK}) * {_HX}) % {_GRID} AS x,
             ((c_custkey % {_MASK}) * {_HY}) % {_GRID} AS y,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
      FROM customer
    )
    SELECT CAST(x // 100 AS BIGINT) AS cell_x,
           CAST(y // 100 AS BIGINT) AS cell_y,
           count(*) AS n_points,
           CAST(sum(cents) AS DOUBLE) / 100 AS total_acctbal
    FROM pts GROUP BY 1, 2
    """,
)
def spatial_heatmap_bin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D density-grid aggregation (heatmap binning): points bucket
    into a 10×10 coarse grid, each cell reporting count + exact mass —
    the tile-aggregation shape behind map heatmaps and spatial
    histograms, and the density pre-pass before the grid radius join
    (join_spatial_grid) picks its cell width. Coordinates come from
    the module's deterministic pseudo-geography (masked multiplicative
    hashes, oracle-identical); binning is pure integer division, the
    aggregate is one partial-agg groupBy with output bounded by grid
    size — the ideal 100 TB shape (cells, not points, cross the
    shuffle). Money folds to integer cents before summing."""
    c = load_table(spark, sf_dir, "customer")
    pts = c.select(
        F.pmod((F.col("c_custkey") % _MASK) * _HX, F.lit(_GRID)).alias("x"),
        F.pmod((F.col("c_custkey") % _MASK) * _HY, F.lit(_GRID)).alias("y"),
        F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    return pts.groupBy(
        F.floor(F.col("x") / 100).cast("bigint").alias("cell_x"),
        F.floor(F.col("y") / 100).cast("bigint").alias("cell_y"),
    ).agg(
        F.count(F.lit(1)).alias("n_points"),
        (F.sum("cents").cast("double") / 100).alias("total_acctbal"),
    )


#: DBSCAN parameters: eps-neighborhood radius and the core-point
#: density threshold (neighbor count INCLUDING the point itself).
_EPS = 100
_MINPTS = 4


#: Dense-cell shortcut width: with cell ≤ eps/√2 the cell diagonal is
#: ≤ eps, so ≥ _MINPTS points in ONE cell are all mutually within eps.
_DB_CELL = 70
#: 5×5 neighborhood of 70-cells covers the eps=100 disc (2·70 ≥ 100+70).
_DB_RINGS = 2


@query(
    "spatial_dbscan_corepoints",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey, {_sql_pt('c_custkey', 'px', 'py')} FROM customer
    )
    SELECT a.c_custkey
    FROM pts a JOIN pts b
      ON (a.px - b.px) * (a.px - b.px) + (a.py - b.py) * (a.py - b.py)
         <= {_EPS * _EPS}
    GROUP BY a.c_custkey
    HAVING count(*) >= {_MINPTS}
    """,
)
def spatial_dbscan_corepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN stage 1 — core points (eps=100 neighborhood, itself
    included, holds ≥ 4 points) via the GRID-DENSITY SHORTCUT that
    keeps the step sub-quadratic at any density: with cell width
    70 ≤ eps/√2 the cell diagonal is ≤ eps, so every point of a cell
    already holding ≥ 4 points is core with ZERO pair work; only
    sparse-cell points (< 4 in-cell) probe the 5×5 cell neighborhood
    for exact integer-distance counting. The two regimes bound each
    other out: high density ⇒ almost all cells dense ⇒ almost no
    probes; low density ⇒ probes many but candidates-per-probe tiny.
    The naive all-pairs spelling went 144× on 10× data on the sf1
    probe (fixed domain ⇒ density grows with SF ⇒ O(n²) pairs) — THIS
    plan replaces it; the DuckDB oracle keeps the naive spelling, so
    the shortcut is value-attested to lose/invent no core point.
    Stage 2 (cluster expansion) is connected components over
    core-core edges — [[dedup_cluster_cc]]'s operator applies
    verbatim."""
    cell = lambda c: F.floor(c / _DB_CELL).cast("long")  # noqa: E731
    pts = load_table(spark, sf_dir, "customer").select(
        "c_custkey", *_pt("c_custkey", "px", "py")
    ).select(
        "c_custkey", "px", "py",
        cell(F.col("px")).alias("cx"), cell(F.col("py")).alias("cy"),
    )
    # one partial-agg shuffle: in-cell occupancy
    cell_n = pts.groupBy("cx", "cy").agg(F.count(F.lit(1)).alias("n_cell"))
    tagged = pts.join(cell_n, ["cx", "cy"])
    dense_core = tagged.filter(F.col("n_cell") >= _MINPTS).select("c_custkey")
    sparse = tagged.filter(F.col("n_cell") < _MINPTS).select(
        F.col("c_custkey").alias("key_a"),
        F.col("px").alias("ax"),
        F.col("py").alias("ay"),
        "cx",
        "cy",
    )
    # Probe build WITHOUT replicating the corpus 25x (r6 verdict): the
    # 5x5 neighborhood explode runs on the DISTINCT sparse-cell set
    # (small by construction in the dense regime), producing a
    # (probe-cell -> sparse-cell) mapping; one equi-join against that
    # mapping replicates a corpus point ONLY for sparse cells it is
    # actually adjacent to. Dense regime => almost no sparse cells =>
    # almost zero probe shuffle, instead of 25x corpus I/O.
    rng = list(range(-_DB_RINGS, _DB_RINGS + 1))
    need = (
        sparse.select(F.col("cx").alias("scx"), F.col("cy").alias("scy"))
        .distinct()
        .withColumn("dx", F.explode(F.array(*[F.lit(d) for d in rng])))
        .withColumn("dy", F.explode(F.array(*[F.lit(d) for d in rng])))
        .select(
            (F.col("scx") + F.col("dx")).alias("pcx"),
            (F.col("scy") + F.col("dy")).alias("pcy"),
            "scx", "scy",
        )
    )
    probes = (
        load_table(spark, sf_dir, "customer")
        .select(*_pt("c_custkey", "bx", "by"))
        .select(
            "bx", "by",
            cell(F.col("bx")).alias("pcx"),
            cell(F.col("by")).alias("pcy"),
        )
        .join(need, ["pcx", "pcy"])
        .select(
            "bx", "by",
            F.col("scx").alias("cx"),
            F.col("scy").alias("cy"),
        )
    )
    d2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    sparse_core = (
        sparse.join(probes, ["cx", "cy"])
        .filter(d2 <= F.lit(_EPS * _EPS))
        .groupBy("key_a")
        .agg(F.count(F.lit(1)).alias("n_in_eps"))
        .filter(F.col("n_in_eps") >= _MINPTS)
        .select(F.col("key_a").alias("c_custkey"))
    )
    return dense_core.unionByName(sparse_core)
