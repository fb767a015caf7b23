"""Feature-engineering surface — the transforms between a cleaned
corpus/table and a training matrix. All JVM-side (window/agg/when
chains inside whole-stage codegen), all partial-agg or single-window
shapes that survive 100 TB, each with a full DuckDB value oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import dround
from ..sources import load_table
from .registry import query


@query(
    "feature_quantile_bin",
    oracle="""
    WITH b AS (
      SELECT o_orderkey, ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bin
      FROM orders
    )
    SELECT bin, count(*) AS n,
           CAST(min(o.o_totalprice) AS DOUBLE) AS lo,
           CAST(max(o.o_totalprice) AS DOUBLE) AS hi
    FROM b JOIN orders o USING (o_orderkey)
    GROUP BY bin
    """,
)
def feature_quantile_bin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency binning (deciles) of a numeric feature with
    per-bin ranges — the discretization step before bucketized
    features / calibration curves. ntile over a deterministic total
    order (value, key). The global sort is the one wide op; at 100 TB
    the same result comes from approx_percentile cut points + a
    map-side CASE, which `histogram_fixed_width` and
    `agg_approx_percentile` already demonstrate — this key pins the
    EXACT spelling both engines agree on."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy(F.col("o_totalprice").asc(), F.col("o_orderkey").asc())
    b = o.select(
        "o_orderkey",
        F.col("o_totalprice"),
        F.ntile(10).over(w).alias("bin"),
    )
    return b.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_totalprice").cast("double").alias("lo"),
        F.max("o_totalprice").cast("double").alias("hi"),
    )


@query(
    "feature_minmax_scale",
    oracle="""
    WITH s AS (
      SELECT min(c_acctbal) AS mn, max(c_acctbal) AS mx FROM customer
    )
    SELECT c_custkey,
           floor((c_acctbal - mn) / nullif(mx - mn, 0) * 1000000 + 0.5) / 1000000
             AS acctbal_scaled
    FROM customer, s
    """,
)
def feature_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-max scaling to [0,1]: the two-pass normalize (tiny stats
    aggregate broadcast back over the table — map-side, zero shuffle
    of the big side). nullif guards the constant-column case. Rounded
    via the deterministic cross-engine dround."""
    c = load_table(spark, sf_dir, "customer")
    stats = c.agg(
        F.min("c_acctbal").alias("mn"), F.max("c_acctbal").alias("mx")
    ).withColumn("__k", F.lit(1))
    scaled = c.withColumn("__k", F.lit(1)).join(F.broadcast(stats), "__k").select(
        "c_custkey",
        dround(
            (F.col("c_acctbal") - F.col("mn"))
            / F.nullif(F.col("mx") - F.col("mn"), F.lit(0)),
            6,
        ).alias("acctbal_scaled"),
    )
    return scaled


@query(
    "feature_onehot_topk",
    oracle="""
    WITH top AS (
      SELECT p_brand FROM (
        SELECT p_brand, count(*) AS n,
               row_number() OVER (ORDER BY count(*) DESC, p_brand ASC) AS rk
        FROM part GROUP BY p_brand
      ) WHERE rk <= 5
    )
    SELECT p.p_partkey,
           CASE WHEN t.p_brand IS NULL THEN '__other__' ELSE p.p_brand END
             AS brand_bucket
    FROM part p LEFT JOIN top t USING (p_brand)
    """,
)
def feature_onehot_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k category bucketing — the vocabulary step before one-hot /
    embedding-table features: the k most frequent categories keep
    their identity, the long tail folds into '__other__'. The
    vocabulary is a tiny aggregate (broadcast back); the wide table
    never shuffles. Unbounded-cardinality one-hot is the classic
    training-pipeline scale bug this operator prevents."""
    p = load_table(spark, sf_dir, "part")
    w = Window.orderBy(F.col("n").desc(), F.col("p_brand").asc())
    top = (
        p.groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("p_brand", F.lit(True).alias("__top"))
    )
    return p.join(F.broadcast(top), "p_brand", "left").select(
        "p_partkey",
        F.when(F.col("__top").isNotNull(), F.col("p_brand"))
        .otherwise(F.lit("__other__"))
        .alias("brand_bucket"),
    )


@query(
    "quality_linear_score",
    oracle="""
    WITH feats AS (
      SELECT doc_id,
             CAST(n_chars AS DOUBLE) AS f_chars,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS DOUBLE) AS f_toks,
             CAST(length(text) - length(translate(text, '.,!?', ''))
                  AS DOUBLE) AS f_punct
      FROM documents
    )
    SELECT doc_id,
           floor((0.002 * f_chars + 0.05 * f_toks - 0.2 * f_punct)
                 * 1000000 + 0.5) / 1000000 AS score,
           (0.002 * f_chars + 0.05 * f_toks - 0.2 * f_punct) >= 1.0 AS keep
    FROM feats
    """,
)
def quality_linear_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality-model INFERENCE over the corpus: a trained
    model's weight vector applied to per-document features — the
    classifier-scoring stage of a training-data pipeline (FastText /
    logreg quality filters), minus the external model artifact.

    The weights are literals here (in production: a broadcast
    array from the model store); the features (char count, token
    count, punctuation count) and the dot product are all JVM-side
    narrow expressions inside whole-stage codegen — embarrassingly
    parallel, zero shuffles, the ideal 100 TB shape. Feature values
    are exact integers widened to double, so the score is the same
    IEEE-754 expression on both engines; dround(6)-pinned. The logit
    is emitted raw (monotone in the probability) so no exp() crosses
    engines; `keep` thresholds it."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.size(F.filter(F.split(F.col("text"), " "), lambda x: x != ""))
    punct = F.length("text") - F.length(F.translate(F.col("text"), ".,!?", ""))
    score = (
        F.lit(0.002) * F.col("n_chars").cast("double")
        + F.lit(0.05) * toks.cast("double")
        - F.lit(0.2) * punct.cast("double")
    )
    return d.select(
        "doc_id",
        dround(score, 6).alias("score"),
        (score >= F.lit(1.0)).alias("keep"),
    )


@query(
    "eval_classification_metrics",
    oracle="""
    WITH scored AS (
      SELECT (0.002 * n_chars
              + 0.05 * len(list_filter(string_split(text, ' '), x -> x <> ''))
              - 0.2 * (length(text) - length(translate(text, '.,!?', ''))))
               >= 1.0 AS pred,
             n_chars >= 400 AS actual
      FROM documents
    ),
    cm AS (
      SELECT
        CAST(sum(CASE WHEN pred AND actual THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        CAST(sum(CASE WHEN pred AND NOT actual THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        CAST(sum(CASE WHEN NOT pred AND actual THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        CAST(sum(CASE WHEN NOT pred AND NOT actual THEN 1 ELSE 0 END) AS BIGINT) AS tn
      FROM scored
    )
    SELECT tp, fp, fn, tn,
           floor(tp * 1.0 / nullif(tp + fp, 0) * 1000000 + 0.5) / 1000000
             AS precision,
           floor(tp * 1.0 / nullif(tp + fn, 0) * 1000000 + 0.5) / 1000000
             AS recall,
           floor(2.0 * tp / nullif(2 * tp + fp + fn, 0) * 1000000 + 0.5) / 1000000
             AS f1
    FROM cm
    """,
)
def eval_classification_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation: confusion matrix + precision/recall/F1
    of the linear quality model (`quality_linear_score` threshold)
    against a reference label — the metrics pass that closes the
    train→infer→evaluate loop every data-quality filter runs before
    deployment. ONE scan, one conditional-sum aggregate (4 counters),
    metrics as ratios of exact integers — the shape stays a single
    partial-aggregable pass at any corpus size. F1 is computed as
    2tp/(2tp+fp+fn) — one division, no nested null handling."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.size(F.filter(F.split(F.col("text"), " "), lambda x: x != ""))
    punct = F.length("text") - F.length(F.translate(F.col("text"), ".,!?", ""))
    score = (
        F.lit(0.002) * F.col("n_chars").cast("double")
        + F.lit(0.05) * toks.cast("double")
        - F.lit(0.2) * punct.cast("double")
    )
    pred = score >= F.lit(1.0)
    actual = F.col("n_chars") >= F.lit(400)
    c = lambda cond: F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")  # noqa: E731
    cm = d.agg(
        c(pred & actual).alias("tp"),
        c(pred & ~actual).alias("fp"),
        c(~pred & actual).alias("fn"),
        c(~pred & ~actual).alias("tn"),
    )
    nz = lambda col: F.nullif(col, F.lit(0))  # noqa: E731
    return cm.select(
        "tp", "fp", "fn", "tn",
        dround(F.col("tp") * F.lit(1.0) / nz(F.col("tp") + F.col("fp")), 6).alias("precision"),
        dround(F.col("tp") * F.lit(1.0) / nz(F.col("tp") + F.col("fn")), 6).alias("recall"),
        dround(F.lit(2.0) * F.col("tp") / nz(F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn")), 6).alias("f1"),
    )


@query(
    "sample_class_balanced",
    oracle="""
    WITH counts AS (
      SELECT label, count(*) AS n FROM embeddings GROUP BY label
    ),
    floor_n AS (SELECT min(n) AS n_min FROM counts),
    ranked AS (
      SELECT label, vec_id,
             row_number() OVER (PARTITION BY label
               ORDER BY ((vec_id % 2147483648) * 2654435761) % 1048573, vec_id) AS r
      FROM embeddings
    )
    SELECT label,
           count(*) AS n_kept,
           CAST(sum(vec_id) AS BIGINT) AS sum_ids
    FROM ranked
    WHERE r <= (SELECT n_min FROM floor_n)
    GROUP BY label
    """,
)
def sample_class_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class rebalancing for training: every label downsampled to the
    minority-class count by a DETERMINISTIC pseudo-random rank
    (Knuth multiplicative hash of the id, modulo a prime — stable
    across runs, retries and engines, unlike rand()). One grouped
    count + one per-label window; the window partitions by label so
    no global sort exists. The kept set is value-checked via per-label
    id sums. At extreme per-label cardinality the window swaps for
    the hash-threshold spelling (keep if h(id) < n_min/n_label
    quantile) — `sample_stratified`'s pattern — trading exactness of
    the count for a sort-free single pass."""
    emb = load_table(spark, sf_dir, "embeddings")
    n_min = (
        emb.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
        .agg(F.min("n")).collect()[0][0]
    )
    w = Window.partitionBy("label").orderBy(
        ((F.col("vec_id") % F.lit(2147483648)) * F.lit(2654435761)) % F.lit(1048573), F.col("vec_id")
    )
    return (
        emb.select("label", "vec_id", F.row_number().over(w).alias("r"))
        .filter(F.col("r") <= F.lit(n_min))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("vec_id").cast("bigint").alias("sum_ids"),
        )
    )


#: 4 bits per dimension → 16×16 Z-cells. The bit-interleave is spelled
#: with the same >>/&/<< integer ops on both engines.
_ZBITS = 4
_Z_SQL = " + ".join(
    [f"(((bx >> {i}) & 1) << {2 * i})" for i in range(_ZBITS)]
    + [f"(((bby >> {i}) & 1) << {2 * i + 1})" for i in range(_ZBITS)]
)


def _z_interleave(bx, bby):
    """Morton code: interleave the low _ZBITS bits of two bucket ids."""
    terms = []
    for i in range(_ZBITS):
        terms.append(F.shiftleft(F.shiftright(bx, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(bby, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return z


@query(
    "zorder_cluster",
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
    ),
    z AS (
      SELECT l_partkey, l_suppkey, {{zexpr}} AS zval FROM g
    )
    SELECT zval, count(*) AS n_rows,
           min(l_partkey) AS min_pk, max(l_partkey) AS max_pk,
           min(l_suppkey) AS min_sk, max(l_suppkey) AS max_sk
    FROM z GROUP BY zval
    """.format(zexpr=_Z_SQL),
)
def zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key + per-cell zone map — the
    write-time data-layout op behind multi-dimensional scan pruning
    (Delta OPTIMIZE ZORDER BY, Iceberg sort orders). Interleaving the
    bits of two bucketed dimensions gives ONE sort key under which
    rows close in (partkey, suppkey) space land in the same files, so
    per-file min/max zone maps prune scans filtered on EITHER
    dimension — a plain sort on partkey leaves suppkey min/max spans
    at full width. At 100 TB the full op is
    ``repartitionByRange(zval).sortWithinPartitions(zval)`` + parquet
    write (one range shuffle); this key computes the zval (pure
    integer bit ops, zero UDFs, one broadcast of the 1-row min/max
    stats) and returns the per-cell zone map — n_rows + both
    dimensions' min/max — whose bounded spans ARE the pruning
    guarantee the layout exists to provide. Bit-identical across
    engines: bucket ids from exact integer floor division, Morton
    code from >>/&/<<."""
    li = load_table(spark, sf_dir, "lineitem")
    stats = li.agg(
        F.min("l_partkey").alias("mnp"),
        F.max("l_partkey").alias("mxp"),
        F.min("l_suppkey").alias("mns"),
        F.max("l_suppkey").alias("mxs"),
    ).withColumn("__k", F.lit(1))
    g = (
        li.select("l_partkey", "l_suppkey")
        .withColumn("__k", F.lit(1))
        .join(F.broadcast(stats), "__k")
        .select(
            "l_partkey",
            "l_suppkey",
            F.floor(
                (F.col("l_partkey") - F.col("mnp")) * 16.0
                / (F.col("mxp") - F.col("mnp") + 1)
            ).alias("bx"),
            F.floor(
                (F.col("l_suppkey") - F.col("mns")) * 16.0
                / (F.col("mxs") - F.col("mns") + 1)
            ).alias("bby"),
        )
    )
    z = g.select(
        "l_partkey", "l_suppkey", _z_interleave(F.col("bx"), F.col("bby")).alias("zval")
    )
    return z.groupBy("zval").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_partkey").alias("min_pk"),
        F.max("l_partkey").alias("max_pk"),
        F.min("l_suppkey").alias("min_sk"),
        F.max("l_suppkey").alias("max_sk"),
    )


@query(
    "feature_quantile_bin_approx",
    oracle="""
    WITH cuts AS (
      -- EXACT deciles oracle-side (quantile_cont), deliberately NOT
      -- DuckDB's approx_quantile: the oracle states the balance
      -- invariant from ground truth, so a DuckDB version bump or an
      -- unlucky t-digest cannot flip the attestation while Spark is
      -- correct. The sketch under test is Spark's GK sketch alone.
      SELECT quantile_cont(o_totalprice,
               [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS c
      FROM orders
    ),
    binned AS (
      SELECT len(list_filter(c, x -> x <= o_totalprice)) AS bin
      FROM orders, cuts
    ),
    per_bin AS (SELECT bin, count(*) AS n FROM binned GROUP BY bin)
    SELECT count(*) AS n_bins,
           CAST(sum(n) AS BIGINT) AS total,
           (max(n) - sum(n) / 10.0 <= sum(n) / 10.0 * 0.05
            AND sum(n) / 10.0 - min(n) <= sum(n) / 10.0 * 0.05)
             AS balanced_ok
    FROM per_bin
    """,
)
def feature_quantile_bin_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB path of feature_quantile_bin: decile cut-points from
    the Greenwald-Khanna approx-percentile SKETCH (mergeable bounded
    state, one partial-agg pass) instead of a global ntile sort —
    ntile's single total order is the one window shape that cannot
    scale out. Rows bin by branchless array search over the 9
    broadcast cut-points (map-side, zero shuffle of the fact table);
    the per-bin populations are then attested: 10 bins materialize,
    every row lands in a bin, and every bin is within ±5% OF THE
    EXPECTED BIN SIZE n/10 — i.e. band = (n/10)·0.05, a tight check
    (GK accuracy 10000 on this data is near-exact; the band catches a
    broken sketch or off-by-one binning, not tuning drift). The
    sketch's cut values are engine-internal, so the oracle does NOT
    assert TRUE literals: DuckDB computes EXACT deciles
    (quantile_cont), bins with the same branchless list-search, and
    derives (n_bins, total, balanced_ok) from ground truth — so only
    Spark's GK sketch is under test, and a DuckDB version bump or an
    unlucky oracle-side sketch cannot flip the attestation (ADVICE r8;
    previously the oracle used DuckDB's own approx_quantile, coupling
    the green row to two sketches at once)."""
    o = load_table(spark, sf_dir, "orders")
    cuts = o.agg(
        F.percentile_approx(
            "o_totalprice", [i / 10.0 for i in range(1, 10)], 10000
        ).alias("cuts")
    ).withColumn("__k", F.lit(1))
    binned = (
        o.withColumn("__k", F.lit(1))
        .join(F.broadcast(cuts), "__k")
        .select(
            F.size(
                F.filter(F.col("cuts"), lambda c: c <= F.col("o_totalprice"))
            ).alias("bin")
        )
    )
    per_bin = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("n"))
    stats = per_bin.agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum("n").alias("total"),
        F.max("n").alias("mx"),
        F.min("n").alias("mn"),
    )
    tenth = F.col("total") / 10.0
    band = tenth * 0.05
    return stats.select(
        "n_bins",
        "total",
        ((F.col("mx") - tenth <= band) & (tenth - F.col("mn") <= band)).alias(
            "balanced_ok"
        ),
    )


@query(
    "kanonymity_audit",
    oracle="""
    SELECT c_nationkey, c_mktsegment,
           count(*) AS class_size,
           count(*) < 10 AS at_risk
    FROM customer
    GROUP BY c_nationkey, c_mktsegment
    """,
)
def kanonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over a quasi-identifier set (nation ×
    market segment): the size of every equivalence class, with
    classes below k=10 flagged — records in such classes are
    re-identifiable by the quasi-identifiers alone, the
    data-governance gate run before a table is released for training
    or analytics. One partial-agg groupBy whose output is bounded by
    the QI-combination count, not the table size; the generalization
    ladder (coarsen a QI, re-audit) is this same query re-run, so at
    100 TB each rung costs one aggregation pass."""
    c = load_table(spark, sf_dir, "customer")
    n = F.count(F.lit(1))
    return c.groupBy("c_nationkey", "c_mktsegment").agg(
        n.alias("class_size"), (n < 10).alias("at_risk")
    )


@query(
    "feature_winsorize",
    oracle="""
    WITH q AS (
      SELECT quantile_cont(c_acctbal, 0.05) AS p05,
             quantile_cont(c_acctbal, 0.95) AS p95
      FROM customer
    )
    SELECT c_custkey,
           floor(least(greatest(c_acctbal, p05), p95) * 10000 + 0.5) / 10000
             AS acctbal_winsorized,
           c_acctbal < p05 OR c_acctbal > p95 AS was_clipped
    FROM customer, q
    """,
)
def feature_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization: clip a numeric feature to its [p05, p95]
    percentile band — the outlier-robust alternative to dropping rows
    (heavy-tailed monetary features otherwise dominate scaled inputs;
    anomaly_mad flags outliers, this op REPAIRS them). Exact
    interpolated percentiles from one tiny aggregate, broadcast-cross
    back over the table (map-side clip, the feature_minmax_scale
    posture — zero shuffle of the big side); at 100 TB the GK-sketch
    percentile (agg_approx_percentile) drops in for the exact one.
    Both engines interpolate percentile((1-g)·a + g·b) on identical
    doubles; dround(4) pins the hash."""
    c = load_table(spark, sf_dir, "customer")
    q = c.agg(
        F.expr("percentile(c_acctbal, 0.05)").alias("p05"),
        F.expr("percentile(c_acctbal, 0.95)").alias("p95"),
    ).withColumn("__k", F.lit(1))
    return (
        c.withColumn("__k", F.lit(1))
        .join(F.broadcast(q), "__k")
        .select(
            "c_custkey",
            dround(
                F.least(F.greatest(F.col("c_acctbal"), F.col("p05")), F.col("p95")),
                4,
            ).alias("acctbal_winsorized"),
            ((F.col("c_acctbal") < F.col("p05")) | (F.col("c_acctbal") > F.col("p95")))
            .alias("was_clipped"),
        )
    )


# ==========================================================================
# Round-5 feature-engineering batch: hashing trick, target encoding,
# robust scaling.
# ==========================================================================


@query(
    "feature_hash_bucket",
    oracle="""
    WITH toks AS (
      SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
               AS tok
      FROM documents
    ),
    hashed AS (
      SELECT tok,
             CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT) % 256 AS bucket
      FROM toks
    )
    SELECT bucket,
           count(*) AS n_tokens,
           count(DISTINCT tok) AS n_distinct_tokens
    FROM hashed GROUP BY bucket
    """,
)
def feature_hash_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick — unbounded token vocabulary → fixed 256-dim
    feature space with NO vocabulary table: bucket = md5(token) mod
    256, the portable hash family (dedup_minhash_portable's 60-bit
    md5 prefix, reproducible by any engine) so the bucket assignment
    itself is cross-engine value-checked. This is the
    vocabulary-free alternative to feature_onehot_topk: no fit pass,
    no broadcast dict, new tokens land deterministically — the only
    featurizer whose cost model is flat at 100 TB (pure map +
    one 256-group partial agg). Collision load per bucket is what the
    per-bucket distinct count audits."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
        ).alias("tok")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("bigint") % 256
    )
    return toks.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("tok").alias("n_distinct_tokens"),
    )


@query(
    "feature_target_encode",
    oracle="""
    WITH t AS (
      SELECT c_mktsegment,
             CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END AS y
      FROM customer
    ),
    g AS (SELECT CAST(sum(y) AS DOUBLE) / count(*) AS gmean FROM t),
    enc AS (
      SELECT c_mktsegment, count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pos FROM t
      GROUP BY c_mktsegment
    )
    SELECT c_mktsegment, n, n_pos,
           floor((n_pos + 10.0 * gmean) / (n + 10.0) * 1000000 + 0.5) / 1000000
             AS encoded
    FROM enc, g
    """,
)
def feature_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target (mean) encoding of a categorical: category →
    (Σy + m·ȳ_global)/(n + m), m=10 — the high-cardinality-safe
    replacement for one-hot when a category has few rows (it shrinks
    toward the global rate instead of memorizing noise). All counts
    exact integers; the global mean is one 1-row broadcast; the final
    expression is the same IEEE arithmetic on both engines. One
    partial-agg groupBy over category cardinality — the fit pass of a
    production encoder, scan-bound at any scale. (Leakage control —
    out-of-fold encoding — composes with train_test_split's key-mod
    folds; the arithmetic is identical per fold.)"""
    c = load_table(spark, sf_dir, "customer")
    t = c.select(
        "c_mktsegment",
        F.when(F.col("c_acctbal") > 0, 1).otherwise(0).alias("y"),
    )
    g = t.agg(
        (F.sum("y").cast("double") / F.count(F.lit(1))).alias("gmean")
    ).withColumn("__k", F.lit(1))
    enc = t.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("n_pos")
    )
    return (
        enc.withColumn("__k", F.lit(1))
        .join(F.broadcast(g), "__k")
        .select(
            "c_mktsegment",
            "n",
            "n_pos",
            dround(
                (F.col("n_pos") + 10.0 * F.col("gmean")) / (F.col("n") + 10.0), 6
            ).alias("encoded"),
        )
    )


@query(
    "feature_robust_scale",
    oracle="""
    WITH s AS (
      SELECT quantile_cont(c_acctbal, 0.5) AS med,
             quantile_cont(c_acctbal, 0.75) - quantile_cont(c_acctbal, 0.25)
               AS iqr
      FROM customer
    )
    SELECT c_custkey,
           floor((c_acctbal - med) / iqr * 1000000 + 0.5) / 1000000
             AS acctbal_robust
    FROM customer, s
    """,
)
def feature_robust_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust scaling (x − median)/IQR — the outlier-immune companion
    of feature_minmax_scale (one heavy-tailed row saturates min-max;
    median/IQR shrug it off). Exact interpolated percentiles (Spark
    percentile ≡ DuckDB quantile_cont) in a 1-row stats frame
    broadcast back over the table: map-side scaling, zero shuffle of
    the big side. At 100 TB the stats pass swaps to approx_percentile
    (the GK path feature_quantile_bin_approx already demonstrates);
    the scaling contract is unchanged."""
    c = load_table(spark, sf_dir, "customer")
    s = c.agg(
        F.expr("percentile(c_acctbal, 0.5D)").alias("med"),
        (
            F.expr("percentile(c_acctbal, 0.75D)")
            - F.expr("percentile(c_acctbal, 0.25D)")
        ).alias("iqr"),
    ).withColumn("__k", F.lit(1))
    return (
        c.withColumn("__k", F.lit(1))
        .join(F.broadcast(s), "__k")
        .select(
            "c_custkey",
            dround((F.col("c_acctbal") - F.col("med")) / F.col("iqr"), 6).alias(
                "acctbal_robust"
            ),
        )
    )


@query(
    "feature_crossfit_target_encode",
    oracle="""
    WITH base AS (
      SELECT c.c_mktsegment AS seg,
             o.o_orderkey % 5 AS fold,
             CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    cf AS (
      SELECT seg, fold,
             CAST(count(*) AS BIGINT) AS n_cf,
             CAST(sum(cents) AS BIGINT) AS s_cf
      FROM base GROUP BY seg, fold
    ),
    c AS (
      SELECT seg,
             CAST(sum(n_cf) AS BIGINT) AS n_c,
             CAST(sum(s_cf) AS BIGINT) AS s_c
      FROM cf GROUP BY seg
    )
    SELECT cf.seg, CAST(cf.fold AS BIGINT) AS fold, cf.n_cf AS n_infold,
           CASE WHEN c.n_c - cf.n_cf = 0 THEN NULL
                ELSE floor(CAST(c.s_c - cf.s_cf AS DOUBLE)
                           / (c.n_c - cf.n_cf) / 100.0 * 1000000 + 0.5)
                     / 1000000
           END AS oof_mean
    FROM cf JOIN c ON c.seg = cf.seg
    """,
)
def feature_crossfit_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-fold (cross-fit) out-of-fold target encoding — the
    leakage-FREE variant of feature_target_encode: a row's encoding
    for its category is the target mean computed from the OTHER four
    folds only, so the feature never contains the row's own label
    (the self-leakage that inflates tree-model validation scores).
    Spelled as the per-(category, fold) closed form
    (S_c − S_cf)/(n_c − n_cf): two partial-agg shuffles over 25 cells
    — no per-row recomputation, no window — then every training row
    picks up its encoding by a broadcast join on (category, fold).
    Integer-cents sums, one final division with a 6 dp pin;
    deterministic folds from the key (o_orderkey % 5), which is how a
    re-run reproduces the exact same split at any scale."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    base = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        (F.col("o_orderkey") % 5).alias("fold"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    cf = base.groupBy("seg", "fold").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cf"),
        F.sum("cents").cast("bigint").alias("s_cf"),
    )
    tot = cf.groupBy("seg").agg(
        F.sum("n_cf").cast("bigint").alias("n_c"),
        F.sum("s_cf").cast("bigint").alias("s_c"),
    )
    j = cf.join(tot, "seg")
    oof = F.when(F.col("n_c") - F.col("n_cf") == 0, F.lit(None)).otherwise(
        dround(
            (F.col("s_c") - F.col("s_cf")).cast("double")
            / (F.col("n_c") - F.col("n_cf"))
            / 100.0,
            6,
        )
    )
    return j.select(
        "seg",
        F.col("fold").cast("bigint").alias("fold"),
        F.col("n_cf").alias("n_infold"),
        oof.alias("oof_mean"),
    )


# --------------------------------------------------------------------------
# Weight-of-evidence / information value (credit-scoring feature audit)
# --------------------------------------------------------------------------
@query(
    "feature_woe_information_value",
    oracle="""
    WITH b AS (
      SELECT CAST((CAST(l_quantity AS INT) - 1) // 10 AS INT) AS bin,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      FROM lineitem
    ),
    agg AS (
      SELECT bin, count(*) AS n,
             CAST(sum(y) AS BIGINT) AS n_pos,
             CAST(count(*) - sum(y) AS BIGINT) AS n_neg
      FROM b GROUP BY bin
    ),
    tot AS (SELECT sum(n_pos) AS tp, sum(n_neg) AS tn FROM agg),
    woe AS (
      SELECT bin, n, n_pos, n_neg,
             ln(((n_pos + 0.5) * 1.0 / tp) / ((n_neg + 0.5) * 1.0 / tn)) AS w,
             (n_pos * 1.0 / tp - n_neg * 1.0 / tn)
               * ln(((n_pos + 0.5) * 1.0 / tp) / ((n_neg + 0.5) * 1.0 / tn))
               AS contrib
      FROM agg CROSS JOIN tot
    )
    SELECT bin, n, n_pos, n_neg,
           floor(w * 1000000 + 0.5) / 1000000 AS woe,
           floor(sum(contrib) OVER () * 1000000 + 0.5) / 1000000 AS iv_total
    FROM woe
    """,
)
def feature_woe_information_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence binning + information value — the
    credit-scoring feature audit (how predictive is quantity of a
    return?): WOE_bin = ln((pos_bin/pos_tot)/(neg_bin/neg_tot)), IV =
    Σ (pos% − neg%)·WOE. Complements `feature_target_encode` (which
    produces a per-category MEAN for the model) by producing the
    log-odds SCALE plus the single scalar that ranks features for
    selection. One partial-agg pass builds the bin table; totals
    attach as a 1-row broadcast; all inputs exact integer counts so
    ln() sees identical rationals cross-engine (6 dp band). At 100 TB:
    state is |bins|, cost is the scan — the same shape as every
    histogram audit here."""
    li = load_table(spark, sf_dir, "lineitem").select(
        ((F.col("l_quantity").cast("int") - 1) / 10)
        .cast("int")
        .alias("bin"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    agg = li.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").cast("bigint").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("y")).cast("bigint").alias("n_neg"),
    )
    w = Window.partitionBy()
    tp, tn = F.sum("n_pos").over(w), F.sum("n_neg").over(w)
    # +0.5 adjustment (the standard WOE zero-cell guard, binary-exact):
    # an all-positive or all-negative bin would otherwise be ln(0)/ln(∞)
    # — and DuckDB's ln(0) RAISES where Spark returns NULL
    woe = F.log(
        ((F.col("n_pos") + 0.5) * 1.0 / tp) / ((F.col("n_neg") + 0.5) * 1.0 / tn)
    )
    contrib = (F.col("n_pos") * 1.0 / tp - F.col("n_neg") * 1.0 / tn) * woe
    return agg.select(
        "bin", "n", "n_pos", "n_neg",
        dround(woe, 6).alias("woe"),
        dround(F.sum(contrib).over(w), 6).alias("iv_total"),
    )
