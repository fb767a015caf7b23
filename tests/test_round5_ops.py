"""Behavioral tests for the round-5 operators — planted-case
properties the DuckDB parity harness can't express: a checksum that
actually detects a mutation, interpolation hitting the exact midpoint,
ER blocking never crossing blocks, Gini's closed-form extremes,
sink-mode idempotency, Bollinger degeneracy on a constant series."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from reports_generator_spark.plans import registry

from conftest import SF_DIR

registry.load_all()


def _mini_sf(spark, tmp, **tables):
    """Write small DataFrames as <tmp>/<name>.parquet and return tmp —
    a synthetic sf_dir any registered key can run against."""
    for name, df in tables.items():
        df.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/{name}.parquet")
    return tmp


def test_table_checksum_detects_single_row_mutation(spark):
    """Flipping ONE row's status must change exactly that row's block
    checksum and no other — the divergence-localization contract."""
    base = registry.QUERIES["table_checksum_blocks"](spark, SF_DIR)
    with tempfile.TemporaryDirectory() as tmp:
        o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        mutated = o.withColumn(
            "o_orderstatus",
            F.when(F.col("o_orderkey") == 1, F.lit("X")).otherwise(
                F.col("o_orderstatus")
            ),
        )
        _mini_sf(spark, tmp, orders=mutated)
        mut = registry.QUERIES["table_checksum_blocks"](spark, tmp)
        diff = (
            base.alias("a")
            .join(mut.alias("b"), "block")
            .filter(F.col("a.checksum") != F.col("b.checksum"))
            .select("block")
            .collect()
        )
        assert [r.block for r in diff] == [0]  # orderkey 1 // 10000
        # row counts unchanged everywhere
        nc = (
            base.alias("a")
            .join(mut.alias("b"), "block")
            .filter(F.col("a.n_rows") != F.col("b.n_rows"))
            .count()
        )
        assert nc == 0


def test_interpolation_hits_exact_midpoint(spark):
    """Two purchase observations two hours apart: the missing middle
    hour interpolates to exactly the mean of the endpoints."""
    with tempfile.TemporaryDirectory() as tmp:
        ev = spark.createDataFrame(
            [
                (1, "2024-01-01 00:30:00", 7, "purchase", 10.0, "{}"),
                (2, "2024-01-01 02:30:00", 7, "purchase", 30.0, "{}"),
            ],
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string",
        ).withColumn("ts", F.to_timestamp("ts"))
        _mini_sf(spark, tmp, events=ev)
        rows = {
            r.h: r
            for r in registry.QUERIES["time_interpolate_linear"](spark, tmp).collect()
        }
        assert len(rows) == 3
        hs = sorted(rows)
        assert rows[hs[0]].src == "obs" and rows[hs[0]].value == 10.0
        assert rows[hs[1]].src == "interp" and rows[hs[1]].value == 20.0
        assert rows[hs[2]].src == "obs" and rows[hs[2]].value == 30.0


def test_entity_resolution_never_pairs_across_blocks(spark):
    """Identical names under different brands share no block, so they
    are never even candidates — the blocking contract."""
    with tempfile.TemporaryDirectory() as tmp:
        p = spark.createDataFrame(
            [
                (1, "cold widget", "B1", "PROMO", 10, 1.0),
                (2, "cold widget", "B1", "PROMO", 11, 1.0),   # match (size 1 apart)
                (3, "cold widget", "B2", "PROMO", 10, 1.0),   # other block
                (4, "cold gadget", "B1", "PROMO", 10, 1.0),   # candidate, no match
            ],
            "p_partkey long, p_name string, p_brand string, p_type string,"
            " p_size int, p_retailprice double",
        )
        _mini_sf(spark, tmp, part=p)
        out = registry.QUERIES["entity_resolution_blocked"](spark, tmp).collect()
        by_block = {(r.blk_tok, r.p_brand): r for r in out}
        b1 = by_block[("cold", "B1")]
        # 3 distinct B1 entities -> 3 candidate pairs, 1 true match
        assert b1.n_candidate_pairs == 3 and b1.n_matches == 1
        assert ("cold", "B2") not in by_block  # single entity, no pairs


def test_gini_extremes(spark):
    """Equal spend per customer → Gini 0; one customer holding
    everything → Gini → (n-1)/n."""
    def run(rows):
        with tempfile.TemporaryDirectory() as tmp:
            o = spark.createDataFrame(
                rows,
                "o_orderkey long, o_custkey long, o_orderstatus string,"
                " o_totalprice double, o_orderdate timestamp,"
                " o_orderpriority string",
            )
            _mini_sf(spark, tmp, orders=o)
            return registry.QUERIES["gini_coefficient"](spark, tmp).collect()[0]

    equal = run([(i, i, "O", 100.0, None, "1-URGENT") for i in range(1, 11)])
    assert equal.gini == 0.0
    skewed = run(
        [(1, 1, "O", 10000.0, None, "1-URGENT")]
        + [(i, i, "O", 0.01, None, "1-URGENT") for i in range(2, 11)]
    )
    assert skewed.gini > 0.85  # → 0.9 as the small spends → 0


def test_sink_mode_auto_is_idempotent_across_runs(spark):
    """Running the key twice yields identical results — the fixture
    reset + probe-then-write sequence never double-appends."""
    a = registry.QUERIES["sink_mode_auto"](spark, SF_DIR).collect()
    b = registry.QUERIES["sink_mode_auto"](spark, SF_DIR).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_bollinger_constant_series_has_zero_width(spark):
    """A constant daily count series: sigma = 0, both bands equal the
    mean equal the value."""
    with tempfile.TemporaryDirectory() as tmp:
        rows = [
            (d * 10 + i, 1, "O", 5.0, f"1994-01-{d:02d} 00:00:00", "1-URGENT")
            for d in range(1, 11)
            for i in range(3)  # exactly 3 orders per day
        ]
        o = spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double, o_orderdate string, o_orderpriority string",
        ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
        _mini_sf(spark, tmp, orders=o)
        out = registry.QUERIES["bollinger_bands"](spark, tmp).collect()
        assert len(out) == 10
        for r in out:
            assert r.n == 3 and r.ma7 == 3.0
            assert r.upper_band == 3.0 and r.lower_band == 3.0


def test_feature_hash_bucket_conserves_tokens(spark):
    """Bucketing is a partition of the token stream: bucket counts sum
    to the corpus token count and every bucket id is in [0, 256)."""
    out = registry.QUERIES["feature_hash_bucket"](spark, SF_DIR).collect()
    total = sum(r.n_tokens for r in out)
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    expect = d.select(
        F.size(F.filter(F.split(F.lower("text"), " "), lambda x: x != "")).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert total == expect
    assert all(0 <= r.bucket < 256 for r in out)


def test_weighted_median_hand_case(spark):
    """Hand-checkable: prices 1,2,3 with weights 1,1,8 → half the
    total weight (5) is reached at price 3."""
    with tempfile.TemporaryDirectory() as tmp:
        li = spark.createDataFrame(
            [
                (1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "A", "F", None),
                (1, 2, 1, 2, 1.0, 2.0, 0.0, 0.0, "A", "F", None),
                (1, 3, 1, 3, 8.0, 3.0, 0.0, 0.0, "A", "F", None),
            ],
            "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
            " l_quantity double, l_extendedprice double, l_discount double,"
            " l_tax double, l_returnflag string, l_linestatus string,"
            " l_shipdate timestamp",
        )
        _mini_sf(spark, tmp, lineitem=li)
        r = registry.QUERIES["agg_weighted_median"](spark, tmp).collect()[0]
        assert r.weighted_median_price == 3.0 and r.total_weight == 10


def test_url_canonicalize_collapses_every_pair(spark):
    """Each floor(doc_id/2) pair decorates ONE landing page two ways,
    so canonical URLs == distinct pair ids and every second doc is a
    URL-level dup."""
    out = registry.QUERIES["corpus_url_canonicalize"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    n_pids = docs.select((F.floor(F.col("doc_id") / 2)).alias("p")).distinct().count()
    assert sum(r.n_docs for r in out) == n_docs
    assert sum(r.n_canonical_urls for r in out) == n_pids
    assert sum(r.n_url_dup_docs for r in out) == n_docs - n_pids
    for r in out:
        assert r.domain in {"example.com", "example.org", "example.net"}
        assert r.sample_url.startswith("https://cdn")
        assert "utm" not in r.sample_url and "#" not in r.sample_url
        assert ":443" not in r.sample_url and "www." not in r.sample_url


def test_table_checksum_permutation_invariant(spark):
    """Row order must not change any block checksum (bit_xor is
    commutative): a fully shuffled rewrite of orders produces
    identical (block, checksum, n_rows) triples."""
    base = {
        (r.block): (r.checksum, r.n_rows)
        for r in registry.QUERIES["table_checksum_blocks"](spark, SF_DIR).collect()
    }
    with tempfile.TemporaryDirectory() as tmp:
        o = (
            spark.read.parquet(f"{SF_DIR}/orders.parquet")
            .orderBy(F.rand(seed=7))
            .repartition(13)
        )
        _mini_sf(spark, tmp, orders=o)
        shuf = {
            (r.block): (r.checksum, r.n_rows)
            for r in registry.QUERIES["table_checksum_blocks"](spark, tmp).collect()
        }
    assert shuf == base


def test_gini_scale_invariant(spark):
    """Gini is scale-free: multiplying every order's price by 3 leaves
    the coefficient unchanged (exact-cents pipeline permitting)."""
    base = registry.QUERIES["gini_coefficient"](spark, SF_DIR).collect()[0]
    with tempfile.TemporaryDirectory() as tmp:
        o = spark.read.parquet(f"{SF_DIR}/orders.parquet").withColumn(
            "o_totalprice", F.col("o_totalprice") * 3
        )
        _mini_sf(spark, tmp, orders=o)
        scaled = registry.QUERIES["gini_coefficient"](spark, tmp).collect()[0]
    assert abs(scaled.gini - base.gini) < 1e-9
    assert scaled.n_customers == base.n_customers


def test_weighted_median_matches_numpy(spark):
    """Cumulative-weight median against an independent numpy
    recomputation on the real sf fixture, per return flag."""
    import numpy as np

    rows = registry.QUERIES["agg_weighted_median"](spark, SF_DIR).collect()
    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select(
            "l_returnflag",
            F.col("l_extendedprice").cast("double").alias("p"),
            F.col("l_quantity").cast("long").alias("w"),
        )
        .collect()
    )
    by_flag = {}
    for r in li:
        by_flag.setdefault(r.l_returnflag, []).append((r.p, r.w))
    for out in rows:
        vals = sorted(by_flag[out.l_returnflag])
        p = np.array([v for v, _ in vals])
        w = np.array([x for _, x in vals], dtype=np.int64)
        cw = np.cumsum(w)
        total = int(cw[-1])
        idx = int(np.argmax(2 * cw >= total))
        assert out.weighted_median_price == p[idx]
        assert out.total_weight == total


def test_attribution_credit_conservation(spark):
    """Credit mass is conserved under every model: first-touch,
    last-touch, and linear credits each sum (over channels) to the
    number of conversions that have at least one touch."""
    out = registry.QUERIES["attribution_multi_touch"](spark, SF_DIR).collect()
    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    conv = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("conv_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("cts"),
    )
    touch = e.filter(F.col("event_type").isin("click", "view")).select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("tts")
    )
    lookback = 7 * 86400 * 1_000_000
    n_touched = (
        conv.join(touch, "user_id")
        .filter(
            (F.col("tts") < F.col("cts"))
            & (F.col("tts") >= F.col("cts") - F.lit(lookback))
        )
        .select("conv_id")
        .distinct()
        .count()
    )
    assert sum(r.first_touch_credit for r in out) == n_touched
    assert sum(r.last_touch_credit for r in out) == n_touched
    assert abs(sum(r.linear_credit for r in out) - n_touched) < 1e-3


def test_weighted_priority_favors_heavy_rows(spark):
    """Sequential Poisson: the sampled 50 must have a mean weight well
    above the population mean (probability proportional to size), and
    priorities must be unique-sorted deterministic."""
    rows = registry.QUERIES["sample_weighted_priority"](spark, SF_DIR).collect()
    assert len(rows) == 50
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    pop_mean = o.agg(F.avg("o_totalprice")).collect()[0][0]
    samp_mean = sum(r.w_cents for r in rows) / 100.0 / len(rows)
    assert samp_mean > pop_mean  # PPS pulls the sample upward
    again = registry.QUERIES["sample_weighted_priority"](spark, SF_DIR).collect()
    assert [r.o_orderkey for r in again] == [r.o_orderkey for r in rows]


def test_cusum_flags_planted_level_shift(spark):
    """10 days at 3 orders/day then 10 days at 9/day: |CUSUM| peaks at
    the last low-level day — the classic changepoint estimate."""
    with tempfile.TemporaryDirectory() as tmp:
        rows = []
        oid = 0
        for d in range(1, 21):
            for _ in range(3 if d <= 10 else 9):
                oid += 1
                rows.append((oid, oid, "O", 10.0, f"1994-01-{d:02d} 00:00:00", "1-URGENT"))
        o = spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double, o_orderdate string, o_orderpriority string",
        ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
        _mini_sf(spark, tmp, orders=o)
        out = registry.QUERIES["anomaly_cusum_changepoint"](spark, tmp).collect()
        flagged = [r.d for r in out if r.is_changepoint]
        assert flagged == ["1994-01-10"]


def test_psi_zero_when_distributions_match(spark):
    """Train and serve periods drawn identically (same totals per
    bin): every psi_term is ~0 and the PSI sum is far below the 0.2
    retrain trigger."""
    with tempfile.TemporaryDirectory() as tmp:
        rows = []
        oid = 0
        # identical price ladder in both periods
        for year in ("1994", "1997"):   # before/after the 1996 split
            for price in (10_000, 130_000, 250_000, 370_000, 590_000):
                for _ in range(20):
                    oid += 1
                    rows.append(
                        (oid, oid, "O", float(price), f"{year}-06-01 00:00:00", "1-URGENT")
                    )
        o = spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double, o_orderdate string, o_orderpriority string",
        ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
        _mini_sf(spark, tmp, orders=o)
        out = registry.QUERIES["drift_psi"](spark, tmp).collect()
        assert sum(abs(r.psi_term) for r in out) < 1e-6
        for r in out:
            assert r.n_a == r.n_b


def test_transition_matrix_rows_are_distributions(spark):
    """Per source event type, transition probabilities sum to ~1 and
    counts equal the (user, consecutive-pair) ground truth total."""
    out = registry.QUERIES["event_transition_matrix"](spark, SF_DIR).collect()
    by_from = {}
    for r in out:
        by_from.setdefault(r.from_event, []).append(r)
    for rows in by_from.values():
        assert abs(sum(r.prob for r in rows) - 1.0) < 1e-4
    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_users = e.select("user_id").distinct().count()
    assert sum(r.n for r in out) == e.count() - n_users  # pairs = rows - users


def test_splice_overlap_finds_planted_split(spark):
    """A document split into two halves with a k-token overlap is
    recovered as exactly the (first-half, second-half) pair."""
    with tempfile.TemporaryDirectory() as tmp:
        words = [f"w{i}" for i in range(40)]
        a = " ".join(words[:22])          # ...ends with w17..w21
        b = " ".join(words[17:])          # starts with w17..w21
        other = "zz " * 30
        d = spark.createDataFrame(
            [(1, a, "en", "s", len(a)), (2, b, "en", "s", len(b)),
             (3, other.strip(), "en", "s", 60)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        d.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
        out = registry.QUERIES["dedup_splice_overlap"](spark, tmp).collect()
        assert [(r.id_a, r.id_b) for r in out] == [(1, 2)]
        assert out[0].boundary == " ".join(words[17:22])
