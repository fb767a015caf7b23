"""Deduplication operators for LLM-pretraining-scale corpora.

Four families, all shuffle-bounded and driver-free:

- exact:        hash-groupBy on the normalized content key.
- minhash_lsh:  shingle → k minhash signatures → band-bucket join.
                Candidate pairs only form inside a band bucket, so the
                join is equi-key (shuffle on bucket), never quadratic.
- simhash:      64-bit simhash; near-dup candidates share a rotated
                prefix band (Hamming-adjacent docs collide).
- ngram_jaccard: exact Jaccard over k-word shingle sets, restricted to
                pairs sharing ≥1 shingle (equi-join on shingle).

At 100 TB: every stage is groupBy/join on a key Spark can hash-
partition; minhash bands and simhash prefixes bound candidate-pair
fan-out; nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import exploded_shingles, tokens_col
from ..functions.rounding import dround


def _materialize(df: DataFrame) -> DataFrame:
    """Materialize a subplan that is referenced by several downstream
    branches. Spark re-executes a DataFrame's lineage once per
    reference (no automatic diamond reuse across different shuffle
    keys), so an expensive shingle/signature stage would run 2–3×.
    localCheckpoint executes it once; blocks are freed by the
    ContextCleaner when the frame goes out of scope (unlike SQL cache,
    which leaks until explicit unpersist). On a multi-node cluster this
    would be `persist(DISK_ONLY)` or HDFS `checkpoint`."""
    return df.localCheckpoint()


def _spread(df: DataFrame) -> DataFrame:
    """Repartition to the session's default parallelism before an
    explode-heavy stage — but ONLY when the input is under-partitioned
    (single-file local fixtures arrive as ONE partition; without this,
    shingling/hashing serializes on one task). A production read
    already carries ≥ defaultParallelism partitions and must NOT pay a
    gratuitous full round-robin shuffle of the corpus."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def dedup_exact(df: DataFrame, key_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: one surviving id per distinct key + duplicate count.

    groupBy(key) with min(id) — partial aggregation makes the shuffle
    carry one row per distinct key per task.
    """
    return (
        df.groupBy(key_col)
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_dups"),
        )
        .select(id_col, "n_dups")
    )


def _minhash_expr(family: str, i: int, shingle: Column) -> Column:
    """One minhash value: hash_i(shingle) under the chosen family.

    - ``xxhash64`` (default): Spark-internal seeded xxhash — fastest
      (one JVM intrinsic per value); the production path.
    - ``md5_portable``: 60-bit prefix of md5(f"{i}:{shingle}") — ~2-3×
      more expensive per value but reproducible by ANY engine with an
      md5() (DuckDB, Trino, Postgres...), which upgrades minhash from
      behaviorally-tested to full cross-engine value-hash attestation
      (see plans/dedup.py::dedup_minhash_portable).
    """
    if family == "xxhash64":
        return F.xxhash64(F.lit(i), shingle)
    if family == "md5_portable":
        return F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{i}:"), shingle)), 1, 15), 16, 10
        ).cast("bigint")
    raise ValueError(f"unknown minhash family {family!r}")


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    shingle_k: int = 3,
) -> DataFrame:
    """(id, sig: array<long>) — k independent minhash values per doc.

    Hash family: xxhash64(seed=i) over the shingle string; the min over
    a doc's shingle set approximates a random permutation's first
    element. ONE explode + ONE aggregation computing all k mins as
    parallel agg columns — the shuffle carries k longs per doc.
    """
    # lead()-window shingles (codegen'd); the window's id_col shuffle is
    # the same partitioning the groupBy below needs — no extra exchange
    shingles = exploded_shingles(df, id_col, text_col, shingle_k, "shingle")
    mins = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    sig = shingles.groupBy(id_col).agg(*mins)
    return sig.select(
        id_col, F.array(*[F.col(f"mh_{i}") for i in range(num_hashes)]).alias("sig")
    )


def dedup_minhash_lsh(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.5,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """MinHash+LSH near-dup pairs: (id_a, id_b, est_jaccard).

    num_hashes signatures split into `bands` bands of r values; docs
    agreeing on all r values of any band become candidates (equi-join
    on (band, band-hash) — the classic S-curve). Candidates are then
    scored by full-signature agreement (estimated Jaccard) and
    thresholded. Band hashes come straight off the wide signature (one
    xxhash64 over r columns — no re-aggregation), and scoring joins
    the packed signature array once per side.
    """
    r = num_hashes // bands
    shingles = exploded_shingles(df, id_col, text_col, shingle_k, "shingle")
    mins = [
        F.min(_minhash_expr(hash_family, i, F.col("shingle"))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    sig_wide = shingles.groupBy(id_col).agg(*mins)
    # sig feeds three branches (band explode + two signature join-backs)
    sig_wide = _materialize(sig_wide)

    def band_hash(b: int) -> Column:
        cols = [F.col(f"mh_{b * r + j}") for j in range(r)]
        if hash_family == "md5_portable":
            # engine-portable band key: md5 over the comma-joined
            # signature slice (bigints stringify identically everywhere)
            return F.md5(F.concat_ws(",", *[c.cast("string") for c in cols]))
        return F.xxhash64(*cols).cast("string")

    sig = sig_wide.select(
        id_col,
        F.array(*[F.col(f"mh_{i}") for i in range(num_hashes)]).alias("sig"),
        F.array(
            *[
                F.struct(F.lit(b).alias("band"), band_hash(b).alias("band_hash"))
                for b in range(bands)
            ]
        ).alias("bandkeys"),
    )

    # Band join on (band, band_hash) ONLY — the 8-way banded explode and
    # its shuffle carry 3 longs per row, not the k-long signature. The
    # signatures join back once per side AFTER candidate-pair dedup, so
    # each doc's signature crosses the wire once, not once per band
    # collision. At corpus scale this is the difference between an
    # O(collisions·k) and an O(docs·k + pairs·k) shuffle volume.
    banded = sig.select(id_col, F.explode("bandkeys").alias("bk")).select(
        id_col, F.col("bk.band").alias("band"), F.col("bk.band_hash").alias("band_hash")
    )
    a = banded.select(F.col(id_col).alias("id_a"), "band", "band_hash")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "band_hash")
    cand = (
        a.join(b, ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sigs = sig.select(id_col, "sig")
    cand = (
        cand.join(sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a")), "id_a")
        .join(sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b")), "id_b")
    )
    agree = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m)
    )
    scored = cand.select(
        "id_a", "id_b", (agree / F.lit(num_hashes)).alias("est_jaccard")
    )
    return scored.filter(F.col("est_jaccard") >= jaccard_threshold).select(
        "id_a", "id_b", dround(F.col("est_jaccard"), 4).alias("est_jaccard")
    )


def simhash_fingerprint(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
) -> DataFrame:
    """64-bit SimHash per doc: sign of the per-bit sum of token hashes.

    Implemented as explode(tokens) → per-bit ±1 contributions →
    groupBy(id) sum → bit reassembly. One shuffle (the groupBy).
    """
    toks = _spread(df).select(F.col(id_col), F.explode(tokens_col(text_col)).alias("token"))
    h = F.xxhash64("token")
    # A token with bit i set contributes +1, else -1; the per-bit signed
    # sum equals 2*ones_i - n, so sign(sum) == (2*ones_i > n). Summing the
    # raw bit (plus one shared count) is much cheaper codegen than 64
    # conditional ±1 sums.
    bit_sums = [
        F.sum(F.shiftright(h, i).bitwiseAND(F.lit(1))).alias(f"b{i}") for i in range(bits)
    ]
    sums = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_tok"), *bit_sums)
    fp = None
    for i in range(bits):
        bit = (
            F.when(F.col(f"b{i}") * 2 > F.col("n_tok"), F.lit(1).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
        term = F.shiftleft(bit, i)
        fp = term if fp is None else fp.bitwiseXOR(term)
    return sums.select(id_col, fp.alias("simhash"))


def dedup_simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    band_bits: int = 16,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs: candidates share one of 4 16-bit bands
    (any pair within Hamming distance 3 of 64 bits must agree on ≥1
    band by pigeonhole); verified by exact Hamming distance."""
    # fp feeds both sides of the band self-join — materialize so the
    # 64-bit-sum aggregation runs once
    fp = _materialize(simhash_fingerprint(df, id_col, text_col))
    bands = 64 // band_bits
    mask = (1 << band_bits) - 1
    banded = fp.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("simhash", i * band_bits).bitwiseAND(F.lit(mask)).alias(
                            "band_val"
                        ),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "simhash", F.col("bk.band").alias("band"), F.col("bk.band_val").alias("band_val"))
    a = banded.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("fp_a"), "band", "band_val")
    b = banded.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("fp_b"), "band", "band_val")
    cand = (
        a.join(b, ["band", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "fp_a", "fp_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        cand.select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def dedup_ngram_jaccard(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.2,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact Jaccard over k-word shingle sets for pairs sharing ≥1
    shingle. |A∩B| from the shingle equi-join; |A∪B| = |A|+|B|−|A∩B|.

    The shingle join is the only large shuffle. ``max_shingle_df`` is
    the corpus-scale knob: shingles appearing in more than that many
    docs (boilerplate — headers, license blurbs) are dropped BEFORE the
    self-join, since one shingle shared by f docs alone generates
    O(f²) candidate pairs. Doc shingle-set sizes are computed AFTER
    the cap, so the reported Jaccard stays internally consistent (it
    is the Jaccard of the capped sets). None = exact semantics.
    """
    counts = _shingle_pair_counts(df, id_col, text_col, shingle_k, max_shingle_df)
    jac = counts.select(
        "id_a",
        "id_b",
        (F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))).alias("jaccard"),
    )
    return jac.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", dround(F.col("jaccard"), 4).alias("jaccard")
    )


def dedup_containment(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Asymmetric near-dup via shingle CONTAINMENT: |A∩B| / min(|A|,|B|).

    Jaccard under-scores subset duplication — a short doc fully quoted
    inside a long one has |A∩B|/|A∪B| ≈ |A|/|B| (small) but containment
    1.0. Containment is the right metric for boilerplate extraction,
    quote/excerpt detection, and "doc B is doc A plus a header" dedup
    in pretraining corpora. Same single-shuffle shingle equi-join and
    df-cap machinery as :func:`dedup_ngram_jaccard`.
    """
    counts = _shingle_pair_counts(df, id_col, text_col, shingle_k, max_shingle_df)
    cont = counts.select(
        "id_a",
        "id_b",
        (F.col("n_inter") / F.least(F.col("n_a"), F.col("n_b"))).alias("containment"),
    )
    return cont.filter(F.col("containment") >= threshold).select(
        "id_a", "id_b", dround(F.col("containment"), 4).alias("containment")
    )


def _shingle_pair_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int,
    max_shingle_df: int | None,
) -> DataFrame:
    """(id_a, id_b, n_inter, n_a, n_b) for doc pairs sharing ≥1 shingle —
    the shared core of the exact set-overlap metrics (Jaccard,
    containment). One shingle-hash shuffle + two size joins."""
    sh = exploded_shingles(df, id_col, text_col, shingle_k, "sh").distinct()
    if max_shingle_df is not None:
        hot = (
            sh.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("sh")
        )
        # the hot set is tiny by construction (only above-cap shingles);
        # AQE turns this anti-join into a broadcast at runtime
        sh = sh.join(hot, "sh", "left_anti")
    sh = _materialize(sh)  # referenced by sizes + both join sides
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "sh")
    b = sh.select(F.col(id_col).alias("id_b"), "sh")
    inter = (
        a.join(b, "sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return inter.join(sa, "id_a").join(sb, "id_b")
