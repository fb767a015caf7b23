#!/usr/bin/env python
"""Candidate-growth probe for the sign-LSH family (VERDICT r12 items
1 & 6): per SF dir, report the auto-scaled parameters, the bucket-size
distribution, the scored candidate volume (sum over chunk pairs of
|a|x|b| - exactly what the matmul kernels compute), and the wall time
of the bare operator materialization.

Usage:
    python tools/probe_lsh_candidates.py .scratch/sf1 .scratch/sf10

One JVM per SF dir (the bench-hygiene rule); run isolated.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def probe_dir(sf_dir: str, cpus: str) -> dict:
    from reports_generator_spark.operators.similarity import (
        LSH_CHUNK_CAP,
        _lsh_chunk_pairs,
        _pack_lsh_chunks,
        embedding_neardup_lsh,
        knn_graph_lsh,
        lsh_auto_params,
        signlsh_codes_udf,
    )
    from reports_generator_spark.session import get_spark
    from reports_generator_spark.sources import load_table

    spark = get_spark("rg-spark-lsh-probe", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    out: dict = {"sf_dir": sf_dir, "n_rows": n}

    import math

    for fam, base_p, base_l, p_ref, cos_ref, cos_thr in (
        # cos_ref: the recall-reference cosine the auto-params preserve;
        # cos_thr: the family's decision-threshold cosine, where recall
        # DEGRADES as P scales (ADVICE r13) — report both so the
        # degradation is measured, not implied
        ("knn", 4, 12, 2.0 / 3.0, 0.5, 0.5),
        ("neardup", 5, 6, 0.795, 0.8, 0.38),
    ):
        P, L = lsh_auto_params(n, base_p, base_l, p_ref=p_ref)

        def _recall(cos: float, planes: int, tables: int) -> float:
            p = 1.0 - math.acos(max(-1.0, min(1.0, cos))) / math.pi
            return 1.0 - (1.0 - p**planes) ** tables
        base = emb.select(
            F.col("vec_id").cast("long").alias("vid"),
            F.col("embedding").cast("array<double>").alias("v"),
        )
        codes = signlsh_codes_udf(P, L, 64, 7)
        hashed = base.select(
            "vid", "v", F.posexplode(codes(F.col("v"))).alias("tbl", "bucket")
        )
        packed = _pack_lsh_chunks(hashed, LSH_CHUNK_CAP).select(
            "tbl", "bucket", "chk", F.size("vids").alias("m")
        ).localCheckpoint()
        stats = packed.groupBy().agg(
            F.max("m").alias("max_chunk"),
            F.count(F.lit(1)).alias("n_chunks"),
        ).collect()[0]
        bstats = (
            packed.groupBy("tbl", "bucket")
            .agg(F.sum("m").alias("bm"))
            .agg(
                F.max("bm").alias("max_bucket"),
                F.avg("bm").alias("avg_bucket"),
                F.count(F.lit(1)).alias("n_buckets"),
            )
            .collect()[0]
        )
        pa = packed.select(
            "tbl", "bucket", F.col("chk").alias("chk_a"), F.col("m").alias("ma")
        )
        pb = packed.select(
            "tbl", "bucket", F.col("chk").alias("chk_b"), F.col("m").alias("mb")
        )
        cand = (
            pa.join(pb, ["tbl", "bucket"])
            .filter(F.col("chk_a") <= F.col("chk_b"))
            .agg(F.sum(F.col("ma") * F.col("mb")))
            .collect()[0][0]
        )
        out[fam] = {
            "planes": P,
            "tables": L,
            "n_buckets": bstats.n_buckets,
            "avg_bucket": round(float(bstats.avg_bucket), 1),
            "max_bucket": bstats.max_bucket,
            "max_chunk_row": stats.max_chunk,
            "scored_candidates": int(cand),
            "recall_ref_cosine": round(_recall(cos_ref, P, L), 4),
            "recall_ref_base_params": round(_recall(cos_ref, base_p, base_l), 4),
            "recall_threshold_cosine": round(_recall(cos_thr, P, L), 4),
            "recall_threshold_base_params": round(
                _recall(cos_thr, base_p, base_l), 4
            ),
        }

    t0 = time.perf_counter()
    knn_graph_lsh(emb, k=3).write.format("noop").mode("overwrite").save()
    out["knn"]["operator_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    embedding_neardup_lsh(emb, threshold=0.38).write.format("noop").mode(
        "overwrite"
    ).save()
    out["neardup"]["operator_s"] = round(time.perf_counter() - t0, 2)
    spark.stop()
    return out


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    results = [probe_dir(d, cpus) for d in sys.argv[1:]]
    print(json.dumps(results, indent=1))
    os.makedirs(".scratch", exist_ok=True)
    with open(".scratch/probe_lsh_candidates.json", "w") as fh:
        json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
