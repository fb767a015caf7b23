#!/usr/bin/env python
"""Round-14 optimization profiler: time registered keys in isolation
(bench.py methodology — noop sink, settle between runs, warmup outside
timed sections) and optionally dump `.explain("formatted")`.

Usage:
    python tools/opt_profile.py KEY [KEY ...]        # 3 timed runs each
    SPARK_GRAFT_OPT_RUNS=5 python tools/opt_profile.py KEY
    SPARK_GRAFT_OPT_EXPLAIN=plans/r14 python tools/opt_profile.py KEY
        # also writes plans/r14/<key>_<tag>.txt ; tag from
        # $SPARK_GRAFT_OPT_TAG (default "before")

Prints one JSON line per key: {"key":..., "runs":[...], "median":...}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reports_generator_spark.plans import registry  # noqa: E402
from reports_generator_spark.session import get_spark, tune  # noqa: E402

registry.load_all()


def main() -> None:
    keys = [k for k in sys.argv[1:] if not k.startswith("-")]
    if not keys:
        sys.exit("usage: opt_profile.py KEY [KEY ...]")
    unknown = [k for k in keys if k not in registry.QUERIES]
    if unknown:
        sys.exit(f"unknown keys: {unknown}")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_runs = int(os.environ.get("SPARK_GRAFT_OPT_RUNS", "3"))
    explain_dir = os.environ.get("SPARK_GRAFT_OPT_EXPLAIN")
    tag = os.environ.get("SPARK_GRAFT_OPT_TAG", "before")

    spark = get_spark("rg-spark-opt", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup identical to bench.py
    registry.QUERIES["agg_hash_group"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(0, 128).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    jvm = spark.sparkContext._jvm

    def settle() -> None:
        jvm.System.gc()
        time.sleep(1.0)
        spark.range(1).count()
        jvm.System.gc()

    def sentinel() -> float:
        """Contention canary (bench.py's q6 sentinel): ~0.3 s quiet,
        1 s+ under host steal — printed per run so a noisy median is
        self-evident."""
        t0 = time.perf_counter()
        registry.QUERIES["q6_forecast_revenue"](spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        tune(spark)
        return round(time.perf_counter() - t0, 3)

    for name in keys:
        fn = registry.QUERIES[name]
        runs: list[float] = []
        sentinels: list[float] = []
        for i in range(n_runs):
            settle()
            sentinels.append(sentinel())
            spark.sparkContext.setJobDescription(f"opt:{name}#{i}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            tune(spark)
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(explain_dir, f"{name}_{tag}.txt"), "w") as fh:
                fh.write(txt)
            tune(spark)
        print(
            json.dumps(
                {
                    "key": name,
                    "runs": runs,
                    "median": round(statistics.median(runs), 3),
                    "sentinel": sentinels,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
