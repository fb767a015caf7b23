#!/usr/bin/env python
"""Scale probe: time a subset of registered keys at two SF dirs and
print per-key ratios. Usage:

    python tools/probe_scale.py [key ...]            # default: this
                                                     # round's keys
    SPARK_GRAFT_PROBE_BASE=/root/testdata/sf0.1 \
    SPARK_GRAFT_PROBE_BIG=.scratch/sf1 python tools/probe_scale.py ...

Same hygiene as bench.py (noop sink forces full plan execution,
settle() between keys, warmup outside timed sections); one JVM per SF
so the big run never inherits the small run's JVM debt.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reports_generator_spark.plans import registry  # noqa: E402
from reports_generator_spark.session import get_spark  # noqa: E402

registry.load_all()


def _run(keys: list[str], sf_dir: str, cpus: str) -> dict[str, float]:
    spark = get_spark("rg-spark-probe", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup: codegen + Arrow pool, outside every timed section
    registry.QUERIES["agg_hash_group"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(0, 128).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    jvm = spark.sparkContext._jvm
    out: dict[str, float] = {}
    for name in keys:
        jvm.System.gc()
        time.sleep(0.5)
        spark.range(1).count()
        t0 = time.perf_counter()
        try:
            registry.QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            out[name] = round(time.perf_counter() - t0, 2)
        except Exception as exc:
            out[name] = -1.0
            print(f"PROBE-ERROR {name} @ {sf_dir}: {exc}", file=sys.stderr)
    spark.stop()
    return out


def main() -> None:
    keys = sys.argv[1:] or sorted(registry._ADDED_THIS_ROUND)
    base_dir = os.environ.get("SPARK_GRAFT_PROBE_BASE", "/root/testdata/sf0.1")
    big_dir = os.environ.get("SPARK_GRAFT_PROBE_BIG", ".scratch/sf1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    base = _run(keys, base_dir, cpus)
    big = _run(keys, big_dir, cpus)
    rows = []
    for k in keys:
        b, g = base.get(k, -1), big.get(k, -1)
        ratio = round(g / b, 1) if b and b > 0 and g > 0 else None
        rows.append({"key": k, "base_s": b, "big_s": g, "ratio": ratio})
    rows.sort(key=lambda r: -(r["ratio"] or 0))
    for r in rows:
        print(f"{r['big_s']:8.2f} {r['base_s']:7.2f}  x{r['ratio'] or 'err':<6} {r['key']}")
    with open(".scratch/probe_scale.json", "w") as fh:
        json.dump(rows, fh, indent=1)


if __name__ == "__main__":
    main()
