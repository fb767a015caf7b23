import json, statistics, sys, time
sys.path.insert(0, "/root/repo")
from reports_generator_spark.session import get_spark
from reports_generator_spark.plans import registry
registry.load_all()

KEYS = ["embedding_neardup_lsh", "similarity_topk_lsh",
        "cluster_kmeans_lloyd", "dedup_near_minhash"]
sf_dir = "/root/testdata/sf0.1"
spark = get_spark("rg-median-probe", master="local[32]")
spark.sparkContext.setLogLevel("ERROR")
# warm: codegen + arrow pool
registry.QUERIES["agg_hash_group"](spark, sf_dir).write.format("noop").mode("overwrite").save()

def settle():
    jvm = spark.sparkContext._jvm
    jvm.System.gc(); time.sleep(1.0)
    spark.range(1).count(); jvm.System.gc()

out = {}
for k in KEYS:
    # one untimed warm run
    registry.QUERIES[k](spark, sf_dir).write.format("noop").mode("overwrite").save()
    runs = []
    for _ in range(5):
        settle()
        t0 = time.perf_counter()
        registry.QUERIES[k](spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 2))
    out[k] = {"runs": runs, "median": round(statistics.median(runs), 2)}
    print(k, out[k], flush=True)
print(json.dumps(out))
