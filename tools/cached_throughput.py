"""Cached-table throughput: reference-methodology apples-to-apples.
The reference's 11.2M rows/s was measured over an already-cached 3-column
numeric PG table. This caches the projected (lang, v) columns in memory
and times ONLY the sketch aggregation."""
import json, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from ddsketch_spark.plans.session import get_spark
from ddsketch_spark.operators.native import ddsketch_agg_native
from ddsketch_spark.functions.sketch_udfs import sketch_quantile

cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
spark = get_spark("cached-tp", master=f"local[{cpus}]", shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet("/tmp/ddsketch_scaling_docs")
work = (docs.select("lang", F.length("text").cast("double").alias("v"))
        .repartition(cpus * 4).cache())
n = work.count()  # materialize cache

def pipeline():
    built = ddsketch_agg_native(work, "v", 0.01, 2048, keys=["lang"])
    out = built.select("lang", sketch_quantile(F.col("sketch"), [0.5, 0.9, 0.99]).alias("e"))
    return out.collect()

pipeline()
best = float("inf")
for _ in range(4):
    t0 = time.perf_counter()
    rows = pipeline()
    best = min(best, time.perf_counter() - t0)
print(json.dumps({"cpus": cpus, "docs": n, "sec": round(best, 3),
                  "docs_per_sec": round(n / best, 1), "langs": len(rows)}))
