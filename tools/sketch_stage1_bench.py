"""Stage-1 throughput of the Arrow-pipeline sketches (KLL / t-digest)
vs the JVM-native DDSketch path, on the scaling corpus workload.

KLL and t-digest have no closed-form bucket expression, so their stage 1
runs in Python (mapInPandas + vectorized numpy kernels) — the one sketch
family whose update CANNOT ride whole-stage codegen. This tool prices
that choice (r4 verdict item 7): same corpus, same (lang, length(text))
projection, same groupBy-lang aggregation + quantile extraction, fresh
JVM per engine, interleaved best-of-N.

Usage:
    python tools/sketch_stage1_bench.py [--n-docs 8000000] [--cpus 16]
                                        [--runs 3]

Prints one JSON line per engine plus a summary line; paste the table
into BENCH/BASELINE.md (hand-maintained).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
from ddsketch_spark.plans.session import get_spark
from pyspark.sql import functions as F

engine = sys.argv[1]; cpus = int(sys.argv[2]); path = sys.argv[3]
runs = int(sys.argv[4])
spark = get_spark("stage1-bench", master=f"local[{cpus}]",
                  shuffle_partitions=cpus)
spark.conf.set("spark.sql.files.maxPartitionBytes", str(64 * 1024 * 1024))
docs = spark.read.parquet(path)
n = docs.count()
work = docs.select("lang", F.length("text").cast("double").alias("v"))

if engine == "ddsketch_native":
    from ddsketch_spark.operators.native import ddsketch_agg_native
    from ddsketch_spark.functions.sketch_udfs import sketch_quantile

    def pipeline():
        built = ddsketch_agg_native(work, "v", 0.01, 2048, keys=["lang"])
        return built.select("lang", sketch_quantile(
            F.col("sketch"), [0.5, 0.9, 0.99]).alias("e")).collect()
elif engine in ("kll", "kll_precombine"):
    from ddsketch_spark.core import kll as kll_mod
    from ddsketch_spark.core.kll import KLL
    from ddsketch_spark.functions.estimators import kll_quantile
    from ddsketch_spark.operators.aggregate import sketch_agg

    def pipeline():
        built = sketch_agg(work, "v", keys=["lang"],
                           factory=lambda: KLL(200),
                           from_bytes=kll_mod.from_bytes,
                           precombine=engine.endswith("precombine"))
        return built.select("lang", kll_quantile(
            F.col("sketch"), [0.5, 0.9, 0.99]).alias("e")).collect()
elif engine in ("tdigest", "tdigest_precombine"):
    from ddsketch_spark.core import tdigest as td_mod
    from ddsketch_spark.core.tdigest import TDigest
    from ddsketch_spark.functions.estimators import tdigest_quantile
    from ddsketch_spark.operators.aggregate import sketch_agg

    def pipeline():
        built = sketch_agg(work, "v", keys=["lang"],
                           factory=lambda: TDigest(100.0),
                           from_bytes=td_mod.from_bytes,
                           precombine=engine.endswith("precombine"))
        return built.select("lang", tdigest_quantile(
            F.col("sketch"), [0.5, 0.9, 0.99]).alias("e")).collect()
else:
    raise SystemExit(f"unknown engine {engine}")

pipeline()  # warm: codegen, python worker pool, parquet footer cache
best = float("inf")
for _ in range(runs):
    t0 = time.perf_counter()
    rows = pipeline()
    best = min(best, time.perf_counter() - t0)
spark.stop()
print(json.dumps({"engine": engine, "cpus": cpus, "docs": n, "sec": best,
                  "docs_per_sec": n / best, "langs": len(rows)}))
"""


def run_engine(engine: str, cpus: int, path: str, runs: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _WORKER % {"repo": REPO}, engine, str(cpus),
         path, str(runs)],
        capture_output=True, text=True, timeout=2400)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=8_000_000)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--data", default="/tmp/ddsketch_stage1_docs")
    args = ap.parse_args()

    if not os.path.exists(os.path.join(args.data, "_SUCCESS")):
        mat = (
            "import sys; sys.path.insert(0, %r)\n"
            "from ddsketch_spark.plans.session import get_spark\n"
            "from ddsketch_spark.sources.webpages import synthesize\n"
            "spark = get_spark('materialize', master='local[32]')\n"
            "synthesize(spark, %d, 42, 64).write.mode('overwrite')"
            ".parquet(%r)\nspark.stop()\n"
            % (REPO, args.n_docs, args.data))
        subprocess.run([sys.executable, "-c", mat], check=True,
                       timeout=1800, capture_output=True)

    engines = ["ddsketch_native", "kll", "kll_precombine",
               "tdigest", "tdigest_precombine"]
    # interleave engines across rounds so the sandbox VM's CPU-speed
    # drift penalizes all engines evenly (same protocol as scaling_bench)
    best: dict[str, dict] = {}
    for _ in range(args.runs):
        for eng in engines:
            r = run_engine(eng, args.cpus, args.data, 1)
            if eng not in best or r["sec"] < best[eng]["sec"]:
                best[eng] = r
            print(json.dumps(r), flush=True)
    base = best["ddsketch_native"]["docs_per_sec"]
    summary = {
        "workload": "p50/p90/p99 of length(text) by lang, "
                    f"local[{args.cpus}], best-of-{args.runs} interleaved",
        "n_docs": best["ddsketch_native"]["docs"],
        "docs_per_sec": {e: round(best[e]["docs_per_sec"]) for e in engines},
        "vs_native": {e: round(best[e]["docs_per_sec"] / base, 3)
                      for e in engines},
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
