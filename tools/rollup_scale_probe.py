"""Rollup-layer scale probe: quantify the continuous-aggregate story on
the 64M-doc scaling corpus.

The 100 TB claim behind operators/rollup.py is that the raw data is
scanned ONCE (hourly sketch-table build) and every later question —
coarser grains, aligned time ranges — touches only kilobyte partials.
This probe measures exactly that split:

  1. build: 64M docs -> hourly x lang DDSketch table (the one full scan)
  2. rollup: hourly -> daily (merge of kB rows only)
  3. range:  p50/p95 over a multi-day aligned window from stored partials

and prints one JSON line with seconds + docs/sec for the build and
seconds for each follow-up, plus the partial-table row count that makes
the asymmetry obvious (rows_fine ~ hours x langs vs 64M raw rows).

Usage: python tools/rollup_scale_probe.py [--data /tmp/ddsketch_scaling_docs]
       [--cpus 16]
(materialize the corpus first via tools/scaling_bench.py)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HOUR, DAY = 3600, 86400


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/ddsketch_scaling_docs")
    ap.add_argument("--cpus", type=int, default=16)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ddsketch_spark.plans.session import get_spark
    from ddsketch_spark.operators.rollup import (
        build_sketch_table, range_percentile, rollup)
    from ddsketch_spark.sources.tables import read_table, write_table

    spark = get_spark("rollup-scale-probe", master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)
    docs = spark.read.parquet(args.data)
    n = docs.count()                       # warm scan + file index
    work = docs.select("warc_ts", "lang",
                       F.length("text").cast("double").alias("v"))

    # 1. the one full scan: raw rows -> hourly x lang sketch table
    t0 = time.perf_counter()
    hourly = build_sketch_table(work, "warc_ts", "v", 0.01, 2048, HOUR,
                                keys=["lang"])
    store = "/tmp/rollup_probe_hourly"
    write_table(hourly, store, mode="overwrite")
    t_build = time.perf_counter() - t0
    stored = read_table(spark, store)
    rows_fine = stored.count()

    # span -> an aligned interior range covering ~half the corpus days
    lo, hi = stored.agg(F.min("bucket"), F.max("bucket")).first()
    ndays = max(1, (hi - lo) // DAY)
    r0 = (lo // DAY) * DAY + DAY
    r1 = r0 + max(DAY, (ndays // 2) * DAY)

    # 2. coarsen hourly -> daily: merges kB rows only, no raw rescan
    t0 = time.perf_counter()
    rows_daily = rollup(stored, DAY, HOUR, keys=["lang"]).count()
    t_rollup = time.perf_counter() - t0

    # 3. aligned range quantiles from stored partials only
    t0 = time.perf_counter()
    out = range_percentile(stored, r0, r1, [0.5, 0.95], HOUR,
                           keys=["lang"]).collect()
    t_range = time.perf_counter() - t0

    spark.stop()
    print(json.dumps({
        "docs": n, "cpus": args.cpus,
        "build_sec": round(t_build, 2),
        "build_docs_per_sec": round(n / t_build),
        "rows_fine": rows_fine, "rows_daily": rows_daily,
        "rollup_sec": round(t_rollup, 2),
        "range_sec": round(t_range, 2), "range_rows": len(out),
        "range_days": (r1 - r0) // DAY,
    }))


if __name__ == "__main__":
    main()
