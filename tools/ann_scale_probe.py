"""ANN scale-path probe: brute-force vs hyperplane-LSH vs IVF top-k at a
corpus size where candidate restriction matters, with recall vs the
exact brute-force result.

Brute force scans all n_corpus vectors per query (n_q x n_corpus exact
cosines); the bucketed paths pay a per-row bucketing cost once and then
score only same-bucket/same-cell candidates, so they win as n_q grows —
the regime a dedup/retrieval pipeline at 100 TB lives in.

Usage: python tools/ann_scale_probe.py [--n-corpus 250000] [--n-queries 512]
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
    ap.add_argument("--n-corpus", type=int, default=250_000)
    ap.add_argument("--n-queries", type=int, default=512)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--data", default="/tmp/ddsketch_ann_probe")
    ap.add_argument("--sweep", default="64:8",
                    help="comma-separated n_cells:nprobe pairs, e.g. "
                         "'64:4,64:8,128:8,256:16'")
    args = ap.parse_args()
    args.sweep = [tuple(int(x) for x in p.split(":"))
                  for p in args.sweep.split(",")]

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from ddsketch_spark.operators.similarity import (
        ann_ivf_topk, ann_lsh_topk, cosine_topk)
    from ddsketch_spark.plans.session import get_spark

    spark = get_spark("ann-probe", master="local[32]", shuffle_partitions=32)

    if not os.path.exists(os.path.join(args.data, "_SUCCESS")):
        dim = args.dim

        def gen(batches):
            for pdf in batches:
                ids = pdf["id"].to_numpy()
                # deterministic per-id vectors (clustered: 64 soft centers)
                rng = np.random.default_rng(1234)
                centers = rng.normal(0, 1, (64, dim))
                out = []
                for i in ids:
                    r = np.random.default_rng(i)
                    v = centers[i % 64] + r.normal(0, 0.35, dim)
                    out.append(v.astype(np.float32))
                yield pd.DataFrame({"vec_id": ids,
                                    "embedding": [v.tolist() for v in out]})

        (spark.range(args.n_corpus, numPartitions=64)
         .mapInPandas(gen, schema="vec_id long, embedding array<float>")
         .write.mode("overwrite").parquet(args.data))

    emb = spark.read.parquet(args.data)
    emb.count()
    qs = emb.where(F.col("vec_id") < args.n_queries)

    def timed(fn):
        t0 = time.perf_counter()
        out = fn().toPandas()
        return out, round(time.perf_counter() - t0, 1)

    bf, t_bf = timed(lambda: cosine_topk(emb, qs, args.k))
    want = {q: set(g["neighbor_id"]) for q, g in bf.groupby("query_id")}

    def recall(out):
        hit = sum(len(set(g["neighbor_id"]) & want[q])
                  for q, g in out.groupby("query_id"))
        return round(hit / (len(want) * args.k), 4)

    lsh, t_lsh = timed(lambda: ann_lsh_topk(emb, qs, args.k))

    def cell_stats(n_cells, refine_iters):
        """Cell-size distribution of the full corpus under a codebook —
        the candidate-set-cost term the balance heuristic caps."""
        from ddsketch_spark.operators.similarity import ivf_assign, ivf_codebook

        cb = ivf_codebook(emb, n_cells, refine_iters=refine_iters)
        sizes = (ivf_assign(emb, cb).groupBy("cell").count()
                 .toPandas()["count"])
        return {"max_cell": int(sizes.max()),
                "mean_cell": int(sizes.mean()),
                "max_over_even": round(float(sizes.max())
                                       / (args.n_corpus / n_cells), 2)}

    sweep = []
    for n_cells, nprobe in args.sweep:
        ivf, t_ivf = timed(lambda: ann_ivf_topk(
            emb, qs, args.k, n_cells=n_cells, nprobe=nprobe,
            refine_iters=3))
        sweep.append({
            "n_cells": n_cells, "nprobe": nprobe, "refine_iters": 3,
            "sec": t_ivf, "recall": recall(ivf),
            # expected candidate fraction scanned per query
            "cand_frac": round(nprobe / n_cells, 4),
            **cell_stats(n_cells, 3),
        })
        print(json.dumps({"ivf_point": sweep[-1]}), flush=True)

    print(json.dumps({
        "n_corpus": args.n_corpus, "n_queries": args.n_queries, "k": args.k,
        "brute_sec": t_bf,
        "lsh_sec": t_lsh, "lsh_recall": recall(lsh),
        "ivf_sweep": sweep,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
