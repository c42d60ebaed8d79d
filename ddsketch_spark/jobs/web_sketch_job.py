"""Web-scale sketch job: quantile sketches of text/html size by ``lang``
over the Common-Crawl-style table, with the north rule's distributed-systems
layer — explicit skew handling, per-batch lineage + metrics, and
checkpointed resumability (a killed job replays only unfinished batches).

Runs standalone via ``spark-submit --py-files ddsketch_spark.zip
ddsketch_spark/jobs/web_sketch_job.py --n-docs ... --checkpoint ...`` or
programmatically via :func:`run_job` (what bench/tests use).

Architecture (SURVEY §3.2 + §7.1 step 5):

1. The input is split into ``n_batches`` deterministic slices by a
   *batch provider* — an id-range slice for synthesized corpora, a
   file-group for parquet/Iceberg inputs (:func:`file_batches`). Each batch
   job reads ONLY its slice (partition pruning / separate file lists), so
   total scan volume is one pass regardless of batch count — the property
   that matters at 100 TB.
2. One Spark job per *unfinished* batch computes per-lang partial sketches
   via the JVM-native bucket aggregation (operators/native.py) and writes
   them — plus lineage (batch id, row count, value min/max, wall seconds)
   — to ``checkpoint_dir/batch=K`` (atomic: parquet dir + _SUCCESS).
   Within a batch the map-side partial aggregation bounds every shuffle to
   O(langs x nbuckets) rows; Zipf-skewed langs cannot create a hot reduce
   key because bucket rows, not raw rows, are shuffled. The batch loop is
   the two-round merge: batch-local partials first, tiny global merge last.
3. Finalize reads all batch partials and merges per lang
   (operators/aggregate.merge_sketches), then extracts quantiles. Merge
   input is n_batches x langs sketch rows — kilobytes.

Killing the job between batches loses nothing; killing mid-batch loses only
that batch's work (no partial dir is visible without _SUCCESS).
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from ddsketch_spark.functions.sketch_udfs import sketch_quantile
from ddsketch_spark.operators.aggregate import merge_partials
from ddsketch_spark.operators.native import ddsketch_agg_native

DEFAULT_QS = [0.5, 0.9, 0.99]


def range_batches(spark: SparkSession, n_docs: int, n_batches: int,
                  seed: int = 42) -> Callable[[int], DataFrame]:
    """Batch provider over the synthesized corpus: id-range slices, each
    generated independently (no shared scan at all)."""
    from ddsketch_spark.sources.webpages import synthesize_range

    bounds = [round(i * n_docs / n_batches) for i in range(n_batches + 1)]

    def provider(b: int) -> DataFrame:
        return synthesize_range(spark, bounds[b], bounds[b + 1], seed)

    return provider


def file_batches(spark: SparkSession, path: str,
                 n_batches: int) -> Callable[[int], DataFrame]:
    """Batch provider over a parquet directory: deterministic file groups
    (sorted round-robin), each batch reads only its own files."""
    import glob

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if not files:
        raise ValueError(f"no parquet files under {path}")
    groups = [files[b::n_batches] for b in range(n_batches)]

    def provider(b: int) -> DataFrame:
        if not groups[b]:
            return spark.read.parquet(*files).limit(0)
        return spark.read.parquet(*groups[b])

    return provider


def _batch_done(checkpoint_dir: str, b: int) -> bool:
    return os.path.exists(os.path.join(checkpoint_dir, f"batch={b}", "_SUCCESS"))


def run_job(
    spark: SparkSession,
    batch_provider: Callable[[int], DataFrame],
    checkpoint_dir: str,
    value_expr: str = "length(text)",
    key: str = "lang",
    alpha: float = 0.01,
    nbuckets: int = 2048,
    n_batches: int = 8,
    qs=DEFAULT_QS,
    max_batches: int | None = None,
) -> dict:
    """Returns {"result": DataFrame(key, n, q, est) or None, "metrics": {...}}.

    ``max_batches`` processes at most that many unfinished batches then
    stops (the kill-and-replay test uses it to simulate a mid-job failure —
    result is None until every batch is checkpointed).
    """
    t_start = time.perf_counter()
    ran, skipped = [], []
    for b in range(n_batches):
        if _batch_done(checkpoint_dir, b):
            skipped.append(b)
            continue
        if max_batches is not None and len(ran) >= max_batches:
            break
        t0 = time.perf_counter()
        # project before anything else: html binary must never cross a
        # shuffle or enter Python (SURVEY §4.1)
        batch_df = batch_provider(b).select(
            F.col(key), F.expr(value_expr).cast("double").alias("v"))
        partial = ddsketch_agg_native(batch_df, "v", alpha, nbuckets, keys=[key])
        stats = batch_df.groupBy(key).agg(
            F.min("v").alias("v_min"), F.max("v").alias("v_max"))
        out = partial.join(stats, on=key).collect()  # tiny: one row per lang
        wall = round(time.perf_counter() - t0, 3)
        rows = [
            {key: r[key], "sketch": bytes(r["sketch"]), "n": r["n"],
             "v_min": r["v_min"], "v_max": r["v_max"], "batch": b,
             "wall_s": wall}
            for r in out
        ]
        pdir = os.path.join(checkpoint_dir, f"batch={b}")
        schema = (f"{key} string, sketch binary, n long, v_min double, "
                  f"v_max double, batch int, wall_s double")
        (spark.createDataFrame(rows, schema=schema)
         .coalesce(1).write.mode("overwrite").parquet(pdir))
        ran.append(b)

    done = [b for b in range(n_batches) if _batch_done(checkpoint_dir, b)]
    metrics = {
        "batches_total": n_batches,
        "batches_ran": ran,
        "batches_skipped_checkpointed": skipped,
        "complete": len(done) == n_batches,
        "wall_s": round(time.perf_counter() - t_start, 3),
    }
    if not metrics["complete"]:
        return {"result": None, "metrics": metrics}

    partials = spark.read.parquet(
        *[os.path.join(checkpoint_dir, f"batch={b}") for b in range(n_batches)])
    merged = merge_partials(
        partials.select(key, "sketch",
                        F.col("batch").cast("long").alias("part_id"), "n"),
        keys=[key])
    qarr = F.array(*[F.lit(float(q)) for q in qs]).alias("q")
    earr = sketch_quantile(F.col("sketch"), list(qs)).alias("est")
    result = (
        merged.select(key, "n", F.explode(F.arrays_zip(qarr, earr)).alias("z"))
        .select(key, "n", F.col("z.q").alias("q"), F.col("z.est").alias("est"))
    )
    lin = partials.groupBy().agg(
        F.sum("n").alias("rows"), F.min("v_min").alias("v_min"),
        F.max("v_max").alias("v_max")).collect()[0]
    metrics.update(rows=lin["rows"], v_min=lin["v_min"], v_max=lin["v_max"])
    return {"result": result, "metrics": metrics}


def main() -> None:
    from ddsketch_spark.plans.session import get_spark

    ap = argparse.ArgumentParser(description="web-scale sketch job")
    ap.add_argument("--n-docs", type=int, default=1_000_000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--input-path", default=None,
                    help="parquet dir of web pages; default: synthesize")
    ap.add_argument("--value-expr", default="length(text)")
    ap.add_argument("--alpha", type=float, default=0.01)
    ap.add_argument("--nbuckets", type=int, default=2048)
    ap.add_argument("--n-batches", type=int, default=8)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    spark = get_spark("web-sketch-job", master=args.master)
    # a checkpoint batch reads only its own file group; with coarse default
    # splits (128 MB) a small group under-fans the cluster, so cut split
    # size so every batch still spreads across all cores/executors
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
    if args.input_path:
        provider = file_batches(spark, args.input_path, args.n_batches)
    else:
        provider = range_batches(spark, args.n_docs, args.n_batches, args.seed)
    out = run_job(spark, provider, args.checkpoint, args.value_expr,
                  alpha=args.alpha, nbuckets=args.nbuckets,
                  n_batches=args.n_batches)
    if out["result"] is not None:
        out["result"].orderBy("lang", "q").show(100, truncate=False)
    print(json.dumps(out["metrics"]))
    spark.stop()


if __name__ == "__main__":
    main()
