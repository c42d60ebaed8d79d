"""Structured Streaming sketch maintenance: incremental correctness —
the streamed state after N batches must equal a batch build over the same
rows (the identity the reference tests for its incremental API,
test/sql/ddsketch.sql:2434-2505)."""

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ddsketch_spark.core.ddsketch import DDSketch
from ddsketch_spark.streaming.sketch_stream import (
    foreach_batch_maintainer, stateful_quantiles,
)

SCHEMA = "k string, v double"


def _write_chunk(spark, path, seed, n=2000):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], n),
        "v": np.exp(rng.standard_normal(n)) * 100,
    })
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(path)
    return pdf


def test_foreach_batch_incremental_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    all_pdfs = [_write_chunk(spark, src, seed=1)]
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = foreach_batch_maintainer(stream, state, ckpt, "v", ["k"])
    q.awaitTermination()

    # incremental: add more files, run again from the same checkpoint —
    # only the new file is processed
    all_pdfs.append(_write_chunk(spark, src, seed=2))
    all_pdfs.append(_write_chunk(spark, src, seed=3))
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = foreach_batch_maintainer(stream, state, ckpt, "v", ["k"])
    q.awaitTermination()

    got = {r["k"]: (bytes(r["sketch"]), r["n"])
           for r in spark.read.parquet(state).collect()}
    full = pd.concat(all_pdfs)
    for k, grp in full.groupby("k"):
        want = DDSketch(0.01, 2048).update(grp["v"].to_numpy())
        assert DDSketch.from_bytes(got[k][0]) == want, k
        assert got[k][1] == len(grp)


def test_stateful_quantiles_running_state(spark, tmp_path):
    src = str(tmp_path / "src2")
    ckpt = str(tmp_path / "ckpt2")
    out_dir = str(tmp_path / "out2")

    p1 = _write_chunk(spark, src, seed=10)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = stateful_quantiles(stream, "k", "v", [0.5, 0.9])
    q = (out.writeStream.outputMode("update")
         .foreachBatch(lambda bdf, bid: bdf.write.mode("append").parquet(out_dir))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()

    p2 = _write_chunk(spark, src, seed=11)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = stateful_quantiles(stream, "k", "v", [0.5, 0.9])
    q = (out.writeStream.outputMode("update")
         .foreachBatch(lambda bdf, bid: bdf.write.mode("append").parquet(out_dir))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()

    res = spark.read.parquet(out_dir).toPandas()
    full = pd.concat([p1, p2])
    # the latest emission per key reflects ALL rows seen so far, and the
    # running quantile equals the batch-built kernel's
    latest = res.sort_values("count").groupby("k").last()
    for k, grp in full.groupby("k"):
        assert latest.loc[k, "count"] == len(grp)
        want = DDSketch(0.01, 2048).update(grp["v"].to_numpy())
        assert latest.loc[k, "q0_5"] == pytest.approx(float(want.quantile(0.5)))
        assert latest.loc[k, "q0_9"] == pytest.approx(float(want.quantile(0.9)))
