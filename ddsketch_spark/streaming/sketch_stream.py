"""Structured Streaming sketch maintenance — the Spark-native re-expression
of the reference's incremental API (lifecycle C: ``ddsketch_add`` /
``ddsketch_union`` UPDATE loops, /root/reference/README.md:199-243 and
ddsketch.c:2402-2648). Two shapes:

1. :func:`foreach_batch_maintainer` — each micro-batch builds partial
   sketches with the JVM-native path and unions them into a persistent
   sketch table (read-merge-overwrite of a kilobyte-scale state dir). This
   is the reference's "UPDATE summary SET d = ddsketch_union(d, new)"
   pattern, amortized per micro-batch instead of per row.

2. :func:`stateful_quantiles` — ``applyInPandasWithState`` keeping one
   serialized sketch per key in Spark's state store, emitting running
   quantiles each batch: the custom-stateful-operator shape for when state
   must live inside the streaming engine (exactly-once with the
   checkpoint).

Tests drive both with a file source + ``trigger(availableNow)`` so runs are
deterministic and incremental (new files -> only new rows processed).
"""

from __future__ import annotations

import os
from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType, DoubleType, LongType, StringType, StructField, StructType,
)

from ddsketch_spark.core.ddsketch import DDSketch
from ddsketch_spark.operators.aggregate import merge_partials
from ddsketch_spark.operators.native import ddsketch_agg_native


def foreach_batch_maintainer(
    stream_df: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    value_col: str,
    keys: Sequence[str],
    alpha: float = 0.01,
    nbuckets: int = 2048,
):
    """Returns a started streaming query; call ``awaitTermination()``.

    State table schema: ``keys..., sketch binary, n long`` (same contract
    as the batch aggregation, so all extraction UDFs apply directly).
    """
    keys = list(keys)
    spark = stream_df.sparkSession

    def process(batch_df: DataFrame, batch_id: int) -> None:
        partial = ddsketch_agg_native(batch_df, value_col, alpha, nbuckets,
                                      keys)
        if os.path.exists(os.path.join(state_dir, "_SUCCESS")):
            prev = spark.read.parquet(state_dir)
            both = prev.unionByName(partial)
        else:
            both = partial
        with_lineage = both.withColumn(
            "part_id", F.monotonically_increasing_id())
        merged = merge_partials(
            with_lineage.select(*keys, "sketch", "part_id", "n"), keys=keys)
        # state is kilobytes — collect then overwrite atomically
        rows = merged.collect()
        schema = merged.schema
        (spark.createDataFrame(rows, schema=schema)
         .coalesce(1).write.mode("overwrite").parquet(state_dir))

    return (stream_df.writeStream
            .foreachBatch(process)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def stateful_quantiles(
    stream_df: DataFrame,
    key: str,
    value_col: str,
    qs: Sequence[float],
    alpha: float = 0.01,
    nbuckets: int = 2048,
):
    """``applyInPandasWithState`` running-quantile operator: state = one
    serialized DDSketch per key; each batch updates it and emits
    ``key, count, q_...`` rows. Returns the output DataFrame (attach your
    own writeStream)."""
    qs = [float(q) for q in qs]
    out_schema = StructType(
        [StructField(key, StringType(), False),
         StructField("count", LongType(), False)]
        + [StructField(f"q{str(q).replace('.', '_')}", DoubleType(), True)
           for q in qs]
    )
    state_schema = StructType([StructField("sketch", BinaryType(), True)])

    def fn(k: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
           ) -> Iterator[pd.DataFrame]:
        if state.exists and state.get[0] is not None:
            s = DDSketch.from_bytes(bytes(state.get[0]))
        else:
            s = DDSketch(alpha, nbuckets)
        for pdf in pdfs:
            vals = pdf[value_col].to_numpy(dtype="float64", na_value=float("nan"))
            s.update(vals)
        state.update((s.to_bytes() if s.count > 0 else None,))
        row = {key: [k[0]], "count": [s.count]}
        est = s.quantile(qs) if s.count > 0 else [None] * len(qs)
        for q, e in zip(qs, est):
            row[f"q{str(q).replace('.', '_')}"] = [float(e) if e is not None else None]
        yield pd.DataFrame(row)

    return (stream_df.groupBy(key).applyInPandasWithState(
        fn, out_schema, state_schema, "update",
        GroupStateTimeout.NoTimeout))
