"""JVM-native DDSketch aggregation — the scale path.

DDSketch's per-row work is a closed-form scalar expression
(``index = ceil(log(v)/log(2) * multiplier)``, reference ddsketch.c:3164-3168),
so stage 1 does not need Python at all::

    df.groupBy(keys, part, bucket_index).agg(sum(weight))

runs entirely inside whole-stage codegen with *native map-side partial
aggregation* — the shuffle carries at most (keys x nbuckets) partial bucket
counts per map task instead of raw rows or Arrow batches. Python (an
``applyInPandas`` over O(nbuckets) rows per key) only assembles the final
binary sketch. Compared to the generic mapInPandas pipeline
(:mod:`ddsketch_spark.operators.aggregate`, kept as the fallback for
kernels without a closed-form bucket expression — KLL, t-digest), this is
the plan that survives 100 TB: no JVM->Python crossing on the hot path,
Tungsten hash aggregation, AQE-managed shuffle.

Float parity: the JVM's ``Math.log`` and numpy's ``np.log`` agreed on every
value in the test corpus (850k values x 3 alphas, see
tests/test_native_agg.py); both are unverified-correctly-rounded libms, so
a 1-ulp divergence at an exact bucket boundary is theoretically possible —
the parity test pins it for the shipped data.

Bucket counts are exact integer sums, so the result is bit-identical to the
Python kernel and to serial execution at any parallelism (stronger than the
reference's parallel==serial caveat, README.md:795-798).
"""

from __future__ import annotations

import math
from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import BinaryType, LongType, StructField, StructType

from ddsketch_spark.core.ddsketch import (
    DDSketch, mapping_params, validate_alpha, validate_nbuckets,
)

_LOG2 = math.log(2.0)


def dd_bucket_exprs(value_col: str, alpha: float) -> tuple[Column, Column]:
    """(part, bucket_index) columns: part 2=positive store, 1=zero bucket,
    0=negative store, -1=NULL row (lineage only). Mirrors
    core.ddsketch.map_index / the three-way routing of ddsketch_add
    (ddsketch.c:796-821) as JVM expressions."""
    _, mult, minidx, _ = mapping_params(alpha)
    v = F.col(value_col)
    logmult = F.log(v) / _LOG2 * mult
    logmult_neg = F.log(-v) / _LOG2 * mult
    part = (F.when(v.isNull(), F.lit(-1))
            .when(v > minidx, F.lit(2))
            .when(v < -minidx, F.lit(0))
            .otherwise(F.lit(1)))
    bidx = (F.when(v.isNull(), F.lit(0))
            .when(v > minidx, F.ceil(logmult))
            .when(v < -minidx, F.ceil(logmult_neg))
            .otherwise(F.lit(0))).cast("long")
    return part.alias("__part"), bidx.alias("__bidx")


def ddsketch_agg_native(
    df: DataFrame,
    value_col: str,
    alpha: float,
    nbuckets: int,
    keys: Sequence[str] = (),
    weight_col: str | None = None,
    on_overflow: str = "error",
) -> DataFrame:
    """``keys..., sketch binary, n long`` — same contract and bit-identical
    output as ``sketch_agg(df, value_col, keys, lambda: DDSketch(...))``,
    with the aggregation done by Catalyst/Tungsten."""
    validate_alpha(alpha)
    validate_nbuckets(nbuckets)
    keys = list(keys)
    part, bidx = dd_bucket_exprs(value_col, alpha)
    if weight_col:
        wraw = F.coalesce(F.col(weight_col).cast("long"), F.lit(1))
        # weights must be > 0 (ddsketch.c:1153-1155) — enforced in-plan
        w = F.when(wraw > 0, wraw).otherwise(
            F.raise_error(F.lit(
                "count value for the ddsketch must be a positive integer"))
            .cast("long"))
    else:
        w = F.lit(1).cast("long")
    w = F.when(F.col(value_col).isNull(), F.lit(0)).otherwise(w)

    buckets = (
        df.select(*keys, F.col(value_col), *( [F.col(weight_col)] if weight_col else [] ))
        .select(*keys, part, bidx, w.alias("__w"))
        .groupBy(*keys, "__part", "__bidx")
        .agg(F.sum("__w").alias("__c"), F.count(F.lit(1)).alias("__rows"))
    )

    out_schema = StructType(
        [f for f in df.schema.fields if f.name in keys]
        + [StructField("sketch", BinaryType(), False),
           StructField("n", LongType(), False)]
    )

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        s = DDSketch(alpha, nbuckets, on_overflow)
        live = pdf[pdf["__part"] >= 0]
        s.count = int(live["__c"].sum())
        if s.count == 0:
            return pd.DataFrame({f.name: [] for f in out_schema.fields})
        zero = live[live["__part"] == 1]
        s.zero_count = int(zero["__c"].sum())
        neg = live[live["__part"] == 0]
        pos = live[live["__part"] == 2]
        s.neg = dict(zip(neg["__bidx"].astype(int), neg["__c"].astype(int)))
        s.pos = dict(zip(pos["__bidx"].astype(int), pos["__c"].astype(int)))
        s._enforce_maxbuckets()
        row = {k: [pdf[k].iloc[0]] for k in keys}
        row["sketch"] = [s.to_bytes()]
        row["n"] = [int(pdf["__rows"].sum())]
        return pd.DataFrame(row)

    group_cols = keys if keys else [F.lit(0).alias("__g")]
    return buckets.groupBy(*group_cols).applyInPandas(assemble, schema=out_schema)
