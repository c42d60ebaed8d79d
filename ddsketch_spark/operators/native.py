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

import struct

from ddsketch_spark.core.ddsketch import (
    _BUCKET_DT, DDSketch, mapping_params, validate_alpha, validate_nbuckets,
)

_LOG2 = math.log(2.0)


def dd_bucket_exprs(value_col: str, alpha: float) -> tuple[Column, Column]:
    """(part, bucket_index) columns: part 2=positive store, 1=zero bucket,
    0=negative store, -1=NULL/NaN row (lineage only). Mirrors
    core.ddsketch.map_index / the three-way routing of ddsketch_add
    (ddsketch.c:796-821) as JVM expressions. NaN is routed to part=-1 like
    NULL (DDSketch.update skips NaN, matching the reference's NULL-skip,
    ddsketch.c:1029-1039) — without the guard Spark's NaN-greater-than-all
    ordering would drop NaN rows into the positive store."""
    _, mult, minidx, _ = mapping_params(alpha)
    v = F.col(value_col)
    skip = v.isNull() | F.isnan(v.cast("double"))
    logmult = F.log(v) / _LOG2 * mult
    logmult_neg = F.log(-v) / _LOG2 * mult
    part = (F.when(skip, F.lit(-1))
            .when(v > minidx, F.lit(2))
            .when(v < -minidx, F.lit(0))
            .otherwise(F.lit(1)))
    bidx = (F.when(skip, F.lit(0))
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
        # NULL or NaN count => 1 (ddsketch.c:1148-1151; DDSketch.update maps
        # NaN counts to 1) — guard BEFORE the long cast, which turns NaN
        # into 0 and would mistrip the >0 check.
        wd = F.col(weight_col).cast("double")
        wraw = (F.when(wd.isNull() | F.isnan(wd), F.lit(1).cast("long"))
                .otherwise(F.col(weight_col).cast("long")))
        # weights must be > 0 (ddsketch.c:1153-1155) — enforced in-plan,
        # with the reference's message text
        w = F.when(wraw > 0, wraw).otherwise(
            F.raise_error(F.concat(
                F.lit("invalid count value "), wraw.cast("string"),
                F.lit(", must be a positive value")))
            .cast("long"))
    else:
        w = F.lit(1).cast("long")
    vd = F.col(value_col).cast("double")
    w = F.when(F.col(value_col).isNull() | F.isnan(vd), F.lit(0)).otherwise(w)

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

    from ddsketch_spark.operators.aggregate import grouped_apply_sorted
    if keys:
        batch_fn = _make_dd_batch_assembler(keys, alpha, nbuckets,
                                            on_overflow, out_schema,
                                            assemble)
        return grouped_apply_sorted(buckets, keys, batch_fn, out_schema,
                                    per_run=False)
    return buckets.groupBy(F.lit(0).alias("__g")).applyInPandas(
        assemble, schema=out_schema)


def _make_dd_batch_assembler(keys, alpha, nbuckets, on_overflow,
                             out_schema, slow_assemble):
    """Vectorized sketch assembly across ALL key runs of a sorted batch:
    one numpy pass builds every run's wire bytes (same layout as
    DDSketch.to_bytes — big-endian header + neg-DESC/pos-ASC bucket
    pairs), with only a ~2 microsecond header pack per run. Runs whose
    bucket count exceeds maxbuckets fall back to the kernel path (error or
    UDDSketch collapse). Bit-identical to the per-run assemble (pinned by
    the native==kernel identity tests)."""
    import numpy as np

    def assemble_batch(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        kdf = pdf[keys]
        prev = kdf.shift()
        same = ((kdf == prev) | (kdf.isna() & prev.isna())).all(axis=1).to_numpy()
        same[0] = False
        run_id = np.cumsum(~same) - 1
        nruns = int(run_id[-1]) + 1
        run_starts = np.flatnonzero(~same)

        part = pdf["__part"].to_numpy(np.int64)
        bidx = pdf["__bidx"].to_numpy(np.int64)
        c = pdf["__c"].to_numpy(np.int64)
        rows = pdf["__rows"].to_numpy(np.int64)

        def seg_sum(vals, mask):
            out = np.zeros(nruns, dtype=np.int64)
            np.add.at(out, run_id[mask], vals[mask])
            return out

        live = part >= 0
        count = seg_sum(c, live)
        zero = seg_sum(c, live & (part == 1))
        nrows = seg_sum(rows, np.ones(n, dtype=bool))
        ones = np.ones(n, dtype=np.int64)
        nneg = seg_sum(ones, part == 0)
        npos = seg_sum(ones, part == 2)
        nbk = nneg + npos

        # wire order within a run: negative part index-DESC, then positive
        # index-ASC (core.ddsketch.to_bytes / ddsketch.c:53-59)
        sel = (part == 0) | (part == 2)
        ordkey = np.where(part == 0, -bidx, bidx)
        sidx = np.flatnonzero(sel)
        order = sidx[np.lexsort((ordkey[sidx], part[sidx], run_id[sidx]))]
        barr = np.empty(order.size, dtype=_BUCKET_DT)
        barr["index"] = bidx[order]
        barr["count"] = c[order]
        bbytes = barr.tobytes()
        ends = np.cumsum(nbk)
        starts = ends - nbk

        out = {k: [] for k in keys}
        out["sketch"], out["n"] = [], []
        key_rows = kdf.iloc[run_starts]
        hfmt = ">iqqdiii"  # _HEADER format (Struct objects don't pickle)
        pack = struct.Struct(hfmt).pack
        for r in range(nruns):
            if count[r] == 0:
                continue  # all-NULL group: no output row
            if nbk[r] > nbuckets:
                # rare overflow: kernel path handles error/collapse exactly
                res = slow_assemble(pdf.iloc[run_starts[r]:
                                             run_starts[r + 1] if r + 1 < nruns else n])
                for k in keys:
                    out[k].append(res[k].iloc[0])
                out["sketch"].append(res["sketch"].iloc[0])
                out["n"].append(int(res["n"].iloc[0]))
                continue
            hdr = pack(0, int(count[r]), int(zero[r]), alpha, nbuckets,
                       int(nbk[r]), int(nneg[r]))
            out["sketch"].append(hdr + bbytes[starts[r] * 12: ends[r] * 12])
            out["n"].append(int(nrows[r]))
            for k in keys:
                out[k].append(key_rows[k].iloc[r])
        return pd.DataFrame(out) if out["sketch"] else pd.DataFrame(
            {f.name: [] for f in out_schema.fields})

    return assemble_batch


# ---------------------------------------------------------------------------
# native stage-1 for the hash-based siblings: register/counter computation
# as JVM expressions + native partial aggregation; Python assembles the
# final sketch from O(registers) rows per key. Same shuffle story as the
# DDSketch path: bucket rows cross the wire, never raw rows.
# ---------------------------------------------------------------------------

import numpy as np

from ddsketch_spark.core.bloom import Bloom
from ddsketch_spark.core.cms import CMS
from ddsketch_spark.core.hashing import H1_BITS, H64_BITS
from ddsketch_spark.core.hll import HLL


def _assemble_schema(df: DataFrame, keys: Sequence[str]) -> StructType:
    return StructType(
        [f for f in df.schema.fields if f.name in keys]
        + [StructField("sketch", BinaryType(), False),
           StructField("n", LongType(), False)]
    )


def _grouped(buckets: DataFrame, keys: Sequence[str], assemble, schema):
    from ddsketch_spark.operators.aggregate import grouped_apply_sorted
    if keys:
        # sorted-run mapInPandas: O(Arrow batch) python overhead instead of
        # one Arrow batch PER KEY (12x at 100k keys — see grouped_apply_sorted)
        return grouped_apply_sorted(buckets, list(keys), assemble, schema)
    return buckets.groupBy(F.lit(0).alias("__g")).applyInPandas(
        assemble, schema=schema)


def _hll_register_rows(df: DataFrame, hash_col: str, keys: list,
                       m: int, Q: int) -> DataFrame:
    """``keys..., __j, __rho`` — one register observation per non-null
    hash: ``j = h % m``, ``rho = Q - bit_length(h div m)`` (h div m == 0
    -> Q). bit_length is computed as popcount of the bit-SMEARED value
    (x |= x>>1 ... x>>32 sets every bit below the MSB, so bit_count ==
    bit_length) in six staged integer columns — the previous
    ``length(bin(x))`` allocated a base-2 String per row on the scan's
    hot path (identical integers, measured ~9% on hll_ndv_orderkeys at
    sf1.0; stages keep the expression linear so codegen never sees an
    exponential tree)."""
    h = F.col(hash_col)
    out = (df.where(h.isNotNull())
           .select(*keys, (h % m).alias("__j"),
                   F.expr(f"{hash_col} div {m}").alias("__w")))
    for s in (1, 2, 4, 8, 16, 32):
        out = out.withColumn("__w", F.expr(f"__w | (__w >> {s})"))
    rho = (F.when(F.col("__w") == 0, F.lit(Q))
           .otherwise(F.lit(Q) - F.expr("bit_count(__w)")))
    return out.select(*keys, "__j", rho.cast("int").alias("__rho"))


def hll_ndv_native(df: DataFrame, hash_col: str, p: int = 12,
                   keys: Sequence[str] = (),
                   alias: str = "ndv_est") -> DataFrame:
    """``keys..., <alias> double`` — HLL NDV estimate computed ENTIRELY as
    JVM expressions (two codegen hash aggregations, zero Python): register
    max per (keys, j), then the exact-INTEGER power sum
    ``sum(1 << (Q - rho))`` — order-independent, so it matches the DuckDB
    oracle and the numpy kernel bit-for-bit — and the raw/linear-counting
    branch as a CASE. Use when only the estimate is needed; build the
    binary sketch with :func:`hll_agg_native` when the summary itself is
    stored or merged (the estimate formula here is the same as
    core.hll.HLL.estimate)."""
    from ddsketch_spark.core.hll import _alpha

    keys = list(keys)
    m = 1 << p
    Q = H64_BITS - p + 1
    # same evaluation order as HLL.estimate() and oracles.hll_ndv_sql
    C = _alpha(m) * m * m * float(1 << Q)
    regs = (
        _hll_register_rows(df, hash_col, keys, m, Q)
        .groupBy(*keys, "__j")
        .agg(F.max("__rho").alias("__r"))
    )
    agg = regs.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("__np"),
        # coalesce: a global aggregate over an EMPTY input still emits one
        # row (count 0, sum NULL) — 0 keeps the math on the kernel's path
        # (all-zero registers -> linear counting -> estimate 0.0)
        F.coalesce(F.sum(F.expr(f"CAST(1 AS BIGINT) << ({Q} - __r)")),
                   F.lit(0).cast("long")).alias("__sp"))
    zeros = F.lit(m).cast("long") - F.col("__np")
    denom = (F.col("__sp") + zeros * F.lit(1 << Q).cast("long")).cast("double")
    raw = F.lit(C) / denom
    est = F.when((raw <= F.lit(2.5 * m)) & (zeros > 0),
                 F.lit(float(m))
                 * F.log(F.lit(float(m)) / zeros.cast("double"))
                 ).otherwise(raw)
    return agg.select(*keys, est.alias(alias))


def hll_agg_native(df: DataFrame, hash_col: str, p: int = 12,
                   keys: Sequence[str] = ()) -> DataFrame:
    """``keys..., sketch binary, n long`` — HLL over a pre-hashed int64
    column (see core.hashing.spark_h64), registers computed as JVM
    expressions: ``j = h % m``, ``rho = Q - bit_length(h div m)``
    (h div m == 0 -> Q, see _hll_register_rows), aggregated with a
    native partial-max."""
    keys = list(keys)
    m = 1 << p
    Q = H64_BITS - p + 1
    buckets = (
        _hll_register_rows(df, hash_col, keys, m, Q)
        .groupBy(*keys, "__j")
        .agg(F.max("__rho").alias("__r"), F.count(F.lit(1)).alias("__rows"))
    )
    out_schema = _assemble_schema(df, keys)

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        s = HLL(p)
        regs = np.zeros(m, dtype=np.uint8)
        regs[pdf["__j"].to_numpy(dtype=np.int64)] = pdf["__r"].to_numpy(dtype=np.int64)
        s.registers = regs
        s.count = int(pdf["__rows"].sum())
        row = {k: [pdf[k].iloc[0]] for k in keys}
        row["sketch"] = [s.to_bytes()]
        row["n"] = [s.count]
        return pd.DataFrame(row)

    if keys:
        # vectorized across key runs: one (runs x m) register scatter per
        # Arrow batch + a 13-byte header pack per run (same wire bytes as
        # HLL.to_bytes; see the DDSketch batch assembler for the pattern)
        from ddsketch_spark.operators.aggregate import grouped_apply_sorted

        def assemble_batch(pdf: pd.DataFrame) -> pd.DataFrame:
            nrows_total = len(pdf)
            kdf = pdf[keys]
            prev = kdf.shift()
            same = ((kdf == prev) | (kdf.isna() & prev.isna()))                 .all(axis=1).to_numpy()
            same[0] = False
            run_id = np.cumsum(~same) - 1
            nruns = int(run_id[-1]) + 1
            run_starts = np.flatnonzero(~same)
            regs = np.zeros((nruns, m), dtype=np.uint8)
            regs[run_id, pdf["__j"].to_numpy(np.int64)] =                 pdf["__r"].to_numpy(np.int64)
            cnt = np.zeros(nruns, dtype=np.int64)
            np.add.at(cnt, run_id, pdf["__rows"].to_numpy(np.int64))
            hpack = struct.Struct(">4sBq").pack
            out = {k: [] for k in keys}
            out["sketch"], out["n"] = [], []
            key_rows = kdf.iloc[run_starts]
            for r in range(nruns):
                out["sketch"].append(
                    hpack(b"HLL1", p, int(cnt[r])) + regs[r].tobytes())
                out["n"].append(int(cnt[r]))
                for k in keys:
                    out[k].append(key_rows[k].iloc[r])
            return pd.DataFrame(out)

        return grouped_apply_sorted(buckets, keys, assemble_batch,
                                    out_schema, per_run=False)
    return _grouped(buckets, keys, assemble, out_schema)


def _py_probe_positions(h: int, k: int, width: int) -> list[int]:
    """Positions for a pre-computed probe hash — same double-hash walk as
    core.hashing.py_positions (which takes the raw string)."""
    h1 = h % (1 << H1_BITS)
    h2 = 2 * ((h >> H1_BITS) % (1 << (H1_BITS - 1))) + 1
    return [(h1 + i * h2) % width for i in range(k)]


def cms_freq_native(df: DataFrame, hash_col: str, probe_hashes,
                    depth: int = 5, width: int = 2048,
                    weight_col: str | None = None,
                    prefix: str = "freq_") -> DataFrame:
    """One-row DataFrame of ``<prefix>j`` count-min frequency estimates
    for literal probe hashes — ONE conditional-sum scan, zero Python,
    no sketch materialization: counter cell (i, pos) of a CMS is just
    ``sum(w where position_i(h) = pos)``, so a handful of probes needs
    ``depth x len(probes)`` conditional sums and a LEAST, not the
    depth x width table. Bit-identical to building the sketch and probing
    it (exact integer sums, order-free). Build the binary sketch with
    :func:`cms_agg_native` when the summary is stored or merged."""
    # each aggregate is ONE SQL string -> one py4j call: the Column-composed
    # form (sum/when/coalesce/lit per probe x depth) cost ~2,500 py4j
    # round-trips of plan-construction latency per query (~250 ms, measured
    # r6) for an identical analyzed plan
    w_sql = (f"coalesce(CAST({weight_col} AS BIGINT), 1)" if weight_col
             else "CAST(1 AS BIGINT)")
    h1s = f"({hash_col} % {1 << H1_BITS})"
    h2s = f"(2 * (({hash_col} div {1 << H1_BITS}) % {1 << (H1_BITS - 1)}) + 1)"
    aggs = []
    for j, ph in enumerate(probe_hashes):
        ppos = _py_probe_positions(int(ph), depth, width)
        for i in range(depth):
            cond = f"(({h1s} + {i} * {h2s}) % {width}) = {ppos[i]}"
            aggs.append(F.expr(
                f"coalesce(sum(CASE WHEN {cond} THEN {w_sql}"
                f" ELSE CAST(0 AS BIGINT) END), CAST(0 AS BIGINT))"
                f" AS __c{j}_{i}"))
    wide = df.agg(*aggs)
    return wide.selectExpr(*[
        "least(" + ", ".join(f"__c{j}_{i}" for i in range(depth))
        + f") AS {prefix}{j}"
        for j in range(len(probe_hashes))])


def bloom_member_native(df: DataFrame, hash_col: str, probe_hashes,
                        nbits: int = 1 << 16, k: int = 5,
                        prefix: str = "member_") -> DataFrame:
    """One-row DataFrame of ``<prefix>j`` Bloom membership booleans for
    literal probe hashes — one conditional-max scan, zero Python, no
    filter materialization; bit-identical to building the filter and
    probing it.

    Unlike the CMS sibling (one counter ROW per stride), the Bloom bit
    array is SHARED across strides: bit b is set iff ANY row's walk at
    ANY stride lands on b — so each probe bit's presence condition is an
    OR over all k stride positions of the scanned row (a per-stride-only
    check would miss cross-stride collisions and report false negatives
    on saturated filters; caught by the sf0.1 oracle run)."""
    h1s = f"({hash_col} % {1 << H1_BITS})"
    h2s = f"(2 * (({hash_col} div {1 << H1_BITS}) % {1 << (H1_BITS - 1)}) + 1)"
    row_pos = [f"(({h1s} + {i} * {h2s}) % {nbits})" for i in range(k)]
    # one SQL string per aggregate (see cms_freq_native: the Column form
    # costs thousands of py4j round-trips for the identical plan)
    aggs = []
    for j, ph in enumerate(probe_hashes):
        ppos = _py_probe_positions(int(ph), k, nbits)
        for i, p in enumerate(ppos):
            cond = " OR ".join(f"{rp} = {p}" for rp in row_pos)
            aggs.append(F.expr(
                f"coalesce(max(CASE WHEN {cond} THEN 1 ELSE 0 END), 0)"
                f" AS __b{j}_{i}"))
    wide = df.agg(*aggs)
    return wide.selectExpr(*[
        "CAST(least(" + ", ".join(f"__b{j}_{i}" for i in range(k))
        + f") AS BOOLEAN) AS {prefix}{j}"
        for j in range(len(probe_hashes))])


def _positions_exprs(hash_col: str, k: int, width: int):
    """(i, pos) explode for double hashing — JVM mirror of
    core.hashing.positions."""
    h1 = f"({hash_col} % {1 << H1_BITS})"
    h2 = f"(2 * (({hash_col} div {1 << H1_BITS}) % {1 << (H1_BITS - 1)}) + 1)"
    return F.expr(
        f"explode(transform(sequence(0, {k - 1}),"
        f" i -> struct(i AS i, ({h1} + i * {h2}) % {width} AS pos)))"
    ).alias("ip")


def cms_agg_native(df: DataFrame, hash_col: str, depth: int = 5,
                   width: int = 2048, keys: Sequence[str] = (),
                   weight_col: str | None = None) -> DataFrame:
    """Count-min with JVM-side position explode + native partial-sum."""
    keys = list(keys)
    w = (F.coalesce(F.col(weight_col).cast("long"), F.lit(1)) if weight_col
         else F.lit(1).cast("long"))
    base = (df.where(F.col(hash_col).isNotNull())
            .select(*keys, _positions_exprs(hash_col, depth, width),
                    w.alias("__w")))
    buckets = (
        base.select(*keys, F.col("ip.i").alias("__i"),
                    F.col("ip.pos").alias("__pos"), "__w")
        .groupBy(*keys, "__i", "__pos")
        .agg(F.sum("__w").alias("__c"), F.count(F.lit(1)).alias("__rows"))
    )
    out_schema = _assemble_schema(df, keys)

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        s = CMS(depth, width)
        s.table[pdf["__i"].to_numpy(dtype=np.int64),
                pdf["__pos"].to_numpy(dtype=np.int64)] = (
            pdf["__c"].to_numpy(dtype=np.int64))
        # each input row contributes to `depth` position rows
        s.count = int(pdf["__c"].sum()) // depth
        row = {k: [pdf[k].iloc[0]] for k in keys}
        row["sketch"] = [s.to_bytes()]
        row["n"] = [int(pdf["__rows"].sum()) // depth]
        return pd.DataFrame(row)

    return _grouped(buckets, keys, assemble, out_schema)


def bloom_agg_native(df: DataFrame, hash_col: str, nbits: int = 1 << 16,
                     k: int = 5, keys: Sequence[str] = ()) -> DataFrame:
    """Bloom with JVM-side position explode + native distinct."""
    keys = list(keys)
    base = (df.where(F.col(hash_col).isNotNull())
            .select(*keys, _positions_exprs(hash_col, k, nbits)))
    rows_per_key = (df.where(F.col(hash_col).isNotNull())
                    .groupBy(*(keys if keys else [F.lit(0).alias("__g0")]))
                    .agg(F.count(F.lit(1)).alias("__nrows")))
    positions = (base.select(*keys, F.col("ip.pos").alias("__pos"))
                 .distinct())
    out_schema = _assemble_schema(df, keys)

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        s = Bloom(nbits, k)
        s.bits[pdf["__pos"].to_numpy(dtype=np.int64)] = True
        s.count = int(pdf["__nrows"].iloc[0])
        row = {kk: [pdf[kk].iloc[0]] for kk in keys}
        row["sketch"] = [s.to_bytes()]
        row["n"] = [s.count]
        return pd.DataFrame(row)

    joined = (positions.join(rows_per_key, on=keys) if keys
              else positions.crossJoin(F.broadcast(rows_per_key.drop("__g0"))))
    return _grouped(joined, keys, assemble, out_schema)
