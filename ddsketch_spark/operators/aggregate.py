"""Two-stage distributed sketch aggregation — the engine's core operator.

This is the Spark-native re-expression of the reference's PostgreSQL
aggregate protocol (SFUNC / COMBINEFUNC / SERIALFUNC / FINALFUNC,
/root/reference/sql/ddsketch--1.0.0.sql:62-70 and ddsketch.c:2176-2361):

  stage 1 (SFUNC, map-side partial aggregation):
      ``mapInPandas`` over ONLY the projected key+value columns — one
      accumulator per key per input partition, updated per Arrow batch with
      vectorized numpy. Emits one row per (partition, key): the serialized
      partial sketch plus lineage fields (partition id, row count). The
      shuffle therefore carries kilobytes per group, never raw rows — this
      is what makes the plan survive a 100 TB scan: shuffle volume is
      O(partitions × groups × sketch_size), independent of row count.

  stage 2 (COMBINEFUNC): ``groupBy(keys).applyInPandas`` merging the
      partial sketches. Because stage 1 already collapsed each partition to
      ≤1 row per key, the worst-case rows per reduce key equals the input
      partition count — Zipf-skewed keys (web-data ``lang``) are already
      bounded; for extreme partition counts a fan-out pre-merge round
      (``merge_fanout``) caps it further (two-round merge per SURVEY §3.2).

  final (FINALFUNC): scalar pandas UDF on the merged sketch column
      (quantile / rank / trimmed extraction) — see
      :mod:`ddsketch_spark.functions`.

Any sketch implementing the protocol ``factory() -> obj`` with
``update(values, counts=None) / merge(other) / to_bytes()`` plus a
``from_bytes`` deserializer plugs into the same two stages (HLL, count-min,
Bloom, KLL, t-digest — SURVEY §7.1 step 4).
"""

from __future__ import annotations

from typing import Callable, Iterable, Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType, LongType, StructField, StructType,
)

from ddsketch_spark.core.ddsketch import DDSketch, from_bytes as dd_from_bytes

SENTINEL_KEY = "__global__"


def _key_fields(df: DataFrame, keys: Sequence[str]) -> list[StructField]:
    by_name = {f.name: f for f in df.schema.fields}
    return [by_name[k] for k in keys]


def sketch_partials(
    df: DataFrame,
    value_col: str,
    keys: Sequence[str] = (),
    factory: Callable[[], object] = DDSketch,
    weight_col: str | None = None,
    fanout: int | None = None,
    n_from_weight: bool = False,
) -> DataFrame:
    """Stage 1: per-partition, per-key partial sketches.

    Output schema: ``keys..., sketch binary, part_id long, n long`` where
    ``n`` is the number of contributing rows (lineage/metrics record per
    the north rule). ``n_from_weight=True`` counts lineage by summed
    weight instead — for inputs where one row REPRESENTS many (the
    precombined duplicate-collapsed path), keeping n = original rows.
    NOTE (r5 ADVICE): with an explicit ``weight_col``, the precombined
    path sums weights JVM-side BEFORE the kernel's positivity check, so
    zero/negative per-row weights that raise on the plain path are
    absorbed into the group sum (which only fails if the SUM is <= 0),
    and n's meaning shifts from rows-seen to summed weight — callers
    feeding untrusted weights through precombine should validate them
    up front.

    ``fanout=N`` round-robin-repartitions the (already-projected, narrow)
    rows to N tasks first — explicit opt-in for inputs whose split count is
    far below the cluster's cores AND whose per-row Python work justifies a
    shuffle. Off by default: a 100 TB scan already has thousands of splits,
    and for vectorized kernels (KLL/t-digest update is numpy-batch) the
    shuffle costs more than it saves (measured 2x slower at sf0.1).
    """
    keys = list(keys)
    cols = keys + [value_col] + ([weight_col] if weight_col else [])
    # explicit projection: mapInPandas is a pruning barrier, so never let
    # wide columns (e.g. html binary) cross into Python (SURVEY §4.1)
    projected = df.select(*cols)
    # int64 inputs (pre-hashed columns for HLL/CMS/Bloom) MUST drop NULLs
    # JVM-side: a nullable int64 Arrow batch lands in pandas as float64,
    # which silently destroys the low bits of 60-bit hash values
    # (2^60 has 256-ulp granularity in float64) — the kernel would sketch
    # corrupted hashes. NULLs contribute nothing to a hash sketch, so the
    # filter is semantics-preserving; the float path keeps NULL rows (they
    # arrive as NaN and the kernels skip them, with n still counting them).
    input_dtype = getattr(factory(), "input_dtype", "float64")
    if input_dtype in ("int64", "object"):
        # NULL items contribute nothing to hash/item sketches; dropping
        # them JVM-side keeps the Python batch dense (and for int64 avoids
        # the nullable->float64 corruption described below)
        projected = projected.where(F.col(value_col).isNotNull())
    if fanout and fanout > 1:
        projected = projected.repartition(fanout)
    projected = projected.withColumn("__pid", F.spark_partition_id())

    out_schema = StructType(
        _key_fields(df, keys)
        + [
            StructField("sketch", BinaryType(), False),
            StructField("part_id", LongType(), False),
            StructField("n", LongType(), False),
        ]
    )

    # kernels declare their input dtype ('float64' default; hash-based
    # sketches take pre-hashed 'int64' columns — hashing stays JVM-side;
    # item sketches like SpaceSaving take raw 'object' strings)
    int_input = input_dtype == "int64"
    obj_input = input_dtype == "object"

    def _extract(gdf: pd.DataFrame):
        if int_input or obj_input:
            sub = gdf[[value_col] + ([weight_col] if weight_col else [])].dropna(
                subset=[value_col])
            vals = sub[value_col].to_numpy(
                dtype="object" if obj_input else "int64")
            wts = (sub[weight_col].to_numpy(dtype="float64", na_value=float("nan"))
                   if weight_col else None)
        else:
            vals = gdf[value_col].to_numpy(dtype="float64", na_value=float("nan"))
            wts = (gdf[weight_col].to_numpy(dtype="float64", na_value=float("nan"))
                   if weight_col else None)
        return vals, wts

    def _nrows(gdf: pd.DataFrame) -> int:
        if n_from_weight and weight_col:
            return int(gdf[weight_col].fillna(1).sum())
        return len(gdf)

    def update_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        accs: dict[tuple, object] = {}
        rows: dict[tuple, int] = {}
        pid = 0
        for pdf in batches:
            if pdf.empty:
                continue
            pid = int(pdf["__pid"].iloc[0])
            if keys:
                grouped = pdf.groupby(keys, dropna=False, sort=False)
                for gkey, gdf in grouped:
                    gkey = gkey if isinstance(gkey, tuple) else (gkey,)
                    vals, wts = _extract(gdf)
                    acc = accs.get(gkey)
                    if acc is None:
                        acc = accs[gkey] = factory()
                        rows[gkey] = 0
                    acc.update(vals, wts)
                    rows[gkey] += _nrows(gdf)
            else:
                vals, wts = _extract(pdf)
                acc = accs.get(())
                if acc is None:
                    acc = accs[()] = factory()
                    rows[()] = 0
                acc.update(vals, wts)
                rows[()] += _nrows(pdf)

        out = {k: [] for k in keys}
        out["sketch"], out["part_id"], out["n"] = [], [], []
        for gkey, acc in accs.items():
            if getattr(acc, "count", 1) == 0:
                continue  # all-NULL group in this partition: no partial row
            for k, kv in zip(keys, gkey):
                out[k].append(kv)
            out["sketch"].append(acc.to_bytes())
            out["part_id"].append(pid)
            out["n"].append(rows[gkey])
        if out["sketch"]:
            yield pd.DataFrame(out)

    return projected.mapInPandas(update_fn, schema=out_schema)


AUTO_FANOUT_THRESHOLD = 512


def auto_merge_fanout(n_partitions: int,
                      threshold: int = AUTO_FANOUT_THRESHOLD) -> int | None:
    """Default pre-merge fanout for a scan with ``n_partitions`` tasks.

    Below ``threshold`` map tasks, a single gather/merge of one partial
    per task is cheaper than an extra shuffle round — return None. Above
    it (10k-task scans at 100 TB), return ~sqrt(n) so both the pre-merge
    groups and the final gather see O(sqrt(n)) rows — the fanout the
    docstrings of ``merge_partials``/``_gather_estimates`` previously told
    callers to pick by hand (r3 review item 9)."""
    if n_partitions <= threshold:
        return None
    return max(2, min(4096, int(np.ceil(np.sqrt(n_partitions)))))


def premerge_partials(
    partials: DataFrame,
    fanout: int,
    from_bytes: Callable[[bytes], object] = dd_from_bytes,
    keys: Sequence[str] = (),
    sketch_col: str = "sketch",
) -> DataFrame:
    """One executor pre-merge round: group partial rows by
    ``(keys, part_id % fanout)`` and merge each group to a single row,
    bounding whatever consumes the partials next (a driver gather or the
    final per-key merge) to ``fanout`` rows per key. Output keeps the
    partial-row contract (``keys..., sketch, part_id, n``) with
    ``part_id`` = the salt."""
    keys = list(keys)
    salt = F.pmod(F.col("part_id"), F.lit(fanout)).alias("__salt")
    pre_keys = keys + ["__salt"]
    pre_schema = StructType(
        [f for f in partials.schema.fields if f.name in keys]
        + [StructField("__salt", LongType(), False),
           StructField(sketch_col, BinaryType(), False),
           StructField("n", LongType(), False)]
    )

    def pre_merge_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = None
        for b in pdf[sketch_col]:
            s = from_bytes(bytes(b))
            acc = s if acc is None else acc.merge(s)
        row = {k: [pdf[k].iloc[0]] for k in pre_keys}
        row[sketch_col] = [acc.to_bytes()]
        row["n"] = [int(pdf["n"].sum())]
        return pd.DataFrame(row)

    return (
        grouped_apply_sorted(partials.withColumn("__salt", salt),
                             pre_keys, pre_merge_fn, pre_schema)
        .withColumn("part_id", F.col("__salt")).drop("__salt")
    )


def merge_partials(
    partials: DataFrame,
    keys: Sequence[str] = (),
    from_bytes: Callable[[bytes], object] = dd_from_bytes,
    merge_fanout: int | None = None,
    sketch_col: str = "sketch",
    map_side_combine: bool = False,
) -> DataFrame:
    """Stage 2: merge partial sketches per key.

    ``map_side_combine=True`` first merges same-key partials WITHIN each
    input partition (a mapInPandas pass, no shuffle) — the sketch analogue
    of Spark's partial aggregation. This is the lever that matters when
    partial rows are large or plentiful: it divides both the shuffle bytes
    and the hot reducer's serial merge chain by the partials-per-partition
    factor (measured on a 99.9%-hot-key corpus: tools/skew_bench.py).

    ``merge_fanout=k`` additionally inserts a pre-merge round grouped by
    ``(keys, part_id % k)`` — the post-shuffle two-round pattern: with P
    surviving partial rows, the final merge per key sees min(P, k) rows.
    Reach for it when even the combined per-key row count (one per map
    task) overwhelms a single reducer, e.g. tens of thousands of map tasks
    at 100 TB.
    """
    keys = list(keys)
    group_cols = keys if keys else [F.lit(0).alias("__g")]

    if map_side_combine:
        in_schema = partials.schema

        def combine_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            accs: dict[tuple, object] = {}
            meta: dict[tuple, list] = {}   # part_id (first seen), n sum
            for pdf in batches:
                for row in pdf.itertuples(index=False):
                    d = row._asdict()
                    gkey = tuple(d[k] for k in keys)
                    s = from_bytes(bytes(d[sketch_col]))
                    if gkey in accs:
                        accs[gkey].merge(s)
                        meta[gkey][1] += int(d["n"])
                    else:
                        accs[gkey] = s
                        meta[gkey] = [int(d["part_id"]), int(d["n"])]
            if not accs:
                return
            out = {k: [] for k in keys}
            out[sketch_col], out["part_id"], out["n"] = [], [], []
            for gkey, acc in accs.items():
                for k, kv in zip(keys, gkey):
                    out[k].append(kv)
                out[sketch_col].append(acc.to_bytes())
                out["part_id"].append(meta[gkey][0])
                out["n"].append(meta[gkey][1])
            yield pd.DataFrame(out)

        partials = partials.mapInPandas(combine_fn, schema=in_schema)

    out_fields = (
        [f for f in partials.schema.fields if f.name in keys]
        + [StructField(sketch_col, BinaryType(), False),
           StructField("n", LongType(), False)]
    )
    out_schema = StructType(out_fields)

    def merge_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = None
        for b in pdf[sketch_col]:
            s = from_bytes(bytes(b))
            acc = s if acc is None else acc.merge(s)
        row = {k: [pdf[k].iloc[0]] for k in keys}
        row[sketch_col] = [acc.to_bytes()]
        row["n"] = [int(pdf["n"].sum())]
        return pd.DataFrame(row)

    work = partials
    if merge_fanout and merge_fanout > 1:
        work = premerge_partials(partials, merge_fanout, from_bytes,
                                 keys, sketch_col)

    if keys:
        return grouped_apply_sorted(work, keys, merge_fn, out_schema)
    return work.groupBy(*group_cols).applyInPandas(merge_fn, schema=out_schema)


def resolve_from_bytes(factory: Callable[[], object],
                       from_bytes: Callable[[bytes], object]):
    """Thread the factory's overflow policy into partial deserialization.

    ``on_overflow`` is deliberately NOT part of the wire format (the
    header stays reference-parity, flags==0 — ddsketch.c:3013-3027), so a
    collapse-mode factory's partials would otherwise deserialize with the
    default ``on_overflow='error'`` and the level-reconciling merge in
    :meth:`DDSketch.merge` could never engage at the merge stage — the
    exact scenario collapse mode exists for, partials that collapsed a
    different number of times (r4 ADVICE). Only rebinds the DEFAULT
    DDSketch deserializer; an explicit ``from_bytes`` is the caller's
    contract."""
    if from_bytes is not dd_from_bytes:
        return from_bytes
    probe = factory()
    oo = getattr(probe, "on_overflow", "error")
    if isinstance(probe, DDSketch) and oo != "error":
        return lambda b, _oo=oo: dd_from_bytes(b, _oo)
    return from_bytes


def sketch_agg(
    df: DataFrame,
    value_col: str,
    keys: Sequence[str] = (),
    factory: Callable[[], object] = DDSketch,
    from_bytes: Callable[[bytes], object] = dd_from_bytes,
    weight_col: str | None = None,
    merge_fanout: int | None = None,
    fanout: int | None = None,
    precombine: bool = False,
) -> DataFrame:
    """Full 2-stage aggregation: ``keys..., sketch binary, n long``.

    The Spark analogue of ``SELECT keys, ddsketch(value, alpha, nbuckets)
    FROM t GROUP BY keys`` (reference lifecycle B, README.md:121-124).

    ``precombine=True`` collapses duplicate values JVM-side before the
    Arrow transfer: ``groupBy(keys, value) -> summed weight``, then the
    kernels' weighted update consumes (value, weight) rows. For
    discrete-valued columns (document lengths, token counts, sizes) this
    shrinks the JVM->Python hand-off from O(rows) to O(distinct values
    per key) — the lever that lets the Arrow-pipeline sketches (KLL /
    t-digest, no closed-form bucket expression) keep up with the
    JVM-native path at scale (BENCH/BASELINE.md r5: the stage-1 gap).
    Spark's partial aggregation combines map-side, so the extra shuffle
    carries only distinct (keys, value) rows. The resulting sketch sees
    the identical multiset (weighted insert == repeated insert for every
    kernel; pinned by tests), though for randomized compactors (KLL) the
    internal state differs while the error bounds hold unchanged.
    Caveat: with an explicit ``weight_col``, per-row positivity is
    summed away before the kernel's weight check — callers own weight
    validity on this path."""
    if precombine:
        w = (F.sum(F.coalesce(F.col(weight_col).cast("long"), F.lit(1)))
             if weight_col else F.count(F.lit(1)).cast("long"))
        # NULL/NaN values stay as their own group: the kernels skip them,
        # but their summed weight keeps the lineage n = rows seen
        df = df.groupBy(*list(keys), value_col).agg(w.alias("__w"))
        weight_col = "__w"
    partials = sketch_partials(df, value_col, keys, factory, weight_col,
                               fanout=fanout, n_from_weight=precombine)
    return merge_partials(partials, keys,
                          resolve_from_bytes(factory, from_bytes),
                          merge_fanout)


def _stored_rows_as_partials(df: DataFrame, sketch_col: str,
                             keys: Sequence[str],
                             n_col: str | None = None) -> DataFrame:
    """Project stored sketch rows into the partial-row contract
    (``keys..., sketch, part_id, n``) shared by merge_partials — one
    place to evolve the lineage fields. ``n_col`` carries each stored
    row's own contributing-row count through the merge (rollup tables);
    default counts merged sketch rows."""
    n = (F.col(n_col).cast("long") if n_col else F.lit(1).cast("long"))
    return (
        df.select(*(list(keys) + [F.col(sketch_col).alias("sketch"),
                                  n.alias("n")]))
        .withColumn("part_id", F.spark_partition_id().cast("long"))
    )


def merge_sketches(
    df: DataFrame,
    sketch_col: str,
    keys: Sequence[str] = (),
    from_bytes: Callable[[bytes], object] = dd_from_bytes,
    map_side_combine: bool = False,
    n_col: str | None = None,
) -> DataFrame:
    """Re-aggregate stored sketches (``ddsketch(sketch)`` N-way merge,
    reference ddsketch.c:1439-1520): ``keys..., sketch binary, n long``.

    Spark-side this is one shuffle of already-tiny sketch rows; partial
    merging happens map-side too via a pre-merge by input partition.
    ``n_col`` propagates summed per-row lineage counts instead of
    counting merged rows.
    """
    keys = list(keys)
    # treat each stored sketch row as a "partial" with synthetic lineage
    partials = _stored_rows_as_partials(df, sketch_col, keys, n_col)
    # map_side_combine pays off when many stored sketch rows per key share
    # a scan partition (see merge_partials; measured on hot keys in
    # tools/skew_bench.py) — keep it off for small reagg jobs
    return merge_partials(partials, keys, from_bytes,
                          map_side_combine=map_side_combine)


def merge_sketches_extract(
    df: DataFrame,
    sketch_col: str,
    keys: Sequence[str],
    extract,
    out_fields: Sequence[StructField],
    from_bytes: Callable[[bytes], object] = dd_from_bytes,
) -> DataFrame:
    """Merge stored sketches per key and apply ``extract(acc) ->
    dict[col, list]`` in the SAME Python stage — the reference's
    FINALFUNC-inside-the-aggregate shape (``ddsketch_percentile(sketch,
    q)``, ddsketch--1.0.0.sql:62-70): one shuffle + one Python stage
    instead of a merge stage followed by a scalar-UDF extraction stage
    (measured ~0.3s/query of stage overhead at sf0.1). ``extract``'s lists
    may have length > 1 (e.g. one row per quantile); key columns repeat."""
    keys = list(keys)
    partials = _stored_rows_as_partials(df, sketch_col, keys)
    out_schema = StructType(
        [f for f in df.schema.fields if f.name in keys] + list(out_fields))

    def merge_extract_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = None
        for b in pdf["sketch"]:
            s = from_bytes(bytes(b))
            acc = s if acc is None else acc.merge(s)
        cols = extract(acc)
        nrows = len(next(iter(cols.values())))
        row = {k: [pdf[k].iloc[0]] * nrows for k in keys}
        row.update(cols)
        return pd.DataFrame(row)

    if keys:
        return grouped_apply_sorted(partials, keys, merge_extract_fn,
                                    out_schema)
    return partials.groupBy(F.lit(0).alias("__g")).applyInPandas(
        merge_extract_fn, schema=out_schema)


def grouped_apply_sorted(df: DataFrame, keys: Sequence[str], fn,
                         schema: StructType, per_run: bool = True) -> DataFrame:
    """``groupBy(keys).applyInPandas(fn, schema)`` with O(Arrow batch)
    overhead instead of O(groups).

    FlatMapGroupsInPandas ships EVERY group as its own Arrow batch through
    the Python worker — ~0.15 ms per group, which dominates when there are
    many small groups (measured 12x slower than this shape at 100k keys).
    Here rows are hash-repartitioned and sorted by key, streamed in big
    Arrow batches, and ``fn`` is applied per contiguous key run, carrying
    a run that spans a batch boundary. Output is identical: same shuffle
    (groupBy's exec is also sort-based), same per-group fn, exact integer
    results.

    ``per_run=False`` hands ``fn`` the whole complete-runs SLICE of each
    batch instead of one call per key run — for fns that vectorize across
    runs (see native._assemble_dd_batch; ~8x again over per-run calls at
    1M keys).

    Runs on ``mapInArrow`` (not ``mapInPandas``): Spark's Arrow->pandas
    conversion turns a nullable int64 KEY column whose batch contains a
    NULL into float64, which (a) silently merges distinct keys >= 2^53
    (e.g. 60-bit h64 ids) into one run and (b) corrupts the key value the
    fn emits. Here each integral key column whose Arrow batch actually
    holds a null is converted with ``integer_object_nulls=True`` (exact
    Python ints + None); null-free batches keep the fast numpy int64
    path. Same float64-coercion class as the stage-1 value-column fix in
    :func:`sketch_partials`, applied to keys.
    """
    keys = list(keys)
    if not keys:
        return df.groupBy().applyInPandas(fn, schema)
    rep = df.repartition(*[F.col(k) for k in keys]) \
            .sortWithinPartitions(*keys)

    int_keys = [k for k in keys
                if df.schema[k].dataType.typeName()
                in ("long", "integer", "short", "byte")]

    def run(batches):
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema
        arrow_out = to_arrow_schema(schema)

        def to_pdf(ab: "pa.RecordBatch") -> pd.DataFrame:
            pdf = ab.to_pandas()
            for k in int_keys:
                col = ab.column(ab.schema.get_field_index(k))
                if col.null_count:
                    pdf[k] = col.to_pandas(integer_object_nulls=True)
            return pdf

        def emit(res: pd.DataFrame) -> "pa.RecordBatch":
            return pa.RecordBatch.from_pandas(res, schema=arrow_out,
                                              preserve_index=False)

        pending = None
        for ab in batches:
            if ab.num_rows == 0:
                continue
            pdf = to_pdf(ab)
            if pending is not None:
                pdf = pd.concat([pending, pdf], ignore_index=True)
                pending = None
            # boundary of the LAST (possibly incomplete) key run —
            # NULL-safe equality (NaN keys form groups too, like Spark's
            # groupBy); rows are key-sorted, so rows equal to the last key
            # are exactly the contiguous block at the end
            last = pdf[keys].iloc[-1]
            eq = np.ones(len(pdf), dtype=bool)
            for k in keys:
                lv = last[k]
                col = pdf[k]
                eq &= (col.isna() if pd.isna(lv) else (col == lv)).to_numpy(
                    dtype=bool, na_value=False)
            n_tail = int(eq[::-1].cumprod().sum())
            if n_tail == len(pdf):
                pending = pdf  # single run — may continue in next batch
                continue
            head = pdf.iloc[:-n_tail]
            pending = pdf.iloc[-n_tail:].reset_index(drop=True)
            if per_run:
                # rows are key-sorted: slice contiguous runs directly
                # (pandas groupby would also re-group, but its .groups
                # breaks on None keys in object columns — and slicing
                # skips the factorize pass entirely)
                kdf = head[keys]
                prev = kdf.shift()
                same = ((kdf == prev) | (kdf.isna() & prev.isna())) \
                    .all(axis=1).to_numpy()
                same[0] = False
                starts = np.flatnonzero(~same)
                bounds = np.append(starts, len(head))
                out = [fn(head.iloc[bounds[i]:bounds[i + 1]])
                       for i in range(len(starts))]
                res = pd.concat(out, ignore_index=True)
            else:
                res = fn(head)
            if len(res):
                yield emit(res)
        if pending is not None and len(pending):
            res = fn(pending)
            if len(res):
                yield emit(res)

    return rep.mapInArrow(run, schema)
