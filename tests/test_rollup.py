"""Hypertable-style rollup layer (operators/rollup.py): coarsening a
fine-grained sketch table and answering aligned range queries from the
stored partials must be BIT-IDENTICAL to direct builds at the target
grain — merge associativity driven through the real time dimension.
"""

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ddsketch_spark.operators.api import ddsketch as dd_api
from ddsketch_spark.operators.rollup import (
    build_sketch_table, range_percentile, rollup, time_bucket,
)

ALPHA, NB = 0.05, 1024
HOUR, DAY = 3600, 86400
T0 = dt.datetime(2024, 3, 1, tzinfo=dt.timezone.utc)


@pytest.fixture(scope="module")
def events(spark):
    rng = np.random.default_rng(7)
    n = 20_000
    secs = rng.integers(0, 10 * DAY, n)           # 10 days of events
    pdf = pd.DataFrame({
        "ts": pd.Timestamp(T0).tz_localize(None)
              + pd.to_timedelta(secs, unit="s"),
        "etype": rng.choice(["a", "b", "c"], n),
        "v": rng.lognormal(2.0, 1.0, n),
    })
    pdf.loc[::71, "v"] = None                     # NULL routing through
    return spark.createDataFrame(pdf).repartition(8), pdf


def by_key(df, keycols):
    return {tuple(r[k] for k in keycols): bytes(r["sketch"])
            for r in df.collect()}


def test_rollup_equals_direct_daily(events):
    df, _ = events
    hourly = build_sketch_table(df, "ts", "v", ALPHA, NB, HOUR,
                                keys=["etype"])
    daily = rollup(hourly, DAY, HOUR, keys=["etype"])
    direct = dd_api(
        df.select(time_bucket("ts", DAY).alias("bucket"), "etype", "v"),
        "v", ALPHA, NB, keys=["bucket", "etype"])
    got = by_key(daily, ["bucket", "etype"])
    want = by_key(direct, ["bucket", "etype"])
    assert got.keys() == want.keys() and len(got) >= 20
    assert all(got[k] == want[k] for k in want)   # canonical bytes


def test_rollup_chains(events):
    """hourly -> daily -> 2-day == hourly -> 2-day (rollups compose)."""
    df, _ = events
    hourly = build_sketch_table(df, "ts", "v", ALPHA, NB, HOUR,
                                keys=["etype"])
    via_daily = rollup(rollup(hourly, DAY, HOUR, keys=["etype"]),
                       2 * DAY, DAY, keys=["etype"])
    direct = rollup(hourly, 2 * DAY, HOUR, keys=["etype"])
    assert by_key(via_daily, ["bucket", "etype"]) == \
        by_key(direct, ["bucket", "etype"])


def test_range_equals_raw_range(events):
    df, _ = events
    hourly = build_sketch_table(df, "ts", "v", ALPHA, NB, HOUR,
                                keys=["etype"])
    t0, t1 = T0 + dt.timedelta(days=2), T0 + dt.timedelta(days=7)
    got = {(r["etype"], r["q"]): r["est"]
           for r in range_percentile(hourly, t0, t1, [0.5, 0.9], HOUR,
                                     keys=["etype"]).collect()}
    raw = df.where((F.col("ts") >= t0.replace(tzinfo=None))
                   & (F.col("ts") < t1.replace(tzinfo=None)))
    direct = dd_api(raw, "v", ALPHA, NB, keys=["etype"])
    from ddsketch_spark.core.ddsketch import from_bytes
    for r in direct.collect():
        s = from_bytes(bytes(r["sketch"]))
        for q, est in zip([0.5, 0.9], s.quantile([0.5, 0.9])):
            assert got[(r["etype"], q)] == pytest.approx(est, abs=0, rel=0)
    assert len(got) == 6


def test_validation_errors(events):
    df, _ = events
    hourly = build_sketch_table(df, "ts", "v", ALPHA, NB, HOUR)
    with pytest.raises(ValueError, match="multiple"):
        rollup(hourly, 5000, HOUR)                # not a multiple
    with pytest.raises(ValueError, match="aligned"):
        range_percentile(hourly, T0 + dt.timedelta(seconds=30),
                         T0 + dt.timedelta(days=1), [0.5], HOUR)
    with pytest.raises(ValueError, match="empty range"):
        range_percentile(hourly, T0 + dt.timedelta(days=1), T0, [0.5], HOUR)
    with pytest.raises(ValueError, match=">= 1"):
        time_bucket("ts", 0)


def test_streaming_maintained_table_feeds_rollup(spark, events, tmp_path):
    """The continuous-aggregate loop closed end to end: a watermarked
    streaming windowed aggregation maintains the hourly sketch table
    (windowed_sketches_as_table adapts its output to the table contract),
    and the result is BIT-IDENTICAL to the batch build over the same
    rows — so every rollup / range question works unchanged on a
    streaming-maintained table."""
    import time as _time

    from ddsketch_spark.operators.rollup import windowed_sketches_as_table
    from ddsketch_spark.streaming.sketch_stream import (
        assemble_window_sketches, windowed_bucket_counts,
    )

    df, _ = events
    first2d = df.where(
        F.col("ts") < (T0 + dt.timedelta(days=2)).replace(tzinfo=None))
    src, ckpt, out = (str(tmp_path / n) for n in ("src", "ckpt", "out"))
    first2d.coalesce(2).write.parquet(src)
    _time.sleep(1.1)
    # sentinel far past the data advances the watermark so every real
    # window finalizes in append mode
    sentinel = spark.createDataFrame(
        pd.DataFrame({"ts": [pd.Timestamp(T0).tz_localize(None)
                             + pd.Timedelta(days=30)],
                      "etype": ["a"], "v": [1.0]}))
    sentinel.coalesce(1).write.mode("append").parquet(src)

    stream = (spark.readStream.schema(first2d.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    cells = windowed_bucket_counts(stream, "ts", "v", "1 hour",
                                   "30 minutes", alpha=ALPHA,
                                   keys=["etype"])
    q = (cells.writeStream.outputMode("append")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .format("parquet").option("path", out).start())
    q.awaitTermination()

    assembled = assemble_window_sketches(
        spark.read.parquet(out), ALPHA, NB, keys=["etype"])
    streamed = windowed_sketches_as_table(assembled, keys=["etype"])
    sentinel_bucket = int((pd.Timestamp(T0).tz_localize(None)
                           + pd.Timedelta(days=30)).timestamp()) // HOUR * HOUR
    streamed = streamed.where(F.col("bucket") != sentinel_bucket)

    batch = build_sketch_table(first2d, "ts", "v", ALPHA, NB, HOUR,
                               keys=["etype"])
    got = by_key(streamed, ["bucket", "etype"])
    want = by_key(batch, ["bucket", "etype"])
    assert got.keys() == want.keys() and len(got) >= 50
    assert all(got[k] == want[k] for k in want)

    # and the adapted table answers rollup questions like any other
    daily = rollup(streamed, DAY, HOUR, keys=["etype"])
    ddirect = rollup(batch, DAY, HOUR, keys=["etype"])
    assert by_key(daily, ["bucket", "etype"]) == \
        by_key(ddirect, ["bucket", "etype"])


def test_partitioned_store_prunes_and_matches(spark, events, tmp_path):
    """store_sketch_table writes day-partitioned directories; a range
    query given the partition grain returns the identical answer AND its
    scan prunes to the in-range partitions only."""
    import re

    from ddsketch_spark.operators.rollup import (
        read_sketch_table, store_sketch_table)

    df, _ = events
    hourly = build_sketch_table(df, "ts", "v", ALPHA, NB, HOUR,
                                keys=["etype"])
    path = str(tmp_path / "stored")
    store_sketch_table(hourly, path, partition_granularity_seconds=DAY)
    stored = read_sketch_table(spark, path)
    assert "pbucket" in stored.columns

    t0, t1 = T0 + dt.timedelta(days=2), T0 + dt.timedelta(days=5)
    pruned = range_percentile(stored, t0, t1, [0.5, 0.9], HOUR,
                              keys=["etype"],
                              partition_granularity_seconds=DAY)
    plain = range_percentile(hourly, t0, t1, [0.5, 0.9], HOUR,
                             keys=["etype"])
    gp = {(r["etype"], r["q"]): r["est"] for r in pruned.collect()}
    gd = {(r["etype"], r["q"]): r["est"] for r in plain.collect()}
    assert gp == gd and len(gp) == 6

    plan = pruned._sc._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted")
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "pbucket" in m.group(1), plan[:2000]


def test_compact_without_lineage_n(spark, events):
    """compact_sketch_table must accept a sketch table WITHOUT the
    optional lineage n column, mirroring rollup()'s contract (r5
    ADVICE: it previously hard-selected 'n' and raised)."""
    from ddsketch_spark.operators.rollup import compact_sketch_table

    df, _ = events
    hourly = build_sketch_table(df, "ts", "v", ALPHA, NB, HOUR,
                                keys=["etype"]).drop("n")
    boundary = T0 + dt.timedelta(days=6)
    tiered = compact_sketch_table(hourly, boundary, HOUR, DAY,
                                  keys=["etype"])
    assert "n" not in tiered.columns
    assert set(r["gran"] for r in
               tiered.select("gran").distinct().collect()) == {HOUR, DAY}


def test_tiered_compaction_and_cross_boundary_range(spark, events):
    """Tiered retention: buckets older than the boundary roll to daily,
    recent stay hourly; a range query straddling the tier edge merges
    both grains and equals the direct sketch of the raw rows in range."""
    from ddsketch_spark.core.ddsketch import from_bytes
    from ddsketch_spark.operators.rollup import (
        compact_sketch_table, range_percentile_tiered)

    df, _ = events
    hourly = build_sketch_table(df, "ts", "v", ALPHA, NB, HOUR,
                                keys=["etype"])
    boundary = T0 + dt.timedelta(days=6)
    tiered = compact_sketch_table(hourly, boundary, HOUR, DAY,
                                  keys=["etype"])

    rows = tiered.groupBy("gran").count().collect()
    counts = {r["gran"]: r["count"] for r in rows}
    assert set(counts) == {HOUR, DAY}
    assert counts[DAY] <= 6 * 3 and counts[HOUR] >= 4 * 24  # 3 etypes

    # total mass preserved through compaction
    assert (tiered.agg(F.sum("n")).first()[0]
            == hourly.agg(F.sum("n")).first()[0])

    # range straddling the boundary: [day 3, day 8) = 3 coarse days +
    # 2 fine days of hourly rows
    t0, t1 = T0 + dt.timedelta(days=3), T0 + dt.timedelta(days=8)
    got = {(r["etype"], r["q"]): r["est"]
           for r in range_percentile_tiered(
               tiered, t0, t1, [0.5, 0.9], boundary, HOUR, DAY,
               keys=["etype"]).collect()}
    raw = df.where((F.col("ts") >= t0.replace(tzinfo=None))
                   & (F.col("ts") < t1.replace(tzinfo=None)))
    for r in dd_api(raw, "v", ALPHA, NB, keys=["etype"]).collect():
        s = from_bytes(bytes(r["sketch"]))
        for q, est in zip([0.5, 0.9], s.quantile([0.5, 0.9])):
            assert got[(r["etype"], q)] == est
    assert len(got) == 6


def test_tiered_validation(spark, events):
    from ddsketch_spark.operators.rollup import (
        compact_sketch_table, range_percentile_tiered)

    df, _ = events
    hourly = build_sketch_table(df, "ts", "v", ALPHA, NB, HOUR)
    with pytest.raises(ValueError, match="aligned to the coarse"):
        compact_sketch_table(hourly, T0 + dt.timedelta(hours=3), HOUR, DAY)
    boundary = T0 + dt.timedelta(days=6)
    tiered = compact_sketch_table(hourly, boundary, HOUR, DAY)
    # t0 in the coarse tier must be DAY-aligned: an hour-aligned edge
    # there would silently drop the straddled day's data
    with pytest.raises(ValueError, match="coarse tier"):
        range_percentile_tiered(
            tiered, T0 + dt.timedelta(days=2, hours=1),
            T0 + dt.timedelta(days=7), [0.5], boundary, HOUR, DAY)
    # hour-aligned t1 in the fine tier is fine
    out = range_percentile_tiered(
        tiered, T0 + dt.timedelta(days=2),
        T0 + dt.timedelta(days=7, hours=5), [0.5], boundary, HOUR, DAY)
    assert out.count() == 1


def test_collapse_mode_rollup(spark, events):
    """A collapse-mode sketch table (tiny bucket budget on wide-range
    data, partials may collapse a different number of times per bucket)
    must roll up via the level-reconciling merge when the SAME policy is
    passed — and the rolled-up estimates must match a direct collapse-
    mode build at the daily grain."""
    from ddsketch_spark.core.ddsketch import from_bytes
    from ddsketch_spark.operators.rollup import rollup as _rollup

    df, _ = events
    # widen the dynamic range so a 32-bucket budget actually collapses
    wide = df.withColumn(
        "v", F.when(F.col("v").isNotNull(),
                    F.pow(F.col("v") + 1.0, 5.0)).otherwise(F.lit(None)))
    hourly = build_sketch_table(wide, "ts", "v", 0.01, 32, HOUR,
                                keys=["etype"], on_overflow="collapse")
    daily = _rollup(hourly, DAY, HOUR, keys=["etype"],
                    on_overflow="collapse")
    direct = dd_api(
        wide.select(time_bucket("ts", DAY).alias("bucket"), "etype", "v"),
        "v", 0.01, 32, keys=["bucket", "etype"], on_overflow="collapse")
    got = {(r["bucket"], r["etype"]):
           from_bytes(bytes(r["sketch"]), "collapse") for r in daily.collect()}
    want = {(r["bucket"], r["etype"]):
            from_bytes(bytes(r["sketch"]), "collapse") for r in direct.collect()}
    assert got.keys() == want.keys() and len(got) >= 20
    for k in want:
        assert got[k].count == want[k].count
        # collapse order can differ between merge trees; the estimates
        # must agree within the (collapsed) alpha of the coarser side
        a = max(got[k].alpha, want[k].alpha)
        for qa, qb in zip(got[k].quantile([0.5, 0.9]),
                          want[k].quantile([0.5, 0.9])):
            assert abs(qa - qb) <= a * max(abs(qa), abs(qb)) * 2 + 1e-9


def test_rollup_generic_sketch_type_hll(spark, events):
    """A time rollup is just a keyed N-way merge, so it works for ANY
    mergeable sketch given its deserializer: an hourly per-type HLL
    distinct-user table rolled up to daily must carry the exact same
    registers as a direct daily build."""
    from ddsketch_spark.core import hll as hll_mod
    from ddsketch_spark.core.hashing import spark_h64
    from ddsketch_spark.operators.native import hll_agg_native
    from ddsketch_spark.operators.rollup import rollup as _rollup

    df, _ = events
    hashed = df.select(
        time_bucket("ts", HOUR).alias("bucket"), "etype",
        spark_h64(F.col("v").cast("string")).alias("__h"))
    hourly = hll_agg_native(hashed, "__h", p=10, keys=["bucket", "etype"])
    daily = _rollup(hourly, DAY, HOUR, keys=["etype"],
                    from_bytes=hll_mod.from_bytes)
    dhashed = hashed.withColumn(
        "bucket", F.col("bucket") - F.pmod(F.col("bucket"), F.lit(DAY)))
    direct = hll_agg_native(dhashed, "__h", p=10, keys=["bucket", "etype"])
    got = by_key(daily, ["bucket", "etype"])
    want = by_key(direct, ["bucket", "etype"])
    assert got.keys() == want.keys() and len(got) >= 20
    assert all(got[k] == want[k] for k in want)
