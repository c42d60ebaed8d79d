"""Named query catalog: each entry is a (Spark implementation, DuckDB oracle
SQL) pair over the driver testdata tables. The Spark side runs the real
2-stage sketch pipeline; the oracle mirrors the identical deterministic
algorithm in SQL (see :mod:`ddsketch_spark.oracles`), so results compare
bit-for-bit. Column aliases match on both sides by construction.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from ddsketch_spark import oracles
from ddsketch_spark.functions.sketch_udfs import (
    sketch_buckets, sketch_info, sketch_quantile, sketch_rank_of,
    sketch_trimmed,
)
from ddsketch_spark.operators import api
from ddsketch_spark.operators.aggregate import merge_sketches


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def quantile_rows(df: DataFrame, value_col: str, alpha: float, nbuckets: int,
                  qs, keys=(), weight_col=None) -> DataFrame:
    """keys..., q, est — one row per key per quantile."""
    keys = list(keys)
    built = api.ddsketch(df, value_col, alpha, nbuckets, keys, weight_col)
    qarr = F.array(*[F.lit(float(q)) for q in qs]).alias("q")
    earr = sketch_quantile(F.col("sketch"), list(qs)).alias("est")
    return (
        built.select(*keys, F.explode(F.arrays_zip(qarr, earr)).alias("z"))
        .select(*keys, F.col("z.q").alias("q"), F.col("z.est").alias("est"))
    )


# --------------------------------------------------------------------------
# query catalog — DDSketch family
# --------------------------------------------------------------------------

def dd_quantiles_price_global(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem")
    return quantile_rows(df, "l_extendedprice", 0.05, 1024, [0.5, 0.95, 0.99])


def dd_quantiles_price_by_flag(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem")
    return quantile_rows(df, "l_extendedprice", 0.01, 2048, [0.5, 0.9, 0.99],
                         keys=["l_returnflag"])


def dd_p50_weighted_price(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem").withColumn(
        "w", F.col("l_quantity").cast("long"))
    return quantile_rows(df, "l_extendedprice", 0.05, 1024, [0.5],
                         weight_col="w")


def dd_rank_price_50k(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem")
    return api.ddsketch_percentile_of(df, "l_extendedprice", 0.05, 1024,
                                      50000.0, alias="rank")


def dd_buckets_price(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem")
    built = api.ddsketch(df, "l_extendedprice", 0.05, 1024)
    return (
        built.select(F.explode(sketch_buckets(F.col("sketch"))).alias("b"))
        .select(
            F.when(F.col("b.lower") < 0, F.lit(-1)).otherwise(F.lit(1))
             .cast("long").alias("sign"),
            F.col("b.bucket_index").cast("long").alias("bucket_index"),
            F.col("b.count").alias("cnt"),
        )
    )


def dd_info_price(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem")
    built = api.ddsketch(df, "l_extendedprice", 0.05, 1024)
    return built.select(sketch_info(F.col("sketch")).alias("i")).select(
        F.col("i.count").alias("cnt"),
        F.col("i.zero_count").alias("zero_cnt"),
        F.col("i.negative_buckets").cast("long").alias("neg_buckets"),
        F.col("i.positive_buckets").cast("long").alias("pos_buckets"),
    )


def dd_trimmed_avg_price(spark, sf_dir):
    # rounded to 4 decimals on both sides: the oracle's fsum is Kahan
    # (compensated, not exactly-rounded), so the raw doubles can differ
    # by 1 ulp from the kernel's exact math.fsum
    df = _t(spark, sf_dir, "lineitem")
    out = api.ddsketch_avg(df, "l_extendedprice", 0.05, 1024, 0.25, 0.75,
                           alias="raw")
    return out.select(F.round(F.col("raw"), 4).alias("val"))


def dd_trimmed_sum_price(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem")
    out = api.ddsketch_sum(df, "l_extendedprice", 0.05, 1024, 0.05, 0.95,
                           alias="raw")
    return out.select(F.round(F.col("raw"), 4).alias("val"))


def dd_reagg_p90_by_flag(spark, sf_dir):
    """Lifecycle B (README.md:121-124): pre-aggregate sketches at a finer
    grouping, then merge up and extract — must equal the direct build."""
    df = _t(spark, sf_dir, "lineitem")
    fine = api.ddsketch(df, "l_extendedprice", 0.01, 2048,
                        keys=["l_returnflag", "l_linestatus"])
    merged = merge_sketches(fine, "sketch", keys=["l_returnflag"])
    qarr = F.array(F.lit(0.9)).alias("q")
    earr = sketch_quantile(F.col("sketch"), [0.9]).alias("est")
    return (
        merged.select("l_returnflag", F.explode(F.arrays_zip(qarr, earr)).alias("z"))
        .select("l_returnflag", F.col("z.q").alias("q"), F.col("z.est").alias("est"))
    )


def dd_quantiles_events_by_type(spark, sf_dir):
    df = _t(spark, sf_dir, "events")
    return quantile_rows(df, "value", 0.01, 2048, [0.5, 0.9],
                         keys=["event_type"])


QUERIES: dict[str, Callable] = {
    "dd_quantiles_price_global": dd_quantiles_price_global,
    "dd_quantiles_price_by_flag": dd_quantiles_price_by_flag,
    "dd_p50_weighted_price": dd_p50_weighted_price,
    "dd_rank_price_50k": dd_rank_price_50k,
    "dd_buckets_price": dd_buckets_price,
    "dd_info_price": dd_info_price,
    "dd_trimmed_avg_price": dd_trimmed_avg_price,
    "dd_trimmed_sum_price": dd_trimmed_sum_price,
    "dd_reagg_p90_by_flag": dd_reagg_p90_by_flag,
    "dd_quantiles_events_by_type": dd_quantiles_events_by_type,
}

ORACLES: dict[str, str] = {
    "dd_quantiles_price_global": oracles.percentile_sql(
        "lineitem", "l_extendedprice", 0.05, [0.5, 0.95, 0.99]),
    "dd_quantiles_price_by_flag": oracles.percentile_sql(
        "lineitem", "l_extendedprice", 0.01, [0.5, 0.9, 0.99],
        keys=["l_returnflag"]),
    "dd_p50_weighted_price": oracles.percentile_sql(
        "lineitem", "l_extendedprice", 0.05, [0.5],
        weight_expr="CAST(l_quantity AS BIGINT)"),
    "dd_rank_price_50k": oracles.rank_of_sql(
        "lineitem", "l_extendedprice", 0.05, 50000.0),
    "dd_buckets_price": oracles.buckets_sql(
        "lineitem", "l_extendedprice", 0.05),
    "dd_info_price": oracles.info_sql("lineitem", "l_extendedprice", 0.05),
    "dd_trimmed_avg_price": "SELECT round(val, 4) AS val FROM (" + oracles.trimmed_sql(
        "lineitem", "l_extendedprice", 0.05, 0.25, 0.75, "avg") + ")",
    "dd_trimmed_sum_price": "SELECT round(val, 4) AS val FROM (" + oracles.trimmed_sql(
        "lineitem", "l_extendedprice", 0.05, 0.05, 0.95, "sum") + ")",
    "dd_reagg_p90_by_flag": oracles.percentile_sql(
        "lineitem", "l_extendedprice", 0.01, [0.9], keys=["l_returnflag"]),
    "dd_quantiles_events_by_type": oracles.percentile_sql(
        "events", "value", 0.01, [0.5, 0.9], keys=["event_type"]),
}
