"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query on /root/testdata/sf0.001.
queries()      — named operators from SURVEY.md §2 (Spark implementations).
oracle_sql()   — equivalent DuckDB SQL per query. The engine's sketch
                 results are deterministic functions of the data, so each
                 oracle mirrors the same algorithm in SQL and matches
                 bit-for-bit (see ddsketch_spark/oracles.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ddsketch_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship (north-rule shape): p50/p90/p99 of length(text) by lang
    over the web-document table via the JVM-native DDSketch aggregation
    (alpha=0.01, 2048 buckets)."""
    return QUERIES["dd_textlen_by_lang"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
