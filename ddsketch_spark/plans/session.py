"""SparkSession construction with scale-appropriate defaults.

Local testing runs on local[N]; the same settings are what we'd ship in
spark-defaults on a 1000-executor cluster: AQE on (runtime coalescing +
skew-join splitting), Arrow enabled for the pandas/Arrow UDF path, and a
bounded Arrow batch size so Python-side sketch accumulators see steady
memory.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "ddsketch_spark", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # pin UTC so time-bucketed queries (hour/window extraction) are
        # machine-independent and match naive-timestamp SQL oracles
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # results scale with SF (dedup_minhash_pairs collects ~190 MB of
        # candidate pairs at sf1.0, linear beyond); the 1g default would
        # abort either collect path at a few x that scale
        .config("spark.driver.maxResultSize",
                os.environ.get("SPARK_GRAFT_MAX_RESULT_SIZE", "4g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
