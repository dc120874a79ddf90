"""SparkSession factory with the engine's default tuning.

Local mode stands in for the multi-executor cluster: partitioning and
shuffle settings are chosen as they would be on a 1000-executor cluster
(AQE on, skew-join on, Arrow on), so the same plan scales by changing
only `--master` / executor counts at spark-submit time.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dbpedia-spotlight-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_MASTER", "local[*]")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 32))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let AQE rewrite sort-merge to shuffled-hash when EVERY
        # post-shuffle partition is measured under this size (guide
        # §3.1): runtime-gated so it is scale-safe — per-task build
        # memory is bounded by the threshold and oversized inputs fall
        # back to sort-merge. Measured on the sf1.0 driver data: every
        # join-heavy gate improved or held (prior_disambiguation 2.3s ->
        # 1.1s, dedup_minhash band join, er paths); default 0 (off).
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("SPARK_SHJ_LOCALMAP_MAX", "64m"),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    if master:
        builder = builder.master(master)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
