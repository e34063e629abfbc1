"""SparkSession factory tuned for the crawl engine.

Local-mode settings mirror what we would set on a real cluster: AQE on
(runtime skew-join + partition coalescing), Arrow on (all Python UDFs are
vectorized), shuffle partitions sized to cores (not the 200 default),
UTC session timezone so results compare bit-for-bit with the DuckDB
oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "spider_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPIDER_SPARK_MASTER", "local[4]")
    if shuffle_partitions is None:
        # match parallelism: local[N] -> N, local[*] -> cpu count
        inner = master[master.find("[") + 1 : master.find("]")] if "[" in master else "4"
        n = os.cpu_count() if inner == "*" else int(inner)
        shuffle_partitions = max(4, int(n))
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPIDER_SPARK_DRIVER_MEM", "8g"))
        # classic (non-ANSI) eval: permissive casts like the reference's
        # string-everything row model (SURVEY.md §1.4) and DuckDB's try-ish
        # behavior on the oracle side.
        .config("spark.sql.ansi.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
