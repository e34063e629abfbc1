"""Salted host-hash repartition kills hot-host skew (SURVEY.md §4.3.1):
with one host holding ~50% of the batch, no fetch partition may hold more
than ~(1/salt + slack) of that host's rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from spider_spark import synth
from spider_spark.fetch import salted_repartition


def test_hot_host_spreads_over_salt_partitions(spark):
    n = 4000
    seeds = synth.seed_list(spark, n, n_hosts=50, page_space=100_000, hot_frac=0.5)
    batch = seeds.select(
        "url",
        F.lit(0).cast("long").alias("url_hash"),
        F.regexp_extract("url", r"^http://([^/]+)/", 1).alias("host"),
        F.lit(0).alias("priority"),
        F.lit(0).alias("depth"),
        F.lit(0).alias("retry_count"),
        F.lit(0).cast("long").alias("discovered_round"),
    )
    hot = "h0.example"
    hot_n = batch.filter(F.col("host") == hot).count()
    assert hot_n > n * 0.4  # skew shape is real

    salted = salted_repartition(batch, num_partitions=16, salt=8)
    per_part = (
        salted.withColumn("pid", F.spark_partition_id())
        .filter(F.col("host") == hot)
        .groupBy("pid")
        .count()
        .collect()
    )
    n_parts = len(per_part)
    biggest = max(r["count"] for r in per_part)
    assert n_parts >= 6, f"hot host landed on only {n_parts} partitions"
    assert biggest < hot_n * 0.35, f"one partition still holds {biggest}/{hot_n} hot rows"
