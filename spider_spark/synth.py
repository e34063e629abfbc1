"""Deterministic synthetic inputs (seed lists, hosts config, frontier).

Everything is generated distributed from ``spark.range`` with column
expressions — no driver-side data, so the same generator scales from the
10k unit fixtures to the 10^7-row bench stand-in for the 10^10-URL
target frontier (BASELINE.md).  Shapes follow FIXTURES.md: Zipf-ish host
skew with one hot host holding ~``hot_frac`` of rows (exercises the
salted repartition of SURVEY.md §4.3.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import simnet


def seed_list(
    spark: SparkSession,
    n_seeds: int,
    n_hosts: int,
    page_space: int,
    hot_frac: float = 0.0,
    hot_host: int = 0,
) -> DataFrame:
    """n_seeds URLs over n_hosts; row i -> deterministic (host, page)."""
    df = spark.range(n_seeds).withColumnRenamed("id", "i")
    mix = (F.col("i") * 2654435761) % 1000
    host_id = F.when(mix < int(hot_frac * 1000), F.lit(hot_host)).otherwise(
        (F.col("i") * 97 + 1) % n_hosts
    )
    page_id = (F.col("i") * 13 + (F.col("i") % 7)) % page_space
    return (
        df.select(
            F.concat(F.lit("http://h"), host_id, F.lit(".example/p"), page_id).alias("url"),
            F.lit(0).alias("priority"),
        )
        .dropDuplicates(["url"])
    )


def hosts_config(
    spark: SparkSession,
    n_hosts: int,
    uniform_delay: int | None = None,
    uniform_cap: int | None = None,
    with_robots: bool = True,
) -> DataFrame:
    """Politeness config per host (reference analog: hand-tuned thread
    counts/sleeps per source, zhixing_spider.py:264, china_unicom.py:27).

    Defaults: crawl_delay = h%3 rounds, max_concurrent cycles
    {5,10,20,50}, every 7th host disallows the /p13* prefix.
    """
    df = spark.range(n_hosts).withColumnRenamed("id", "h")
    delay = F.lit(uniform_delay) if uniform_delay is not None else (F.col("h") % 3)
    cap = (
        F.lit(uniform_cap)
        if uniform_cap is not None
        else F.element_at(F.array(F.lit(5), F.lit(10), F.lit(20), F.lit(50)), (F.col("h") % 4 + 1).cast("int"))
    )
    robots = (
        F.when((F.col("h") % 7) == 0, F.array(F.lit("/p13"))).otherwise(F.array().cast("array<string>"))
        if with_robots
        else F.array().cast("array<string>")
    )
    return df.select(
        F.concat(F.lit("h"), F.col("h"), F.lit(".example")).alias("host"),
        delay.cast("int").alias("crawl_delay"),
        cap.cast("int").alias("max_concurrent"),
        robots.alias("disallow_prefixes"),
    )


def interleaved_documents(
    spark: SparkSession, n_docs: int, n_hosts: int = 100, page_space: int = 10_000
) -> DataFrame:
    """Standalone interleaved text+media documents table (input_hint
    shape) — doc i is the simnet body of page (i % n_hosts, i // n_hosts)."""
    rows = []
    for i in range(n_docs):
        h, p = i % n_hosts, (i // n_hosts) % page_space
        rows.append(
            (
                f"doc:{simnet.url_of(h, p)}",
                simnet.spans_of(h, p, n_hosts, page_space),
                simnet.url_of(h, p),
                simnet.host_of(h),
                0,
            )
        )
    from .schemas import DOCUMENTS

    return spark.createDataFrame(rows, DOCUMENTS)
