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


def _frontier_90pct_one_host(spark, n=3000):
    """90%-one-host frontier (VERDICT r4 #4's stress shape)."""
    seeds = synth.seed_list(spark, n, n_hosts=40, page_space=1_000_000,
                            hot_frac=0.9, hot_host=0)
    return seeds.select(
        "url",
        F.xxhash64("url").alias("url_hash"),
        F.regexp_extract("url", r"^http://([^/]+)/", 1).alias("host"),
        "priority",
        F.lit(0).alias("depth"),
        F.lit("pending").alias("state"),
        F.lit(0).alias("retry_count"),
        F.lit(0).cast("long").alias("next_fetch_time"),
        F.lit(0).cast("long").alias("discovered_round"),
    )


def test_two_phase_rank_identical_results(spark):
    """frontier.dequeue(rank_salt=S) must return EXACTLY the rows of the
    single-window dequeue on a 90%-one-host frontier — the pre-rank is an
    optimization, never a semantic change (so refsim needs no mirror)."""
    from spider_spark.frontier import dequeue
    from spider_spark.politeness import eligible_hosts

    fr = _frontier_90pct_one_host(spark)
    hosts = synth.hosts_config(spark, 40, uniform_delay=0, uniform_cap=25)
    elig = eligible_hosts(hosts, None, 1)
    plain = {tuple(r) for r in dequeue(fr, elig, 1).collect()}
    salted = {tuple(r) for r in dequeue(fr, elig, 1, rank_salt=8).collect()}
    assert salted == plain
    assert len(plain) > 0


def test_two_phase_rank_stage_is_bounded(spark):
    """The exact-rank stage's input must be ≤ salt·cap rows for the hot
    host (phase 1 keeps ≤ cap per salt slice), and the plan must show the
    salted window BELOW the per-host window."""
    import re

    from spider_spark.frontier import ORDER_COLS, dequeue
    from spider_spark.politeness import eligible_hosts
    from pyspark.sql import Window

    salt, cap = 8, 25
    fr = _frontier_90pct_one_host(spark)
    hosts = synth.hosts_config(spark, 40, uniform_delay=0, uniform_cap=cap)
    elig = eligible_hosts(hosts, None, 1)

    # replicate phase 1 exactly and measure the survivor set per host
    cand = fr.filter(
        F.col("state").isin("pending", "retry") & (F.col("next_fetch_time") <= 1)
    ).join(elig, "host")
    wpre = Window.partitionBy("host", "_slice").orderBy(
        *[F.col(c).asc() for c in ORDER_COLS]
    )
    survivors = (
        cand.withColumn("_slice", F.pmod(F.xxhash64("url"), F.lit(salt)))
        .withColumn("_prk", F.row_number().over(wpre))
        .filter(F.col("_prk") <= F.col("max_concurrent"))
        .groupBy("host")
        .count()
        .collect()
    )
    hot_total = cand.filter(F.col("host") == "h0.example").count()
    by_host = {r["host"]: r["count"] for r in survivors}
    assert hot_total > 2000, "fixture not skewed enough"
    assert by_host["h0.example"] <= salt * cap, (
        f"exact-rank input not bounded: {by_host['h0.example']} > {salt * cap}"
    )

    # and the real dequeue plan runs the salted window first
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        dequeue(fr, elig, 1, rank_salt=salt).explain(mode="simple")
    plan = buf.getvalue()
    assert "_slice" in plan, "salted pre-rank window missing from the plan"
    assert len(re.findall(r"\bWindow\b", plan)) >= 2
    # the _slice window appears deeper in the tree (later in plan text)
    assert plan.rindex("_slice") > plan.index("windowspecdefinition"), plan
