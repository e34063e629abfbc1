"""Catalog part 3: remaining §2 scalar/predicate surface, multi-table
join shapes, grouping-set aggregates, and embedding statistics — all
with DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .catalog import _t, q


@q(
    "f5_rlike_match",
    """SELECT source, COUNT(*) AS n FROM documents
       WHERE regexp_matches(text, 'spark \\w+ join') GROUP BY source""",
)
def f5_rlike_match(spark, sf_dir):
    """F5 regex match predicate (judgeByMatch china_mobile_gd.py:66-74)."""
    return (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").rlike(r"spark \w+ join"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@q(
    "u3_union_all",
    """SELECT nationkey, COUNT(*) AS n FROM (
         SELECT c_nationkey AS nationkey FROM customer
         UNION ALL SELECT s_nationkey FROM supplier)
       GROUP BY nationkey""",
)
def u3_union_all(spark, sf_dir):
    """U3 concat without dedup (id_seq.extend shixin_search.py:145,179)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionAll(s).groupBy("nationkey").agg(F.count(F.lit(1)).alias("n"))


@q(
    "a7_throughput_by_day",
    """SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n,
              ROUND(SUM(value), 2) AS total_value
       FROM events GROUP BY 1""",
)
def a7_throughput_by_day(spark, sf_dir):
    """A7 throughput accounting (wall-clock per group shixin_spider.py:327-341)
    -> per-day event counts, the lineage-rate shape."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )


@q(
    "q3_top_orders",
    """SELECT o.o_orderkey, ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
       FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       WHERE c.c_mktsegment = 'BUILDING'
       GROUP BY o.o_orderkey ORDER BY revenue DESC, o.o_orderkey LIMIT 10""",
)
def q3_top_orders(spark, sf_dir):
    """TPC-H-Q3 shape: 3-way join + top-k — the engine's 'heavy report'
    path (broadcast dim + shuffled fact join + TakeOrdered)."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@q(
    "q5_nation_revenue",
    """SELECT n.n_name, ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
       FROM lineitem l
       JOIN supplier s ON l.l_suppkey = s.s_suppkey
       JOIN nation n ON s.s_nationkey = n.n_nationkey
       JOIN region r ON n.n_regionkey = r.r_regionkey
       WHERE r.r_name = 'ASIA'
       GROUP BY n.n_name""",
)
def q5_nation_revenue(spark, sf_dir):
    """TPC-H-Q5 shape: snowflake join through two broadcastable dims.
    Filters on 'ASIA' — a region name present at every SF (round 3
    filtered a nonexistent name and passed vacuously on 0 == 0 rows)."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@q(
    "a8_pivot_status",
    """SELECT c.c_mktsegment,
              COUNT(CASE WHEN o.o_orderstatus = 'F' THEN 1 END) AS n_f,
              COUNT(CASE WHEN o.o_orderstatus = 'O' THEN 1 END) AS n_o,
              COUNT(CASE WHEN o.o_orderstatus = 'P' THEN 1 END) AS n_p
       FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       GROUP BY c.c_mktsegment""",
)
def a8_pivot_status(spark, sf_dir):
    """Pivot as conditional aggregation (dropdown cross-tabs,
    check_spider.py report pages)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    j = o.join(c, o.o_custkey == c.c_custkey)
    return j.groupBy("c_mktsegment").agg(
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_f"),
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_o"),
        F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("n_p"),
    )


@q(
    "a9_rollup",
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
       FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""",
)
def a9_rollup(spark, sf_dir):
    """Grouping sets: ROLLUP over status×priority (subtotal rows)."""
    return (
        _t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@q(
    "w8_lag_delta",
    """SELECT user_id, event_id,
              ROUND(value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2)
                AS delta
       FROM events""",
)
def w8_lag_delta(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.round(F.col("value") - F.lag("value").over(w), 2).alias("delta"),
    )


@q(
    "f19_sorted_array_agg",
    """SELECT user_id,
              array_to_string(list_transform(list_sort(list(ROUND(value, 2))),
                                             x -> printf('%.2f', x)), ',') AS values_csv
       FROM events GROUP BY user_id""",
)
def f19_sorted_array_agg(spark, sf_dir):
    """Array aggregation with deterministic order (collect_list is
    unordered; array_sort pins it — same trick the engine uses to build
    MinHash signatures).  The sorted array is flattened to a fixed-format
    CSV string: the driver's pandas canonicalizer sorts result cells and
    cannot hash top-level array cells (round-3 TypeError), so graded
    entries emit scalars only."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.round("value", 2))),
                    lambda v: F.format_string("%.2f", v),
                ),
                ",",
            ).alias("values_csv")
        )
    )


@q(
    "s4_embedding_norms",
    """SELECT label, ROUND(AVG(sqrt(list_dot_product(embedding, embedding))), 4) AS avg_norm,
              COUNT(*) AS n
       FROM embeddings GROUP BY label""",
)
def s4_embedding_norms(spark, sf_dir):
    """Vector column statistics, JVM aggregate over array<float>."""
    from .functions.similarity import norm_col

    return (
        _t(spark, sf_dir, "embeddings")
        .groupBy("label")
        .agg(
            F.round(F.avg(norm_col(F.col("embedding"))), 4).alias("avg_norm"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@q(
    "f11_url_format",
    """SELECT 'http://h' || CAST(user_id % 50 AS VARCHAR) || '.example/p' ||
              CAST(event_id % 1000 AS VARCHAR) AS url, COUNT(*) AS n
       FROM events GROUP BY 1""",
)
def f11_url_format(spark, sf_dir):
    """F11 URL format/concat (url_of synth shape; the reference's string
    URL building phone_book.py:95, shixin_spider.py:166) as a catalog
    entry: pure codegen concat, grouped to keep the result compact."""
    ev = _t(spark, sf_dir, "events")
    url = F.concat(
        F.lit("http://h"), (F.col("user_id") % 50).cast("string"),
        F.lit(".example/p"), (F.col("event_id") % 1000).cast("string"),
    )
    return ev.groupBy(url.alias("url")).agg(F.count(F.lit(1)).alias("n"))
