"""robots.txt fetch→parse→cache cycle (north-star "robots.txt cache").

The reference has no robots handling (its sources are API endpoints);
the north rule requires it.  Shape: a config-refresh job like
proxies.py — robots bodies for the active hosts arrive as a SMALL
DataFrame (one row per host, fetched by the same fetch layer), are
parsed in one mapInPandas pass, and MERGE into the ``hosts`` politeness
table that every round broadcasts.  The crawl path itself never parses
robots — it reads the cached table (politeness.robots_allowed /
eligible_hosts).

Parser subset (documented): User-agent groups (consecutive UA lines
share a group), Disallow path prefixes (empty = allow all), Crawl-delay
(seconds → whole rounds, ceil), comments (#) stripped, case-insensitive
directives.  A group matching the specific agent name beats the ``*``
group; Allow precedence and path wildcards are out of scope.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def parse_robots_txt(text: str, agent: str = "*") -> dict:
    """One robots.txt body -> {"disallow": [prefixes], "crawl_delay": int|None}
    for the given agent (specific group wins over '*')."""
    groups: list[dict] = []
    cur: dict | None = None
    last_was_ua = False
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if cur is None or not last_was_ua:
                cur = {"agents": [], "disallow": [], "crawl_delay": None}
                groups.append(cur)
            cur["agents"].append(val.lower())
            last_was_ua = True
        elif cur is not None:
            last_was_ua = False
            if key == "disallow" and val:
                cur["disallow"].append(val)
            elif key == "crawl-delay":
                try:
                    cur["crawl_delay"] = int(math.ceil(float(val)))
                except ValueError:
                    pass

    def pick(name: str) -> dict | None:
        for g in groups:
            if name in g["agents"]:
                return g
        return None

    g = pick(agent.lower()) or pick("*")
    if g is None:
        return {"disallow": [], "crawl_delay": None}
    return {"disallow": list(g["disallow"]), "crawl_delay": g["crawl_delay"]}


def hosts_from_robots(
    robots: DataFrame,
    agent: str = "*",
    default_delay: int = 1,
    default_cap: int = 10,
    host_col: str = "host",
    body_col: str = "robots_txt",
) -> DataFrame:
    """(host, robots_txt) -> politeness rows (host, crawl_delay,
    max_concurrent, disallow_prefixes) ready to MERGE into the hosts
    table.  One mapInPandas pass; the input is config-sized (one row per
    active host), so this is a refresh job, not a data pipeline."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse_robots_txt(t, agent) for t in pdf[body_col]]
            yield pd.DataFrame(
                {
                    "host": pdf[host_col],
                    "crawl_delay": [
                        p["crawl_delay"] if p["crawl_delay"] is not None else default_delay
                        for p in parsed
                    ],
                    "max_concurrent": [default_cap] * len(parsed),
                    "disallow_prefixes": [p["disallow"] for p in parsed],
                }
            )

    return robots.select(host_col, body_col).mapInPandas(
        fn,
        "host string, crawl_delay int, max_concurrent int, disallow_prefixes array<string>",
    )


def sitemap_seeds(
    sitemaps: DataFrame,
    xml_col: str = "sitemap_xml",
    default_priority: int = 5,
) -> DataFrame:
    """sitemap.xml -> (url, priority) seed rows for Crawler.enqueue_seeds
    (the standards-based bulk-discovery channel next to the robots cache;
    the reference has no analog — it restarts on a hand-edited ID list,
    shixin_spider.py:299-312).

    All-JVM: one regexp pass splits <url> blocks, a transform extracts
    <loc> and the optional <priority>.  The sitemap float priority
    (1.0 = most important) maps onto the frontier's ascending integer
    rank as round(10 * (1 - p)); absent -> ``default_priority`` (the
    protocol's 0.5 default).  Malformed blocks (no <loc>) are dropped,
    not errors — a crawl must survive junk sitemaps."""
    from pyspark.sql import functions as F

    # (?s): real-world sitemaps are pretty-printed, so a <url> block spans
    # lines — without DOTALL the extract silently yields zero seeds
    blocks = F.expr(
        f"regexp_extract_all({xml_col}, '(?s)<url>(.*?)</url>', 1)"
    )
    parsed = F.transform(
        blocks,
        lambda b: F.struct(
            F.trim(F.regexp_extract(b, "<loc>\\s*([^<]+?)\\s*</loc>", 1)).alias("url"),
            F.regexp_extract(b, "<priority>([^<]+)</priority>", 1).alias("p"),
        ),
    )
    out = sitemaps.select(F.explode(parsed).alias("e")).select(
        F.col("e.url").alias("url"),
        # coalesce: a non-numeric <priority> casts to null double, and a
        # null priority row would dequeue NULLS-FIRST and break the
        # integer-priority parity contract with refsim — malformed values
        # fall back to the protocol default instead
        F.coalesce(
            F.when(F.col("e.p") == "", F.lit(default_priority))
            .otherwise(F.round(10 * (1 - F.col("e.p").cast("double"))))
            .cast("int"),
            F.lit(default_priority),
        ).alias("priority"),
    )
    return out.filter(F.col("url") != "")


def sitemap_index_urls(sitemaps: DataFrame, xml_col: str = "sitemap_xml") -> DataFrame:
    """<sitemapindex> -> child sitemap URLs: the two-level form large
    sites publish (an index lists up-to-50k child sitemaps; the children
    hold the <url> entries).  Discovery is therefore ONE extra fetch hop:
    expand the index, fetch the children, feed each child's XML to
    ``sitemap_seeds``.  The protocol forbids nesting indexes inside
    indexes, so a single expansion round completes — no recursion, no
    fixpoint.

    All-JVM, same (?s) DOTALL discipline as sitemap_seeds (pretty-printed
    XML spans lines).  A plain <urlset> document contains no <sitemap>
    blocks, so it naturally yields zero rows here — callers can route
    mixed batches through both parsers without sniffing the root tag."""
    from pyspark.sql import functions as F

    blocks = F.expr(
        f"regexp_extract_all({xml_col}, '(?s)<sitemap>(.*?)</sitemap>', 1)"
    )
    urls = F.transform(
        blocks,
        lambda b: F.trim(F.regexp_extract(b, "<loc>\\s*([^<]+?)\\s*</loc>", 1)),
    )
    out = sitemaps.select(F.explode(urls).alias("url"))
    return out.filter(F.col("url") != "")
