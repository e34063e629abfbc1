from __future__ import annotations

import pytest

from spider_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="spider_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


def hosts_df_to_dict(hosts_df) -> dict[str, dict]:
    return {
        r["host"]: {
            "crawl_delay": r["crawl_delay"],
            "max_concurrent": r["max_concurrent"],
            "disallow_prefixes": list(r["disallow_prefixes"] or []),
        }
        for r in hosts_df.collect()
    }
