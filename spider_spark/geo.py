"""Geo-attribution enrichment (S16): phone → {province, city, company}.

Reference: get_phone_attr.py:28-64 calls the Baidu phone-lookup API once
PER PHONE and recodes the carrier name through _company_convert
(联通 1, 移动 2, 电信 3, other 4).

Spark shape: number attribution is a static prefix table (a phone's
first digits identify province/city/carrier), so the per-row HTTP call
becomes a BROADCAST dim join on the phone prefix — the dim is
config-sized and ships once per job; the recode is a when-chain.  At
100 TB of call records this is the difference between an enrichment
that runs inside whole-stage codegen and one blocked on a rate-limited
API.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# get_phone_attr.py:22-26
COMPANY_CONVERT = {"中国联通": 1, "中国移动": 2, "中国电信": 3}
COMPANY_OTHER = 4


def company_code_col(name: Column) -> Column:
    """Carrier name → code (_company_convert; unknown → 4)."""
    out = None
    for k, v in COMPANY_CONVERT.items():
        out = F.when(name == k, v) if out is None else out.when(name == k, v)
    return out.otherwise(COMPANY_OTHER)


def phone_attribution(
    df: DataFrame,
    attr_dim: DataFrame,
    phone_col: str = "phone",
    prefix_len: int = 7,
    prefix_col: str = "prefix",
    province_col: str = "province",
    city_col: str = "city",
    company_name_col: str = "company_name",
) -> DataFrame:
    """Enrich rows with (province, city, company) via a broadcast prefix
    join; unmatched phones get NULL province/city and company 4, the
    reference's err-4500 row shape."""
    pref = F.substring(F.col(phone_col).cast("string"), 1, prefix_len)
    dim = attr_dim.select(
        F.col(prefix_col).alias("_pref"),
        F.col(province_col).alias("province"),
        F.col(city_col).alias("city"),
        company_code_col(F.col(company_name_col)).alias("company"),
    )
    joined = df.withColumn("_pref", pref).join(F.broadcast(dim), "_pref", "left")
    return joined.drop("_pref").withColumn(
        "company", F.coalesce(F.col("company"), F.lit(COMPANY_OTHER))
    )
