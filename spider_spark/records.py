"""Reference record shapes: key-convert projections into the exact
column sets of the reference's MySQL DDL (SURVEY.md §1.3, §2.9).

The reference declares each record type twice — DDL under
flask_spider/spider/addtional/t_table/*.sql and rename dicts under each
spider's configuration/columns.py — and projects scraped JSON through
the rename dict row-by-row.  Here the same key-convert maps become one
``select`` with aliases (Catalyst column pruning + codegen), missing
fields become ``coalesce(col, '')`` (db_config.py:29-33), flag/enum
derivations become ``when/otherwise`` chains, and the date-time split
becomes JVM date functions.

These are the parse-output tables a user of the reference would
materialize; goldens in tests mirror flask_spider/operator_result_temp.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# rename maps: source JSON key -> output column
# (shixin_spider/configuration/columns.py:8-26)
SHIXIN_KEY_CONVERT = {
    "id": "sys_id",
    "iname": "name",
    "age": "age",
    "sexy": "sex",
    "cardNum": "card_num",
    "businessEntity": "business_entity",
    "areaName": "area_name",
    "caseCode": "case_code",
    "regDate": "reg_date",
    "publishDate": "publish_date",
    "gistId": "gist_id",
    "courtName": "court_name",
    "gistUnit": "gist_unit",
    "duty": "duty",
    "performance": "performance",
    "disruptTypeName": "disrupt_type_name",
    "partyTypeName": "party_type_name",
}

# (zhixing_spider/configuration/columns.py:9-17)
ZHIXING_KEY_CONVERT = {
    "id": "sys_id",
    "pname": "name",
    "cardNum": "card_num",
    "caseCode": "case_code",
    "caseCreateTime": "reg_date",
    "execCourtName": "court_name",
    "execMoney": "execute_money",
}

# (china_unicom/configuration/columns.py:9-40 — call-record subset)
OPERATOR_CALL_KEY_CONVERT = {
    "calldate": "call_date_raw",
    "callarea": "call_area",
    "callcost": "call_cost",
    "calllong": "call_long",
    "othernum": "other_phone",
    "calltypeName": "call_type_name",
    "landtypeName": "land_type_name",
}


def key_convert(df: DataFrame, mapping: dict[str, str], fill_missing: str = "") -> DataFrame:
    """P1+P3: rename-map projection, absent source columns -> fill value
    (the IntegrityError-era ''-fill of db_config.py:29-33)."""
    cols = []
    for src, dst in mapping.items():
        if src in df.columns:
            cols.append(F.coalesce(F.col(src).cast("string"), F.lit(fill_missing)).alias(dst))
        else:
            cols.append(F.lit(fill_missing).alias(dst))
    return df.select(*cols)


def shixin_flag_col(business_entity: Column) -> Column:
    """P2: flag = 1 if the record carries a businessEntity (company) else 0
    (shixin_spider.py:179)."""
    return (
        F.when(business_entity.isNotNull() & (business_entity != ""), 1).otherwise(0).alias("flag")
    )


def call_type_col(name: Column) -> Column:
    """P4: 主叫->1, 被叫->2, else 3 (china_unicom.py:318-326)."""
    return F.when(name == "主叫", 1).when(name == "被叫", 2).otherwise(3)


def land_type_col(name: Column) -> Column:
    """P4: 本地通话->1, 省内通话->2, else 3 (china_unicom.py:327-334)."""
    return F.when(name == "本地通话", 1).when(name == "省内通话", 2).otherwise(3)


def split_call_datetime(raw: Column, year: str = "2016") -> tuple[Column, Column]:
    """P5: '04-01 11:18:50' -> (call_date '2016-04-01', call_time)
    (china_mobile_gd.py:293-297; parse_json.py:24-28)."""
    date = F.to_date(F.concat(F.lit(year + "-"), F.split(raw, " ").getItem(0)))
    time = F.split(raw, " ").getItem(1)
    return date.alias("call_date"), time.alias("call_time")


def parse_shixin(df: DataFrame) -> DataFrame:
    """Raw shixin detail JSON rows -> t_shixin_valid shape
    (t_shixin.sql:5-35): all-string columns + sys_id bigint + flag int."""
    out = key_convert(df, SHIXIN_KEY_CONVERT)
    return out.select(
        F.col("sys_id").cast("bigint").alias("sys_id"),
        *[c for c in out.columns if c != "sys_id"],
    ).withColumn("flag", shixin_flag_col(F.col("business_entity")))


def parse_zhixing(df: DataFrame) -> DataFrame:
    """-> t_zhixing_valid shape (t_zhixing.sql:5-20)."""
    out = key_convert(df, ZHIXING_KEY_CONVERT)
    return out.select(
        F.col("sys_id").cast("bigint").alias("sys_id"),
        *[c for c in out.columns if c != "sys_id"],
    )


def parse_operator_calls(df: DataFrame, cert_num: str, phone: str) -> DataFrame:
    """Raw call-detail JSON rows -> t_operator_call shape
    (t_operator.sql:34-56), J1-enriched with the session identity
    (china_unicom.py:295-313: every row stamped with cert_num/phone)."""
    out = key_convert(df, OPERATOR_CALL_KEY_CONVERT)
    call_date, call_time = split_call_datetime(F.col("call_date_raw"))
    return out.select(
        F.lit(cert_num).alias("cert_num"),
        F.lit(phone).alias("phone"),
        "call_area",
        call_date,
        call_time,
        "call_cost",
        "call_long",
        "other_phone",
        call_type_col(F.col("call_type_name")).alias("call_type"),
        land_type_col(F.col("land_type_name")).alias("land_type"),
    ).dropDuplicates(["phone", "call_date", "call_time", "other_phone"])
    # unique key (phone, call_date, call_time, other_phone) = t_operator.sql:53


def validate_rows(
    df: DataFrame,
    rules: dict[str, Column],
    required_cols: tuple[str, ...] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """P12 param validation (checkAttr key-set equality
    china_unicom.py:357-362; err 4400 route).

    Key-set equality is a PLAN-time assert — a DataFrame's schema is the
    param dict, so a wrong key set fails before any data moves.  Row
    preconditions are a vectorized when-chain tagging each row with the
    FIRST failed rule; returns (valid, violations) so bad rows route to
    the error sink instead of dying in a task (codegen'd, no UDF)."""
    if required_cols is not None and set(df.columns) != set(required_cols):
        raise ValueError(
            f"param key-set mismatch: got {sorted(df.columns)}, "
            f"want {sorted(required_cols)} (err 4400 analog)"
        )
    reason = F.lit(None).cast("string")
    for name, cond in reversed(list(rules.items())):
        reason = F.when(~F.coalesce(cond, F.lit(False)), F.lit(name)).otherwise(reason)
    tagged = df.withColumn("violation", reason)
    return (
        tagged.filter(F.col("violation").isNull()).drop("violation"),
        tagged.filter(F.col("violation").isNotNull()),
    )
