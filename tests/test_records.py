"""Golden tests for the reference record parsers (SURVEY.md §5: the
reference ships a full expected-result fixture for the operator crawl,
flask_spider/operator_result_temp.py:7-46 — these goldens mirror that
style on synthetic raw rows)."""

from __future__ import annotations


def test_shixin_key_convert_and_flag(spark):
    from spider_spark.records import parse_shixin

    raw = spark.createDataFrame(
        [
            {"id": 101, "iname": "某公司", "businessEntity": "张三", "cardNum": "9144...X",
             "areaName": "贵州", "caseCode": "（2016）执1号", "duty": "还款"},
            {"id": 102, "iname": "李四", "cardNum": "5201...1", "areaName": "贵州",
             "businessEntity": None},
        ]
    )
    rows = {r["sys_id"]: r for r in parse_shixin(raw).collect()}
    assert rows[101]["flag"] == 1 and rows[101]["name"] == "某公司"
    assert rows[102]["flag"] == 0 and rows[102]["card_num"] == "5201...1"
    # missing keys fill with '' (db_config.py:29-33)
    assert rows[102]["performance"] == "" and rows[101]["gist_id"] == ""
    cols = parse_shixin(raw).columns
    for c in ["sys_id", "name", "age", "sex", "card_num", "business_entity", "area_name",
              "case_code", "reg_date", "publish_date", "gist_id", "court_name", "gist_unit",
              "duty", "performance", "disrupt_type_name", "party_type_name", "flag"]:
        assert c in cols, f"t_shixin_valid column {c} missing"


def test_operator_calls_golden(spark):
    """Golden rows in the shape of operator_result_temp.py: enum recodes,
    date split, session enrichment, unique-key dedup."""
    from spider_spark.records import parse_operator_calls

    raw = spark.createDataFrame(
        [
            {"calldate": "04-01 11:18:50", "callarea": "贵阳", "callcost": "0.30",
             "calllong": "1分30秒", "othernum": "18500000001", "calltypeName": "主叫",
             "landtypeName": "本地通话"},
            {"calldate": "04-02 09:00:00", "callarea": "遵义", "callcost": "0.00",
             "calllong": "45秒", "othernum": "18500000002", "calltypeName": "被叫",
             "landtypeName": "省内通话"},
            # exact duplicate (unique key) must be dropped
            {"calldate": "04-02 09:00:00", "callarea": "遵义", "callcost": "0.00",
             "calllong": "45秒", "othernum": "18500000002", "calltypeName": "被叫",
             "landtypeName": "省内通话"},
            {"calldate": "04-03 20:05:01", "callarea": "国际", "callcost": "1.20",
             "calllong": "10分", "othernum": "0012025550001", "calltypeName": "呼转",
             "landtypeName": "国际长途"},
        ]
    )
    out = parse_operator_calls(raw, cert_num="520103X", phone="18600000000")
    rows = sorted(
        ((str(r["call_date"]), r["call_time"], r["other_phone"], r["call_type"], r["land_type"],
          r["cert_num"], r["phone"]) for r in out.collect())
    )
    assert rows == [
        ("2016-04-01", "11:18:50", "18500000001", 1, 1, "520103X", "18600000000"),
        ("2016-04-02", "09:00:00", "18500000002", 2, 2, "520103X", "18600000000"),
        ("2016-04-03", "20:05:01", "0012025550001", 3, 3, "520103X", "18600000000"),
    ]


def test_zhixing_shape(spark):
    from spider_spark.records import parse_zhixing

    raw = spark.createDataFrame(
        [{"id": 7, "pname": "王五", "cardNum": "x", "caseCode": "c", "caseCreateTime": "2016-01-01",
          "execCourtName": "法院", "execMoney": "10000"}]
    )
    row = parse_zhixing(raw).collect()[0]
    assert row["sys_id"] == 7 and row["execute_money"] == "10000"
    assert set(parse_zhixing(raw).columns) == {
        "sys_id", "name", "card_num", "case_code", "reg_date", "court_name", "execute_money"
    }


def test_validate_rows_first_failed_rule_and_keyset(spark):
    from pyspark.sql import functions as F

    from spider_spark.records import validate_rows

    df = spark.createDataFrame(
        [("p1", 10), ("p2", -3), (None, -9)], ["phone", "balance"]
    )
    rules = {
        "phone_present": F.col("phone").isNotNull(),
        "balance_nonneg": F.col("balance") >= 0,
    }
    ok, bad = validate_rows(df, rules, required_cols=("phone", "balance"))
    assert [r["phone"] for r in ok.collect()] == ["p1"]
    got = {r["phone"]: r["violation"] for r in bad.collect()}
    # first failed rule wins: the None-phone row reports phone_present
    assert got == {"p2": "balance_nonneg", None: "phone_present"}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        validate_rows(df, rules, required_cols=("phone",))
