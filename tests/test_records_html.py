"""Golden tests for the HTML/JSON typed-record parsers (records_html.py)
against fixtures shaped like the reference pages (claw_report.py,
china_unicom.py searchPerInfo JSON, phone_book.py analyseRow input)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _table(rows: list[list[str]]) -> str:
    trs = "".join(
        "<tr>" + "".join(f"<td>{c}</td>" for c in row) + "</tr>" for row in rows
    )
    return f"<table>{trs}</table>"


def _credit_report_html() -> str:
    """Nine tables like the reference report page: table 0 = report ids,
    table 1 = person info, 2-6 filler, 7 = agency queries, 8 = personal
    queries; plus the <ol> credit-card sentences."""
    tables = []
    tables.append(_table([["头部"], ["报告编号:2016010200001", "查询时间:2016-01-02", "报告时间:2016-01-03"]]))
    tables.append(_table([["姓名： 张三", "证件类型：身份证"], ["证件号码：110101199001011234", "已婚"]]))
    for _ in range(5):
        tables.append(_table([["filler"]]))
    tables.append(
        _table(
            [
                ["机构查询记录"], ["明细"], ["序号", "查询日期", "操作员", "查询原因"],
                ["1", "2016-03-01", "某银行", "贷后管理"],
                ["2", "2016-04-02", "某机构", "信用卡审批"],
                ["合计 2 条"],
            ]
        )
    )
    tables.append(
        _table(
            [
                ["个人查询记录"], ["明细"], ["序号", "查询日期", "操作员", "查询原因"],
                ["1", "2016-05-05", "本人", "本人查询"],
                ["合计 1 条"],
            ]
        )
    )
    ol = (
        '<ol class="p olstyle"><li>2016年3月29日广州银行发行的贷记卡'
        "（人民币账户），截至2016年5月，信用额度17,000，已使用额度2,214。</li></ol>"
    )
    return "<html><body>" + "".join(tables) + ol + "</body></html>"


@pytest.fixture(scope="module")
def report_df(spark):
    return spark.createDataFrame([("r1", _credit_report_html())], ["doc_id", "body"])


def test_credit_query_records(spark, report_df):
    from spider_spark.records_html import credit_query_records

    rows = {
        (r["query_type"], r["query_id"]): r
        for r in credit_query_records(report_df).collect()
    }
    assert set(rows) == {(1, "1"), (1, "2"), (0, "1")}
    assert rows[(1, "1")]["query_operator"] == "某银行"
    assert rows[(1, "2")]["query_reason"] == "信用卡审批"
    assert rows[(0, "1")]["query_time"] == "2016-05-05"


def test_credit_card_records(spark, report_df):
    from spider_spark.records_html import credit_card_records

    r = credit_card_records(report_df).collect()
    assert len(r) == 1
    c = r[0]
    assert c["release_date"] == "2016年3月29日"
    assert c["bank"] == "广州银行"
    assert c["card_type"] == "贷记卡"
    assert c["account_type"] == "人民币账户"
    assert c["due_date"] == "2016年5月"
    assert c["credit_amount"] == "17,000"
    assert c["used_amount"] == "2,214"


def test_credit_person_record(spark, report_df):
    from spider_spark.records_html import credit_person_record

    r = credit_person_record(report_df).collect()
    assert len(r) == 1
    p = r[0]
    assert p["report_id"] == "2016010200001"
    assert p["query_time"] == "2016-01-02"
    assert p["name"] == "张三"
    assert p["id_type"] == "身份证"
    assert p["id_card"] == "110101199001011234"
    assert p["marriage"] == "已婚"


def test_operator_user_records(spark):
    from spider_spark.records_html import operator_user_records

    resp_valid = (
        '{"result": {"usercirclestatus": "有效期", "MyDetail": '
        '{"custname": "李四", "custsex": "男", "certnum": "E123", '
        '"productname": "4G套餐", "custlvl": "金", "opendate": "2015-07-01"}}}'
    )
    resp_expired = '{"result": {"usercirclestatus": "停机", "MyDetail": {"custname": "王五"}}}'
    resp_nostatus = '{"result": {"MyDetail": {"custname": "赵六"}}}'
    df = spark.createDataFrame(
        [("138", resp_valid), ("139", resp_expired), ("137", resp_nostatus)],
        ["phone", "resp"],
    )
    rows = {r["phone"]: r for r in operator_user_records(df).collect()}
    assert rows["138"]["name"] == "李四" and rows["138"]["user_valid"] == 1
    assert rows["138"]["cert_num"] == "E123" and rows["138"]["level"] == "金"
    assert rows["139"]["user_valid"] == 0
    assert rows["137"]["user_valid"] == 1  # KeyError branch defaults valid


def test_operator_note_records(spark):
    from spider_spark.records_html import operator_note_records

    df = spark.createDataFrame(
        [
            ("c1", "138", "2016-07-01", "08:00:01", "0.1", "点对点", "139"),
            ("c1", "138", "2016-07-01", "08:00:01", "0.1", "点对点", "139"),  # dup key
            ("c1", "138", "2016-07-02", "09:30:00", "0.1", "点对点", "136"),
        ],
        ["cert_num", "phone", "smsdate", "smstime", "amount", "businesstype", "othernum"],
    )
    out = operator_note_records(df)
    assert out.count() == 2
    r = out.filter(F.col("other_phone") == "136").collect()[0]
    assert str(r["note_date"]) == "2016-07-02" and r["note_cost"] == "0.1"


def test_phone_book_records(spark):
    from spider_spark.records_html import phone_book_records

    df = spark.createDataFrame(
        [
            # province path: ordinary province
            (["广东省", "广州市", "天河区", "某街道"], "市政府办公室020-12345678\n信访办888-7777"),
            # municipality: province slot must be duplicated
            (["北京市", "东城区"], "区委办公室010-6552233"),
            # too-short / non-matching rows discarded
            (["广东省"], "abc 12"),
        ],
        ["name_path", "text"],
    )
    rows = phone_book_records(df).collect()
    by_tel = {r["tel_num"]: r for r in rows}
    assert set(by_tel) == {"020-12345678", "888-7777", "010-6552233"}
    gz = by_tel["020-12345678"]
    assert (gz["province"], gz["city"], gz["sub_city"], gz["town_street"]) == (
        "广东省", "广州市", "天河区", "某街道",
    )
    assert by_tel["020-12345678"]["department"] == "市政府办公室"
    bj = by_tel["010-6552233"]
    assert (bj["province"], bj["city"]) == ("北京市", "北京市")
    assert bj["sub_city"] == "东城区"


def test_raw_body_roundtrips_to_spans(spark):
    """S14 + F3 cross-check: re-parsing the retained raw body must
    reproduce the exact span sequence the fetch stage assembled JVM-side
    (a parser re-run over old crawls sees the same document)."""
    from spider_spark import synth
    from spider_spark.fetch import fetch_batch
    from spider_spark.parse import html_to_spans

    seeds = synth.seed_list(spark, 60, 10, 200).select(
        "url",
        F.xxhash64("url").alias("url_hash"),
        F.lit("h").alias("host"),
        F.lit(0).alias("priority"),
        F.lit(0).alias("depth"),
        F.lit(0).alias("retry_count"),
        F.lit(0).cast("long").alias("discovered_round"),
    )
    res = fetch_batch(seeds, 10, 200, num_partitions=2, keep_body=True).filter(
        F.col("err_type") == 0
    )
    rows = res.select("spans", "body").collect()
    assert rows, "need at least one ok fetch"
    for r in rows:
        jvm_spans = [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]
        ]
        reparsed = [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in html_to_spans(r["body"])
        ]
        assert reparsed == jvm_spans
