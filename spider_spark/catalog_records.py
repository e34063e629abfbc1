"""Catalog part 5: the HTML/JSON record-parser families (records_html.py)
under the driver's DuckDB oracle gate.

Oracle scheme: each query SYNTHESIZES reference-shaped payloads (credit
report tables, card sentences, phone-book rows, operator JSON) from a
testdata table with pure JVM string building, runs the full parse
pipeline over them, and the oracle predicts the output directly from the
source table — construct→parse→project must be the identity.  This
makes the parsers (scanner indexing, row slicing, regex pulls, JSON
paths) oracle-checked end-to-end, not just golden-tested.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .catalog import _t, q


def _td(c):
    return F.concat(F.lit("<td>"), c, F.lit("</td>"))


@q(
    "r1_credit_query_parse",
    """SELECT CAST(c_custkey AS BIGINT) AS doc_id, CAST(c_custkey AS VARCHAR) AS query_id,
              CAST(c_nationkey AS VARCHAR) AS query_time, c_name AS query_operator,
              c_mktsegment AS query_reason, 1 AS query_type
       FROM customer
       UNION ALL
       SELECT CAST(c_custkey AS BIGINT), CAST(c_nationkey AS VARCHAR),
              CAST(c_custkey AS VARCHAR), c_name, 'self', 0
       FROM customer""",
)
def r1_credit_query_parse(spark, sf_dir):
    """Credit-report query-record harvest (claw_report.py:8-58): build a
    report page per customer — filler table 0, agency table 1, personal
    table 2, each with 3 header rows and a footer row — then slice
    rows[3:-1] and zip cells.  t_credit.sql:27-39 column set."""
    from .records_html import credit_query_records

    c = _t(spark, sf_dir, "customer")
    hdr = "<tr><td>头部</td></tr><tr><td>明细</td></tr><tr><td>序号</td></tr>"
    foot = "<tr><td>合计</td></tr>"
    agency_row = F.concat(
        F.lit("<tr>"),
        _td(F.col("c_custkey").cast("string")),
        _td(F.col("c_nationkey").cast("string")),
        _td(F.col("c_name")),
        _td(F.col("c_mktsegment")),
        F.lit("</tr>"),
    )
    person_row = F.concat(
        F.lit("<tr>"),
        _td(F.col("c_nationkey").cast("string")),
        _td(F.col("c_custkey").cast("string")),
        _td(F.col("c_name")),
        _td(F.lit("self")),
        F.lit("</tr>"),
    )
    body = F.concat(
        F.lit("<html><body><table><tr><td>filler</td></tr></table><table>"),
        F.lit(hdr), agency_row, F.lit(foot),
        F.lit("</table><table>"),
        F.lit(hdr), person_row, F.lit(foot),
        F.lit("</table></body></html>"),
    )
    docs = c.select(F.col("c_custkey").cast("long").alias("doc_id"), body.alias("body"))
    return credit_query_records(docs, agency_table=1, person_table=2)


@q(
    "r2_credit_card_parse",
    """SELECT CAST(o_orderkey AS BIGINT) AS doc_id,
              '2016年3月29日' AS release_date, o_orderstatus AS bank,
              o_orderpriority || '卡' AS card_type, '人民币账户' AS account_type,
              '2016年5月' AS due_date, CAST(o_custkey AS VARCHAR) AS credit_amount,
              CAST(o_orderkey AS VARCHAR) AS used_amount
       FROM orders WHERE o_orderkey <= 5000""",
)
def r2_credit_card_parse(spark, sf_dir):
    """Credit-card sentence harvest (claw_report.py:61-90): render the
    reference's card sentence per order and regex the seven fields back
    (t_credit.sql:42-56)."""
    from .records_html import credit_card_records

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 5000)
    sentence = F.concat(
        F.lit("2016年3月29日"), F.col("o_orderstatus"), F.lit("发行的"),
        F.col("o_orderpriority"), F.lit("卡（人民币账户），截至2016年5月，信用额度"),
        F.col("o_custkey").cast("string"), F.lit("，已使用额度"),
        F.col("o_orderkey").cast("string"), F.lit("。"),
    )
    docs = o.select(
        F.col("o_orderkey").cast("long").alias("doc_id"),
        F.concat(F.lit('<html><body><ol class="p olstyle"><li>'), sentence,
                 F.lit("</li></ol></body></html>")).alias("body"),
    )
    return credit_card_records(docs)


@q(
    "r3_phone_book_parse",
    """SELECT '广东省' AS province, s_name AS city,
              CAST(NULL AS VARCHAR) AS sub_city, CAST(NULL AS VARCHAR) AS town_street,
              '市政府办公室' AS department,
              lpad(CAST(s_suppkey AS VARCHAR), 4, '0') || '-' || CAST(s_nationkey AS VARCHAR) AS tel_num
       FROM supplier""",
)
def r3_phone_book_parse(spark, sf_dir):
    """Phone-book hierarchy harvest (phone_book.py:144-173): render a
    dept+tel row per supplier under a (province, city) crawl path, split
    it back with the reference's regex, six-column-key dedup
    (t_phone_book.sql:5-19).  Tel is zero-padded to 4 digits: the
    reference regex lets a <=2-digit prefix glue onto the dept group, so
    an unambiguous fixture needs >=3 digits before the dash."""
    from .records_html import phone_book_records

    s = _t(spark, sf_dir, "supplier")
    df = s.select(
        F.array(F.lit("广东省"), F.col("s_name")).alias("name_path"),
        F.concat(
            F.lit("市政府办公室"),
            F.lpad(F.col("s_suppkey").cast("string"), 4, "0"), F.lit("-"),
            F.col("s_nationkey").cast("string"),
        ).alias("text"),
    )
    return phone_book_records(df)


@q(
    "r4_operator_user_json",
    """SELECT CAST(c_custkey AS VARCHAR) AS phone, c_name AS name,
              CAST(NULL AS VARCHAR) AS sex, CAST(NULL AS VARCHAR) AS address,
              CAST(NULL AS VARCHAR) AS cert_type, CAST(c_nationkey AS VARCHAR) AS cert_num,
              c_mktsegment AS product_name, CAST(NULL AS VARCHAR) AS level,
              CAST(NULL AS VARCHAR) AS open_date,
              CASE WHEN c_custkey % 2 = 0 THEN 1 ELSE 0 END AS user_valid
       FROM customer""",
)
def r4_operator_user_json(spark, sf_dir):
    """Operator user-info harvest (china_unicom.py:163-189): build the
    searchPerInfo JSON per customer, pull it back through the
    KEY_CONVERT_USER paths + the usercirclestatus validity rule
    (t_operator.sql:4-30)."""
    from .records_html import operator_user_records

    c = _t(spark, sf_dir, "customer")
    resp = F.to_json(
        F.struct(
            F.struct(
                F.when(F.col("c_custkey") % 2 == 0, F.lit("有效期"))
                .otherwise(F.lit("停机"))
                .alias("usercirclestatus"),
                F.struct(
                    F.col("c_name").alias("custname"),
                    F.col("c_nationkey").cast("string").alias("certnum"),
                    F.col("c_mktsegment").alias("productname"),
                ).alias("MyDetail"),
            ).alias("result")
        )
    )
    df = c.select(F.col("c_custkey").cast("string").alias("phone"), resp.alias("resp"))
    return operator_user_records(df)


@q(
    "r5_operator_note_records",
    """SELECT o_orderstatus AS cert_num, CAST(o_custkey AS VARCHAR) AS phone,
              CAST(o_orderdate AS DATE) AS note_date, o_orderpriority AS note_time,
              CAST(o_custkey AS VARCHAR) AS note_cost,
              o_orderstatus AS business_type, CAST(o_orderkey AS VARCHAR) AS other_phone
       FROM orders""",
)
def r5_operator_note_records(spark, sf_dir):
    """Operator SMS records (t_operator.sql:60-77): KEY_CONVERT_NOTE
    rename projection + date typing + unique-key dedup over an
    orders-derived message log."""
    from .records_html import operator_note_records

    o = _t(spark, sf_dir, "orders")
    df = o.select(
        F.col("o_orderstatus").alias("cert_num"),
        F.col("o_custkey").cast("string").alias("phone"),
        F.col("o_orderdate").cast("string").alias("smsdate"),
        F.col("o_orderpriority").alias("smstime"),
        F.col("o_custkey").cast("string").alias("amount"),
        F.col("o_orderstatus").alias("businesstype"),
        F.col("o_orderkey").cast("string").alias("othernum"),
    )
    return operator_note_records(df)


@q(
    "r7_credit_guarantee_parse",
    """SELECT CAST(s_suppkey AS BIGINT) AS doc_id,
              CAST(s_suppkey AS VARCHAR) AS query_id, s_name AS guarantor,
              '2016-04-01' AS guarantee_date, s_name || '市' AS guarantee_place,
              '身份证' AS card_type, lpad(CAST(s_suppkey AS VARCHAR), 9, '0') AS card_num,
              '房贷' AS loan_type, CAST(s_nationkey AS VARCHAR) AS loan_count,
              CAST(s_suppkey AS VARCHAR) AS guarantee_count,
              '2020-12' AS due_date, CAST(s_nationkey AS VARCHAR) AS balance
       FROM supplier""",
)
def r7_credit_guarantee_parse(spark, sf_dir):
    """t_credit_guarantee harvest (t_credit.sql:59-74): the reference
    declares this DDL but ships no parser — the sliced-table parse
    (rows[3:-1], 11 cells zipped with the DDL column order) exceeds its
    surface.  Construct→parse→project identity oracle per supplier."""
    from .records_html import credit_guarantee_records

    s = _t(spark, sf_dir, "supplier")
    cells = [
        F.col("s_suppkey").cast("string"),
        F.col("s_name"),
        F.lit("2016-04-01"),
        F.concat(F.col("s_name"), F.lit("市")),
        F.lit("身份证"),
        F.lpad(F.col("s_suppkey").cast("string"), 9, "0"),
        F.lit("房贷"),
        F.col("s_nationkey").cast("string"),
        F.col("s_suppkey").cast("string"),
        F.lit("2020-12"),
        F.col("s_nationkey").cast("string"),
    ]
    hdr = "<tr><td>头部</td></tr><tr><td>明细</td></tr><tr><td>序号</td></tr>"
    foot = "<tr><td>合计</td></tr>"
    row = F.concat(F.lit("<tr>"), *[_td(c) for c in cells], F.lit("</tr>"))
    body = F.concat(
        F.lit("<html><body><table><tr><td>filler</td></tr></table><table>"),
        F.lit(hdr), row, F.lit(foot), F.lit("</table></body></html>"),
    )
    docs = s.select(F.col("s_suppkey").cast("long").alias("doc_id"), body.alias("body"))
    return credit_guarantee_records(docs, table_idx=1)


@q(
    "r8_credit_enforce_parse",
    """SELECT CAST(o_orderkey AS BIGINT) AS doc_id,
              CAST(o_orderkey AS VARCHAR) AS query_id,
              o_orderstatus || '法院' AS exe_court,
              '（' || CAST(o_orderkey AS VARCHAR) || '）号' AS case_no,
              o_orderpriority AS exe_reason, '和解' AS closed_way,
              strftime(o_orderdate, '%Y-%m-%d') AS filing_time,
              '已结案' AS case_status, '执行标的' AS app_exe, '已执行' AS executed,
              CAST(o_custkey AS VARCHAR) AS app_exe_amt,
              CAST(o_orderkey AS VARCHAR) AS executed_amt,
              '2016-05-01' AS closed_time
       FROM orders WHERE o_orderkey <= 5000""",
)
def r8_credit_enforce_parse(spark, sf_dir):
    """t_credit_enforce harvest (t_credit.sql:80-97): DDL-without-parser
    in the reference, same sliced-table identity-oracle scheme as r7."""
    from .records_html import credit_enforce_records

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 5000)
    cells = [
        F.col("o_orderkey").cast("string"),
        F.concat(F.col("o_orderstatus"), F.lit("法院")),
        F.concat(F.lit("（"), F.col("o_orderkey").cast("string"), F.lit("）号")),
        F.col("o_orderpriority"),
        F.lit("和解"),
        F.date_format("o_orderdate", "yyyy-MM-dd"),
        F.lit("已结案"),
        F.lit("执行标的"),
        F.lit("已执行"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderkey").cast("string"),
        F.lit("2016-05-01"),
    ]
    hdr = "<tr><td>头部</td></tr><tr><td>明细</td></tr><tr><td>序号</td></tr>"
    foot = "<tr><td>合计</td></tr>"
    row = F.concat(F.lit("<tr>"), *[_td(c) for c in cells], F.lit("</tr>"))
    body = F.concat(
        F.lit("<html><body><table><tr><td>filler</td></tr></table><table>"),
        F.lit(hdr), row, F.lit(foot), F.lit("</table></body></html>"),
    )
    docs = o.select(F.col("o_orderkey").cast("long").alias("doc_id"), body.alias("body"))
    return credit_enforce_records(docs, table_idx=1)


@q(
    "p12_param_validation",
    """SELECT c_custkey AS cust_id, c_name, c_acctbal,
              'acctbal_nonneg' AS violation
       FROM customer WHERE c_acctbal < 0""",
)
def p12_param_validation(spark, sf_dir):
    """P12 param validation (checkAttr china_unicom.py:357-362): route
    precondition-violating rows to the error sink with the first failed
    rule named — err 4400 analog, all codegen'd."""
    from .records import validate_rows

    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust_id"), "c_name", "c_acctbal"
    )
    _ok, bad = validate_rows(
        c,
        {
            "name_format": F.col("c_name").startswith("Customer#"),
            "acctbal_nonneg": F.col("c_acctbal") >= 0,
        },
        required_cols=("cust_id", "c_name", "c_acctbal"),
    )
    return bad


@q(
    "r6_phone_attribution",
    """SELECT lpad(CAST(c_nationkey AS VARCHAR), 2, '0') ||
                lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS phone,
              n_name AS province, n_name || '市' AS city,
              CASE n_nationkey % 4 WHEN 0 THEN 1 WHEN 1 THEN 2
                                   WHEN 2 THEN 3 ELSE 4 END AS company
       FROM customer JOIN nation ON n_nationkey = c_nationkey""",
)
def r6_phone_attribution(spark, sf_dir):
    """S16 geo attribution (get_phone_attr.py:28-64): phones built with a
    2-digit nation prefix, enriched through the broadcast prefix dim +
    carrier-name recode; oracle joins the source tables directly."""
    from .geo import phone_attribution

    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    phones = c.select(
        F.concat(
            F.lpad(F.col("c_nationkey").cast("string"), 2, "0"),
            F.lpad(F.col("c_custkey").cast("string"), 9, "0"),
        ).alias("phone")
    )
    carrier = (
        F.when(F.col("n_nationkey") % 4 == 0, "中国联通")
        .when(F.col("n_nationkey") % 4 == 1, "中国移动")
        .when(F.col("n_nationkey") % 4 == 2, "中国电信")
        .otherwise("其他运营商")
    )
    dim = n.select(
        F.lpad(F.col("n_nationkey").cast("string"), 2, "0").alias("prefix"),
        F.col("n_name").alias("province"),
        F.concat(F.col("n_name"), F.lit("市")).alias("city"),
        carrier.alias("company_name"),
    )
    return phone_attribution(phones, dim, prefix_len=2)


@q(
    "m4_captcha_ocr",
    """SELECT 'cap:' || CAST(s_suppkey AS VARCHAR) AS media_ref,
              lpad(CAST(s_suppkey % 10000 AS VARCHAR), 4, '0') AS code
       FROM supplier""",
)
def m4_captcha_ocr(spark, sf_dir):
    """S4 captcha OCR (recogImage, share_func.py:56-66): render each
    supplier's 4-digit code as a noisy synth captcha, binarize with the
    reference's three-pass threshold, template-match it back — one fused
    python stage; recognize∘render must be the identity per row."""
    from .functions.ocr import render_recog_identity

    s = _t(spark, sf_dir, "supplier")
    df = s.select(
        F.concat(F.lit("cap:"), F.col("s_suppkey").cast("string")).alias("media_ref"),
        F.lpad((F.col("s_suppkey") % 10000).cast("string"), 4, "0").alias("code_in"),
    )
    return render_recog_identity(df)
