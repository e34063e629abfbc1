import pandas as pd

from spider_spark.canon import canonicalize_series


def test_canonical_rules():
    urls = pd.Series(
        [
            "HTTP://H3.Example:80/p5#frag",
            "https://a.example:443/x//y/",
            "  http://h1.example/p2?  ",
            "http://h1.example/p2?q=1#x",
            "http://h1.example/",
        ]
    )
    out = canonicalize_series(urls).tolist()
    assert out[0] == "http://h3.example/p5"
    assert out[1] == "https://a.example/x/y"
    assert out[2] == "http://h1.example/p2"
    assert out[3] == "http://h1.example/p2?q=1"
    assert out[4] == "http://h1.example/"


def test_relative_resolution():
    urls = pd.Series(["/p9", "p10", "//other.example/p1", "http://abs.example/p2#z"])
    bases = pd.Series(["http://h1.example/p0"] * 4)
    out = canonicalize_series(urls, bases).tolist()
    assert out[0] == "http://h1.example/p9"
    assert out[1] == "http://h1.example/p10"
    assert out[2] == "http://other.example/p1"
    assert out[3] == "http://abs.example/p2"


def test_path_relative_resolves_against_base_directory():
    """RFC 3986 merge (ADVICE r1 #4): path-relative refs join the base
    DIRECTORY, not the origin root."""
    urls = pd.Series(["c", "c", "c", "c", "/x"])
    bases = pd.Series(
        [
            "http://h/a/b",       # dir = /a/
            "http://h/a/b/",      # dir = /a/b/
            "http://h",           # dir = /
            "http://h/a?q=1#f",   # query/fragment stripped first -> dir = /
            "http://h/a/b",       # root-relative ignores the dir
        ]
    )
    out = canonicalize_series(urls, bases).tolist()
    assert out[0] == "http://h/a/c"
    assert out[1] == "http://h/a/b/c"
    assert out[2] == "http://h/c"
    assert out[3] == "http://h/c"
    assert out[4] == "http://h/x"


def test_spark_udf_and_hash(spark):
    from pyspark.sql import functions as F

    from spider_spark.canon import canonicalize_udf, host_col, url_hash_col

    df = spark.createDataFrame([("HTTP://H3.Example:80/p5#frag",)], ["url"])
    row = (
        df.select(canonicalize_udf(F.col("url")).alias("u"))
        .select("u", host_col(F.col("u")).alias("h"), url_hash_col(F.col("u")).alias("hh"))
        .collect()[0]
    )
    assert row["u"] == "http://h3.example/p5"
    assert row["h"] == "h3.example"
    assert isinstance(row["hh"], int)


def test_canonicalize_idempotent_property():
    """Property: canonicalization is idempotent on arbitrary URL-ish
    input (hypothesis fuzz) — a second pass never changes the result."""
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from spider_spark.canon import canonicalize_series

    url_ish = st.one_of(
        st.from_regex(r"https?://[A-Za-z0-9.\-]{1,20}(:[0-9]{1,5})?(/[A-Za-z0-9./#?=&%]{0,30})?", fullmatch=True),
        st.text(min_size=0, max_size=40),
    )

    @settings(max_examples=200, deadline=None)
    @given(st.lists(url_ish, min_size=1, max_size=20))
    def check(urls):
        once = canonicalize_series(pd.Series(urls, dtype="object"))
        twice = canonicalize_series(once)
        assert list(once.fillna("∅")) == list(twice.fillna("∅"))

    check()
