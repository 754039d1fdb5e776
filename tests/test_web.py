"""URL functions + host-level web-corpus operators."""

import pyspark.sql.functions as F

from tilekiln_spark.functions.web import (
    registrable_domain,
    url_depth,
    url_host,
    url_normalize,
    url_path,
    url_scheme,
)
from tilekiln_spark.operators.webstats import (
    host_profile,
    latest_capture,
    url_filter_flags,
)


def _one(spark, url, col):
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(col.alias("v")).first().v


def test_url_normalize_full_mess(spark):
    u = "HTTPS://User:pw@News.Example.COM:443/World/story1?utm_source=x&q=1&fbclid=abc#frag"
    assert _one(spark, u, url_normalize("url")) == "https://news.example.com/World/story1?q=1"
    assert _one(spark, u, url_host("url")) == "news.example.com"
    assert _one(spark, u, registrable_domain("url")) == "example.com"
    assert _one(spark, u, url_scheme("url")) == "https"
    assert _one(spark, u, url_path("url")) == "/World/story1"
    assert _one(spark, u, url_depth("url")) == 2


def test_url_normalize_ports_and_queries(spark):
    # default port stripped per scheme; non-default kept; ftp untouched
    assert _one(spark, "http://a.example.org:80/p", url_normalize("url")) == "http://a.example.org/p"
    assert _one(spark, "https://a.example.org:8080/p", url_normalize("url")) == "https://a.example.org:8080/p"
    assert _one(spark, "ftp://a.example.org:80/p", url_normalize("url")) == "ftp://a.example.org:80/p"
    # query that is ONLY tracking params drops the '?'
    assert _one(spark, "https://e.com/p?utm_medium=email&gclid=1", url_normalize("url")) == "https://e.com/p"
    # param ORDER preserved; 'ref' matched as whole name only
    assert (
        _one(spark, "https://e.com/p?b=2&ref=x&a=1&refresh=1", url_normalize("url"))
        == "https://e.com/p?b=2&a=1&refresh=1"
    )
    # no path, no query
    assert _one(spark, "https://E.com", url_normalize("url")) == "https://e.com"


def test_url_filter_flags_gate_order(spark):
    rows = [
        (1, "ftp://files.example.net/cart"),               # scheme wins over badword
        (2, "https://bad.example.com/fine"),               # host blocked
        (3, "https://ok.example.com/users/login"),         # path badword
        (4, "https://ok.example.com/a/b/c/d/e"),           # too deep (max 4)
        (5, "https://ok.example.com/a/b"),                 # kept
    ]
    out = url_filter_flags(
        spark.createDataFrame(rows, "id int, url string"),
        host_blocklist=("bad.example.com",),
        max_depth=4,
    ).collect()
    got = {r.id: (r.keep, r.drop_reason) for r in out}
    assert got == {
        1: (False, "scheme"),
        2: (False, "host_blocked"),
        3: (False, "path_badword"),
        4: (False, "too_deep"),
        5: (True, None),
    }


def test_latest_capture_collapses_variants(spark):
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        # three raw variants of the same page; newest (id=3) wins
        (1, "https://E.com/p?utm_source=a", t0),
        (2, "https://e.com/p#frag", t0 + dt.timedelta(hours=1)),
        (3, "HTTPS://e.com/p", t0 + dt.timedelta(hours=2)),
        # tie on ts -> higher tiebreak id wins
        (4, "https://e.com/q", t0),
        (5, "https://e.com/q?fbclid=x", t0),
    ]
    out = latest_capture(
        spark.createDataFrame(rows, "cap_id int, url string, warc_ts timestamp"),
        "url", "warc_ts", tiebreak="cap_id",
    ).collect()
    got = {r.url_norm: r.cap_id for r in out}
    assert got == {"https://e.com/p": 3, "https://e.com/q": 5}


def test_host_profile_dup_rate(spark):
    rows = [
        (f"https://m.example.com/p{i}", "same text", "en") for i in range(4)
    ] + [
        ("https://u.example.com/a", "alpha", "en"),
        ("https://u.example.com/b", "beta", "de"),
    ]
    out = {
        r.host: r
        for r in host_profile(
            spark.createDataFrame(rows, "url string, text string, lang string")
        ).collect()
    }
    m = out["m.example.com"]
    assert (m.n_pages, m.n_distinct_texts, m.n_langs) == (4, 1, 1)
    assert abs(m.dup_rate - 0.75) < 1e-12
    u = out["u.example.com"]
    assert (u.n_pages, u.n_distinct_texts, u.n_langs) == (2, 2, 2)
    assert u.dup_rate == 0.0
    assert abs(u.avg_chars - 4.5) < 1e-12


def test_surt_key_conventions(spark):
    """SURT pins: reversed comma host, one leading www. dropped, userinfo/
    default port gone, path lowercased ('' -> '/'), fragment dropped,
    tracking params stripped, survivors lowercased AND byte-sorted."""
    from tilekiln_spark.functions.web import surt_key

    cases = [
        ("http://www.Example.com/A/b?b=2&a=1", "com,example)/a/b?a=1&b=2"),
        ("https://u:p@Sub.News.Example.com:443/P", "com,example,news,sub)/p"),
        ("http://example.com:80", "com,example)/"),
        ("https://example.com/x?utm_source=f&ref=1#frag", "com,example)/x"),
        # only ONE leading www. label drops; an interior one survives
        ("http://www.www.example.com/", "com,example,www)/"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r.s for r in df.select(surt_key("url").alias("s")).collect()]
    assert got == [want for _, want in cases]
