

def test_host_cap_semantics(spark):
    """Cap respected per registrable domain; winners deterministic and
    md5-ordered (NOT a doc_id-prefix cut)."""
    import pyspark.sql.functions as F

    from tilekiln_spark.operators.webstats import host_cap

    rows = [(i, f"https://sub{i % 3}.dom{i % 2}.example.com/p{i}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = host_cap(df, per_domain=10)
    kept = out.filter("keep")
    counts = {r.domain: r.n for r in kept.groupBy("domain").agg(F.count("*").alias("n")).collect()}
    assert counts == {"example.com": 10}
    # deterministic winners across runs
    a = sorted(r.doc_id for r in kept.collect())
    b = sorted(r.doc_id for r in host_cap(df, per_domain=10).filter("keep").collect())
    assert a == b
    # not a prefix cut: winners are md5-scattered, not doc_id 0..9
    assert a != list(range(10))
    # every row keeps its flags for funnel accounting
    assert out.count() == 200


def test_anchor_text_rollup_counts_and_tiebreak(spark):
    """Per-target rollup: counts are exact, the top anchor wins by count
    with the ASCENDING-anchor tiebreak, and null/empty anchors (image
    links) contribute nothing."""
    from tilekiln_spark.operators.webstats import anchor_text_rollup

    rows = [
        (10, "home"), (10, "home"), (10, "start"),
        # exact tie at target 20: 'alpha' beats 'beta' by string order
        (20, "beta"), (20, "alpha"), (20, "beta"), (20, "alpha"),
        (30, None), (30, ""), (30, "only"),
    ]
    df = spark.createDataFrame(rows, "dst long, anchor string")
    out = {r.dst: r for r in anchor_text_rollup(df).collect()}
    assert set(out) == {10, 20, 30}
    r10 = out[10]
    assert (r10.n_inlinks, r10.n_anchors, r10.top_anchor, r10.top_anchor_n) == (
        3, 2, "home", 2
    )
    r20 = out[20]
    assert (r20.top_anchor, r20.top_anchor_n, r20.n_inlinks) == ("alpha", 2, 4)
    r30 = out[30]
    assert (r30.n_inlinks, r30.n_anchors, r30.top_anchor) == (1, 1, "only")


def test_anchor_text_rollup_all_null_target_absent(spark):
    """A target whose every link lacks an anchor emits NO row (it has no
    anchor evidence), rather than a zero row."""
    from tilekiln_spark.operators.webstats import anchor_text_rollup

    df = spark.createDataFrame(
        [(1, None), (1, ""), (2, "x")], "dst long, anchor string"
    )
    out = anchor_text_rollup(df).collect()
    assert [r.dst for r in out] == [2]


def test_host_link_matrix_rollup(spark):
    """Exact counts per host pair: duplicate links collapse into
    n_links, distinct sources counted separately, internal flags
    same-host cells."""
    from tilekiln_spark.operators.webstats import host_link_matrix

    rows = [
        (1, "a.com", "b.com"), (1, "a.com", "b.com"), (2, "a.com", "b.com"),
        (3, "a.com", "a.com"),
        (4, "b.com", "a.com"),
    ]
    df = spark.createDataFrame(rows, "src long, src_host string, dst_host string")
    out = {(r.src_host, r.dst_host): (r.n_links, r.n_src_pages, r.internal)
           for r in host_link_matrix(df).collect()}
    assert out[("a.com", "b.com")] == (3, 2, False)
    assert out[("a.com", "a.com")] == (1, 1, True)
    assert out[("b.com", "a.com")] == (1, 1, False)


def test_host_diversity_hand_entropy(spark):
    """Hand-verified metrics: a 4-page host split 2/2 over two languages
    (Simpson = (2+2)/(4*3) = 1/3, Shannon = ln 2), a monolingual host
    (Simpson 1, Shannon 0), and a single-page host (Simpson NULL,
    Shannon 0)."""
    import math

    from tilekiln_spark.operators.webstats import host_diversity

    rows = [
        ("a", "en"), ("a", "en"), ("a", "de"), ("a", "de"),
        ("b", "en"), ("b", "en"), ("b", "en"),
        ("c", "fr"),
    ]
    df = spark.createDataFrame(rows, "host string, lang string")
    out = {r.host: r for r in host_diversity(df).collect()}
    a = out["a"]
    assert (a.n_pages, a.n_cats) == (4, 2)
    assert abs(a.simpson - 1.0 / 3.0) < 1e-12
    assert abs(a.shannon - math.log(2.0)) < 1e-12
    b = out["b"]
    assert (b.n_pages, b.n_cats, b.simpson, b.shannon) == (3, 1, 1.0, -0.0)
    c = out["c"]
    assert c.simpson is None and c.shannon == -0.0 and c.n_pages == 1


def test_concentration_gini_known_values(spark):
    """Hand-verified Gini: perfectly equal counts give 0; counts
    {1,1,1,7} give G = 2*(1+2+3+28)/(4*10) - 5/4 = 0.45; a tie-heavy
    set is invariant to which tied key gets which rank; a single key
    gives NULL."""
    from tilekiln_spark.operators.webstats import concentration_gini

    eq = spark.createDataFrame(
        [("a", 5), ("b", 5), ("c", 5)], "host string, n long"
    )
    r = concentration_gini(eq, "host").collect()[0]
    assert (r.n_keys, r.total) == (3, 15) and r.gini == 0.0

    skew = spark.createDataFrame(
        [("a", 1), ("b", 1), ("c", 1), ("d", 7)], "host string, n long"
    )
    rs = concentration_gini(skew, "host").collect()[0]
    assert abs(rs.gini - 0.45) < 1e-12

    solo = spark.createDataFrame([("a", 9)], "host string, n long")
    r1 = concentration_gini(solo, "host").collect()[0]
    assert r1.gini is None


def test_parse_robots_directives_and_junk(spark):
    from tilekiln_spark.operators.webstats import parse_robots

    txt = (
        "User-Agent: *\n# a comment\nDisallow: /private/\n"
        "ALLOW: /private/pub\nCrawl-delay: 10\nSitemap: https://x/s.xml\n"
        "Disallow:\n  disallow : /spaced\nDisallow: /tmp\n"
    )
    robots = spark.createDataFrame([("h", txt)], "host string, robots_txt string")
    rules = {(r["prefix"], r["allow"]) for r in parse_robots(robots).collect()}
    # empty-path Disallow dropped; comment/crawl-delay/sitemap skipped;
    # mixed case + leading whitespace accepted
    assert rules == {
        ("/private/", False),
        ("/private/pub", True),
        ("/spaced", False),
        ("/tmp", False),
    }


def test_robots_decisions_rfc_semantics(spark):
    from tilekiln_spark.operators.webstats import parse_robots, robots_decisions

    txt = "User-agent: *\nDisallow: /a/\nAllow: /a/b\nDisallow: /a/b\nAllow: /c\n"
    robots = spark.createDataFrame([("h", txt)], "host string, robots_txt string")
    rules = parse_robots(robots)
    pages = spark.createDataFrame(
        [(1, "h", "/a/x"), (2, "h", "/a/bq"), (3, "h", "/zzz"), (4, "h", "/c/d"),
         (5, "other", "/a/x")],
        "doc_id long, host string, path string",
    )
    out = {r["doc_id"]: r for r in robots_decisions(pages, rules).collect()}
    assert out[1]["allowed"] is False and out[1]["rule_prefix"] == "/a/"
    # /a/b: Allow and Disallow same length -> Allow wins (RFC tie-break)
    assert out[2]["allowed"] is True and out[2]["rule_prefix"] == "/a/b"
    # no matching rule -> allowed, NULL prefix
    assert out[3]["allowed"] is True and out[3]["rule_prefix"] is None
    assert out[4]["allowed"] is True
    # host with no rules at all -> allowed
    assert out[5]["allowed"] is True and out[5]["rule_prefix"] is None


def test_parse_crawl_delays(spark):
    from tilekiln_spark.operators.webstats import parse_crawl_delays

    robots = spark.createDataFrame(
        [
            ("a.com", "User-Agent: *\nCrawl-delay: 10\nDisallow: /x\n"),
            ("b.com", "user-agent: *\ncrawl-DELAY:  2.5\n"),
            # several delays -> MAX wins; junk lines ignored
            ("c.com", "Crawl-delay: 3\n# note\nCrawl-delay: 8\nSitemap: s\n"),
            ("d.com", "User-Agent: *\nDisallow: /\n"),   # none stated
            ("e.com", "Crawl-delay: abc\n"),             # unparseable -> none
        ],
        "host string, robots_txt string",
    )
    out = {r["host"]: r["crawl_delay_s"] for r in parse_crawl_delays(robots).collect()}
    assert out == {"a.com": 10.0, "b.com": 2.5, "c.com": 8.0}


def test_crawl_schedule_politeness_and_pinning(spark):
    from tilekiln_spark.operators.webstats import crawl_schedule

    pages = spark.createDataFrame(
        [(f"https://h{i % 2}.com/p{j}", f"h{i % 2}.com")
         for i in range(2) for j in range(3)],
        "url string, host string",
    )
    delays = spark.createDataFrame(
        [("h0.com", 10.0)], "host string, crawl_delay_s double")
    out = crawl_schedule(pages, delays, workers=4, default_delay_s=2.0).collect()
    rows = {(r["host"], r["fetch_seq"]): r for r in out}
    # politeness spacing: h0 at 0/10/20 s, h1 (default) at 0/2/4 s
    assert [rows[("h0.com", s)]["not_before_s"] for s in (1, 2, 3)] == [0.0, 10.0, 20.0]
    assert [rows[("h1.com", s)]["not_before_s"] for s in (1, 2, 3)] == [0.0, 2.0, 4.0]
    # host pinning: every row of a host lands on ONE worker
    for h in ("h0.com", "h1.com"):
        assert len({r["worker"] for r in out if r["host"] == h}) == 1
    # queue positions are a permutation 1..n within each worker
    from collections import defaultdict
    byw = defaultdict(list)
    for r in out:
        byw[r["worker"]].append(r["queue_pos"])
    for w, qs in byw.items():
        assert sorted(qs) == list(range(1, len(qs) + 1))


def test_parse_sitemaps_urlset_and_index(spark):
    from tilekiln_spark.operators.webstats import parse_sitemaps

    urlset = (
        "<?xml version=\"1.0\"?>\n<urlset>\n"
        "  <url>\n    <loc> https://a.com/p1 </loc>\n"
        "    <lastmod>2024-01-03</lastmod>\n"
        "    <changefreq>daily</changefreq>\n  </url>\n"
        "  <url><loc>https://a.com/p2</loc><priority>0.8</priority></url>\n"
        "  <url><lastmod>2024-02-02</lastmod></url>\n"  # no loc: dropped
        "</urlset>"
    )
    index = (
        "<sitemapindex>"
        "<sitemap><loc>https://b.com/s1.xml</loc>"
        "<lastmod>2024-03-01</lastmod></sitemap>"
        "<sitemap>\n<loc>https://b.com/s2.xml</loc>\n</sitemap>"
        "</sitemapindex>"
    )
    maps = spark.createDataFrame(
        [("a.com", urlset), ("b.com", index)], "host string, sitemap_xml string"
    )
    rows = {(r["host"], r["kind"], r["pos"]): r
            for r in parse_sitemaps(maps).collect()}
    assert len(rows) == 4
    r1 = rows[("a.com", "urlset", 1)]
    assert r1["loc"] == "https://a.com/p1"          # whitespace trimmed
    assert r1["lastmod"] == "2024-01-03"
    assert r1["changefreq"] == "daily" and r1["priority"] is None
    r2 = rows[("a.com", "urlset", 2)]
    assert r2["priority"] == 0.8 and r2["lastmod"] is None
    assert ("a.com", "urlset", 3) not in rows        # loc-less entry dropped
    assert rows[("b.com", "index", 1)]["loc"] == "https://b.com/s1.xml"
    assert rows[("b.com", "index", 2)]["lastmod"] is None
