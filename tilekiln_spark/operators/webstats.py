"""Host-level corpus statistics and URL admission filtering.

Stage-1 operators of a web-corpus pipeline (C4 / RefinedWeb shape): decide
which pages even enter text processing, and profile hosts so host-level
quality gates (spam farms, mirror hosts, boilerplate-heavy hosts) can run
before the expensive per-document passes.

Scale shape (10^12 pages): ``url_filter_flags`` is map-only codegen — the
blocklists are literal predicates (swap in a broadcast dim for large lists;
the join stays broadcast because blocklists are small by construction).
``host_profile`` is ONE partial-agg shuffle keyed on host; every aggregate
is algebraic except the distinct-text count, which shuffles 16-byte md5s,
not text.  No driver materialization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F

from tilekiln_spark.functions.web import url_depth, url_host, url_normalize, url_scheme

# C4-style path badwords: a URL whose path mentions one of these is dropped
# before fetch-side processing.  Kept deliberately short — the point is the
# plumbing; real deployments broadcast a curated list.
DEFAULT_PATH_BADWORDS = ("login", "signup", "cart", "admin", "tracker")


def url_filter_flags(
    df: DataFrame,
    url_col: str = "url",
    host_blocklist: tuple[str, ...] = (),
    path_badwords: tuple[str, ...] = DEFAULT_PATH_BADWORDS,
    max_depth: int = 8,
) -> DataFrame:
    """Annotate each row with ``keep`` + first-match ``drop_reason``
    (scheme / host_blocked / path_badword / too_deep / NULL when kept).

    Reasons are evaluated in a fixed order so the column is deterministic;
    callers filter with ``.filter("keep")`` — the flags stay available for
    funnel accounting (how many pages each gate removed), which a 100 TB
    ingest reports per partition in its lineage rows.
    """
    scheme = url_scheme(url_col)
    host = url_host(url_col)
    path = F.lower(F.col(url_col))
    bad_path: Column = F.lit(False)
    for w in path_badwords:
        bad_path = bad_path | path.rlike(f"/[^?#]*{w}")
    blocked: Column = F.lit(False)
    for h in host_blocklist:
        blocked = blocked | (host == h.lower())
    reason = (
        F.when(~scheme.isin("http", "https"), F.lit("scheme"))
        .when(blocked, F.lit("host_blocked"))
        .when(bad_path, F.lit("path_badword"))
        .when(url_depth(url_col) > max_depth, F.lit("too_deep"))
    )
    return df.withColumn("drop_reason", reason).withColumn(
        "keep", reason.isNull()
    )


def latest_capture(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    tiebreak: str | None = None,
) -> DataFrame:
    """Snapshot selection: keep the NEWEST capture per normalized URL.

    A crawl archive holds many captures of the same page whose raw URLs
    differ only by case / tracking params / fragments; training corpora keep
    one (the freshest).  Normalization runs first so those variants collapse
    into one group.  Adds ``url_norm``; returns the winning full row per
    group.  ``tiebreak`` (e.g. a capture id) makes the winner deterministic
    when two captures share a timestamp.

    Scale shape: ONE shuffle on url_norm; per-key state is the window's
    current top row, and captures-per-URL is bounded (crawl frequency), so
    no skew salting is needed.  If a corpus ever had a whale URL, swap the
    window for groupBy(url_norm).agg(max_by(struct(*), (ts, tiebreak))) —
    same result with partial aggregation.
    """
    order = [F.col(ts_col).desc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).desc())
    w = Window.partitionBy("url_norm").orderBy(*order)
    return (
        df.withColumn("url_norm", url_normalize(url_col))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def host_profile(
    df: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-host rollup: page count, language spread, text-duplication rate,
    mean document length.  The dup rate is the host-quality signal CCNet
    gates on (mirror/boilerplate hosts duplicate most of their text).

    Output: (host, n_pages, n_langs, n_distinct_texts, dup_rate, avg_chars).
    dup_rate = 1 - distinct/total, 0.0 for a host of unique pages.
    """
    text = F.col(text_col)
    return (
        df.select(
            url_host(url_col).alias("host"),
            F.md5(F.encode(text, "utf-8")).alias("__th"),
            F.length(text).alias("__len"),
            F.col(lang_col).alias("__lang"),
        )
        .groupBy("host")
        .agg(
            F.count("*").alias("n_pages"),
            F.count_distinct("__lang").alias("n_langs"),
            F.count_distinct("__th").alias("n_distinct_texts"),
            F.avg("__len").alias("avg_chars"),
        )
        .select(
            "host",
            "n_pages",
            "n_langs",
            "n_distinct_texts",
            (F.lit(1.0) - F.col("n_distinct_texts") / F.col("n_pages")).alias("dup_rate"),
            "avg_chars",
        )
    )


def host_cap(
    df: DataFrame,
    per_domain: int,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Domain capping: keep at most ``per_domain`` documents per
    REGISTRABLE DOMAIN (the RefinedWeb/C4 anti-spam stage — without it a
    handful of template-farm domains dominate the corpus mix).

    The winners are a deterministic UNBIASED sample: rank within domain by
    ``md5(id)`` (a pseudo-random but reproducible order), not by crawl or
    id order — a prefix cut would bias toward whatever the upstream sort
    favored.  Adds ``domain``, ``host_rank`` (1-based) and ``keep``; callers
    filter on ``keep`` and keep the flags for funnel accounting, like
    ``url_filter_flags``.

    Scale shape: ONE shuffle keyed on domain; per-key state is a counter.
    Whale domains concentrate on one partition during the rank — if a
    domain ever holds a double-digit share of a 10^12-page corpus, pre-thin
    it with a cheap map-side filter on md5-prefix buckets before the exact
    window (the cap makes any such domain's survivors tiny, so the residual
    window is small); AQE skew handling covers everything short of that.
    """
    w = Window.partitionBy("domain").orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    from tilekiln_spark.functions.web import registrable_domain

    return (
        df.withColumn("domain", registrable_domain(url_col))
        .withColumn("host_rank", F.row_number().over(w))
        .withColumn("keep", F.col("host_rank") <= F.lit(per_domain))
    )


def anchor_text_rollup(links: DataFrame) -> DataFrame:
    """Inlink anchor-text aggregation — the web-graph rollup every search
    / corpus pipeline runs after link extraction (anchor text is a
    first-class relevance and labeling signal; cf. the anchor corpora
    built from Common Crawl): per TARGET page, how many inlinks it has,
    how many distinct anchor phrases point at it, and the most common
    anchor (ties broken by anchor string ascending, so the winner is
    engine-independent).

    Input: ``(dst, anchor)`` link rows (anchor may be null — e.g. image
    links — such rows count toward nothing and are dropped first).

    Shape: ONE partial-aggregated groupBy((dst, anchor)) collapses each
    scan partition's duplicate anchors map-side, then ONE groupBy(dst)
    assembles the rollup with exact integer sums and a struct-min
    argmax ((-cnt, anchor) — count desc, anchor asc).  Two compact-key
    shuffles, no window, no collect; anchors never travel unaggregated
    past the first exchange.  Returns
    ``[dst, n_inlinks, n_anchors, top_anchor, top_anchor_n]``."""
    per = (
        links.filter(F.col("anchor").isNotNull() & (F.col("anchor") != ""))
        .groupBy("dst", "anchor")
        .agg(F.count("*").alias("cnt"))
    )
    best = F.min(F.struct((-F.col("cnt")).alias("neg"), F.col("anchor").alias("a")))
    return (
        per.groupBy("dst")
        .agg(
            F.sum("cnt").alias("n_inlinks"),
            F.count("*").alias("n_anchors"),
            best.alias("b"),
        )
        .select(
            "dst",
            "n_inlinks",
            "n_anchors",
            F.col("b.a").alias("top_anchor"),
            (-F.col("b.neg")).cast("long").alias("top_anchor_n"),
        )
    )


def host_link_matrix(links: DataFrame) -> DataFrame:
    """Host-to-host linkage matrix — the domain-level rollup of the page
    link graph (the web-graph analytics face of the OD-matrix shape;
    Common Crawl publishes exactly this as its host-level web graph):
    per (source host, target host), how many links, from how many
    distinct source pages, and whether the cell is site-internal.

    Input: ``(src, src_host, dst_host)`` link rows.  Shape: ONE
    partial-aggregated groupBy on the host pair — count is map-side
    combinable; the distinct-source count rewrites to a two-level
    aggregate under AQE but stays keyed on the same pair, so the matrix
    never shuffles raw links twice.  Host cardinality is tiny relative
    to pages (the 100 TB contract: ~10^8 hosts vs 10^12 pages), so the
    output is the small side of any downstream join.

    Returns ``[src_host, dst_host, n_links, n_src_pages, internal]``."""
    return (
        links.groupBy("src_host", "dst_host")
        .agg(
            F.count("*").alias("n_links"),
            F.countDistinct("src").alias("n_src_pages"),
        )
        .withColumn("internal", F.col("src_host") == F.col("dst_host"))
    )


def host_diversity(pages: DataFrame, key_col: str = "host", cat_col: str = "lang") -> DataFrame:
    """Per-host content-diversity metrics — the corpus-balance rollup a
    crawl curator runs before sampling (is a host monolingual spam or a
    genuine multilingual hub?): for each host, the page count, distinct
    category (language) count, Simpson concentration index, and Shannon
    entropy of the category distribution.

    Determinism split by construction:

    - **Simpson** λ = Σ c_i(c_i−1) / (T(T−1)) is computed ENTIRELY from
      exact integer sums — order-independent, bit-identical cross-engine
      with no fold needed (NULL for single-page hosts);
    - **Shannon** H = −Σ (c_i/T)·ln(c_i/T) mixes logs, so the sum runs
      as a sequential fold over the category-sorted struct array (the
      user_trajectories pattern) — both engines add the identical terms
      in the identical order.

    Shape: ONE (host, category) partial-agg groupBy collapses pages
    map-side (shuffle volume = distinct pairs, not pages), then ONE
    groupBy(host); the per-host array holds categories (≤ a few
    hundred), never pages.  Returns
    ``[host, n_pages, n_cats, simpson, shannon]``."""
    per = pages.groupBy(key_col, cat_col).agg(F.count("*").alias("c"))
    agg = per.groupBy(key_col).agg(
        F.sum("c").alias("T"),
        F.count("*").alias("n_cats"),
        F.sum(F.col("c") * (F.col("c") - 1)).alias("_s2"),
        F.sort_array(F.collect_list(F.struct(cat_col, "c"))).alias("_o"),
    )
    t = F.col("T").cast("double")
    frac = lambda s: s["c"].cast("double") / t  # noqa: E731
    shannon = -F.aggregate(
        F.col("_o"), F.lit(0.0), lambda a, s: a + frac(s) * F.log(frac(s))
    )
    simpson = F.col("_s2").cast("double") / F.nullif(
        t * (t - 1.0), F.lit(0.0)
    )
    return agg.select(
        F.col(key_col),
        F.col("T").alias("n_pages"),
        F.col("n_cats"),
        simpson.alias("simpson"),
        shannon.alias("shannon"),
    )


def concentration_gini(counts: DataFrame, key_col: str, n_col: str = "n") -> DataFrame:
    """Gini concentration index over a count dimension (pages per host,
    links per domain — the "is this crawl dominated by a few megasites?"
    audit number):

        G = 2·Σ r_i·c_i / (n·Σc) − (n + 1)/n

    over counts sorted ascending with rank r_i (ties broken by the key,
    so ranks — and therefore the statistic — are engine-independent
    even though tied orderings are arbitrary: equal counts commute in
    Σ r·c... their rank sum is fixed, so ANY tie order gives the same
    value; the key tiebreak just pins the plan).

    Σ r·c and Σc are exact integer sums, so G is one exact scalar
    division.  Shape: ONE global sort of the COUNT dimension (hosts,
    not pages — ~10^8 rows at crawl scale).  NB: a global
    ``Window.orderBy`` compiles to a SinglePartition exchange — fine
    for the rolled-up host dimension, NOT for page-sized inputs; at
    the 10^8-host end switch to the two-pass range-partition + offset
    rank (functions/text.py ``_positional_median`` / packing.py show
    the shape).  Returns one row ``[n_keys, total, gini]`` (NULL for
    a single key)."""
    w = Window.orderBy(F.col(n_col).asc(), F.col(key_col).asc())
    ranked = counts.select(
        F.col(n_col).cast("long").alias("c"),
        F.row_number().over(w).cast("long").alias("r"),
    )
    agg = ranked.agg(
        F.count("*").alias("n_keys"),
        F.sum("c").alias("total"),
        F.sum(F.col("r") * F.col("c")).alias("_rc"),
    )
    n = F.col("n_keys").cast("double")
    gini = (
        2.0 * F.col("_rc").cast("double")
        / (n * F.col("total").cast("double"))
        - (n + 1.0) / n
    )
    return agg.select(
        "n_keys",
        "total",
        F.when(F.col("n_keys") > 1, gini).alias("gini"),
    )


def parse_robots(robots: DataFrame, host_col: str = "host", txt_col: str = "robots_txt") -> DataFrame:
    """Parse robots.txt bodies into per-host rule rows (RFC 9309
    subset: a single ``User-agent: *`` group with ``Allow`` /
    ``Disallow`` path-prefix rules; no wildcards).

    Pure codegen: split on newlines, explode, regexp-extract the
    directive and its path, drop empty-path rules (an empty Disallow
    means allow-everything per the RFC, i.e. no rule).  Directive names
    match case-insensitively; paths are kept verbatim (the RFC matches
    byte-wise prefixes).  Returns ``[host, allow:boolean, prefix,
    rule_len]`` — rule_len precomputed because decisions rank on it.

    Scale: robots bodies are one small row per host (~10^8), map-only to
    parse; the rule table is the broadcast dim of every admission join."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(F.col(txt_col), "\n")).alias("line"),
    )
    directive = F.lower(F.regexp_extract("line", r"^\s*([A-Za-z-]+)\s*:", 1))
    path = F.regexp_extract("line", r"^\s*[A-Za-z-]+\s*:\s*(\S*)", 1)
    return (
        lines.select(
            "host", directive.alias("d"), path.alias("prefix")
        )
        .where(F.col("d").isin("allow", "disallow") & (F.col("prefix") != ""))
        .select(
            "host",
            (F.col("d") == "allow").alias("allow"),
            "prefix",
            F.length("prefix").cast("int").alias("rule_len"),
        )
    )


def robots_decisions(
    pages: DataFrame,
    rules: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Admission decision per page under RFC 9309 longest-match
    semantics: among the page's host's rules whose prefix is a prefix of
    the page path, the LONGEST wins; at equal length ``Allow`` wins; no
    matching rule ⇒ allowed.

    One broadcast join host→rules + a prefix filter, then ONE partial-agg
    ``max(struct(rule_len, allow, prefix))`` per page — the struct-max
    argmax encodes exactly the RFC tie-break (longer beats shorter;
    true > false at equal length), is order-independent, and replays
    verbatim in SQL.  Returns pages + [allowed, rule_prefix (NULL when
    no rule matched)].

    At 10^12 pages: the rule table broadcasts (hosts are the small dim);
    the decision is map-only + one groupBy keyed on the page — no
    shuffle of page text, just keys and the few matched rules."""
    joined = pages.join(
        F.broadcast(rules.withColumnRenamed("host", host_col)),
        on=host_col,
        how="left",
    )
    match = F.col("prefix").isNotNull() & F.col(path_col).startswith(
        F.col("prefix")
    )
    win = F.max(
        F.when(
            match,
            F.struct(F.col("rule_len"), F.col("allow"), F.col("prefix")),
        )
    ).alias("_win")
    gcols = [c for c in pages.columns]
    out = joined.groupBy(*gcols).agg(win)
    return out.select(
        *gcols,
        F.coalesce(F.col("_win.allow"), F.lit(True)).alias("allowed"),
        F.col("_win.prefix").alias("rule_prefix"),
    )


def parse_crawl_delays(
    robots: DataFrame, host_col: str = "host", txt_col: str = "robots_txt"
) -> DataFrame:
    """Extract per-host ``Crawl-delay`` seconds from robots.txt bodies
    (the de-facto extension Google ignores but Bing/Yandex honor; same
    single ``User-agent: *`` group subset as :func:`parse_robots`).

    Pure codegen split + regexp; directive name matches case-
    insensitively; a host stating several delays keeps the MAX (the
    conservative politeness reading, and an order-independent aggregate).
    Returns [host, crawl_delay_s:double] for hosts that state one."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(F.col(txt_col), "\n")).alias("line"),
    )
    d = F.lower(F.regexp_extract("line", r"^\s*([A-Za-z-]+)\s*:", 1))
    val = F.regexp_extract("line", r"^\s*[A-Za-z-]+\s*:\s*([0-9.]+)", 1)
    return (
        lines.where((d == "crawl-delay") & (val != ""))
        .groupBy("host")
        .agg(F.max(val.cast("double")).alias("crawl_delay_s"))
    )


def crawl_schedule(
    pages: DataFrame,
    delays: DataFrame,
    workers: int = 4,
    default_delay_s: float = 5.0,
    host_col: str = "host",
    url_col: str = "url",
) -> DataFrame:
    """Politeness-constrained crawl-frontier schedule (the Heritrix /
    Nutch host-queue model): every URL gets a deterministic fetch slot
    such that same-host fetches are at least the host's Crawl-delay
    apart, and each host is PINNED to one worker so the delay contract
    survives parallel fetching.

    - per host, URLs order by url ascending; ``fetch_seq`` is the 1-based
      position and ``not_before_s = (fetch_seq - 1) * delay`` the
      politeness lower bound on the fetch time;
    - ``worker = md5_u32(host) % workers`` — the replayable hash pin
      (operators/sampling.py md5 convention), NOT round-robin, so adding
      pages never reshuffles existing host→worker assignments;
    - ``queue_pos`` ranks the worker's whole queue by
      (not_before_s, url) — the dispatch order a fetcher drains.

    Two window shuffles (host, then worker) + one broadcast-able delay
    join; no driver state, no iteration.  At 10^12 URLs the host window
    is the skew risk (giant hosts) — exactly where AQE skew-join /
    salted sub-queues slot in; the worker window is bounded by
    ``workers`` partitions by construction.  Returns
    [url, host, worker, fetch_seq, not_before_s, queue_pos]."""
    from tilekiln_spark.operators.sampling import md5_u32

    p = pages.join(
        F.broadcast(delays.withColumnRenamed("host", host_col)),
        host_col,
        "left",
    ).withColumn(
        "delay_s", F.coalesce("crawl_delay_s", F.lit(float(default_delay_s)))
    )
    host_w = Window.partitionBy(host_col).orderBy(F.col(url_col).asc())
    p = p.withColumn("fetch_seq", F.row_number().over(host_w)).withColumn(
        "not_before_s", (F.col("fetch_seq") - 1).cast("double") * F.col("delay_s")
    )
    p = p.withColumn(
        "worker", (md5_u32(F.col(host_col)) % F.lit(int(workers))).cast("int")
    )
    worker_w = Window.partitionBy("worker").orderBy(
        F.col("not_before_s").asc(), F.col(url_col).asc()
    )
    return p.select(
        url_col,
        host_col,
        "worker",
        "fetch_seq",
        "not_before_s",
        F.row_number().over(worker_w).alias("queue_pos"),
    )


def parse_sitemaps(
    maps: DataFrame, host_col: str = "host", xml_col: str = "sitemap_xml"
) -> DataFrame:
    """Parse sitemap XML bodies (sitemaps.org protocol) into entry rows:
    ``<urlset>`` documents yield one row per ``<url>`` block with its
    ``<loc>`` (required), optional ``<lastmod>`` / ``<changefreq>`` /
    ``<priority>``; ``<sitemapindex>`` documents yield one row per
    nested ``<sitemap>``'s ``<loc>`` (kind='index') — the recursion
    frontier a crawler feeds back into fetch.

    Pure codegen, map-only: ONE ``regexp_extract_all`` with a DOTALL
    lazy-block pattern (``(?s)<url>.*?</url>`` — identical semantics in
    Java regex and RE2) + ``posexplode`` for 1-based document order +
    per-field lazy extracts with whitespace trim; absent optional
    fields are NULL via the ''-to-NULL rule (Spark's regexp_extract
    returns '' on no-match, DuckDB NULL — nullif aligns them).  No
    shuffle at all: at 10^8 hosts the sitemap table is a map-side
    explode whose output feeds the crawl_schedule frontier.

    Returns [host, kind, pos, loc, lastmod, changefreq, priority]."""

    def _field(block, tag):
        raw = F.regexp_extract(block, rf"(?s)<{tag}>\s*(.*?)\s*</{tag}>", 1)
        return F.when(raw != "", raw)

    def _entries(kind, block_tag):
        blocks = F.expr(
            f"regexp_extract_all({xml_col}, '(?s)<{block_tag}>.*?</{block_tag}>', 0)"
        )
        ex = maps.select(
            F.col(host_col).alias("host"),
            F.posexplode(blocks).alias("p", "block"),
        )
        return ex.select(
            "host",
            F.lit(kind).alias("kind"),
            (F.col("p") + 1).cast("int").alias("pos"),
            _field(F.col("block"), "loc").alias("loc"),
            _field(F.col("block"), "lastmod").alias("lastmod"),
            _field(F.col("block"), "changefreq").alias("changefreq"),
            _field(F.col("block"), "priority").cast("double").alias("priority"),
        )

    return _entries("urlset", "url").unionAll(
        _entries("index", "sitemap")
    ).where(F.col("loc").isNotNull())
