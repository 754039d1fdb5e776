"""URL column functions for Common-Crawl-style page tables.

The reference's rows are PostGIS features keyed by geometry; a web corpus
(BASELINE input_hint: ``(url, warc_ts, html, text, lang)``) is keyed by URL,
and every production crawl pipeline (C4, CCNet, RefinedWeb) starts with URL
normalization + host-level rollups before any text processing.  These are
pure column expressions — whole-stage codegen, no Python in the hot path —
and each has a byte-identical DuckDB twin in ``__spark_entry__.oracle_sql``
so the semantics are pinned cross-engine.

Deliberate simplifications (documented so the twin stays honest):

- ``registrable_domain`` is the last two dot-labels of the host.  A real
  deployment swaps in the Mozilla public-suffix list as a broadcast dim;
  the column shape and call sites don't change.
- ``url_normalize`` does not resolve dot-segments (``/a/../b``) or
  percent-decode; it normalizes case, ports, userinfo, fragments, and
  tracking params — the operations that merge duplicate crawl entries
  without risking semantic change.
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F

# Query params that never change page content — stripped by url_normalize.
# Anchored alternation; a param matches when its NAME (before '=' or end)
# hits one of these.
TRACKING_PARAM_RE = "^(utm_[^=]*|gclid|fbclid|msclkid|mc_cid|mc_eid|ref)(=|$)"


def _prefix(url: Column) -> Column:
    """scheme://authority prefix (everything before path/query/fragment),
    lowercased, userinfo stripped, default port stripped."""
    pre = F.lower(F.regexp_extract(url, r"^([^:/?#]+://[^/?#]*)", 1))
    pre = F.regexp_replace(pre, r"://[^/@]*@", "://")
    return (
        F.when(pre.startswith("http://"), F.regexp_replace(pre, ":80$", ""))
        .when(pre.startswith("https://"), F.regexp_replace(pre, ":443$", ""))
        .otherwise(pre)
    )


def url_scheme(url) -> Column:
    """Lowercased scheme, '' when the value is not an absolute URL."""
    return F.lower(F.regexp_extract(F.col(url) if isinstance(url, str) else url,
                                    r"^([^:/?#]+)://", 1))


def url_host(url) -> Column:
    """Lowercased host: authority minus userinfo and port."""
    u = F.col(url) if isinstance(url, str) else url
    return F.regexp_extract(_prefix(u), r"://([^:/]*)", 1)


def url_path(url) -> Column:
    """Path component (leading '/', no query/fragment); '' when absent."""
    u = F.col(url) if isinstance(url, str) else url
    return F.regexp_extract(u, r"^[^:/?#]+://[^/?#]*(/[^?#]*)", 1)


def url_depth(url) -> Column:
    """Number of non-empty path segments (C4-style depth filter input)."""
    return F.size(F.filter(F.split(url_path(url), "/"), lambda s: s != ""))


def registrable_domain(url) -> Column:
    """Last two dot-labels of the host ('sub.news.example.com' ->
    'example.com').  See module docstring for the PSL caveat."""
    return F.regexp_extract(url_host(url), r"([^.]+\.[^.]+)$", 1)


def url_normalize(url) -> Column:
    """Canonical URL: lowercase scheme+host, strip userinfo / default port /
    fragment / tracking params; path and remaining query kept verbatim,
    query-param ORDER preserved (reordering merges more duplicates but can
    break signed URLs — out of scope, same choice as the DuckDB twin)."""
    u = F.col(url) if isinstance(url, str) else url
    u = F.regexp_replace(u, "#.*$", "")  # fragment never reaches the server
    rest = F.regexp_extract(u, r"^[^:/?#]+://[^/?#]*([/?].*)?$", 1)
    path = F.split(rest, r"\?", 2)[0]
    query = F.when(rest.contains("?"), F.element_at(F.split(rest, r"\?", 2), 2)).otherwise(F.lit(""))
    kept = F.array_join(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        ),
        "&",
    )
    return F.concat(
        _prefix(u),
        path,
        F.when(kept != "", F.concat(F.lit("?"), kept)).otherwise(F.lit("")),
    )


def surt_key(url) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) key — the Common-Crawl
    / OpenWayback CDX index convention: reversed comma-joined host labels,
    a ``)`` separator, then the lowercased path and the SORTED surviving
    query params.  ``http://www.Example.com/A/b?b=2&a=1`` ->
    ``com,example)/a/b?a=1&b=2``.

    Conventions (documented, twin-mirrored in the ``cdx_index`` oracle):
    scheme/userinfo/default-port handling comes from :func:`url_host`; ONE
    leading ``www.`` label is dropped (the wayback canonicalizer rule);
    tracking params are stripped with the same anchored regex as
    :func:`url_normalize`, the remainder lowercased and byte-sorted (both
    engines compare strings bytewise); an empty path renders ``/``.  Pure
    codegen expressions — the key is a natural range-partition / sort key
    for a 10^12-row CDX table (prefix locality groups a domain's captures).
    """
    u = F.col(url) if isinstance(url, str) else url
    host = F.regexp_replace(url_host(u), r"^www\.", "")
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = F.lower(url_path(u))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    u1 = F.regexp_replace(u, "#.*$", "")
    rest = F.regexp_extract(u1, r"^[^:/?#]+://[^/?#]*([/?].*)?$", 1)
    query = (
        F.when(
            rest.contains("?"), F.element_at(F.split(rest, r"\?", 2), 2)
        ).otherwise(F.lit(""))
    )
    kept = F.array_sort(
        F.filter(
            F.split(F.lower(query), "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qs = F.array_join(kept, "&")
    return F.concat(
        rev,
        F.lit(")"),
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )


def extract_outlinks(html) -> Column:
    """All href targets from an html string/binary column — the link-graph
    extraction primitive of a crawl pipeline (outlink edges feed
    pagerank/HITS/crawl frontier ops downstream).  One
    ``regexp_extract_all`` over double- or single-quoted href attributes;
    map-only codegen, no parser state (real html parsers plug in at the
    same boundary for malformed markup)."""
    h = F.col(html) if isinstance(html, str) else html
    h = F.when(h.isNull(), F.lit("")).otherwise(h.cast("string"))
    return F.concat(
        F.regexp_extract_all(h, F.lit('href="([^"]+)"'), F.lit(1)),
        F.regexp_extract_all(h, F.lit("href='([^']+)'"), F.lit(1)),
    )
