"""Gazetteer geoparsing: place-name extraction from web text by broadcast
dictionary match — the webtext-to-geometry bridge of this engine's graft
(pages -> place mentions -> map features), the step a real pipeline runs
with GeoNames/WhosOnFirst where this repo derives a deterministic fixture
gazetteer from the corpus itself.

Scale shape: tokenization is a map-only codegen expression; the exploded
token stream joins the gazetteer BROADCAST (a gazetteer is dictionary-
sized by definition — GeoNames is ~12M rows, far under broadcast limits
after name normalization, and the fixture is top-K); mention rollup is
ONE partial-aggregated groupBy on (doc, place).  No shuffle ever carries
raw text — only (doc_id, place) pairs cross the exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tilekiln_spark.functions.geocode import (
    geocode_arith_lat,
    geocode_arith_lon,
)


def tokens_lower(text: Column) -> Column:
    """Lowercase alpha tokens: split on non-alpha runs, drop empties —
    the twin-mirrorable normalization (string_split_regex + list_filter
    in DuckDB)."""
    return F.filter(
        F.split(F.lower(text), "[^a-z]+"), lambda t: t != F.lit("")
    )


def build_gazetteer(
    docs: DataFrame,
    top_k: int = 20,
    min_len: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """Deterministic fixture gazetteer: the corpus's ``top_k`` most
    frequent alpha tokens of length >= ``min_len`` as 'place names',
    ranked (count DESC, token ASC — total order), each geocoded from
    its rank via the shared arithmetic geocode (rank * 7919 spreads the
    ids).  Returns a SMALL frame [place, place_rank, lat, lon] — the
    broadcast dim.  The top-k collect is driver-side by design (K rows;
    the broadcast-build pattern)."""
    counts = (
        docs.select(F.explode(tokens_lower(F.col(text_col))).alias("tok"))
        .filter(F.length("tok") >= min_len)
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(top_k)
        .collect()
    )
    spark = docs.sparkSession
    gaz = spark.createDataFrame(
        [(r["tok"], i + 1) for i, r in enumerate(counts)],
        "place string, place_rank int",
    )
    pid = F.col("place_rank").cast("long") * F.lit(7919)
    return gaz.select(
        "place", "place_rank",
        geocode_arith_lat(pid).alias("lat"),
        geocode_arith_lon(pid).alias("lon"),
    )


def place_cooccurrence(
    mentions: DataFrame,
    id_col: str = "doc_id",
    place_col: str = "place",
) -> DataFrame:
    """Co-mention edges from :func:`gazetteer_geoparse` output: ordered
    place pairs appearing in the same document, weighted by document
    count — the toponym-association graph (feeds pagerank/community
    detection over places).

    Scale shape: ONE self-join keyed on the document id; per-doc fanout
    is bounded by the gazetteer hit count (<= K places -> <= K^2/2 pairs
    per doc), so the exchange carries mention rows, never text.  Returns
    [place_a, place_b, n_docs] with place_a < place_b."""
    m = mentions.select(id_col, place_col).distinct()
    a, b = m.alias("a"), m.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.{id_col}") == F.col(f"b.{id_col}"))
            & (F.col(f"a.{place_col}") < F.col(f"b.{place_col}")),
        )
        .groupBy(
            F.col(f"a.{place_col}").alias("place_a"),
            F.col(f"b.{place_col}").alias("place_b"),
        )
        .agg(F.count("*").alias("n_docs"))
    )


def gazetteer_geoparse(
    docs: DataFrame,
    gazetteer: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document place mentions: explode the token stream, semi-match
    against the BROADCAST gazetteer, roll up mention counts.  Returns
    [doc_id, place, place_rank, lat, lon, n_mentions]."""
    toks = docs.select(
        F.col(id_col),
        F.explode(tokens_lower(F.col(text_col))).alias("place"),
    )
    return (
        toks.join(F.broadcast(gazetteer), "place")
        .groupBy(id_col, "place", "place_rank", "lat", "lon")
        .agg(F.count("*").alias("n_mentions"))
    )
