"""Deterministic synthetic feature sources.

``pages(spark, n)`` — the engine's primary input per BASELINE input_hint:
Common-Crawl-style web pages ``(url, warc_ts, html, text, lang)``.  Generated
entirely with Column expressions over ``spark.range`` (no UDF, no driver-side
data): same n -> byte-identical table at any partitioning, and it scales to
arbitrary n on a real cluster because generation is embarrassingly parallel.

Skew is built in on purpose: 80% of rows land on 3 dense hosts, which the
geocoder turns into 3 dense spatial clusters — the "dense web regions" the
north_rule requires salted/adaptive handling for.

``layer_polygons(spark, ...)`` — the spatial-join right side (stands in for
planet_osm_polygon / simplified_water_polygons / ne_* in the reference sample
templates).  Small dimension table, generated driver-side with seeded numpy,
always broadcast.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tilekiln_spark.tiles.core import HALF_WORLD

LANGS = ["en", "de", "fr", "ja", "und"]

_VOCAB = [
    "lorem", "ipsum", "dolor", "sit", "amet", "consectetur", "adipiscing",
    "elit", "sed", "do", "eiusmod", "tempor", "incididunt", "ut", "labore",
    "et", "dolore", "magna", "aliqua", "enim", "ad", "minim", "veniam",
    "quis", "nostrud", "exercitation", "ullamco", "laboris", "nisi",
    "aliquip", "ex", "ea", "commodo", "consequat", "duis", "aute", "irure",
    "in", "reprehenderit", "voluptate", "velit", "esse", "cillum", "fugiat",
    "nulla", "pariatur", "excepteur", "sint", "occaecat", "cupidatat",
    "non", "proident", "sunt", "culpa", "qui", "officia", "deserunt",
    "mollit", "anim", "id", "est", "laborum", "aqua", "terra",
]

N_DENSE_HOSTS = 3
N_SPARSE_HOSTS = 97


def pages(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Deterministic pages table (FIXTURES.md §1): url, warc_ts, html, text, lang."""
    df = spark.range(0, n, 1, partitions) if partitions else spark.range(n)
    i = F.col("id")
    lang = F.element_at(F.array(*[F.lit(v) for v in LANGS]), (i % 5 + 1).cast("int"))
    # 80% of pages on 3 dense hosts -> spatial skew fixture
    host_idx = F.when(i % 10 < 8, i % N_DENSE_HOSTS).otherwise(
        N_DENSE_HOSTS + F.pmod(i, F.lit(N_SPARSE_HOSTS))
    )
    url = F.concat(
        F.lit("https://host"), host_idx.cast("string"), F.lit(".example/"),
        lang, F.lit("/page"), i.cast("string"),
    )
    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    nwords = (i % 20 + 5).cast("int")
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(0), nwords - 1),
            lambda j: F.element_at(vocab, ((i * 31 + j * 7) % len(_VOCAB) + 1).cast("int")),
        ),
        " ",
    )
    html = F.concat(
        F.lit("<html><head><title>p"), i.cast("string"),
        F.lit("</title></head><body>"), text, F.lit("</body></html>"),
    )
    return df.select(
        url.alias("url"),
        (F.to_timestamp(F.lit("2026-01-01 00:00:00")) + F.make_interval(secs=i * 13)).alias("warc_ts"),
        F.encode(html, "utf-8").alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )


def extract_text(html_col) -> F.Column:
    """Extract body text from the html bytes.

    Invariant (BASELINE input_hint): byte-identical to the stored ``text``
    per url — tested in tests/test_pages.py. Pure column expression."""
    return F.regexp_extract(F.decode(html_col, "utf-8"), r"<body>(.*)</body>", 1)


# --------------------------------------------------------------------------
# layer polygons — broadcast-side dimension table (FIXTURES.md §2)
# --------------------------------------------------------------------------


def layer_polygons_pdf(n_per_layer: int = 120, seed: int = 42) -> pd.DataFrame:
    """Seeded polygon set as pandas (driver-side; this is the broadcast dim).

    Mixed CONVEX (rectangles + clipped octagons) and CONCAVE (L-shapes)
    polygons in web-mercator, spread so low-zoom tiles intersect a handful
    each.  Real basemap polygons are overwhelmingly concave — roughly a
    third of the fixture is concave so every flagship render/oracle/bench
    path exercises the even-odd ray-cast refine (VERDICT r3 #1).  Columns
    per FIXTURES.md §2."""
    rng = np.random.default_rng(seed)
    rows = []
    pid = 0
    for layer in ("water", "admin", "country_names"):
        # polygon centers spread over the world, sizes log-spaced so the
        # way_area generalization thresholds (SURVEY B9) bite at some zooms
        cx = rng.uniform(-HALF_WORLD * 0.95, HALF_WORLD * 0.95, n_per_layer)
        cy = rng.uniform(-HALF_WORLD * 0.85, HALF_WORLD * 0.85, n_per_layer)
        half = 10 ** rng.uniform(4.0, 6.8, n_per_layer)  # 10 km .. ~6000 km half-width
        shape = rng.random(n_per_layer)  # <1/3 octagon, <2/3 rect, else L
        for k in range(n_per_layer):
            h = float(half[k])
            px, py = float(cx[k]), float(cy[k])
            if shape[k] < 1 / 3:
                c = 0.4142 * h  # corner cut -> regular-ish octagon, convex
                xs = [px - h, px - c, px + c, px + h, px + h, px + c, px - c, px - h]
                ys = [py - c, py - h, py - h, py - c, py + c, py + h, py + h, py + c]
            elif shape[k] < 2 / 3:
                xs = [px - h, px + h, px + h, px - h]
                ys = [py - h, py - h, py + h, py + h]
            else:
                # CONCAVE L: the square minus its NE quadrant; reflex at center
                xs = [px - h, px + h, px + h, px, px, px - h]
                ys = [py - h, py - h, py, py, py + h, py + h]
            area = _poly_area(xs, ys)
            rows.append(
                {
                    "polygon_id": pid,
                    "layer": layer,
                    "admin_level": str(int(rng.integers(0, 7))),
                    "name": None if rng.random() < 0.25 else f"{layer}_{pid}",
                    "way_area": area,
                    "xmin": min(xs), "ymin": min(ys),
                    "xmax": max(xs), "ymax": max(ys),
                    "ring_xs": xs, "ring_ys": ys,
                }
            )
            pid += 1
    return pd.DataFrame(rows)


def _poly_area(xs, ys) -> float:
    """Shoelace area of a simple polygon."""
    n = len(xs)
    s = 0.0
    for i in range(n):
        j = (i + 1) % n
        s += xs[i] * ys[j] - xs[j] * ys[i]
    return abs(s) / 2.0


POLYGON_SCHEMA = (
    "polygon_id long, layer string, admin_level string, name string, "
    "way_area double, xmin double, ymin double, xmax double, ymax double, "
    "ring_xs array<double>, ring_ys array<double>"
)


def layer_polygons(spark: SparkSession, n_per_layer: int = 120, seed: int = 42) -> DataFrame:
    return spark.createDataFrame(layer_polygons_pdf(n_per_layer, seed), schema=POLYGON_SCHEMA)
