"""Serving-semantics functions (A15): blob concat order, Last-Modified /
E-tag derivation, live read-through fill (reference server/__init__.py)."""

import datetime

import pyspark.sql.functions as F
import pytest

from tilekiln_spark.config.model import Config
from tilekiln_spark.storage.serving import (
    http_etag,
    http_last_modified,
    live_fill,
    tile_payload,
    tile_responses,
)
from tilekiln_spark.storage.tileset import Tileset


def test_payload_concat_order_and_null(spark):
    df = spark.createDataFrame(
        [(4, 1, 2, b"WW", b"AA"), (4, 1, 3, b"WW", None)],
        "zoom int, x int, y int, water_data binary, admin_data binary",
    )
    rows = {
        (r.zoom, r.x, r.y): r.payload
        for r in df.select(
            "zoom", "x", "y", tile_payload(["water", "admin"]).alias("payload")
        ).collect()
    }
    assert bytes(rows[(4, 1, 2)]) == b"WWAA"  # layer order, not alphabetical luck
    assert rows[(4, 1, 3)] is None  # any NULL layer -> storage-miss (404)


def test_http_headers_match_strftime(spark):
    ts = datetime.datetime(2026, 3 , 5, 7, 9, 11, 123456, tzinfo=datetime.timezone.utc)
    df = spark.createDataFrame([(ts,)], "generated timestamp")
    r = df.select(
        http_last_modified(F.col("generated")).alias("lm"),
        http_etag(F.col("generated")).alias("etag"),
    ).head()
    assert r.lm == ts.strftime("%a, %d %b %Y %H:%M:%S GMT")
    assert r.etag == f"{int(ts.timestamp())}.123456"


def test_tile_responses_shape(spark):
    ts1 = datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc)
    ts2 = datetime.datetime(2026, 2, 2, tzinfo=datetime.timezone.utc)
    df = spark.createDataFrame(
        [(0, 0, 0, ts1, b"W", ts2, b"A")],
        "zoom int, x int, y int, water_generated timestamp, water_data binary, "
        "admin_generated timestamp, admin_data binary",
    )
    r = tile_responses(df, ["water", "admin"]).head()
    assert bytes(r.payload) == b"WA"
    assert r.generated.replace(tzinfo=datetime.timezone.utc) == ts2  # GREATEST
    assert r.etag.startswith(str(int(ts2.timestamp())))


CFG = """
metadata: {id: live1}
vector_layers:
  water:
    fields: {water: T}
    sql:
    - {minzoom: 0, maxzoom: 8, extent: 2048, file: water.b}
  country_names:
    fields: {name: N, area: A}
    sql:
    - {minzoom: 3, maxzoom: 14, file: country.b}
"""


def test_live_fill_renders_missing_layers(spark, tmp_path):
    from tilekiln_spark.operators.mvt import decode_tile
    from tilekiln_spark.operators.tiling import pages_geo
    from tilekiln_spark.sources.pages import layer_polygons, pages

    cfg = Config(CFG, {"water.b": "water", "country.b": "country"})
    sources = {
        "pages_geo": pages_geo(pages(spark, 400)).cache(),
        "layer_polygons": layer_polygons(spark, 20).cache(),
    }
    ts = Tileset.from_config(spark, str(tmp_path), cfg)
    # nothing stored yet: live fill renders BOTH layers for the tile
    payload, generated = live_fill(ts, cfg, sources, 4, 8, 8)
    assert generated is not None
    layers = decode_tile(bytes(payload))
    assert [l["name"] for l in layers] == ["country_names", "water"] or \
           [l["name"] for l in layers] == ["water", "country_names"]
    # second fetch: storage hit, identical payload modulo layer order
    payload2, gen2 = live_fill(ts, cfg, sources, 4, 8, 8)
    assert {l["name"] for l in decode_tile(bytes(payload2))} == \
           {l["name"] for l in layers}
    assert gen2 == generated  # nothing re-rendered, timestamps preserved
