"""Serving-semantics library functions (A15) — the column-expression parts of
the reference's HTTP layer (reference tilekiln/server/__init__.py:150-250),
kept HTTP-free: blob concatenation across layer columns, Last-Modified /
E-tag derivation from `generated`, and the live path's read-through fill.

MVT property: a tile is the plain concatenation of its framed layer messages,
so `payload` is just concat(layer_data...) in layer order — and Spark's
null-propagating concat reproduces the reference's 404-on-any-NULL-layer rule
(server/__init__.py:172-177) as payload IS NULL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# reference server/__init__.py:14-27
HTTP_TIME_FMT = "EEE, dd MMM yyyy HH:mm:ss 'GMT'"
MVT_MIME_TYPE = "application/vnd.mapbox-vector-tile"


def tile_payload(layers: list[str]) -> Column:
    """concat of layer blobs in layer order; NULL when ANY layer is NULL
    (the reference's storage-miss -> 404 contract)."""
    return F.concat(*[F.col(f"{L}_data") for L in layers])


def tile_generated(layers: list[str]) -> Column:
    """GREATEST over per-layer generated timestamps (B11; storage.py:290-314
    reads max(generated) for the tile)."""
    cols = [F.col(f"{L}_generated") for L in layers]
    return F.greatest(*cols) if len(cols) > 1 else cols[0]


def http_last_modified(generated: Column) -> Column:
    """reference: generated.strftime('%a, %d %b %Y %H:%M:%S GMT')."""
    return F.date_format(generated, HTTP_TIME_FMT)


def http_etag(generated: Column) -> Column:
    """reference: generated.strftime('%s.%f') — epoch seconds dot
    microseconds ('a specific z/x/y will not be generated twice in the
    same ms', server/__init__.py:180-186)."""
    return F.concat(
        F.unix_timestamp(generated).cast("string"),
        F.lit("."),
        F.date_format(generated, "SSSSSS"),
    )


def tile_responses(tiles: DataFrame, layers: list[str]) -> DataFrame:
    """Tile rows -> serving rows [zoom, x, y, payload, generated,
    last_modified, etag] — the whole GET handler minus HTTP, as one
    column-level projection (usable for bulk tile export too)."""
    gen = tile_generated(layers)
    return tiles.select(
        "zoom", "x", "y",
        tile_payload(layers).alias("payload"),
        gen.alias("generated"),
        http_last_modified(gen).alias("last_modified"),
        http_etag(gen).alias("etag"),
    )


def live_fill(tileset, config, sources: dict, zoom: int, x: int, y: int):
    """The live path's read-through (server/__init__.py:193-250): serve the
    stored tile when complete, else render ONLY the missing layers for this
    one tile, MERGE them in (partial-layer upsert preserves siblings), and
    return (payload bytes, generated) like live_serve_tile's response."""
    from tilekiln_spark.operators.tiling import render_zooms

    got = tileset.get_tile(zoom, x, y)
    existing = got[1] if got else {L: None for L in tileset.layers}
    generated = got[0] if got else None
    defined = [
        L for L in tileset.layers if config.layers[L].definition_for(zoom) is not None
    ]
    missing = [L for L in defined if existing.get(L) is None]
    if not missing:
        payload = b"".join(bytes(existing[L]) for L in defined if existing[L] is not None)
        return payload, generated
    spark = tileset.store.spark
    wl = spark.createDataFrame([(zoom, x, y)], "zoom int, x int, y int")
    from tilekiln_spark.streaming.incremental import blank_fill

    rendered = render_zooms(config, [zoom], sources, worklist=wl, layers=missing)
    if rendered is not None:
        tileset.save_tiles(blank_fill(config, rendered, wl, [zoom]))
    got = tileset.get_tile(zoom, x, y)
    new_existing = got[1]
    generated = got[0]
    # reference response order: freshly rendered layers first, then the
    # already-stored ones (server/__init__.py:242-245)
    payload = b"".join(
        bytes(new_existing[L]) for L in missing if new_existing.get(L) is not None
    ) + b"".join(
        bytes(existing[L]) for L in defined
        if L not in missing and existing.get(L) is not None
    )
    return payload, generated
