"""Spark column functions for tile addressing.

The Hilbert tileid codec is numpy-vectorized (tiles/core.py) and exposed as
Arrow-batched pandas UDFs — the only place the codec needs Python. Everything
else here (envelope math, point->tile assignment) is pure Column arithmetic so
it stays inside whole-stage codegen and Catalyst can constant-fold / push it
down (cf. the reference folding zoom/x/y/bbox into SQL literals at template
render time, reference tilekiln/definition.py:57-69).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from tilekiln_spark.tiles.core import HALF_WORLD, tileid_to_zxy_np, zxy_to_tileid_np

# --------------------------------------------------------------------------
# tileid <-> z/x/y (pandas UDFs; vectorized numpy inside)
# --------------------------------------------------------------------------


@F.pandas_udf(LongType())
def tileid(zoom: pd.Series, x: pd.Series, y: pd.Series) -> pd.Series:
    """(zoom, x, y) -> PMTiles Hilbert tileid (reference tilekiln/tile.py:9)."""
    return pd.Series(
        zxy_to_tileid_np(zoom.to_numpy(), x.to_numpy(), y.to_numpy())
    )


_ZXY_SCHEMA = StructType(
    [
        StructField("zoom", LongType()),
        StructField("x", LongType()),
        StructField("y", LongType()),
    ]
)


@F.pandas_udf(_ZXY_SCHEMA)
def tileid_zxy(tid: pd.Series) -> pd.DataFrame:
    """tileid -> struct(zoom, x, y) (reference tilekiln/tile.py:47-50)."""
    z, x, y = tileid_to_zxy_np(tid.to_numpy())
    return pd.DataFrame({"zoom": z, "x": x, "y": y})


# --------------------------------------------------------------------------
# Web-mercator column math (no UDF — whole-stage codegen)
# --------------------------------------------------------------------------


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def merc_x(lon: Column | str) -> Column:
    """Longitude (deg) -> web-mercator X. Pure arithmetic."""
    return _c(lon) / F.lit(180.0) * F.lit(HALF_WORLD)


def merc_y(lat: Column | str) -> Column:
    """Latitude (deg) -> web-mercator Y (spherical mercator)."""
    lat = _c(lat)
    return (
        F.log(F.tan(F.lit(3.141592653589793) / 4 + F.radians(lat) / 2))
        / F.lit(3.141592653589793)
        * F.lit(HALF_WORLD)
    )


def inv_merc_x(mx: Column | str) -> Column:
    """Web-mercator X -> longitude (deg). Exact inverse of merc_x."""
    return _c(mx) / F.lit(HALF_WORLD) * F.lit(180.0)


def inv_merc_y(my: Column | str) -> Column:
    """Web-mercator Y -> latitude (deg): 2 atan(exp(y/R_pi)) - pi/2."""
    my = _c(my)
    pi = 3.141592653589793
    return F.degrees(
        F.lit(2.0) * F.atan(F.exp(my / F.lit(HALF_WORLD) * F.lit(pi))) - F.lit(pi / 2)
    )


def _n_tiles(zoom: Column) -> Column:
    """2^zoom as a long — shiftleft, not pow: with zoom as a COLUMN (the
    zoom-as-data render plan) StrictMath.pow runs per row and showed up in
    executor thread dumps; a bitshift is exact for the full zoom range."""
    return F.call_function("shiftleft", F.lit(1).cast("long"), zoom.cast("int"))


def tile_length_col(zoom: Column) -> Column:
    """Tile side length in mercator units (reference definition.py:80-83)."""
    return F.lit(2.0 * HALF_WORLD) / _n_tiles(zoom)


def tile_x(zoom: Column, mx: Column) -> Column:
    """Mercator X -> tile column at zoom, clamped to [0, 2^zoom)."""
    raw = F.floor((mx + F.lit(HALF_WORLD)) / tile_length_col(zoom))
    return F.greatest(F.lit(0), F.least(raw, _n_tiles(zoom) - 1)).cast("int")


def tile_y(zoom: Column, my: Column) -> Column:
    """Mercator Y -> tile row at zoom (row 0 at the north edge), clamped."""
    raw = F.floor((F.lit(HALF_WORLD) - my) / tile_length_col(zoom))
    return F.greatest(F.lit(0), F.least(raw, _n_tiles(zoom) - 1)).cast("int")


def envelope_cols(zoom: Column, x: Column, y: Column, margin: Column | float = 0.0):
    """(xmin, ymin, xmax, ymax) Columns for a tile, margin = fraction of tile
    width — arithmetic ST_TileEnvelope (reference tile.py:52-54)."""
    if not isinstance(margin, Column):
        margin = F.lit(float(margin))
    length = tile_length_col(zoom)
    m = margin * length
    xmin = F.lit(-HALF_WORLD) + x * length
    ymax = F.lit(HALF_WORLD) - y * length
    return (xmin - m, ymax - length - m, xmin + length + m, ymax + m)


def cell_id(zoom: Column, mx: Column, my: Column) -> Column:
    """Hierarchical spatial cell id: (zoom, tile_x, tile_y) packed into one
    long — z-prefixed quadtree cell, our H3/S2 stand-in.  Pure arithmetic
    (interleaving not required for equi-join correctness): id =
    (zoom << 58) | (x << 29) | y, valid to z29."""
    tx = tile_x(zoom, mx).cast("long")
    ty = tile_y(zoom, my).cast("long")
    return (
        F.shiftleft(zoom.cast("long"), 58)
        .bitwiseOR(F.shiftleft(tx, 29))
        .bitwiseOR(ty)
    )


def tile_pyramid_rollup(
    tiles: DataFrame,
    aggs: dict[str, Column],
    zoom_col: str = "zoom",
    x_col: str = "x",
    y_col: str = "y",
    min_zoom: int = 0,
) -> DataFrame:
    """Ancestor rollup over the tile pyramid: aggregate each input tile
    into EVERY ancestor tile from its own zoom up to ``min_zoom`` (the
    zoom-p ancestor of (z,x,y) is (p, x >> (z-p), y >> (z-p)) — slippy-map
    key math, same convention as the reference's zoom/x/y addressing,
    /root/reference/tilekiln/tile.py).  ``aggs`` maps output column names
    to aggregate Columns over the input rows (e.g. ``{"n_tiles":
    F.count("*"), "total_bytes": F.sum("n_bytes")}``).  This is the
    overview/statistics pass a tile store runs after generation: bytes and
    tile counts per ancestor at every zoom, in one job.

    Physical shape: one generated-column explode (<= z - min_zoom + 1 rows
    per tile — bounded by the zoom depth, never by data) and ONE
    partial-aggregated groupBy on (zoom, x, y).  The map-side combine
    collapses the 4^k-descendant fan-in inside each scan partition before
    the exchange, so the shuffle carries at most one row per (ancestor,
    partition) — the same hierarchical-aggregation shape as a rollup cube,
    without materializing intermediate levels."""
    # tiles shallower than min_zoom have no ancestors in range: exclude
    # them (F.sequence(lo, hi) with lo > hi counts DOWN and the negative
    # shift would wrap, manufacturing fake ancestor rows)
    z = F.col(zoom_col).cast("int")
    e = tiles.where(z >= F.lit(int(min_zoom))).withColumn(
        "_pz", F.explode(F.sequence(F.lit(int(min_zoom)), z))
    )
    px = F.expr(f"{x_col} div shiftleft(1L, {zoom_col} - _pz)")
    py = F.expr(f"{y_col} div shiftleft(1L, {zoom_col} - _pz)")
    return (
        e.select(
            F.col("_pz").alias(zoom_col),
            px.alias(x_col),
            py.alias(y_col),
            *[c for c in e.columns if c not in (zoom_col, x_col, y_col, "_pz")],
        )
        .groupBy(zoom_col, x_col, y_col)
        .agg(*[expr.alias(name) for name, expr in aggs.items()])
    )


def quadkey(zoom: Column, x: Column, y: Column) -> Column:
    """Bing-maps quadkey string for tile (zoom, x, y) — the third tile
    addressing the stack speaks beside z/x/y and the PMTiles Hilbert
    tileid (tiles/core.py): digit i (1..zoom, coarsest first) is
    ``bit(x, zoom-i) + 2*bit(y, zoom-i)``.  Pure codegen: bits via
    floor-divide by power(2, zoom-i) (exact in float64 for zoom <= 30),
    ONE transform over the zoom sequence + array_join — no UDF."""
    i = F.sequence(F.lit(1), zoom)

    def bit(v: Column, k: Column) -> Column:
        return F.floor(v / F.pow(F.lit(2.0), k)).cast("long") % 2

    digits = F.transform(
        i,
        lambda j: (bit(x, (zoom - j).cast("double"))
                   + 2 * bit(y, (zoom - j).cast("double"))).cast("string"),
    )
    # F.sequence(1, 0) steps DOWN to [1, 0] (same footgun ring_area
    # guards): the zoom-0 root tile's quadkey is the EMPTY string
    return F.when(zoom > 0, F.array_join(digits, "")).otherwise(F.lit(""))


def quadkey_decode(qk: Column) -> tuple[Column, Column, Column]:
    """Inverse of :func:`quadkey`: (zoom, x, y) from the digit string —
    one fold over the characters (each digit shifts-in one x and one y
    bit); zoom is the string length."""
    chars = F.split(qk, "").cast("array<int>")
    acc = F.aggregate(
        chars,
        F.struct(F.lit(0).cast("long").alias("x"), F.lit(0).cast("long").alias("y")),
        lambda a, d: F.struct(
            (a["x"] * 2 + d % 2).alias("x"), (a["y"] * 2 + (d / 2).cast("long")).alias("y")
        ),
    )
    # the empty root quadkey decodes to (0, 0, 0); F.split("", "")
    # yields [""] whose int cast is null, so guard rather than fold
    zero = F.lit(0).cast("long")
    z = F.length(qk)
    return (
        z,
        F.when(z > 0, acc["x"]).otherwise(zero),
        F.when(z > 0, acc["y"]).otherwise(zero),
    )


def quadkey_sql(zoom: int, x: str, y: str) -> str:
    """DuckDB twin of :func:`quadkey` for a LITERAL zoom — the identical
    floor-divide bit arithmetic, digits joined coarsest-first."""
    return (
        f"array_to_string(list_transform(range(1, {zoom} + 1), i -> "
        f"CAST(CAST(floor({x} / power(2, {zoom} - i)) AS BIGINT) % 2 "
        f"+ 2 * (CAST(floor({y} / power(2, {zoom} - i)) AS BIGINT) % 2) "
        f"AS VARCHAR)), '')"
    )
