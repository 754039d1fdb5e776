"""Tile worklist sources (reference A2/A3/A4).

The reference reads tile lists from stdin ('z/x/y' lines, optionally
',layer'-suffixed — reference scripts/generate.py:63, tile.py:57-74) and
generates full zoom ranges via Tilerange (tilerange.py:4-17).  Here each
becomes a DataFrame source:

- ``tiles_from_lines``  — parse + dedup 'z/x/y' lines (A2)
- ``tile_layers_from_lines`` — parse 'z/x/y,layer', group layers per tile (A3)
- ``tilerange_df``      — spark.range over the Hilbert tileid interval (A4):
  lazy like the reference (a Range scan, never materialized on the driver),
  decoded to (zoom, x, y) by the vectorized codec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tilekiln_spark.functions.tileids import tileid, tileid_zxy
from tilekiln_spark.tiles.core import MAX_ZOOM, zxy_to_tileid


def _parse_zxy(line) -> list:
    t = F.split(line, "/")
    return [
        t[0].cast("int").alias("zoom"),
        t[1].cast("int").alias("x"),
        t[2].cast("int").alias("y"),
    ]


def tiles_from_lines(lines: DataFrame, col: str = "value") -> DataFrame:
    """'z/x/y' lines -> distinct (zoom, x, y) (reference generate.py:63 set())."""
    c = F.trim(F.col(col))
    return (
        lines.filter(c != "")
        .select(*_parse_zxy(c))
        .filter(F.col("zoom").isNotNull() & F.col("x").isNotNull() & F.col("y").isNotNull())
        .distinct()
    )


def tile_layers_from_lines(lines: DataFrame, col: str = "value") -> DataFrame:
    """'z/x/y,layer' lines -> (zoom, x, y, layers array<string>) with dedup
    (reference tile.py:57-74 dict[Tile, set[str]])."""
    c = F.trim(F.col(col))
    parts = F.split(c, ",")
    parsed = lines.filter(c != "").select(
        *_parse_zxy(parts[0]), parts[1].alias("layer")
    )
    return parsed.groupBy("zoom", "x", "y").agg(
        F.array_sort(F.collect_set("layer")).alias("layers")
    )


def tilerange_df(spark: SparkSession, minzoom: int, maxzoom: int) -> DataFrame:
    """All tiles for zooms [minzoom, maxzoom] in Hilbert order — a lazy Range
    scan over tileids (works at z30's 4^30 ids without materializing,
    reference tilerange.py:4-17), decoded to (tileid, zoom, x, y)."""
    minid = zxy_to_tileid(minzoom, 0, 0)
    maxid = zxy_to_tileid(maxzoom + 1, 0, 0) if maxzoom < MAX_ZOOM else (4 ** (MAX_ZOOM + 1) - 1) // 3
    r = spark.range(minid, maxid).select(F.col("id").alias("tileid"))
    z = tileid_zxy(F.col("tileid"))
    return r.select("tileid", z["zoom"].alias("zoom"), z["x"].alias("x"), z["y"].alias("y"))
