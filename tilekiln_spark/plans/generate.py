"""Top-level generation jobs — the engine's `tilekiln generate` equivalents.

Mirrors the reference CLI lifecycle (reference scripts/generate.py:24-220,
SURVEY §3.1): config load -> worklist build -> distributed render -> store,
with the reference's process-pool fan-out replaced by one Catalyst plan per
zoom batch and resumability via TileStore snapshots.

- ``generate_zooms``  — render every tile in a zoom range ('generate zooms')
- ``generate_tiles``  — render an explicit tile worklist ('generate tiles',
  stdin 'z/x/y' lines -> tiles_from_lines)
- ``generate_layers`` — per-tile layer subsets ('generate layers', stdin
  'z/x/y,layer' lines): renders only the listed layers per tile, preserving
  sibling layer columns via the partial-layer MERGE (storage.py:371-390)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tilekiln_spark.config.model import Config
from tilekiln_spark.operators.tiling import render_zooms
from tilekiln_spark.storage.tileset import Tileset


def generate_zooms(
    spark: SparkSession,
    config: Config,
    sources: dict,
    store_root: str,
    minzoom: int,
    maxzoom: int,
) -> Tileset:
    """Render all tiles with >=1 feature for zooms [minzoom, maxzoom] and
    upsert into the tileset store.  (The reference renders every tile of the
    range including empty ones via Tilerange — pass a tilerange_df worklist
    for that behavior; the default materializes only non-empty tiles, which
    is the only tractable form at z14's 3.6e8 tiles.)"""
    ts = Tileset.from_config(spark, store_root, config)
    tiles = render_zooms(config, list(range(minzoom, maxzoom + 1)), sources)
    if tiles is not None:
        ts.save_tiles(tiles)
    return ts


def generate_tiles(
    spark: SparkSession,
    config: Config,
    sources: dict,
    tileset: Tileset,
    worklist: DataFrame,
) -> int | None:
    """Render an explicit (zoom, x, y) worklist and upsert — the 'expired
    tiles on stdin' path (reference generate.py:56-85).  Returns snapshot id."""
    from tilekiln_spark.streaming.incremental import regenerate

    return regenerate(config, sources, tileset.store, worklist)


def generate_layers(
    spark: SparkSession,
    config: Config,
    sources: dict,
    tileset: Tileset,
    tile_layers: DataFrame,
) -> list[int]:
    """Per-tile layer subsets (reference generate.py:157-220 + tile.py:57-74):
    input (zoom, x, y, layers array<string>); each distinct layer set renders
    only those layers for its tiles, so sibling layer columns are preserved
    by the partial-layer MERGE."""
    snaps = []
    layer_sets = [
        tuple(r.layers)
        for r in tile_layers.select(F.col("layers")).distinct().collect()
    ]
    for layers in layer_sets:
        wl = tile_layers.filter(
            F.array_join(F.col("layers"), ",") == ",".join(layers)
        ).select("zoom", "x", "y")
        zooms = sorted(r.zoom for r in wl.select("zoom").distinct().collect())
        if not zooms:
            continue
        tiles = render_zooms(config, zooms, sources, worklist=wl, layers=list(layers))
        if tiles is None:
            continue
        snaps.append(tileset.save_tiles(tiles))
    return snaps
