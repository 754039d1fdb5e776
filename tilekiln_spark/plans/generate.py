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
    worklist: DataFrame | None = None,
) -> Tileset:
    """Render tiles for zooms [minzoom, maxzoom] and upsert into the store.

    Default: materialize only tiles with >=1 feature — the only tractable
    form at z14's 3.6e8 tiles.  Pass ``worklist`` (zoom, x, y rows, e.g. a
    Tilerange DataFrame) to restore the reference's every-tile-of-the-range
    behavior: worklist tiles are rendered AND blank-filled with header-only
    MVT blobs when empty (reference Tilerange + kiln.py >=1-row contract)."""
    from tilekiln_spark.streaming.incremental import blank_fill

    ts = Tileset.from_config(spark, store_root, config)
    zooms = list(range(minzoom, maxzoom + 1))
    tiles = render_zooms(config, zooms, sources, worklist=worklist)
    if tiles is not None:
        if worklist is not None:
            tiles = blank_fill(config, tiles, worklist, zooms)
        ts.save_tiles(tiles)
    return ts


def resume_worklist(store, worklist: DataFrame, since, layers=None) -> DataFrame:
    """Checkpoint-restart filter: drop worklist tiles already (re)generated
    since ``since`` (the original job's start time).

    A crashed/interrupted generate job re-runs with the SAME worklist and
    this filter — tiles its earlier attempt committed are skipped;
    everything else renders again.  Commits are snapshot-atomic (manifest
    written last), so a half-written batch never counts as done.

    ``layers`` scopes the done-check to the layers THIS job renders
    (default: every *_generated column in the store).  Without the scope, a
    concurrent partial-layer commit by another job after ``since`` would
    mark the tile done and silently skip the layers this job still owes;
    with it, only a stamp on one of the job's own layers counts.  Within the
    job's layers 'any stamp >= since' is correct because regenerate commits
    all of a tile's layers in one atomic snapshot.  Known conservative
    behavior (documented): save_tiles preserves stamps when every owed
    layer's bytes are unchanged, so a tile whose re-render is byte-identical
    is re-rendered again on each resume — a wasted render, never a wrong
    tile.

    Implemented as a left-anti join against the committed snapshot — at
    10^12 rows this prunes via the zoom partition manifest and never touches
    blob columns (ReadSchema: zoom, x, y, generated stamps)."""
    from tilekiln_spark.storage.serving import tile_generated

    cur = store.read()
    if cur is None:
        return worklist
    store_layers = sorted(
        c[: -len("_generated")] for c in cur.columns if c.endswith("_generated")
    )
    if layers is not None:
        store_layers = [L for L in store_layers if L in set(layers)]
        if not store_layers:
            return worklist
    done = cur.filter(tile_generated(store_layers) >= F.lit(since)).select(
        "zoom", "x", "y"
    )
    return worklist.join(done, ["zoom", "x", "y"], "left_anti")


def generate_tiles(
    spark: SparkSession,
    config: Config,
    sources: dict,
    tileset: Tileset,
    worklist: DataFrame,
    resume_since=None,
) -> int | None:
    """Render an explicit (zoom, x, y) worklist and upsert — the 'expired
    tiles on stdin' path (reference generate.py:56-85).  Returns snapshot id.

    ``resume_since``: restart timestamp — skip worklist tiles already
    committed since then (see resume_worklist)."""
    from tilekiln_spark.streaming.incremental import regenerate

    if resume_since is not None:
        worklist = resume_worklist(
            tileset.store, worklist, resume_since, layers=config.layer_names()
        )
    return regenerate(config, sources, tileset.store, worklist)


def generate_layers(
    spark: SparkSession,
    config: Config,
    sources: dict,
    tileset: Tileset,
    tile_layers: DataFrame,
) -> list[int]:
    """Per-tile layer subsets (reference generate.py:157-220 + tile.py:57-74):
    input (zoom, x, y, layers array<string>); renders ONE plan + ONE commit
    per distinct *layer* (not per layer set — with L layers that is <= L
    jobs, not 2^L), passing each layer the worklist of tiles that request it.
    Sibling layer columns are preserved by the partial-layer MERGE; worklist
    tiles whose layer renders empty are blank-filled with header-only MVT
    blobs (same fill path as regenerate — a stale blob must be overwritten
    even when the fresh render is empty)."""
    from tilekiln_spark.streaming.incremental import blank_fill

    snaps = []
    all_layers = sorted(
        r.layer
        for r in tile_layers.select(F.explode("layers").alias("layer")).distinct().collect()
    )
    for layer in all_layers:
        wl = tile_layers.filter(F.array_contains(F.col("layers"), layer)).select(
            "zoom", "x", "y"
        )
        zooms = sorted(r.zoom for r in wl.select("zoom").distinct().collect())
        if not zooms:
            continue
        tiles = render_zooms(config, zooms, sources, worklist=wl, layers=[layer])
        if tiles is None:
            continue
        snaps.append(tileset.save_tiles(blank_fill(config, tiles, wl, zooms)))
    return snaps
