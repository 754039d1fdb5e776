"""End-to-end generation jobs (reference `tilekiln generate` lifecycle)."""

import pyspark.sql.functions as F
import pytest

from tilekiln_spark.config.model import Config
from tilekiln_spark.operators.tiling import pages_geo
from tilekiln_spark.plans.generate import generate_layers, generate_tiles, generate_zooms
from tilekiln_spark.sources.pages import layer_polygons, pages
from tilekiln_spark.sources.worklist import tile_layers_from_lines, tiles_from_lines

CFG_YAML = """
metadata: {id: v1}
vector_layers:
  water:
    fields: {water: Type of water}
    sql:
    - {minzoom: 0, maxzoom: 8, extent: 2048, file: water.b}
  country_names:
    fields: {name: Name, area: Area}
    sql:
    - {minzoom: 3, maxzoom: 14, file: country.b}
"""
TEMPLATES = {"water.b": "water", "country.b": "country"}


@pytest.fixture(scope="module")
def cfg():
    return Config(CFG_YAML, TEMPLATES)


@pytest.fixture(scope="module")
def sources(spark):
    return {
        "pages_geo": pages_geo(pages(spark, 600)).cache(),
        "layer_polygons": layer_polygons(spark, 25).cache(),
    }


def test_generate_zooms_end_to_end(spark, tmp_path, cfg, sources):
    ts = generate_zooms(spark, cfg, sources, str(tmp_path), 0, 6)
    df = ts.store.read()
    assert df.count() > 0
    zooms = {r.zoom for r in df.select("zoom").distinct().collect()}
    assert zooms <= set(range(0, 7))
    assert 0 in zooms  # z0 always has the root tile when any feature exists
    # store is zoom-partitioned on disk
    import os

    snap_dir = ts.store._snapshot_dir(ts.store.current_snapshot())
    assert any(d.startswith("zoom=") for d in os.listdir(snap_dir))


def test_generate_tiles_worklist(spark, tmp_path, cfg, sources):
    ts = generate_zooms(spark, cfg, sources, str(tmp_path), 0, 3)
    lines = spark.createDataFrame([("5/10/10",), ("5/11/10",)], "value string")
    snap = generate_tiles(spark, cfg, sources, ts, tiles_from_lines(lines))
    assert snap == ts.store.current_snapshot()
    got = {
        (r.zoom, r.x, r.y)
        for r in ts.store.read().filter(F.col("zoom") == 5).select("zoom", "x", "y").collect()
    }
    assert got == {(5, 10, 10), (5, 11, 10)}


def test_generate_layers_partial(spark, tmp_path, cfg, sources):
    ts = generate_zooms(spark, cfg, sources, str(tmp_path), 4, 4)
    before = {
        (r.zoom, r.x, r.y): (bytes(r.water_data), r.country_names_data is not None)
        for r in ts.store.read().collect()
    }
    target = next(iter(before))
    lines = spark.createDataFrame(
        [(f"{target[0]}/{target[1]}/{target[2]},water",)], "value string"
    )
    generate_layers(spark, cfg, sources, ts, tile_layers_from_lines(lines))
    after = ts.store.read().filter(
        (F.col("zoom") == target[0]) & (F.col("x") == target[1]) & (F.col("y") == target[2])
    ).head()
    # water rewritten (same bytes -> preserved semantics hold), sibling intact
    assert bytes(after.water_data) == before[target][0]
    assert (after.country_names_data is not None) == before[target][1]


def test_resume_skips_committed_tiles(spark, tmp_path, cfg, sources):
    """Checkpoint restart: re-running an interrupted worklist with
    resume_since renders only the tiles the first attempt didn't commit."""
    import datetime as dt

    from tilekiln_spark.plans.generate import resume_worklist

    ts = generate_zooms(spark, cfg, sources, str(tmp_path), 0, 2)
    job_start = dt.datetime.now() - dt.timedelta(seconds=1)
    full = spark.createDataFrame(
        [(4, 4, 4), (4, 5, 4), (4, 6, 4), (4, 7, 4)], "zoom int, x int, y int"
    )
    # "interrupted" first attempt: only the first two tiles got committed
    first_half = full.filter(F.col("x") < 6)
    generate_tiles(spark, cfg, sources, ts, first_half)
    # restart with the SAME worklist + resume filter
    remaining = resume_worklist(ts.store, full, job_start)
    got = {(r.zoom, r.x, r.y) for r in remaining.collect()}
    assert got == {(4, 6, 4), (4, 7, 4)}
    snap = generate_tiles(spark, cfg, sources, ts, full, resume_since=job_start)
    assert snap == ts.store.current_snapshot()
    z4 = {
        (r.zoom, r.x, r.y)
        for r in ts.store.read().filter(F.col("zoom") == 4).select("zoom", "x", "y").collect()
    }
    assert z4 == {(4, 4, 4), (4, 5, 4), (4, 6, 4), (4, 7, 4)}
    # tiles committed before job_start are NOT skipped (a fresh job renders them)
    old = resume_worklist(ts.store, full, dt.datetime.now() + dt.timedelta(days=1))
    assert old.count() == 4
    # layer scoping: stamps on OTHER layers (e.g. a concurrent partial-layer
    # commit) must not mark a tile done for the layers THIS job renders
    scoped = resume_worklist(ts.store, full, job_start, layers=["no_such_layer"])
    assert scoped.count() == 4
    scoped2 = resume_worklist(ts.store, full, job_start, layers=cfg.layer_names())
    assert {(r.zoom, r.x, r.y) for r in scoped2.collect()} == set()
