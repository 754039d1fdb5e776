"""Raster <-> vector operators (north_rule family)."""

import numpy as np
import pyspark.sql.functions as F

from tilekiln_spark.operators.raster import raster_grids, rasterize, vectorize
from tilekiln_spark.operators.spatial_join import points_in_polygons
from tilekiln_spark.operators.tiling import pages_geo
from tilekiln_spark.sources.pages import pages


def test_rasterize_counts_and_grid_blob(spark):
    pts = pages_geo(pages(spark, 600)).cache()
    rr = rasterize(pts, zoom=1, res=8).cache()
    assert rr.agg(F.sum("n")).head()[0] == 600  # every point lands in a bin
    grids = {(r.zoom, r.x, r.y): r for r in raster_grids(rr, res=8).collect()}
    rows = rr.collect()
    by_tile = {}
    for r in rows:
        by_tile.setdefault((r.zoom, r.x, r.y), {})[(r.bin_x, r.bin_y)] = r.n
    assert grids.keys() == by_tile.keys()
    for key, g in grids.items():
        arr = np.frombuffer(bytes(g.grid), dtype=np.uint32).reshape(8, 8)
        assert g.n_points == sum(by_tile[key].values())
        for (bx, by), n in by_tile[key].items():
            assert arr[by, bx] == n
        assert arr.sum() == g.n_points
    rr.unpersist()
    pts.unpersist()


def test_vectorize_feeds_spatial_join(spark):
    # raster -> vector cells -> join points back: every point in a kept cell
    # must fall inside that cell's polygon
    pts = pages_geo(pages(spark, 400)).cache()
    rr = rasterize(pts, zoom=0, res=4)
    cells = vectorize(rr, res=4, threshold=5).withColumn(
        "polygon_id", (F.col("bin_y") * 4 + F.col("bin_x")).cast("long")
    )
    joined = points_in_polygons(pts, cells.select(
        "polygon_id", "n", "xmin", "ymin", "xmax", "ymax", "ring_xs", "ring_ys"
    ), how="broadcast")
    # each joined point's cell count n >= threshold, and per-cell join count
    # equals the raster count (cell edges are half-open in raster, closed in
    # PIP — boundary hits are measure-zero for hash-scattered points)
    per_cell = {r.polygon_id: r["cnt"] for r in joined.groupBy("polygon_id").agg(F.count("*").alias("cnt")).collect()}
    expected = {r.polygon_id: r.n for r in cells.collect()}
    assert per_cell == expected
    pts.unpersist()
