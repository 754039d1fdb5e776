"""ST_Subdivide (operators/subdivide.py): whale polygons split to
bounded-vertex parts whose even-odd union preserves containment exactly.

Parity target: PostGIS ST_Subdivide's contract — parts cover the input,
each under the vertex budget — which the reference's deployment playbook
applies to large basemap polygons before tiling (the reference executes
arbitrary template SQL over pre-subdivided tables,
/root/reference/tilekiln/definition.py:42-77)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tilekiln_spark.operators.spatial_join import points_in_polygons
from tilekiln_spark.operators.subdivide import (
    PART_STRIDE,
    _ring_area2_np,
    clip_ring_halfplane_np,
    subdivide_polygons,
    subdivide_ring_np,
)


def _raycast_np(px, py, xs, ys):
    xj, yj = np.roll(xs, -1), np.roll(ys, -1)
    straddle = (ys[None, :] > py[:, None]) != (yj[None, :] > py[:, None])
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = xs[None, :] + (py[:, None] - ys[None, :]) * (xj - xs)[None, :] / (yj - ys)[None, :]
    return ((straddle & (px[:, None] < xint)).sum(axis=1) & 1).astype(bool)


def _star(m=400, seed=7):
    th = np.linspace(0, 2 * np.pi, m, endpoint=False)
    r = 1.0 + 0.6 * np.sin(7 * th) + 0.2 * np.sin(23 * th)
    return r * np.cos(th), r * np.sin(th)


def test_clip_halfplane_square():
    xs = np.array([0.0, 4.0, 4.0, 0.0])
    ys = np.array([0.0, 0.0, 4.0, 4.0])
    ox, oy = clip_ring_halfplane_np(xs, ys, 1.0, 0, True)
    assert _ring_area2_np(ox, oy) / 2 == 4.0  # 1 x 4 strip
    assert ox.max() == 1.0 and len(ox) == 4
    ox, oy = clip_ring_halfplane_np(xs, ys, 1.0, 1, False)
    assert _ring_area2_np(ox, oy) / 2 == 12.0  # 4 x 3 upper strip
    # vertex exactly on the cut is emitted once (consecutive-dup drop)
    ox, oy = clip_ring_halfplane_np(xs, ys, 4.0, 0, True)
    assert len(ox) == 4 and _ring_area2_np(ox, oy) / 2 == 16.0


def test_subdivide_bounds_area_and_pip_equivalence():
    xs, ys = _star()
    parts = subdivide_ring_np(xs, ys, max_vertices=32)
    assert len(parts) > 4
    assert max(len(p[0]) for p in parts) <= 32
    a0 = _ring_area2_np(xs, ys)
    assert abs(sum(_ring_area2_np(px, py) for px, py in parts) - a0) <= 1e-9 * a0
    rng = np.random.default_rng(3)
    px = rng.uniform(-1.8, 1.8, 20000)
    py = rng.uniform(-1.8, 1.8, 20000)
    orig = _raycast_np(px, py, xs, ys)
    sub = np.zeros_like(orig)
    for qx, qy in parts:
        sub |= _raycast_np(px, py, qx, qy)
    assert (orig == sub).all()
    # interior disjointness: each inside point hits exactly ONE part
    hits = np.zeros(len(px), dtype=np.int64)
    for qx, qy in parts:
        hits += _raycast_np(px, py, qx, qy)
    assert (hits[orig] == 1).all() and (hits[~orig] == 0).all()


def test_subdivide_depth_cap_and_degenerates():
    xs, ys = _star(64)
    parts = subdivide_ring_np(xs, ys, max_vertices=4, max_depth=2)
    # depth cap: parts may exceed the vertex budget but are at most 4
    assert 1 <= len(parts) <= 4
    # degenerate input: < 3 vertices and zero-area rings vanish
    assert subdivide_ring_np(np.array([0.0, 1.0]), np.array([0.0, 1.0])) == []
    assert (
        subdivide_ring_np(np.array([0.0, 1.0, 2.0]), np.array([0.0, 1.0, 2.0]), 2, 3)
        == []
    )


def test_subdivide_polygons_frame(spark):
    from tilekiln_spark.sources.pages import layer_polygons

    polys = layer_polygons(spark, 30)
    parts = subdivide_polygons(polys, max_vertices=5)
    pdf = parts.toPandas()
    assert (pdf["ring_xs"].map(len) <= 5).all()
    assert (pdf["polygon_id"] == pdf["parent_id"] * PART_STRIDE + pdf["part_id"]).all()
    assert pdf["polygon_id"].is_unique
    # bbox recomputed per part, passthrough columns preserved
    assert set(pdf.columns) >= {"layer", "admin_level", "name", "way_area"}
    some = pdf.iloc[0]
    assert some["xmin"] == min(some["ring_xs"]) and some["ymax"] == max(some["ring_ys"])
    # per-parent area conservation against the input rings
    orig = {r["polygon_id"]: _ring_area2_np(np.array(r["ring_xs"]), np.array(r["ring_ys"])) / 2
            for r in polys.collect()}
    got = pdf.groupby("parent_id")["way_area"].sum()
    for pid, a in got.items():
        assert abs(a - orig[pid]) <= 1e-9 * max(orig[pid], 1.0)
    with pytest.raises(ValueError, match="stride"):
        subdivide_polygons(polys, max_depth=17)


def test_subdivided_join_matches_raw(spark):
    """The composed contract: PIP join against the parts, deduped per
    parent, returns exactly the raw-polygon join — on the mixed
    convex/concave fixture set through every refine path's grid join."""
    from tilekiln_spark.operators.tiling import pages_geo
    from tilekiln_spark.sources.pages import layer_polygons, pages

    pts = pages_geo(pages(spark, 3000)).cache()
    polys = layer_polygons(spark, 25).cache()
    raw = points_in_polygons(pts, polys, how="grid", grid_zoom=4, refine="raycast")
    want = sorted((r.url, r.polygon_id) for r in raw.select("url", "polygon_id").collect())
    parts = subdivide_polygons(polys, max_vertices=5)
    j = points_in_polygons(pts, parts, how="grid", grid_zoom=4, refine="raycast")
    got = sorted(
        (r.url, r.parent_id)
        for r in j.select("url", "parent_id").dropDuplicates().collect()
    )
    assert got == want and want
    pts.unpersist()
    polys.unpersist()
