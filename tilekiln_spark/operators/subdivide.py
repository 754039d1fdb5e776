"""ST_Subdivide: split whale polygons into bounded-vertex parts.

The reference leans on PostGIS for polygon storage and its docs/community
playbook is explicit: pre-subdivide large basemap polygons (coastlines,
admin-0) with ``ST_Subdivide`` so per-tile index probes touch small
geometries (the reference executes arbitrary template SQL over such
pre-subdivided tables — /root/reference/tilekiln/definition.py:42-77).
At 100 TB the same trick is what keeps the distributed PIP join flat:

- **finer grid pruning** — a continent-sized ring's bbox overlaps
  thousands of grid cells, so every point in that envelope becomes a
  candidate pair; its parts carry tight bboxes and prune to the cells
  they actually touch.
- **bounded refine cost** — the even-odd refine is O(ring vertices) per
  candidate pair; parts cap it at ``max_vertices``.
- **no whale skew** — one 100k-vertex ring no longer serializes into a
  single task's closure/batch; parts spread across the shuffle.

Execution model: subdivision is per-polygon independent → mapInPandas
(map-only, no shuffle).  The outer loop runs over the polygon dim (the
small side of every join here); the inner Sutherland–Hodgman clip is
whole-ring vectorized numpy.

Geometry contract (matches the repo's ring storage): rings are UNCLOSED
float64 arrays.  Each split clips the ring against an axis-aligned
half-plane at the bbox midpoint of the longer axis (Sutherland–Hodgman).
For CONCAVE rings a half-plane clip can emit one ring that traces several
disjoint lobes connected by zero-width corridors along the cut line —
exactly the degenerate-but-correct shape the MVT clip kernels also emit:
under the even-odd rule those corridors have no interior, so
point-in-part containment, OR-ed over parts, equals containment in the
original ring except on the measure-zero cut lines.  The PIP-equivalence
oracle (spatial_join_subdivided) pins that invariant cross-engine.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

# part ordinals are packed into the unique part key: parent_id * PART_STRIDE
# + part_id.  max_depth <= 12 (default) yields <= 4096 parts, well inside.
PART_STRIDE = 1 << 16


def clip_ring_halfplane_np(
    px: np.ndarray, py: np.ndarray, c: float, axis: int, keep_le: bool
) -> tuple[np.ndarray, np.ndarray]:
    """Sutherland–Hodgman clip of one unclosed ring against an axis-aligned
    half-plane (axis 0: x, axis 1: y; keep_le: keep coord <= c else >= c).

    Fully vectorized: per edge (i, i+1 mod n) emit v_i when inside, plus
    the edge/line intersection when the edge straddles the cut — assembled
    with a cumsum scatter, no per-vertex Python.  Consecutive duplicate
    vertices (a vertex exactly on the cut emits itself twice) are dropped;
    zero-length edges are harmless for the even-odd test but inflate the
    vertex budget."""
    n = len(px)
    if n == 0:
        return px[:0], py[:0]
    val = px if axis == 0 else py
    nxt = np.roll(np.arange(n), -1)
    vi, vj = val, val[nxt]
    inside_i = vi <= c if keep_le else vi >= c
    inside_j = vj <= c if keep_le else vj >= c
    straddle = inside_i != inside_j
    denom = np.where(straddle, vj - vi, 1.0)  # straddle implies vi != vj
    t = np.where(straddle, (c - vi) / denom, 0.0)
    ix = px + t * (px[nxt] - px)
    iy = py + t * (py[nxt] - py)
    if axis == 0:
        ix = np.where(straddle, c, ix)  # exact cut coordinate, no ulp drift
    else:
        iy = np.where(straddle, c, iy)
    counts = inside_i.astype(np.int64) + straddle.astype(np.int64)
    total = int(counts.sum())
    off = np.concatenate(([0], np.cumsum(counts)[:-1]))
    ox = np.empty(total, dtype=np.float64)
    oy = np.empty(total, dtype=np.float64)
    ox[off[inside_i]] = px[inside_i]
    oy[off[inside_i]] = py[inside_i]
    pos_x = off[straddle] + inside_i[straddle].astype(np.int64)
    ox[pos_x] = ix[straddle]
    oy[pos_x] = iy[straddle]
    if total:
        keep = (ox != np.roll(ox, 1)) | (oy != np.roll(oy, 1))
        if not keep.all():
            ox, oy = ox[keep], oy[keep]
    return ox, oy


def _ring_area2_np(xs: np.ndarray, ys: np.ndarray) -> float:
    """Twice the absolute shoelace area of an unclosed ring."""
    return float(abs(np.dot(xs, np.roll(ys, -1)) - np.dot(ys, np.roll(xs, -1))))


def subdivide_ring_np(
    px: np.ndarray, py: np.ndarray, max_vertices: int = 64, max_depth: int = 12
) -> list[tuple[np.ndarray, np.ndarray]]:
    """Recursively halve one ring's bbox along its longer axis until every
    part is <= max_vertices (or depth caps out).  Returns the parts as
    (xs, ys) unclosed arrays, zero-area slivers dropped.  Deterministic:
    the traversal order fixes part ordinals."""
    parts: list[tuple[np.ndarray, np.ndarray]] = []
    stack = [(np.asarray(px, dtype=np.float64), np.asarray(py, dtype=np.float64), 0)]
    while stack:
        xs, ys, depth = stack.pop()
        n = len(xs)
        if n < 3:
            continue
        if n <= max_vertices or depth >= max_depth:
            if _ring_area2_np(xs, ys) > 0.0:
                parts.append((xs, ys))
            continue
        x0, x1 = float(xs.min()), float(xs.max())
        y0, y1 = float(ys.min()), float(ys.max())
        if x1 - x0 >= y1 - y0:
            axis, c = 0, 0.5 * (x0 + x1)
        else:
            axis, c = 1, 0.5 * (y0 + y1)
        if not (c > (x0 if axis == 0 else y0) and c < (x1 if axis == 0 else y1)):
            # degenerate extent (all vertices collinear on the split axis):
            # the cut cannot reduce the ring; emit as-is
            if _ring_area2_np(xs, ys) > 0.0:
                parts.append((xs, ys))
            continue
        # LIFO order with >= kept first makes part ordinals follow the
        # (le, ge) split order depth-first — stable across partitionings
        for keep_le in (False, True):
            ox, oy = clip_ring_halfplane_np(xs, ys, c, axis, keep_le)
            stack.append((ox, oy, depth + 1))
    return parts


def subdivide_polygons(
    polys: DataFrame,
    max_vertices: int = 64,
    max_depth: int = 12,
) -> DataFrame:
    """ST_Subdivide over a polygon frame (repo ring schema: polygon_id,
    xmin/ymin/xmax/ymax, ring_xs/ring_ys + property columns).

    Output: one row per part with recomputed bbox, part rings, ``way_area``
    (when present) recomputed as the part's shoelace area, plus

    - ``parent_id``  — the input polygon_id
    - ``part_id``    — part ordinal within the parent (deterministic)
    - ``polygon_id`` — UNIQUE part key (parent_id * 2^16 + part_id), so the
      output composes directly with points_in_polygons' Arrow refine paths,
      which group rings by polygon_id (spatial_join.py:128).  Group results
      back by ``parent_id``.

    Map-only (no shuffle); outer loop over the polygon dim, inner clip
    whole-ring vectorized (clip_ring_halfplane_np)."""
    if max_depth > 16:
        raise ValueError("max_depth > 16 would overflow the part-key stride")
    in_schema = polys.schema
    passthrough = [
        f.name
        for f in in_schema.fields
        if f.name not in ("polygon_id", "xmin", "ymin", "xmax", "ymax",
                          "ring_xs", "ring_ys", "way_area")
    ]
    has_area = "way_area" in in_schema.fieldNames()
    out_schema = StructType(
        [in_schema["polygon_id"]]
        + [StructField("parent_id", LongType()), StructField("part_id", IntegerType())]
        + [in_schema[n] for n in
           (["way_area"] if has_area else [])
           + ["xmin", "ymin", "xmax", "ymax", "ring_xs", "ring_ys"]]
        + [in_schema[n] for n in passthrough]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in out_schema.fields}
            for i in range(len(pdf)):
                pid = int(pdf["polygon_id"].iloc[i])
                xs = np.asarray(pdf["ring_xs"].iloc[i], dtype=np.float64)
                ys = np.asarray(pdf["ring_ys"].iloc[i], dtype=np.float64)
                for part_id, (ox, oy) in enumerate(
                    subdivide_ring_np(xs, ys, max_vertices, max_depth)
                ):
                    out["polygon_id"].append(pid * PART_STRIDE + part_id)
                    out["parent_id"].append(pid)
                    out["part_id"].append(part_id)
                    if has_area:
                        out["way_area"].append(0.5 * _ring_area2_np(ox, oy))
                    out["xmin"].append(float(ox.min()))
                    out["ymin"].append(float(oy.min()))
                    out["xmax"].append(float(ox.max()))
                    out["ymax"].append(float(oy.max()))
                    out["ring_xs"].append(ox)
                    out["ring_ys"].append(oy)
                    for c in passthrough:
                        out[c].append(pdf[c].iloc[i])
            yield pd.DataFrame(out, columns=[f.name for f in out_schema.fields])

    return polys.mapInPandas(gen, schema=out_schema)
