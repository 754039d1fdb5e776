"""Geometry simplification: batch vertex thinning for MVT generalization.

The reference delegates simplification to PostGIS inside user template SQL
(``ST_Simplify(way, tol)`` — ubiquitous in real osm layer templates at low
zooms; the reference runs arbitrary template SQL,
/root/reference/tilekiln/definition.py:42-77).  This engine executes it as
a whole-batch numpy kernel over the flattened ring arrays — the same
Arrow-batch shape as the clip kernels (operators/mvt.py clip_rings_batch).

Algorithm: iterated Visvalingam–Whyatt thresholding, DISTANCE-parameterized
for ST_Simplify compatibility — a vertex is removable when its effective
triangle area (with its surviving neighbors) is below ``tol * tol``, the
area scale a deviation of ``tol`` implies.  Semantic parity with
ST_Simplify is vertex thinning under a tolerance; the algorithm differs
(PostGIS uses Douglas–Peucker, which is divide-and-conquer and hostile to
whole-batch vectorization; VW thresholding gives the same generalization
class and runs as a handful of fully vectorized passes over the entire
Arrow batch).  Deviation documented here and in SURVEY §2 notes.

Determinism: each pass computes all effective areas at once, then removes
an independent set chosen by run parity (within every maximal run of
below-threshold vertices, the 1st, 3rd, ... are removed) — no priority
queue, no tie ambiguity, byte-stable across partitionings.  Chain
endpoints are never removed (for the unclosed polygon-ring storage this
keeps vertices 0 and n-1 — one conservatively retained vertex per ring,
correct for both open chains and rings).  Rings at or below ``min_len``
vertices stop thinning (polygon validity floor).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BooleanType, DoubleType, StructField, StructType

MAX_PASSES = 8


def simplify_chains_np(
    vx: np.ndarray,
    vy: np.ndarray,
    lens: np.ndarray,
    tol: float,
    min_len: int = 3,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Thin every chain in the flattened batch (vx, vy concatenated chain
    vertices; lens = vertices per chain).  Returns the same flattened
    layout.  Pure numpy, O(total vertices) per pass, <= MAX_PASSES passes."""
    vx = np.asarray(vx, dtype=np.float64)
    vy = np.asarray(vy, dtype=np.float64)
    lens = np.asarray(lens, dtype=np.int64)
    area_thresh = float(tol) * float(tol)
    for _ in range(MAX_PASSES):
        n = len(vx)
        if n == 0:
            break
        ends = np.cumsum(lens)
        starts = ends - lens
        # effective triangle area of each interior vertex with its current
        # neighbors (endpoints get +inf: never candidates)
        ax, ay = vx[:-2], vy[:-2]
        bx, by = vx[1:-1], vy[1:-1]
        cx, cy = vx[2:], vy[2:]
        tri = np.empty(n, dtype=np.float64)
        tri[0] = np.inf
        tri[-1] = np.inf
        if n > 2:
            tri[1:-1] = 0.5 * np.abs(
                (bx - ax) * (cy - ay) - (cx - ax) * (by - ay)
            )
        # chain boundaries: first/last vertex of every chain is an endpoint
        tri[starts[lens > 0]] = np.inf
        tri[ends[lens > 0] - 1] = np.inf
        cand = tri < area_thresh
        # freeze chains already at the validity floor
        at_floor = np.repeat(lens <= min_len, lens)
        cand &= ~at_floor
        if not cand.any():
            break
        # independent set by run parity: within each maximal candidate run,
        # remove offsets 0, 2, 4, ... (runs never span chains — endpoints
        # break them)
        idx = np.arange(n)
        run_start = cand & np.concatenate([[True], ~cand[:-1]])
        start_of_run = np.maximum.accumulate(np.where(run_start, idx, -1))
        remove = cand & (((idx - start_of_run) % 2) == 0)
        keep = ~remove
        # per-chain removed counts -> new lens (prefix sums: exact for
        # zero-length chains, no reduceat bounds edge)
        cum = np.concatenate([[0], np.cumsum(remove.astype(np.int64))])
        removed_per_chain = cum[ends] - cum[starts]
        vx = vx[keep]
        vy = vy[keep]
        lens = lens - removed_per_chain
    return vx, vy, lens


_RINGS_SCHEMA = StructType(
    [
        StructField("rings_xs", ArrayType(ArrayType(DoubleType()))),
        StructField("rings_ys", ArrayType(ArrayType(DoubleType()))),
        StructField("rings_hole", ArrayType(BooleanType())),
    ]
)


def simplify_ring_cols(df: DataFrame, tolerance: float) -> DataFrame:
    """Replace the frame's ring columns with simplified rings (normalized
    to the general ``rings_xs/rings_ys/rings_hole`` layout that
    operators/tiling._poly_tile_rows consumes).

    Physical shape: ONE Arrow-batched pandas UDF; inside each batch every
    ring of every row is flattened into a single vertex array and the
    whole batch thins together — per-vertex work is vectorized numpy, the
    only Python loop is the per-row nested-list rebuild (same contract as
    the clip kernels).  Map-only: no shuffle, no driver participation."""
    from tilekiln_spark.operators.tiling import ring_col_exprs

    rxs, rys, rh = ring_col_exprs(set(df.columns))
    tol = float(tolerance)

    @F.pandas_udf(_RINGS_SCHEMA)
    def _simp(xs: pd.Series, ys: pd.Series, hole: pd.Series) -> pd.DataFrame:
        ring_counts = np.array([len(r) if r is not None else 0 for r in xs])
        flat_x: list = []
        flat_y: list = []
        lens: list = []
        null_ring: list = []  # null elements pass through untouched
        for rings_x, rings_y in zip(xs, ys):
            if rings_x is None:
                continue
            for rx, ry in zip(rings_x, rings_y):
                if rx is None or ry is None:
                    flat_x.append(np.zeros(0))
                    flat_y.append(np.zeros(0))
                    lens.append(0)
                    null_ring.append(True)
                    continue
                flat_x.append(np.asarray(rx, dtype=np.float64))
                flat_y.append(np.asarray(ry, dtype=np.float64))
                lens.append(len(rx))
                null_ring.append(False)
        if lens:
            vx = np.concatenate(flat_x)
            vy = np.concatenate(flat_y)
            ln = np.asarray(lens, dtype=np.int64)
            vx, vy, ln = simplify_chains_np(vx, vy, ln, tol)
        else:
            vx = vy = np.zeros(0)
            ln = np.zeros(0, np.int64)
        ends = np.cumsum(ln)
        starts = ends - ln
        out_xs, out_ys, out_h = [], [], []
        ring_i = 0
        for nrings, h in zip(ring_counts, hole):
            if nrings == 0:
                out_xs.append(None)
                out_ys.append(None)
                out_h.append(None)
                continue
            row_xs, row_ys = [], []
            for _ in range(nrings):
                s, e = starts[ring_i], ends[ring_i]
                if null_ring[ring_i]:
                    row_xs.append(None)
                    row_ys.append(None)
                else:
                    row_xs.append(vx[s:e])
                    row_ys.append(vy[s:e])
                ring_i += 1
            out_xs.append(row_xs)
            out_ys.append(row_ys)
            out_h.append(list(h) if h is not None else [False] * nrings)
        return pd.DataFrame(
            {"rings_xs": out_xs, "rings_ys": out_ys, "rings_hole": out_h}
        )

    simp = _simp(rxs, rys, rh).alias("_simp")
    keep = [c for c in df.columns if c not in (
        "rings_xs", "rings_ys", "rings_hole",
        "ring_xs", "ring_ys", "holes_xs", "holes_ys",
    )]
    return df.select(*keep, simp).select(
        *keep,
        F.col("_simp.rings_xs").alias("rings_xs"),
        F.col("_simp.rings_ys").alias("rings_ys"),
        F.col("_simp.rings_hole").alias("rings_hole"),
    )


# --------------------------------------------------------------------------
# Exact Douglas-Peucker (r5): GEOS/PostGIS ST_Simplify ALGORITHM parity
# for open polylines — closes the documented VW deviation for the chain
# case.  (Ring batches keep the vectorized VW above: DP's divide-and-
# conquer is per-chain; for tile-scale chains that cost is fine, and the
# per-chain work is still numpy inside one Arrow batch.)
# --------------------------------------------------------------------------

def douglas_peucker_mask_np(
    xs: np.ndarray, ys: np.ndarray, tol: float
) -> np.ndarray:
    """Keep-mask for ONE open chain under Douglas-Peucker with
    distance-to-SEGMENT (the GEOS DouglasPeuckerLineSimplifier rule):
    endpoints always kept; a span (lo, hi) splits at the interior
    vertex with the largest squared segment-distance (ties -> lowest
    index, numpy argmax first-occurrence) when that distance exceeds
    tol^2.  All float comparisons are IEEE expressions a SQL twin can
    replay verbatim."""
    n = len(xs)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep
    tol2 = float(tol) * float(tol)
    stack = [(0, n - 1)]
    while stack:
        lo, hi = stack.pop()
        if hi - lo < 2:
            continue
        ax, ay, bx, by = xs[lo], ys[lo], xs[hi], ys[hi]
        dx, dy = bx - ax, by - ay
        seg2 = dx * dx + dy * dy
        i = np.arange(lo + 1, hi)
        px, py = xs[i], ys[i]
        if seg2 == 0.0:
            d2 = (px - ax) * (px - ax) + (py - ay) * (py - ay)
        else:
            t = ((px - ax) * dx + (py - ay) * dy) / seg2
            cross = (px - ax) * dy - (py - ay) * dx
            d2 = np.where(
                t < 0.0,
                (px - ax) * (px - ax) + (py - ay) * (py - ay),
                np.where(
                    t > 1.0,
                    (px - bx) * (px - bx) + (py - by) * (py - by),
                    cross * cross / seg2,
                ),
            )
        j = int(np.argmax(d2))
        if d2[j] > tol2:
            k = lo + 1 + j
            keep[k] = True
            stack.append((lo, k))
            stack.append((k, hi))
    return keep


def douglas_peucker_cols(
    df: DataFrame,
    tolerance: float,
    xs_col: str = "xs",
    ys_col: str = "ys",
) -> DataFrame:
    """ST_Simplify (exact DP) over per-row chain arrays: replaces
    ``xs_col``/``ys_col`` with the simplified chains.  ONE Arrow-batched
    pandas UDF, map-only."""
    tol = float(tolerance)

    schema = StructType(
        [
            StructField("xs", ArrayType(DoubleType())),
            StructField("ys", ArrayType(DoubleType())),
        ]
    )

    @F.pandas_udf(schema)
    def _dp(xs: pd.Series, ys: pd.Series) -> pd.DataFrame:
        ox, oy = [], []
        for cx, cy in zip(xs, ys):
            if cx is None or cy is None:
                ox.append(None)
                oy.append(None)
                continue
            ax = np.asarray(cx, dtype=np.float64)
            ay = np.asarray(cy, dtype=np.float64)
            m = douglas_peucker_mask_np(ax, ay, tol)
            ox.append(ax[m].tolist())
            oy.append(ay[m].tolist())
        return pd.DataFrame({"xs": ox, "ys": oy})

    # ONE projection: chaining two withColumn calls would re-evaluate the
    # UDF for ys against the ALREADY-replaced xs (the self-referential
    # projection trap the chaikin query documents)
    others = [c for c in df.columns if c not in (xs_col, ys_col)]
    return df.withColumn("__dp", _dp(F.col(xs_col), F.col(ys_col))).select(
        *others,
        F.col("__dp.xs").alias(xs_col),
        F.col("__dp.ys").alias(ys_col),
    )
