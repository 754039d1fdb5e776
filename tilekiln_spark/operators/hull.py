"""ST_ConvexHull over point groups (PostGIS parity — the reference's
templates may call any PostGIS function over the feature tables,
reference tilekiln/definition.py:42-77).

Spark-first shape — the hull is an associative-combinable aggregate:
``Hull(S) = Hull(Hull(S_1) ∪ ... ∪ Hull(S_k))``, so stage 1 computes a
PARTIAL hull per (input partition, group) with mapInPandas (map-only, no
shuffle — the hull analogue of a map-side combine: each partition ships
only its O(√n expected) hull vertices), and stage 2 computes the exact
final hull per group after the one groupBy shuffle.  A skewed group costs
its partial-hull sizes, never its raw row count.

Kernel: Andrew's monotone chain with STRICT turns (collinear interior
vertices dropped) over lexicographically sorted unique points — general
position assumed (exact-duplicate points are deduped; exactly-collinear
triples are measure-zero for float coordinate sources).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType


def hull_np(xs: np.ndarray, ys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Monotone-chain convex hull; returns hull vertices in CCW order
    starting at the lexicographically smallest point.  Inputs need not be
    sorted or unique.  Degenerate inputs (n <= 2 after dedupe) return the
    unique points themselves."""
    pts = np.unique(np.column_stack([np.asarray(xs, float), np.asarray(ys, float)]),
                    axis=0)
    n = len(pts)
    if n <= 2:
        return pts[:, 0], pts[:, 1]

    def chain(seq: np.ndarray) -> list:
        h: list = []
        for p in seq:
            while len(h) >= 2 and (
                (h[-1][0] - h[-2][0]) * (p[1] - h[-2][1])
                - (h[-1][1] - h[-2][1]) * (p[0] - h[-2][0])
            ) <= 0.0:
                h.pop()
            h.append(p)
        return h

    lower = chain(pts)
    upper = chain(pts[::-1])
    hull = np.array(lower[:-1] + upper[:-1])
    return hull[:, 0], hull[:, 1]


def convex_hull(
    df: DataFrame, group_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Exact convex hull per group: (group, x, y) rows -> one row per hull
    VERTEX (group, x, y).  Two-level plan (see module docstring)."""
    gf = df.schema[group_col]
    out_schema = StructType(
        [gf, StructField(x_col, DoubleType()), StructField(y_col, DoubleType())]
    )

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for g, grp in pdf.groupby(group_col, sort=False, dropna=False):
                hx, hy = hull_np(grp[x_col].values, grp[y_col].values)
                outs.append(pd.DataFrame({group_col: g, x_col: hx, y_col: hy}))
            yield (
                pd.concat(outs, ignore_index=True)
                if outs
                else pd.DataFrame({f.name: [] for f in out_schema.fields})
            )

    def final(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        hx, hy = hull_np(pdf[x_col].values, pdf[y_col].values)
        return pd.DataFrame({group_col: key[0], x_col: hx, y_col: hy})

    pre = df.select(group_col, x_col, y_col).mapInPandas(partial, schema=out_schema)
    return pre.groupBy(group_col).applyInPandas(final, schema=out_schema)


def oriented_envelope_area(
    hull_pts: DataFrame, group_col: str, x_col: str, y_col: str
) -> DataFrame:
    """PostGIS ``ST_OrientedEnvelope`` AREA per group (minimum-area
    oriented bounding box) over hull-vertex rows (:func:`convex_hull`
    output): by the rotating-calipers theorem the minimum-area enclosing
    rectangle is aligned with a hull EDGE, and every direction yields a
    valid enclosing rectangle — so min over all hull-point PAIR directions
    (a superset of the edges) is exactly the OBB area, with no ordered
    traversal.  That order-freedom is what makes it distribution- and
    twin-friendly: the candidate areas are a SET (min/max projections are
    invariant to vertex order and to extra collinear boundary points), so
    engines can disagree on hull-vertex ordering or collinear inclusions
    and still return the identical minimum.

    Cost: O(h³) per group in pure HOF expressions with h = hull size
    (O(log n)..O(n^{1/3}) for natural point clouds) — after the two-level
    hull already collapsed each group to its hull vertices map-side.

    Returns [group, obb_area] (0.0 for degenerate groups with < 3 hull
    vertices)."""
    agg = hull_pts.groupBy(group_col).agg(
        F.collect_list(x_col).alias("_hx"),
        F.collect_list(y_col).alias("_hy"),
    )
    xs, ys = F.col("_hx"), F.col("_hy")
    h = F.size(xs)
    idx = F.sequence(F.lit(1), h)
    inf = F.lit(float("inf"))

    def area_for(i: Column, j: Column) -> Column:
        dx = F.element_at(xs, j) - F.element_at(xs, i)
        dy = F.element_at(ys, j) - F.element_at(ys, i)
        d2 = dx * dx + dy * dy
        proj = F.transform(
            idx, lambda k: dx * F.element_at(xs, k) + dy * F.element_at(ys, k)
        )
        perp = F.transform(
            idx, lambda k: -dy * F.element_at(xs, k) + dx * F.element_at(ys, k)
        )
        span = (F.array_max(proj) - F.array_min(proj)) * (
            F.array_max(perp) - F.array_min(perp)
        )
        return F.when(d2 > 0, span / d2).otherwise(inf)

    best = F.aggregate(
        idx,
        inf,
        lambda acc, i: F.least(
            acc,
            F.aggregate(idx, inf, lambda acc2, j: F.least(acc2, area_for(i, j))),
        ),
    )
    return agg.select(
        group_col,
        F.when(h >= 3, best).otherwise(F.lit(0.0)).alias("obb_area"),
    )


def minimum_bounding_radius(
    hull_pts: DataFrame, group_col: str, x_col: str, y_col: str
) -> DataFrame:
    """PostGIS ``ST_MinimumBoundingRadius`` per group (radius of the
    minimum enclosing circle) over hull-vertex rows (:func:`convex_hull`
    output — MEC(points) == MEC(hull)).

    Minimax formulation, chosen for cross-engine determinism: the MEC
    center is either a point-pair midpoint or a point-triple circumcenter
    (its support set has 2 or 3 points), and EVERY candidate center's
    max-distance-to-points is a valid enclosing radius — so
    ``min over candidates of (max over points of dist)`` is exactly the
    MEC radius, with no circle-containment predicate whose boundary-point
    roundoff could disagree between engines.

    FP determinism requires both engines to enumerate the SAME ordered
    triples (the circumcenter formula is symmetric in exact arithmetic
    but its term-addition order follows the role assignment, so
    permutations differ by ulps): hull vertices are sorted
    lexicographically by (x, y) and combinations taken with i < j < k,
    mirroring the twin's row-value ``(ax, ay) < (bx, by) < (cx, cy)``
    join predicate.  Exactly-collinear triples (circumcenter denominator
    0) are skipped on both engines.

    Cost: O(h^4) pure HOF folds per group with h = hull size — after the
    two-level hull collapsed each group map-side.  Returns
    [group, mec_r2] (SQUARED radius; 0.0 for single-point groups) — the
    caller takes sqrt, keeping this fold free of libm.
    """
    agg = hull_pts.groupBy(group_col).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(x_col).alias("x"), F.col(y_col).alias("y")))
        ).alias("_p")
    )
    p = F.col("_p")
    xs = F.transform(p, lambda s: s["x"])
    ys = F.transform(p, lambda s: s["y"])
    h = F.size(p)
    idx = F.sequence(F.lit(1), h)
    inf = F.lit(float("inf"))

    def X(i: Column) -> Column:
        return F.element_at(xs, i)

    def Y(i: Column) -> Column:
        return F.element_at(ys, i)

    def maxd2(cx: Column, cy: Column) -> Column:
        return F.aggregate(
            idx,
            F.lit(0.0),
            lambda acc, k: F.greatest(
                acc, (X(k) - cx) * (X(k) - cx) + (Y(k) - cy) * (Y(k) - cy)
            ),
        )

    def pair_cand(i: Column, j: Column) -> Column:
        return maxd2((X(i) + X(j)) / 2, (Y(i) + Y(j)) / 2)

    def tri_cand(i: Column, j: Column, k: Column) -> Column:
        ax, ay, bx, by, cx, cy = X(i), Y(i), X(j), Y(j), X(k), Y(k)
        d = 2 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
        a2, b2, c2 = ax * ax + ay * ay, bx * bx + by * by, cx * cx + cy * cy
        ux = (a2 * (by - cy) + b2 * (cy - ay) + c2 * (ay - by)) / d
        uy = (a2 * (cx - bx) + b2 * (ax - cx) + c2 * (bx - ax)) / d
        return F.when(d != 0, maxd2(ux, uy)).otherwise(inf)

    pair_best = F.aggregate(
        idx,
        inf,
        lambda acc, i: F.least(
            acc,
            F.aggregate(
                idx,
                inf,
                lambda a2, j: F.least(
                    a2, F.when(j > i, pair_cand(i, j)).otherwise(inf)
                ),
            ),
        ),
    )
    tri_best = F.aggregate(
        idx,
        inf,
        lambda acc, i: F.least(
            acc,
            F.aggregate(
                idx,
                inf,
                lambda a2, j: F.least(
                    a2,
                    F.when(
                        j > i,
                        F.aggregate(
                            idx,
                            inf,
                            lambda a3, k: F.least(
                                a3,
                                F.when(k > j, tri_cand(i, j, k)).otherwise(inf),
                            ),
                        ),
                    ).otherwise(inf),
                ),
            ),
        ),
    )
    return agg.select(
        group_col,
        F.when(h >= 2, F.least(pair_best, tri_best))
        .otherwise(F.lit(0.0))
        .alias("mec_r2"),
    )


def geometric_median(
    pts: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    id_col: str,
    iterations: int = 8,
    eps: float = 1e-12,
) -> DataFrame:
    """PostGIS ``ST_GeometricMedian`` per group: the point minimizing the
    sum of Euclidean distances to the group's points (the robust center —
    unlike the centroid, one far-flung outlier barely moves it), via a
    FIXED number of Weiszfeld iterations (Weiszfeld 1937; PostGIS runs the
    same scheme to a tolerance — a fixed count keeps the result
    deterministic and cross-engine checkable, the repo's pagerank/BPE
    pattern).

    x_{k+1} = (sum_i p_i / d_i) / (sum_i 1 / d_i),  d_i = |x_k - p_i|
    (clamped to ``eps`` so landing exactly on a sample point never
    divides by zero — both engines clamp identically).

    Execution: ONE partial-agg groupBy collects each group's points
    sorted by ``id_col`` (the deterministic fold order both engines
    replay), then the whole solver is a single JVM-side nested
    higher-order fold — the OUTER ``aggregate`` walks the iteration
    sequence with a (mx, my) struct accumulator, the three INNER
    ``aggregate`` folds compute the weighted sums per iteration.  No
    Python, no extra shuffle, expression size O(1) in the iteration
    count (the accumulator is a bound lambda variable, not substituted
    text).  Groups solve independently — embarrassingly parallel at any
    scale; a group's points must fit one array (fine for per-key
    medians; for a planet-wide single group, pre-aggregate to snapped
    cells first — ``snap_grid_dissolve``).

    Returns [group, gx, gy] (the median), plus ``n_pts``.
    """
    agg = pts.groupBy(group_col).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(id_col).alias("i"),
                    F.col(x_col).alias("x"),
                    F.col(y_col).alias("y"),
                )
            )
        ).alias("_p")
    )
    p = F.col("_p")
    n = F.size(p)

    def fsum(val) -> Column:
        return F.aggregate(p, F.lit(0.0), lambda a, s: a + val(s))

    init = F.struct(
        (fsum(lambda s: s["x"]) / n).alias("mx"),
        (fsum(lambda s: s["y"]) / n).alias("my"),
    )

    def dist(s: Column, acc: Column) -> Column:
        dx = s["x"] - acc["mx"]
        dy = s["y"] - acc["my"]
        return F.greatest(F.sqrt(dx * dx + dy * dy), F.lit(eps))

    def step(acc: Column, _i: Column) -> Column:
        # ONE inner fold accumulating (sw, sx, sy) together: the clamped
        # distance is computed once per point, not three times; each
        # field's running sum is the same sequential fold as before, so
        # the result is bit-identical to three separate passes
        z = F.lit(0.0)
        sums = F.aggregate(
            p,
            F.struct(z.alias("sw"), z.alias("sx"), z.alias("sy")),
            lambda a, s: F.struct(
                (a["sw"] + F.lit(1.0) / dist(s, acc)).alias("sw"),
                (a["sx"] + s["x"] / dist(s, acc)).alias("sx"),
                (a["sy"] + s["y"] / dist(s, acc)).alias("sy"),
            ),
        )
        return F.struct(
            (sums["sx"] / sums["sw"]).alias("mx"),
            (sums["sy"] / sums["sw"]).alias("my"),
        )

    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    # F.sequence(1, 0) steps DOWN to [1, 0] — 0 iterations means the
    # centroid init, not two spurious steps
    med = (
        init
        if iterations == 0
        else F.aggregate(F.sequence(F.lit(1), F.lit(int(iterations))), init, step)
    )
    return agg.select(
        F.col(group_col),
        med["mx"].alias("gx"),
        med["my"].alias("gy"),
        n.alias("n_pts"),
    )


def maximum_inscribed_circle(
    polys: DataFrame, levels: int = 6
) -> DataFrame:
    """PostGIS ``ST_MaximumInscribedCircle`` (polylabel-style): the
    center of the largest circle inside each ring — THE label anchor a
    tile renderer wants (PointOnSurface guarantees interior; this
    maximizes clearance).  Deterministic fixed-grid refinement in place
    of polylabel's priority queue, so both engines replay it exactly:

    - state per polygon: (cx, cy, cw, ch) — current best center + cell
      half-pitch, seeded at the bbox center with cw = width/4;
    - each level scores a 4x4 candidate grid ``(cx + (i-1.5)·cw,
      cy + (j-1.5)·ch)`` with the SIGNED clearance — + boundary distance
      inside the ring (even-odd raycast), − outside — and keeps the
      (max score, min cx, min cy) candidate, then halves the pitch;
    - after K levels the center is within bbox·2^-K of a local
      optimum (exact for symmetric shapes); radius = final clearance.

    Shape: K explode+reduce rounds over the POLYGON dim (the small side
    of every join here), each 16 candidates/polygon, scored by the
    codegen raycast + boundary-distance folds — no UDF, lineage
    truncated per level.  An approximation by construction (fixed grid
    vs polylabel's bound-driven queue) — documented, deterministic, and
    cross-engine identical."""
    from tilekiln_spark.functions.geometry import point_ring_distance
    from tilekiln_spark.operators.spatial_join import pip_raycast

    if levels < 1:
        raise ValueError("levels must be >= 1")

    state = polys.select(
        "polygon_id", "ring_xs", "ring_ys",
        ((F.col("xmin") + F.col("xmax")) / 2.0).alias("cx"),
        ((F.col("ymin") + F.col("ymax")) / 2.0).alias("cy"),
        ((F.col("xmax") - F.col("xmin")) / 4.0).alias("cw"),
        ((F.col("ymax") - F.col("ymin")) / 4.0).alias("ch"),
    )
    for _ in range(int(levels)):
        cand = (
            state.withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(3))))
            .withColumn("j", F.explode(F.sequence(F.lit(0), F.lit(3))))
            .select(
                "polygon_id", "ring_xs", "ring_ys", "cw", "ch",
                (F.col("cx")
                 + (F.col("i").cast("double") - 1.5) * F.col("cw")).alias("px"),
                (F.col("cy")
                 + (F.col("j").cast("double") - 1.5) * F.col("ch")).alias("py"),
            )
        )
        d = point_ring_distance(
            F.col("px"), F.col("py"), F.col("ring_xs"), F.col("ring_ys")
        )
        inside = pip_raycast(
            F.col("px"), F.col("py"), F.col("ring_xs"), F.col("ring_ys")
        )
        score = F.when(inside, d).otherwise(-d)
        best = (
            cand.withColumn("score", score)
            .groupBy("polygon_id")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("score")).alias("ns"),
                        F.col("px").alias("cx"), F.col("py").alias("cy"),
                        F.col("cw").alias("cw"), F.col("ch").alias("ch"),
                    )
                ).alias("b")
            )
        )
        state = best.select(
            "polygon_id",
            F.col("b.cx").alias("cx"), F.col("b.cy").alias("cy"),
            (F.col("b.cw") / 2.0).alias("cw"),
            (F.col("b.ch") / 2.0).alias("ch"),
            (-F.col("b.ns")).alias("radius"),
        ).join(
            polys.select("polygon_id", "ring_xs", "ring_ys"), "polygon_id"
        ).localCheckpoint(eager=True)
    return state.select("polygon_id", "cx", "cy", "radius")


def std_dev_ellipse(
    pts: DataFrame,
    group_col: str,
    x_col: str = "mx",
    y_col: str = "my",
    snap: float = 1000.0,
) -> DataFrame:
    """Standard deviational ellipse per group (Yuill 1971; the
    centrography staple ArcGIS ships as "Directional Distribution" and
    CrimeStat as SDE): mean center, major-axis orientation, and the two
    ellipse semi-axes from the second central moments of the group's
    point cloud.

    Determinism at scale is the design driver: raw float moments are
    distributed sums whose association differs between engines, so the
    coordinates are SNAPPED to a ``snap``-meter grid first
    (``floor(v / snap)``) — every term of Σx, Σx², Σxy is then an exact
    integer-valued double (bounded by ~4e8 per term at km snap, safely
    inside 2^53 for trillions of rows), distributed aggregation order is
    immaterial, and the ellipse assembly is per-group scalar arithmetic
    both engines evaluate identically.  The km-scale snap perturbs each
    moment by under one part in 2e4 of the axis length — documented
    measurement convention, not noise.

    Shape: ONE partial-aggregated groupBy (count + five exact sums); the
    ellipse assembly is pure codegen.  No collect, no per-group arrays.

        dxx = Σx²/n − x̄²,  dyy, dxy analogous (biased/n moments)
        θ   = atan2(2·dxy, dxx − dyy) / 2     (major axis vs +x, radians)
        λ½  = (dxx+dyy)/2 ± sqrt(((dxx−dyy)/2)² + dxy²)
        a,b = sqrt(2·λ)   (CrimeStat's 1-σ ellipse, ~63% coverage)

    Returns ``[group, n_pts, cx, cy, angle_deg, major, minor]`` in snap
    units (km for the default), angle in (−90, 90] degrees from +x.
    Degenerate groups (n = 1 or collinear-equal) emit 0 axes, angle 0."""
    xi = F.floor(F.col(x_col) / F.lit(float(snap))).cast("double")
    yi = F.floor(F.col(y_col) / F.lit(float(snap))).cast("double")
    agg = pts.groupBy(group_col).agg(
        F.count("*").cast("double").alias("n"),
        F.sum(xi).alias("sx"),
        F.sum(yi).alias("sy"),
        F.sum(xi * xi).alias("sxx"),
        F.sum(yi * yi).alias("syy"),
        F.sum(xi * yi).alias("sxy"),
    )
    n = F.col("n")
    cx = F.col("sx") / n
    cy = F.col("sy") / n
    dxx = F.col("sxx") / n - cx * cx
    dyy = F.col("syy") / n - cy * cy
    dxy = F.col("sxy") / n - cx * cy
    theta = F.atan2(F.lit(2.0) * dxy, dxx - dyy) / F.lit(2.0)
    common = F.sqrt(
        ((dxx - dyy) / F.lit(2.0)) * ((dxx - dyy) / F.lit(2.0)) + dxy * dxy
    )
    lam1 = (dxx + dyy) / F.lit(2.0) + common
    lam2 = (dxx + dyy) / F.lit(2.0) - common
    return agg.select(
        F.col(group_col),
        n.cast("long").alias("n_pts"),
        cx.alias("cx"),
        cy.alias("cy"),
        F.degrees(theta).alias("angle_deg"),
        F.sqrt(F.lit(2.0) * F.greatest(lam1, F.lit(0.0))).alias("major"),
        F.sqrt(F.lit(2.0) * F.greatest(lam2, F.lit(0.0))).alias("minor"),
    )
