"""ST_DelaunayTriangles / alpha-shape / ST_VoronoiPolygons over point
groups (PostGIS + SFCGAL parity — the reference executes arbitrary
template SQL over the feature tables, reference
tilekiln/definition.py:42-77, and osm label/cartogram pipelines call all
three).

Spark-first shape: the triangulation is PER GROUP (a tile, a quadrant, a
cluster cell — the way a renderer builds per-tile TINs), so the engine's
parallel axis is groups, never a global geometry.  Within a group the
Delaunay condition is used DEFINITIONALLY instead of algorithmically:

    a triangle (i, j, k) is Delaunay  <=>  orient(i, j, k) != 0 and no
    other group point lies strictly inside its circumcircle,

which makes the whole operator three chained explodes (ordered triples
i < j < k over the group's lexicographically sorted distinct points)
plus ONE higher-order ``forall`` per candidate — pure codegen
expressions, no UDF, no sequential ring walking, and an arithmetic the
DuckDB twin replays bit-identically (identical incircle determinant, in
the identical term order, on identical float64 inputs).  Cost is
O(n^4) flops per group run as O(n^3) rows x an O(n) fold — the right
trade for the bounded per-group point counts this targets (label
anchors, per-tile TINs of sampled points: n in the tens); a group with
unbounded n should be pre-gridded first (``snap_grid_dissolve`` /
``hexbin_qr`` are the repo's quantizers), exactly how the production
pipeline bounds every other per-group geometry here.

Downstream faces (both off the SAME triangle frame — the coverage-face
reuse pattern):

- alpha shape (SFCGAL ``ST_AlphaShape`` / CGAL alpha complex): keep the
  triangles with circumradius^2 <= alpha^2; per-group triangle count,
  area, and boundary-edge count (edges on exactly one kept triangle).
- Voronoi cells (``ST_VoronoiPolygons``, bounded cells): the Voronoi
  vertices of site s are the circumcenters of its incident Delaunay
  triangles, and each interior Delaunay edge (s, t) contributes the
  Voronoi edge joining its two flanking circumcenters.  Because every
  Voronoi cell is CONVEX and CONTAINS its site, the cell area is
  sum(|cross(c1 - s, c2 - s)|) / 2 over incident interior edges — no
  angular sort, no atan2 (whose last-ulp behavior differs across
  engines), pure aggregation.  Cells are emitted for INTERIOR sites
  (sites touching no hull/boundary edge) — the bounded cells; hull
  sites' cells are unbounded and PostGIS clips them to an envelope,
  a presentation choice out of engine scope.

General position is assumed the same way the hull family assumes it
(testdata coordinates are md5/arithmetic-derived doubles: exactly
cocircular quadruples and exactly collinear triples are measure-zero);
exact duplicate points are deduped up front.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _incircle_det(ax, ay, bx, by, cx, cy, px, py) -> Column:
    """Signed incircle determinant: positive when p is strictly inside
    the circumcircle of CCW (a, b, c); the product with orient(a, b, c)
    is orientation-free.  Term order is the twin contract — the DuckDB
    side spells the identical expression."""
    adx, ady = ax - px, ay - py
    bdx, bdy = bx - px, by - py
    cdx, cdy = cx - px, cy - py
    al = adx * adx + ady * ady
    bl = bdx * bdx + bdy * bdy
    cl = cdx * cdx + cdy * cdy
    return (
        adx * (bdy * cl - cdy * bl)
        - ady * (bdx * cl - cdx * bl)
        + al * (bdx * cdy - cdx * bdy)
    )


def incircle_det_sql(
    ax: str, ay: str, bx: str, by: str, cx: str, cy: str, px: str, py: str
) -> str:
    """DuckDB twin of :func:`_incircle_det` — the identical term order on
    the identical float64 operands (expression duplication in SQL does
    not change IEEE results; only term order would)."""
    adx, ady = f"({ax} - {px})", f"({ay} - {py})"
    bdx, bdy = f"({bx} - {px})", f"({by} - {py})"
    cdx, cdy = f"({cx} - {px})", f"({cy} - {py})"
    al = f"({adx} * {adx} + {ady} * {ady})"
    bl = f"({bdx} * {bdx} + {bdy} * {bdy})"
    cl = f"({cdx} * {cdx} + {cdy} * {cdy})"
    return (
        f"({adx} * ({bdy} * {cl} - {cdy} * {bl})"
        f" - {ady} * ({bdx} * {cl} - {cdx} * {bl})"
        f" + {al} * ({bdx} * {cdy} - {cdx} * {bdy}))"
    )


def circumcenter_sql(
    ax: str, ay: str, bx: str, by: str, cx: str, cy: str
) -> tuple[str, str]:
    """DuckDB twin of the circumcenter in :func:`delaunay_triangles` —
    returns (ccx, ccy) SQL in the Spark expression's exact term order."""
    a2 = f"({ax} * {ax} + {ay} * {ay})"
    b2 = f"({bx} * {bx} + {by} * {by})"
    c2 = f"({cx} * {cx} + {cy} * {cy})"
    dd = (
        f"(2.0 * ({ax} * ({by} - {cy}) + {bx} * ({cy} - {ay})"
        f" + {cx} * ({ay} - {by})))"
    )
    ccx = (
        f"(({a2} * ({by} - {cy}) + {b2} * ({cy} - {ay})"
        f" + {c2} * ({ay} - {by})) / {dd})"
    )
    ccy = (
        f"(({a2} * ({cx} - {bx}) + {b2} * ({ax} - {cx})"
        f" + {c2} * ({bx} - {ax})) / {dd})"
    )
    return ccx, ccy


def make_delaunay_triples_udf():
    """Vectorized kept-triple kernel: (xs, ys) sorted distinct group
    points -> array<struct<i,j,k>> of 1-based Delaunay triple indices.

    The r6 execution strategy for the O(n^3) candidates x O(n) incircle
    fold: the definitional test is unchanged, but runs as numpy batch
    arithmetic instead of ~n^4 interpreted HOF node evaluations per
    group (the make_minhash_sig_udf precedent — the legitimately-hot
    Arrow-UDF path).  Bit-identity contract: every operation below is
    the SAME IEEE float64 op in the SAME term order as the expression
    path (_incircle_det / d_orient) — numpy elementwise ops are exactly
    rounded per element, so dor, det and the <= 0 comparisons are
    bit-identical to the interpreted evaluation, pinned by the
    kernel-vs-expression equality test.  Candidate triples are chunked
    so peak memory stays bounded for large groups."""
    from pyspark.sql.types import (
        ArrayType, IntegerType, StructField, StructType,
    )
    import numpy as np

    out_t = ArrayType(
        StructType(
            [
                StructField("i", IntegerType()),
                StructField("j", IntegerType()),
                StructField("k", IntegerType()),
            ]
        )
    )

    def solve(xs, ys):
        n = len(xs)
        # candidate triples per det-matrix chunk: keep each (CHUNK, n)
        # intermediate ~16 MB so the ~10 temporaries stay cache/RAM-friendly
        CHUNK = max(1024, (1 << 21) // max(n, 1))
        if n <= 128:  # n^3 meshgrid stays <= ~50 MB
            idx = np.arange(n)
            ii, jj, kk = np.meshgrid(idx, idx, idx, indexing="ij")
            mask = (ii < jj) & (jj < kk)
            ii, jj, kk = ii[mask], jj[mask], kk[mask]
        else:
            # large group: O(n^2) memory per step instead of the n^3 mask
            pj, pk = np.triu_indices(n, k=1)
            parts = [(np.full(int((pj > i).sum()), i), pj[pj > i], pk[pj > i])
                     for i in range(n - 2)]
            ii = np.concatenate([p[0] for p in parts])
            jj = np.concatenate([p[1] for p in parts])
            kk = np.concatenate([p[2] for p in parts])
        keep_i, keep_j, keep_k = [], [], []
        for s in range(0, len(ii), CHUNK):
            ci, cj, ck = ii[s:s + CHUNK], jj[s:s + CHUNK], kk[s:s + CHUNK]
            ax, ay = xs[ci], ys[ci]
            bx, by = xs[cj], ys[cj]
            cx, cy = xs[ck], ys[ck]
            dor = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
            # incircle determinant over every group point, identical
            # term order to _incircle_det
            px, py = xs[None, :], ys[None, :]
            adx, ady = ax[:, None] - px, ay[:, None] - py
            bdx, bdy = bx[:, None] - px, by[:, None] - py
            cdx, cdy = cx[:, None] - px, cy[:, None] - py
            al = adx * adx + ady * ady
            bl = bdx * bdx + bdy * bdy
            cl = cdx * cdx + cdy * cdy
            det = (
                adx * (bdy * cl - cdy * bl)
                - ady * (bdx * cl - cdx * bl)
                + al * (bdx * cdy - cdx * bdy)
            )
            cond = det * dor[:, None] <= 0.0
            m = np.arange(n)[None, :]
            cond |= (m == ci[:, None]) | (m == cj[:, None]) | (m == ck[:, None])
            ok = (dor != 0.0) & cond.all(axis=1)
            keep_i.append(ci[ok])
            keep_j.append(cj[ok])
            keep_k.append(ck[ok])
        ki = np.concatenate(keep_i) + 1
        kj = np.concatenate(keep_j) + 1
        kk_ = np.concatenate(keep_k) + 1
        return [
            {"i": int(a), "j": int(b), "k": int(c)}
            for a, b, c in zip(ki, kj, kk_)
        ]

    @F.pandas_udf(out_t)
    def triples(xs_s: pd.Series, ys_s: pd.Series) -> pd.Series:
        out = []
        for xs, ys in zip(xs_s, ys_s):
            out.append(
                solve(
                    np.asarray(xs, dtype=np.float64),
                    np.asarray(ys, dtype=np.float64),
                )
            )
        return pd.Series(out)

    return triples


def delaunay_triangles(
    pts: DataFrame, group_col: str, x_col: str, y_col: str
) -> DataFrame:
    """One row per Delaunay triangle of each group's distinct points.

    Returns ``[group_col, i, j, k, ax, ay, bx, by, cx, cy, tri_area,
    ccx, ccy, r2]`` where (i, j, k) are 1-based ascending indices into
    the group's lexicographically sorted distinct point list (a
    deterministic, engine-independent labeling), (ccx, ccy) the
    circumcenter and r2 its squared radius.  Groups with < 3 distinct
    points (or all-collinear ones) emit no rows — same as PostGIS
    returning an empty collection.

    Execution strategy (r6): the kept-triple selection — all of the
    O(n^4) work — runs in the vectorized Arrow kernel
    (:func:`make_delaunay_triples_udf`, bit-identical arithmetic) by
    default; ``spark.tilekiln.delaunay.kernel=expr`` keeps the original
    pure-expression path (the documented cross-engine contract both
    strategies implement).  The output columns are computed by the SAME
    expressions off (i, j, k) either way."""
    g = (
        pts.select(group_col, x_col, y_col)
        .dropDuplicates([group_col, x_col, y_col])
        .groupBy(group_col)
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col(x_col).alias("x"), F.col(y_col).alias("y"))
                )
            ).alias("p")
        )
        .select(
            group_col,
            F.transform("p", lambda s: s["x"]).alias("xs"),
            F.transform("p", lambda s: s["y"]).alias("ys"),
        )
        .where(F.size("xs") >= 3)
    )
    n = F.size("xs")
    use_kernel = (
        pts.sparkSession.conf.get("spark.tilekiln.delaunay.kernel", "arrow")
        != "expr"
    )
    xs, ys = F.col("xs"), F.col("ys")
    if use_kernel:
        tri_udf = make_delaunay_triples_udf()
        kept = (
            g.select(
                group_col, "xs", "ys",
                F.explode(tri_udf(F.col("xs"), F.col("ys"))).alias("t"),
            )
            .select(
                group_col, "xs", "ys",
                F.col("t.i").alias("i"),
                F.col("t.j").alias("j"),
                F.col("t.k").alias("k"),
            )
        )
        ax, ay = F.element_at(xs, F.col("i")), F.element_at(ys, F.col("i"))
        bx, by = F.element_at(xs, F.col("j")), F.element_at(ys, F.col("j"))
        cx, cy = F.element_at(xs, F.col("k")), F.element_at(ys, F.col("k"))
        kept = kept.withColumn(
            "dor", (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
        )
    else:
        # three chained explodes enumerate ordered triples i < j < k; the
        # n >= 3 guard above keeps every sequence() ascending (the
        # descending-sequence footgun is tested at tests/test_triangulate.py)
        cand = (
            g.withColumn("i", F.explode(F.sequence(F.lit(1), n - 2)))
            .withColumn("j", F.explode(F.sequence(F.col("i") + 1, n - 1)))
            .withColumn("k", F.explode(F.sequence(F.col("j") + 1, n)))
        )
        ax, ay = F.element_at(xs, F.col("i")), F.element_at(ys, F.col("i"))
        bx, by = F.element_at(xs, F.col("j")), F.element_at(ys, F.col("j"))
        cx, cy = F.element_at(xs, F.col("k")), F.element_at(ys, F.col("k"))
        d_orient = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
        cand = cand.withColumn("dor", d_orient)

        def empty_for(m: Column) -> Column:
            det = _incircle_det(
                F.element_at(xs, F.col("i")),
                F.element_at(ys, F.col("i")),
                F.element_at(xs, F.col("j")),
                F.element_at(ys, F.col("j")),
                F.element_at(xs, F.col("k")),
                F.element_at(ys, F.col("k")),
                F.element_at(xs, m),
                F.element_at(ys, m),
            )
            return (
                (m == F.col("i"))
                | (m == F.col("j"))
                | (m == F.col("k"))
                | (det * F.col("dor") <= 0.0)
            )

        kept = cand.where(
            (F.col("dor") != 0.0)
            & F.forall(F.sequence(F.lit(1), F.size("xs")), empty_for)
        )
    # circumcenter: the standard lifted form, identical term order in the twin
    a2 = ax * ax + ay * ay
    b2 = bx * bx + by * by
    c2 = cx * cx + cy * cy
    dd = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    ccx = (a2 * (by - cy) + b2 * (cy - ay) + c2 * (ay - by)) / dd
    ccy = (a2 * (cx - bx) + b2 * (ax - cx) + c2 * (bx - ax)) / dd
    return kept.select(
        group_col,
        F.col("i").cast("int").alias("i"),
        F.col("j").cast("int").alias("j"),
        F.col("k").cast("int").alias("k"),
        ax.alias("ax"), ay.alias("ay"),
        bx.alias("bx"), by.alias("by"),
        cx.alias("cx"), cy.alias("cy"),
        (F.abs(F.col("dor")) / 2.0).alias("tri_area"),
        ccx.alias("ccx"),
        ccy.alias("ccy"),
        ((ax - ccx) * (ax - ccx) + (ay - ccy) * (ay - ccy)).alias("r2"),
    )


def largest_empty_circle(
    pts: DataFrame, group_col: str, x_col: str, y_col: str
) -> DataFrame:
    """PostGIS ``ST_LargestEmptyCircle`` over each group's point sites,
    candidates restricted to the sites' bounding box (PostGIS refines over
    a grid; this is the EXACT vertex-candidate variant).

    The classic computational-geometry fact does all the work: a largest
    empty circle centered strictly inside the site set is centered on a
    Voronoi vertex, i.e. a Delaunay circumcenter — and by the Delaunay
    empty-circumcircle property, a circumcenter's distance to its NEAREST
    site is exactly its triangle's circumradius.  So no distance-to-sites
    join is needed at all: the LEC is the argmax of ``r2`` over triangles
    whose circumcenter falls inside the group bbox (candidates on the
    boundary of the region — Voronoi-edge/bbox intersections — are out of
    scope, documented).

    One tiny bbox aggregate broadcast back onto the Delaunay frame + ONE
    argmax groupBy (struct max with (r2, ccx, ccy) tiebreak so the twin's
    ORDER BY lands on the identical winner).  Groups with < 3 distinct
    points, or whose circumcenters all fall outside the bbox, emit no row.
    Returns ``[group_col, lec_x, lec_y, lec_r]``."""
    tri = delaunay_triangles(pts, group_col, x_col, y_col)
    bbox = pts.groupBy(group_col).agg(
        F.min(x_col).alias("_bx0"),
        F.max(x_col).alias("_bx1"),
        F.min(y_col).alias("_by0"),
        F.max(y_col).alias("_by1"),
    )
    inside = tri.join(F.broadcast(bbox), group_col).where(
        (F.col("ccx") >= F.col("_bx0"))
        & (F.col("ccx") <= F.col("_bx1"))
        & (F.col("ccy") >= F.col("_by0"))
        & (F.col("ccy") <= F.col("_by1"))
    )
    best = inside.groupBy(group_col).agg(
        F.max(F.struct(F.col("r2"), F.col("ccx"), F.col("ccy"))).alias("b")
    )
    return best.select(
        group_col,
        F.col("b.ccx").alias("lec_x"),
        F.col("b.ccy").alias("lec_y"),
        F.sqrt(F.col("b.r2")).alias("lec_r"),
    )


def _tri_edges(tri: DataFrame, group_col: str) -> DataFrame:
    """Explode each triangle into its 3 edges (endpoint indices kept
    ascending — (i,j), (j,k), (i,k) are each already ordered given
    i < j < k), carrying endpoint coordinates and the circumcenter."""
    edge = F.explode(
        F.array(
            F.struct(
                F.col("i").alias("e1"), F.col("j").alias("e2"),
                F.col("ax").alias("x1"), F.col("ay").alias("y1"),
                F.col("bx").alias("x2"), F.col("by").alias("y2"),
            ),
            F.struct(
                F.col("j").alias("e1"), F.col("k").alias("e2"),
                F.col("bx").alias("x1"), F.col("by").alias("y1"),
                F.col("cx").alias("x2"), F.col("cy").alias("y2"),
            ),
            F.struct(
                F.col("i").alias("e1"), F.col("k").alias("e2"),
                F.col("ax").alias("x1"), F.col("ay").alias("y1"),
                F.col("cx").alias("x2"), F.col("cy").alias("y2"),
            ),
        )
    ).alias("e")
    return tri.select(group_col, "ccx", "ccy", edge).select(
        group_col, "ccx", "ccy",
        F.col("e.e1").alias("e1"), F.col("e.e2").alias("e2"),
        F.col("e.x1").alias("x1"), F.col("e.y1").alias("y1"),
        F.col("e.x2").alias("x2"), F.col("e.y2").alias("y2"),
    )


def alpha_shape_stats(
    tri: DataFrame, group_col: str, alpha_r2: float
) -> DataFrame:
    """Alpha-complex rollup per group over :func:`delaunay_triangles`
    output: triangles with circumradius^2 <= ``alpha_r2`` are IN the
    alpha shape; returns ``[group_col, n_tri, shape_area,
    boundary_edges]`` where boundary_edges counts edges on exactly one
    kept triangle (the alpha-shape boundary).  ONE filter + two
    partial-agg groupBys — no geometry assembly."""
    kept = tri.where(F.col("r2") <= F.lit(float(alpha_r2)))
    stats = kept.groupBy(group_col).agg(
        F.count("*").alias("n_tri"),
        F.sum("tri_area").alias("shape_area"),
    )
    bedges = (
        _tri_edges(kept, group_col)
        .groupBy(group_col, "e1", "e2")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") == 1)
        .groupBy(group_col)
        .agg(F.count("*").alias("boundary_edges"))
    )
    return stats.join(bedges, group_col, "left").select(
        group_col,
        "n_tri",
        "shape_area",
        F.coalesce("boundary_edges", F.lit(0)).alias("boundary_edges"),
    )


def voronoi_cells(tri: DataFrame, group_col: str) -> DataFrame:
    """Bounded Voronoi cells per group over :func:`delaunay_triangles`
    output: ``[group_col, site, sx, sy, n_vertices, cell_area]`` for
    every INTERIOR site (one that touches no hull edge).  See the
    module docstring for why the area needs no angular sort: the cell
    is convex and contains its site, so each interior Delaunay edge's
    two flanking circumcenters contribute |cross(c1-s, c2-s)|/2."""
    edges = _tri_edges(tri, group_col)
    eagg = edges.groupBy(group_col, "e1", "e2").agg(
        F.count("*").alias("cnt"),
        F.sort_array(
            F.collect_list(F.struct(F.col("ccx").alias("cx"),
                                    F.col("ccy").alias("cy")))
        ).alias("cs"),
        F.min("x1").alias("x1"), F.min("y1").alias("y1"),
        F.min("x2").alias("x2"), F.min("y2").alias("y2"),
    )
    hull_sites = (
        eagg.where(F.col("cnt") == 1)
        .select(
            group_col,
            F.explode(F.array(F.col("e1"), F.col("e2"))).alias("site"),
        )
        .distinct()
    )
    inner = eagg.where(F.col("cnt") == 2)
    c1x = F.col("cs")[0]["cx"]
    c1y = F.col("cs")[0]["cy"]
    c2x = F.col("cs")[1]["cx"]
    c2y = F.col("cs")[1]["cy"]
    contrib = inner.select(
        group_col, "e1", "e2",
        c1x.alias("c1x"), c1y.alias("c1y"),
        c2x.alias("c2x"), c2y.alias("c2y"),
        F.explode(
            F.array(
                F.struct(F.col("e1").alias("site"),
                         F.col("x1").alias("sx"), F.col("y1").alias("sy")),
                F.struct(F.col("e2").alias("site"),
                         F.col("x2").alias("sx"), F.col("y2").alias("sy")),
            )
        ).alias("s"),
    ).select(
        group_col,
        F.col("s.site").alias("site"),
        F.col("s.sx").alias("sx"),
        F.col("s.sy").alias("sy"),
        (
            F.abs(
                (F.col("c1x") - F.col("s.sx")) * (F.col("c2y") - F.col("s.sy"))
                - (F.col("c1y") - F.col("s.sy")) * (F.col("c2x") - F.col("s.sx"))
            )
            / 2.0
        ).alias("part"),
    )
    cells = contrib.groupBy(group_col, "site").agg(
        F.min("sx").alias("sx"),
        F.min("sy").alias("sy"),
        F.count("*").alias("n_vertices"),
        F.sum("part").alias("cell_area"),
    )
    return cells.join(hull_sites, [group_col, "site"], "left_anti").select(
        group_col, "site", "sx", "sy", "n_vertices", "cell_area"
    )
