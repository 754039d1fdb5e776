"""ST_LineMerge: sew contiguous segments into maximal linestrings.

The reference's PostGIS playbook runs ``ST_LineMerge`` when assembling
renderable boundary/waterway lines from segment soup (osm2pgsql emits admin
boundaries and rivers as per-way fragments; the reference executes arbitrary
template SQL over such tables — /root/reference/tilekiln/definition.py:42-77).
Semantics (PostGIS): two segments merge through a node iff EXACTLY two line
ends meet there (node degree == 2); junctions (degree >= 3) stop the merge;
direction is ignored (the merge reorients as needed); a chain that closes on
itself through all-degree-2 nodes becomes a ring.

Distributed shape (no driver-side geometry, no per-row Python):

1. endpoint incidences — one ``explode`` per segment (map-only);
2. node degrees — ONE groupBy on the exact endpoint key (for real data,
   snap first: ``snap_grid_dissolve`` is the repo's quantizer);
   degree-2 nodes emit their single through-pair straight out of the
   aggregate (``collect_list`` of exactly 2 seg_ids — no self-join);
3. components — the proven large-star/small-star contraction
   (operators/dedup.py connected_components, O(log^2 n) rounds), so a
   10k-fragment coastline chain converges in ~log rounds, not
   diameter rounds — the scale-safe choice at web scale;
4. per-line rollup — one partial-agg groupBy over (line_id): segment
   count, length sum, and ring detection as free_ends == 0 where a free
   end is an incidence at a node whose GLOBAL degree != 2.

Everything is key-partitioned; the only iteration is the component
contraction whose per-round work is the (tiny) through-pair list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def merge_lines(segments: DataFrame) -> DataFrame:
    """ST_LineMerge over a segment table ``(seg_id, x1, y1, x2, y2)``.

    Returns one row per maximal merged line:
    ``line_id`` (MIN seg_id in the chain — deterministic canonical label),
    ``n_segs``, ``merged_len`` (sum of member segment lengths), and
    ``is_ring`` (the chain closes: every touched node has degree 2).

    Endpoints are matched EXACTLY (float64 equality) — quantize upstream
    for measured data.  Multi-vertex input lines reduce to this case by
    keying their two end vertices; interior vertices never participate.
    """
    from tilekiln_spark.operators.dedup import connected_components

    seg = segments.select(
        "seg_id",
        "x1", "y1", "x2", "y2",
        F.sqrt(
            (F.col("x2") - F.col("x1")) * (F.col("x2") - F.col("x1"))
            + (F.col("y2") - F.col("y1")) * (F.col("y2") - F.col("y1"))
        ).alias("seg_len"),
    )

    ends = seg.select(
        "seg_id",
        F.explode(
            F.array(
                F.struct(F.col("x1").alias("nx"), F.col("y1").alias("ny")),
                F.struct(F.col("x2").alias("nx"), F.col("y2").alias("ny")),
            )
        ).alias("node"),
    ).select("seg_id", F.col("node.nx").alias("nx"), F.col("node.ny").alias("ny"))

    # node degree AND the degree-2 through-pair from ONE aggregate
    nodes = ends.groupBy("nx", "ny").agg(
        F.count("*").alias("degree"),
        F.sort_array(F.collect_list("seg_id")).alias("segs"),
    )
    pairs = (
        nodes.filter(
            (F.col("degree") == 2) & (F.col("segs")[0] != F.col("segs")[1])
        )
        .select(
            F.col("segs")[0].alias("key_a"), F.col("segs")[1].alias("key_b")
        )
    )

    labels = connected_components(pairs)  # (node, component) over seg ids
    lbl = seg.join(
        labels.withColumnRenamed("node", "seg_id"), "seg_id", "left"
    ).withColumn("line_id", F.coalesce("component", "seg_id"))

    free = (
        ends.join(nodes.select("nx", "ny", "degree"), ["nx", "ny"])
        .filter(F.col("degree") != 2)
        .groupBy("seg_id")
        .agg(F.count("*").alias("free_ends"))
    )

    return (
        lbl.join(free, "seg_id", "left")
        .groupBy("line_id")
        .agg(
            F.count("*").alias("n_segs"),
            F.sum("seg_len").alias("merged_len"),
            # a straight single segment can only "close" by being
            # zero-length — never a ring
            (
                (F.sum(F.coalesce("free_ends", F.lit(0))) == 0)
                & (F.count("*") > 1)
            ).alias("is_ring"),
        )
    )


def _segments_as_pbsm_input(segments: DataFrame) -> DataFrame:
    """Shape a segment table for the shared PBSM candidate stage: 2-vertex
    chains riding the polygon_id/bbox/ring columns the stage expects."""
    return segments.select(
        F.col("seg_id").alias("polygon_id"),
        F.least("x1", "x2").alias("xmin"),
        F.least("y1", "y2").alias("ymin"),
        F.greatest("x1", "x2").alias("xmax"),
        F.greatest("y1", "y2").alias("ymax"),
        F.array("x1", "x2").alias("ring_xs"),
        F.array("y1", "y2").alias("ring_ys"),
    )


def node_segments(
    segments: DataFrame,
    grid_zoom: int = 4,
    max_cells_per_poly: int = 64,
) -> DataFrame:
    """PostGIS ``ST_Node`` at segment granularity: split every segment at
    each point where another segment crosses its INTERIOR (including
    T-touches — another segment's endpoint landing on this one's
    interior), the noding prerequisite to polygonize/topology building
    (the reference's PostGIS playbook nodes line soup before building
    renderable boundaries; reference tilekiln/definition.py:42-77 runs
    arbitrary such SQL).

    Distributed shape — NO Python anywhere:

    - candidate pairs: segments ride the shared PBSM stage as 2-vertex
      chains (bbox cell explode, reporting-cell dedup, whale routing);
    - exact refine + cut fraction: the parametric pair solve
      ``s = cross(q-p, u) / cross(r, u)``, ``t = cross(q-p, r) /
      cross(r, u)`` as pure column arithmetic — a cut on A at ``s`` iff
      the denominator is nonzero, ``0 < s < 1`` (strict interior) and
      ``0 <= t <= 1`` (anywhere on B, endpoints included);
    - per-segment assembly: ONE groupBy collecting the distinct sorted
      fractions, then the parts explode is map-only; uncut segments pass
      through as their own single part via the left join.

    EXACTLY-collinear overlapping pairs (zero denominator AND collinear
    offset) are noded too (closes the r4 documented gap): the other
    segment's endpoints project into this one's interior as cut
    fractions ``f = dot(bp - a1, r_a) / dot(r_a, r_a)``, so a partial
    overlap splits both carriers at the overlap ends — after which
    byte-identical duplicate parts remain per input segment (ST_Node
    DISSOLVES those; do it downstream — ``coverage_faces``' canonical
    dedupe-XOR stage and ``snap_grid_dissolve`` both do).

    Returns ``(seg_id, part, px1, py1, px2, py2)`` with part coordinates
    interpolated as ``p1 + f * (p2 - p1)`` — both engines fold the
    identical float64 arithmetic, so parts are bit-identical."""
    from tilekiln_spark.operators.spatial_join import _pbsm_candidates

    shaped = _segments_as_pbsm_input(segments)
    cand = _pbsm_candidates(
        shaped, shaped, grid_zoom, True, max_cells_per_poly
    ).filter(F.col("polygon_id") != F.col("b_polygon_id"))

    ax1, ay1 = F.element_at("ring_xs", 1), F.element_at("ring_ys", 1)
    ax2, ay2 = F.element_at("ring_xs", 2), F.element_at("ring_ys", 2)
    bx1, by1 = F.element_at("b_ring_xs", 1), F.element_at("b_ring_ys", 1)
    bx2, by2 = F.element_at("b_ring_xs", 2), F.element_at("b_ring_ys", 2)
    den = (ax2 - ax1) * (by2 - by1) - (ay2 - ay1) * (bx2 - bx1)
    s = ((bx1 - ax1) * (by2 - by1) - (by1 - ay1) * (bx2 - bx1)) / den
    t = ((bx1 - ax1) * (ay2 - ay1) - (by1 - ay1) * (ax2 - ax1)) / den
    cross_cuts = (
        cand.filter(den != 0)
        .select(F.col("polygon_id").alias("seg_id"), s.alias("f"), t.alias("t"))
        .filter((F.col("f") > 0) & (F.col("f") < 1)
                & (F.col("t") >= 0) & (F.col("t") <= 1))
        .select("seg_id", "f")
    )
    # collinear overlaps: project B's endpoints onto A's parameter line
    rr = (ax2 - ax1) * (ax2 - ax1) + (ay2 - ay1) * (ay2 - ay1)
    off_cross = (bx1 - ax1) * (ay2 - ay1) - (by1 - ay1) * (ax2 - ax1)
    f1 = ((bx1 - ax1) * (ax2 - ax1) + (by1 - ay1) * (ay2 - ay1)) / rr
    f2 = ((bx2 - ax1) * (ax2 - ax1) + (by2 - ay1) * (ay2 - ay1)) / rr
    col_cuts = (
        cand.filter((den == 0) & (off_cross == 0) & (rr != 0))
        .select(
            F.col("polygon_id").alias("seg_id"),
            F.explode(F.array(f1, f2)).alias("f"),
        )
        .filter((F.col("f") > 0) & (F.col("f") < 1))
    )
    cuts = (
        cross_cuts.unionByName(col_cuts)
        .groupBy("seg_id")
        .agg(F.array_sort(F.collect_set("f")).alias("fs"))
    )

    fr = F.concat(
        F.array(F.lit(0.0)),
        F.coalesce(F.col("fs"), F.expr("CAST(array() AS array<double>)")),
        F.array(F.lit(1.0)),
    )
    parts = (
        segments.join(cuts, "seg_id", "left")
        .withColumn("f", fr)
        .withColumn("part", F.explode(F.sequence(F.lit(1), F.size("f") - 1)))
    )
    fi = F.element_at("f", F.col("part"))
    fj = F.element_at("f", F.col("part") + 1)
    return parts.select(
        "seg_id",
        "part",
        (F.col("x1") + fi * (F.col("x2") - F.col("x1"))).alias("px1"),
        (F.col("y1") + fi * (F.col("y2") - F.col("y1"))).alias("py1"),
        (F.col("x1") + fj * (F.col("x2") - F.col("x1"))).alias("px2"),
        (F.col("y1") + fj * (F.col("y2") - F.col("y1"))).alias("py2"),
    )


def polygonize_faces(segments: DataFrame) -> DataFrame:
    """PostGIS ``ST_Polygonize`` over fully-noded segment soup: find the
    planar faces (the polygons the segments enclose) — WITHOUT any
    sequential ring tracing, the step that makes polygonize look
    inherently serial.  Requires noded, exactly-deduplicated input
    (run :func:`node_segments` + exact dedup first); zero-length
    segments and duplicate directed edges at a node are not supported.

    The trick, stage by stage (every stage distributed):

    1. **half-edges** — each segment becomes two directed half-edges
       (ids ``2*seg_id`` / ``2*seg_id + 1``; the twin is ``id XOR 1``);
    2. **rotation** — at every node, outgoing half-edges sort by the
       DIAMOND pseudo-angle (a monotone piecewise-rational surrogate for
       atan2 built from +,-,/ only, so both engines order identically —
       no libm in the plan); one window rank per node;
    3. **successor permutation** — the DCEL face-walk rule
       ``next(u->v) = rotational successor of twin(u->v) at node v``:
       ONE equi-join on (node, rank+1 mod degree).  Every half-edge has
       exactly one successor and one predecessor, so the successor
       relation is a PERMUTATION — its cycles ARE the faces;
    4. **cycles without walking** — connected components of the
       (half-edge, successor) pair list via the star contraction
       (O(log^2) rounds); no driver-side tracing, no diameter rounds;
    5. **face aggregates, order-independent** — Green's theorem over
       DIRECTED half-edges: ``area = sum (ux*vy - vx*uy) / 2`` over the
       cycle needs NO edge ordering, so one groupBy finishes the job.
       Interior faces have positive area under this rotation convention;
       the unbounded outer face comes out negative and dangling edges
       cancel to ~0 — both filtered.

    Returns one row per interior face: ``face_id`` (MIN half-edge id in
    the cycle), ``n_edges``, ``area``."""
    hej = _halfedge_faces(segments)
    cycles = hej.groupBy(F.col("component").alias("face_id")).agg(
        F.count("*").alias("n_edges"),
        (F.sum(
            F.col("ux") * F.col("vy") - F.col("vx") * F.col("uy")
        ) / 2.0).alias("area"),
        F.min(F.struct(F.col("ux").alias("rx"), F.col("uy").alias("ry")))
        .alias("rep"),
    )
    return _assemble_faces(hej, cycles)


def _halfedge_faces(segments: DataFrame) -> DataFrame:
    """The shared DCEL stage (polygonize / union-area): half-edges with
    their cycle label — (he_id, ux, uy, vx, vy, component)."""
    from tilekiln_spark.operators.dedup import connected_components
    from pyspark.sql import Window

    he = segments.select(
        F.explode(
            F.array(
                F.struct(
                    (F.col("seg_id") * 2).alias("he_id"),
                    F.col("x1").alias("ux"), F.col("y1").alias("uy"),
                    F.col("x2").alias("vx"), F.col("y2").alias("vy"),
                ),
                F.struct(
                    (F.col("seg_id") * 2 + 1).alias("he_id"),
                    F.col("x2").alias("ux"), F.col("y2").alias("uy"),
                    F.col("x1").alias("vx"), F.col("y1").alias("vy"),
                ),
            )
        ).alias("e")
    ).select("e.*")

    dx = F.col("vx") - F.col("ux")
    dy = F.col("vy") - F.col("uy")
    # diamond pseudo-angle: monotone in atan2(dy, dx), range [0, 4),
    # pure +-/ arithmetic (bit-identical cross-engine)
    pangle = (
        F.when((dx >= 0) & (dy >= 0), dy / (dx + dy))
        .when((dx < 0) & (dy >= 0), 1 + (-dx) / ((-dx) + dy))
        .when((dx < 0) & (dy < 0), 2 + (-dy) / ((-dx) + (-dy)))
        .otherwise(3 + dx / (dx - dy))
    )
    out = he.withColumn("pangle", pangle)
    w = Window.partitionBy("ux", "uy")
    ranked = out.select(
        "he_id", "ux", "uy",
        F.row_number().over(w.orderBy("pangle", "he_id")).alias("r"),
        F.count("*").over(w).alias("n"),
    )
    # rotational PREDECESSOR at the node (the clockwise neighbor in the
    # ascending-pseudo-angle ring): rank r -> ((r - 2 + n) % n) + 1.
    # With next(e) = rot_pred(twin(e)) interior faces trace with the
    # interior on the LEFT (positive Green area); the CCW-successor
    # variant instead traces the hull at junction nodes (test-pinned:
    # the 2x2 grid must yield 4 unit faces, not one 4.0 hull face)
    nxt = ranked.alias("a").join(
        ranked.alias("b"),
        (F.col("a.ux") == F.col("b.ux")) & (F.col("a.uy") == F.col("b.uy"))
        & (F.col("b.r")
           == ((F.col("a.r") - 2 + F.col("a.n")) % F.col("a.n")) + 1),
    ).select(
        F.col("a.he_id").alias("out_he"), F.col("b.he_id").alias("rot_he")
    )
    # successor(e) = rot(twin(e)); twin id is e XOR 1 — pure arithmetic
    succ = nxt.select(
        (F.col("out_he") - (F.col("out_he") % 2) * 2 + 1).alias("key_a"),
        F.col("rot_he").alias("key_b"),
    )
    labels = connected_components(succ)
    return he.join(labels.withColumnRenamed("node", "he_id"), "he_id")


def _assemble_faces(hej: DataFrame, cycles: DataFrame) -> DataFrame:
    """Hole assignment + positive-face projection (polygonize tail)."""
    # --- hole assignment (lake-with-island): a DISCONNECTED component
    # nested inside a face contributes that face's hole as its own
    # NEGATIVE cycle (each connected component has exactly one).  Assign
    # every negative cycle to the SMALLEST vertex-disjoint positive
    # cycle containing its representative vertex (even-odd raycast over
    # the cycle's UNORDERED edge set — crossing counting needs no ring
    # order, same strict convention as the PIP kernels) and add its
    # signed area/edges there; an unassigned negative cycle bounds the
    # unbounded face and drops.  Vertex-sharing pairs are excluded: a
    # component's own outer cycle always shares its vertices, and a
    # hole touching its shell pinches into one cycle at the noded
    # junction, so disjointness is exactly the cross-component test.
    pos = cycles.filter(F.col("area") > 0)
    neg = cycles.filter(F.col("area") < 0).select(
        F.col("face_id").alias("nid"),
        F.col("n_edges").alias("h_edges"),
        F.col("area").alias("h_area"),
        F.col("rep.rx").alias("rx"), F.col("rep.ry").alias("ry"),
    )

    verts = hej.select("component", "ux", "uy").distinct()
    conflict = (
        verts.withColumnRenamed("component", "nid")
        .join(verts.withColumnRenamed("component", "pid"), ["ux", "uy"])
        .filter(F.col("nid") != F.col("pid"))
        .select("nid", "pid")
        .distinct()
    )

    pos_edges = hej.join(
        pos.select(F.col("face_id").alias("pid")),
        hej["component"] == F.col("pid"),
    ).select("pid", "ux", "uy", "vx", "vy")
    straddle = (F.col("uy") > F.col("ry")) != (F.col("vy") > F.col("ry"))
    xint = F.col("ux") + (F.col("ry") - F.col("uy")) * (
        F.col("vx") - F.col("ux")
    ) / (F.col("vy") - F.col("uy"))
    contained = (
        F.broadcast(neg)
        .crossJoin(pos_edges)
        .filter(straddle & (F.col("rx") < xint))
        .groupBy("nid", "pid")
        .agg(F.count("*").alias("k"))
        .filter(F.col("k") % 2 == 1)
        .join(conflict, ["nid", "pid"], "left_anti")
    )
    parent = (
        contained.join(
            pos.select(F.col("face_id").alias("pid"), F.col("area").alias("p_area")),
            "pid",
        )
        .groupBy("nid")
        .agg(F.min(F.struct(F.col("p_area"), F.col("pid"))).alias("b"))
        .select("nid", F.col("b.pid").alias("pid"))
    )
    holes = (
        neg.join(parent, "nid")
        .groupBy("pid")
        .agg(F.sum("h_area").alias("h_area"), F.sum("h_edges").alias("h_edges"))
    )
    faces = (
        pos.join(holes, pos["face_id"] == holes["pid"], "left")
        .select(
            "face_id",
            (F.col("n_edges") + F.coalesce("h_edges", F.lit(0))).alias("n_edges"),
            (F.col("area") + F.coalesce("h_area", F.lit(0.0))).alias("area"),
        )
    )
    return faces.filter(F.col("area") > 0)


def shared_paths_join(
    segments: DataFrame,
    grid_zoom: int = 4,
    max_cells_per_poly: int = 64,
) -> DataFrame:
    """PostGIS ``ST_SharedPaths`` at segment granularity: for every pair
    of EXACTLY-collinear segments with positive 1-D overlap, the shared
    length and whether they run the same direction — the measurement
    companion to :func:`node_segments`'s documented collinear gap
    (duplicate/overlapping way geometry is the classic OSM data bug
    this detects).

    Pure column arithmetic over the shared PBSM candidate stage:
    collinear iff ``cross(r_a, r_b) == 0`` and ``cross(b1-a1, r_a) == 0``
    (exact float tests — quantize upstream for measured data); overlap
    from projecting B's endpoints onto A's parameter and clamping to
    [0, 1]; ``same_dir = dot(r_a, r_b) > 0``.  Each unordered pair once
    (``seg_id < b_seg_id``); zero-length segments never emit (their
    ``dot(r, r)`` is 0 — guarded).  Returns
    ``(a_id, b_id, shared_len, same_dir)``."""
    from tilekiln_spark.operators.spatial_join import _pbsm_candidates

    shaped = _segments_as_pbsm_input(segments)
    cand = _pbsm_candidates(
        shaped, shaped, grid_zoom, True, max_cells_per_poly
    ).filter(F.col("polygon_id") < F.col("b_polygon_id"))

    ax1, ay1 = F.element_at("ring_xs", 1), F.element_at("ring_ys", 1)
    ax2, ay2 = F.element_at("ring_xs", 2), F.element_at("ring_ys", 2)
    bx1, by1 = F.element_at("b_ring_xs", 1), F.element_at("b_ring_ys", 1)
    bx2, by2 = F.element_at("b_ring_xs", 2), F.element_at("b_ring_ys", 2)
    rx, ry = ax2 - ax1, ay2 - ay1
    sx, sy = bx2 - bx1, by2 - by1
    rr = rx * rx + ry * ry
    collinear = (
        (rx * sy - ry * sx == 0)
        & ((bx1 - ax1) * ry - (by1 - ay1) * rx == 0)
        & (rr > 0)
    )
    t1 = ((bx1 - ax1) * rx + (by1 - ay1) * ry) / rr
    t2 = ((bx2 - ax1) * rx + (by2 - ay1) * ry) / rr
    lo = F.greatest(F.lit(0.0), F.least(t1, t2))
    hi = F.least(F.lit(1.0), F.greatest(t1, t2))
    shared = (hi - lo) * F.sqrt(rr)
    return (
        cand.filter(collinear)
        .select(
            F.col("polygon_id").alias("a_id"),
            F.col("b_polygon_id").alias("b_id"),
            shared.alias("shared_len"),
            (rx * sx + ry * sy > 0).alias("same_dir"),
        )
        .filter(F.col("shared_len") > 0)
    )


def union_area(rings: DataFrame, grid_zoom: int = 4, max_iter: int = 64) -> DataFrame:
    """See :func:`coverage_faces` — union area = sum of nonzero-mask
    face areas; also returns the covered-face count."""
    covered = coverage_faces(rings, grid_zoom, max_iter).filter(
        F.col("mask") != 0
    )
    return covered.agg(
        F.sum("area").alias("union_area"),
        F.count("*").alias("n_faces"),
    )


def coverage_faces(
    rings: DataFrame, grid_zoom: int = 4, max_iter: int = 64
) -> DataFrame:
    """EXACT n-way ``ST_Union`` area over simple rings — distributed,
    with NO union geometry ever materialized (the step that makes exact
    overlays hard to distribute is ordering the union boundary; this
    never needs it):

    1. ring edges become tagged segments (``seg_id`` encodes the ring)
       and are NODED at every crossing (:func:`node_segments`);
    2. the shared DCEL stage labels arrangement faces
       (:func:`_halfedge_faces` — rotation, successor permutation,
       cycle components);
    3. **combinatorial coverage** — crossing an edge of ring R toggles
       membership in R, so each face's membership BITMASK is the XOR of
       ring bits along ANY path from the unbounded face (planarity
       makes it path-independent).  Seeds: every component's negative
       cycle (its outer face) starts at 0; labels propagate over the
       face-adjacency graph (face(e) ~ face(twin e)) by frontier BFS —
       the shortest_paths loop shape, rounds = face-graph diameter;
    4. union area = sum of face areas whose mask is nonzero.  Also
       returns ``n_faces`` (covered faces) for plan sanity.

    Input: ``(ring_id, ring_xs, ring_ys)`` unclosed simple rings,
    ``ring_id`` in [0, 62] (bitmask in one long).  Rings may overlap,
    touch, OR fully contain one another without boundary contact: a
    disjoint-nested component's outer face seeds at the host face's
    mask via the raycast seed-mask correction below (the r4 documented
    bound, closed r5).  Only EXACT duplicate whole rings (every edge
    cancelling in the dedupe-XOR) remain out of contract.

    Returns every arrangement face with its signed area and coverage
    bitmask: ``(face_id, area, mask)`` — union_area / exclusive-area
    queries are one aggregate on top."""
    n_rings = rings.select(F.max("ring_id")).collect()[0][0]
    if n_rings is None:
        raise ValueError("union_area: empty ring frame")
    if n_rings > 62:
        raise ValueError(
            "union_area: ring_id must be in [0, 62] (one long bitmask; bit"
            " 63 is unreachable for the DuckDB-twin BIGINT shift)"
        )

    # ring edges -> tagged segments: seg_id = ring_id * 2^20 + k
    k = F.col("k")
    n = F.size("ring_xs")
    seg = rings.select(
        "ring_id", "ring_xs", "ring_ys",
        F.explode(F.sequence(F.lit(1), n)).alias("k"),
    ).select(
        (F.col("ring_id") * F.lit(1 << 20) + k).alias("seg_id"),
        F.element_at("ring_xs", k).alias("x1"),
        F.element_at("ring_ys", k).alias("y1"),
        F.element_at("ring_xs", (k % F.size("ring_xs")) + 1).alias("x2"),
        F.element_at("ring_ys", (k % F.size("ring_ys")) + 1).alias("y2"),
    )
    raw_parts = node_segments(seg, grid_zoom=grid_zoom).select(
        (F.col("seg_id") * 100 + F.col("part")).alias("seg_id"),
        F.col("px1").alias("x1"), F.col("py1").alias("y1"),
        F.col("px2").alias("x2"), F.col("py2").alias("y2"),
    )
    # SHARED BORDERS: two rings running the same boundary line produce
    # duplicate undirected edges after noding — duplicate directions at a
    # node corrupt the DCEL rotation, AND semantically a shared border
    # toggles BOTH rings at once.  One dedupe groupBy fixes both: keep a
    # canonically-oriented representative per undirected edge and XOR the
    # carrier ring bits into its toggle (a ring never repeats its own
    # edge, so bits never cancel to 0 here).
    part_ring = (F.floor(F.col("seg_id") / 100 / F.lit(1 << 20))).cast("long")
    part_bit = F.call_function(
        "shiftleft", F.lit(1).cast("long"), part_ring.cast("int")
    )
    fwd = F.struct("x1", "y1") <= F.struct("x2", "y2")
    deduped = (
        raw_parts.select(
            "seg_id",
            F.when(fwd, F.col("x1")).otherwise(F.col("x2")).alias("x1"),
            F.when(fwd, F.col("y1")).otherwise(F.col("y2")).alias("y1"),
            F.when(fwd, F.col("x2")).otherwise(F.col("x1")).alias("x2"),
            F.when(fwd, F.col("y2")).otherwise(F.col("y1")).alias("y2"),
            part_bit.alias("bit"),
        )
        .groupBy("x1", "y1", "x2", "y2")
        .agg(F.min("seg_id").alias("seg_id"), F.bit_xor("bit").alias("bit"))
    )
    parts = deduped.select("seg_id", "x1", "y1", "x2", "y2")
    bits = deduped.select(F.col("seg_id").alias("bit_seg"), "bit")
    hej = _halfedge_faces(parts).localCheckpoint(eager=True)

    cycles = hej.groupBy(F.col("component").alias("face_id")).agg(
        (F.sum(
            F.col("ux") * F.col("vy") - F.col("vx") * F.col("uy")
        ) / 2.0).alias("area"),
    ).localCheckpoint(eager=True)

    # face adjacency across each edge, tagged with the toggled ring bit
    twin = hej.select(
        (F.col("he_id") - (F.col("he_id") % 2) * 2 + 1).alias("he_id"),
        F.col("component").alias("nbr_face"),
    )
    adj = (
        hej.join(twin, "he_id")
        .join(bits, F.floor(F.col("he_id") / 2) == F.col("bit_seg"))
        .select(
            F.col("component").alias("face_a"),
            F.col("nbr_face").alias("face_b"),
            "bit",
        )
        .distinct()
        .localCheckpoint(eager=True)
    )

    # BFS carries the originating negative cycle as `root` (components
    # are disjoint, so each face has exactly one root): masks computed
    # here are RELATIVE to the component's own outer face being 0.
    seeds = cycles.filter(F.col("area") < 0).select(
        F.col("face_id").alias("face"),
        F.lit(0).cast("long").alias("mask"),
        F.col("face_id").alias("root"),
    )
    known = seeds.localCheckpoint(eager=True)
    frontier = known
    for _ in range(max_iter):
        step = (
            frontier.join(adj, frontier["face"] == adj["face_a"])
            .select(
                F.col("face_b").alias("face"),
                F.col("mask").bitwiseXOR(F.col("bit")).alias("mask"),
                "root",
            )
            .join(known.select(F.col("face").alias("kf")),
                  F.col("face") == F.col("kf"), "left_anti")
            .groupBy("face")
            .agg(F.min("mask").alias("mask"), F.min("root").alias("root"))
            .localCheckpoint(eager=True)
        )
        if step.isEmpty():
            break
        known = known.union(step).localCheckpoint(eager=True)
        frontier = step

    # DISJOINT NESTING (the r4 documented gap): a component fully inside
    # another component's face must seed its outer face at THAT face's
    # mask, not 0.  XOR path-independence means no re-walk is needed:
    # absolute mask = relative mask XOR seed_mask(root), where
    # seed_mask(root) = XOR of the bits of every ring of a DIFFERENT
    # component that strictly contains the component's representative
    # vertex (even-odd raycast over the ORIGINAL rings; contact would
    # have merged the components, so the test is never degenerate).
    from tilekiln_spark.operators.spatial_join import pip_raycast

    ring_of_face = (
        hej.select("component", (F.floor(F.col("he_id") / 2)).alias("p_seg"))
        .join(bits.select(F.col("bit_seg").alias("p_seg")), "p_seg")
        .select(
            F.col("component").alias("face"),
            (F.floor(F.col("p_seg") / 100 / F.lit(1 << 20)))
            .cast("long").alias("ring_id"),
        )
        .distinct()
    )
    ring_root = (
        ring_of_face.join(known, "face")
        .select("ring_id", "root")
        .distinct()
    )
    reps = (
        hej.join(
            cycles.filter(F.col("area") < 0).select("face_id"),
            hej["component"] == F.col("face_id"),
        )
        .groupBy(F.col("component").alias("root"))
        .agg(F.min(F.struct("ux", "uy")).alias("v"))
        .select("root", F.col("v.ux").alias("vx"), F.col("v.uy").alias("vy"))
    )
    others = (
        reps.crossJoin(F.broadcast(rings.select("ring_id", "ring_xs", "ring_ys")))
        .join(ring_root.withColumnRenamed("root", "r_root"), "ring_id")
        .filter(F.col("r_root") != F.col("root"))
        .filter(pip_raycast(F.col("vx"), F.col("vy"),
                            F.col("ring_xs"), F.col("ring_ys")))
        .groupBy("root")
        .agg(
            F.sum(
                F.call_function("shiftleft", F.lit(1).cast("long"),
                                F.col("ring_id").cast("int"))
            ).alias("seed_mask")
        )
    )
    corrected = (
        known.join(others, "root", "left")
        .select(
            "face",
            F.col("mask")
            .bitwiseXOR(F.coalesce("seed_mask", F.lit(0)).cast("long"))
            .alias("mask"),
        )
    )
    return cycles.join(corrected, cycles["face_id"] == corrected["face"]).select(
        "face_id", "area", "mask"
    )


def make_valid_areas(
    rings: DataFrame, grid_zoom: int = 4, max_iter: int = 64
) -> DataFrame:
    """``ST_Area(ST_MakeValid(ring))`` per ring — the self-intersection
    repair face of the arrangement machinery: PostGIS's default
    linework/structure repair keeps exactly the regions of ODD winding
    parity (a bowtie becomes its two triangles, a self-touching figure-8
    its two lobes), and :func:`coverage_faces`' XOR-toggle masks ARE
    even-odd parity per ring — so the repaired area needs no new
    geometry stage at all.

    ONE shared arrangement serves every input ring simultaneously
    (invalid or valid; a valid ring simply reports its plain area): face
    f belongs to ring r's repaired polygon iff bit r of f's coverage
    mask is set.  Overlapping rings split each other's faces in the
    arrangement, but each ring's parity — and therefore its repaired
    area — is untouched by the others (the split faces sum back).

    Returns ``(ring_id, valid_area, n_faces)``; a fully degenerate ring
    (zero-area linework) emits no row.  Same input contract as
    :func:`coverage_faces` (ring_id in [0, 62]; no boundary-free full
    containment between DIFFERENT rings)."""
    faces = coverage_faces(rings, grid_zoom=grid_zoom, max_iter=max_iter)
    ids = rings.select("ring_id").distinct()
    rbit = F.call_function("shiftleft", F.lit(1).cast("long"),
                                F.col("ring_id").cast("int"))
    hit = faces.filter(F.col("mask") != 0).join(
        F.broadcast(ids),
        F.col("mask").bitwiseAND(rbit) != 0,
    )
    return hit.groupBy("ring_id").agg(
        F.sum("area").alias("valid_area"),
        F.count("*").alias("n_faces"),
    )
