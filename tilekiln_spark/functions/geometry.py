"""Geometry measures over ring/line coordinate arrays: ST_Area, ST_Length,
ST_Perimeter (PostGIS parity — the reference's templates read osm2pgsql's
precomputed ``way_area`` and call PostGIS measures freely,
reference tilekiln/definition.py:42-77).

Spark-first shape: geometries live as flat coordinate arrays
(``ring_xs``/``ring_ys`` — the same layout every spatial operator here
uses), so each measure is ONE ``F.aggregate`` fold over an index sequence —
a built-in higher-order function, whole-stage codegen, no UDF, no shuffle.
Each measure has a ``*_sql`` twin generating the identical arithmetic as
DuckDB list-lambda SQL (one definition drives both engines' oracles).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ring_area(ring_xs: Column, ring_ys: Column) -> Column:
    """Unsigned shoelace area of a closed ring given WITHOUT the repeated
    closing vertex (the fixture/operator layout).  Null-propagates on null
    arrays; a degenerate ring (< 3 vertices) has area 0."""
    n = F.size(ring_xs)

    def term(i: Column) -> Column:
        j = F.pmod(i, n) + 1  # wrap: edge (i, i+1), 1-based element_at
        return (
            F.element_at(ring_xs, i) * F.element_at(ring_ys, j)
            - F.element_at(ring_xs, j) * F.element_at(ring_ys, i)
        )

    s = F.aggregate(
        F.sequence(F.lit(1), n),
        F.lit(0.0),
        lambda acc, i: acc + term(i),
    )
    # guard BEFORE the fold: F.sequence(1, 0) steps DOWN to [1, 0] and
    # element_at(_, 0) raises under ANSI — degenerate rings are plain 0.0
    return F.when(n >= 3, F.abs(s) / F.lit(2.0)).otherwise(
        F.when(ring_xs.isNotNull() & ring_ys.isNotNull(), F.lit(0.0))
    )


def ring_area_sql(xs: str, ys: str) -> str:
    """DuckDB twin of :func:`ring_area` (1-based list indexing)."""
    shoelace = (
        f"(abs(list_sum(list_transform(range(1, len({xs}) + 1), i -> "
        f"{xs}[i] * {ys}[(i % len({xs})) + 1] "
        f"- {xs}[(i % len({xs})) + 1] * {ys}[i]))) / 2.0)"
    )
    return (
        f"(CASE WHEN {xs} IS NULL OR {ys} IS NULL THEN NULL "
        f"WHEN len({xs}) >= 3 THEN {shoelace} ELSE 0.0 END)"
    )


def line_length(xs: Column, ys: Column, closed: bool = False) -> Column:
    """Sum of Euclidean edge lengths of an OPEN polyline; ``closed=True``
    adds the wrap-around edge (ring perimeter).  Null-propagates on null
    arrays; a chain with fewer than 2 vertices has length 0."""
    n = F.size(xs)
    last = n if closed else n - 1

    def edge(i: Column) -> Column:
        j = F.pmod(i, n) + 1
        dx = F.element_at(xs, j) - F.element_at(xs, i)
        dy = F.element_at(ys, j) - F.element_at(ys, i)
        return F.sqrt(dx * dx + dy * dy)

    s = F.aggregate(
        F.sequence(F.lit(1), last),
        F.lit(0.0),
        lambda acc, i: acc + edge(i),
    )
    # guard BEFORE the fold: F.sequence(1, 0) steps DOWN through index 0 and
    # element_at(_, 0) raises — a <2-vertex chain is plain 0.0 (CASE WHEN
    # branches evaluate lazily per row, so the fold never runs there)
    return F.when(n >= 2, s).otherwise(
        F.when(xs.isNotNull() & ys.isNotNull(), F.lit(0.0))
    )


def line_length_sql(xs: str, ys: str, closed: bool = False) -> str:
    """DuckDB twin of :func:`line_length` (range() is end-exclusive and
    empty when start >= stop; list_sum([]) is NULL, hence the coalesce)."""
    last = f"len({xs}) + 1" if closed else f"len({xs})"
    j = f"(i % len({xs})) + 1"
    body = (
        f"coalesce(list_sum(list_transform(range(1, {last}), i -> "
        f"sqrt(({xs}[{j}] - {xs}[i]) * ({xs}[{j}] - {xs}[i]) "
        f"+ ({ys}[{j}] - {ys}[i]) * ({ys}[{j}] - {ys}[i])))), 0.0)"
    )
    return (
        f"(CASE WHEN {xs} IS NULL OR {ys} IS NULL THEN NULL "
        f"ELSE {body} END)"
    )


def unit_displacement_sums(xs: Column, ys: Column) -> tuple:
    """Per-chain unit-displacement vector sums (Sux, Suy, n_edges) — the
    trig-free circular-statistics primitive: each edge contributes its
    UNIT vector (dx/len, dy/len), so the mean bearing is one final
    atan2(Sux, Suy) and the resultant length R = |S|/n, with NO libm in
    the fold (sqrt/divide only — identical IEEE expressions on the
    DuckDB twin, :func:`unit_displacement_sums_sql`).  Zero-length edges
    are skipped (contribute nothing, not counted).  Sequential ascending
    folds, same shape as :func:`line_length`."""
    n = F.size(xs)

    def edge_len(i: Column) -> Column:
        dx = F.element_at(xs, i + 1) - F.element_at(xs, i)
        dy = F.element_at(ys, i + 1) - F.element_at(ys, i)
        return F.sqrt(dx * dx + dy * dy)

    def fold(num) -> Column:
        return F.aggregate(
            F.sequence(F.lit(1), n - 1),
            F.lit(0.0),
            lambda acc, i: acc
            + F.when(edge_len(i) > 0.0, num(i) / edge_len(i)).otherwise(0.0),
        )

    sux = fold(lambda i: F.element_at(xs, i + 1) - F.element_at(xs, i))
    suy = fold(lambda i: F.element_at(ys, i + 1) - F.element_at(ys, i))
    n_edges = F.aggregate(
        F.sequence(F.lit(1), n - 1),
        F.lit(0).cast("long"),
        lambda acc, i: acc + F.when(edge_len(i) > 0.0, 1).otherwise(0).cast("long"),
    )
    guard = lambda c: F.when(n >= 2, c)  # noqa: E731
    return guard(sux), guard(suy), guard(n_edges)


def unit_displacement_sums_sql(xs: str, ys: str) -> tuple:
    """DuckDB twin of :func:`unit_displacement_sums`."""
    j = "(i + 1)"
    dx = f"({xs}[{j}] - {xs}[i])"
    dy = f"({ys}[{j}] - {ys}[i])"
    ln = f"sqrt({dx} * {dx} + {dy} * {dy})"

    def fold(num: str) -> str:
        return (
            f"coalesce(list_sum(list_transform(range(1, len({xs})), i -> "
            f"CASE WHEN {ln} > 0.0 THEN {num} / {ln} ELSE 0.0 END)), 0.0)"
        )

    ne = (
        f"coalesce(list_sum(list_transform(range(1, len({xs})), i -> "
        f"CASE WHEN {ln} > 0.0 THEN 1 ELSE 0 END)), 0)"
    )
    g = f"CASE WHEN len({xs}) >= 2 THEN {{v}} END"
    return (
        g.format(v=fold(dx)),
        g.format(v=fold(dy)),
        g.format(v=f"CAST({ne} AS BIGINT)"),
    )


def turning_angle_sum(xs: Column, ys: Column) -> Column:
    """Sum of absolute turning angles |atan2(cross, dot)| at each interior
    vertex of an open chain — the building block of movement-analytics
    sinuosity/tortuosity measures.  One ascending fold (guarded for
    chains shorter than 3, like :func:`line_length`); requires no
    repeated vertices (a zero-length edge has no direction)."""
    n = F.size(xs)

    def ang(j: Column) -> Column:
        ux = F.element_at(xs, j) - F.element_at(xs, j - 1)
        uy = F.element_at(ys, j) - F.element_at(ys, j - 1)
        vx = F.element_at(xs, j + 1) - F.element_at(xs, j)
        vy = F.element_at(ys, j + 1) - F.element_at(ys, j)
        return F.abs(F.atan2(ux * vy - uy * vx, ux * vx + uy * vy))

    s = F.aggregate(
        F.sequence(F.lit(2), n - 1),
        F.lit(0.0),
        lambda acc, j: acc + ang(j),
    )
    return F.when(n >= 3, s).otherwise(
        F.when(xs.isNotNull() & ys.isNotNull(), F.lit(0.0))
    )


def turning_angle_sum_sql(xs: str, ys: str) -> str:
    """DuckDB twin of :func:`turning_angle_sum` (range(2, n) is exactly
    the interior vertices; empty -> list_sum NULL -> coalesce 0)."""
    ux = f"({xs}[j] - {xs}[j - 1])"
    uy = f"({ys}[j] - {ys}[j - 1])"
    vx = f"({xs}[j + 1] - {xs}[j])"
    vy = f"({ys}[j + 1] - {ys}[j])"
    body = (
        f"coalesce(list_sum(list_transform(range(2, len({xs})), j -> "
        f"abs(atan2({ux} * {vy} - {uy} * {vx}, "
        f"{ux} * {vx} + {uy} * {vy})))), 0.0)"
    )
    return (
        f"(CASE WHEN {xs} IS NULL OR {ys} IS NULL THEN NULL "
        f"ELSE {body} END)"
    )


def ring_perimeter(ring_xs: Column, ring_ys: Column) -> Column:
    """Closed-ring perimeter (ST_Perimeter for a single exterior ring)."""
    return line_length(ring_xs, ring_ys, closed=True)


def ring_perimeter_sql(xs: str, ys: str) -> str:
    return line_length_sql(xs, ys, closed=True)


def rings_intersect_sql(axs: str, ays: str, bxs: str, bys: str) -> str:
    """DuckDB twin of the ring-pair ST_Intersects kernel
    (operators/spatial_join.py _rings_intersect_np): any vertex of one ring
    inside the other (even-odd raycast) OR any edge pair crossing/touching.
    Same multiply/subtract/compare order as the numpy kernel, so the
    decision is bit-identical; the raycast division sits behind the
    straddle CASE (never zero there)."""

    def vertex_in(pxs: str, pys: str, rxs: str, rys: str) -> str:
        j = f"(j % len({rxs})) + 1"
        cross = (
            f"CASE WHEN (({rys}[j] > {pys}[i]) != ({rys}[{j}] > {pys}[i])) "
            f"THEN CASE WHEN {pxs}[i] < {rxs}[j] + ({pys}[i] - {rys}[j]) "
            f"* ({rxs}[{j}] - {rxs}[j]) / ({rys}[{j}] - {rys}[j]) "
            f"THEN 1 ELSE 0 END ELSE 0 END"
        )
        inside = (
            f"(list_sum(list_transform(range(1, len({rxs}) + 1), j -> {cross})) % 2) = 1"
        )
        return (
            f"coalesce(list_max(list_transform(range(1, len({pxs}) + 1), i -> "
            f"CASE WHEN {inside} THEN 1 ELSE 0 END)), 0) = 1"
        )

    # edge pair (i of A, j of B): endpoints p1 p2 q1 q2
    ia = f"(i % len({axs})) + 1"
    jb = f"(j % len({bxs})) + 1"
    p1x, p1y = f"{axs}[i]", f"{ays}[i]"
    p2x, p2y = f"{axs}[{ia}]", f"{ays}[{ia}]"
    q1x, q1y = f"{bxs}[j]", f"{bys}[j]"
    q2x, q2y = f"{bxs}[{jb}]", f"{bys}[{jb}]"

    def orient(ox, oy, dx, dy, px, py) -> str:
        return f"(({dx} - {ox}) * ({py} - {oy}) - ({dy} - {oy}) * ({px} - {ox}))"

    o1 = orient(p1x, p1y, p2x, p2y, q1x, q1y)
    o2 = orient(p1x, p1y, p2x, p2y, q2x, q2y)
    o3 = orient(q1x, q1y, q2x, q2y, p1x, p1y)
    o4 = orient(q1x, q1y, q2x, q2y, p2x, p2y)
    proper = (
        f"((({o1}) > 0 AND ({o2}) < 0) OR (({o1}) < 0 AND ({o2}) > 0)) "
        f"AND ((({o3}) > 0 AND ({o4}) < 0) OR (({o3}) < 0 AND ({o4}) > 0))"
    )

    def onseg(ox, oy, dx, dy, px, py, o) -> str:
        return (
            f"(({o}) = 0 AND {px} >= least({ox}, {dx}) AND {px} <= greatest({ox}, {dx}) "
            f"AND {py} >= least({oy}, {dy}) AND {py} <= greatest({oy}, {dy}))"
        )

    touch = " OR ".join(
        [
            onseg(p1x, p1y, p2x, p2y, q1x, q1y, o1),
            onseg(p1x, p1y, p2x, p2y, q2x, q2y, o2),
            onseg(q1x, q1y, q2x, q2y, p1x, p1y, o3),
            onseg(q1x, q1y, q2x, q2y, p2x, p2y, o4),
        ]
    )
    edges = (
        f"coalesce(list_max(flatten(list_transform(range(1, len({axs}) + 1), i -> "
        f"list_transform(range(1, len({bxs}) + 1), j -> "
        f"CASE WHEN ({proper}) OR ({touch}) THEN 1 ELSE 0 END)))), 0) = 1"
    )
    return (
        f"({vertex_in(axs, ays, bxs, bys)} OR {vertex_in(bxs, bys, axs, ays)} "
        f"OR {edges})"
    )


def chain_in_ring_sql(lxs: str, lys: str, rxs: str, rys: str) -> str:
    """DuckDB twin of the chain-in-ring ST_ContainsProperly kernel
    (operators/spatial_join.py _chain_in_ring_np): NO chain edge crosses or
    touches any ring edge (boundary contact excludes), AND the first chain
    vertex raycasts inside.  Same multiply/subtract/compare order as the
    numpy kernel — bit-identical decisions; the raycast division sits
    behind the straddle CASE (never zero there)."""
    # even-odd raycast for chain vertex 1 (SQL arrays are 1-based)
    jr = f"(j % len({rxs})) + 1"
    px, py = f"{lxs}[1]", f"{lys}[1]"
    cross = (
        f"CASE WHEN (({rys}[j] > {py}) != ({rys}[{jr}] > {py})) "
        f"THEN CASE WHEN {px} < {rxs}[j] + ({py} - {rys}[j]) "
        f"* ({rxs}[{jr}] - {rxs}[j]) / ({rys}[{jr}] - {rys}[j]) "
        f"THEN 1 ELSE 0 END ELSE 0 END"
    )
    inside = (
        f"(list_sum(list_transform(range(1, len({rxs}) + 1), j -> {cross})) % 2) = 1"
    )

    # chain edge i (no wrap: i in 1..len-1) vs ring edge j (wrap)
    p1x, p1y = f"{lxs}[i]", f"{lys}[i]"
    p2x, p2y = f"{lxs}[i + 1]", f"{lys}[i + 1]"
    q1x, q1y = f"{rxs}[j]", f"{rys}[j]"
    q2x, q2y = f"{rxs}[{jr}]", f"{rys}[{jr}]"

    def orient(ox, oy, dx, dy, px_, py_) -> str:
        return f"(({dx} - {ox}) * ({py_} - {oy}) - ({dy} - {oy}) * ({px_} - {ox}))"

    o1 = orient(p1x, p1y, p2x, p2y, q1x, q1y)
    o2 = orient(p1x, p1y, p2x, p2y, q2x, q2y)
    o3 = orient(q1x, q1y, q2x, q2y, p1x, p1y)
    o4 = orient(q1x, q1y, q2x, q2y, p2x, p2y)
    proper = (
        f"((({o1}) > 0 AND ({o2}) < 0) OR (({o1}) < 0 AND ({o2}) > 0)) "
        f"AND ((({o3}) > 0 AND ({o4}) < 0) OR (({o3}) < 0 AND ({o4}) > 0))"
    )

    def onseg(ox, oy, dx, dy, px_, py_, o) -> str:
        return (
            f"(({o}) = 0 AND {px_} >= least({ox}, {dx}) AND {px_} <= greatest({ox}, {dx}) "
            f"AND {py_} >= least({oy}, {dy}) AND {py_} <= greatest({oy}, {dy}))"
        )

    touch = " OR ".join(
        [
            onseg(p1x, p1y, p2x, p2y, q1x, q1y, o1),
            onseg(p1x, p1y, p2x, p2y, q2x, q2y, o2),
            onseg(q1x, q1y, q2x, q2y, p1x, p1y, o3),
            onseg(q1x, q1y, q2x, q2y, p2x, p2y, o4),
        ]
    )
    boundary = (
        f"coalesce(list_max(flatten(list_transform(range(1, len({lxs})), i -> "
        f"list_transform(range(1, len({rxs}) + 1), j -> "
        f"CASE WHEN ({proper}) OR ({touch}) THEN 1 ELSE 0 END)))), 0) = 1"
    )
    return (
        f"(CASE WHEN {lxs} IS NULL OR {lys} IS NULL OR {rxs} IS NULL "
        f"OR {rys} IS NULL OR len({lxs}) < 2 OR len({rxs}) < 3 THEN FALSE "
        f"ELSE (NOT ({boundary})) AND ({inside}) END)"
    )


def chain_ring_clip_len_sql(lxs: str, lys: str, rxs: str, rys: str) -> str:
    """DuckDB twin of the clipped-length overlay kernel
    (operators/spatial_join.py _chain_ring_clip_len_np): per chain edge,
    cut [0, 1] at every proper ring-edge intersection parameter, classify
    each sub-interval by an even-odd midpoint raycast, sum inside lengths.
    Every builder is a FUNCTION of its index expression (distinct lambda
    variables i / k / m / j at each nesting level — no shadowing), and
    every division/compare matches the numpy kernel's form, so the cuts
    and inside decisions are bit-identical; callers round the final sum."""
    p1x, p1y = f"{lxs}[i]", f"{lys}[i]"
    ex = f"({lxs}[i + 1] - {lxs}[i])"
    ey = f"({lys}[i + 1] - {lys}[i])"

    def ring(j: str) -> dict:
        j2 = f"(({j}) % len({rxs})) + 1"
        return {
            "fx": f"({rxs}[{j2}] - {rxs}[{j}])",
            "fy": f"({rys}[{j2}] - {rys}[{j}])",
            "q1x": f"{rxs}[{j}]",
            "q1y": f"{rys}[{j}]",
        }

    # cut parameters: lambda var m (inside the per-edge i scope)
    r = ring("m")
    wx = f"({r['q1x']} - {p1x})"
    wy = f"({r['q1y']} - {p1y})"
    d = f"({ex} * {r['fy']} - {ey} * {r['fx']})"
    t = f"(({wx} * {r['fy']} - {wy} * {r['fx']}) / {d})"
    u = f"(({wx} * {ey} - {wy} * {ex}) / {d})"
    tj = (
        f"CASE WHEN {d} != 0 AND {t} >= 0 AND {t} <= 1 "
        f"AND {u} >= 0 AND {u} <= 1 THEN {t} ELSE NULL END"
    )
    ts = (
        f"list_sort(list_concat([0.0, 1.0], list_filter("
        f"list_transform(range(1, len({rxs}) + 1), m -> {tj}), "
        f"x -> x IS NOT NULL)))"
    )
    a = f"({ts})[k]"
    b = f"({ts})[k + 1]"
    mid = f"(({a} + {b}) / 2)"
    mx = f"({p1x} + {mid} * {ex})"
    my = f"({p1y} + {mid} * {ey})"
    # midpoint raycast: lambda var j (inside the k scope)
    rj = ring("j")
    cross = (
        f"CASE WHEN (({rj['q1y']} > {my}) != ({rys}[((j) % len({rxs})) + 1] > {my})) "
        f"THEN CASE WHEN {mx} < {rj['q1x']} + ({my} - {rj['q1y']}) "
        f"* {rj['fx']} / {rj['fy']} THEN 1 ELSE 0 END ELSE 0 END"
    )
    inside = (
        f"(list_sum(list_transform(range(1, len({rxs}) + 1), j -> {cross})) % 2) = 1"
    )
    el = f"sqrt({ex} * {ex} + {ey} * {ey})"
    term = (
        f"CASE WHEN {b} > {a} AND ({inside}) THEN ({b} - {a}) * {el} "
        f"ELSE 0.0 END"
    )
    edge_sum = (
        f"coalesce(list_sum(list_transform(range(1, len({ts})), k -> {term})), 0.0)"
    )
    total = (
        f"coalesce(list_sum(list_transform(range(1, len({lxs})), i -> "
        f"{edge_sum})), 0.0)"
    )
    return (
        f"(CASE WHEN {lxs} IS NULL OR {lys} IS NULL OR {rxs} IS NULL "
        f"OR {rys} IS NULL OR len({lxs}) < 2 OR len({rxs}) < 3 THEN 0.0 "
        f"ELSE {total} END)"
    )


def ring_signed_area2_sql(xs: str, ys: str) -> str:
    """2x the signed shoelace area of a ring (positive = CCW) — the
    orientation normalizer the clip-area twin's callers use:
    ``CASE WHEN this < 0 THEN list_reverse(...) ...``."""
    j = f"(i % len({xs})) + 1"
    return (
        f"coalesce(list_sum(list_transform(range(1, len({xs}) + 1), i -> "
        f"{xs}[i] * {ys}[{j}] - {xs}[{j}] * {ys}[i])), 0.0)"
    )


def ring_ring_clip_area_sql(axs: str, ays: str, bxs: str, bys: str) -> str:
    """DuckDB twin of the intersection-area kernel
    (operators/spatial_join.py _ring_ring_clip_area_np) — Green's theorem
    over unordered boundary pieces: per edge of each ring, cut [0,1] at
    the other ring's intersection parameters, weight each sub-interval by
    its midpoint classification (inside 1, outside 0, exactly ON the
    other boundary 1/2 — the shared-border convention), accumulate
    weight·(x_a·y_b − y_a·x_b); half the two-sided sum is the area.
    INPUTS MUST BE CCW-NORMALIZED (use
    :func:`ring_signed_area2_sql` + list_reverse in a prior CTE — the
    numpy kernel normalizes internally with the same sign test).  Every
    division/compare matches the kernel's form, so cuts and inside
    decisions are bit-identical; callers round the final sum."""

    def one_side(pxs: str, pys: str, rxs: str, rys: str) -> str:
        ip = f"(i % len({pxs})) + 1"
        p1x, p1y = f"{pxs}[i]", f"{pys}[i]"
        ex = f"({pxs}[{ip}] - {pxs}[i])"
        ey = f"({pys}[{ip}] - {pys}[i])"

        def ring(j: str) -> dict:
            j2 = f"(({j}) % len({rxs})) + 1"
            return {
                "fx": f"({rxs}[{j2}] - {rxs}[{j}])",
                "fy": f"({rys}[{j2}] - {rys}[{j}])",
                "q1x": f"{rxs}[{j}]",
                "q1y": f"{rys}[{j}]",
            }

        r = ring("m")
        wx = f"({r['q1x']} - {p1x})"
        wy = f"({r['q1y']} - {p1y})"
        d = f"({ex} * {r['fy']} - {ey} * {r['fx']})"
        t = f"(({wx} * {r['fy']} - {wy} * {r['fx']}) / {d})"
        u = f"(({wx} * {ey} - {wy} * {ex}) / {d})"
        tj = (
            f"CASE WHEN {d} != 0 AND {t} >= 0 AND {t} <= 1 "
            f"AND {u} >= 0 AND {u} <= 1 THEN {t} ELSE NULL END"
        )
        ts = (
            f"list_sort(list_concat([0.0, 1.0], list_filter("
            f"list_transform(range(1, len({rxs}) + 1), m -> {tj}), "
            f"x -> x IS NOT NULL)))"
        )
        a = f"({ts})[k]"
        b = f"({ts})[k + 1]"
        mid = f"(({a} + {b}) / 2)"
        mx = f"({p1x} + {mid} * {ex})"
        my = f"({p1y} + {mid} * {ey})"
        rj = ring("j")
        jr2 = f"((j) % len({rxs})) + 1"
        cross = (
            f"CASE WHEN (({rj['q1y']} > {my}) != ({rys}[{jr2}] > {my})) "
            f"THEN CASE WHEN {mx} < {rj['q1x']} + ({my} - {rj['q1y']}) "
            f"* {rj['fx']} / {rj['fy']} THEN 1 ELSE 0 END ELSE 0 END"
        )
        inside = (
            f"(list_sum(list_transform(range(1, len({rxs}) + 1), j -> {cross})) "
            f"% 2) = 1"
        )
        rb = ring("g")
        jb2 = f"((g) % len({rxs})) + 1"
        onb_j = (
            f"CASE WHEN ({rb['fx']}) * ({my} - {rb['q1y']}) "
            f"- ({rb['fy']}) * ({mx} - {rb['q1x']}) = 0 "
            f"AND {mx} >= least({rb['q1x']}, {rxs}[{jb2}]) "
            f"AND {mx} <= greatest({rb['q1x']}, {rxs}[{jb2}]) "
            f"AND {my} >= least({rb['q1y']}, {rys}[{jb2}]) "
            f"AND {my} <= greatest({rb['q1y']}, {rys}[{jb2}]) "
            f"THEN 1 ELSE 0 END"
        )
        onb = (
            f"coalesce(list_max(list_transform(range(1, len({rxs}) + 1), "
            f"g -> {onb_j})), 0) = 1"
        )
        weight = (
            f"(CASE WHEN ({onb}) THEN 0.5 "
            f"WHEN ({inside}) THEN 1.0 ELSE 0.0 END)"
        )
        xa = f"({p1x} + {a} * {ex})"
        ya = f"({p1y} + {a} * {ey})"
        xb = f"({p1x} + {b} * {ex})"
        yb = f"({p1y} + {b} * {ey})"
        term = (
            f"CASE WHEN {b} > {a} "
            f"THEN {weight} * ({xa} * {yb} - {ya} * {xb}) ELSE 0.0 END"
        )
        edge_sum = (
            f"coalesce(list_sum(list_transform(range(1, len({ts})), "
            f"k -> {term})), 0.0)"
        )
        return (
            f"coalesce(list_sum(list_transform(range(1, len({pxs}) + 1), i -> "
            f"{edge_sum})), 0.0)"
        )

    total = f"({one_side(axs, ays, bxs, bys)} + {one_side(bxs, bys, axs, ays)})"
    return (
        f"(CASE WHEN {axs} IS NULL OR {ays} IS NULL OR {bxs} IS NULL "
        f"OR {bys} IS NULL OR len({axs}) < 3 OR len({bxs}) < 3 THEN 0.0 "
        f"ELSE 0.5 * {total} END)"
    )


def _pt_seg(
    px: Column, py: Column, x1: Column, y1: Column, x2: Column, y2: Column
) -> tuple[Column, Column]:
    """THE point-to-segment kernel (clamped parameter t, distance d) —
    the single arithmetic definition every distance / linear-referencing
    measure composes, Column form.  The degenerate-edge division sits
    behind a lazily-evaluated CASE."""
    dx, dy = x2 - x1, y2 - y1
    l2 = dx * dx + dy * dy
    t_raw = F.when(l2 > 0, ((px - x1) * dx + (py - y1) * dy) / l2).otherwise(
        F.lit(0.0)
    )
    t = F.least(F.greatest(t_raw, F.lit(0.0)), F.lit(1.0))
    cx = x1 + t * dx
    cy = y1 + t * dy
    d = F.sqrt((px - cx) * (px - cx) + (py - cy) * (py - cy))
    return t, d


def _pt_seg_sql(
    px: str, py: str, x1: str, y1: str, x2: str, y2: str
) -> tuple[str, str]:
    """SQL-fragment form of :func:`_pt_seg` — identical formula text, so
    cross-engine bit-identity is structural, not by-convention."""
    dx, dy = f"({x2} - {x1})", f"({y2} - {y1})"
    l2 = f"({dx} * {dx} + {dy} * {dy})"
    t = (
        f"least(greatest(CASE WHEN {l2} > 0 THEN "
        f"((({px}) - {x1}) * {dx} + (({py}) - {y1}) * {dy}) / {l2} "
        f"ELSE 0.0 END, 0.0), 1.0)"
    )
    cx = f"({x1} + {t} * {dx})"
    cy = f"({y1} + {t} * {dy})"
    d = (
        f"sqrt((({px}) - {cx}) * (({px}) - {cx}) "
        f"+ (({py}) - {cy}) * (({py}) - {cy}))"
    )
    return t, d


def point_ring_distance(
    px: Column, py: Column, ring_xs: Column, ring_ys: Column
) -> Column:
    """Euclidean distance from a point to a ring's BOUNDARY (min over edges
    of the point-to-segment distance) — the planar half of PostGIS
    ``ST_Distance(point, polygon)``; compose with the even-odd containment
    test for the full contract (0 inside).  One ``F.aggregate`` fold over
    the edge index — codegen expression, no UDF.  The degenerate-edge
    division sits behind a lazily-evaluated CASE (never zero there).
    Null-propagates on null arrays; a single-vertex ring degenerates to
    point-to-vertex distance."""
    n = F.size(ring_xs)

    def edge_dist(i: Column) -> Column:
        j = F.pmod(i, n) + 1
        return _pt_seg(
            px,
            py,
            F.element_at(ring_xs, i),
            F.element_at(ring_ys, i),
            F.element_at(ring_xs, j),
            F.element_at(ring_ys, j),
        )[1]

    d = F.aggregate(
        F.sequence(F.lit(1), n),
        F.lit(float("inf")),
        lambda acc, i: F.least(acc, edge_dist(i)),
    )
    return F.when(n >= 1, d).otherwise(
        F.when(ring_xs.isNotNull() & ring_ys.isNotNull(), F.lit(float("inf")))
    )


def point_ring_distance_sql(px: str, py: str, xs: str, ys: str) -> str:
    """DuckDB twin of :func:`point_ring_distance` — identical per-edge
    arithmetic order, so each edge distance is bit-identical; min is
    order-independent exactly (list_min vs the Spark least-fold)."""
    j = f"(i % len({xs})) + 1"
    _, d = _pt_seg_sql(
        px, py, f"{xs}[i]", f"{ys}[i]", f"{xs}[{j}]", f"{ys}[{j}]"
    )
    return (
        f"(CASE WHEN {xs} IS NULL OR {ys} IS NULL THEN NULL ELSE "
        f"coalesce(list_min(list_transform(range(1, len({xs}) + 1), i -> {d})), "
        f"'infinity'::DOUBLE) END)"
    )


def point_chain_distance(
    px: Column, py: Column, xs: Column, ys: Column
) -> Column:
    """Euclidean distance from a point to an OPEN polyline (min over
    consecutive-vertex edges of the point-to-segment distance — no wrap
    edge; PostGIS ``ST_Distance(point, line)``).  Same shared
    :func:`_pt_seg` kernel and fold shape as :func:`point_ring_distance`.
    A single-vertex chain degenerates to point-to-vertex distance; null
    arrays null-propagate."""
    n = F.size(xs)

    def edge_dist(i: Column) -> Column:
        return _pt_seg(
            px,
            py,
            F.element_at(xs, i),
            F.element_at(ys, i),
            F.element_at(xs, i + 1),
            F.element_at(ys, i + 1),
        )[1]

    d = F.aggregate(
        F.sequence(F.lit(1), n - 1),
        F.lit(float("inf")),
        lambda acc, i: F.least(acc, edge_dist(i)),
    )
    vx = px - F.element_at(xs, F.lit(1))
    vy = py - F.element_at(ys, F.lit(1))
    # least() skips nulls, so a null point would leak the fold's inf seed —
    # null-propagate explicitly (matching the SQL twin's CASE guard)
    return F.when(
        px.isNotNull() & py.isNotNull(),
        F.when(n >= 2, d).otherwise(F.when(n == 1, F.sqrt(vx * vx + vy * vy))),
    )


def point_chain_distance_sql(px: str, py: str, xs: str, ys: str) -> str:
    """DuckDB twin of :func:`point_chain_distance` — identical per-edge
    arithmetic (shared :func:`_pt_seg_sql`), order-independent min."""
    _, d = _pt_seg_sql(
        px, py, f"{xs}[i]", f"{ys}[i]", f"{xs}[i + 1]", f"{ys}[i + 1]"
    )
    vx = f"(({px}) - {xs}[1])"
    vy = f"(({py}) - {ys}[1])"
    return (
        f"(CASE WHEN {xs} IS NULL OR {ys} IS NULL OR ({px}) IS NULL "
        f"OR ({py}) IS NULL THEN NULL "
        f"WHEN len({xs}) >= 2 THEN "
        f"list_min(list_transform(range(1, len({xs})), i -> {d})) "
        f"WHEN len({xs}) = 1 THEN sqrt({vx} * {vx} + {vy} * {vy}) END)"
    )


def ring_centroid(ring_xs: Column, ring_ys: Column) -> tuple[Column, Column]:
    """Exact area-weighted polygon centroid (PostGIS ``ST_Centroid`` for a
    single-ring polygon): Cx = Σ(xᵢ+xⱼ)(xᵢyⱼ−xⱼyᵢ) / 6A_signed, same for
    Cy — two ``F.aggregate`` folds sharing the signed-area fold.  Rings
    with zero signed area (degenerate/collinear) and sub-3-vertex inputs
    fall back to the vertex mean; null arrays null-propagate."""
    n = F.size(ring_xs)

    def w(i: Column) -> Column:
        j = F.pmod(i, n) + 1
        return (
            F.element_at(ring_xs, i) * F.element_at(ring_ys, j)
            - F.element_at(ring_xs, j) * F.element_at(ring_ys, i)
        )

    def fold(term) -> Column:
        return F.aggregate(
            F.sequence(F.lit(1), n), F.lit(0.0), lambda acc, i: acc + term(i)
        )

    a2 = fold(w)  # twice the signed area

    def cx_term(i: Column) -> Column:
        j = F.pmod(i, n) + 1
        return (F.element_at(ring_xs, i) + F.element_at(ring_xs, j)) * w(i)

    def cy_term(i: Column) -> Column:
        j = F.pmod(i, n) + 1
        return (F.element_at(ring_ys, i) + F.element_at(ring_ys, j)) * w(i)

    def mean(arr: Column) -> Column:
        return (
            F.aggregate(
                F.sequence(F.lit(1), n),
                F.lit(0.0),
                lambda acc, i: acc + F.element_at(arr, i),
            )
            / n.cast("double")
        )

    def guarded(shoelace: Column, arr: Column) -> Column:
        return F.when((n >= 3) & (a2 != 0.0), shoelace).otherwise(
            F.when(n >= 1, mean(arr))
        )

    cx = guarded(fold(cx_term) / (F.lit(3.0) * a2), ring_xs)
    cy = guarded(fold(cy_term) / (F.lit(3.0) * a2), ring_ys)
    return cx, cy


def ring_centroid_sql(xs: str, ys: str) -> tuple[str, str]:
    """DuckDB twin of :func:`ring_centroid` — identical arithmetic order
    (left-to-right float64 sums both engines).  Returns (cx_sql, cy_sql)."""
    nn = f"len({xs})"
    j = f"(i % {nn}) + 1"
    w = f"({xs}[i] * {ys}[{j}] - {xs}[{j}] * {ys}[i])"
    a2 = f"list_sum(list_transform(range(1, {nn} + 1), i -> {w}))"

    def out(arr: str) -> str:
        term = f"({arr}[i] + {arr}[{j}]) * {w}"
        shoe = (
            f"(list_sum(list_transform(range(1, {nn} + 1), i -> {term})) "
            f"/ (3.0 * ({a2})))"
        )
        mean = f"(list_sum({arr}) / CAST({nn} AS DOUBLE))"
        return (
            f"(CASE WHEN {xs} IS NULL OR {ys} IS NULL THEN NULL "
            f"WHEN {nn} >= 3 AND ({a2}) != 0.0 THEN {shoe} "
            f"WHEN {nn} >= 1 THEN {mean} END)"
        )

    return out(xs), out(ys)


def line_interpolate_point(
    xs: Column, ys: Column, frac: float
) -> tuple[Column, Column]:
    """PostGIS ``ST_LineInterpolatePoint``: the point at fraction ``frac``
    (0..1) of the total length along an OPEN polyline — pure higher-order
    expressions (no UDF):

    1. per-prefix cumulative edge lengths (transform-of-aggregate, O(n²)
       adds per row — vertex counts here are tile-scale small, and every
       add is codegen),
    2. the owning segment = the FIRST index whose cumulative length
       reaches ``frac·total`` (filter + array_min — cums are
       nondecreasing),
    3. linear interpolation within that segment (zero-length edges
       guarded).

    Degenerate inputs: a single vertex returns itself; empty arrays return
    null; null arrays null-propagate."""
    n = F.size(xs)

    def elen(i: Column) -> Column:
        dx = F.element_at(xs, i + 1) - F.element_at(xs, i)
        dy = F.element_at(ys, i + 1) - F.element_at(ys, i)
        return F.sqrt(dx * dx + dy * dy)

    cums = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.aggregate(
            F.sequence(F.lit(1), i), F.lit(0.0), lambda acc, k: acc + elen(k)
        ),
    )
    target = F.lit(float(frac)) * F.element_at(cums, -1)
    idx = F.coalesce(
        F.array_min(
            F.filter(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.element_at(cums, i) >= target,
            )
        ),
        n - 1,
    )
    prev = F.when(idx == 1, F.lit(0.0)).otherwise(F.element_at(cums, idx - 1))
    e = elen(idx)
    segt = F.when(e > 0, (target - prev) / e).otherwise(F.lit(0.0))
    segt = F.least(F.greatest(segt, F.lit(0.0)), F.lit(1.0))

    def interp(arr: Column) -> Column:
        a = F.element_at(arr, idx)
        return a + segt * (F.element_at(arr, idx + 1) - a)

    def guarded(val: Column, arr: Column) -> Column:
        return F.when(n >= 2, val).otherwise(
            F.when(n == 1, F.element_at(arr, F.lit(1)))
        )

    return guarded(interp(xs), xs), guarded(interp(ys), ys)


def line_interpolate_point_sql(xs: str, ys: str, frac: float) -> tuple[str, str]:
    """DuckDB twin of :func:`line_interpolate_point` — identical arithmetic
    and the same first-reaching-segment rule (list_min over a filtered
    index list; cums are nondecreasing).  Returns (px_sql, py_sql)."""
    nn = f"len({xs})"
    dx = f"({xs}[k + 1] - {xs}[k])"
    dy = f"({ys}[k + 1] - {ys}[k])"
    ek = f"sqrt({dx} * {dx} + {dy} * {dy})"
    cums = (
        f"list_transform(range(1, {nn}), i -> "
        f"list_sum(list_transform(range(1, i + 1), k -> {ek})))"
    )
    target = f"({frac!r} * ({cums})[{nn} - 1])"
    idx = (
        f"coalesce(list_min(list_filter(range(1, {nn}), i -> "
        f"({cums})[i] >= {target})), {nn} - 1)"
    )
    prev = f"(CASE WHEN ({idx}) = 1 THEN 0.0 ELSE ({cums})[({idx}) - 1] END)"
    # the owning-edge length, with the lambda index replaced by idx
    exi, eyi = f"{xs}[({idx})]", f"{ys}[({idx})]"
    exj, eyj = f"{xs}[({idx}) + 1]", f"{ys}[({idx}) + 1]"
    ei = (
        f"sqrt(({exj} - {exi}) * ({exj} - {exi}) "
        f"+ ({eyj} - {eyi}) * ({eyj} - {eyi}))"
    )
    segt = (
        f"least(greatest(CASE WHEN ({ei}) > 0 THEN (({target}) - {prev}) / ({ei}) "
        f"ELSE 0.0 END, 0.0), 1.0)"
    )

    def out(arr: str) -> str:
        a = f"{arr}[({idx})]"
        b = f"{arr}[({idx}) + 1]"
        val = f"({a} + {segt} * ({b} - {a}))"
        return (
            f"(CASE WHEN {xs} IS NULL OR {ys} IS NULL THEN NULL "
            f"WHEN {nn} >= 2 THEN {val} "
            f"WHEN {nn} = 1 THEN {arr}[1] END)"
        )

    return out(xs), out(ys)


def line_substring(
    xs: Column, ys: Column, f1: float, f2: float
) -> tuple[Column, Column]:
    """PostGIS ``ST_LineSubstring``: the sub-polyline between fractions
    ``f1`` and ``f2`` (0 <= f1 <= f2 <= 1) of the total length — pure
    higher-order expressions (no UDF), the natural completion of the
    linear-referencing family (:func:`line_interpolate_point` /
    :func:`line_locate_point`; reference parity target: the PostGIS
    function templates call, tilekiln executes via definition.py's
    arbitrary-SQL contract).

    Construction: the two cut points come from
    :func:`line_interpolate_point` at f1/f2 (same cums machinery, bit-
    identical across engines); interior vertices are the original vertices
    whose cumulative length lies STRICTLY between the two targets (strict,
    so a cut landing exactly on a vertex never duplicates it).  Returns
    (sub_xs, sub_ys) arrays.

    Degenerate inputs: a single vertex returns a 1-element array of
    itself; null arrays null-propagate.  ``f1 == f2`` returns the 2-element
    degenerate [p, p] (deterministic; PostGIS returns POINT there).

    Plan-size note (accepted): the O(n²) cums machinery appears ~3x in the
    expression tree (here + inside each interpolate endpoint) and the SQL
    twin inlines it per reference — vertex counts on these paths are
    tile-scale small, and sharing it would need a CTE-shaped twin."""
    if not (0.0 <= f1 <= f2 <= 1.0):
        raise ValueError("line_substring requires 0 <= f1 <= f2 <= 1")
    n = F.size(xs)

    def elen(i: Column) -> Column:
        dx = F.element_at(xs, i + 1) - F.element_at(xs, i)
        dy = F.element_at(ys, i + 1) - F.element_at(ys, i)
        return F.sqrt(dx * dx + dy * dy)

    cums = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.aggregate(
            F.sequence(F.lit(1), i), F.lit(0.0), lambda acc, k: acc + elen(k)
        ),
    )
    total = F.element_at(cums, -1)
    t1 = F.lit(float(f1)) * total
    t2 = F.lit(float(f2)) * total
    p1x, p1y = line_interpolate_point(xs, ys, f1)
    p2x, p2y = line_interpolate_point(xs, ys, f2)
    interior = F.filter(
        F.sequence(F.lit(1), n - 1),
        lambda i: (F.element_at(cums, i) > t1) & (F.element_at(cums, i) < t2),
    )

    def sub(arr: Column, p1: Column, p2: Column) -> Column:
        mids = F.transform(interior, lambda i: F.element_at(arr, i + 1))
        val = F.concat(F.array(p1), mids, F.array(p2))
        return F.when(n >= 2, val).otherwise(
            F.when(n == 1, F.array(F.element_at(arr, F.lit(1))))
        )

    return sub(xs, p1x, p2x), sub(ys, p1y, p2y)


def line_substring_sql(xs: str, ys: str, f1: float, f2: float) -> tuple[str, str]:
    """DuckDB twin of :func:`line_substring` — identical arithmetic: the
    same cums expression, the same strict-interior filter, cut points from
    :func:`line_interpolate_point_sql`.  Returns (sub_xs_sql, sub_ys_sql)."""
    nn = f"len({xs})"
    dx = f"({xs}[k + 1] - {xs}[k])"
    dy = f"({ys}[k + 1] - {ys}[k])"
    ek = f"sqrt({dx} * {dx} + {dy} * {dy})"
    cums = (
        f"list_transform(range(1, {nn}), i -> "
        f"list_sum(list_transform(range(1, i + 1), k -> {ek})))"
    )
    total = f"({cums})[{nn} - 1]"
    t1 = f"({f1!r} * {total})"
    t2 = f"({f2!r} * {total})"
    p1x, p1y = line_interpolate_point_sql(xs, ys, f1)
    p2x, p2y = line_interpolate_point_sql(xs, ys, f2)
    interior = (
        f"list_filter(range(1, {nn}), i -> "
        f"({cums})[i] > {t1} AND ({cums})[i] < {t2})"
    )

    def sub(arr: str, p1: str, p2: str) -> str:
        mids = f"list_transform({interior}, i -> {arr}[i + 1])"
        val = f"list_concat(list_concat([{p1}], {mids}), [{p2}])"
        return (
            f"(CASE WHEN {xs} IS NULL OR {ys} IS NULL THEN NULL "
            f"WHEN {nn} >= 2 THEN {val} "
            f"WHEN {nn} = 1 THEN [{arr}[1]] END)"
        )

    return sub(xs, p1x, p2x), sub(ys, p1y, p2y)


def ring_ring_distance(
    axs: Column, ays: Column, bxs: Column, bys: Column
) -> Column:
    """Boundary-to-boundary Euclidean distance between two rings — the
    planar ``ST_Distance(polygon, polygon)`` for DISJOINT polygons (the
    minimum over non-crossing boundaries is always attained at a vertex of
    one against a segment of the other, so min over both vertex→ring
    directions is exact).  Crossing/contained rings need the intersects /
    containment predicates composed in front (same contract note as
    :func:`point_ring_distance`).  Nested ``F.aggregate`` folds: O(n·m)
    adds per pair, all codegen, no UDF."""
    def side(pxs: Column, pys: Column, rxs: Column, rys: Column) -> Column:
        n = F.size(pxs)
        return F.aggregate(
            F.sequence(F.lit(1), n),
            F.lit(float("inf")),
            lambda acc, i: F.least(
                acc,
                point_ring_distance(
                    F.element_at(pxs, i), F.element_at(pys, i), rxs, rys
                ),
            ),
        )

    d = F.least(side(axs, ays, bxs, bys), side(bxs, bys, axs, ays))
    ok = axs.isNotNull() & ays.isNotNull() & bxs.isNotNull() & bys.isNotNull()
    return F.when(
        ok & (F.size(axs) >= 1) & (F.size(bxs) >= 1), d
    ).otherwise(F.when(ok, F.lit(float("inf"))))


def ring_ring_distance_sql(axs: str, ays: str, bxs: str, bys: str) -> str:
    """DuckDB twin of :func:`ring_ring_distance`.  The OUTER lambda
    variable is ``a`` so it cannot shadow the ``i``/``k`` used inside the
    generated point-segment expression."""
    def side(pxs: str, pys: str, rxs: str, rys: str) -> str:
        inner = point_ring_distance_sql(f"{pxs}[a]", f"{pys}[a]", rxs, rys)
        return (
            f"list_min(list_transform(range(1, len({pxs}) + 1), a -> {inner}))"
        )

    d = f"least({side(axs, ays, bxs, bys)}, {side(bxs, bys, axs, ays)})"
    return (
        f"(CASE WHEN {axs} IS NULL OR {ays} IS NULL OR {bxs} IS NULL "
        f"OR {bys} IS NULL THEN NULL "
        f"WHEN len({axs}) >= 1 AND len({bxs}) >= 1 THEN {d} "
        f"ELSE 'infinity'::DOUBLE END)"
    )


def segmentize(
    xs: Column, ys: Column, max_len: float
) -> tuple[Column, Column]:
    """PostGIS ``ST_Segmentize`` over an OPEN vertex chain: every edge
    longer than ``max_len`` splits into ceil(len/max_len) equal sub-edges
    (rings: close before calling).  Nested transform + flatten — pure
    higher-order expressions, no UDF; vertex counts are per-feature small
    so the O(output) expression work rides the scan.  Zero-length edges
    emit their start vertex once; single-vertex/empty inputs pass through;
    null arrays null-propagate."""
    if not float(max_len) > 0:
        raise ValueError("segmentize: max_len must be > 0")
    n = F.size(xs)
    m = F.lit(float(max_len))

    def elen(i: Column) -> Column:
        dx = F.element_at(xs, i + 1) - F.element_at(xs, i)
        dy = F.element_at(ys, i + 1) - F.element_at(ys, i)
        return F.sqrt(dx * dx + dy * dy)

    def k(i: Column) -> Column:
        return F.greatest(F.ceil(elen(i) / m), F.lit(1).cast("long"))

    def seg(arr: Column) -> Column:
        head = F.flatten(
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.transform(
                    F.sequence(F.lit(0).cast("long"), k(i) - 1),
                    lambda j: F.element_at(arr, i.cast("int"))
                    + (j.cast("double") / k(i).cast("double"))
                    * (
                        F.element_at(arr, i.cast("int") + 1)
                        - F.element_at(arr, i.cast("int"))
                    ),
                ),
            )
        )
        out = F.concat(head, F.slice(arr, -1, 1))
        return F.when(n >= 2, out).otherwise(
            F.when(xs.isNotNull() & ys.isNotNull(), arr)
        )

    return seg(xs), seg(ys)


def segmentize_sql(xs: str, ys: str, max_len: float) -> tuple[str, str]:
    """DuckDB twin of :func:`segmentize` — identical edge-length, ceil and
    interpolation arithmetic.  Returns (xs_sql, ys_sql)."""
    if not float(max_len) > 0:
        raise ValueError("segmentize_sql: max_len must be > 0")
    m = repr(float(max_len))
    dx = f"({xs}[i + 1] - {xs}[i])"
    dy = f"({ys}[i + 1] - {ys}[i])"
    elen = f"sqrt({dx} * {dx} + {dy} * {dy})"
    k = f"greatest(CAST(ceil({elen} / {m}) AS BIGINT), 1)"

    def seg(arr: str) -> str:
        step = (
            f"{arr}[i] + (CAST(j AS DOUBLE) / CAST({k} AS DOUBLE)) "
            f"* ({arr}[i + 1] - {arr}[i])"
        )
        head = (
            f"flatten(list_transform(range(1, len({xs})), i -> "
            f"list_transform(range(0, {k}), j -> {step})))"
        )
        return (
            f"(CASE WHEN {xs} IS NULL OR {ys} IS NULL THEN NULL "
            f"WHEN len({xs}) >= 2 THEN {head} || [{arr}[len({arr})]] "
            f"ELSE {arr} END)"
        )

    return seg(xs), seg(ys)


def line_locate_point(
    xs: Column, ys: Column, px: Column, py: Column
) -> Column:
    """PostGIS ``ST_LineLocatePoint``: the fraction (0..1) of the total
    chain length at the point on the line closest to (px, py) — the
    inverse of :func:`line_interpolate_point`.  Same machinery: per-edge
    point-to-segment distances, the owning edge = FIRST edge attaining the
    minimum distance (ties broken identically in the twin because the
    per-edge arithmetic is bit-identical), prefix length + in-edge
    parameter over the total.  Pure HOF expressions; degenerate chains
    (total length 0 / single vertex) return 0; null inputs null-propagate."""
    n = F.size(xs)

    def elen(i: Column) -> Column:
        dx = F.element_at(xs, i + 1) - F.element_at(xs, i)
        dy = F.element_at(ys, i + 1) - F.element_at(ys, i)
        return F.sqrt(dx * dx + dy * dy)

    def edge_seg(i: Column) -> tuple[Column, Column]:
        return _pt_seg(
            px,
            py,
            F.element_at(xs, i),
            F.element_at(ys, i),
            F.element_at(xs, i + 1),
            F.element_at(ys, i + 1),
        )

    def edge_t(i: Column) -> Column:
        return edge_seg(i)[0]

    def edge_d(i: Column) -> Column:
        return edge_seg(i)[1]

    dmin = F.aggregate(
        F.sequence(F.lit(1), n - 1),
        F.lit(float("inf")),
        lambda acc, i: F.least(acc, edge_d(i)),
    )
    idx = F.coalesce(
        F.array_min(
            F.filter(F.sequence(F.lit(1), n - 1), lambda i: edge_d(i) == dmin)
        ),
        F.lit(1),
    )
    prefix = F.aggregate(
        F.sequence(F.lit(1), n - 1),
        F.lit(0.0),
        lambda acc, i: acc + F.when(i < idx, elen(i)).otherwise(F.lit(0.0)),
    )
    total = F.aggregate(
        F.sequence(F.lit(1), n - 1), F.lit(0.0), lambda acc, i: acc + elen(i)
    )
    frac = (prefix + edge_t(idx) * elen(idx)) / total
    return F.when((n >= 2) & (total > 0), frac).otherwise(
        F.when(
            xs.isNotNull() & ys.isNotNull() & px.isNotNull() & py.isNotNull()
            & (n >= 1),
            F.lit(0.0),
        )
    )


def line_locate_point_sql(xs: str, ys: str, px: str, py: str) -> str:
    """DuckDB twin of :func:`line_locate_point` — identical arithmetic, the
    same first-minimum owning-edge rule.  Per-edge formulas are generated
    as FUNCTIONS of the index expression (never textual replacement, which
    would also rewrite the lambda indices inside a spliced sub-expression)."""

    def parts(i: str) -> dict:
        x1, y1 = f"{xs}[{i}]", f"{ys}[{i}]"
        x2, y2 = f"{xs}[({i}) + 1]", f"{ys}[({i}) + 1]"
        dx, dy = f"({x2} - {x1})", f"({y2} - {y1})"
        t, d = _pt_seg_sql(px, py, x1, y1, x2, y2)
        elen = f"sqrt({dx} * {dx} + {dy} * {dy})"
        return {"t": t, "d": d, "e": elen}

    at_i = parts("i")
    dmin = f"list_min(list_transform(range(1, len({xs})), i -> {at_i['d']}))"
    idx = (
        f"coalesce(list_min(list_filter(range(1, len({xs})), "
        f"i -> {at_i['d']} = ({dmin}))), 1)"
    )
    prefix = (
        f"coalesce(list_sum(list_transform(range(1, len({xs})), i -> "
        f"CASE WHEN i < ({idx}) THEN {at_i['e']} ELSE 0.0 END)), 0.0)"
    )
    total = (
        f"coalesce(list_sum(list_transform(range(1, len({xs})), "
        f"i -> {at_i['e']})), 0.0)"
    )
    at_idx = parts(f"({idx})")
    frac = f"((({prefix}) + ({at_idx['t']}) * ({at_idx['e']})) / ({total}))"
    return (
        f"(CASE WHEN {xs} IS NULL OR {ys} IS NULL OR ({px}) IS NULL "
        f"OR ({py}) IS NULL THEN NULL "
        f"WHEN len({xs}) >= 2 AND ({total}) > 0 THEN {frac} "
        f"WHEN len({xs}) >= 1 THEN 0.0 END)"
    )


def point_buffer(
    x: Column, y: Column, radius: float, segments: int = 8
) -> tuple[Column, Column]:
    """PostGIS ``ST_Buffer(point, r)``: the circle approximated by
    ``4·segments`` vertices (PostGIS ``quad_segs`` convention), CCW from
    due east — pure transform expressions over a literal angle sequence
    (the angles are Python-hoisted constants, so both engines take cos/sin
    of IDENTICAL doubles).  Returns (ring_xs, ring_ys) unclosed arrays in
    the engine's ring layout (composes with every ring operator here)."""
    import math

    if not float(radius) > 0:
        raise ValueError("point_buffer: radius must be > 0")
    if int(segments) < 1:
        raise ValueError("point_buffer: segments must be >= 1")
    n = 4 * int(segments)
    angles = [2.0 * math.pi * j / n for j in range(n)]
    xs = F.array(*[x + F.lit(float(radius)) * F.lit(math.cos(a)) for a in angles])
    ys = F.array(*[y + F.lit(float(radius)) * F.lit(math.sin(a)) for a in angles])
    return xs, ys


def point_buffer_sql(
    x: str, y: str, radius: float, segments: int = 8
) -> tuple[str, str]:
    """DuckDB twin of :func:`point_buffer` — the SAME Python-hoisted
    cos/sin constants are emitted as literals, so vertices are
    bit-identical (no engine trig in the ring at all)."""
    import math

    if not float(radius) > 0:
        raise ValueError("point_buffer_sql: radius must be > 0")
    if int(segments) < 1:
        raise ValueError("point_buffer_sql: segments must be >= 1")
    n = 4 * int(segments)
    angles = [2.0 * math.pi * j / n for j in range(n)]
    r = float(radius)
    # explicit DOUBLE casts: DuckDB parses bare decimal literals as DECIMAL
    # and overflows decimal multiplication at these magnitudes
    xs = "[" + ", ".join(
        f"({x}) + CAST({r!r} AS DOUBLE) * CAST({math.cos(a)!r} AS DOUBLE)"
        for a in angles
    ) + "]"
    ys = "[" + ", ".join(
        f"({y}) + CAST({r!r} AS DOUBLE) * CAST({math.sin(a)!r} AS DOUBLE)"
        for a in angles
    ) + "]"
    return xs, ys


def azimuth(x1: Column, y1: Column, x2: Column, y2: Column) -> Column:
    """PostGIS ``ST_Azimuth`` in a projected CRS: north-based clockwise
    angle in radians, [0, 2π).  Coincident points return 0 (PostGIS raises;
    a null-safe 0 composes better in joins — documented deviation)."""
    a = F.atan2(x2 - x1, y2 - y1)
    return F.when(a < 0, a + F.lit(2.0) * F.lit(3.141592653589793)).otherwise(a)


def azimuth_sql(x1: str, y1: str, x2: str, y2: str) -> str:
    """DuckDB twin of :func:`azimuth` (same atan2 argument order; libm
    atan2 may differ in the last ulp — round displayed angles)."""
    a = f"atan2(({x2}) - ({x1}), ({y2}) - ({y1}))"
    return f"(CASE WHEN {a} < 0 THEN {a} + 2.0 * pi() ELSE {a} END)"


def hexbin_qr(x: Column, y: Column, size: float) -> tuple[Column, Column]:
    """Pointy-top hexagonal binning: planar (x, y) -> axial hex cell
    (q, r) for circumradius ``size`` — the hex-density aggregation tile
    dashboards build over point themes (PostGIS ``ST_HexagonGrid``
    parity in spirit; the reference runs arbitrary template SQL over such
    grids, reference tilekiln/definition.py:42-77).

    Fractional axial coords then exact cube rounding (round each of
    x/y/z, re-derive the component with the largest rounding error so
    x+y+z == 0 holds).  Rounding is ``floor(v + 0.5)`` in BOTH engines —
    no dependence on round-half conventions.  Pure codegen expressions;
    the groupBy over (q, r) is the only shuffle and partial-aggregates
    map-side."""
    s = F.lit(float(size))
    qf = (F.sqrt(F.lit(3.0)) / F.lit(3.0) * x - y / F.lit(3.0)) / s
    rf = (F.lit(2.0) / F.lit(3.0) * y) / s
    yf = -qf - rf
    rx = F.floor(qf + F.lit(0.5)).cast("double")
    ry = F.floor(yf + F.lit(0.5)).cast("double")
    rz = F.floor(rf + F.lit(0.5)).cast("double")
    dx = F.abs(rx - qf)
    dy = F.abs(ry - yf)
    dz = F.abs(rz - rf)
    q = F.when((dx > dy) & (dx > dz), -ry - rz).otherwise(rx)
    r = F.when(~((dx > dy) & (dx > dz)) & ~(dy > dz), -rx - ry).otherwise(rz)
    return q.cast("long"), r.cast("long")


def hexbin_qr_sql(x: str, y: str, size: float) -> str:
    """DuckDB twin of :func:`hexbin_qr` — identical arithmetic order.
    Returns the (q_sql, r_sql) expression strings to splice into a
    SELECT."""
    s = repr(float(size))
    qf = f"((sqrt(3.0) / 3.0 * ({x}) - ({y}) / 3.0) / {s})"
    rf = f"((2.0 / 3.0 * ({y})) / {s})"
    yf = f"(-{qf} - {rf})"
    rx = f"floor({qf} + 0.5)"
    ry = f"floor({yf} + 0.5)"
    rz = f"floor({rf} + 0.5)"
    dx = f"abs({rx} - {qf})"
    dy = f"abs({ry} - {yf})"
    dz = f"abs({rz} - {rf})"
    big_x = f"({dx} > {dy} AND {dx} > {dz})"
    q = f"CAST(CASE WHEN {big_x} THEN -{ry} - {rz} ELSE {rx} END AS BIGINT)"
    r = (
        f"CAST(CASE WHEN NOT {big_x} AND NOT ({dy} > {dz}) "
        f"THEN -{rx} - {ry} ELSE {rz} END AS BIGINT)"
    )
    return q, r


def hex_center(q: Column, r: Column, size: float) -> tuple[Column, Column]:
    """Planar center of pointy-top axial hex (q, r) at circumradius
    ``size`` (inverse of :func:`hexbin_qr`'s fractional transform)."""
    s = F.lit(float(size))
    cx = s * F.sqrt(F.lit(3.0)) * (q.cast("double") + r.cast("double") / F.lit(2.0))
    cy = s * F.lit(1.5) * r.cast("double")
    return cx, cy


def hex_center_sql(q: str, r: str, size: float) -> tuple[str, str]:
    s = repr(float(size))
    cx = f"({s} * sqrt(3.0) * (CAST({q} AS DOUBLE) + CAST({r} AS DOUBLE) / 2.0))"
    cy = f"({s} * 1.5 * CAST({r} AS DOUBLE))"
    return cx, cy


def ring_is_simple_sql(xs: str, ys: str) -> str:
    """DuckDB twin of the ST_IsSimple kernel
    (operators/spatial_join.py _ring_is_simple_np): no non-adjacent edge
    pair crosses or touches, no adjacent pair doubles back (collinear
    spike); rings under 3 vertices are not simple.  Same arithmetic order
    as the kernel — bit-identical decisions."""
    n = f"len({xs})"
    ib = f"(i % {n}) + 1"
    jb = f"(j % {n}) + 1"
    p1x, p1y = f"{xs}[i]", f"{ys}[i]"
    p2x, p2y = f"{xs}[{ib}]", f"{ys}[{ib}]"
    q1x, q1y = f"{xs}[j]", f"{ys}[j]"
    q2x, q2y = f"{xs}[{jb}]", f"{ys}[{jb}]"

    def orient(ox, oy, dx, dy, px, py) -> str:
        return f"(({dx} - {ox}) * ({py} - {oy}) - ({dy} - {oy}) * ({px} - {ox}))"

    o1 = orient(p1x, p1y, p2x, p2y, q1x, q1y)
    o2 = orient(p1x, p1y, p2x, p2y, q2x, q2y)
    o3 = orient(q1x, q1y, q2x, q2y, p1x, p1y)
    o4 = orient(q1x, q1y, q2x, q2y, p2x, p2y)
    proper = (
        f"((({o1}) > 0 AND ({o2}) < 0) OR (({o1}) < 0 AND ({o2}) > 0)) "
        f"AND ((({o3}) > 0 AND ({o4}) < 0) OR (({o3}) < 0 AND ({o4}) > 0))"
    )

    def onseg(ox, oy, dx, dy, px, py, o) -> str:
        return (
            f"(({o}) = 0 AND {px} >= least({ox}, {dx}) AND {px} <= greatest({ox}, {dx}) "
            f"AND {py} >= least({oy}, {dy}) AND {py} <= greatest({oy}, {dy}))"
        )

    touch = " OR ".join(
        [
            onseg(p1x, p1y, p2x, p2y, q1x, q1y, o1),
            onseg(p1x, p1y, p2x, p2y, q2x, q2y, o2),
            onseg(q1x, q1y, q2x, q2y, p1x, p1y, o3),
            onseg(q1x, q1y, q2x, q2y, p2x, p2y, o4),
        ]
    )
    nonadj = f"(j > i + 1 AND NOT (i = 1 AND j = {n}))"
    bad_pair = (
        f"coalesce(list_max(flatten(list_transform(range(1, {n} + 1), i -> "
        f"list_transform(range(1, {n} + 1), j -> "
        f"CASE WHEN {nonadj} AND (({proper}) OR ({touch})) THEN 1 ELSE 0 END)))), 0) = 1"
    )
    # spike at vertex b = i%n+1: previous vertex a = i, next c = (i+1)%n+1
    cb = f"((i + 1) % {n}) + 1"
    ax_, ay_ = f"{xs}[i]", f"{ys}[i]"
    bx_, by_ = f"{xs}[{ib}]", f"{ys}[{ib}]"
    cx_, cy_ = f"{xs}[{cb}]", f"{ys}[{cb}]"
    turn = f"(({bx_} - {ax_}) * ({cy_} - {ay_}) - ({by_} - {ay_}) * ({cx_} - {ax_}))"
    dot = f"(({ax_} - {bx_}) * ({cx_} - {bx_}) + ({ay_} - {by_}) * ({cy_} - {by_}))"
    spike = (
        f"coalesce(list_max(list_transform(range(1, {n} + 1), i -> "
        f"CASE WHEN ({turn}) = 0 AND ({dot}) > 0 THEN 1 ELSE 0 END)), 0) = 1"
    )
    return f"({n} >= 3 AND NOT ({bad_pair}) AND NOT ({spike}))"


def closest_point_on_chain(
    xs: Column, ys: Column, px: Column, py: Column, closed: bool = False
) -> tuple[Column, Column]:
    """PostGIS ``ST_ClosestPoint(line/ring boundary, point)``: the (qx, qy)
    on the chain's edges nearest to (px, py) — the coordinate half of
    ``ST_ShortestLine`` (whose other endpoint is the query point itself).
    ``closed=True`` treats the arrays as a ring (wrap-around edge).
    Owning edge = FIRST edge attaining the minimum point-to-segment
    distance — the same first-minimum rule as
    :func:`line_locate_point`, realized here as ONE struct-min fold with
    a STRICT-less update (equal distance keeps the earlier edge), so the
    expression tree stays linear in the edge count instead of replicating
    an argmin sub-tree per output coordinate.  Ties land on the same edge
    as the twin because the per-edge arithmetic (:func:`_pt_seg`) is
    bit-identical.  Pure HOF expressions; a single-vertex chain returns
    that vertex; null inputs null-propagate."""
    n = F.size(xs)
    last = n if closed else n - 1

    def jof(i: Column) -> Column:
        return F.pmod(i, n) + 1 if closed else i + 1

    def edge_struct(i: Column) -> Column:
        x1, y1 = F.element_at(xs, i), F.element_at(ys, i)
        x2, y2 = F.element_at(xs, jof(i)), F.element_at(ys, jof(i))
        t, d = _pt_seg(px, py, x1, y1, x2, y2)
        return F.struct(
            d.alias("d"),
            (x1 + t * (x2 - x1)).alias("qx"),
            (y1 + t * (y2 - y1)).alias("qy"),
        )

    best = F.aggregate(
        F.sequence(F.lit(1), last),
        F.struct(
            F.lit(float("inf")).alias("d"),
            F.lit(0.0).alias("qx"),
            F.lit(0.0).alias("qy"),
        ),
        lambda acc, i: F.when(edge_struct(i)["d"] < acc["d"], edge_struct(i))
        .otherwise(acc),
    )

    def guarded(val: Column, vertex: Column) -> Column:
        # n >= 2: real edges; n == 1: the lone vertex; else null-propagate
        return F.when(n >= 2, val).otherwise(
            F.when(
                xs.isNotNull() & ys.isNotNull() & px.isNotNull()
                & py.isNotNull() & (n >= 1),
                vertex,
            )
        )

    return (
        guarded(best["qx"], F.element_at(xs, F.lit(1))),
        guarded(best["qy"], F.element_at(ys, F.lit(1))),
    )


def closest_point_on_chain_sql(
    xs: str, ys: str, px: str, py: str, closed: bool = False
) -> tuple[str, str]:
    """DuckDB twin of :func:`closest_point_on_chain` — per-edge formulas
    generated as FUNCTIONS of the index expression (the
    :func:`line_locate_point_sql` discipline), same first-minimum rule."""
    nlen = f"len({xs})"
    last = f"{nlen} + 1" if closed else nlen

    def jof(i: str) -> str:
        return f"((({i}) % {nlen}) + 1)" if closed else f"(({i}) + 1)"

    def parts(i: str) -> dict:
        x1, y1 = f"{xs}[{i}]", f"{ys}[{i}]"
        x2, y2 = f"{xs}[{jof(i)}]", f"{ys}[{jof(i)}]"
        t, d = _pt_seg_sql(px, py, x1, y1, x2, y2)
        return {"t": t, "d": d, "x1": x1, "y1": y1, "x2": x2, "y2": y2}

    at_i = parts("i")
    dmin = f"list_min(list_transform(range(1, {last}), i -> {at_i['d']}))"
    idx = (
        f"coalesce(list_min(list_filter(range(1, {last}), "
        f"i -> {at_i['d']} = ({dmin}))), 1)"
    )
    at_idx = parts(f"({idx})")
    qx = f"({at_idx['x1']} + ({at_idx['t']}) * ({at_idx['x2']} - {at_idx['x1']}))"
    qy = f"({at_idx['y1']} + ({at_idx['t']}) * ({at_idx['y2']} - {at_idx['y1']}))"

    def guarded(val: str, vertex: str) -> str:
        return (
            f"(CASE WHEN {xs} IS NULL OR {ys} IS NULL OR ({px}) IS NULL "
            f"OR ({py}) IS NULL THEN NULL "
            f"WHEN {nlen} >= 2 THEN {val} "
            f"WHEN {nlen} >= 1 THEN {vertex} END)"
        )

    return guarded(qx, f"{xs}[1]"), guarded(qy, f"{ys}[1]")


def chains_intersect_sql(axs: str, ays: str, bxs: str, bys: str) -> str:
    """DuckDB twin of the OPEN-polyline ST_Intersects kernel
    (operators/spatial_join.py _chains_intersect_np): any edge pair
    (consecutive vertices, no wrap) properly crossing or touching.  Same
    multiply/subtract/compare order as the numpy kernel and the ring twin
    :func:`rings_intersect_sql`, minus its containment half."""
    p1x, p1y = f"{axs}[i]", f"{ays}[i]"
    p2x, p2y = f"{axs}[i + 1]", f"{ays}[i + 1]"
    q1x, q1y = f"{bxs}[j]", f"{bys}[j]"
    q2x, q2y = f"{bxs}[j + 1]", f"{bys}[j + 1]"

    def orient(ox, oy, dx, dy, px, py) -> str:
        return f"(({dx} - {ox}) * ({py} - {oy}) - ({dy} - {oy}) * ({px} - {ox}))"

    o1 = orient(p1x, p1y, p2x, p2y, q1x, q1y)
    o2 = orient(p1x, p1y, p2x, p2y, q2x, q2y)
    o3 = orient(q1x, q1y, q2x, q2y, p1x, p1y)
    o4 = orient(q1x, q1y, q2x, q2y, p2x, p2y)
    proper = (
        f"((({o1}) > 0 AND ({o2}) < 0) OR (({o1}) < 0 AND ({o2}) > 0)) "
        f"AND ((({o3}) > 0 AND ({o4}) < 0) OR (({o3}) < 0 AND ({o4}) > 0))"
    )

    def onseg(ox, oy, dx, dy, px, py, o) -> str:
        return (
            f"(({o}) = 0 AND {px} >= least({ox}, {dx}) AND {px} <= greatest({ox}, {dx}) "
            f"AND {py} >= least({oy}, {dy}) AND {py} <= greatest({oy}, {dy}))"
        )

    touch = " OR ".join(
        [
            onseg(p1x, p1y, p2x, p2y, q1x, q1y, o1),
            onseg(p1x, p1y, p2x, p2y, q2x, q2y, o2),
            onseg(q1x, q1y, q2x, q2y, p1x, p1y, o3),
            onseg(q1x, q1y, q2x, q2y, p2x, p2y, o4),
        ]
    )
    return (
        f"(coalesce(list_max(flatten(list_transform(range(1, len({axs})), i -> "
        f"list_transform(range(1, len({bxs})), j -> "
        f"CASE WHEN ({proper}) OR ({touch}) THEN 1 ELSE 0 END)))), 0) = 1)"
    )


def halfplane_clip_area(
    xs: Column, ys: Column, nx: float, ny: float, c: float
) -> Column:
    """Area of ``ring ∩ {nx·x + ny·y <= c}`` — the kernel under PostGIS
    ``ST_Split(polygon, blade line)`` (each side's area; the other side
    is ``ring_area − this``).  ONE stateless Green's-theorem fold, no
    clipped ring ever materialized: translate coordinates so the blade
    passes through the ORIGIN — then every Sutherland–Hodgman chord
    (exit→entry hop) lies on a line through the origin and its shoelace
    term ``x_a·y_b − y_a·x_b`` is exactly 0, so only the per-edge
    inside/exit/entry cases contribute and the fold needs no pairing
    state.  Orientation-free (|sum|/2).  Blade constants are Python
    floats folded into literals; the twin
    (:func:`halfplane_clip_area_sql`) emits the identical constants via
    exact DOUBLE literals."""
    if nx == 0.0 and ny == 0.0:
        raise ValueError("blade normal must be nonzero")
    px0, py0 = (0.0, c / ny) if ny != 0.0 else (c / nx, 0.0)
    n = F.size(xs)

    def contrib(i: Column) -> Column:
        j = F.pmod(i, n) + 1
        x1 = F.element_at(xs, i) - F.lit(px0)
        y1 = F.element_at(ys, i) - F.lit(py0)
        x2 = F.element_at(xs, j) - F.lit(px0)
        y2 = F.element_at(ys, j) - F.lit(py0)
        s1 = F.lit(nx) * x1 + F.lit(ny) * y1
        s2 = F.lit(nx) * x2 + F.lit(ny) * y2
        t = s1 / (s1 - s2)
        xi = x1 + t * (x2 - x1)
        yi = y1 + t * (y2 - y1)
        return (
            F.when((s1 <= 0) & (s2 <= 0), x1 * y2 - y1 * x2)
            .when((s1 <= 0) & (s2 > 0), x1 * yi - y1 * xi)
            .when((s1 > 0) & (s2 <= 0), xi * y2 - yi * x2)
            .otherwise(F.lit(0.0))
        )

    return F.abs(
        F.aggregate(
            F.sequence(F.lit(1), n), F.lit(0.0), lambda acc, i: acc + contrib(i)
        )
    ) / 2.0


def halfplane_clip_area_sql(
    xs: str, ys: str, nx: float, ny: float, c: float
) -> str:
    """DuckDB twin of :func:`halfplane_clip_area` — identical per-edge
    case arithmetic on identical exact-DOUBLE blade constants."""
    if nx == 0.0 and ny == 0.0:
        raise ValueError("blade normal must be nonzero")
    px0, py0 = (0.0, c / ny) if ny != 0.0 else (c / nx, 0.0)

    def flit(v: float) -> str:
        r = repr(float(v))
        return r if ("e" in r or "E" in r) else r + "e0"

    jj = f"(i % len({xs})) + 1"
    x1, y1 = f"({xs}[i] - {flit(px0)})", f"({ys}[i] - {flit(py0)})"
    x2, y2 = f"({xs}[{jj}] - {flit(px0)})", f"({ys}[{jj}] - {flit(py0)})"
    s1 = f"({flit(nx)} * {x1} + {flit(ny)} * {y1})"
    s2 = f"({flit(nx)} * {x2} + {flit(ny)} * {y2})"
    t = f"({s1} / ({s1} - {s2}))"
    xi = f"({x1} + {t} * ({x2} - {x1}))"
    yi = f"({y1} + {t} * ({y2} - {y1}))"
    case = (
        f"CASE WHEN {s1} <= 0 AND {s2} <= 0 THEN {x1} * {y2} - {y1} * {x2} "
        f"WHEN {s1} <= 0 AND {s2} > 0 THEN {x1} * {yi} - {y1} * {xi} "
        f"WHEN {s1} > 0 AND {s2} <= 0 THEN {xi} * {y2} - {yi} * {x2} "
        f"ELSE 0.0 END"
    )
    return (
        f"(abs(coalesce(list_sum(list_transform(range(1, len({xs}) + 1), "
        f"i -> {case})), 0.0)) / 2.0)"
    )


def min_clearance(xs: Column, ys: Column) -> Column:
    """GEOS/PostGIS ``ST_MinimumClearance`` of a simple (open) ring: the
    smallest distance a single vertex could move to create invalidity —
    min of (a) every distinct vertex-pair distance and (b) every
    vertex-to-NON-INCIDENT-edge distance (shared :func:`_pt_seg`
    kernel).  Two nested transforms + one null-skipping ``array_min``
    per term — pure codegen, no UDF; the twin
    (:func:`min_clearance_sql`) replays the identical kernel text.
    Rings with < 3 vertices return NULL (PostGIS returns infinity on
    degenerate input — surface that at the call site if needed)."""
    n = F.size(xs)
    idx = F.sequence(F.lit(1), n)

    def vdist(u: Column, v: Column) -> Column:
        dx = F.element_at(xs, v) - F.element_at(xs, u)
        dy = F.element_at(ys, v) - F.element_at(ys, u)
        return F.sqrt(dx * dx + dy * dy)

    vv = F.array_min(
        F.flatten(
            F.transform(
                idx,
                lambda u: F.transform(
                    idx, lambda v: F.when(v > u, vdist(u, v))
                ),
            )
        )
    )

    def sdist(v: Column, s: Column) -> Column:
        j = F.pmod(s, n) + 1
        d = _pt_seg(
            F.element_at(xs, v),
            F.element_at(ys, v),
            F.element_at(xs, s),
            F.element_at(ys, s),
            F.element_at(xs, j),
            F.element_at(ys, j),
        )[1]
        return F.when((v != s) & (v != j), d)

    vs = F.array_min(
        F.flatten(
            F.transform(
                idx, lambda v: F.transform(idx, lambda s: sdist(v, s))
            )
        )
    )
    return F.when(n >= 3, F.least(vv, vs))


def min_clearance_sql(xs: str, ys: str) -> str:
    """DuckDB twin of :func:`min_clearance` — identical vertex-pair and
    vertex-segment arithmetic (shared :func:`_pt_seg_sql` kernel text),
    null-skipping list_min, order-independent exactly."""
    rng = f"range(1, len({xs}) + 1)"
    vv_d = (
        f"sqrt(({xs}[v] - {xs}[u]) * ({xs}[v] - {xs}[u])"
        f" + ({ys}[v] - {ys}[u]) * ({ys}[v] - {ys}[u]))"
    )
    j = f"(s % len({xs})) + 1"
    _, seg_d = _pt_seg_sql(
        f"{xs}[v]", f"{ys}[v]", f"{xs}[s]", f"{ys}[s]", f"{xs}[{j}]", f"{ys}[{j}]"
    )
    return (
        f"(CASE WHEN len({xs}) >= 3 THEN least("
        f"list_min(flatten(list_transform({rng}, u -> "
        f"list_transform({rng}, v -> CASE WHEN v > u THEN {vv_d} END)))), "
        f"list_min(flatten(list_transform({rng}, v -> "
        f"list_transform({rng}, s -> "
        f"CASE WHEN s != v AND {j} != v THEN {seg_d} END))))"
        f") END)"
    )


def point_in_ring_sql(px: str, py: str, xs: str, ys: str) -> str:
    """DuckDB twin of operators/spatial_join.py ``pip_raycast`` (even-odd
    ray cast over a simple ring): identical straddle test and crossing
    arithmetic, parity via a crossing count (commutative with the
    expression form's XOR fold — same decisions on the same floats)."""
    j = f"(i % len({xs})) + 1"
    cross = (
        f"CASE WHEN (({ys}[i] > {py}) != ({ys}[{j}] > {py})) THEN "
        f"CASE WHEN {px} < {xs}[i] + ({py} - {ys}[i]) "
        f"* ({xs}[{j}] - {xs}[i]) / ({ys}[{j}] - {ys}[i]) "
        f"THEN 1 ELSE 0 END ELSE 0 END"
    )
    return (
        f"(coalesce(list_sum(list_transform(range(1, len({xs}) + 1), "
        f"i -> {cross})), 0) % 2) = 1"
    )


def frechet_distance(
    axs: Column, ays: Column, bxs: Column, bys: Column
) -> Column:
    """PostGIS/GEOS ``ST_FrechetDistance`` — the DISCRETE Fréchet distance
    between two vertex chains (the dog-walk coupling distance, the
    standard trajectory-similarity measure ST_HausdorffDistance can
    under-report because Hausdorff ignores ordering).

    ONE nested JVM HOF fold, no UDF, and never more than a single DP ROW
    alive: the outer ``aggregate`` walks A's vertices carrying the row
    ``row[j] = dF(A[1..i], B[1..j])``; the inner ``aggregate`` rebuilds
    the row left-to-right with the classic recurrence
    ``new[j] = max(d(i,j), min(row[j], row[j-1], new[j-1]))``.
    All comparisons run on SQUARED distances (max/min commute with the
    monotone sqrt), so the only rounding-sensitive arithmetic is the
    difference-products in d² and the single final sqrt — which is what
    makes the unrolled DuckDB twin (:func:`frechet_recursive_cte_sql`)
    bit-identical by construction.

    At 100 TB: per-row cost O(n·m²) expression steps entirely inside
    whole-stage codegen; the B side is a broadcast fixture dim, so the
    pair join is map-only.  Reference scope: tilekiln executes arbitrary
    PostGIS SQL per layer (tilekiln/definition.py:42-77), and
    ST_FrechetDistance is in that surface."""
    n, m = F.size(axs), F.size(bxs)

    def d2(i: Column, j: Column) -> Column:
        dx = F.element_at(axs, i) - F.element_at(bxs, j)
        dy = F.element_at(ays, i) - F.element_at(bys, j)
        return dx * dx + dy * dy

    empty = F.array().cast("array<double>")
    init = F.aggregate(
        F.sequence(F.lit(1), m),
        empty,
        lambda acc, j: F.concat(
            acc,
            F.array(
                F.when(F.size(acc) == 0, d2(F.lit(1), j)).otherwise(
                    F.greatest(d2(F.lit(1), j), F.element_at(acc, -1))
                )
            ),
        ),
    )

    def step(row: Column, i: Column) -> Column:
        return F.aggregate(
            F.sequence(F.lit(1), m),
            empty,
            lambda acc, j: F.concat(
                acc,
                F.array(
                    F.when(
                        j == 1,
                        F.greatest(F.element_at(row, 1), d2(i, F.lit(1))),
                    ).otherwise(
                        F.greatest(
                            d2(i, j),
                            F.least(
                                F.element_at(row, j),
                                F.element_at(row, j - 1),
                                F.element_at(acc, -1),
                            ),
                        )
                    )
                ),
            ),
        )

    # n == 1 guard keeps the outer sequence ascending (the descending
    # F.sequence(2, 1) footgun); when() branches evaluate lazily
    final = F.when(n == 1, init).otherwise(
        F.aggregate(F.sequence(F.lit(2), n), init, step)
    )
    return F.sqrt(F.element_at(final, m))


def dtw_distance(
    axs: Column, ays: Column, bxs: Column, bys: Column
) -> Column:
    """Dynamic-time-warping distance between two vertex chains — the other
    classic trajectory-similarity measure beside the discrete Fréchet
    distance (same DP shape, ``sum``+``min`` in place of ``max``+``min``):

        D[i][j] = d²(i,j) + min(D[i-1][j], D[i][j-1], D[i-1][j-1])

    with SQUARED Euclidean local cost (exact difference-products — the
    tslearn/fastdtw convention) and ``sqrt(D[n][m])`` returned, so the
    single final sqrt is again the only rounding-sensitive step beyond the
    fixed-order additions.  Same single-live-row execution as
    :func:`frechet_distance`: ONE nested JVM HOF fold, no UDF, O(m) state.
    The DuckDB twin (:func:`dtw_recursive_cte_sql`) unrolls the row into m
    plain columns of a recursive CTE — bit-identical by construction.

    At 100 TB: per-row cost O(n·m) codegen steps; the B side broadcasts, so
    the pair join is map-only — identical scale profile to Fréchet."""
    n, m = F.size(axs), F.size(bxs)

    def d2(i: Column, j: Column) -> Column:
        dx = F.element_at(axs, i) - F.element_at(bxs, j)
        dy = F.element_at(ays, i) - F.element_at(bys, j)
        return dx * dx + dy * dy

    empty = F.array().cast("array<double>")
    # first DP row: only horizontal moves — running prefix sum of d²(1, j)
    init = F.aggregate(
        F.sequence(F.lit(1), m),
        empty,
        lambda acc, j: F.concat(
            acc,
            F.array(
                F.when(F.size(acc) == 0, d2(F.lit(1), j)).otherwise(
                    d2(F.lit(1), j) + F.element_at(acc, -1)
                )
            ),
        ),
    )

    def step(row: Column, i: Column) -> Column:
        return F.aggregate(
            F.sequence(F.lit(1), m),
            empty,
            lambda acc, j: F.concat(
                acc,
                F.array(
                    F.when(
                        j == 1,
                        d2(i, F.lit(1)) + F.element_at(row, 1),
                    ).otherwise(
                        d2(i, j)
                        + F.least(
                            F.element_at(row, j),
                            F.element_at(row, j - 1),
                            F.element_at(acc, -1),
                        )
                    )
                ),
            ),
        )

    # n == 1 guard keeps the outer sequence ascending (the descending
    # F.sequence(2, 1) footgun); when() branches evaluate lazily
    final = F.when(n == 1, init).otherwise(
        F.aggregate(F.sequence(F.lit(2), n), init, step)
    )
    return F.sqrt(F.element_at(final, m))


def dtw_recursive_cte_sql(
    name: str,
    src: str,
    key: str,
    bpts: list,
    xs: str = "xs",
    ys: str = "ys",
) -> tuple[str, str]:
    """DuckDB twin of :func:`dtw_distance` for ONE fixture chain B given as
    literal points — same unrolled-row recursive-CTE shape as
    :func:`frechet_recursive_cte_sql`, with ``+``/``least`` replacing
    ``greatest``/``least`` per the DTW recurrence.  Identical
    difference-product d² arithmetic and exact-DOUBLE literals."""

    def flit(v: float) -> str:
        r = repr(float(v))
        return r if ("e" in r or "E" in r) else r + "e0"

    m = len(bpts)

    def d2(iexpr: str, j: int) -> str:
        bx, by = flit(bpts[j - 1][0]), flit(bpts[j - 1][1])
        return (
            f"(({xs}[{iexpr}] - {bx}) * ({xs}[{iexpr}] - {bx}) + "
            f"({ys}[{iexpr}] - {by}) * ({ys}[{iexpr}] - {by}))"
        )

    inits = [d2("1", 1)]
    for j in range(2, m + 1):
        inits.append(f"{d2('1', j)} + ({inits[-1]})")
    init_cols = ", ".join(f"{e} AS r{j + 1}" for j, e in enumerate(inits))

    steps = [f"({d2('(i + 1)', 1)} + r1)"]
    for j in range(2, m + 1):
        steps.append(
            f"({d2('(i + 1)', j)} + "
            f"least(r{j}, r{j - 1}, {steps[-1]}))"
        )
    step_cols = ", ".join(f"{e} AS r{j + 1}" for j, e in enumerate(steps))

    cte = (
        f"{name} AS ("
        f"SELECT {key}, {xs}, {ys}, 1 AS i, {init_cols} FROM {src} "
        f"UNION ALL "
        f"SELECT {key}, {xs}, {ys}, i + 1, {step_cols} "
        f"FROM {name} WHERE i < len({xs}))"
    )
    final = f"sqrt(r{m})"
    return cte, final


def frechet_recursive_cte_sql(
    name: str,
    src: str,
    key: str,
    bpts: list,
    xs: str = "xs",
    ys: str = "ys",
) -> tuple[str, str]:
    """DuckDB twin of :func:`frechet_distance` for ONE fixture chain B
    given as literal points: returns ``(cte_text, final_select_expr)``.

    The DP row is unrolled into m plain DOUBLE columns r1..rm of a
    recursive CTE over i (m is known per fixture line, so the inner
    sequential dependency new[j-1] -> new[j] is resolved by TEXTUAL
    inlining — the generated expression for nr_j embeds nr_{j-1} once,
    total text O(m²)).  Identical difference-product d² arithmetic and
    identical exact-DOUBLE literals as the engine fold, so max/min/sqrt
    parity is structural."""

    def flit(v: float) -> str:
        r = repr(float(v))
        return r if ("e" in r or "E" in r) else r + "e0"

    m = len(bpts)

    def d2(iexpr: str, j: int) -> str:
        bx, by = flit(bpts[j - 1][0]), flit(bpts[j - 1][1])
        return (
            f"(({xs}[{iexpr}] - {bx}) * ({xs}[{iexpr}] - {bx}) + "
            f"({ys}[{iexpr}] - {by}) * ({ys}[{iexpr}] - {by}))"
        )

    inits = [d2("1", 1)]
    for j in range(2, m + 1):
        inits.append(f"greatest({d2('1', j)}, {inits[-1]})")
    init_cols = ", ".join(f"{e} AS r{j + 1}" for j, e in enumerate(inits))

    steps = [f"greatest(r1, {d2('(i + 1)', 1)})"]
    for j in range(2, m + 1):
        steps.append(
            f"greatest({d2('(i + 1)', j)}, "
            f"least(r{j}, r{j - 1}, {steps[-1]}))"
        )
    step_cols = ", ".join(f"{e} AS r{j + 1}" for j, e in enumerate(steps))

    cte = (
        f"{name} AS ("
        f"SELECT {key}, {xs}, {ys}, 1 AS i, {init_cols} FROM {src} "
        f"UNION ALL "
        f"SELECT {key}, {xs}, {ys}, i + 1, {step_cols} "
        f"FROM {name} WHERE i < len({xs}))"
    )
    final = f"sqrt(r{m})"
    return cte, final


def offset_curve(xs: Column, ys: Column, dist: float) -> tuple:
    """PostGIS ``ST_OffsetCurve(line, d, 'join=mitre')`` — the parallel
    curve at signed distance ``dist`` (positive = LEFT of the direction
    of travel), with MITRE joins and no mitre limit.

    Pure parallel ``transform`` over vertex indices (each output vertex
    depends only on its <= 2 incident edges, so unlike the Fréchet DP
    there is no sequential fold): endpoint vertices translate along
    their single edge's left normal; every interior vertex is the exact
    line-line intersection of its two offset edges, falling back to the
    simple normal translation when the edges are exactly collinear
    (cross product == 0.0, compared EXACTLY so the DuckDB twin branches
    identically).  Requires no repeated vertices (zero-length edges
    would divide by zero — same contract as the other chain kernels).
    Returns the (offset_xs, offset_ys) Column pair."""
    d = F.lit(float(dist))
    n = F.size(xs)

    def X(i):
        return F.element_at(xs, i)

    def Y(i):
        return F.element_at(ys, i)

    def edge(i):
        dx = X(i + 1) - X(i)
        dy = Y(i + 1) - Y(i)
        ln = F.sqrt(dx * dx + dy * dy)
        return dx, dy, ln

    def off_pt(px, py, e):
        dx, dy, ln = edge(e)
        return px - d * dy / ln, py + d * dx / ln

    def vertex(j):
        # endpoint cases
        fx, fy = off_pt(X(F.lit(1)), Y(F.lit(1)), F.lit(1))
        lx, ly = off_pt(X(n), Y(n), n - 1)
        # interior: intersect offset edge (j-1) with offset edge j
        dxl, dyl, lnl = edge(j - 1)
        dxr, dyr, lnr = edge(j)
        ax = X(j - 1) - d * dyl / lnl
        ay = Y(j - 1) + d * dxl / lnl
        bx = X(j) - d * dyr / lnr
        by = Y(j) + d * dxr / lnr
        denom = dxl * dyr - dyl * dxr
        t = ((bx - ax) * dyr - (by - ay) * dxr) / F.when(
            denom == 0.0, F.lit(1.0)
        ).otherwise(denom)
        mx = F.when(denom == 0.0, bx).otherwise(ax + t * dxl)
        my = F.when(denom == 0.0, by).otherwise(ay + t * dyl)
        return (
            F.when(j == 1, fx).when(j == n, lx).otherwise(mx),
            F.when(j == 1, fy).when(j == n, ly).otherwise(my),
        )

    seq = F.sequence(F.lit(1), n)
    return (
        F.transform(seq, lambda j: vertex(j)[0]),
        F.transform(seq, lambda j: vertex(j)[1]),
    )


def offset_curve_sql(xs: str, ys: str, dist: float) -> tuple:
    """DuckDB twin of :func:`offset_curve`: identical per-vertex formulas
    (same subexpression text, same exact-DOUBLE distance literal, same
    EXACT ``= 0.0`` collinear branch) inside ``list_transform``."""
    r = repr(float(dist))
    d = r if ("e" in r or "E" in r) else r + "e0"

    def X(i):
        return f"{xs}[{i}]"

    def Y(i):
        return f"{ys}[{i}]"

    def edge(i):
        dx = f"({X(f'({i}) + 1')} - {X(i)})"
        dy = f"({Y(f'({i}) + 1')} - {Y(i)})"
        ln = f"sqrt({dx} * {dx} + {dy} * {dy})"
        return dx, dy, ln

    def off_x(px, e):
        dx, dy, ln = edge(e)
        return f"({px} - {d} * {dy} / {ln})"

    def off_y(py, e):
        dx, dy, ln = edge(e)
        return f"({py} + {d} * {dx} / {ln})"

    n = f"len({xs})"
    out = []
    for coord in ("x", "y"):
        fx = off_x(X("1"), "1") if coord == "x" else off_y(Y("1"), "1")
        lx = (
            off_x(X(n), f"{n} - 1")
            if coord == "x"
            else off_y(Y(n), f"{n} - 1")
        )
        dxl, dyl, lnl = edge("j - 1")
        dxr, dyr, lnr = edge("j")
        ax = f"({X('j - 1')} - {d} * {dyl} / {lnl})"
        ay = f"({Y('j - 1')} + {d} * {dxl} / {lnl})"
        bx = f"({X('j')} - {d} * {dyr} / {lnr})"
        by = f"({Y('j')} + {d} * {dxr} / {lnr})"
        denom = f"({dxl} * {dyr} - {dyl} * {dxr})"
        t = (
            f"((({bx} - {ax}) * {dyr} - ({by} - {ay}) * {dxr}) / "
            f"(CASE WHEN {denom} = 0.0 THEN 1.0 ELSE {denom} END))"
        )
        if coord == "x":
            mid = f"(CASE WHEN {denom} = 0.0 THEN {bx} ELSE {ax} + {t} * {dxl} END)"
        else:
            mid = f"(CASE WHEN {denom} = 0.0 THEN {by} ELSE {ay} + {t} * {dyl} END)"
        out.append(
            f"list_transform(range(1, {n} + 1), j -> "
            f"CASE WHEN j = 1 THEN {fx} WHEN j = {n} THEN {lx} "
            f"ELSE {mid} END)"
        )
    return out[0], out[1]


def chaikin_once(xs: Column, ys: Column) -> tuple:
    """One PostGIS ``ST_ChaikinSmoothing`` corner-cutting iteration over an
    open polyline (reference: tilekiln delegates smoothing to PostGIS; this
    is the lwgeom line convention — endpoints preserved).  Each edge
    (P_i, P_{i+1}) is cut at 1/4 and 3/4:

        out = [P_1, Q_1, R_1, ..., Q_{n-1}, R_{n-1}, P_n],
        Q_i = P_i·3/4 + P_{i+1}·1/4,  R_i = P_i·1/4 + P_{i+1}·3/4

    so position 2i holds Q_i and position 2i+1 holds R_i (length 2n).
    Weights are exact binary fractions — multiply/add only, bit-identical
    on the DuckDB twin (:func:`chaikin_once_sql`).  A parallel ``transform``
    per output vertex, NO sequential fold; iterations chain by reapplying
    (the caller materializes each round as a column, so expression depth is
    linear in the iteration count).  Returns the (sm_xs, sm_ys) pair."""
    n = F.size(xs)

    def step(a):
        def v(j):
            # indices are clamped into [1, n] so the NEVER-TAKEN branches
            # (j = 1 / j = 2n fire first) still build in-range element_at
            # operands: Spark's codegen subexpression elimination may
            # evaluate branch subexpressions eagerly after projection
            # collapse, and an out-of-range index hard-fails under ANSI.
            # Clamps are inactive on every live branch (edge index is
            # always in [1, n-1] there), so values are unchanged.
            ie = F.least(F.floor(j / 2).cast("int"), n - 1)
            io = F.greatest(
                F.least(F.floor((j - 1) / 2).cast("int"), n - 1), F.lit(1)
            )
            q = F.element_at(a, ie) * 0.75 + F.element_at(a, ie + 1) * 0.25
            r = F.element_at(a, io) * 0.25 + F.element_at(a, io + 1) * 0.75
            return (
                F.when(j == 1, F.element_at(a, 1))
                .when(j == 2 * n, F.element_at(a, n))
                .when(j % 2 == 0, q)
                .otherwise(r)
            )

        return F.transform(F.sequence(F.lit(1), 2 * n), v)

    return step(xs), step(ys)


def chaikin_once_sql(xs: str, ys: str) -> tuple:
    """DuckDB twin of :func:`chaikin_once`: identical per-vertex formulas
    (same exact binary-fraction weights, same index arithmetic — the edge
    index is floor(j/2) computed on DOUBLE then cast, mirroring Spark's
    integer-safe floor) inside ``list_transform``."""
    out = []
    for a in (xs, ys):
        n = f"len({a})"
        ie = f"least(CAST(floor(j / 2.0) AS INTEGER), {n} - 1)"
        io = f"greatest(least(CAST(floor((j - 1) / 2.0) AS INTEGER), {n} - 1), 1)"
        q = f"({a}[{ie}] * 0.75 + {a}[{ie} + 1] * 0.25)"
        r = f"({a}[{io}] * 0.25 + {a}[{io} + 1] * 0.75)"
        out.append(
            f"list_transform(range(1, 2 * {n} + 1), j -> "
            f"CASE WHEN j = 1 THEN {a}[1] "
            f"WHEN j = 2 * {n} THEN {a}[{n}] "
            f"WHEN j % 2 = 0 THEN {q} ELSE {r} END)"
        )
    return out[0], out[1]


def ring_normalize(xs: Column, ys: Column) -> tuple:
    """PostGIS/GEOS ``ST_Normalize``-style ring canonicalization — the
    geometry-equality primitive (two rings describe the same polygon iff
    their normal forms are identical): rotate the OPEN ring to start at
    its lexicographically smallest vertex (x, then y, then lowest index
    on exact duplicates) and orient it CCW (positive shoelace; the
    zero-area degenerate falls to the reversed branch, deterministically
    and twin-mirrored).

    All HOF/array ops: ONE argmin fold over a vertex-struct (struct
    comparison is lexicographic on both engines), slice+concat rotation,
    and a first-vertex-preserving reverse for the CW case.  Returns the
    (norm_xs, norm_ys) Column pair."""
    n = F.size(xs)

    def X(i):
        return F.element_at(xs, i)

    def Y(i):
        return F.element_at(ys, i)

    idxs = F.sequence(F.lit(1), n)
    best = F.aggregate(
        idxs,
        F.struct(
            X(F.lit(1)).alias("x"), Y(F.lit(1)).alias("y"), F.lit(1).alias("i")
        ),
        lambda acc, i: F.when(
            (X(i) < acc["x"]) | ((X(i) == acc["x"]) & (Y(i) < acc["y"])),
            F.struct(X(i).alias("x"), Y(i).alias("y"), i.alias("i")),
        ).otherwise(acc),
    )
    k = best["i"]

    def rot(a: Column) -> Column:
        return F.concat(F.slice(a, k, n - k + 1), F.slice(a, F.lit(1), k - 1))

    area2 = F.aggregate(
        idxs,
        F.lit(0.0),
        lambda acc, i: acc
        + X(i) * Y(F.pmod(i, n) + 1)
        - X(F.pmod(i, n) + 1) * Y(i),
    )

    def canon(a: Column) -> Column:
        return F.when(area2 > 0.0, a).otherwise(
            F.concat(F.slice(a, F.lit(1), F.lit(1)), F.reverse(F.slice(a, F.lit(2), n - 1)))
        )

    return canon(rot(xs)), canon(rot(ys))


def ring_normalize_sql(xs: str, ys: str) -> tuple:
    """DuckDB twin of :func:`ring_normalize`: identical argmin struct
    fold (struct comparison is lexicographic), identical shoelace sign
    test, slice/concat/reverse mirrored."""
    n = f"len({xs})"
    k = (
        f"(list_aggregate(list_transform(range(1, {n} + 1), i -> "
        f"{{'x': {xs}[i], 'y': {ys}[i], 'i': i}}), 'min')).i"
    )
    area2 = (
        f"coalesce(list_sum(list_transform(range(1, {n} + 1), i -> "
        f"{xs}[i] * {ys}[(i % {n}) + 1] - {xs}[(i % {n}) + 1] * {ys}[i])), 0.0)"
    )

    def rot(a: str) -> str:
        return f"list_concat({a}[({k}):], {a}[1:({k}) - 1])"

    def canon(a: str) -> str:
        r = rot(a)
        return (
            f"(CASE WHEN ({area2}) > 0.0 THEN {r} "
            f"ELSE list_concat(({r})[1:1], list_reverse(({r})[2:])) END)"
        )

    return canon(xs), canon(ys)


def edr_distance(
    axs: Column, ays: Column, bxs: Column, bys: Column, eps: float
) -> Column:
    """Edit Distance on Real sequences (Chen, Özsu & Oria 2005) between
    two vertex chains — the robust-to-outliers trajectory similarity
    beside DTW and Fréchet: points match (cost 0) when within ``eps``,
    else the best of substitute/insert/delete, each cost 1.

        D[i][j] = min(D[i-1][j-1] + [d(i,j) > eps],
                      D[i-1][j] + 1, D[i][j-1] + 1)

    The match test compares SQUARED distance against eps² (exact
    multiply/add boundary — the dwithin rule), and the whole DP is
    INTEGER-valued: unlike DTW/Fréchet there is no float accumulation at
    all, so cross-engine equality is exact without a final rounding.

    Same single-live-row execution as :func:`dtw_distance`: ONE nested
    JVM HOF fold over rows of length m+1 (the j=0 boundary column rides
    along), no UDF, O(m) state.  Returns the integer edit distance.  At
    100 TB: O(n·m) codegen steps per pair; B broadcasts, map-only join."""
    m = F.size(bxs)
    eps2 = F.lit(float(eps) * float(eps))

    def sub(i: Column, j: Column) -> Column:
        dx = F.element_at(axs, i) - F.element_at(bxs, j)
        dy = F.element_at(ays, i) - F.element_at(bys, j)
        return F.when(dx * dx + dy * dy <= eps2, F.lit(0)).otherwise(F.lit(1))

    init = F.sequence(F.lit(0), m)  # D[0][j] = j, index j+1 <-> column j

    def step(row: Column, i: Column) -> Column:
        return F.aggregate(
            F.sequence(F.lit(1), m),
            F.array(i),  # D[i][0] = i
            lambda acc, j: F.concat(
                acc,
                F.array(
                    F.least(
                        F.element_at(row, j) + sub(i, j),
                        F.element_at(row, j + 1) + F.lit(1),
                        F.element_at(acc, -1) + F.lit(1),
                    )
                ),
            ),
        )

    # r6 (ADVICE/VERDICT carry-over): an EMPTY chain A makes
    # F.sequence(1, 0) yield the DESCENDING [1, 0] and the fold then
    # evaluates element_at(..., 0) — a runtime error, not a degenerate
    # distance.  Short-circuit like cavnar_trenkle: EDR(∅, B) = |B|,
    # which is exactly init's last element (the DuckDB twin's anchor row
    # already returns r_m = m for an empty chain, so the engines agree).
    final = F.when(
        F.size(axs) == 0, init
    ).otherwise(F.aggregate(F.sequence(F.lit(1), F.size(axs)), init, step))
    return F.element_at(final, m + 1)


def edr_recursive_cte_sql(
    name: str,
    src: str,
    key: str,
    bpts: list,
    eps: float,
    xs: str = "xs",
    ys: str = "ys",
) -> tuple[str, str]:
    """DuckDB twin of :func:`edr_distance` for ONE fixture chain B given
    as literal points — the dtw_recursive_cte_sql unrolled-row shape with
    the integer EDR recurrence (boundary column r0 = i rides along) and
    the exact eps² squared-distance match test."""

    def flit(v: float) -> str:
        r = repr(float(v))
        return r if ("e" in r or "E" in r) else r + "e0"

    m = len(bpts)
    eps2 = flit(float(eps) * float(eps))

    def sub(iexpr: str, j: int) -> str:
        bx, by = flit(bpts[j - 1][0]), flit(bpts[j - 1][1])
        d2 = (
            f"(({xs}[{iexpr}] - {bx}) * ({xs}[{iexpr}] - {bx}) + "
            f"({ys}[{iexpr}] - {by}) * ({ys}[{iexpr}] - {by}))"
        )
        return f"(CASE WHEN {d2} <= {eps2} THEN 0 ELSE 1 END)"

    init_cols = ", ".join(f"{j} AS r{j}" for j in range(0, m + 1))
    steps = ["(i + 1)"]
    for j in range(1, m + 1):
        steps.append(
            f"least(r{j - 1} + {sub('(i + 1)', j)}, "
            f"r{j} + 1, ({steps[-1]}) + 1)"
        )
    step_cols = ", ".join(f"{e} AS r{j}" for j, e in enumerate(steps))

    cte = (
        f"{name} AS ("
        f"SELECT {key}, {xs}, {ys}, 0 AS i, {init_cols} FROM {src} "
        f"UNION ALL "
        f"SELECT {key}, {xs}, {ys}, i + 1, {step_cols} "
        f"FROM {name} WHERE i < len({xs}))"
    )
    final = f"r{m}"
    return cte, final
