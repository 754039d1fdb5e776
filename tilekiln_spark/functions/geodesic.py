"""Great-circle (geography) distance: haversine meters on the mean sphere.

PostGIS parity: ``ST_Distance(geography, geography)`` / ``ST_DWithin``
with ``use_spheroid := false`` measure on a sphere of radius 6371008.8 m
(PostGIS's own mean Earth radius); the reference's templates run arbitrary
PostGIS SQL so geography predicates are fair game
(reference tilekiln/definition.py:42-77).

Spark-first shape: the haversine is a pure expression tree over built-in
trig functions (radians/sin/cos/asin/sqrt — JVM-side, whole-stage codegen,
no UDF).  The ``*_sql`` twin emits the IDENTICAL formula as ANSI SQL for
the DuckDB oracles.  The two engines' libm sin/cos may differ in the last
ulp, so oracles round displayed distances and boundary radii are chosen
off any pair distance — same discipline as the cosine-ranking queries.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: PostGIS mean Earth radius (meters) — liblwgeom's WGS84 mean radius.
EARTH_RADIUS_M = 6371008.8

#: meters per degree of latitude on that sphere (R * pi / 180)
METERS_PER_DEG = 111194.92664455873


def haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in meters between two (lat, lon) degree pairs.

    d = 2 R asin( sqrt( sin^2(dphi/2) + cos(phi1) cos(phi2) sin^2(dlam/2) ) )
    """
    phi1, phi2 = F.radians(lat1), F.radians(lat2)
    dphi = F.radians(lat2 - lat1) / F.lit(2.0)
    dlam = F.radians(lon2 - lon1) / F.lit(2.0)
    a = F.sin(dphi) * F.sin(dphi) + F.cos(phi1) * F.cos(phi2) * F.sin(dlam) * F.sin(dlam)
    # clamp: rounding can push a one ulp above 1.0 for near-antipodal pairs
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(F.least(a, F.lit(1.0))))


def geography_ring_area(lats: Column, lons: Column) -> Column:
    """Spherical ring area in m² on the mean sphere (geography ``ST_Area``
    class): the sine-trapezoid rule

        A = (R²/2) · |Σᵢ Δλᵢ · (sin φᵢ + sin φᵢ₊₁)|

    over the UNCLOSED (lat, lon) degree arrays — exact for edges along
    meridians/parallels, and the standard spherical-shoelace limit for
    short edges (PostGIS evaluates great-ellipse edges on the spheroid;
    same measure class, documented deviation).  Rings must not cross the
    antimeridian.  One ``F.aggregate`` fold — codegen trig, no UDF.
    Null-propagates; < 3 vertices has area 0."""
    n = F.size(lats)

    def term(i: Column) -> Column:
        j = F.pmod(i, n) + 1
        dlam = F.radians(F.element_at(lons, j) - F.element_at(lons, i))
        return dlam * (
            F.sin(F.radians(F.element_at(lats, i)))
            + F.sin(F.radians(F.element_at(lats, j)))
        )

    s = F.aggregate(
        F.sequence(F.lit(1), n), F.lit(0.0), lambda acc, i: acc + term(i)
    )
    # guard BEFORE the fold (sequence(1, 0) would step through index 0)
    return F.when(n >= 3, F.abs(s) * F.lit(EARTH_RADIUS_M * EARTH_RADIUS_M / 2.0)).otherwise(
        F.when(lats.isNotNull() & lons.isNotNull(), F.lit(0.0))
    )


def geography_ring_area_sql(lats: str, lons: str) -> str:
    """DuckDB twin of :func:`geography_ring_area` — same formula text (the
    engines' libm sin may differ in the last ulp, so oracle outputs round
    at a granularity far above the accumulated drift)."""
    j = f"(i % len({lats})) + 1"
    term = (
        f"radians({lons}[{j}] - {lons}[i]) * "
        f"(sin(radians({lats}[i])) + sin(radians({lats}[{j}])))"
    )
    body = (
        f"(abs(list_sum(list_transform(range(1, len({lats}) + 1), i -> {term}))) "
        f"* {EARTH_RADIUS_M * EARTH_RADIUS_M / 2.0!r})"
    )
    return (
        f"(CASE WHEN {lats} IS NULL OR {lons} IS NULL THEN NULL "
        f"WHEN len({lats}) >= 3 THEN {body} ELSE 0.0 END)"
    )


def haversine_m_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """The DuckDB/ANSI twin of :func:`haversine_m` — same formula text."""
    dphi = f"(radians(({lat2}) - ({lat1})) / 2.0)"
    dlam = f"(radians(({lon2}) - ({lon1})) / 2.0)"
    a = (
        f"(sin({dphi}) * sin({dphi}) + cos(radians({lat1})) * "
        f"cos(radians({lat2})) * sin({dlam}) * sin({dlam}))"
    )
    return f"({2.0 * EARTH_RADIUS_M!r} * asin(sqrt(least({a}, 1.0))))"


def geography_line_length(
    lats: Column, lons: Column, closed: bool = False
) -> Column:
    """Geography ``ST_Length``: sum of great-circle edge lengths (meters,
    mean sphere) over an OPEN (lat, lon) degree polyline; ``closed=True``
    adds the wrap-around edge (geography ring perimeter).  Same fold shape
    as the planar :func:`~tilekiln_spark.functions.geometry.line_length`
    — one ``F.aggregate`` over the edge index, every trig call codegen,
    no UDF.  Null-propagates on null arrays; < 2 vertices has length 0.

    Parity: PostGIS ``ST_Length(geography, use_spheroid := false)``
    (liblwgeom measures great-circle edges on the same 6371008.8 m mean
    sphere; the reference's templates run arbitrary PostGIS SQL —
    reference tilekiln/definition.py:42-77)."""
    n = F.size(lats)
    last = n if closed else n - 1

    def edge(i: Column) -> Column:
        j = F.pmod(i, n) + 1
        return haversine_m(
            F.element_at(lats, i),
            F.element_at(lons, i),
            F.element_at(lats, j),
            F.element_at(lons, j),
        )

    s = F.aggregate(
        F.sequence(F.lit(1), last),
        F.lit(0.0),
        lambda acc, i: acc + edge(i),
    )
    # guard BEFORE the fold (sequence(1, 0) would step through index 0)
    return F.when(n >= 2, s).otherwise(
        F.when(lats.isNotNull() & lons.isNotNull(), F.lit(0.0))
    )


def geography_line_length_sql(lats: str, lons: str, closed: bool = False) -> str:
    """DuckDB twin of :func:`geography_line_length` — identical per-edge
    haversine formula text (libm drift confined to the trig calls,
    absorbed by oracle rounding)."""
    last = f"len({lats}) + 1" if closed else f"len({lats})"
    j = f"(i % len({lats})) + 1"
    edge = haversine_m_sql(
        f"{lats}[i]", f"{lons}[i]", f"{lats}[{j}]", f"{lons}[{j}]"
    )
    return (
        f"(CASE WHEN {lats} IS NULL OR {lons} IS NULL THEN NULL "
        f"ELSE coalesce(list_sum(list_transform(range(1, {last}), i -> {edge})), "
        f"0.0) END)"
    )


def project_point(
    lat: Column, lon: Column, distance_m: Column, azimuth_rad: Column
) -> tuple[Column, Column]:
    """Geography ``ST_Project``: spherical forward geodesic — destination
    (lat, lon) degrees from a start point, a distance in meters and an
    azimuth in RADIANS clockwise from north (the PostGIS signature).

        delta = d / R
        phi2  = asin(sin phi1 cos delta + cos phi1 sin delta cos theta)
        lam2  = lam1 + atan2(sin theta sin delta cos phi1,
                             cos delta - sin phi1 sin phi2)

    Pure expression tree (codegen trig, no UDF).  Longitudes are NOT
    wrapped: fixtures stay off the antimeridian (PostGIS normalizes to
    (-180, 180] — documented deviation, irrelevant away from the seam)."""
    phi1 = F.radians(lat)
    lam1 = F.radians(lon)
    delta = distance_m / F.lit(EARTH_RADIUS_M)
    sin_phi2 = F.sin(phi1) * F.cos(delta) + F.cos(phi1) * F.sin(delta) * F.cos(
        azimuth_rad
    )
    # clamp: rounding can push the sine a ulp outside [-1, 1] near the poles
    phi2 = F.asin(F.least(F.greatest(sin_phi2, F.lit(-1.0)), F.lit(1.0)))
    lam2 = lam1 + F.atan2(
        F.sin(azimuth_rad) * F.sin(delta) * F.cos(phi1),
        F.cos(delta) - F.sin(phi1) * F.sin(phi2),
    )
    return F.degrees(phi2), F.degrees(lam2)


def project_point_sql(
    lat: str, lon: str, distance_m: str, azimuth_rad: str
) -> tuple[str, str]:
    """DuckDB twin of :func:`project_point` — identical formula text;
    the intermediate phi2 is spliced (not re-derived), so both engines
    evaluate the same dependency chain."""
    phi1 = f"radians({lat})"
    delta = f"(({distance_m}) / {EARTH_RADIUS_M!r})"
    sin_phi2 = (
        f"(sin({phi1}) * cos({delta}) + cos({phi1}) * sin({delta}) "
        f"* cos({azimuth_rad}))"
    )
    phi2 = f"asin(least(greatest({sin_phi2}, -1.0), 1.0))"
    lam2 = (
        f"(radians({lon}) + atan2(sin({azimuth_rad}) * sin({delta}) * cos({phi1}), "
        f"cos({delta}) - sin({phi1}) * sin({phi2})))"
    )
    return f"degrees({phi2})", f"degrees({lam2})"


def initial_bearing(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Initial great-circle bearing (forward azimuth) from point 1 to
    point 2, RADIANS clockwise from north — the azimuth ``ST_Project``
    consumes, so ``project_point(p1, f * dist, initial_bearing(p1, p2))``
    walks the great circle toward p2 (geography ST_Segmentize):

        theta = atan2(sin dlam cos phi2,
                      cos phi1 sin phi2 - sin phi1 cos phi2 cos dlam)
    """
    phi1, phi2 = F.radians(lat1), F.radians(lat2)
    dlam = F.radians(lon2) - F.radians(lon1)
    return F.atan2(
        F.sin(dlam) * F.cos(phi2),
        F.cos(phi1) * F.sin(phi2) - F.sin(phi1) * F.cos(phi2) * F.cos(dlam),
    )


def initial_bearing_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """DuckDB twin of :func:`initial_bearing` — identical formula text."""
    phi1, phi2 = f"radians({lat1})", f"radians({lat2})"
    dlam = f"(radians({lon2}) - radians({lon1}))"
    return (
        f"atan2(sin({dlam}) * cos({phi2}), "
        f"cos({phi1}) * sin({phi2}) - sin({phi1}) * cos({phi2}) * cos({dlam}))"
    )
