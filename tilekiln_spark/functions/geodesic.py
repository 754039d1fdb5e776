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
