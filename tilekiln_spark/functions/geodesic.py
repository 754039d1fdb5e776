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


def haversine_m_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """The DuckDB/ANSI twin of :func:`haversine_m` — same formula text."""
    dphi = f"(radians(({lat2}) - ({lat1})) / 2.0)"
    dlam = f"(radians(({lon2}) - ({lon1})) / 2.0)"
    a = (
        f"(sin({dphi}) * sin({dphi}) + cos(radians({lat1})) * "
        f"cos(radians({lat2})) * sin({dlam}) * sin({dlam}))"
    )
    return f"({2.0 * EARTH_RADIUS_M!r} * asin(sqrt(least({a}, 1.0))))"
