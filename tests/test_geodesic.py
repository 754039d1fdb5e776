"""Great-circle distance + geography DWithin join: known values, DuckDB-twin
agreement, and the bounded lat/lon-grid join vs a brute-force cross join
(seam, polar, and full-wrap cases included)."""

import math

import duckdb
import pyspark.sql.functions as F
import pytest

from tilekiln_spark.functions.geodesic import (
    EARTH_RADIUS_M,
    haversine_m,
    haversine_m_sql,
)
from tilekiln_spark.operators.spatial_join import dwithin_geography_join


def _ref_haversine(lat1, lon1, lat2, lon2):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dphi = math.radians(lat2 - lat1) / 2
    dlam = math.radians(lon2 - lon1) / 2
    a = math.sin(dphi) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dlam) ** 2
    return 2 * EARTH_RADIUS_M * math.asin(math.sqrt(min(a, 1.0)))


_PAIRS = [
    (0.0, 0.0, 0.0, 90.0),          # quarter circumference along equator
    (0.0, 0.0, 90.0, 0.0),          # pole
    (52.52, 13.405, 48.8566, 2.3522),   # Berlin - Paris
    (0.0, 179.9, 0.0, -179.9),      # antimeridian seam
    (10.0, 20.0, -10.0, -160.0),    # antipodal-ish (clamp branch)
    (33.0, 44.0, 33.0, 44.0),       # zero
]


def test_geography_ring_area_known_values(spark):
    """Exact closed forms: a lat/lon 'rectangle' has spherical area
    R²·Δλ·(sin φ₂ − sin φ₁); degenerate and null rows guard."""
    from tilekiln_spark.functions.geodesic import geography_ring_area

    fixture = [
        (0, [10.0, 10.0, 20.0, 20.0], [30.0, 45.0, 45.0, 30.0]),
        (1, [-5.0, -5.0, 5.0, 5.0], [0.0, 10.0, 10.0, 0.0]),
        (2, [5.0, 6.0], [5.0, 6.0]),
        (3, None, None),
    ]
    df = spark.createDataFrame(fixture, "gid int, lats array<double>, lons array<double>")
    got = {
        r.gid: r.a
        for r in df.select(
            "gid",
            geography_ring_area(F.col("lats"), F.col("lons")).alias("a"),
        ).collect()
    }

    def rect_area(lat1, lat2, lon1, lon2):
        return (
            EARTH_RADIUS_M ** 2
            * math.radians(lon2 - lon1)
            * (math.sin(math.radians(lat2)) - math.sin(math.radians(lat1)))
        )

    assert got[0] == pytest.approx(rect_area(10.0, 20.0, 30.0, 45.0), rel=1e-12)
    assert got[1] == pytest.approx(rect_area(-5.0, 5.0, 0.0, 10.0), rel=1e-12)
    assert got[2] == 0.0
    assert got[3] is None


def test_geography_ring_area_duckdb_twin(spark):
    from tilekiln_spark.functions.geodesic import (
        geography_ring_area,
        geography_ring_area_sql,
    )

    fixture = [
        (0, [10.0, 10.0, 20.0, 20.0], [30.0, 45.0, 45.0, 30.0]),
        (1, [0.0, 0.0, 43.7, 26.4, 55.1], [0.0, 143.7, 143.7, 71.8, 0.0]),
        (2, [5.0, 6.0], [5.0, 6.0]),
        (3, None, None),
    ]
    df = spark.createDataFrame(fixture, "gid int, lats array<double>, lons array<double>")
    got = [
        (r.gid, None if r.a is None else round(r.a, 3))
        for r in df.select(
            "gid",
            geography_ring_area(F.col("lats"), F.col("lons")).alias("a"),
        ).orderBy("gid").collect()
    ]
    vals = ",".join(
        f"({g}, "
        + ("NULL, NULL" if la is None else f"{la!r}::DOUBLE[], {lo!r}::DOUBLE[]")
        + ")"
        for g, la, lo in fixture
    )
    want = duckdb.connect().execute(
        f"WITH t(gid, lats, lons) AS (VALUES {vals}) "
        f"SELECT gid, round({geography_ring_area_sql('lats', 'lons')}, 3) "
        f"FROM t ORDER BY gid"
    ).fetchall()
    assert got == [tuple(r) for r in want]


def test_haversine_known_values(spark):
    df = spark.createDataFrame(_PAIRS, "lat1 double, lon1 double, lat2 double, lon2 double")
    got = [
        r[0]
        for r in df.select(
            haversine_m(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2"))
        ).collect()
    ]
    quarter = math.pi / 2 * EARTH_RADIUS_M
    assert got[0] == pytest.approx(quarter, rel=1e-12)
    assert got[1] == pytest.approx(quarter, rel=1e-12)
    assert got[2] == pytest.approx(877463, rel=1e-2)  # ~877.5 km
    assert got[3] == pytest.approx(0.2 * math.pi / 180 * EARTH_RADIUS_M, rel=1e-9)
    assert got[5] == 0.0
    for g, p in zip(got, _PAIRS):
        assert g == pytest.approx(_ref_haversine(*p), rel=1e-12)


def test_haversine_duckdb_twin(spark):
    df = spark.createDataFrame(_PAIRS, "lat1 double, lon1 double, lat2 double, lon2 double")
    got = [
        r[0]
        for r in df.select(
            haversine_m(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2"))
        ).collect()
    ]
    vals = ",".join(f"({a!r},{b!r},{c!r},{d!r})" for a, b, c, d in _PAIRS)
    want = [
        r[0]
        for r in duckdb.connect().execute(
            f"WITH t(lat1, lon1, lat2, lon2) AS (VALUES {vals}) "
            f"SELECT {haversine_m_sql('lat1', 'lon1', 'lat2', 'lon2')} FROM t"
        ).fetchall()
    ]
    # same formula text, but the engines' libm may differ in the last ulp —
    # allclose, not equality (oracles round for display for the same reason)
    for g, w in zip(got, want):
        assert g == pytest.approx(w, rel=1e-12, abs=1e-6)


def _pts(spark, n=240):
    """Deterministic scatter incl. high-lat and near-seam points."""
    rows = []
    for i in range(n):
        lat = ((i * 7919) % 1780) / 10.0 - 89.0
        lon = ((i * 104729) % 3600) / 10.0 - 180.0
        rows.append((i, lat, lon))
    rows += [(n, 89.6, 10.0), (n + 1, 89.9, -170.0), (n + 2, -89.7, 5.0),
             (n + 3, 0.0, 179.95), (n + 4, 0.0, -179.95)]
    return spark.createDataFrame(rows, "pid int, lat double, lon double")


_SEEDS = [
    (0, 0.0, 179.8),     # antimeridian seam
    (1, 89.5, 0.0),      # polar cap
    (2, -89.5, 100.0),   # south polar cap
    (3, 45.0, -120.0),
    (4, -30.0, 60.0),
    (5, 86.0, 90.0),     # high-lat, below polar threshold
    (6, 0.0, 0.0),
]


@pytest.mark.parametrize("radius_m", [300_000.0, 1_500_000.0, 6_000_000.0])
def test_dwithin_geography_matches_bruteforce(spark, radius_m):
    pts = _pts(spark)
    seeds = spark.createDataFrame(_SEEDS, "sid int, slat double, slon double")
    got = {
        (r.pid, r.sid)
        for r in dwithin_geography_join(pts, seeds, radius_m).collect()
    }
    d = haversine_m(F.col("lat"), F.col("lon"), F.col("slat"), F.col("slon"))
    want = {
        (r.pid, r.sid)
        for r in pts.crossJoin(seeds).where(d <= F.lit(radius_m)).collect()
    }
    assert got == want
    assert len(want) > 0


def test_dwithin_geography_no_duplicate_pairs(spark):
    pts = _pts(spark)
    seeds = spark.createDataFrame(_SEEDS, "sid int, slat double, slon double")
    out = dwithin_geography_join(pts, seeds, 2_000_000.0).select("pid", "sid")
    assert out.count() == out.distinct().count()


def test_dwithin_geography_seam_and_polar_pairs_present(spark):
    """The pairs the naive flat grid would miss: across the +-180 seam and
    inside the polar cap."""
    pts = _pts(spark)
    seeds = spark.createDataFrame(_SEEDS, "sid int, slat double, slon double")
    got = {
        (r.pid, r.sid)
        for r in dwithin_geography_join(pts, seeds, 300_000.0).collect()
    }
    n = 245 - 5
    assert (n + 3, 0) in got and (n + 4, 0) in got  # seam, both sides
    assert (n, 1) in got                            # polar cap north
    assert (n + 2, 2) in got                        # polar cap south


def test_knn_geography_matches_bruteforce(spark):
    from tilekiln_spark.operators.spatial_join import knn_geography_assign

    pts = _pts(spark, 120)
    seeds = spark.createDataFrame(_SEEDS, "sid int, slat double, slon double")
    out = knn_geography_assign(pts, seeds, k=2, point_key="pid").collect()
    got = {}
    for r in out:
        got.setdefault(r.pid, []).append((r.knn_rank, r.sid, r.dist_m))
    import math

    for r in pts.collect():
        dists = sorted(
            (round(_ref_haversine(r.lat, r.lon, s[1], s[2]), 6), s[1], s[2], s[0])
            for s in _SEEDS
        )
        want = [s[3] for s in dists[:2]]
        mine = [sid for _, sid, _ in sorted(got[r.pid])]
        assert mine == want, (r.pid, mine, want)
        assert len(got[r.pid]) == 2


def test_geography_line_length_known_values(spark):
    """Great-circle chain length: each edge must equal the haversine of its
    endpoint pair (exact closed forms for equator/meridian edges); closed
    adds the wrap edge; degenerate/null rows guard."""
    from tilekiln_spark.functions.geodesic import geography_line_length

    fixture = [
        (0, [0.0, 0.0], [0.0, 90.0]),            # quarter equator
        (1, [0.0, 90.0], [10.0, 10.0]),          # pole-reaching meridian
        (2, [10.0, 11.0, 11.0], [30.0, 30.0, 31.0]),
        (3, [5.0], [5.0]),
        (4, None, None),
    ]
    df = spark.createDataFrame(
        fixture, "gid int, lats array<double>, lons array<double>"
    )
    from tilekiln_spark.functions.geodesic import geography_line_length_sql

    got = {
        r.gid: (r.open_m, r.closed_m)
        for r in df.select(
            "gid",
            geography_line_length(F.col("lats"), F.col("lons")).alias("open_m"),
            geography_line_length(
                F.col("lats"), F.col("lons"), closed=True
            ).alias("closed_m"),
        ).collect()
    }
    quarter = math.pi * EARTH_RADIUS_M / 2.0
    assert got[0][0] == pytest.approx(quarter, rel=1e-12)
    assert got[1][0] == pytest.approx(quarter, rel=1e-12)
    # L-chain: 1 deg meridian + 1 deg parallel at 11N
    deg = math.pi * EARTH_RADIUS_M / 180.0
    assert got[2][0] == pytest.approx(
        deg + _ref_haversine(11.0, 30.0, 11.0, 31.0), rel=1e-12
    )
    # wrap edge closes the chain
    assert got[2][1] == pytest.approx(
        got[2][0] + _ref_haversine(11.0, 31.0, 10.0, 30.0), rel=1e-12
    )
    assert got[3] == (0.0, 0.0)
    assert got[4] == (None, None)

    # DuckDB twin bit-agreement on the same literals
    for gid, lats, lons in fixture[:3]:
        arr = lambda a: "[" + ", ".join(repr(v) for v in a) + "]"
        sql = geography_line_length_sql("lats", "lons")
        (dd,) = duckdb.sql(
            f"SELECT {sql} FROM (SELECT {arr(lats)}::DOUBLE[] lats, "
            f"{arr(lons)}::DOUBLE[] lons)"
        ).fetchone()
        assert dd == got[gid][0]


def test_project_point_roundtrip(spark):
    """ST_Project: cardinal closed forms, inverse agreement (haversine of
    (start, projected) == the requested distance), and the DuckDB twin on
    identical literals."""
    from tilekiln_spark.functions.geodesic import project_point, project_point_sql

    rows = [
        (0, 0.0, 0.0, math.pi * EARTH_RADIUS_M / 2.0, 0.0),     # to the pole
        (1, 0.0, 0.0, 1.0e6, math.pi / 2.0),                    # due east
        (2, 45.0, 10.0, 7.5e5, math.pi / 4.0),
        (3, -33.0, 151.0, 2.5e5, math.pi),
        (4, 10.0, 10.0, 0.0, 1.0),                              # identity
    ]
    df = spark.createDataFrame(
        rows, "pid int, lat double, lon double, d double, az double"
    )
    la2, lo2 = project_point(F.col("lat"), F.col("lon"), F.col("d"), F.col("az"))
    got = {
        r.pid: (r.la, r.lo)
        for r in df.select("pid", la2.alias("la"), lo2.alias("lo")).collect()
    }
    assert got[0][0] == pytest.approx(90.0, abs=1e-9)
    assert got[1][0] == pytest.approx(0.0, abs=1e-9)
    assert got[1][1] == pytest.approx(
        math.degrees(1.0e6 / EARTH_RADIUS_M), rel=1e-12
    )
    assert got[4] == (pytest.approx(10.0, abs=1e-12), pytest.approx(10.0, abs=1e-12))
    # inverse check: great-circle distance start -> projected == d
    for pid, lat, lon, d, az in rows[1:4]:
        la, lo = got[pid]
        assert _ref_haversine(lat, lon, la, lo) == pytest.approx(d, rel=1e-9)
    # twin agreement on identical literals
    sla, slo = project_point_sql("lat", "lon", "d", "az")
    for pid, lat, lon, d, az in rows:
        dd = duckdb.sql(
            f"SELECT {sla}, {slo} FROM (SELECT {lat!r}::DOUBLE lat, "
            f"{lon!r}::DOUBLE lon, {d!r}::DOUBLE d, {az!r}::DOUBLE az)"
        ).fetchone()
        assert dd[0] == pytest.approx(got[pid][0], abs=1e-12)
        assert dd[1] == pytest.approx(got[pid][1], abs=1e-12)


def test_initial_bearing_cardinals_and_segmentize_endpoint(spark):
    """initial_bearing: cardinal directions from the equator origin; a
    great-circle walk of the full haversine distance at that bearing
    lands on the destination (the ST_Segmentize(geography) invariant)."""
    import math

    from pyspark.sql import functions as F

    from tilekiln_spark.functions.geodesic import (
        haversine_m,
        initial_bearing,
        project_point,
    )

    df = spark.createDataFrame(
        [(0, 0.0, 0.0, 0.0, 10.0),    # due east
         (1, 0.0, 0.0, 10.0, 0.0),    # due north
         (2, 10.0, 20.0, -5.0, 31.0)],  # oblique
        "pid int, lat1 double, lon1 double, lat2 double, lon2 double",
    )
    br = initial_bearing(
        F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")
    )
    d = haversine_m(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2"))
    la, lo = project_point(F.col("lat1"), F.col("lon1"), d, br)
    rows = {r.pid: r for r in df.select(
        "pid", br.alias("b"),
        F.round(la, 6).alias("la"), F.round(lo, 6).alias("lo"),
        "lat2", "lon2",
    ).collect()}
    assert abs(rows[0].b - math.pi / 2) < 1e-12   # east
    assert abs(rows[1].b - 0.0) < 1e-12           # north
    for pid in (0, 1, 2):
        r = rows[pid]
        assert abs(r.la - r.lat2) < 1e-5 and abs(r.lo - r.lon2) < 1e-5, pid


def test_turning_angle_sum_right_angles(spark):
    """L-path (0,0)-(1,0)-(1,1): one 90-degree turn; straight path: 0;
    a full switchback counts pi."""
    import math

    from pyspark.sql import functions as F

    from tilekiln_spark.functions.geometry import turning_angle_sum

    df = spark.createDataFrame(
        [
            (1, [0.0, 1.0, 1.0], [0.0, 0.0, 1.0]),
            (2, [0.0, 1.0, 2.0], [0.0, 0.0, 0.0]),
            (3, [0.0, 1.0, 0.0], [0.0, 0.0, 0.0]),
            (4, [0.0, 1.0], [0.0, 0.0]),
        ],
        "i int, xs array<double>, ys array<double>",
    )
    got = {r.i: r.t for r in df.select(
        "i", turning_angle_sum(F.col("xs"), F.col("ys")).alias("t")
    ).collect()}
    assert abs(got[1] - math.pi / 2) < 1e-12
    assert got[2] == 0.0
    assert abs(got[3] - math.pi) < 1e-12
    assert got[4] == 0.0  # too short: guarded, no descending sequence
