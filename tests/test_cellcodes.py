"""Geohash / quadkey codecs: public known vectors + reference-implementation
cross-check + prefix-hierarchy property."""

import duckdb
import pyspark.sql.functions as F

from tilekiln_spark.functions.cellcodes import (
    BASE32,
    geohash_decode,
    geohash_decode_sql,
    geohash_encode,
    quadkey_decode,
    quadkey_decode_sql,
    quadkey_encode,
)


def _ref_geohash(lat: float, lon: float, precision: int) -> str:
    """Textbook interval-bisection geohash (public algorithm)."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    out, bit, ch, even = [], 0, 0, True
    while len(out) < precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                ch = ch * 2 + 1
                lon_lo = mid
            else:
                ch = ch * 2
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                ch = ch * 2 + 1
                lat_lo = mid
            else:
                ch = ch * 2
                lat_hi = mid
        even = not even
        bit += 1
        if bit == 5:
            out.append(BASE32[ch])
            bit, ch = 0, 0
    return "".join(out)


def _ref_quadkey(zoom: int, x: int, y: int) -> str:
    out = []
    for level in range(zoom, 0, -1):
        d, mask = 0, 1 << (level - 1)
        if x & mask:
            d += 1
        if y & mask:
            d += 2
        out.append(str(d))
    return "".join(out)


def test_geohash_known_vectors(spark):
    df = spark.createDataFrame(
        [(57.64911, 10.40744), (42.605, -5.603), (0.0, 0.0), (-25.382708, -49.265506)],
        "lat double, lon double",
    )
    got = [
        r[0]
        for r in df.select(geohash_encode(F.col("lat"), F.col("lon"), 11)).collect()
    ]
    # public test vectors (geohash.org examples)
    assert got[0] == "u4pruydqqvj"
    assert got[1].startswith("ezs42")
    assert got[2].startswith("s0000")
    assert got[3].startswith("6gkzwgjzn")


def test_geohash_matches_reference_impl(spark):
    pts = [((i * 7919 % 1800) / 10.0 - 90.0, (i * 104729 % 3600) / 10.0 - 180.0) for i in range(80)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    for precision in (1, 5, 8):
        got = [
            r[0]
            for r in df.select(
                geohash_encode(F.col("lat"), F.col("lon"), precision)
            ).collect()
        ]
        expected = [_ref_geohash(lat, lon, precision) for lat, lon in pts]
        assert got == expected


def test_geohash_prefix_hierarchy(spark):
    """Precision p output is a prefix of precision p+2 output (hierarchical
    cells — the property LSH-style prefix joins rely on)."""
    pts = [((i * 31 % 170) - 85.0, (i * 97 % 350) - 175.0) for i in range(40)]
    df = spark.createDataFrame([(float(a), float(b)) for a, b in pts], "lat double, lon double")
    rows = df.select(
        geohash_encode(F.col("lat"), F.col("lon"), 4).alias("g4"),
        geohash_encode(F.col("lat"), F.col("lon"), 6).alias("g6"),
    ).collect()
    assert all(r.g6.startswith(r.g4) for r in rows)


def test_quadkey_known_vector_and_reference(spark):
    # Bing Maps docs example: tile (3, 5) at level 3 -> "213"
    df = spark.createDataFrame(
        [(3, 5), (0, 0), (7, 0), (35210, 21493)], "x int, y int"
    )
    got3 = [r[0] for r in df.select(quadkey_encode(3, F.col("x"), F.col("y"))).collect()]
    assert got3[0] == "213"
    assert got3[1] == "000"
    assert got3[2] == "111"
    got16 = [r[0] for r in df.select(quadkey_encode(16, F.col("x"), F.col("y"))).collect()]
    expected16 = [_ref_quadkey(16, x, y) for x, y in [(3, 5), (0, 0), (7, 0), (35210, 21493)]]
    assert got16 == expected16
    # quadkey prefix = parent tile's quadkey (pyramid property)
    got15 = [r[0] for r in df.select(
        quadkey_encode(15, F.floor(F.col("x") / 2).cast("int"), F.floor(F.col("y") / 2).cast("int"))
    ).collect()]
    assert all(full.startswith(parent) for full, parent in zip(got16, got15))


def test_geohash_decode_roundtrip_and_center(spark):
    """decode returns the CELL CENTER (ST_PointFromGeoHash parity): the
    center re-encodes to the same code, and the original point sits within
    half a cell of the center on each axis."""
    pts = [((i * 7919 % 1800) / 10.0 - 89.95, (i * 104729 % 3600) / 10.0 - 179.95)
           for i in range(60)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    for precision in (3, 7):
        enc = df.select(
            "lat", "lon",
            geohash_encode(F.col("lat"), F.col("lon"), precision).alias("gh"),
        )
        dlat, dlon = geohash_decode(F.col("gh"), precision)
        rows = enc.select(
            "lat", "lon", "gh",
            dlat.alias("clat"), dlon.alias("clon"),
            geohash_encode(dlat, dlon, precision).alias("gh2"),
        ).collect()
        nbits = 5 * precision
        cell_lon = 360.0 / (1 << ((nbits + 1) // 2))
        cell_lat = 180.0 / (1 << (nbits // 2))
        for r in rows:
            assert r.gh2 == r.gh  # center re-encodes to the same cell
            assert abs(r.clat - r.lat) <= cell_lat / 2 + 1e-9
            assert abs(r.clon - r.lon) <= cell_lon / 2 + 1e-9


def test_quadkey_decode_roundtrip(spark):
    df = spark.createDataFrame(
        [(3, 5), (0, 0), (7, 0), (35210, 21493)], "x int, y int"
    )
    for zoom in (3, 16):
        mask = (1 << zoom) - 1
        enc = df.select(
            (F.col("x").bitwiseAND(F.lit(mask))).alias("x"),
            (F.col("y").bitwiseAND(F.lit(mask))).alias("y"),
        ).select(
            "x", "y", quadkey_encode(zoom, F.col("x"), F.col("y")).alias("qk")
        )
        dx, dy = quadkey_decode(F.col("qk"), zoom)
        rows = enc.select("x", "y", dx.alias("dx"), dy.alias("dy")).collect()
        for r in rows:
            assert (r.dx, r.dy) == (r.x, r.y)


def test_decode_sql_twins_match(spark):
    """The generated DuckDB decode SQL produces bit-identical centers and
    tile coords to the Spark expressions on shared codes."""
    pts = [((i * 31 % 170) - 84.5, (i * 97 % 350) - 174.5) for i in range(40)]
    df = spark.createDataFrame([(float(a), float(b)) for a, b in pts], "lat double, lon double")
    enc = df.select(
        geohash_encode(F.col("lat"), F.col("lon"), 6).alias("gh"),
    )
    dlat, dlon = geohash_decode(F.col("gh"), 6)
    got = [(r.gh, r.clat, r.clon) for r in
           enc.select("gh", dlat.alias("clat"), dlon.alias("clon")).collect()]
    lat_sql, lon_sql = geohash_decode_sql("gh", 6)
    vals = ",".join(f"('{g}')" for g, _, _ in got)
    want = duckdb.connect().execute(
        f"WITH t(gh) AS (VALUES {vals}) "
        f"SELECT gh, {lat_sql} AS clat, {lon_sql} AS clon FROM t"
    ).fetchall()
    assert got == [tuple(r) for r in want]

    qdf = spark.createDataFrame([(i * 37 % 64, i * 53 % 64) for i in range(30)], "x int, y int")
    qenc = qdf.select(quadkey_encode(6, F.col("x"), F.col("y")).alias("qk"))
    qx, qy = quadkey_decode(F.col("qk"), 6)
    qgot = [(r.qk, r.dx, r.dy) for r in
            qenc.select("qk", qx.alias("dx"), qy.alias("dy")).collect()]
    x_sql, y_sql = quadkey_decode_sql("qk", 6)
    qvals = ",".join(f"('{k}')" for k, _, _ in qgot)
    qwant = duckdb.connect().execute(
        f"WITH t(qk) AS (VALUES {qvals}) "
        f"SELECT qk, CAST({x_sql} AS BIGINT) AS dx, CAST({y_sql} AS BIGINT) AS dy FROM t"
    ).fetchall()
    assert qgot == [tuple(r) for r in qwant]


def test_quadkey_known_value_and_roundtrip(spark):
    """Bing docs example: tile (x=3, y=5, z=3) -> '213'; full z<=5
    roundtrip through quadkey_decode."""
    from pyspark.sql import functions as F

    from tilekiln_spark.functions.tileids import quadkey, quadkey_decode

    df = spark.range(1).select(
        quadkey(F.lit(3), F.lit(3), F.lit(5)).alias("qk")
    )
    assert df.collect()[0].qk == "213"

    tiles = spark.range(4 ** 5).select(
        F.lit(5).alias("z"),
        (F.col("id") % 32).cast("long").alias("x"),
        (F.col("id") / 32).cast("long").alias("y"),
    )
    enc = tiles.withColumn("qk", quadkey(F.col("z"), F.col("x"), F.col("y")))
    z2, x2, y2 = quadkey_decode(F.col("qk"))
    bad = enc.filter(
        (z2 != F.col("z")) | (x2 != F.col("x")) | (y2 != F.col("y"))
    )
    assert bad.count() == 0
    # distinct quadkeys == distinct tiles (no collisions)
    assert enc.select("qk").distinct().count() == 4 ** 5


def test_quadkey_zoom0_root_is_empty(spark):
    """zoom-0 root tile: quadkey '' (not '00' — the F.sequence(1,0)
    descending footgun), decoding back to (0, 0, 0)."""
    from pyspark.sql import functions as F

    from tilekiln_spark.functions.tileids import quadkey, quadkey_decode

    df = spark.range(1).select(
        quadkey(F.lit(0), F.lit(0), F.lit(0)).alias("qk")
    )
    z, x, y = quadkey_decode(F.col("qk"))
    row = df.select("qk", z.alias("z"), x.alias("x"), y.alias("y")).collect()[0]
    assert (row.qk, row.z, row.x, row.y) == ("", 0, 0, 0)
