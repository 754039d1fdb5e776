"""Geohash / quadkey codecs: public known vectors + reference-implementation
cross-check + prefix-hierarchy property."""

import pyspark.sql.functions as F

from tilekiln_spark.functions.cellcodes import (
    BASE32,
    geohash_encode,
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
