"""Geohash and Bing-quadkey cell codecs (PostGIS ST_GeoHash /
Bing Maps tile-quadkey parity; reference tilekiln delegates every cell
codec to PostGIS — tilekiln/definition.py:42-77 runs arbitrary SQL).

Spark-first shape: precision/zoom are plan-build-time constants, so the
bit interleave UNROLLS into a fixed pure-expression tree — integer
shift/mask/multiply-add only, whole-stage codegen, no UDF, no HOF.  Each
encoder has a twin ``*_sql`` generator that emits the IDENTICAL
arithmetic as ANSI SQL text (used by the DuckDB oracles): one bit-layout
loop drives both, so the engines cannot drift.

Geohash bit layout (public algorithm): 5 bits per base32 char,
alternating lon, lat from the MSB; lon gets ceil(5p/2) bits, lat
floor(5p/2); each axis is the floor-quantized fraction of its domain
([-180, 180] / [-90, 90]) at that bit depth.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _gh_layout(precision: int) -> tuple[int, int]:
    if not 1 <= precision <= 12:
        raise ValueError("geohash precision must be in [1, 12]")
    nbits = 5 * precision
    return (nbits + 1) // 2, nbits // 2  # lon bits, lat bits


def _quantize(frac: Column, nbits: int) -> Column:
    scaled = F.floor(frac * F.lit(float(1 << nbits))).cast("long")
    return F.greatest(F.lit(0).cast("long"), F.least(scaled, F.lit((1 << nbits) - 1).cast("long")))


def geohash_encode(lat: Column, lon: Column, precision: int = 6) -> Column:
    """lat/lon degrees -> geohash string of ``precision`` chars."""
    n_lon, n_lat = _gh_layout(precision)
    ilon = _quantize((lon + F.lit(180.0)) / F.lit(360.0), n_lon)
    ilat = _quantize((lat + F.lit(90.0)) / F.lit(180.0), n_lat)
    alphabet = F.array(*[F.lit(ch) for ch in BASE32])
    chars = []
    for c in range(precision):
        v: Column = F.lit(0).cast("long")
        for b in range(5):
            pos = 5 * c + b  # global bit index, 0 = MSB
            if pos % 2 == 0:
                src, shift = ilon, n_lon - 1 - pos // 2
            else:
                src, shift = ilat, n_lat - 1 - pos // 2
            bit = F.shiftright(src, shift).bitwiseAND(F.lit(1).cast("long"))
            v = v * F.lit(2).cast("long") + bit
        chars.append(F.element_at(alphabet, (v + F.lit(1)).cast("int")))
    return F.concat(*chars)


def geohash_encode_sql(lat_sql: str, lon_sql: str, precision: int = 6) -> str:
    """The DuckDB/ANSI twin of :func:`geohash_encode` — same unrolled bits."""
    n_lon, n_lat = _gh_layout(precision)

    def quant(expr: str, dom_lo: float, dom_len: float, nbits: int) -> str:
        scaled = (
            f"CAST(floor((({expr}) + {dom_lo!r}) / {dom_len!r} * "
            f"{float(1 << nbits)!r}) AS BIGINT)"
        )
        return f"greatest(0, least({scaled}, {(1 << nbits) - 1}))"

    ilon = quant(lon_sql, 180.0, 360.0, n_lon)
    ilat = quant(lat_sql, 90.0, 180.0, n_lat)
    chars = []
    for c in range(precision):
        v = "0"
        for b in range(5):
            pos = 5 * c + b
            if pos % 2 == 0:
                src, shift = "ghlon", n_lon - 1 - pos // 2
            else:
                src, shift = "ghlat", n_lat - 1 - pos // 2
            v = f"({v}) * 2 + ((({src}) >> {shift}) & 1)"
        chars.append(f"substr('{BASE32}', CAST(({v}) + 1 AS INT), 1)")
    concat = " || ".join(chars)
    # one named pair per row keeps the generated SQL readable and single-eval
    return (
        f"(SELECT {concat} FROM (SELECT {ilon} AS ghlon, {ilat} AS ghlat) q)"
    )


def quadkey_encode(zoom: int, x: Column, y: Column) -> Column:
    """Bing Maps quadkey of tile (x, y) at ``zoom`` (one base-4 digit per
    level, MSB first: digit = 2*y_bit + x_bit)."""
    if not 1 <= zoom <= 30:
        raise ValueError("quadkey zoom must be in [1, 30]")
    digits = F.array(F.lit("0"), F.lit("1"), F.lit("2"), F.lit("3"))
    xl = x.cast("long")
    yl = y.cast("long")
    chars = []
    for level in range(1, zoom + 1):
        shift = zoom - level
        d = (
            F.shiftright(yl, shift).bitwiseAND(F.lit(1).cast("long")) * F.lit(2).cast("long")
            + F.shiftright(xl, shift).bitwiseAND(F.lit(1).cast("long"))
        )
        chars.append(F.element_at(digits, (d + F.lit(1)).cast("int")))
    return F.concat(*chars)


def quadkey_encode_sql(zoom: int, x_sql: str, y_sql: str) -> str:
    """The DuckDB/ANSI twin of :func:`quadkey_encode`."""
    if not 1 <= zoom <= 30:
        raise ValueError("quadkey zoom must be in [1, 30]")
    chars = []
    for level in range(1, zoom + 1):
        shift = zoom - level
        d = (
            f"((CAST({y_sql} AS BIGINT) >> {shift}) & 1) * 2 + "
            f"((CAST({x_sql} AS BIGINT) >> {shift}) & 1)"
        )
        chars.append(f"substr('0123', CAST(({d}) + 1 AS INT), 1)")
    return "(" + " || ".join(chars) + ")"


def _gh_bit_terms(precision: int):
    """Shared bit layout for the geohash DECODE direction: yields
    (char_index, bit_in_char (0 = MSB of the 5), axis, weight) — the same
    alternating lon/lat walk :func:`geohash_encode` unrolls, inverted."""
    n_lon, n_lat = _gh_layout(precision)
    for pos in range(5 * precision):
        c, b = pos // 5, pos % 5
        if pos % 2 == 0:
            yield c, b, "lon", 1 << (n_lon - 1 - pos // 2)
        else:
            yield c, b, "lat", 1 << (n_lat - 1 - pos // 2)


def geohash_decode(gh: Column, precision: int) -> tuple[Column, Column]:
    """geohash string of exactly ``precision`` chars -> (lat, lon) of the
    CELL CENTER (PostGIS ST_PointFromGeoHash parity — PostGIS returns the
    cell-center point).  Inverse bit walk of :func:`geohash_encode`, same
    unrolled pure-expression shape: instr into the base32 alphabet, then
    shift/mask/multiply-add; the center strictly re-encodes to the same
    code, so encode(decode(g)) == g for every valid code."""
    n_lon, n_lat = _gh_layout(precision)
    vals = [
        (F.instr(F.lit(BASE32), F.substring(gh, c + 1, 1)).cast("long") - F.lit(1).cast("long"))
        for c in range(precision)
    ]
    ilon: Column = F.lit(0).cast("long")
    ilat: Column = F.lit(0).cast("long")
    for c, b, axis, weight in _gh_bit_terms(precision):
        bit = F.shiftright(vals[c], 4 - b).bitwiseAND(F.lit(1).cast("long"))
        term = bit * F.lit(weight).cast("long")
        if axis == "lon":
            ilon = ilon + term
        else:
            ilat = ilat + term
    lat = F.lit(-90.0) + (ilat.cast("double") + F.lit(0.5)) * F.lit(180.0 / (1 << n_lat))
    lon = F.lit(-180.0) + (ilon.cast("double") + F.lit(0.5)) * F.lit(360.0 / (1 << n_lon))
    return lat, lon


def geohash_decode_sql(gh_sql: str, precision: int) -> tuple[str, str]:
    """The DuckDB/ANSI twin of :func:`geohash_decode` — same bit walk,
    returns (lat_sql, lon_sql)."""
    n_lon, n_lat = _gh_layout(precision)

    def val(c: int) -> str:
        return f"(instr('{BASE32}', substr({gh_sql}, {c + 1}, 1)) - 1)"

    sums = {"lon": [], "lat": []}
    for c, b, axis, weight in _gh_bit_terms(precision):
        sums[axis].append(f"((({val(c)}) >> {4 - b}) & 1) * {weight}")
    ilon = " + ".join(sums["lon"])
    ilat = " + ".join(sums["lat"])
    # CAST the scale literal: bare decimal literals parse as DECIMAL in
    # DuckDB and the whole expression would drift into decimal arithmetic
    lat = f"(-90.0 + (({ilat}) + 0.5) * CAST({180.0 / (1 << n_lat)!r} AS DOUBLE))"
    lon = f"(-180.0 + (({ilon}) + 0.5) * CAST({360.0 / (1 << n_lon)!r} AS DOUBLE))"
    return lat, lon


def quadkey_decode(qk: Column, zoom: int) -> tuple[Column, Column]:
    """quadkey string of exactly ``zoom`` chars -> (x, y) tile coordinates
    (Bing Maps tile-system parity; inverse of :func:`quadkey_encode`).
    One ascii-and-mask term per level, pure codegen."""
    if not 1 <= zoom <= 30:
        raise ValueError("quadkey zoom must be in [1, 30]")
    x: Column = F.lit(0).cast("long")
    y: Column = F.lit(0).cast("long")
    for level in range(1, zoom + 1):
        shift = zoom - level
        d = (F.ascii(F.substring(qk, level, 1)) - F.lit(48)).cast("long")
        x = x + d.bitwiseAND(F.lit(1).cast("long")) * F.lit(1 << shift).cast("long")
        y = y + F.shiftright(d, 1).bitwiseAND(F.lit(1).cast("long")) * F.lit(1 << shift).cast("long")
    return x, y


def quadkey_decode_sql(qk_sql: str, zoom: int) -> tuple[str, str]:
    """The DuckDB/ANSI twin of :func:`quadkey_decode` — returns
    (x_sql, y_sql)."""
    if not 1 <= zoom <= 30:
        raise ValueError("quadkey zoom must be in [1, 30]")
    xs, ys = [], []
    for level in range(1, zoom + 1):
        shift = zoom - level
        d = f"(ascii(substr({qk_sql}, {level}, 1)) - 48)"
        xs.append(f"(({d}) & 1) * {1 << shift}")
        ys.append(f"((({d}) >> 1) & 1) * {1 << shift}")
    return "(" + " + ".join(xs) + ")", "(" + " + ".join(ys) + ")"
