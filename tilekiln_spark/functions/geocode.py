"""Geocoding: derive deterministic (lon, lat) from page metadata.

Replaces the reference's PostGIS `way` geometry column as the feature-location
source: Common-Crawl-style pages carry no geometry, so location is derived
from the URL (BASELINE north_star: "lat/lon derived from page metadata via
vectorized Arrow UDFs").

Two implementations with the same contract (lon in [-180, 180), lat within
web-mercator bounds [-85.0511..., 85.0511...]):

- ``geocode(url)`` — canonical: Arrow-batched pandas UDF; vectorized 64-bit
  string hashing (pandas' C siphash via pd.util.hash_array — no per-row
  Python).  Host hash fixes the coarse location (pages of one site cluster
  spatially — this is what makes dense-host skew *spatial* skew), full-url
  hash jitters within ±2 degrees.
- ``geocode_arith(id)`` — arithmetic geocode from a numeric id, expressible
  identically in ANSI SQL; used for DuckDB-oracle-checked queries.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

MERC_LAT = 85.05112877980659  # web-mercator latitude bound (reference sample/config.yaml bounds)

_GEO_SCHEMA = StructType(
    [StructField("lon", DoubleType()), StructField("lat", DoubleType())]
)


def _host_of(urls: pd.Series) -> pd.Series:
    # scheme://host/...  -> host ; vectorized string ops (C-level)
    return urls.str.split("/", n=3).str[2].fillna("")


@F.pandas_udf(_GEO_SCHEMA)
def geocode(url: pd.Series) -> pd.DataFrame:
    """url -> struct(lon, lat). Deterministic, vectorized, no per-row Python."""
    host = _host_of(url)
    h_host = pd.util.hash_array(host.to_numpy(dtype=object), categorize=False)
    h_url = pd.util.hash_array(url.to_numpy(dtype=object), categorize=False)
    # coarse site location from host hash
    lon0 = (h_host % np.uint64(360_000_000)).astype(np.float64) / 1e6 - 180.0
    lat0 = (h_host % np.uint64(160_000_000)).astype(np.float64) / 1e6 - 80.0
    # per-page jitter within +/- 2 deg lon, +/- 1 deg lat
    dlon = (h_url % np.uint64(4_000_000)).astype(np.float64) / 1e6 - 2.0
    dlat = ((h_url // np.uint64(4_000_000)) % np.uint64(2_000_000)).astype(
        np.float64
    ) / 1e6 - 1.0
    lon = np.mod(lon0 + dlon + 180.0, 360.0) - 180.0
    lat = np.clip(lat0 + dlat, -MERC_LAT, MERC_LAT)
    return pd.DataFrame({"lon": lon, "lat": lat})


def geocode_expr(url: Column) -> Column:
    """Expression-only geocode: struct(lon, lat) from xxhash64 of host/url —
    whole-stage codegen, no Python at all.  Same contract and the same
    host-clustering skew shape as the pandas-UDF `geocode` (different hash,
    so different coordinates — each is its own deterministic function).

    This is the production hot path; the Arrow UDF exists for the cases a
    custom geocoder genuinely needs Python (model inference, mmdb lookups)."""
    host = F.regexp_extract(url, r"^[a-z]+://([^/]+)", 1)
    h_host = F.abs(F.xxhash64(host))
    h_url = F.abs(F.xxhash64(url))
    lon0 = F.pmod(h_host, F.lit(360_000_000)).cast("double") / 1e6 - 180.0
    lat0 = F.pmod(h_host, F.lit(160_000_000)).cast("double") / 1e6 - 80.0
    dlon = F.pmod(h_url, F.lit(4_000_000)).cast("double") / 1e6 - 2.0
    dlat = F.pmod(F.floor(h_url / 4_000_000), F.lit(2_000_000)).cast("double") / 1e6 - 1.0
    lon = F.pmod(lon0 + dlon + 180.0, F.lit(360.0)) - 180.0
    lat = F.greatest(F.lit(-MERC_LAT), F.least(F.lit(MERC_LAT), lat0 + dlat))
    return F.struct(lon.alias("lon"), lat.alias("lat"))


def geocode_arith_lon(id_col: Column) -> Column:
    """Arithmetic lon from an integer id — identical formula in Spark and
    ANSI SQL (see GEOCODE_ARITH_SQL), so DuckDB can oracle-check tiling."""
    return (F.pmod(id_col * F.lit(2654435761), F.lit(360000000)).cast("double") / 1e6) - 180.0


def geocode_arith_lat(id_col: Column) -> Column:
    return (F.pmod(id_col * F.lit(2246822519), F.lit(160000000)).cast("double") / 1e6) - 80.0


# ANSI-SQL twins of the arithmetic geocode (DuckDB-compatible).
# NB: both engines compute exact int64 products for id*constant at our scales.
GEOCODE_ARITH_LON_SQL = "((({id} * 2654435761) % 360000000 + 360000000) % 360000000) / 1e6 - 180.0"
GEOCODE_ARITH_LAT_SQL = "((({id} * 2246822519) % 160000000 + 160000000) % 160000000) / 1e6 - 80.0"
