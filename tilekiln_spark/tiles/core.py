"""Tile addressing kernel: PMTiles Hilbert tileid codec + web-mercator envelope math.

Pure numpy/python — no Spark dependency — so it can run driver-side, inside
pandas UDFs, and in unit tests identically.

Semantics re-implemented from public knowledge (the PMTiles spec's Hilbert
tile addressing and the standard Hilbert curve d<->(x,y) transform) to match
the reference engine's observable behavior:

- tileid goldens: (0,0,0)->0, (1,0,0)->1, (2,0,0)->5, (2,1,0)->6
  (reference tests/test_tile.py:28-36)
- zoom-1 Hilbert iteration order (0,0),(0,1),(1,1),(1,0)
  (reference tests/test_tilerange.py:19-24)
- envelope math: HALF_WORLD = 20037508.34, tile_length = HALF_WORLD/2^(z-1)
  (reference tilekiln/definition.py:12,80-83; goldens tests/test_definition.py:141-150)
"""

from __future__ import annotations

import numpy as np

# Web-mercator invariant, exactly as the reference spells it
# (reference tilekiln/definition.py:12).
HALF_WORLD = 20037508.34

# Max zoom the codec supports (PMTiles addressing is defined for z<=31;
# int64 tileids overflow past that).
MAX_ZOOM = 30

# Cumulative tile counts: _ZOOM_OFFSET[z] = number of tiles at zooms < z
# = (4^z - 1) / 3.  _ZOOM_OFFSET[MAX_ZOOM+1] caps the id space.
_ZOOM_OFFSET = np.array([(4**z - 1) // 3 for z in range(MAX_ZOOM + 2)], dtype=np.int64)


# ---------------------------------------------------------------------------
# Scalar Hilbert codec (reference for tests; the vectorized forms below are
# what runs inside pandas UDFs)
# ---------------------------------------------------------------------------

def _hilbert_xy_to_d(zoom: int, x: int, y: int) -> int:
    """(x, y) -> distance along the Hilbert curve of order `zoom`."""
    d = 0
    s = 1 << (zoom - 1) if zoom > 0 else 0
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s >>= 1
    return d


def _hilbert_d_to_xy(zoom: int, d: int) -> tuple[int, int]:
    """Distance along the Hilbert curve of order `zoom` -> (x, y)."""
    x = y = 0
    t = d
    s = 1
    n = 1 << zoom
    while s < n:
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        x += s * rx
        y += s * ry
        t //= 4
        s *= 2
    return x, y


def zxy_to_tileid(zoom: int, x: int, y: int) -> int:
    """PMTiles tileid: tiles of all lower zooms first, Hilbert order within zoom."""
    if zoom < 0 or zoom > MAX_ZOOM:
        raise ValueError(f"zoom {zoom} outside [0, {MAX_ZOOM}]")
    n = 1 << zoom
    if not (0 <= x < n and 0 <= y < n):
        raise ValueError(f"tile ({zoom},{x},{y}) out of range")
    return int(_ZOOM_OFFSET[zoom]) + _hilbert_xy_to_d(zoom, x, y)


def tileid_to_zxy(tileid: int) -> tuple[int, int, int]:
    if tileid < 0 or tileid >= int(_ZOOM_OFFSET[MAX_ZOOM + 1]):
        raise ValueError(f"tileid {tileid} out of range")
    zoom = int(np.searchsorted(_ZOOM_OFFSET, tileid, side="right")) - 1
    x, y = _hilbert_d_to_xy(zoom, tileid - int(_ZOOM_OFFSET[zoom]))
    return zoom, x, y


# ---------------------------------------------------------------------------
# Vectorized codec (numpy; used by the pandas UDFs in functions/tileids.py)
# ---------------------------------------------------------------------------

def zxy_to_tileid_np(zoom: np.ndarray, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Vectorized zxy -> tileid. All inputs int64 arrays of equal length."""
    zoom = np.asarray(zoom, dtype=np.int64)
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    d = np.zeros_like(x)
    # Iterate bit planes from the top; rows whose zoom is smaller than the
    # current bit plane are masked out (their s would be 0 already).
    max_z = int(zoom.max()) if zoom.size else 0
    for bit in range(max_z - 1, -1, -1):
        s = np.where(zoom > bit, np.int64(1) << bit, np.int64(0))
        active = s > 0
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate where ry == 0
        rot = active & (ry == 0)
        flip = rot & (rx == 1)
        x = np.where(flip, s - 1 - x, x)
        y = np.where(flip, s - 1 - y, y)
        xs, ys = x.copy(), y.copy()
        x = np.where(rot, ys, x)
        y = np.where(rot, xs, y)
    return _ZOOM_OFFSET[zoom] + d


def tileid_to_zxy_np(tileid: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized tileid -> (zoom, x, y)."""
    tileid = np.asarray(tileid, dtype=np.int64)
    zoom = np.searchsorted(_ZOOM_OFFSET, tileid, side="right").astype(np.int64) - 1
    t = tileid - _ZOOM_OFFSET[zoom]
    x = np.zeros_like(t)
    y = np.zeros_like(t)
    max_z = int(zoom.max()) if zoom.size else 0
    for bit in range(max_z):
        s = np.int64(1) << bit
        active = zoom > bit
        rx = 1 & (t >> 1)
        ry = 1 & (t ^ rx)
        rot = active & (ry == 0)
        flip = rot & (rx == 1)
        x = np.where(flip, s - 1 - x, x)
        y = np.where(flip, s - 1 - y, y)
        xs, ys = x.copy(), y.copy()
        x = np.where(rot, ys, x)
        y = np.where(rot, xs, y)
        x = np.where(active, x + s * rx, x)
        y = np.where(active, y + s * ry, y)
        t = np.where(active, t >> 2, t)
    return zoom, x, y


# ---------------------------------------------------------------------------
# Tile / Tilerange objects (API parity with the reference data model,
# reference tilekiln/tile.py:4-54, tilekiln/tilerange.py:4-17)
# ---------------------------------------------------------------------------

class Tile:
    __slots__ = ("tileid",)

    def __init__(self, zoom: int, x: int, y: int):
        self.tileid = zxy_to_tileid(zoom, x, y)

    def __eq__(self, other):
        return isinstance(other, self.__class__) and self.tileid == other.tileid

    def __hash__(self):
        return self.tileid

    @property
    def zxy(self) -> tuple[int, int, int]:
        return tileid_to_zxy(self.tileid)

    @property
    def zoom(self) -> int:
        return self.zxy[0]

    @property
    def x(self) -> int:
        return self.zxy[1]

    @property
    def y(self) -> int:
        return self.zxy[2]

    def __repr__(self) -> str:
        return f"Tile({self.zoom},{self.x},{self.y})"

    @classmethod
    def from_string(cls, tile: str) -> "Tile":
        try:
            fragments = tile.split("/")
            if len(fragments) != 3:
                raise ValueError(f"Unable to parse tile from: {tile}")
            return cls(int(fragments[0]), int(fragments[1]), int(fragments[2]))
        except (ValueError, IndexError):
            raise ValueError(f"Unable to parse tile from: {tile}") from None

    @classmethod
    def from_tileid(cls, tileid: int) -> "Tile":
        zoom, x, y = tileid_to_zxy(tileid)
        return cls(zoom, x, y)

    def envelope(self, margin: float = 0.0) -> tuple[float, float, float, float]:
        """Web-mercator bbox (xmin, ymin, xmax, ymax), margin = fraction of tile width.

        Arithmetic equivalent of ST_TileEnvelope(z, x, y, margin=>f)
        (reference tilekiln/tile.py:52-54)."""
        z, x, y = self.zxy
        length = tile_length(z)
        m = margin * length
        xmin = -HALF_WORLD + x * length
        ymax = HALF_WORLD - y * length
        return (xmin - m, ymax - length - m, xmin + length + m, ymax + m)


class Tilerange:
    """Lazy sequence of all tileids for zooms [minz, maxz], Hilbert order
    (reference tilekiln/tilerange.py:4-17).  len() works at z30 without
    materialization; Spark-side use spark.range(minid, maxid)."""

    def __init__(self, minz: int, maxz: int):
        self.minid = zxy_to_tileid(minz, 0, 0)
        self.maxid = zxy_to_tileid(maxz + 1, 0, 0) if maxz < MAX_ZOOM else int(_ZOOM_OFFSET[MAX_ZOOM + 1])

    def __iter__(self):
        for tid in range(self.minid, self.maxid):
            yield Tile.from_tileid(tid)

    def __len__(self) -> int:
        return self.maxid - self.minid

    def __contains__(self, value):
        raise NotImplementedError


def layer_frominput(input: str) -> dict[Tile, set[str]]:
    """Parse 'z/x/y,layer' lines into {Tile: {layers}} (reference tile.py:57-74)."""
    layers: dict[Tile, set[str]] = {}
    for line in input.split("\n"):
        if line.strip() == "":
            continue
        try:
            tiletext, layer = line.split(",")
        except ValueError:
            raise ValueError(f"Unable to parse layer from: {line}") from None
        tile = Tile.from_string(tiletext)
        layers.setdefault(tile, set()).add(layer)
    return layers


# ---------------------------------------------------------------------------
# Envelope / web-mercator math (reference tilekiln/definition.py:57-83)
# ---------------------------------------------------------------------------

def tile_length(zoom: int) -> float:
    """Tile side length in projected units (reference definition.py:80-83)."""
    return HALF_WORLD / (2 ** (zoom - 1))


def tile_area(zoom: int) -> float:
    return tile_length(zoom) ** 2


def coordinate_length(zoom: int, extent: int) -> float:
    return tile_length(zoom) / extent


def coordinate_area(zoom: int, extent: int) -> float:
    return coordinate_length(zoom, extent) ** 2
