"""Minimal pure-numpy PNG codec (public PNG spec, RFC 2083).

The container ships no image library, so the REAL branch of the multimodal
decode boundary (operators/multimodal.py, reference parity: tilekiln has no
media path — this is the training-data-pipeline extension) would otherwise
be unreachable.  zlib IS stdlib, and PNG's scanline model is plain numpy:
this module implements enough of the spec to round-trip real images —

- decode: 8-bit greyscale (color type 0), RGB (2) and RGBA (6),
  non-interlaced, ALL five scanline filters (None/Sub/Up/Average/Paeth)
- encode: 8-bit RGB, filter 0 scanlines, one IDAT

It is a real codec (byte-exact against the spec), deliberately small; a
production pipeline swaps PIL/torchvision in at the same boundary.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 6: 4}


def is_png(payload: bytes) -> bool:
    return payload[:8] == _MAGIC


def _chunks(payload: bytes):
    pos = 8
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        yield ctype, data
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8 RGB array (grey/alpha normalized)."""
    if not is_png(payload):
        raise ValueError("not a PNG payload")
    width = height = None
    bit_depth = color_type = None
    idat = bytearray()
    for ctype, data in _chunks(payload):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if bit_depth != 8 or color_type not in _CHANNELS:
                raise ValueError(
                    f"unsupported PNG: bit_depth={bit_depth} color_type={color_type}"
                )
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
        elif ctype == b"IDAT":
            idat.extend(data)
    if width is None:
        raise ValueError("PNG missing IHDR")
    nch = _CHANNELS[color_type]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = width * nch
    raw = raw.reshape(height, stride + 1)
    filters = raw[:, 0]
    data = raw[:, 1:].copy()
    # unfilter scanline by scanline (row-sequential by spec); Sub is a
    # per-channel prefix sum (whole-row cumsum), Up is a whole-row add,
    # Average/Paeth iterate per PIXEL with nch-vector ops (the left
    # dependency is genuinely sequential along x)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        row = data[y]
        f = filters[y]
        if f == 1:  # Sub: recon = cumsum(filt) mod 256 per channel
            filt = row.reshape(width, nch).astype(np.int64)
            row = (np.cumsum(filt, axis=0) & 0xFF).astype(np.uint8).reshape(stride)
            data[y] = row
        elif f == 2:  # Up
            data[y] = row = (row.astype(np.int32) + prev).astype(np.uint8)
        elif f == 3:  # Average
            filt = row.reshape(width, nch).astype(np.int32)
            prevp = prev.reshape(width, nch).astype(np.int32)
            rec = np.zeros((width, nch), dtype=np.int32)
            left = np.zeros(nch, dtype=np.int32)
            for i in range(width):
                left = (filt[i] + ((left + prevp[i]) >> 1)) & 0xFF
                rec[i] = left
            data[y] = row = rec.astype(np.uint8).reshape(stride)
        elif f == 4:  # Paeth
            filt = row.reshape(width, nch).astype(np.int32)
            prevp = prev.reshape(width, nch).astype(np.int32)
            rec = np.zeros((width, nch), dtype=np.int32)
            left = np.zeros(nch, dtype=np.int32)
            upleft = np.zeros(nch, dtype=np.int32)
            for i in range(width):
                up = prevp[i]
                p = left + up - upleft
                pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
                )
                left = (filt[i] + pred) & 0xFF
                rec[i] = left
                upleft = up
            data[y] = row = rec.astype(np.uint8).reshape(stride)
        prev = row
    px = data.reshape(height, width, nch)
    if nch == 1:
        return np.repeat(px, 3, axis=2)
    if nch == 4:
        return px[:, :, :3].copy()
    return px


def encode_png(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB array -> PNG bytes (filter-0 scanlines)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_png expects (h, w, 3) uint8")
    h, w, _ = a.shape
    scan = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), a.reshape(h, w * 3)], axis=1
    )
    idat = zlib.compress(scan.tobytes())

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    )
