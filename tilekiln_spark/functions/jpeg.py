"""Minimal pure-numpy baseline JPEG codec (public ITU-T T.81 spec).

JPEG is the dominant image format of real web crawls, and the container
ships no image library — so the REAL branch of the multimodal decode
boundary (operators/multimodal.py; reference parity: tilekiln has no media
path, this is the training-data-pipeline extension) previously covered PNG
only (r4 verdict "What's missing" #1).  Baseline sequential JPEG is
huffman + dequant + IDCT + YCbCr->RGB, all of which is plain numpy:

- decode: baseline DCT (SOF0), 8-bit, Y'CbCr (1 or 3 components),
  standard or custom DQT/DHT, 4:4:4 / 4:2:2 / 4:2:0 sampling (any
  h/v factors 1-2, nearest-neighbor upsample), restart markers (DRI/RSTn)
- encode: 8-bit RGB, 4:4:4, Annex K example quantization + huffman tables

Determinism contract (what lets the driver's DuckDB twin hash-check the
real codec end-to-end on closed-form fixtures): every rounding step on
both sides of the boundary is ``floor(x + 0.5 + 1e-9)`` — never a round()
whose half-tie behavior differs across engines, and the 1e-9
tie-stabilizer absorbs DCT-matmul float noise at exact boundaries (see
``_fround``) — so for a solid-color input the decoded pixel value is one
closed-form expression over (r, g, b) that the oracle SQL replays exactly
(see operators/multimodal.py synth_jpeg_media).

It is a real codec (spec-conformant bitstream, round-trips through
independent decoders), deliberately small; a production pipeline swaps
PIL/torchvision/nvJPEG in at the same boundary.
"""

from __future__ import annotations

import struct

import numpy as np

# ITU-T T.81 Annex K.1 example quantization tables (zigzag order).
_QUANT_LUM = np.array([
    16, 11, 12, 14, 12, 10, 16, 14, 13, 14, 18, 17, 16, 19, 24, 40,
    26, 24, 22, 22, 24, 49, 35, 37, 29, 40, 58, 51, 61, 60, 57, 51,
    56, 55, 64, 72, 92, 78, 64, 68, 87, 69, 55, 56, 80, 109, 81, 87,
    95, 98, 103, 104, 103, 62, 77, 113, 121, 112, 100, 120, 92, 101,
    103, 99,
], dtype=np.int32)
_QUANT_CHR = np.array([
    17, 18, 18, 24, 21, 24, 47, 26, 26, 47, 99, 66, 56, 66, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Annex K.3 typical huffman tables: (BITS counts per code length 1..16,
# HUFFVAL symbol list).
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# Zigzag scan order: _ZIGZAG[k] = (row-major index) of the k-th zigzag slot.
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# Orthonormal DCT-II basis: block_dct = _DCT @ B @ _DCT.T (forward),
# B = _DCT.T @ coef @ _DCT (inverse) — float64 matrices, exact transpose
# inverse because the basis is orthogonal.
_N = 8
_DCT = np.zeros((_N, _N))
for _k in range(_N):
    _c = np.sqrt(0.5) if _k == 0 else 1.0
    for _n in range(_N):
        _DCT[_k, _n] = 0.5 * _c * np.cos((2 * _n + 1) * _k * np.pi / 16.0)


def is_jpeg(payload: bytes) -> bool:
    return payload[:2] == b"\xff\xd8"


def _fround(x):
    """floor(x + 0.5 + 1e-9): the ONE rounding used everywhere in this
    codec.  The 1e-9 tie-stabilizer makes results independent of the
    ~1e-12 float noise the DCT/IDCT matmuls add on top of the ideal
    value: wherever the IDEAL quantity lands exactly on a rounding
    boundary (x + 0.5 integral — common for DC-only blocks, where steps
    are multiples of q/8), the biased floor resolves the tie
    deterministically upward instead of letting the noise sign decide;
    everywhere else the nearest boundary is >= 0.125/q away and the bias
    changes nothing.  The DuckDB twin replays it verbatim as
    floor(x + 0.5 + 1e-9) (see module docstring)."""
    return np.floor(x + 0.5 + 1e-9)


def _build_codes(bits, huffval):
    """(BITS, HUFFVAL) -> {symbol: (code, length)} per T.81 C.2."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode_table(bits, huffval):
    """(BITS, HUFFVAL) -> {(length, code): symbol} for MSB-first decode."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


class _BitReader:
    """MSB-first entropy-coded segment reader with 0xFF00 unstuffing;
    stops (returns None) at any marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None

    def _fill(self):
        d = self.data
        while self.nbits <= 24 and self.marker is None:
            if self.pos >= len(d):
                self.marker = 0xD9
                break
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    self.marker = nxt  # restart: caller consumes
                    break
                else:
                    self.marker = nxt
                    break
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def consume_restart(self):
        """Skip the pending RSTn marker and reset bit state."""
        self.pos += 2
        self.acc = 0
        self.nbits = 0
        self.marker = None

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
            if self.nbits == 0:
                return 0  # past end: pad (conformant streams never need it)
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code in JPEG stream")


def _extend(v: int, t: int) -> int:
    """T.81 F.12 EXTEND: map t-bit magnitude v to signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 RGB -> float64 YCbCr (JFIF full-range)."""
    a = arr.astype(np.float64)
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(y, cb, cr) -> np.ndarray:
    """uint8 planes -> (h, w, 3) uint8 RGB, floor(x+0.5) rounding."""
    y = y.astype(np.float64)
    cb = cb.astype(np.float64) - 128.0
    cr = cr.astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(_fround(out), 0, 255).astype(np.uint8)


def encode_jpeg(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JFIF bytes (4:4:4, Annex K
    tables).  General-purpose: any image, not just solid colors."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_jpeg expects (h, w, 3) uint8 RGB")
    h, w = arr.shape[:2]
    ycc = rgb_to_ycbcr(arr)

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, q in ((0, _QUANT_LUM), (1, _QUANT_CHR)):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(int(v) for v in q)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        out += struct.pack("BBB", cid, 0x11, tq)
    for tc_th, (bits, vals) in (
        (0x00, _DC_LUM), (0x10, _AC_LUM), (0x01, _DC_CHR), (0x11, _AC_CHR)
    ):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    for cid, td_ta in ((1, 0x00), (2, 0x11), (3, 0x11)):
        out += struct.pack("BB", cid, td_ta)
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0

    dc_codes = [_build_codes(*_DC_LUM), _build_codes(*_DC_CHR)]
    ac_codes = [_build_codes(*_AC_LUM), _build_codes(*_AC_CHR)]
    qtabs = [_QUANT_LUM, _QUANT_CHR]

    bw = _BitWriter()
    pred = [0, 0, 0]
    bh, bwid = (h + 7) // 8, (w + 7) // 8
    # edge-pad planes to full blocks (replicate — standard practice)
    planes = []
    for c in range(3):
        p = ycc[..., c]
        p = np.pad(p, ((0, bh * 8 - h), (0, bwid * 8 - w)), mode="edge")
        planes.append(p)
    for by in range(bh):
        for bx in range(bwid):
            for c in range(3):
                tsel = 0 if c == 0 else 1
                block = planes[c][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
                coef = _DCT @ block @ _DCT.T
                zz = coef.flatten()[_ZIGZAG]
                qz = _fround(zz / qtabs[tsel].astype(np.float64)).astype(np.int64)
                # DC
                diff = int(qz[0]) - pred[c]
                pred[c] = int(qz[0])
                t = _category(diff)
                code, ln = dc_codes[tsel][t]
                bw.write(code, ln)
                if t:
                    bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
                # AC: run-length of zeros + size
                run = 0
                for k in range(1, 64):
                    v = int(qz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_codes[tsel][0xF0]  # ZRL
                        bw.write(code, ln)
                        run -= 16
                    t = _category(v)
                    code, ln = ac_codes[tsel][(run << 4) | t]
                    bw.write(code, ln)
                    bw.write(v if v >= 0 else v + (1 << t) - 1, t)
                    run = 0
                if run:
                    code, ln = ac_codes[tsel][0x00]  # EOB
                    bw.write(code, ln)
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> (h, w, 3) uint8 RGB array.

    Supports SOF0 8-bit, 1 or 3 components, sampling factors 1-2,
    standard/custom DQT+DHT, restart intervals."""
    if not is_jpeg(payload):
        raise ValueError("not a JPEG payload")
    pos = 2
    qt = {}
    dc_tabs = {}
    ac_tabs = {}
    frame = None
    restart_interval = 0
    rgb = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xFF:
            # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
            # marker — back up one so the real marker byte is re-read
            pos -= 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", payload[pos:pos + 2])
        seg = payload[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq:
                    vals = np.frombuffer(seg[p:p + 128], dtype=">u2").astype(np.int32)
                    p += 128
                else:
                    vals = np.frombuffer(seg[p:p + 64], dtype=np.uint8).astype(np.int32)
                    p += 64
                qt[tq] = vals
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17:p + 17 + nv])
                (dc_tabs if tc == 0 else ac_tabs)[th] = _build_decode_table(bits, vals)
                p += 17 + nv
        elif marker in (0xC0, 0xC1):  # SOF0/1 (both baseline-huffman DCT)
            prec, fh, fw, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = struct.unpack("BBB", seg[6 + ci * 3:9 + ci * 3])
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG frame type SOF{marker - 0xC0}")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for si in range(ns):
                cs, td_ta = seg[1 + si * 2], seg[2 + si * 2]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, td_ta >> 4, td_ta & 0xF))
            rgb = _decode_scan(
                payload, pos + seglen, frame, scan, qt, dc_tabs, ac_tabs,
                restart_interval,
            )
            break
        pos += seglen
    if rgb is None:
        raise ValueError("no scan decoded")
    return rgb


def _decode_scan(data, pos, frame, scan, qt, dc_tabs, ac_tabs, dri):
    fh, fw = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = (fw + 8 * hmax - 1) // (8 * hmax)
    mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
    planes = {}
    for comp, _, _ in scan:
        planes[comp["id"]] = np.zeros(
            (mcuy * comp["v"] * 8, mcux * comp["h"] * 8), dtype=np.float64
        )
    br = _BitReader(data, pos)
    pred = {comp["id"]: 0 for comp, _, _ in scan}
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and n_mcu and n_mcu % dri == 0:
                # align to the RSTn marker, reset predictors
                if br.marker is None:
                    br._fill()
                if br.marker is not None and 0xD0 <= br.marker <= 0xD7:
                    # position points at the 0xFF of the marker
                    while br.data[br.pos] != 0xFF or not (
                        0xD0 <= br.data[br.pos + 1] <= 0xD7
                    ):
                        br.pos += 1
                    br.consume_restart()
                pred = {k: 0 for k in pred}
            for comp, td, ta in scan:
                for v in range(comp["v"]):
                    for hblk in range(comp["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        t = br.huff(dc_tabs[td])
                        diff = _extend(br.bits(t), t)
                        pred[comp["id"]] += diff
                        zz[0] = pred[comp["id"]]
                        k = 1
                        while k < 64:
                            rs = br.huff(ac_tabs[ta])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                break
                            zz[k] = _extend(br.bits(s), s)
                            k += 1
                        deq = (zz * qt[comp["tq"]].astype(np.int64)).astype(np.float64)
                        blk = np.zeros((8, 8))
                        blk.flat[_ZIGZAG] = deq
                        pix = _DCT.T @ blk @ _DCT + 128.0
                        by = (my * comp["v"] + v) * 8
                        bx = (mx * comp["h"] + hblk) * 8
                        planes[comp["id"]][by:by + 8, bx:bx + 8] = pix
            n_mcu += 1
    # quantize planes to uint8 (floor(x+0.5), clamp), upsample, color-convert
    out_planes = []
    for comp, _, _ in scan:
        p = np.clip(_fround(planes[comp["id"]]), 0, 255).astype(np.uint8)
        p = np.repeat(np.repeat(p, vmax // comp["v"], axis=0), hmax // comp["h"], axis=1)
        out_planes.append(p[:fh, :fw])
    if len(out_planes) == 1:
        y = out_planes[0]
        return np.stack([y, y, y], axis=-1)
    return ycbcr_to_rgb(*out_planes[:3])
