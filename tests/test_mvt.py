"""MVT protobuf codec unit tests (SURVEY B3/B4; structural per FIXTURES.md §5)."""

import numpy as np

from tilekiln_spark.operators.mvt import (
    decode_points,
    decode_tile,
    empty_layer,
    encode_layer,
    varint_bytes,
    zigzag,
)


def test_varint_goldens():
    # protobuf wire-format goldens
    assert varint_bytes(np.array([0])) == b"\x00"
    assert varint_bytes(np.array([1])) == b"\x01"
    assert varint_bytes(np.array([127])) == b"\x7f"
    assert varint_bytes(np.array([128])) == b"\x80\x01"
    assert varint_bytes(np.array([300])) == b"\xac\x02"
    assert varint_bytes(np.array([2**63])) == bytes([0x80] * 9 + [1])
    assert varint_bytes(np.array([1, 300, 0])) == b"\x01\xac\x02\x00"
    assert varint_bytes(np.array([], dtype=np.uint64)) == b""


def test_zigzag_goldens():
    assert list(zigzag(np.array([0, -1, 1, -2, 2, 2147483647]))) == [
        0, 1, 2, 3, 4, 4294967294,
    ]


def test_layer_roundtrip():
    px = np.array([0, 100, 4095, -8])
    py = np.array([5, 200, 4095, 4104])
    blob = encode_layer(
        "water", 4096, px, py,
        {"water": ["ocean", None, "river", "ocean"], "osm_id": [None, 7, -3, None]},
    )
    (layer,) = decode_tile(blob)
    assert layer["name"] == "water"
    assert layer["extent"] == 4096
    assert layer["version"] == 2
    assert len(layer["features"]) == 4
    # geometry: single MoveTo per point, negative coords (buffer) survive zigzag
    assert decode_points(layer) == [(0, 5), (100, 200), (4095, 4095), (-8, 4104)]
    assert layer["keys"] == ["water", "osm_id"]
    # value table dedup: 'ocean' stored once (spec: values unique per layer)
    assert layer["values"].count("ocean") == 1
    # tags reference the dedup table; nulls produce no tag
    f0, f1 = layer["features"][0], layer["features"][1]
    assert f0["tags"] == [0, layer["values"].index("ocean")]
    assert f1["tags"] == [1, layer["values"].index(7)]
    assert all(f["type"] == 1 for f in layer["features"])


def test_empty_layer_contract():
    # ST_AsMVT over zero rows still yields one valid layer (kiln.py:40-43)
    (layer,) = decode_tile(empty_layer("admin", 2048))
    assert layer["name"] == "admin"
    assert layer["extent"] == 2048
    assert layer["features"] == []


def test_fast_encoder_structurally_equals_reference():
    """encode_layer_fast (vectorized scatter assembly) must decode to the
    same features/geometry/resolved properties as the reference encoder."""
    from tilekiln_spark.operators.mvt import encode_layer_fast

    rng = np.random.default_rng(7)

    def resolve(layer):
        out = []
        for f in layer["features"]:
            t = f["tags"]
            out.append(
                {layer["keys"][t[i]]: layer["values"][t[i + 1]] for i in range(0, len(t), 2)}
            )
        return out

    for n in (0, 1, 5, 300):
        px = rng.integers(-200, 5000, n)
        py = rng.integers(-200, 5000, n)
        props = {
            "s": [None if rng.random() < 0.3 else str(rng.choice(["a", "b"])) for _ in range(n)],
            "i": [None if rng.random() < 0.3 else int(rng.integers(-10, 10**11)) for _ in range(n)],
            "f": [None if rng.random() < 0.5 else float(rng.random()) for _ in range(n)],
            "b": [None if rng.random() < 0.5 else bool(rng.random() < 0.5) for _ in range(n)],
        }
        (slow,) = decode_tile(encode_layer("t", 2048, px, py, props))
        (fast,) = decode_tile(encode_layer_fast("t", 2048, px, py, props))
        assert slow["name"] == fast["name"] and slow["extent"] == fast["extent"]
        assert len(fast["features"]) == n
        assert decode_points(slow) == decode_points(fast)
        assert resolve(slow) == resolve(fast)


def test_value_types():
    blob = encode_layer(
        "t", 4096, np.array([1]), np.array([1]),
        {"s": ["x"], "i": [5], "neg": [-7], "f": [1.5], "b": [True]},
    )
    (layer,) = decode_tile(blob)
    vals = layer["values"]
    assert "x" in vals and 5 in vals and -7 in vals and 1.5 in vals and True in vals


def test_point_segments_kernel_matches_per_tile_encoder():
    """encode_point_layer_segments (whole-batch kernel) must decode to the
    same features as encode_layer_fast applied per segment with the same
    cap + (px, py, hash) ordering, and its bytes must not depend on which
    other segments share the batch."""
    import numpy as np
    import pandas as pd

    from tilekiln_spark.operators.mvt import (
        decode_tile,
        encode_layer_fast,
        encode_point_layer_segments,
    )

    def resolved(d):
        lay = d[0]
        feats = []
        for f in lay["features"]:
            props = {
                lay["keys"][f["tags"][i]]: lay["values"][f["tags"][i + 1]]
                for i in range(0, len(f["tags"]), 2)
            }
            feats.append(
                (f["type"], tuple(f["geometry"]),
                 tuple(sorted((k, str(v)) for k, v in props.items())))
            )
        return feats, lay["name"], lay["extent"]

    rng = np.random.default_rng(7)
    sizes = list(rng.integers(1, 30, 20)) + [150]  # incl. one over-cap segment
    cap = 64
    seg_starts, seg_ends, pos = [], [], 0
    for sz in sizes:
        seg_starts.append(pos)
        seg_ends.append(pos + sz)
        pos += sz
    n = pos
    px = rng.integers(0, 4096, n)
    py = rng.integers(0, 4096, n)
    fh = rng.integers(-2**62, 2**62, n)
    osm = rng.integers(0, 10, n).astype(np.int64)
    nm = np.array(
        [None if v == 0 else f"nm{v}" for v in rng.integers(0, 4, n)], dtype=object
    )
    nt = np.full(n, np.nan)
    blobs, n_tot = encode_point_layer_segments(
        "water", np.full(len(sizes), 4096, dtype=np.int64),
        np.array(seg_starts), np.array(seg_ends),
        px, py, fh, {"osm_id": osm, "water": nm}, nt, cap,
    )
    assert list(n_tot) == sizes  # reported n_features = true pre-cap count
    for si, (s, e) in enumerate(zip(seg_starts, seg_ends)):
        spx, spy, sfh = px[s:e], py[s:e], fh[s:e]
        pxy = ((spx + (1 << 21)) << np.int64(22)) | (spy + (1 << 21))
        base = np.arange(e - s)
        if e - s > cap:
            sel = np.lexsort((pxy, sfh))[:cap]
            sfh, pxy, base = sfh[sel], pxy[sel], base[sel]
        idx = base[np.lexsort((sfh, pxy))]
        ref = encode_layer_fast(
            "water", 4096, spx[idx], spy[idx],
            {"osm_id": pd.Series(osm[s:e][idx]), "water": pd.Series(nm[s:e][idx])},
        )
        assert resolved(decode_tile(blobs[si])) == resolved(decode_tile(ref))
        # BYTE-identical across paths (value tables sorted by value in both):
        # mixing render paths on one store must never trip the byte-equality
        # 'unchanged' check of the timestamp-preserving MERGE
        assert blobs[si] == ref
        # batch invariance: encoding the segment alone gives identical bytes
        alone, _ = encode_point_layer_segments(
            "water", np.array([4096]), np.array([0]), np.array([e - s]),
            px[s:e], py[s:e], fh[s:e],
            {"osm_id": osm[s:e], "water": nm[s:e]}, nt[s:e], cap,
        )
        assert alone[0] == blobs[si]


def test_clip_batch_kernels_match_scalar():
    """clip_rings_batch / clip_lines_batch must be bit-identical per
    ring/line to the scalar clip_ring / clip_line reference paths."""
    import numpy as np

    from tilekiln_spark.operators.mvt import (
        clip_line,
        clip_lines_batch,
        clip_ring,
        clip_rings_batch,
    )

    rng = np.random.default_rng(11)
    rings = []
    for _ in range(200):
        n = int(rng.integers(3, 40))
        # mix of fully-inside, fully-outside and straddling rings
        c = rng.uniform(-3000, 7000, 2)
        r = 10 ** rng.uniform(0.5, 3.5)
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        rings.append((c[0] + r * np.cos(ang), c[1] + r * np.sin(ang)))
    lo, hi = -64.0, 4160.0
    flat_x = np.concatenate([r[0] for r in rings])
    flat_y = np.concatenate([r[1] for r in rings])
    lens = np.array([len(r[0]) for r in rings], dtype=np.int64)
    bx, by, blens = clip_rings_batch(flat_x, flat_y, lens, lo, hi)
    starts = np.concatenate([[0], np.cumsum(blens)[:-1]])
    for i, (xs, ys) in enumerate(rings):
        sx, sy = clip_ring(xs, ys, lo, hi)
        s, e = starts[i], starts[i] + blens[i]
        assert len(sx) == blens[i]
        assert np.array_equal(sx, bx[s:e]) and np.array_equal(sy, by[s:e])

    px, py, plens, pline = clip_lines_batch(flat_x, flat_y, lens, lo, hi)
    pstarts = np.concatenate([[0], np.cumsum(plens)[:-1]])
    cursor = 0
    for i, (xs, ys) in enumerate(rings):
        parts = clip_line(xs, ys, lo, hi)
        mine = np.flatnonzero(pline == i)
        assert len(parts) == len(mine)
        for k, (sx, sy) in zip(mine, parts):
            s, e = pstarts[k], pstarts[k] + plens[k]
            assert np.array_equal(sx, px[s:e]) and np.array_equal(sy, py[s:e])
        cursor += len(parts)


def test_geom_commands_batch_matches_scalar():
    import numpy as np

    from tilekiln_spark.operators.mvt import (
        GEOM_LINESTRING,
        GEOM_POLYGON,
        geom_commands,
        geom_commands_batch,
    )

    rng = np.random.default_rng(5)
    # features with 1-3 parts each, already clipped/rounded/deduped
    feats = []
    for _ in range(50):
        parts = []
        for _ in range(int(rng.integers(1, 4))):
            n = int(rng.integers(3, 12))
            parts.append((rng.integers(0, 4096, n), rng.integers(0, 4096, n)))
        feats.append(parts)
    for gt in (GEOM_POLYGON, GEOM_LINESTRING):
        flat_x = np.concatenate([p[0] for f in feats for p in f]).astype(np.int64)
        flat_y = np.concatenate([p[1] for f in feats for p in f]).astype(np.int64)
        part_lens = np.array([len(p[0]) for f in feats for p in f], dtype=np.int64)
        part_feat = np.array(
            [fi for fi, f in enumerate(feats) for _ in f], dtype=np.int64
        )
        vals, flens, fids = geom_commands_batch(flat_x, flat_y, part_lens, part_feat, gt)
        split = np.split(vals, np.cumsum(flens)[:-1])
        assert list(fids) == list(range(len(feats)))
        for fi, parts in enumerate(feats):
            ref = geom_commands(
                [(p[0].astype(np.int64), p[1].astype(np.int64)) for p in parts], gt
            )
            assert np.array_equal(ref, split[fi]), f"feature {fi} gt {gt}"


def test_polygon_holes_and_multipolygon_roundtrip():
    """Interior rings encode CCW after their CW exterior (MVT 2.1
    §4.3.3.3); multipolygons carry multiple exterior parts in one feature;
    holes of a clipped-away exterior drop with it."""
    import numpy as np

    from tilekiln_spark.operators.mvt import (
        GEOM_POLYGON,
        decode_geom,
        decode_tile,
        encode_geom_layer_segments,
    )

    def ring(x0, y0, x1, y1, ccw=False):
        xs = np.array([x0, x1, x1, x0], dtype=np.float64)
        ys = np.array([y0, y0, y1, y1], dtype=np.float64)
        return (xs[::-1], ys[::-1]) if ccw else (xs, ys)

    def area2(r):
        x = np.array([p[0] for p in r[:-1]]); y = np.array([p[1] for p in r[:-1]])
        return np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)

    # feature 0: square with a hole; feature 1: multipolygon (2 parts, one
    # with a hole); feature 2: exterior fully outside the clip box, its
    # hole must vanish with it
    f0 = ([ring(100, 100, 900, 900), ring(300, 300, 500, 500)], [False, True])
    f1 = (
        [ring(1000, 1000, 1500, 1500), ring(2000, 2000, 2500, 2500),
         ring(2100, 2100, 2300, 2300)],
        [False, False, True],
    )
    f2 = ([ring(9000, 9000, 9500, 9500), ring(9100, 9100, 9200, 9200)], [False, True])
    rows = [f0, f1, f2]
    rx = np.array([[r[0] for r in f[0]] for f in rows], dtype=object)
    ry = np.array([[r[1] for r in f[0]] for f in rows], dtype=object)
    rh = np.array([f[1] for f in rows], dtype=object)
    blobs, nfeat = encode_geom_layer_segments(
        "poly", np.array([4096]), np.array([-64.0]), np.array([4160.0]),
        np.array([0]), np.array([3]),
        px=np.array([100, 1000, 9000], dtype=np.int64),
        py=np.array([100, 1000, 9000], dtype=np.int64),
        fh=np.array([1, 2, 3], dtype=np.int64),
        rings_xs=rx, rings_ys=ry, rings_hole=rh,
        props={"pid": np.array([10, 11, 12], dtype=np.int64)},
        cap=None, geom_type=GEOM_POLYGON,
    )
    assert nfeat[0] == 2  # feature 2 clipped away entirely
    (layer,) = decode_tile(blobs[0])
    assert len(layer["features"]) == 2
    ringsets = [decode_geom(f) for f in layer["features"]]
    # feature 0: exterior CW (positive area in y-down coords) + hole CCW
    r0 = ringsets[0]
    assert len(r0) == 2
    assert area2(r0[0]) > 0 and area2(r0[1]) < 0
    # feature 1 (multipolygon): two exteriors + one hole, in order
    r1 = ringsets[1]
    assert len(r1) == 3
    assert area2(r1[0]) > 0 and area2(r1[1]) > 0 and area2(r1[2]) < 0
