"""Multimodal plumbing: schema, batch shape, stub boundary."""

import pytest

from tilekiln_spark.operators.multimodal import (
    decode_image,
    frame_sample,
    resize_plan,
    synth_media,
)


def test_synth_media_schema(spark):
    m = synth_media(spark, 50)
    types = {f.name: f.dataType.simpleString() for f in m.schema.fields}
    assert types["payload"] == "binary"
    assert types["meta"].startswith("struct<width:int,height:int")
    assert m.count() == 50
    # deterministic
    assert m.collect() == synth_media(spark, 50).collect()


def test_decode_image_features(spark):
    out = decode_image(synth_media(spark, 30)).collect()
    assert len(out) == 30
    for r in out:
        assert 0 <= r.mean_r <= 255 and 0 <= r.std <= 255
        assert r.width > 0 and r.height > 0
    # deterministic fake decode
    again = decode_image(synth_media(spark, 30)).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_decode_image_strict_real_codec(spark):
    """strict=True runs a REAL codec in THIS container: PIL when importable,
    else the engine's pure-numpy PNG decoder (functions/png.py).  Known
    images decode to exact channel means either way."""
    import numpy as np

    from tilekiln_spark.functions.png import encode_png

    def solid(rgb, w, h):
        return encode_png(np.tile(np.array(rgb, dtype=np.uint8), (h, w, 1)))

    # a non-constant image too: gradient + checkerboard mix
    grad = np.zeros((6, 9, 3), dtype=np.uint8)
    grad[:, :, 0] = np.arange(9)[None, :] * 20
    grad[:, :, 1] = np.arange(6)[:, None] * 30
    grad[:, :, 2] = 7
    meta = (0, 0, 16000, 0, "png")  # dims come from the codec, not metadata
    rows = [
        (0, "image", solid((255, 0, 0), 8, 4), meta),
        (1, "image", solid((0, 128, 64), 5, 7), meta),
        (2, "image", encode_png(grad), meta),
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary, "
        "meta struct<width:int, height:int, sample_rate:int, duration_ms:int, codec:string>")
    out = {r.media_id: r for r in decode_image(df, strict=True).collect()}
    assert (out[0].width, out[0].height) == (8, 4)
    assert (out[0].mean_r, out[0].mean_g, out[0].mean_b) == (255.0, 0.0, 0.0)
    assert (out[1].mean_r, out[1].mean_g, out[1].mean_b) == (0.0, 128.0, 64.0)
    assert (out[2].width, out[2].height) == (9, 6)
    g = grad.astype(np.float64)
    assert out[2].mean_r == pytest.approx(g[:, :, 0].mean())
    assert out[2].mean_g == pytest.approx(g[:, :, 1].mean())
    assert out[2].mean_b == pytest.approx(7.0)
    assert out[2].std == pytest.approx(g.std())


def test_decode_image_strict_unknown_format_raises(spark):
    """Non-PNG payloads with no PIL still fail AT the codec boundary."""
    from tilekiln_spark.operators.multimodal import _have_pil

    if _have_pil():
        pytest.skip("PIL present: every format routes to the real lib")
    with pytest.raises(Exception) as ei:
        decode_image(synth_media(spark, 5), strict=True).collect()
    assert "NotImplementedError" in str(ei.value) or "codec" in str(ei.value)


def test_frame_sample(spark):
    m = synth_media(spark, 40, kind="video")
    frames = frame_sample(m, every_ms=1000)
    rows = frames.collect()
    # every media yields >= 1 frame; ts = idx * 1000
    ids = {r.media_id for r in rows}
    assert len(ids) == 40
    for r in rows:
        assert r.ts_ms == r.frame_idx * 1000


def test_resize_plan(spark):
    plans = resize_plan(synth_media(spark, 20), target=224).collect()
    for r in plans:
        long_side = max(r.width, r.height)
        assert r.scale == pytest.approx(224 / long_side)
        assert r.pad_x >= 0 and r.pad_y >= 0
        assert min(r.pad_x, r.pad_y) == 0  # long side fills the target


def test_png_codec_roundtrip_and_filters():
    """Pure-numpy PNG codec: encode->decode round-trip, plus decode of
    externally-filtered scanlines (Sub/Up/Average/Paeth) and grey/RGBA."""
    import struct
    import zlib

    import numpy as np

    from tilekiln_spark.functions.png import decode_png, encode_png, is_png

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (23, 17, 3), dtype=np.uint8)
    blob = encode_png(img)
    assert is_png(blob) and not is_png(b"JFIF....")
    assert np.array_equal(decode_png(blob), img)

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(
            ">I", zlib.crc32(t + d) & 0xFFFFFFFF
        )

    def make_png(arr, ftype, color_type=2):
        h, w = arr.shape[:2]
        nch = 1 if arr.ndim == 2 else arr.shape[2]
        flat = arr.reshape(h, w * nch).astype(np.int32)
        rows = []
        prev = np.zeros(w * nch, dtype=np.int32)
        for y in range(h):
            cur = flat[y]
            left = np.concatenate([np.zeros(nch, np.int32), cur[:-nch]])
            upleft = np.concatenate([np.zeros(nch, np.int32), prev[:-nch]])
            if ftype == 0:
                filt = cur
            elif ftype == 1:
                filt = (cur - left) & 0xFF
            elif ftype == 2:
                filt = (cur - prev) & 0xFF
            elif ftype == 3:
                filt = (cur - ((left + prev) >> 1)) & 0xFF
            else:
                p = left + prev - upleft
                pa, pb, pc = abs(p - left), abs(p - prev), abs(p - upleft)
                pred = np.where((pa <= pb) & (pa <= pc), left,
                                np.where(pb <= pc, prev, upleft))
                filt = (cur - pred) & 0xFF
            rows.append(bytes([ftype]) + bytes(filt.astype(np.uint8)))
            prev = cur
        idat = zlib.compress(b"".join(rows))
        return (b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
                + chunk(b"IDAT", idat) + chunk(b"IEND", b""))

    for f in range(5):
        assert np.array_equal(decode_png(make_png(img, f)), img), f"filter {f}"

    grey = rng.integers(0, 256, (9, 11), dtype=np.uint8)
    out = decode_png(make_png(grey, 0, color_type=0))
    assert np.array_equal(out, np.repeat(grey[:, :, None], 3, axis=2))

    rgba = rng.integers(0, 256, (5, 6, 4), dtype=np.uint8)
    out = decode_png(make_png(rgba, 4, color_type=6))
    assert np.array_equal(out, rgba[:, :, :3])
