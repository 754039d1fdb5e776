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


def test_decode_image_strict(spark):
    """strict=True runs the REAL codec when PIL is importable, else raises
    at the codec boundary (this container has no image libs)."""
    from tilekiln_spark.operators.multimodal import _have_pil

    if not _have_pil():
        with pytest.raises(Exception) as ei:
            decode_image(synth_media(spark, 5), strict=True).collect()
        assert "NotImplementedError" in str(ei.value) or "codec" in str(ei.value)
        return
    # real path: encode known solid-color PNGs, expect exact channel means
    import io

    from PIL import Image

    from pyspark.sql import functions as F

    def png(rgb, w, h):
        buf = io.BytesIO()
        Image.new("RGB", (w, h), rgb).save(buf, format="PNG")
        return buf.getvalue()

    rows = [
        (0, "image", png((255, 0, 0), 8, 4), (8, 4, 16000, 0, "png")),
        (1, "image", png((0, 128, 64), 5, 7), (5, 7, 16000, 0, "png")),
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary, "
        "meta struct<width:int, height:int, sample_rate:int, duration_ms:int, codec:string>")
    out = {r.media_id: r for r in decode_image(df, strict=True).collect()}
    assert (out[0].width, out[0].height) == (8, 4)
    assert (out[0].mean_r, out[0].mean_g, out[0].mean_b) == (255.0, 0.0, 0.0)
    assert (out[1].mean_r, out[1].mean_g, out[1].mean_b) == (0.0, 128.0, 64.0)


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
