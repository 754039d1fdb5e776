"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct; the
Spark-side plumbing (schema, partition sizing, Arrow batch shape, UDF
signatures) is real and tested, while the actual codec work is stubbed —
the decode libs (PIL/ffmpeg) are not in this container.  Stubs are
deterministic fakes (clearly marked) so downstream operators are testable;
`decode_image(..., strict=True)` raises NotImplementedError instead.

Pattern: mapInPandas over an iterator of record batches — the canonical
shape for per-row binary work; batches keep peak memory ~ batch_size x
payload, and `maxRecordsPerBatch` bounds it independently of partition size.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int, codec:string>"
)


def synth_media(spark, n: int, kind: str = "image") -> DataFrame:
    """Deterministic fake media table: payload = seeded pseudo-bytes whose
    length/shape metadata are consistent, standing in for real blobs."""
    i = F.col("id")
    w = (i % 8 * 64 + 64).cast("int")
    h = (i % 5 * 64 + 64).cast("int")
    payload = F.encode(
        F.concat(F.lit(f"FAKE/{kind}/"), i.cast("string"), F.lit("/"),
                 F.repeat(F.lit("x"), (i % 100 + 1).cast("int"))),
        "utf-8",
    )
    return spark.range(n).select(
        i.alias("media_id"),
        F.lit(kind).alias("kind"),
        payload.alias("payload"),
        F.struct(
            w.alias("width"), h.alias("height"),
            F.lit(16000).alias("sample_rate"),
            (i % 30000).cast("int").alias("duration_ms"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )


def synth_png_media(spark, n: int) -> DataFrame:
    """REAL media table: deterministic solid-color PNG payloads built
    EXECUTOR-side (mapInPandas + functions/png.encode_png — the engine's
    pure-numpy codec) from media_id alone:

        w = id % 8 * 4 + 4,  h = id % 5 * 4 + 4,
        (r, g, b) = (37*id, 59*id, 83*id) % 256

    Every statistic of the decoded image is therefore a closed-form
    function of media_id, which is what lets the driver's DuckDB twin
    hash-check the REAL strict-mode codec path end-to-end (the fake-payload
    tables can only oracle the stub)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tilekiln_spark.functions.png import encode_png

        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                w = mid % 8 * 4 + 4
                h = mid % 5 * 4 + 4
                rgb = np.array(
                    [37 * mid % 256, 59 * mid % 256, 83 * mid % 256], dtype=np.uint8
                )
                rows.append(
                    (
                        mid, "image", encode_png(np.tile(rgb, (h, w, 1))),
                        {"width": w, "height": h, "sample_rate": 16000,
                         "duration_ms": 0, "codec": "png"},
                    )
                )
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


def synth_jpeg_media(spark, n: int) -> DataFrame:
    """REAL media table #2: deterministic solid-color baseline JPEG
    payloads built EXECUTOR-side (mapInPandas + functions/jpeg.encode_jpeg
    — the engine's pure-numpy baseline codec) from media_id alone:

        w = id % 6 * 8 + 8,  h = id % 4 * 8 + 8,
        (r, g, b) = (37*id, 59*id, 83*id) % 256

    JPEG is lossy, but for a SOLID color the whole encode+decode chain
    collapses to a closed form over (r, g, b): RGB -> YCbCr floats, DC =
    8*(v-128), quantize/dequantize by the Annex K table's [0] entry
    (floor(x+0.5) everywhere — the codec's single rounding op), IDCT of a
    DC-only block is constant, plane -> uint8, YCbCr -> RGB.  Every pixel
    of the decoded image is that one deterministic value, which is what
    lets the driver's DuckDB twin hash-check the REAL jpeg codec path
    end-to-end (media_decode_jpeg)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tilekiln_spark.functions.jpeg import encode_jpeg

        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                w = mid % 6 * 8 + 8
                h = mid % 4 * 8 + 8
                rgb = np.array(
                    [37 * mid % 256, 59 * mid % 256, 83 * mid % 256], dtype=np.uint8
                )
                rows.append(
                    (
                        mid, "image", encode_jpeg(np.tile(rgb, (h, w, 1))),
                        {"width": w, "height": h, "sample_rate": 16000,
                         "duration_ms": 0, "codec": "jpeg"},
                    )
                )
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


def _fake_pixels(payload: bytes, w: int, h: int) -> np.ndarray:
    """STUB: deterministic fake decoder. Real impl: PIL.Image.open(BytesIO)."""
    seed = np.frombuffer(payload[:8].ljust(8, b"\0"), dtype=np.uint64)[0]
    rng = np.random.default_rng(int(seed) % (2**63))
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def _fake_channel_stats(payload: bytes) -> tuple[float, float, float, float]:
    """STUB channel statistics: md5-derived, so the same numbers are
    reproducible from ANSI SQL (the driver's DuckDB oracle re-derives them
    with md5 + hex arithmetic).  Real impl: per-channel mean/std over the
    decoded pixel array (see _fake_pixels for that boundary)."""
    import hashlib

    h = hashlib.md5(payload).hexdigest()
    return (
        float(int(h[0:2], 16)),
        float(int(h[2:4], 16)),
        float(int(h[4:6], 16)),
        float(int(h[6:8], 16)) / 4.0,
    )


def _have_pil() -> bool:
    import importlib.util

    return importlib.util.find_spec("PIL") is not None


def _pil_channel_stats(payload: bytes) -> tuple[int, int, float, float, float, float]:
    """REAL codec path: decode the payload with PIL, return (width, height,
    mean_r, mean_g, mean_b, std-over-all-channels).  Only reachable when PIL
    is importable (gated by _have_pil in decode_image)."""
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload)).convert("RGB")
    arr = np.asarray(img, dtype=np.float64)
    means = arr.reshape(-1, 3).mean(axis=0)
    return (
        int(img.width), int(img.height),
        float(means[0]), float(means[1]), float(means[2]),
        float(arr.std()),
    )


def _numpy_jpeg_channel_stats(payload: bytes) -> tuple[int, int, float, float, float, float]:
    """REAL codec path #3: the engine's pure-numpy baseline JPEG decoder
    (functions/jpeg.py — public ITU-T T.81 spec), closing the r4 gap where
    the dominant crawl image format raised NotImplementedError."""
    from tilekiln_spark.functions.jpeg import decode_jpeg

    arr = decode_jpeg(payload).astype(np.float64)
    means = arr.reshape(-1, 3).mean(axis=0)
    h, w = arr.shape[0], arr.shape[1]
    return (int(w), int(h), float(means[0]), float(means[1]), float(means[2]), float(arr.std()))


def _numpy_png_channel_stats(payload: bytes) -> tuple[int, int, float, float, float, float]:
    """REAL codec path #2: the engine's pure-numpy PNG decoder
    (functions/png.py — public PNG spec; zlib is stdlib), so the real
    branch executes even in containers without PIL."""
    from tilekiln_spark.functions.png import decode_png

    arr = decode_png(payload).astype(np.float64)
    means = arr.reshape(-1, 3).mean(axis=0)
    h, w = arr.shape[0], arr.shape[1]
    return (int(w), int(h), float(means[0]), float(means[1]), float(means[2]), float(arr.std()))


def decode_image(df: DataFrame, strict: bool = False) -> DataFrame:
    """payload -> per-image feature row (mean/std per channel + dims).

    strict=False: deterministic stub stats (md5-derived — reproducible from
    the DuckDB oracle; synthetic payloads are not real images).
    strict=True: REQUIRE a real codec — PIL when importable on the
    executor; else the engine's pure-numpy PNG decoder for PNG payloads
    (functions/png.py); else raise NotImplementedError at exactly the
    boundary a production image lib plugs into."""

    out_schema = "media_id long, width int, height int, mean_r double, mean_g double, mean_b double, std double"

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        use_pil = strict and _have_pil()
        from tilekiln_spark.functions.jpeg import is_jpeg
        from tilekiln_spark.functions.png import is_png

        for pdf in batches:
            rows = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                if strict:
                    pb = bytes(payload)
                    if use_pil:
                        w, h, mean_r, mean_g, mean_b, std = _pil_channel_stats(pb)
                    elif is_png(pb):
                        w, h, mean_r, mean_g, mean_b, std = _numpy_png_channel_stats(pb)
                    elif is_jpeg(pb):
                        w, h, mean_r, mean_g, mean_b, std = _numpy_jpeg_channel_stats(pb)
                    else:
                        raise NotImplementedError(
                            "image codec not available for this payload format; "
                            "plug PIL/torchvision here (built-in real codecs "
                            "cover PNG and baseline JPEG)"
                        )
                else:
                    w, h = int(meta["width"]), int(meta["height"])
                    mean_r, mean_g, mean_b, std = _fake_channel_stats(bytes(payload))
                rows.append((int(mid), w, h, mean_r, mean_g, mean_b, std))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "mean_r", "mean_g", "mean_b", "std"]
            )

    return df.mapInPandas(decode, out_schema)


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video -> frame worklist (media_id, frame_idx, ts_ms): pure column math
    over metadata — the explode that precedes any real frame decode."""
    n_frames = (F.col("meta.duration_ms") / every_ms).cast("int")
    return df.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))).alias("frame_idx"),
    ).withColumn("ts_ms", F.col("frame_idx") * every_ms)


def resize_plan(df: DataFrame, target: int = 224) -> DataFrame:
    """Resize bookkeeping (scale factors, letterbox padding) as column math;
    the pixel resample itself belongs in decode_image's stub boundary."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(F.lit(target) / w, F.lit(target) / h)
    return df.select(
        "media_id", "kind",
        w.alias("width"), h.alias("height"),
        scale.alias("scale"),
        (F.lit(target) - F.round(w * scale)).cast("int").alias("pad_x"),
        (F.lit(target) - F.round(h * scale)).cast("int").alias("pad_y"),
    )
