"""Streaming geospatial rollups: event-time windowed hex density.

The serving story for a live tile dashboard (the reference's `serve live`
renders from continuously-updated tables — reference
tilekiln/scripts/serve.py; here the updating aggregate itself is the
engine's job): a point-event stream rolls up into per-(time window, hex
cell) counts with watermarked late-data handling.

Spark-first shape: ``hexbin_qr`` is the SAME codegen expression the batch
query uses (functions/geometry.py), so the streaming plan is scan ->
map-side binning -> windowed stateful aggregate; state is bounded by the
watermark horizon, and append mode emits each (window, cell) row exactly
once when its window finalizes — the contract a downstream tile store's
MERGE wants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_hexbin(
    events: DataFrame,
    size: float,
    window_dur: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    x_col: str = "mx",
    y_col: str = "my",
) -> DataFrame:
    """Windowed hex-density aggregate over a streaming point-event frame.

    Returns [win_start, q, r, n_events]; append-mode semantics — a row is
    emitted once, when the watermark passes its window end.  Events later
    than ``watermark`` behind the max seen event time are dropped by the
    engine (the documented late-data contract)."""
    from tilekiln_spark.functions.geometry import hexbin_qr

    q, r = hexbin_qr(F.col(x_col), F.col(y_col), size)
    return (
        events.withWatermark(ts_col, watermark)
        .select(F.col(ts_col), q.alias("q"), r.alias("r"))
        .groupBy(F.window(ts_col, window_dur), "q", "r")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("window.start").alias("win_start"), "q", "r", "n_events"
        )
    )
