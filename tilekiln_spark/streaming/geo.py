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


GEOFENCE_OUT_SCHEMA = "user_id long, fence_id long, ts timestamp, transition string"
GEOFENCE_STATE_SCHEMA = "inside boolean"


def _geofence_update(key, pdfs, state):
    """Per-(user, fence) transition detector: replay the micro-batch's
    rows in (ts, event_id) order against the checkpointed inside/outside
    flag; emit one row per flip.  State starts 'outside' (first inside
    event is an enter)."""
    import pandas as pd

    batches = list(pdfs)
    prev = bool(state.get[0]) if state.exists else False
    out_ts, out_tr = [], []
    if batches:
        pdf = pd.concat(batches, ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        for ts, inside in zip(pdf["ts"], pdf["inside"]):
            inside = bool(inside)
            if inside != prev:
                out_ts.append(ts)
                out_tr.append("enter" if inside else "exit")
                prev = inside
    state.update((prev,))
    u, fid = key
    yield pd.DataFrame(
        {
            "user_id": [int(u)] * len(out_ts),
            "fence_id": [int(fid)] * len(out_ts),
            "ts": out_ts,
            "transition": out_tr,
        }
    )


def stream_geofence(
    events: DataFrame,
    fences: DataFrame,
    ts_col: str = "ts",
    x_col: str = "mx",
    y_col: str = "my",
) -> DataFrame:
    """Geofence enter/exit detection over a streaming point-event frame —
    the live location-alerting primitive ("device crossed into zone").

    ``fences`` is a STATIC dim (fence_id, ring_xs, ring_ys); it broadcasts
    into a map-only cross join and containment is the SAME codegen
    even-odd raycast the batch joins use (operators/spatial_join.py
    pip_raycast) — concave fences included, no UDF on the hot path.  The
    transition itself is genuinely stateful (current flag vs last batch's),
    so it rides ``applyInPandasWithState`` keyed by (user_id, fence_id):
    state is ONE boolean per live (user, fence) pair, co-partitioned with
    the shuffle and independent of event volume; a restarted query resumes
    flags from the checkpoint (no duplicate enters).  Update mode; pair a
    foreachBatch append sink with it (the same shape as
    streaming/stateful.py run_expiry_counts).

    Ordering contract: rows are replayed in (ts, event_id) order WITHIN
    each micro-batch; cross-batch order is arrival order — the standard
    stateful-streaming contract (a watermark-sorted variant would trade
    latency for global order)."""
    from tilekiln_spark.operators.spatial_join import pip_raycast

    from pyspark.sql.streaming.state import GroupStateTimeout

    inside = pip_raycast(
        F.col(x_col), F.col(y_col), F.col("ring_xs"), F.col("ring_ys")
    )
    keyed = events.crossJoin(F.broadcast(fences)).select(
        "user_id",
        "fence_id",
        F.col(ts_col).alias("ts"),
        F.col("event_id"),
        inside.alias("inside"),
    )
    return keyed.groupBy("user_id", "fence_id").applyInPandasWithState(
        _geofence_update,
        outputStructType=GEOFENCE_OUT_SCHEMA,
        stateStructType=GEOFENCE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
