"""Event-stream operators: sessionization over web-log-shaped tables.

Session assignment (split a user's event stream wherever the gap between
consecutive events exceeds a timeout) is the standard first step of web-log
feature extraction.  ``sessionize`` uses Spark's native
``F.session_window`` — the SAME aggregate works unchanged in a Structured
Streaming query (with a watermark), where state merges windows per key as
late events arrive; in batch it compiles to one partial-aggregated groupBy
on (key, merged-window), so the only shuffle is keyed by user and the
map-side combine collapses each scan partition's events first.

Scale: state/shuffle is keyed by user_id — uniform unless one synthetic
user dominates; a bot whale-key is exactly what AQE skew-split handles.
The session END reported here is ``max(ts)`` (last event), not Spark's
internal window end (last event + gap): the gap-extension is an
implementation detail of window merging, while last-activity is the value
downstream features want and the one every engine agrees on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """One row per (key, session): session_start = first event ts,
    session_end = last event ts, n_events, sum_value.

    Works identically as a streaming aggregation: add
    ``.withWatermark(ts_col, horizon)`` upstream and the same plan merges
    session state across micro-batches."""
    sw = F.session_window(F.col(ts_col), gap)
    return (
        events.groupBy(F.col(key_col), sw.alias("w"))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(key_col, "session_start", "session_end", "n_events", "sum_value")
    )
