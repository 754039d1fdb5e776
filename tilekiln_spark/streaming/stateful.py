"""Custom stateful streaming operator: per-tile expiry accounting with
``applyInPandasWithState`` (SURVEY §2.C streaming; the arbitrary-stateful
shape foreachBatch can't express).

``expiry_counts_stream`` consumes a stream of expiry lines ('z/x/y'), keeps a
per-tile running total in GroupState, and emits the updated totals each
micro-batch.  The state lives in the checkpoint, so a restarted query resumes
its counts — the engine's "minutely diffs keep arriving; how hot is each
tile?" bookkeeping that decides re-render priority (the reference re-renders
every expired tile each batch; a stateful count lets a scheduler rank tiles
by churn instead).

At scale: state is partitioned by (zoom, x, y) — the same key space as the
tile table, so state shards co-locate with the shuffle and grow with the
number of DISTINCT expired tiles, not the expiry volume.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "zoom int, x int, y int, n_expiries long"
STATE_SCHEMA = "n long"


def _update(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n_new = sum(len(pdf) for pdf in pdfs)
    total = (state.get[0] if state.exists else 0) + n_new
    state.update((total,))
    z, x, y = key
    yield pd.DataFrame(
        {"zoom": [int(z)], "x": [int(x)], "y": [int(y)], "n_expiries": [total]}
    )


def expiry_counts_stream(lines: DataFrame) -> DataFrame:
    """text lines stream -> running per-tile expiry totals (update mode).

    Parses 'z/x/y' WITHOUT the worklist dedup — accounting counts every
    occurrence; dedup belongs to the regenerate path."""
    c = F.trim(F.col("value"))
    t = F.split(c, "/")
    wl = (
        lines.filter(c != "")
        .select(
            t[0].cast("int").alias("zoom"),
            t[1].cast("int").alias("x"),
            t[2].cast("int").alias("y"),
        )
        .filter(F.col("zoom").isNotNull() & F.col("x").isNotNull() & F.col("y").isNotNull())
    )
    return wl.groupBy("zoom", "x", "y").applyInPandasWithState(
        _update,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_expiry_counts(spark, expiry_dir: str, checkpoint_dir: str, out_dir: str):
    """readStream(text) -> stateful counts -> foreachBatch parquet append,
    availableNow (the file sink can't do update mode, and the memory sink
    can't recover a checkpoint — foreachBatch supports both).

    Call repeatedly as new expiry files land: each run drains pending files
    and RESUMES the per-tile totals from the checkpointed GroupState.  Read
    the running totals back with ``latest_expiry_counts``."""
    lines = spark.readStream.format("text").load(expiry_dir)
    counts = expiry_counts_stream(lines)

    def sink(batch_df: DataFrame, batch_id: int):
        batch_df.write.mode("append").parquet(out_dir)

    return (
        counts.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def latest_expiry_counts(spark, out_dir: str) -> DataFrame:
    """Latest running total per tile (totals are monotone, so max == last)."""
    df = spark.read.parquet(out_dir)
    return df.groupBy("zoom", "x", "y").agg(F.max("n_expiries").alias("n_expiries"))


CUSUM_OUT_SCHEMA = "key string, bucket long, cnt long, s long, alarm boolean"
CUSUM_STATE_SCHEMA = "last_bucket long, s long"


def make_cusum_update(k: int, h: int, bucket_s: int):
    """GroupState update fn for :func:`cusum_stream` — the streaming
    face of operators/events.cusum_alarms: state carries
    (last_bucket, s); each micro-batch buckets its rows, drains the
    statistic by ``k`` through unobserved gap buckets (state-only — a
    stream can't emit rows for buckets nothing arrived in), applies
    S = max(0, S + cnt - k) per observed bucket in bucket order, and
    emits (bucket, cnt, s, alarm).  Rows at or before last_bucket are
    LATE and dropped (the watermark contract); given in-order arrival
    the emitted (s, alarm) per observed bucket equal the batch
    operator's exactly — the parity pytest pins it."""

    def _upd(key, pdfs, state: GroupState):
        import numpy as np

        bs = []
        for pdf in pdfs:
            b = (pdf["us"].to_numpy() // (bucket_s * 1_000_000)).astype("int64")
            bs.append(b)
        if not bs:
            return
        allb = np.concatenate(bs)
        last_b, s = state.get if state.exists else (None, 0)
        uniq, cnts = np.unique(allb, return_counts=True)
        out_b, out_c, out_s, out_a = [], [], [], []
        for bucket, cnt in zip(uniq.tolist(), cnts.tolist()):
            if last_b is not None:
                if bucket <= last_b:
                    continue  # late data: behind the state frontier
                gap = bucket - last_b - 1
                s = max(0, s - k * gap)
            s = max(0, s + cnt - k)
            out_b.append(bucket)
            out_c.append(cnt)
            out_s.append(s)
            out_a.append(s >= h)
            last_b = bucket
        state.update((last_b if last_b is not None else -1, s))
        if out_b:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(out_b),
                    "bucket": out_b,
                    "cnt": out_c,
                    "s": out_s,
                    "alarm": out_a,
                }
            )

    return _upd


def cusum_stream(
    events: DataFrame, k: int = 3, h: int = 8, bucket_s: int = 3600
) -> DataFrame:
    """Streaming CUSUM change detection (update mode): per-key
    GroupState carries (frontier bucket, running S), so a restarted
    query RESUMES the statistic from the checkpoint — the monitoring
    face of the batch operator.  State is one row per key regardless
    of stream volume; shuffle keys match the batch groupBy."""
    src = events.select(
        F.col("event_type").alias("key"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    return src.groupBy("key").applyInPandasWithState(
        make_cusum_update(k, h, bucket_s),
        outputStructType=CUSUM_OUT_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
