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
