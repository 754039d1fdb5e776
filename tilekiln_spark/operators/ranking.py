"""Two-pass distributed global rank — the house pattern for exact
positional computations (medians, positional shard splits, global prefix
ranks) WITHOUT the SinglePartition sort a global ``Window.orderBy``
compiles to (the accidental-serialization trap packing.py documents).

Pass 1: ``repartitionByRange`` on the order columns (ascending key ranges
land on ascending partition ids) and collect ONE count per partition — P
longs on the driver.  Pass 2: ``row_number`` WITHIN each partition (the
window is keyed on the partition id, so no SinglePartition exchange
anywhere) plus the broadcast partition offset gives the exact 0-based
global rank.

Ties: row_number among equal keys is arbitrary, but any positional
selection over the sorted MULTISET (median value, shard boundary count)
is deterministic; add a unique tiebreak column to ``order_cols`` when
row-level determinism is required.

Shared by functions/text.py ``_positional_median``, operators/sampling.py
``hilbert_balanced_shards`` (r5 review: previously three hand-rolled
copies of this machinery counting packing.py's prefix-sum variant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def two_pass_global_rank(
    df: DataFrame,
    order_cols: list,
    rank_col: str = "__rank",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Add an exact 0-based global ``rank_col`` over ``order_cols``
    (ascending).  Returns ``(ranked_df, total_rows)``; the input is
    persisted across the two passes and the driver holds P longs."""
    spark = df.sparkSession
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    d = (
        df.repartitionByRange(n_parts, *[c.asc() for c in cols])
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    counts = {
        r["__pid"]: r["c"]
        for r in d.groupBy("__pid").agg(F.count("*").alias("c")).collect()
    }
    total = sum(counts.values())
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    off = F.broadcast(
        spark.createDataFrame(offsets or [(0, 0)], "__pid int, __off long")
    )
    w = Window.partitionBy("__pid").orderBy(*[c.asc() for c in cols])
    return (
        d.join(off, "__pid")
        .withColumn(rank_col, F.col("__off") + F.row_number().over(w) - 1)
        .drop("__pid", "__off"),
        total,
    )
