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
    # localCheckpoint, not persist (r6, ADVICE leak fix): the blocks back
    # both passes exactly like a persist, but they are reclaimed by the
    # ContextCleaner as soon as the caller drops the returned frame —
    # repeated invocations no longer accumulate pinned cache entries for
    # the life of the session (the packing.py pattern).
    d = (
        df.repartitionByRange(n_parts, *[c.asc() for c in cols])
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
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



def positional_values(df: DataFrame, col: str, rank_fn, buckets: int = 4096,
                      collect_cap: int = 200_000, max_levels: int = 16):
    """EXACT values at given 0-based positions of the sorted multiset
    ``df[col]`` — with NO exchange of the multiset at all (r6; guide §2.4
    "remove shuffles outright"): where the two-pass rank pays a full range
    shuffle plus a per-partition sort to rank EVERY row, a positional
    SELECTION only needs the k-th values, so histogram bisection finds
    them with map-side-combinable aggregates alone:

    1. one (count, min, max) aggregate sizes the multiset;
    2. per level, one histogram aggregate (``buckets`` fixed-width bins —
       the groupBy key has <= ``buckets`` distinct values, so the exchange
       carries <= buckets*P tiny rows and partial aggregation collapses
       everything map-side) locates the bin holding each target rank;
       bins refine recursively until a target bin holds <= ``collect_cap``
       values (one level almost always suffices: ~m/buckets rows land in
       a uniform bin);
    3. the target bin's values collect (bounded by construction) and one
       local numpy sort reads the exact positions.

    Bin membership at every level is decided by the SAME floor expression
    used to build that level's histogram (conjunction of bucket-equality
    predicates), so refinement filters are exact — no float-boundary
    drift.  Equal-value mass that cannot shrink short-circuits via the
    bin's own min == max (the per-bucket min/max ride the histogram
    aggregate for free).  ``rank_fn(m)`` maps the total count to the list
    of 0-based target ranks, so callers can ask for median positions
    without a separate count job.

    Returns ``(values, m)`` — values in rank_fn(m) order.  The multiset
    frame is persisted for the (few) aggregate passes and unpersisted
    before returning."""
    import numpy as np

    v = F.col("__v")
    d = df.select(F.col(col).alias("__v")).filter(v.isNotNull()).persist()
    try:
        row = d.agg(
            F.count("*").alias("m"), F.min("__v").alias("lo"), F.max("__v").alias("hi")
        ).collect()[0]
        m = int(row["m"])
        if m == 0:
            return [], 0
        ranks = [int(r) for r in rank_fn(m)]
        if not ranks:
            return [], m

        def _collect_sorted(pred) -> np.ndarray:
            return np.sort(np.array(
                [x["__v"] for x in d.filter(pred).select("__v").collect()],
                dtype=np.float64,
            ))

        def _solve(pred, offset: int, count: int, lo: float, hi: float,
                   targets: list[int]) -> dict[int, float]:
            """Resolve ``targets`` (ascending global ranks, all inside the
            multiset selected by ``pred`` = [offset, offset+count))."""
            out: dict[int, float] = {}
            for _ in range(max_levels):
                if not targets:
                    return out
                if lo == hi:
                    for r in targets:
                        out[r] = lo
                    return out
                if count <= collect_cap:
                    vals = _collect_sorted(pred)
                    for r in targets:
                        out[r] = float(vals[r - offset])
                    return out
                width = hi - lo
                bexpr = F.greatest(F.lit(0), F.least(
                    F.lit(buckets - 1),
                    F.floor((v - F.lit(lo)) / F.lit(width) * F.lit(buckets))
                    .cast("int"),
                ))
                hist = {
                    h["__b"]: (h["c"], h["bmin"], h["bmax"])
                    for h in d.filter(pred)
                    .groupBy(bexpr.alias("__b"))
                    .agg(F.count("*").alias("c"), F.min("__v").alias("bmin"),
                         F.max("__v").alias("bmax"))
                    .collect()
                }
                # walk bins in order; peel off every target as its bin is found
                acc = offset
                remaining = list(targets)
                hold: list[int] = []  # targets of the bin we recurse into
                chosen = None  # (b, count, bmin, bmax, acc_before)
                for b in range(buckets):
                    c, bmin, bmax = hist.get(b, (0, None, None))
                    if c == 0:
                        continue
                    in_b = [r for r in remaining if acc <= r < acc + c]
                    if in_b:
                        if bmin == bmax:
                            for r in in_b:
                                out[r] = bmin
                        elif chosen is None:
                            chosen = (b, c, bmin, bmax, acc)
                            hold = in_b
                        else:
                            # a further bin also holds targets: resolve it
                            # with its own descent (depth bounded by the
                            # target count — <= 2 for medians)
                            out.update(_solve(
                                pred & (bexpr == F.lit(int(b))),
                                acc, c, bmin, bmax, in_b,
                            ))
                        remaining = [r for r in remaining if r not in in_b]
                    acc += c
                    if not remaining:
                        break
                if chosen is None:
                    return out
                b, count, lo, hi, offset = (
                    chosen[0], chosen[1], chosen[2], chosen[3], chosen[4]
                )
                pred = pred & (bexpr == F.lit(int(b)))
                targets = hold
            raise RuntimeError("positional_values: refinement did not converge")

        lo, hi = float(row["lo"]), float(row["hi"])
        solved = _solve(F.lit(True), 0, m, lo, hi, sorted(set(ranks)))
        return [solved[r] for r in ranks], m
    finally:
        d.unpersist()
