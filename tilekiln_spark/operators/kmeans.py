"""ST_ClusterKMeans (PostGIS window-function parity, re-expressed as a
distributed Lloyd iteration — the reference's templates may call any
PostGIS function over feature tables,
reference tilekiln/definition.py:42-77).

Determinism protocol (cross-engine AND cross-partitioning):

- seeds: the k points with the smallest keys (PostGIS seeds are
  implementation-defined; a key-ordered seed is reproducible),
- assignment: argmin over centroids with ties broken by min centroid id —
  an array_min over (d², cid) structs, lexicographic,
- update: centroids are ROUNDED to 3 decimals before the next assignment
  round, so the float sum-order drift of a distributed mean (ulp-scale)
  can never flip an assignment between engines,
- empty clusters keep their previous centroid.

Scale shape: each round is ONE map-only assignment pass (centroids are
k literals folded into the expression — no join) plus ONE partial-agg
groupBy; only k rows ever reach the driver per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kmeans_2d(
    points: DataFrame,
    k: int = 4,
    iters: int = 3,
    key_col: str = "doc_id",
    x_col: str = "mx",
    y_col: str = "my",
) -> DataFrame:
    """Per-cluster rollup after ``iters`` Lloyd rounds:
    [cid, n_points, cx, cy] (cx/cy = rounded member means)."""
    pts = points.select(key_col, F.col(x_col).alias("px"), F.col(y_col).alias("py"))
    seed_rows = pts.orderBy(key_col).limit(k).collect()
    cents = [(i, float(r.px), float(r.py)) for i, r in enumerate(seed_rows)]

    def assign(cs):
        arr = F.array(
            *[
                F.struct(
                    (
                        (F.col("px") - F.lit(cx)) * (F.col("px") - F.lit(cx))
                        + (F.col("py") - F.lit(cy)) * (F.col("py") - F.lit(cy))
                    ).alias("d2"),
                    F.lit(cid).alias("cid"),
                )
                for cid, cx, cy in cs
            ]
        )
        return pts.withColumn("cid", F.array_min(arr)["cid"])

    assigned = assign(cents)
    for _ in range(max(0, iters - 1)):
        upd = {
            r.cid: (r.cx, r.cy)
            for r in assigned.groupBy("cid")
            .agg(
                F.round(F.avg("px"), 3).alias("cx"),
                F.round(F.avg("py"), 3).alias("cy"),
            )
            .collect()
        }
        cents = [
            (cid, *upd.get(cid, (cx, cy)))  # empty cluster keeps its centroid
            for cid, cx, cy in cents
        ]
        assigned = assign(cents)

    return assigned.groupBy("cid").agg(
        F.count("*").alias("n_points"),
        F.round(F.avg("px"), 3).alias("cx"),
        F.round(F.avg("py"), 3).alias("cy"),
    )
