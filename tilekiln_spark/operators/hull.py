"""ST_ConvexHull over point groups (PostGIS parity — the reference's
templates may call any PostGIS function over the feature tables,
reference tilekiln/definition.py:42-77).

Spark-first shape — the hull is an associative-combinable aggregate:
``Hull(S) = Hull(Hull(S_1) ∪ ... ∪ Hull(S_k))``, so stage 1 computes a
PARTIAL hull per (input partition, group) with mapInPandas (map-only, no
shuffle — the hull analogue of a map-side combine: each partition ships
only its O(√n expected) hull vertices), and stage 2 computes the exact
final hull per group after the one groupBy shuffle.  A skewed group costs
its partial-hull sizes, never its raw row count.

Kernel: Andrew's monotone chain with STRICT turns (collinear interior
vertices dropped) over lexicographically sorted unique points — general
position assumed (exact-duplicate points are deduped; exactly-collinear
triples are measure-zero for float coordinate sources).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, StructField, StructType


def hull_np(xs: np.ndarray, ys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Monotone-chain convex hull; returns hull vertices in CCW order
    starting at the lexicographically smallest point.  Inputs need not be
    sorted or unique.  Degenerate inputs (n <= 2 after dedupe) return the
    unique points themselves."""
    pts = np.unique(np.column_stack([np.asarray(xs, float), np.asarray(ys, float)]),
                    axis=0)
    n = len(pts)
    if n <= 2:
        return pts[:, 0], pts[:, 1]

    def chain(seq: np.ndarray) -> list:
        h: list = []
        for p in seq:
            while len(h) >= 2 and (
                (h[-1][0] - h[-2][0]) * (p[1] - h[-2][1])
                - (h[-1][1] - h[-2][1]) * (p[0] - h[-2][0])
            ) <= 0.0:
                h.pop()
            h.append(p)
        return h

    lower = chain(pts)
    upper = chain(pts[::-1])
    hull = np.array(lower[:-1] + upper[:-1])
    return hull[:, 0], hull[:, 1]


def convex_hull(
    df: DataFrame, group_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Exact convex hull per group: (group, x, y) rows -> one row per hull
    VERTEX (group, x, y).  Two-level plan (see module docstring)."""
    gf = df.schema[group_col]
    out_schema = StructType(
        [gf, StructField(x_col, DoubleType()), StructField(y_col, DoubleType())]
    )

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for g, grp in pdf.groupby(group_col, sort=False, dropna=False):
                hx, hy = hull_np(grp[x_col].values, grp[y_col].values)
                outs.append(pd.DataFrame({group_col: g, x_col: hx, y_col: hy}))
            yield (
                pd.concat(outs, ignore_index=True)
                if outs
                else pd.DataFrame({f.name: [] for f in out_schema.fields})
            )

    def final(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        hx, hy = hull_np(pdf[x_col].values, pdf[y_col].values)
        return pd.DataFrame({group_col: key[0], x_col: hx, y_col: hy})

    pre = df.select(group_col, x_col, y_col).mapInPandas(partial, schema=out_schema)
    return pre.groupBy(group_col).applyInPandas(final, schema=out_schema)
