"""Distributed linear-probe quality classifier over embedding columns.

The production pattern behind FineWeb-Edu / DCLM-style quality filters: a
frozen encoder produces the embedding column, and the FILTER is a linear
head (logistic regression) trained on a small labelled slice, then scored
over the whole corpus.  The reference engine (tilekiln) has no learned
component; this operator family exists for the training-data pipeline
tier, like dedup/similarity/selection.

Training is full-batch gradient descent with a FIXED iteration count and
an explicit cross-engine rounding contract, so the whole fit — not just
the scores — is reproducible in any engine (the DuckDB driver oracle
replays every iteration as a chained CTE, like the PageRank twin):

  per iteration t (weights w_t are round-6 decimal literals):
    z_i   = sum_j w_t[j] * x_ij + w_t[dim]          (float64)
    z9    = round(z_i, 9)      -- kills sum-order ulp drift across engines
    s9    = round(sigmoid(z9), 9)   -- kills libm exp() last-ulp drift
    grad_j = round(sum_i (s9 - y_i) * x_ij / N, 6)
    w_t+1[j] = round(w_t[j] - lr * grad_j, 6)       -- exact decimal literal

Scale shape (10^12-doc corpus):
- every iteration is ONE corpus scan + ONE exchange keyed on the dimension
  index (dim+1 keys; the partial aggregate collapses each map partition to
  dim+1 rows before the shuffle — the exchange moves P*(dim+1) rows total);
- weights travel to executors as literal arrays in the plan (dim+1 doubles
  — the degenerate broadcast), never a driver-side closure of data;
- the driver sees dim+1 gradient rows per iteration and nothing else;
- the iteration count is FIXED (hyperparameter), so unlike PageRank there
  is no growing lineage: each iteration builds a fresh plan from the
  source scan with new literals — no checkpointing needed.

Scoring is a pure map-only projection (fold + sigmoid), so it rides any
corpus-materialization pass at no extra shuffle — same contract as
text.quality gates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _fold_dot(vec: Column, weights: list[float]) -> Column:
    """z = left-fold_j (w_j * x_j) + bias, in dimension order (float64).

    The last weight is the bias.  A literal-array zip_with/aggregate —
    JVM-side, codegen-friendly, and the SAME fold order as the DuckDB
    twin's ordered list_sum, so both engines land within 1e-15 and the
    round-9 in `_sigmoid9` makes them equal."""
    dim = len(weights) - 1
    warr = F.array(*[F.lit(float(w)) for w in weights[:dim]])
    acc = F.aggregate(
        F.zip_with(vec, warr, lambda x, w: x * w),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    return acc + F.lit(float(weights[dim]))


def _sigmoid9(z: Column) -> Column:
    z9 = F.round(z, 9)
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z9)), 9)


def train_linear_probe(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "y",
    dim: int = 64,
    iters: int = 3,
    lr: float = 1.0,
) -> list[float]:
    """Fit the logistic head; returns dim+1 round-6 weights (last = bias).

    ``label_col`` must be 0.0/1.0 (cast upstream).  Deterministic given
    (data, dim, iters, lr) and independent of partition layout: every
    cross-engine-visible intermediate is rounded per the module contract.
    """
    first = df.select(
        F.count("*").alias("n"),
        F.min(F.size(vec_col)).alias("lo"),
        F.max(F.size(vec_col)).alias("hi"),
    ).collect()[0]
    n = float(first["n"])
    if n == 0:
        raise ValueError("train_linear_probe: empty training frame")
    if first["lo"] != dim or first["hi"] != dim:
        # fail BEFORE burning iterations: a dim mismatch otherwise surfaces
        # as null gradients (data narrower than dim pads the fold with
        # nulls) or missing positions (wider), both opaque
        raise ValueError(
            f"train_linear_probe: dim={dim} but {vec_col} widths span "
            f"[{first['lo']}, {first['hi']}]"
        )
    w = [0.0] * (dim + 1)
    for _ in range(iters):
        s = _sigmoid9(_fold_dot(F.col(vec_col).cast("array<double>"), w))
        base = df.select(
            (s - F.col(label_col).cast("double")).alias("__resid"),
            F.col(vec_col).cast("array<double>").alias("__x"),
        )
        exploded = base.select(
            "__resid", F.posexplode(F.concat("__x", F.array(F.lit(1.0))))
        )
        grads = (
            exploded.groupBy("pos")
            .agg(F.round(F.sum(F.col("__resid") * F.col("col")) / F.lit(n), 6).alias("g"))
            .collect()
        )
        g = {r["pos"]: r["g"] for r in grads}
        w = [round(w[j] - lr * g[j], 6) for j in range(dim + 1)]
    return w


def linear_probe_scores(
    df: DataFrame,
    weights: list[float],
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    label_col: str | None = None,
    threshold: float = 0.5,
) -> DataFrame:
    """Score every row with the trained head: (key, [label,] prob, pred).

    prob = round(sigmoid(round(z, 9)), 6) — engine-exact; pred is the
    >= threshold cut on the rounded prob, so the keep/drop decision is
    engine-exact too.  Map-only: compose with quality gates / sampling
    at no extra shuffle."""
    z = _fold_dot(F.col(vec_col).cast("array<double>"), weights)
    prob = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.round(z, 9))), 6)
    cols = [F.col(key_col)]
    if label_col is not None:
        cols.append(F.col(label_col))
    return df.select(
        *cols,
        prob.alias("prob"),
        (prob >= F.lit(threshold)).cast("int").alias("pred"),
    )
