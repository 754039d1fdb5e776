"""Linear-probe classifier: differential vs a pure-numpy replay of the
exact rounding contract, plus a learning sanity check on separable data."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tilekiln_spark.operators.classifier import (
    linear_probe_scores,
    train_linear_probe,
)


def _numpy_probe(X, y, iters, lr):
    """Independent replay of the module's cross-engine contract."""
    n, dim = X.shape
    w = np.zeros(dim + 1)
    for _ in range(iters):
        z = X @ w[:dim] + w[dim]
        s = np.round(1.0 / (1.0 + np.exp(-np.round(z, 9))), 9)
        resid = s - y
        g = np.append(resid @ X, resid.sum()) / n
        w = np.round(w - lr * np.round(g, 6), 6)
    return w


def _frame(spark, X, y):
    rows = [(i, X[i].tolist(), float(y[i])) for i in range(len(y))]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>, y double")


def test_train_linear_probe_matches_numpy(spark):
    rng = np.random.default_rng(11)
    X = rng.standard_normal((120, 8))
    y = (rng.random(120) < 0.4).astype(float)
    df = _frame(spark, X, y)
    got = train_linear_probe(df, dim=8, iters=3, lr=1.0)
    want = _numpy_probe(X, y, iters=3, lr=1.0)
    assert got == pytest.approx(want.tolist(), abs=0)  # exact: both round-6

    scores = {
        r.vec_id: (r.prob, r.pred)
        for r in linear_probe_scores(df, got, label_col="y").collect()
    }
    z = X @ np.array(got[:8]) + got[8]
    probs = np.round(1.0 / (1.0 + np.exp(-np.round(z, 9))), 6)
    for i in range(120):
        assert scores[i] == (pytest.approx(probs[i], abs=0), int(probs[i] >= 0.5))


def test_probe_learns_separable_labels(spark):
    """On a margin-separated direction the probe's scores must rank
    positives above negatives after a handful of full-batch steps."""
    rng = np.random.default_rng(5)
    X = rng.standard_normal((200, 6))
    keep = np.abs(X[:, 0]) > 0.3  # margin: drop ambiguous rows
    X, y = X[keep], (X[keep, 0] > 0).astype(float)
    df = _frame(spark, X, y)
    w = train_linear_probe(df, dim=6, iters=8, lr=2.0)
    scored = linear_probe_scores(df, w, label_col="y").collect()
    pos = [r.prob for r in scored if r.y == 1.0]
    neg = [r.prob for r in scored if r.y == 0.0]
    assert min(pos) > max(0.0, np.median(neg))
    acc = np.mean([r.pred == int(r.y) for r in scored])
    assert acc >= 0.9


def test_train_empty_frame_raises(spark):
    df = _frame(spark, np.zeros((0, 4)), np.zeros(0))
    with pytest.raises(ValueError):
        train_linear_probe(df, dim=4, iters=1)
