"""Nearest-neighbor join + Clark-Evans + colocation quotient goldens."""

import math

import pyspark.sql.functions as F
import pytest

from tilekiln_spark.operators.spatial_join import (
    clark_evans,
    colocation_quotient,
    nearest_neighbors,
)


def _pts(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, mx double, my double")


def test_nn_join_line_golden(spark):
    # points on a line at 0, 1, 3, 7: NNs are 1, 0, 1, 3
    rows = [(0, 0.0, 0.0), (1, 1.0, 0.0), (2, 3.0, 0.0), (3, 7.0, 0.0)]
    out = {r["doc_id"]: (r["nn_id"], r["nn_d2"])
           for r in nearest_neighbors(_pts(spark, rows), radius=10.0).collect()}
    assert out == {0: (1, 1.0), 1: (0, 1.0), 2: (1, 4.0), 3: (2, 16.0)}


def test_nn_join_fallback_beyond_radius(spark):
    # radius 1.5 finds NN for the close pair only; the far point must be
    # resolved EXACTLY by the brute-force tail pass
    rows = [(0, 0.0, 0.0), (1, 1.0, 0.0), (2, 100.0, 0.0)]
    out = {r["doc_id"]: (r["nn_id"], r["nn_d2"])
           for r in nearest_neighbors(_pts(spark, rows), radius=1.5).collect()}
    assert out[2] == (1, 99.0 * 99.0)
    assert out[0] == (1, 1.0) and out[1] == (0, 1.0)


def test_nn_join_tiebreak_smallest_id(spark):
    # equidistant neighbors: the smaller nn_id must win on both stages
    rows = [(0, 0.0, 0.0), (1, 1.0, 0.0), (2, -1.0, 0.0)]
    out = {r["doc_id"]: r["nn_id"]
           for r in nearest_neighbors(_pts(spark, rows), radius=5.0).collect()}
    assert out[0] == 1


def test_clark_evans_grid_is_dispersed(spark):
    # a perfect 5x5 unit grid: every NN distance is exactly 1, mean_nn=1,
    # A=16, n=25 -> D_exp = 1/(2*sqrt(25/16)) = 0.4 -> R = 2.5 (dispersed)
    rows = [(5 * i + j, float(i), float(j)) for i in range(5) for j in range(5)]
    r = clark_evans(_pts(spark, rows), radius=3.0).collect()[0]
    assert r["n_points"] == 25
    assert r["area"] == 16.0
    assert r["mean_nn"] == 1.0
    assert abs(r["r_index"] - 2.5) < 1e-12
    # z = (1 - 0.4) / (0.26136 / sqrt(625/16))
    se = 0.26136 / math.sqrt(625.0 / 16.0)
    assert abs(r["z_score"] - 0.6 / se) < 1e-9


def test_colocation_quotient_segregated_line(spark):
    # categories fully segregated: a-points neighbor a, b-points neighbor b
    rows = [(0, 0.0, 0.0, "a"), (1, 1.0, 0.0, "a"),
            (2, 10.0, 0.0, "b"), (3, 11.0, 0.0, "b")]
    df = spark.createDataFrame(
        rows, "doc_id long, mx double, my double, lang string")
    out = {(r["cat_a"], r["cat_b"]): r
           for r in colocation_quotient(df, radius=20.0).collect()}
    # C_{a->a}=2 of N_a=2; N_a'=1, N-1=3 -> CLQ = (2/2)/(1/3) = 3
    assert out[("a", "a")]["nn_pairs"] == 2
    assert abs(out[("a", "a")]["clq"] - 3.0) < 1e-12
    # cross pairs are zero but the grid rows exist
    assert out[("a", "b")]["nn_pairs"] == 0
    assert out[("a", "b")]["clq"] == 0.0
    assert out[("b", "b")]["nn_pairs"] == 2


def test_g_function_grid_step(spark):
    from tilekiln_spark.operators.spatial_join import g_function

    # 5x5 unit grid: ALL NN distances are exactly 1 -> G jumps 0 -> 1 at r=1
    rows = [(5 * i + j, float(i), float(j)) for i in range(5) for j in range(5)]
    out = {r["r"]: (r["n_le"], r["g_hat"])
           for r in g_function(_pts(spark, rows), radius=3.0,
                               rs=[0.5, 1.0, 2.0]).collect()}
    assert out[0.5] == (0, 0.0)
    assert out[1.0] == (25, 1.0)   # boundary r = d included (<=, exact d2)
    assert out[2.0] == (25, 1.0)


def test_moran_correlogram_checkerboard(spark):
    from tilekiln_spark.operators.spatial_join import moran_correlogram

    # 4x4 checkerboard of 0/100 at unit spacing: the (0,1.05] band holds
    # the rook neighbors (perfect anti-correlation, I < 0); the
    # (1.05,1.5] band holds the diagonal neighbors (perfect agreement,
    # I > 0)
    rows = [(4 * i + j, float(i), float(j), 100 * ((i + j) % 2))
            for i in range(4) for j in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, mx double, my double, v long")
    out = {r["band"]: r for r in
           moran_correlogram(df, "v", [1.05, 1.5]).collect()}
    assert out[0]["s0_pairs"] == 48      # 2*24 rook adjacencies, directed
    assert out[0]["moran_i"] < -0.9
    assert out[1]["s0_pairs"] == 36      # 2*18 diagonal adjacencies
    assert out[1]["moran_i"] > 0.9


def test_moran_correlogram_validates_radii(spark):
    import pytest as _pytest

    from tilekiln_spark.operators.spatial_join import moran_correlogram

    df = spark.createDataFrame([(0, 0.0, 0.0, 1)],
                               "doc_id long, mx double, my double, v long")
    with _pytest.raises(ValueError):
        moran_correlogram(df, "v", [2.0, 1.0])
    with _pytest.raises(ValueError):
        moran_correlogram(df, "v", [])
