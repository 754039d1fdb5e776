"""DTW distance (functions/geometry.py dtw_distance): hand-verified
alignments, the warping property Fréchet lacks (repeats are free), and the
single-vertex guard."""

from pyspark.sql import functions as F

from tilekiln_spark.functions.geometry import dtw_distance


def _d(spark, a, b):
    df = spark.createDataFrame(
        [([p[0] for p in a], [p[1] for p in a],
          [p[0] for p in b], [p[1] for p in b])],
        "axs array<double>, ays array<double>, bxs array<double>, bys array<double>",
    )
    return df.select(
        dtw_distance(
            F.col("axs"), F.col("ays"), F.col("bxs"), F.col("bys")
        ).alias("d")
    ).head()["d"]


def test_dtw_identical_chains_zero(spark):
    a = [(0.0, 0.0), (1.0, 0.0), (2.0, 1.0)]
    assert _d(spark, a, a) == 0.0


def test_dtw_hand_computed_offset(spark):
    """A=[(0,0),(1,0)], B=[(0,1),(1,1)]: the diagonal alignment pairs
    matching x's, each at squared cost 1 -> total 2, sqrt(2)."""
    assert _d(spark, [(0.0, 0.0), (1.0, 0.0)],
              [(0.0, 1.0), (1.0, 1.0)]) == 2.0 ** 0.5


def test_dtw_warping_absorbs_repeats(spark):
    """Repeating a vertex in A costs nothing under DTW (it aligns to the
    same B vertex repeatedly at d=0) — the property that separates DTW
    from the Fréchet/Hausdorff family on resampled trajectories."""
    a = [(0.0, 0.0), (1.0, 0.0), (2.0, 0.0)]
    a_rep = [(0.0, 0.0), (1.0, 0.0), (1.0, 0.0), (1.0, 0.0), (2.0, 0.0)]
    assert _d(spark, a_rep, a) == 0.0


def test_dtw_single_vertex_guard(spark):
    """n == 1: the outer fold is skipped (ascending-sequence guard); the
    first-row prefix sum alone gives sum of squared distances 1+1 = 2."""
    assert _d(spark, [(0.0, 0.0)],
              [(1.0, 0.0), (0.0, 1.0)]) == 2.0 ** 0.5
