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


def test_edr_goldens(spark):
    import pyspark.sql.functions as F

    from tilekiln_spark.functions.geometry import edr_distance

    df = spark.createDataFrame(
        [
            # identical chains -> 0
            (1, [0.0, 1.0, 2.0], [0.0, 0.0, 0.0]),
            # one far point -> one substitution
            (2, [0.0, 9.0, 2.0], [0.0, 9.0, 0.0]),
            # longer chain -> inserts for the extra points
            (3, [0.0, 0.4, 1.0, 2.0, 7.0], [0.0, 0.0, 0.0, 0.0, 0.0]),
        ],
        "k int, xs array<double>, ys array<double>",
    )
    b_xs = F.array(F.lit(0.0), F.lit(1.0), F.lit(2.0))
    b_ys = F.array(F.lit(0.0), F.lit(0.0), F.lit(0.0))
    out = {r["k"]: r["edr"] for r in df.select(
        "k", edr_distance(F.col("xs"), F.col("ys"), b_xs, b_ys, 0.5).alias("edr")
    ).collect()}
    assert out[1] == 0
    assert out[2] == 1
    assert out[3] == 2


def test_edr_eps_boundary_exact(spark):
    import pyspark.sql.functions as F

    from tilekiln_spark.functions.geometry import edr_distance

    # d == eps exactly -> MATCH (<=, squared both sides)
    df = spark.createDataFrame([(1, [3.0], [4.0])],
                               "k int, xs array<double>, ys array<double>")
    b_xs, b_ys = F.array(F.lit(0.0)), F.array(F.lit(0.0))
    on = df.select(edr_distance(F.col("xs"), F.col("ys"), b_xs, b_ys, 5.0).alias("e"))
    off = df.select(edr_distance(F.col("xs"), F.col("ys"), b_xs, b_ys, 4.999999).alias("e"))
    assert on.collect()[0]["e"] == 0
    assert off.collect()[0]["e"] == 1


def test_edr_empty_chain_guard(spark):
    """r6 ADVICE fix: an empty trajectory must yield EDR = |B| (delete
    every B point), not a runtime error from the descending sequence(1, 0)
    feeding element_at(..., 0)."""
    import pyspark.sql.functions as F

    from tilekiln_spark.functions.geometry import edr_distance

    df = spark.createDataFrame(
        [(1, [], []), (2, [0.0, 1.0, 2.0], [0.0, 0.0, 0.0])],
        "k int, xs array<double>, ys array<double>",
    )
    b_xs = F.array(F.lit(0.0), F.lit(1.0), F.lit(2.0))
    b_ys = F.array(F.lit(0.0), F.lit(0.0), F.lit(0.0))
    out = {r["k"]: r["edr"] for r in df.select(
        "k", edr_distance(F.col("xs"), F.col("ys"), b_xs, b_ys, 0.5).alias("edr")
    ).collect()}
    assert out[1] == 3  # empty A: delete all 3 B points
    assert out[2] == 0
