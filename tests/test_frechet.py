"""Discrete Fréchet distance (functions/geometry.py frechet_distance):
hand-verified couplings, the ordering sensitivity Hausdorff lacks, and the
single-vertex guard."""

from pyspark.sql import functions as F

from tilekiln_spark.functions.geometry import frechet_distance


def _d(spark, a, b):
    df = spark.createDataFrame(
        [([p[0] for p in a], [p[1] for p in a],
          [p[0] for p in b], [p[1] for p in b])],
        "axs array<double>, ays array<double>, bxs array<double>, bys array<double>",
    )
    return df.select(
        frechet_distance(
            F.col("axs"), F.col("ays"), F.col("bxs"), F.col("bys")
        ).alias("d")
    ).head()["d"]


def test_identical_chains_are_zero(spark):
    a = [(0.0, 0.0), (3.0, 4.0), (7.0, 1.0)]
    assert _d(spark, a, a) == 0.0


def test_middle_bump(spark):
    # couple middles: dF = 3 (both chains share endpoints)
    a = [(0.0, 0.0), (5.0, 0.0), (10.0, 0.0)]
    b = [(0.0, 0.0), (5.0, 3.0), (10.0, 0.0)]
    assert _d(spark, a, b) == 3.0


def test_order_sensitivity_vs_hausdorff(spark):
    # same point SETS (Hausdorff = 0) but reversed ORDER: the dog-walk
    # coupling forces an endpoint to pair across the full length
    a = [(0.0, 0.0), (10.0, 0.0)]
    b = [(10.0, 0.0), (0.0, 0.0)]
    assert _d(spark, a, b) == 10.0


def test_single_vertex_a(spark):
    # n = 1: dF = max_j d(a1, bj); also exercises the ascending-sequence
    # guard (no F.sequence(2, 1))
    a = [(3.0, 4.0)]
    b = [(0.0, 0.0), (3.0, 4.0)]
    assert _d(spark, a, b) == 5.0


def test_single_vertex_both(spark):
    assert _d(spark, [(0.0, 0.0)], [(6.0, 8.0)]) == 10.0


def test_monotone_detour_is_free(spark):
    # B revisits forward progress along A's corridor: coupling can wait
    # (repeat a vertex), so the detour inside the corridor costs only its
    # lateral offset
    a = [(0.0, 0.0), (10.0, 0.0)]
    b = [(0.0, 0.0), (4.0, 1.0), (6.0, 1.0), (10.0, 0.0)]
    # couple (0,0)->a1 then every middle vertex to a2 (max dist at (4,1):
    # sqrt(36+1)) -- actually coupling middles to a1 gives sqrt(17) < a2's
    # sqrt(37): dF = max(endpoints 0, min-side) = sqrt(17)
    assert abs(_d(spark, a, b) - 17.0 ** 0.5) < 1e-12
