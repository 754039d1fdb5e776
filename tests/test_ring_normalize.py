"""ST_Normalize ring canonicalization (functions/geometry.py
ring_normalize): rotation/reversal invariance — the property that makes
it the geometry-equality primitive."""

from pyspark.sql import functions as F

from tilekiln_spark.functions.geometry import ring_normalize


def _norm(spark, pts):
    df = spark.createDataFrame(
        [([p[0] for p in pts], [p[1] for p in pts])],
        "xs array<double>, ys array<double>",
    )
    nx, ny = ring_normalize(F.col("xs"), F.col("ys"))
    r = df.select(nx.alias("nx"), ny.alias("ny")).head()
    return list(zip(r["nx"], r["ny"]))


def test_canonical_form(spark):
    # CCW square given starting mid-ring: rotates to the smallest vertex
    ring = [(1.0, 1.0), (0.0, 1.0), (0.0, 0.0), (1.0, 0.0)]
    assert _norm(spark, ring) == [
        (0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)
    ]


def test_rotation_and_reversal_invariance(spark):
    base = [(0.0, 0.0), (2.0, 0.0), (3.0, 1.5), (1.0, 2.5), (-0.5, 1.0)]
    want = _norm(spark, base)
    for k in range(1, len(base)):
        rotated = base[k:] + base[:k]
        assert _norm(spark, rotated) == want, f"rotation {k}"
        assert _norm(spark, rotated[::-1]) == want, f"reversed rotation {k}"


def test_smallest_vertex_tie_breaks_on_y(spark):
    # two vertices share min x: the lower y wins the start slot
    ring = [(0.0, 5.0), (0.0, 1.0), (4.0, 1.0), (4.0, 5.0)]
    out = _norm(spark, ring)
    assert out[0] == (0.0, 1.0)
    # and orientation is CCW (positive shoelace)
    area2 = sum(
        out[i][0] * out[(i + 1) % 4][1] - out[(i + 1) % 4][0] * out[i][1]
        for i in range(4)
    )
    assert area2 > 0
