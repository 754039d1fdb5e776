"""ST_ClusterKMeans (operators/kmeans.py): convergence on separated blobs,
deterministic seeds/tie-breaks, partition invariance."""

from tilekiln_spark.operators.kmeans import kmeans_2d


def _fixture(spark):
    pts = [
        (0, 0.0, 0.0), (1, 1.0, 0.0), (2, 0.0, 1.0), (3, 1.0, 1.0),
        (10, 100.0, 100.0), (11, 101.0, 100.0), (12, 100.0, 101.0), (13, 101.0, 101.0),
    ]
    return spark.createDataFrame(pts, "doc_id long, mx double, my double")


def test_kmeans_two_blobs(spark):
    out = {r.cid: (r.n_points, r.cx, r.cy)
           for r in kmeans_2d(_fixture(spark), k=2, iters=3).collect()}
    # seeds are docs 0 and 1 (both in blob A); Lloyd still separates the
    # blobs within 3 rounds, and each cluster lands on its blob mean
    assert sorted(v[0] for v in out.values()) == [4, 4]
    cents = sorted((v[1], v[2]) for v in out.values())
    assert cents == [(0.5, 0.5), (100.5, 100.5)]


def test_kmeans_partition_invariant(spark):
    df = _fixture(spark)
    a = sorted(map(tuple, kmeans_2d(df, k=2, iters=3).collect()))
    b = sorted(map(tuple, kmeans_2d(df.repartition(5), k=2, iters=3).collect()))
    assert a == b
