"""ST_ClusterDBSCAN (operators/dbscan.py): textbook fixture with known
core/border/noise labels, min-id cluster canonicalization, and partition
invariance."""

import pyspark.sql.functions as F

from tilekiln_spark.operators.dbscan import dbscan


def _fixture(spark):
    # cross blob A (ids 0-4): center + 4 satellites at 0.5; every pair is
    # within eps=1 (max pair dist 1.0, inclusive) -> with min_pts=5 all core
    # border (id 5) at (1.4, 0): within eps of satellite 1 ONLY
    # blob B (ids 10-12): 3 points pairwise within eps
    # noise (id 20): isolated
    pts = [
        (0, 0.0, 0.0), (1, 0.5, 0.0), (2, -0.5, 0.0), (3, 0.0, 0.5), (4, 0.0, -0.5),
        (5, 1.4, 0.0),
        (10, 100.0, 100.0), (11, 100.5, 100.0), (12, 100.0, 100.5),
        (20, -100.0, 50.0),
    ]
    return spark.createDataFrame(pts, "doc_id long, mx double, my double")


def test_dbscan_core_border_noise(spark):
    df = _fixture(spark)
    out = {r.doc_id: (r.is_core, r.cluster_id)
           for r in dbscan(df, eps=1.0, min_pts=5).collect()}
    for pid in (0, 1, 2, 3, 4):
        assert out[pid] == (True, 0), pid
    # border: one core neighbor (id 1), 2 incl. self < 5 -> joins cluster 0
    assert out[5] == (False, 0)
    # blob B: 3 points < min_pts -> no cores -> all noise
    for pid in (10, 11, 12):
        assert out[pid] == (False, None), pid
    assert out[20] == (False, None)


def test_dbscan_two_clusters_and_invariance(spark):
    df = _fixture(spark)
    # min_pts=3: blob B becomes its own cluster (all three are cores),
    # cluster id = min member id = 10; 5 still sees only id 1 -> border
    out = {r.doc_id: (r.is_core, r.cluster_id)
           for r in dbscan(df, eps=1.0, min_pts=3).collect()}
    for pid in (10, 11, 12):
        assert out[pid] == (True, 10), pid
    assert out[0] == (True, 0) and out[5] == (False, 0)
    assert out[20] == (False, None)
    re = {r.doc_id: (r.is_core, r.cluster_id)
          for r in dbscan(df.repartition(7), eps=1.0, min_pts=3).collect()}
    assert re == out


def test_dbscan_eps_boundary_inclusive(spark):
    # dist exactly eps counts (<=), matching the <= residual in the twin
    df = spark.createDataFrame(
        [(0, 0.0, 0.0), (1, 1.0, 0.0), (2, 2.0, 0.0)],
        "doc_id long, mx double, my double",
    )
    out = {r.doc_id: (r.is_core, r.cluster_id)
           for r in dbscan(df, eps=1.0, min_pts=3).collect()}
    # cluster label = min CORE id (1 is the only core)
    assert out[1] == (True, 1)          # sees both ends at exactly eps
    assert out[0] == (False, 1) and out[2] == (False, 1)  # borders


def test_st_dbscan_time_and_space_separation(spark):
    """Two bursts at identical coordinates 1000 s apart form TWO
    clusters (plain DBSCAN would merge them); a co-temporal chain 500 m
    away is its own cluster; isolated points are noise."""
    from pyspark.sql import functions as F

    from tilekiln_spark.operators.dbscan import st_dbscan

    i = F.col("id")
    grp = F.floor(i / 20).cast("long")
    j = (i % 20).cast("double")
    pts = spark.range(70).select(
        i.alias("pid"),
        F.when(grp == 3, F.lit(100000.0) + j * 5000.0).otherwise(j * 10.0).alias("mx"),
        F.when(grp == 2, F.lit(500.0)).when(grp == 3, F.lit(-800.0))
        .otherwise(F.lit(0.0)).alias("my"),
        F.when(grp == 1, F.lit(1000.0) + j * 5.0).when(grp == 3, j * 37.0)
        .otherwise(j * 5.0).alias("t"),
    )
    out = {r.pid: (r.is_core, r.cluster_id)
           for r in st_dbscan(pts, 15.0, 20.0, 3, key_col="pid").collect()}
    # chain interiors are cores labeled by the min core id; ends are borders
    assert out[0] == (False, 1) and out[1] == (True, 1) and out[19] == (False, 1)
    assert out[21] == (True, 21) and out[20] == (False, 21)
    assert out[41] == (True, 41)
    assert {out[k][1] for k in range(60, 70)} == {None}
    assert {v[1] for k, v in out.items() if k < 20} == {1}
