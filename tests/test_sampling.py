"""Deterministic sampling / data-mixing operators (operators/sampling.py)."""

import pyspark.sql.functions as F

from tilekiln_spark.operators.sampling import (
    _threshold_hex,
    sample_by,
    sample_fraction,
    stratified_quota_sample,
)


def _corpus(spark):
    rows = [(i, f"s{i % 5}") for i in range(1000)]
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_threshold_hex_edges():
    assert _threshold_hex(0.0) == "0" * 16
    assert _threshold_hex(0.5) == "8000000000000000"
    assert _threshold_hex(1.0) == "g"  # sorts after every hex string
    assert _threshold_hex(2.0) == "g"
    assert _threshold_hex(-1.0) == "0" * 16


def test_sample_fraction_rate_and_stability(spark):
    d = _corpus(spark)
    kept = sample_fraction(d, 0.3, "doc_id", seed=7)
    n = kept.count()
    assert 240 <= n <= 360  # ~binomial(1000, .3), wide tolerance
    a = {r.doc_id for r in kept.collect()}
    b = {r.doc_id for r in sample_fraction(d.repartition(13), 0.3, "doc_id", seed=7).collect()}
    assert a == b  # partition-layout independent
    c = {r.doc_id for r in sample_fraction(d, 0.3, "doc_id", seed=8).collect()}
    assert a != c  # seed actually matters
    assert sample_fraction(d, 1.0, "doc_id").count() == 1000
    assert sample_fraction(d, 0.0, "doc_id").count() == 0


def test_sample_by_per_stratum(spark):
    d = _corpus(spark)
    kept = sample_by(d, "source", {"s0": 1.0, "s1": 0.5}, "doc_id", default=0.0, seed=7)
    by = {r.source: r["count"] for r in kept.groupBy("source").count().collect()}
    assert by["s0"] == 200  # fraction 1.0 keeps the whole stratum
    assert 60 <= by.get("s1", 0) <= 140
    assert set(by) == {"s0", "s1"}  # default 0.0 drops the rest


def test_quota_sample_exact_and_capped(spark):
    d = _corpus(spark)
    q = stratified_quota_sample(d, "source", 7, "doc_id", seed=3)
    counts = [r["count"] for r in q.groupBy("source").count().collect()]
    assert counts == [7] * 5
    # quota above the stratum size keeps the whole stratum
    small = d.filter(F.col("doc_id") < 8)  # strata of size 1-2
    q2 = stratified_quota_sample(small, "source", 10, "doc_id")
    assert q2.count() == 8
    # deterministic membership
    a = {r.doc_id for r in q.collect()}
    b = {r.doc_id for r in stratified_quota_sample(d.repartition(11), "source", 7, "doc_id", seed=3).collect()}
    assert a == b


def test_quota_sample_plan_uses_window_group_limit(spark):
    d = _corpus(spark)
    plan = (
        stratified_quota_sample(d, "source", 7)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan  # partial top-n before the exchange


def test_sample_by_broadcast_path_matches_case_path(spark):
    d = _corpus(spark)
    fr = {"s0": 1.0, "s1": 0.5}
    big = dict(fr, **{f"zz{i}": 0.0 for i in range(70)})  # force the join path
    a = {r.doc_id for r in sample_by(d, "source", fr, "doc_id", default=0.2, seed=7).collect()}
    b = {r.doc_id for r in sample_by(d, "source", big, "doc_id", default=0.2, seed=7).collect()}
    assert a == b  # identical decisions, different physical plan
    plan = sample_by(d, "source", big, "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_shard_assign_deterministic_and_complete(spark):
    from tilekiln_spark.operators.sampling import shard_assign

    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    a = shard_assign(df, 16).collect()
    b = shard_assign(df.repartition(7), 16).collect()  # layout-independent
    assert {r.doc_id: (r.shard, r.sort_key) for r in a} == {
        r.doc_id: (r.shard, r.sort_key) for r in b
    }
    shards = {r.shard for r in a}
    assert shards == set(range(16))  # every shard populated at n=1000
    assert len(a) == 1000  # assignment, not a filter
    # python twin of the md5 draw reproduces the split exactly
    import hashlib

    for r in a[:50]:
        h = hashlib.md5(f"s42:{r.doc_id}".encode()).hexdigest()
        assert r.sort_key == h[:16]
        assert r.shard == int(h[:8], 16) % 16


def test_shard_assign_is_map_only(spark):
    from tilekiln_spark.operators.sampling import shard_assign

    df = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    plan = shard_assign(df, 8)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_temperature_mix_upsamples_rare_sources(spark):
    import math

    from tilekiln_spark.operators.sampling import sample_hash, temperature_mix

    rows = [(i, "big" if i < 900 else "rare") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_mix(df, "source", alpha=0.5, target_fraction=0.5)
    kept = out.groupBy("source").count().collect()
    got = {r.source: r["count"] for r in kept}
    # expected fractions from the formula (python twin)
    c = {"big": 900, "rare": 100}
    w = {s: math.sqrt(n) for s, n in c.items()}
    wsum = sum(w[s] for s in sorted(w))
    frac = {s: round(min(1.0, 500 * (w[s] / wsum) / c[s]), 9) for s in c}
    # rare source keeps a ~3.4x larger fraction than raw 0.5 mixing would
    assert frac["rare"] > 1.0 - 1e-9 or frac["rare"] > frac["big"]
    # exact membership check against the documented md5 rule
    import hashlib

    for s, n in c.items():
        exp = 0
        thr = format(int(frac[s] * (1 << 64)), "016x") if frac[s] < 1.0 else "g"
        for i in range(1000):
            if rows[i][1] != s:
                continue
            h = hashlib.md5(f"s42:{i}".encode()).hexdigest()[:16]
            if h < thr:
                exp += 1
        assert got.get(s, 0) == exp, s


def test_write_training_shards_layout_and_order(spark, tmp_path):
    """write_training_shards: partitionBy(shard) directories, every row in
    its md5-assigned shard, rows within each file in sort_key order, and a
    manifest matching the directory contents."""
    import os

    from pyspark.sql import functions as F

    from tilekiln_spark.operators.sampling import sample_hash, write_training_shards

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(200)], "doc_id long, text string"
    )
    path = str(tmp_path / "shards")
    manifest = {r.shard: r.n_docs for r in
                write_training_shards(docs, path, n_shards=4).collect()}
    assert sum(manifest.values()) == 200 and set(manifest) <= set(range(4))
    dirs = {d for d in os.listdir(path) if d.startswith("shard=")}
    assert dirs == {f"shard={s}" for s in manifest}

    back = spark.read.parquet(path)
    assert back.count() == 200
    # membership: recompute the draw independently
    want = {
        r.doc_id: (r.shard, r.h)
        for r in docs.select(
            "doc_id",
            (F.conv(F.substring(sample_hash(F.col("doc_id"), 42), 1, 8), 16, 10)
             .cast("long") % 4).cast("int").alias("shard"),
            sample_hash(F.col("doc_id"), 42).alias("h"),
        ).collect()
    }
    got = back.select("doc_id", "shard", "sort_key").collect()
    for r in got:
        assert (r.shard, r.sort_key) == want[r.doc_id]
    # within-file physical order = sort_key order
    import glob

    for s in manifest:
        for f in glob.glob(f"{path}/shard={s}/*.parquet"):
            keys = [r.sort_key for r in spark.read.parquet(f).collect()]
            assert keys == sorted(keys)


def test_hilbert_balanced_shards(spark):
    """Shards are exactly balanced (floor/ceil(N/S)) AND contiguous on
    the Hilbert curve (non-overlapping tileid ranges in shard order)."""
    from pyspark.sql import functions as F

    from tilekiln_spark.operators.sampling import hilbert_balanced_shards

    n = 1000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 37 % 100).cast("double") * 4.0e5 - 2.0e7).alias("mx"),
        ((F.col("id") * 59 % 100).cast("double") * 4.0e5 - 2.0e7).alias("my"),
    )
    out = hilbert_balanced_shards(df, n_shards=7, zoom=6)
    rows = (
        out.groupBy("shard")
        .agg(F.count("*").alias("n"), F.min("tileid").alias("lo"),
             F.max("tileid").alias("hi"))
        .orderBy("shard")
        .collect()
    )
    assert [r["shard"] for r in rows] == list(range(7))
    sizes = [r["n"] for r in rows]
    assert sum(sizes) == n
    assert max(sizes) - min(sizes) <= 1  # exact positional balance
    for a, b in zip(rows, rows[1:]):     # contiguous, non-overlapping
        assert a["hi"] <= b["lo"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition(" in line:
            assert "__pid" in line, line
