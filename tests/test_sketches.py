"""Sketch-family invariants: determinism under repartitioning, one-sided
error guarantees, and the exact-below-threshold contracts."""

import pyspark.sql.functions as F
import pytest

from tilekiln_spark.operators.sketches import (
    bloom_bits,
    bloom_probe,
    cms_counters,
    cms_point_estimate,
    hll_alpha,
    hll_distinct,
    kmv_distinct,
)


@pytest.fixture(scope="module")
def keyed(spark):
    # 3 groups x known distinct counts: g0 -> 400 keys, g1 -> 40, g2 -> 8
    return spark.range(0, 448).select(
        F.when(F.col("id") < 400, F.lit("g0"))
        .when(F.col("id") < 440, F.lit("g1"))
        .otherwise(F.lit("g2"))
        .alias("g"),
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("k"),
    )


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_hll_deterministic_under_partitioning(spark, keyed):
    a = hll_distinct(keyed.repartition(1), F.col("k"), ["g"], p=6)
    b = hll_distinct(keyed.repartition(32), F.col("k"), ["g"], p=6)
    assert _rows(a, "g", "hll_est", "hll_registers_used") == _rows(
        b, "g", "hll_est", "hll_registers_used"
    )


def test_hll_duplicates_are_free(spark, keyed):
    # the sketch estimates DISTINCT keys: unioning the input with itself
    # (and with a skewed triplication of one group) changes nothing
    dup = keyed.union(keyed).union(keyed.where(F.col("g") == "g0"))
    a = hll_distinct(keyed, F.col("k"), ["g"], p=6)
    b = hll_distinct(dup, F.col("k"), ["g"], p=6)
    assert _rows(a, "g", "hll_est") == _rows(b, "g", "hll_est")


def test_hll_error_within_bound(spark, keyed):
    # standard error for m=64 is 1.04/8 = 13%; allow 3 sigma
    exact = {r["g"]: r["n"] for r in keyed.groupBy("g").agg(
        F.countDistinct("k").alias("n")).collect()}
    for r in hll_distinct(keyed, F.col("k"), ["g"], p=6).collect():
        rel = abs(r["hll_est"] - exact[r["g"]]) / exact[r["g"]]
        assert rel < 3 * 1.04 / 8, (r["g"], r["hll_est"], exact[r["g"]])


def test_hll_alpha_table():
    assert hll_alpha(16) == 0.673
    assert hll_alpha(64) == 0.709
    assert abs(hll_alpha(256) - 0.7213 / (1 + 1.079 / 256)) < 1e-12


def test_kmv_exact_below_k(spark, keyed):
    out = {r["g"]: r for r in kmv_distinct(keyed, F.col("k"), ["g"], k=16).collect()}
    assert out["g2"]["kmv_exact_below_k"] is True
    assert out["g2"]["kmv_est"] == 8.0
    assert out["g0"]["kmv_exact_below_k"] is False
    assert abs(out["g0"]["kmv_est"] - 400) / 400 < 0.75  # k=16 is coarse


def test_kmv_deterministic_under_partitioning(spark, keyed):
    a = kmv_distinct(keyed.repartition(1), F.col("k"), ["g"], k=16)
    b = kmv_distinct(keyed.repartition(32), F.col("k"), ["g"], k=16)
    assert _rows(a, "g", "kmv_est") == _rows(b, "g", "kmv_est")


def test_cms_never_underestimates(spark):
    # skewed frequencies: key i appears (i+1) times
    items = spark.range(0, 30).select(
        F.explode(F.sequence(F.lit(0), F.col("id"))).alias("_"),
        F.concat(F.lit("h"), F.col("id").cast("string")).alias("k"),
    )
    counters = cms_counters(items, F.col("k"), depth=3, width=16)
    probes = items.select("k").distinct()
    est = {r["k"]: r["cms_est"] for r in
           cms_point_estimate(counters, probes, "k", depth=3, width=16).collect()}
    exact = {r["k"]: r["n"] for r in
             items.groupBy("k").agg(F.count("*").alias("n")).collect()}
    assert set(est) == set(exact)
    for k, n in exact.items():
        assert est[k] >= n, (k, est[k], n)


def test_bloom_no_false_negatives_and_sized_fp(spark, keyed):
    members = keyed.where(F.col("g") != "g0").select("k")  # 48 keys
    bits = bloom_bits(members, F.col("k"), m_bits=1024, k_hashes=3)
    probes = keyed.select("k").distinct()
    hits = {r["k"]: r["bloom_hit"] for r in
            bloom_probe(bits, probes, "k", m_bits=1024, k_hashes=3).collect()}
    member_keys = {r["k"] for r in members.collect()}
    for k in member_keys:
        assert hits[k] is True  # no false negatives, ever
    fps = sum(1 for k, h in hits.items() if h and k not in member_keys)
    # 48*3 = 144 of 1024 bits set -> fp ~ (144/1024)^3 ~ 0.3%; allow slack
    assert fps <= 20


def test_bloom_bits_bounded(spark, keyed):
    bits = bloom_bits(keyed.select("k"), F.col("k"), m_bits=64, k_hashes=3)
    vals = [r["pos"] for r in bits.collect()]
    assert len(vals) == len(set(vals)) <= 64
    assert all(0 <= v < 64 for v in vals)
