from pyspark.sql import functions as F


def test_dsir_weights_prefers_target_like_docs(spark):
    """Docs whose hashed-gram distribution matches the target corpus score
    higher than off-target docs; empty docs get (0, 0.0)."""
    from tilekiln_spark.operators.selection import dsir_weights

    wiki = "the quick brown fox jumps over the lazy dog near the river bank"
    spam = "buy cheap pills now click here winner casino bonus free offer"
    raw = spark.createDataFrame(
        [(1, wiki), (2, spam), (3, wiki + " again today"), (4, "")],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(10, wiki), (11, "a quick brown fox near the river")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dsir_weights(raw, target, buckets=512).collect()}
    assert len(out) == 4
    # DSIR ranks RELATIVELY (absolute sign is dominated by the smoothing
    # prior at toy corpus sizes): target-like docs must outrank the spam doc
    assert out[1].dsir_logweight > out[2].dsir_logweight
    assert out[3].dsir_logweight > out[2].dsir_logweight
    assert (out[4].n_grams, out[4].dsir_logweight) == (0, 0.0)
    assert out[1].n_grams == 13 + 12  # unigrams + bigrams
    # weights are a pure function of the inputs (no RNG, no partition seed)
    again = {r.doc_id: r for r in dsir_weights(raw, target, buckets=512).collect()}
    assert all(again[k].dsir_logweight == v.dsir_logweight for k, v in out.items())


def test_hashed_gram_buckets_shape(spark):
    """n tokens -> n unigrams + (n-1) bigrams, all within [0, buckets)."""
    from tilekiln_spark.operators.selection import hashed_gram_buckets

    df = spark.createDataFrame(
        [("alpha beta gamma",), ("solo",), ("",)], "text string"
    )
    rows = df.select(hashed_gram_buckets(F.col("text"), 64).alias("b")).collect()
    assert len(rows[0].b) == 3 + 2
    assert len(rows[1].b) == 1
    assert rows[2].b == []
    assert all(0 <= x < 64 for r in rows for x in r.b)


def test_dsir_resample_gumbel_topk_exact(spark):
    """The Gumbel-max draw is a pure function of (corpus, seed): replaying
    the md5 -> uniform -> -ln(-ln u) perturbation in Python reproduces the
    engine's exact selection and key values."""
    import hashlib
    import math

    from tilekiln_spark.operators.selection import dsir_resample, dsir_weights

    wiki = "the quick brown fox jumps over the lazy dog near the river bank"
    raw = spark.createDataFrame(
        [(i, wiki if i % 3 else "buy cheap pills now click here") for i in range(1, 13)],
        "doc_id long, text string",
    )
    target = spark.createDataFrame([(100, wiki)], "doc_id long, text string")

    w = {r.doc_id: r.dsir_logweight
         for r in dsir_weights(raw, target, buckets=512).collect()}

    def gumbel_key(doc_id):
        h = int(hashlib.md5(f"g42:{doc_id}".encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / 4294967296.0
        return w[doc_id] - math.log(-math.log(u))

    expect = sorted(w, key=lambda d: (-gumbel_key(d), d))[:5]
    got = dsir_resample(raw, target, k=5, buckets=512).collect()
    assert [r.doc_id for r in got] == expect
    for r in got:
        assert r.gumbel_key == __import__("pytest").approx(gumbel_key(r.doc_id), abs=1e-6)
    # same seed -> same draw; different seed -> (generally) different draw
    again = dsir_resample(raw, target, k=5, buckets=512).collect()
    assert [r.doc_id for r in again] == expect


def test_dsir_resample_topk_plan_no_global_sort(spark):
    from tilekiln_spark.operators.selection import dsir_resample

    raw = spark.createDataFrame(
        [(i, f"token{i} filler text") for i in range(40)], "doc_id long, text string"
    )
    target = raw.limit(5)
    plan = dsir_resample(raw, target, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
