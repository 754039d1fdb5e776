

def test_host_cap_semantics(spark):
    """Cap respected per registrable domain; winners deterministic and
    md5-ordered (NOT a doc_id-prefix cut)."""
    import pyspark.sql.functions as F

    from tilekiln_spark.operators.webstats import host_cap

    rows = [(i, f"https://sub{i % 3}.dom{i % 2}.example.com/p{i}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = host_cap(df, per_domain=10)
    kept = out.filter("keep")
    counts = {r.domain: r.n for r in kept.groupBy("domain").agg(F.count("*").alias("n")).collect()}
    assert counts == {"example.com": 10}
    # deterministic winners across runs
    a = sorted(r.doc_id for r in kept.collect())
    b = sorted(r.doc_id for r in host_cap(df, per_domain=10).filter("keep").collect())
    assert a == b
    # not a prefix cut: winners are md5-scattered, not doc_id 0..9
    assert a != list(range(10))
    # every row keeps its flags for funnel accounting
    assert out.count() == 200
