

def test_lsh_bucket_cap_drops_megabuckets(spark):
    """max_bucket bounds the band self-join's quadratic output: an
    over-cap boilerplate bucket is dropped from pairing (exact dedup owns
    identical text), small buckets are untouched."""
    from tilekiln_spark.operators.dedup import minhash_lsh_pairs

    rows = [(i, "the same boilerplate navigation text repeated") for i in range(6)]
    rows += [(100, "a genuinely unique document about rivers and mountains here"),
             (101, "a genuinely unique document about rivers and mountains here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # identical docs collide in EVERY band -> bucket size 6 > cap 4 -> dropped;
    # the pair of near-identical docs (bucket size 2) survives
    capped = minhash_lsh_pairs(df, max_bucket=4).collect()
    got = {(r.key_a, r.key_b) for r in capped}
    assert got == {(100, 101)}
    # uncapped: the boilerplate 6-clique (15 pairs) + the unique pair
    full = minhash_lsh_pairs(df, max_bucket=None).collect()
    assert len(full) == 16


def test_simhash_bucket_cap_drops_megabuckets(spark):
    """simhash_pairs carries the same guard: identical docs share one
    simhash (collide in every block); an over-cap block is dropped from
    the self-join while small blocks pair normally."""
    from tilekiln_spark.operators.dedup import simhash_pairs

    rows = [(i, "the same boilerplate navigation text repeated") for i in range(6)]
    rows += [(100, "a genuinely unique document about rivers and mountains here"),
             (101, "a genuinely unique document about rivers and mountains here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = simhash_pairs(df, max_bucket=4).collect()
    got = {(r.key_a, r.key_b) for r in capped}
    assert got == {(100, 101)}
    full = simhash_pairs(df, max_bucket=None).collect()
    assert len(full) == 16
