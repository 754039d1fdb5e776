

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


def test_duplicate_spans_counts_cross_doc_windows(spark):
    """A window counts as duplicated only when its exact 3-token content
    occurs in >= min_docs DISTINCT docs; within-doc repeats alone don't
    qualify, but every position of a cross-doc span counts."""
    from tilekiln_spark.operators.dedup import duplicate_spans

    rows = [
        (1, "alpha beta gamma delta"),        # windows: abc, bcd — both shared with doc 2
        (2, "alpha beta gamma delta epsilon"),
        (3, "zz yy zz yy zz yy"),             # repeats within doc only
        (4, "one two"),                        # too short for window=3
        (5, ""),                               # empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in duplicate_spans(df, window=3).collect()}
    assert (out[1].n_windows, out[1].n_dup_windows) == (2, 2)
    assert out[1].dup_ratio == 1.0
    assert (out[2].n_windows, out[2].n_dup_windows) == (3, 2)
    assert (out[3].n_windows, out[3].n_dup_windows) == (4, 0)
    assert (out[4].n_windows, out[4].n_dup_windows) == (0, 0)
    assert out[4].dup_ratio == 0.0
    assert (out[5].n_windows, out[5].n_dup_windows) == (0, 0)


def test_cluster_safe_split_never_straddles(spark):
    """Every member of a cluster gets the same split label; the draw is a
    pure function of (seed, cluster_id)."""
    from tilekiln_spark.operators.sampling import cluster_safe_split

    rows = [(i, i % 7) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, cluster_id long")
    out = cluster_safe_split(df, holdout_fraction=0.5, seed=3).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, set()).add(r.split)
    assert all(len(s) == 1 for s in by_cluster.values())
    labels = {s for ss in by_cluster.values() for s in ss}
    assert labels == {"train", "holdout"}  # 0.5 over 7 clusters hits both
    # determinism: rerun is identical
    again = cluster_safe_split(df, holdout_fraction=0.5, seed=3).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_containment_pairs_snippet_vs_jaccard(spark):
    """A 5-token snippet of a 50-token doc: containment(snippet) = 1.0
    while Jaccard stays small; unrelated docs produce no pair."""
    from tilekiln_spark.operators.dedup import containment_pairs

    base = " ".join(f"w{i}" for i in range(50))
    snip = " ".join(f"w{i}" for i in range(5))
    other = " ".join(f"z{i}" for i in range(30))
    df = spark.createDataFrame(
        [(1, base), (2, snip), (3, other)], "doc_id long, text string"
    )
    rows = {(r.key_a, r.key_b): r for r in
            containment_pairs(df, k=3, min_shared=2, max_df=10).collect()}
    p = rows[(1, 2)]
    assert p.shared == 3            # snippet has 3 trigram shingles
    assert p.cont_b == 1.0          # all of the snippet is inside the doc
    assert p.cont_a == round(3 / 48, 6)
    assert p.jaccard == round(3 / 48, 6)
    assert not any(3 in k for k in rows)
