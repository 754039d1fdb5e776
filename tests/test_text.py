

def test_collocations_hand_values(spark):
    """Corpus 'a b a b': T=4, c(a)=c(b)=2, Nb=3, c12(a,b)=2 ->
    PMI = log2(32/12), t = (2 - 0.75)/sqrt(2)."""
    import math

    from tilekiln_spark.functions.text import collocations

    df = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string")
    rows = {(r.w1, r.w2): r for r in collocations(df, min_count=1).collect()}
    ab = rows[("a", "b")]
    assert ab.c12 == 2
    assert ab.pmi == round(math.log2(32 / 12), 6)
    assert ab.t_score == round((2 - 0.75) / math.sqrt(2), 6)
    assert rows[("b", "a")].c12 == 1


def test_phrase_search_positions_and_counts(spark):
    """Phrase at start, repeated, overlapping-adjacent; absent term
    sequences match nothing."""
    from tilekiln_spark.operators.retrieval import phrase_search

    df = spark.createDataFrame(
        [
            (1, "big data rocks big data rocks"),
            (2, "data big rocks"),
            (3, "x big data y"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_matches, r.first_pos)
        for r in phrase_search(df, ["big", "data"]).collect()
    }
    assert out == {1: (2, 1), 3: (1, 2)}


def test_ed1_pairs_classes(spark):
    """Substitution, deletion, and insertion pairs found; distance-2
    pairs (incl. transpositions sharing a variant) filtered out."""
    from tilekiln_spark.operators.dedup import ed1_pairs

    df = spark.createDataFrame(
        [("cat",), ("cut",), ("cats",), ("at",), ("act",), ("dog",)],
        "s string",
    )
    got = sorted((r.s1, r.s2, r.dist) for r in ed1_pairs(df, "s").collect())
    assert ("cat", "cut", 1) in got          # substitution
    assert ("at", "cat", 1) in got           # insertion
    assert ("cat", "cats", 1) in got         # deletion
    assert not any({a, b} == {"act", "cat"} for a, b, _ in got)  # transposition = 2
    assert not any("dog" in (a, b) for a, b, _ in got)


def test_keyness_hand_values(spark):
    """A = 'x x x y', B = 'y y y y x': G2 for x from the closed form;
    direction flags exact; singleton tokens filtered by min_count."""
    import math

    from tilekiln_spark.functions.text import keyness

    a = spark.createDataFrame([(1, "x x x y")], "doc_id long, text string")
    b = spark.createDataFrame([(2, "y y y y x")], "doc_id long, text string")
    rows = {r.token: r for r in keyness(a, b, min_count=2).collect()}
    x = rows["x"]
    assert (x.cnt_a, x.cnt_b, x.overused) == (3, 1, True)
    exp = 2 * (3 * math.log(3 * 9 / (4 * 4)) + 1 * math.log(1 * 9 / (5 * 4)))
    assert x.g2 == round(exp, 6)
    y = rows["y"]
    assert (y.cnt_a, y.cnt_b, y.overused) == (1, 4, False)


def test_cavnar_trenkle_classifies_distinct_char_profiles(spark):
    """Two classes with disjoint character inventories classify
    perfectly; the out-of-place distance to the true class is lower."""
    from tilekiln_spark.functions.text import cavnar_trenkle

    rows = []
    for i in range(8):
        rows.append((i * 2, "aaa", "alpha banana cabana salad " * 3))
        rows.append((i * 2 + 1, "zzz", "zigzag puzzle fuzzy buzz " * 3))
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = cavnar_trenkle(
        df.where("doc_id % 2 = 0 or lang = 'zzz'").where("doc_id < 8"),
        df.where("doc_id >= 8"),
        k=20, min_count=1,
    ).collect()
    assert len(out) == 8
    assert all(r.true_class == r.pred_class for r in out)


def test_dist_compare_hand_values(spark):
    """Base {0, 10} vs class b shifted {5, 15}: W1 = 5 (shift distance),
    KS = 0.5; identical class c scores 0/0."""
    from tilekiln_spark.functions.text import dist_compare

    rows = [("en", 0), ("en", 10), ("bb", 5), ("bb", 15), ("cc", 0), ("cc", 10)]
    df = spark.createDataFrame(rows, "lang string, n_chars long")
    out = {r.cls: (r.w1, r.ks) for r in dist_compare(df, "en").collect()}
    assert out["bb"] == (5.0, 0.5)
    assert out["cc"] == (0.0, 0.0)


def test_contingency_chi2_hand_table(spark):
    """2x2 table [[10, 0], [0, 10]] (perfect association): chi2 = N,
    V = 1; a uniform independent table scores 0."""
    from tilekiln_spark.functions.text import contingency_chi2

    assoc = [("x", "p")] * 10 + [("y", "q")] * 10
    df = spark.createDataFrame(assoc, "a string, b string")
    r = contingency_chi2(df, "a", "b").collect()[0]
    assert (r.n, r.dof, r.chi2, r.cramers_v) == (20, 1, 20.0, 1.0)

    indep = [("x", "p")] * 5 + [("x", "q")] * 5 + [("y", "p")] * 5 + [("y", "q")] * 5
    r2 = contingency_chi2(
        spark.createDataFrame(indep, "a string, b string"), "a", "b"
    ).collect()[0]
    assert (r2.chi2, r2.cramers_v) == (0.0, 0.0)


def test_mann_whitney_hand_values(spark):
    """en = {1, 2}, bb = {3, 4}: complete separation -> U = 0,
    rank-biserial = -1; cc = {1, 2} identical -> U = n1*n2/2, rb = 0."""
    from tilekiln_spark.functions.text import mann_whitney

    rows = [("en", 1), ("en", 2), ("bb", 3), ("bb", 4), ("cc", 1), ("cc", 2)]
    df = spark.createDataFrame(rows, "lang string, n_chars long")
    out = {r.cls: (r.u, r.rank_biserial) for r in
           mann_whitney(df, "en").collect()}
    assert out["bb"] == (0.0, -1.0)
    assert out["cc"] == (2.0, 0.0)


def test_spearman_rho_monotone_and_ties(spark):
    """A strictly increasing relation scores rho = 1 regardless of
    scale; reversing one column flips the sign."""
    from tilekiln_spark.functions.text import spearman_rho

    up = spark.createDataFrame(
        [(i, i * i) for i in range(1, 9)], "x long, y long"
    )
    assert spearman_rho(up, "x", "y").collect()[0].rho == 1.0
    dn = spark.createDataFrame(
        [(i, -i * i) for i in range(1, 9)], "x long, y long"
    )
    assert spearman_rho(dn, "x", "y").collect()[0].rho == -1.0


def test_kendall_tau_hand_values(spark):
    """Strictly monotone -> tau = 1; one swapped pair among 4 points
    gives (C - D)/n0 = (5 - 1)/6; ties corrected via tau-b."""
    from tilekiln_spark.functions.text import kendall_tau

    up = spark.createDataFrame(
        [(i, i, i * 2) for i in range(5)], "doc_id long, x long, y long"
    )
    r = kendall_tau(up, "x", "y").collect()[0]
    assert (r.n, r.tau_b) == (5, 1.0)

    sw = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 3), (2, 3, 2), (3, 4, 4)],
        "doc_id long, x long, y long",
    )
    r2 = kendall_tau(sw, "x", "y").collect()[0]
    assert (r2.concordant, r2.discordant) == (5, 1)
    assert r2.tau_b == round(4 / 6, 6)


def test_robust_center_hand_values(spark):
    """{1,2,3,4,100}: median 3, deviations {2,1,0,1,97} -> MAD 1,
    outlier = the single 97 > 3; even-n medians interpolate to halves."""
    from tilekiln_spark.functions.text import robust_center

    df = spark.createDataFrame(
        [("a", v) for v in (1, 2, 3, 4, 100)] + [("b", v) for v in (1, 2, 3, 4)],
        "lang string, n_chars long",
    )
    out = {r.cls: (r.n, r.median, r.mad, r.n_outliers)
           for r in robust_center(df).collect()}
    assert out["a"] == (5, 3.0, 1.0, 1)
    assert out["b"] == (4, 2.5, 1.0, 0)


def test_benford_digits_extraction_and_grid(spark):
    """First digits of {1, 19, 150, 2000, 90}: counts land on 1 (x3),
    2, 9; absent digits appear with observed 0; zero values excluded."""
    from tilekiln_spark.functions.text import benford_digits

    df = spark.createDataFrame(
        [(v,) for v in (1, 19, 150, 2000, 90, 0)], "n_chars long"
    )
    out = {r.digit: r.observed for r in benford_digits(df).collect()}
    assert out == {1: 3, 2: 1, 3: 0, 4: 0, 5: 0, 6: 0, 7: 0, 8: 0, 9: 1}


def test_theil_sen_robust_to_outlier(spark):
    """Points on y = 2x + 1 with one wild outlier: the median slope
    stays 2 and the intercept stays 1 (OLS would not)."""
    from tilekiln_spark.functions.text import theil_sen

    rows = [(i, i, 2 * i + 1) for i in range(9)] + [(9, 9, 500)]
    df = spark.createDataFrame(rows, "doc_id long, x long, y long")
    r = theil_sen(df, "x", "y").collect()[0]
    assert (r.slope, r.intercept) == (2.0, 1.0)
    assert r.n_points == 10 and r.n_slopes == 45


def test_theil_sen_no_global_window(spark):
    """The O(n^2) slope multiset must never funnel through a
    SinglePartition window sort: every window in the executed plan is
    partitioned by the range-partition id (the packing.py two-pass
    median), so the only SinglePartition exchanges left are the 1-row
    final aggregates."""
    from tilekiln_spark.functions.text import theil_sen

    rows = [(i, i, 2 * i + 1) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, x long, y long")
    out = theil_sen(df, "x", "y")
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition(" in line:
            assert "__pid" in line, line


def test_positional_median_matches_sorted(spark):
    """_positional_median == the exact position-formula median for odd
    and even counts, including duplicate values straddling partition
    boundaries."""
    from tilekiln_spark.functions.text import _positional_median

    for vals in (
        [5.0, 1.0, 9.0],                      # odd
        [4.0, 1.0, 3.0, 2.0],                 # even -> mean of middles
        [2.0] * 10 + [1.0, 3.0],              # heavy ties
        [7.5],                                # single row
    ):
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        med, m = _positional_median(df, "v")
        got = med.collect()[0]["__med"]
        s = sorted(vals)
        exp = (s[(len(s) + 1) // 2 - 1] + s[len(s) // 2]) / 2.0
        assert m == len(vals)
        assert got == exp, (vals, got, exp)
