"""BM25 top-k (operators/retrieval.py) vs a pure-Python reference."""

import math

import pytest

from tilekiln_spark.operators.retrieval import bm25_topk

CORPUS = [
    (1, "spark window table spark spark"),
    (2, "table table table table window"),
    (3, "the cat sat on the mat"),
    (4, "window"),
    (5, "spark table"),
]


def ref_bm25(rows, terms, k1=1.2, b=0.75):
    docs = {i: t.lower().split() for i, t in rows}
    n = len(docs)
    avgdl = sum(len(v) for v in docs.values()) / n
    df = {t: sum(1 for v in docs.values() if t in v) for t in terms}
    out = {}
    for i, v in docs.items():
        s = 0.0
        for t in terms:
            tf = v.count(t)
            if tf == 0 or df[t] == 0:
                continue
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl))
        if s > 0:
            out[i] = round(s, 6)
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_bm25_scores_match_reference(docs):
    got = {r.doc_id: r.score for r in bm25_topk(docs, ["spark", "window"]).collect()}
    exp = ref_bm25(CORPUS, ["spark", "window"])
    assert set(got) == set(exp)  # doc 3 shares no term: zero rows, absent
    for i in exp:
        assert got[i] == pytest.approx(exp[i], abs=2e-6), i


def test_bm25_topk_cut_is_deterministic(docs):
    top2 = [r.doc_id for r in bm25_topk(docs, ["spark", "window"], k=2).collect()]
    exp = sorted(
        ref_bm25(CORPUS, ["spark", "window"]).items(),
        key=lambda kv: (-kv[1], kv[0]),
    )[:2]
    assert top2 == [i for i, _s in exp]


def test_bm25_query_casefolds(docs):
    a = {r.doc_id: r.score for r in bm25_topk(docs, ["SPARK"]).collect()}
    c = {r.doc_id: r.score for r in bm25_topk(docs, ["spark"]).collect()}
    assert a == c and 1 in a


def test_bm25_plan_take_ordered_and_filtered_explode(docs):
    plan = (
        bm25_topk(docs, ["spark"])._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan  # df join is broadcast


def test_rrf_fuse_exact(spark):
    from tilekiln_spark.operators.retrieval import rrf_fuse

    lex = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rank int")
    vec = spark.createDataFrame([(2, 1), (4, 2)], "doc_id long, rank int")
    got = {r.doc_id: r.rrf for r in rrf_fuse([lex, vec]).collect()}
    assert got[2] == pytest.approx(1 / 62 + 1 / 61, abs=1e-9)  # in both lists
    assert got[1] == pytest.approx(1 / 61, abs=1e-9)
    assert got[4] == pytest.approx(1 / 62, abs=1e-9)
    assert set(got) == {1, 2, 3, 4}
    # doc in both lists outranks the top of either single list
    assert got[2] > got[1] and got[2] > got[4]


def test_tfidf_keywords_reference_and_cut(spark):
    import math as m

    from tilekiln_spark.operators.retrieval import tfidf_keywords

    rows = [
        (1, "apple apple banana cherry"),
        (2, "banana banana banana date"),
        (3, "apple date date cherry"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.pos): (r.term, r.score)
        for r in tfidf_keywords(docs, n_keywords=2).collect()
    }

    def idf(df):
        return m.log((3 + 1) / (df + 1)) + 1

    # doc 1: apple tf=2 df=2 -> 2*idf(2); banana/cherry tf=1 (df 2 each):
    # tie on score -> 'banana' wins lexicographically
    assert got[(1, 1)][0] == "apple"
    assert got[(1, 1)][1] == pytest.approx(round(2 * idf(2), 6), abs=1e-6)
    assert got[(1, 2)][0] == "banana"
    # doc 2: banana tf=3 dominates; date second
    assert got[(2, 1)][0] == "banana"
    assert got[(2, 2)][0] == "date"
    # doc 3: date tf=2
    assert got[(3, 1)][0] == "date"
    assert len(got) == 6  # exactly n per doc


def test_tfidf_plan_uses_window_group_limit(spark):
    from tilekiln_spark.operators.retrieval import tfidf_keywords

    docs = spark.createDataFrame(
        [(i, "a b c") for i in range(10)], "doc_id long, text string"
    )
    plan = tfidf_keywords(docs)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
