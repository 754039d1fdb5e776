"""Pruned bigram LM with stupid backoff (functions/lm.py)."""

import math

import pytest
from pyspark.sql import functions as F

from tilekiln_spark.functions.lm import (
    BACKOFF,
    UNSEEN_COUNT,
    lm_doc_scores,
    train_bigram_lm,
)

CORPUS = [
    (1, "a b a b c"),
    (2, "a a a a"),
    (3, "x y"),
    (4, "z"),  # single token: no bigrams, absent from scores
    (5, ""),  # empty: no tokens at all
]
# token counts: a=6 b=2 c=1 x=1 y=1 z=1; T=12
# bigram counts: (a,b)=2 (b,a)=1 (b,c)=1 (a,a)=3 (x,y)=1


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_train_counts_and_pruning(docs):
    lm = train_bigram_lm(docs, k_vocab=2, m_bigrams=2)
    assert lm.total_tokens == 12
    uni = {r.token: r.c for r in lm.uni.collect()}
    assert uni == {"a": 6, "b": 2}  # tie at c=1 never reaches the cut
    bi = {(r.w1, r.w2): r.c for r in lm.bi.collect()}
    assert bi == {("a", "a"): 3, ("a", "b"): 2}  # ties broken by (w1, w2)


def test_pruning_tie_break_is_total(docs):
    # c=1 four-way unigram tie (c, x, y, z): the cut keeps the
    # lexicographically smallest, deterministically
    lm = train_bigram_lm(docs, k_vocab=4, m_bigrams=10)
    uni = {r.token: r.c for r in lm.uni.collect()}
    assert uni == {"a": 6, "b": 2, "c": 1, "x": 1}


def test_scores_exact_all_three_branches(docs):
    """Hand-computed stupid-backoff scores exercise every CASE branch."""
    lm = train_bigram_lm(docs, k_vocab=2, m_bigrams=2)
    out = {r.doc_id: r for r in lm_doc_scores(docs, lm).collect()}
    T = 12.0

    def uni_backoff(c2):
        return math.log(BACKOFF * c2 / T)

    floor = math.log(BACKOFF * UNSEEN_COUNT / T)
    # doc 1 "a b a b c": (a,b) kept -> ln(2/6); (b,a) pruned, a in vocab ->
    # backoff ln(.4*6/12); (a,b) again; (b,c) pruned, c OOV -> floor
    lp1 = [math.log(2 / 6), uni_backoff(6), math.log(2 / 6), floor]
    assert out[1].n_bigrams == 4
    assert out[1].avg_logprob == pytest.approx(sum(lp1) / 4, abs=1e-6)
    # doc 2 "a a a a": (a,a) kept 3x -> ln(3/6)
    assert out[2].n_bigrams == 3
    assert out[2].avg_logprob == pytest.approx(math.log(3 / 6), abs=1e-6)
    # doc 3 "x y": bigram pruned AND y OOV -> floor
    assert out[3].n_bigrams == 1
    assert out[3].avg_logprob == pytest.approx(floor, abs=1e-6)
    # docs 4 (one token) and 5 (empty) have no bigrams -> no row
    assert set(out) == {1, 2, 3}


def test_repetitive_text_scores_higher_than_rare(spark):
    """The quality-filter property: text made of corpus-frequent patterns
    scores a higher avg_logprob than text of corpus-rare tokens."""
    rows = [(i, "the cat sat on the mat") for i in range(20)]
    rows += [(100, "the cat sat on the mat"), (101, "zq wv kx jy qq vz")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # prune to top-5: the singleton tokens/bigrams of doc 101 fall out (an
    # UNPRUNED stupid backoff scores a one-off deterministic continuation
    # ln(1/1)=0 — pruning is what makes rare text surprising)
    lm = train_bigram_lm(docs, k_vocab=5, m_bigrams=5)
    out = {r.doc_id: r.avg_logprob for r in lm_doc_scores(docs, lm).collect()}
    assert out[100] > out[101]


def test_scoring_joins_are_broadcast(docs):
    """The LM is bounded by construction; all three lookups must be
    broadcast hash joins (no token-stream shuffle in the plan)."""
    lm = train_bigram_lm(docs, k_vocab=2, m_bigrams=2)
    plan = lm_doc_scores(docs, lm)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan


def test_score_new_documents_with_trained_lm(docs, spark):
    """Train/score split: the LM scores documents it never saw."""
    lm = train_bigram_lm(docs, k_vocab=2, m_bigrams=2)
    new = spark.createDataFrame([(9, "a b q")], "doc_id long, text string")
    r = lm_doc_scores(new, lm).collect()[0]
    # (a,b) kept -> ln(2/6); (b,q) q unseen -> floor
    exp = (math.log(2 / 6) + math.log(BACKOFF * UNSEEN_COUNT / 12.0)) / 2
    assert r.n_bigrams == 2 and r.avg_logprob == pytest.approx(exp, abs=1e-6)


# ---------------------------------------------------------------------------
# CCNet head/middle/tail bucketing
# ---------------------------------------------------------------------------

BUCKET_CORPUS = [
    # en: 6 scoreable docs built from one shared phrase pool so the pruned
    # LM ranks them deterministically (more corpus-frequent bigrams ->
    # higher avg_logprob)
    (1, "the cat sat", "en"),
    (2, "the cat sat the cat", "en"),
    (3, "the cat", "en"),
    (4, "qq zz xx", "en"),
    (5, "the cat sat qq", "en"),
    (6, "zz the", "en"),
    # de: a single scoreable doc (rank rule must put n=1 in head)
    (7, "der hund lief", "de"),
    # one-token doc: no bigrams, absent from the output
    (8, "einzeln", "de"),
]


@pytest.fixture(scope="module")
def bucket_docs(spark):
    return spark.createDataFrame(
        BUCKET_CORPUS, "doc_id long, text string, lang string"
    )


def test_ccnet_buckets_exact_thirds(bucket_docs):
    from tilekiln_spark.functions.lm import ccnet_buckets

    lm = train_bigram_lm(bucket_docs, k_vocab=6, m_bigrams=6)
    out = {r.doc_id: r for r in
           ccnet_buckets(bucket_docs, lm, lang_col="lang").collect()}
    # doc 8 has no bigrams -> absent
    assert set(out) == {1, 2, 3, 4, 5, 6, 7}
    # en: n=6 -> ceil(6/3)=2 head, ceil(12/3)=4 -> ranks 3-4 middle, 5-6 tail
    en = sorted(
        (r for r in out.values() if r.lang == "en"),
        key=lambda r: (-r.avg_logprob, r.doc_id),
    )
    assert [r.bucket for r in en] == [
        "head", "head", "middle", "middle", "tail", "tail"
    ]
    # the ordering itself must be by score: head docs outscore tail docs
    assert en[0].avg_logprob >= en[-1].avg_logprob
    # de: n=1 -> rank 1, 3*1 <= 1+2 -> head
    assert out[7].bucket == "head"
    lm.unpersist()


def test_ccnet_buckets_derives_lang_when_missing(bucket_docs):
    from tilekiln_spark.functions.lm import ccnet_buckets

    lm = train_bigram_lm(bucket_docs, k_vocab=6, m_bigrams=6)
    out = ccnet_buckets(bucket_docs.drop("lang"), lm).collect()
    # lang_id marks "the ..." docs en; the marker-free ones fall to 'und'
    langs = {r.doc_id: r.lang for r in out}
    assert langs[1] == "en" and langs[4] == "und"
    lm.unpersist()


def test_ccnet_buckets_cutoff_mode_is_map_only(bucket_docs):
    from tilekiln_spark.functions.lm import ccnet_buckets

    lm = train_bigram_lm(bucket_docs, k_vocab=6, m_bigrams=6)
    exact = {r.doc_id: r for r in
             ccnet_buckets(bucket_docs, lm, lang_col="lang").collect()}
    # thresholds straddling the exact en ranking: head_min between the
    # 2nd and 3rd score, middle_min between the 4th and 5th -> cutoff
    # mode reproduces the exact thirds on this fixture
    en_scores = sorted(
        (r.avg_logprob for r in exact.values() if r.lang == "en"), reverse=True
    )
    cuts = {
        "en": (
            (en_scores[1] + en_scores[2]) / 2,
            (en_scores[3] + en_scores[4]) / 2,
        ),
        "de": (exact[7].avg_logprob, exact[7].avg_logprob),
    }
    bucketed = ccnet_buckets(bucket_docs, lm, lang_col="lang", cutoffs=cuts)
    got = {r.doc_id: r.bucket for r in bucketed.collect()}
    assert got == {k: v.bucket for k, v in exact.items()}
    # the scale contract: no window/per-language sort anywhere in the plan
    # (the doc_id-keyed scores<->lang join may be SMJ — AQE's call); the
    # #languages-row cuts table must come in broadcast
    plan = bucketed._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan
    lm.unpersist()


def test_ccnet_cutoffs_estimates_per_language(bucket_docs):
    from tilekiln_spark.functions.lm import ccnet_buckets, ccnet_cutoffs

    lm = train_bigram_lm(bucket_docs, k_vocab=6, m_bigrams=6)
    cuts = ccnet_cutoffs(bucket_docs, lm, lang_col="lang")
    assert set(cuts) == {"en", "de"}
    for head_min, middle_min in cuts.values():
        assert head_min >= middle_min
    out = ccnet_buckets(bucket_docs, lm, lang_col="lang", cutoffs=cuts)
    rows = out.collect()
    # estimated thresholds still give a monotone split: every head score
    # >= every middle score >= every tail score, within each language
    for lang in ("en", "de"):
        by_bucket = {"head": [], "middle": [], "tail": []}
        for r in rows:
            if r.lang == lang:
                by_bucket[r.bucket].append(r.avg_logprob)
        for hi, lo in (("head", "middle"), ("middle", "tail")):
            if by_bucket[hi] and by_bucket[lo]:
                assert min(by_bucket[hi]) >= max(by_bucket[lo])
    lm.unpersist()


# ---------------------------------------------------------------------------
# trigram chained backoff
# ---------------------------------------------------------------------------

TRI_CORPUS = [
    (1, "a b c a b c"),
    (2, "a b d"),
    (3, "x y"),  # no trigram: absent from scores
]
# uni: a=3 b=3 c=2 d=1 x=1 y=1; T=11
# bi: (a,b)=3 (b,c)=2 (c,a)=1 (b,d)=1 (x,y)=1
# tri: (a,b,c)=2 (b,c,a)=1 (c,a,b)=1 (a,b,d)=1


def test_trigram_chained_backoff_exact(spark):
    from tilekiln_spark.functions.lm import lm3_doc_scores, train_trigram_lm

    docs = spark.createDataFrame(TRI_CORPUS, "doc_id long, text string")
    # prune to: uni {a,b,c}, bi {(a,b),(b,c)}, tri {(a,b,c)}
    lm = train_trigram_lm(docs, k_vocab=3, m_bigrams=2, p_trigrams=1)
    assert lm.base.total_tokens == 11
    assert {(r.w1, r.w2, r.w3): r.c for r in lm.tri.collect()} == {("a", "b", "c"): 2}
    out = {r.doc_id: r for r in lm3_doc_scores(docs, lm).collect()}
    T = 11.0
    # doc 1: (a,b,c) kept twice -> ln(2/3); (b,c,a): tri pruned, (c,a) bi
    # pruned, uni(a)=3 -> ln(.4 * .4*3/T); (c,a,b): tri pruned, (a,b) kept
    # with uni(a)=3 -> ln(.4 * 3/3)
    lp1 = [
        math.log(2 / 3), math.log(2 / 3),
        math.log(0.4 * 0.4 * 3 / T),
        math.log(0.4 * 1.0),
    ]
    assert out[1].n_trigrams == 4
    assert out[1].avg_logprob == pytest.approx(sum(lp1) / 4, abs=1e-6)
    # doc 2: (a,b,d): everything pruned down to the floor
    assert out[2].n_trigrams == 1
    assert out[2].avg_logprob == pytest.approx(
        math.log(0.4 * 0.4 * 0.5 / T), abs=1e-6
    )
    assert set(out) == {1, 2}
    lm.unpersist()


def test_trigram_scoring_is_broadcast_only(spark):
    from tilekiln_spark.functions.lm import lm3_doc_scores, train_trigram_lm

    docs = spark.createDataFrame(TRI_CORPUS, "doc_id long, text string")
    lm = train_trigram_lm(docs, k_vocab=3, m_bigrams=2, p_trigrams=1)
    plan = lm3_doc_scores(docs, lm)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 5
    assert "SortMergeJoin" not in plan
    lm.unpersist()


def test_ccnet_buckets_missing_language_gets_null_bucket(bucket_docs):
    """A language absent from the cutoffs table classifies as NULL, never
    a silent 'tail' (review fix)."""
    from tilekiln_spark.functions.lm import ccnet_buckets

    lm = train_bigram_lm(bucket_docs, k_vocab=6, m_bigrams=6)
    cuts = {"en": (-1.0, -2.0)}        # no 'de' entry
    out = {r.doc_id: r for r in
           ccnet_buckets(bucket_docs, lm, lang_col="lang", cutoffs=cuts).collect()}
    assert out[7].bucket is None       # de doc: unclassified, not 'tail'
    assert all(r.bucket in ("head", "middle", "tail")
               for r in out.values() if r.lang == "en")
