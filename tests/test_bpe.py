"""Distributed BPE merge training (functions/bpe.py) vs a pure-Python
reference implementation sharing the same spaced-symbol representation."""

import pytest
from pyspark.sql import functions as F

from tilekiln_spark.functions.bpe import (
    bpe_token_count,
    bpe_train,
    word_counts,
)


def ref_train(wc: dict[str, int], j: int):
    """Reference BPE trainer: same state string, same left-to-right
    non-overlapping str.replace, same (n desc, x, y) tie-break."""
    state = {w: " " + " ".join(w) + " </w> " for w in wc}
    merges = []
    for rnd in range(1, j + 1):
        pairs: dict[tuple[str, str], int] = {}
        for w, s in state.items():
            syms = s.split()
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + wc[w]
        if not pairs:
            break
        (x, y), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rnd, x, y, n))
        state = {w: s.replace(f" {x} {y} ", f" {x}{y} ") for w, s in state.items()}
    return merges


def ref_encode_count(text: str, merges) -> int:
    toks = text.lower().strip().split()
    s = "".join(" " + " ".join(t) + " </w>" for t in toks) + " "
    for _rnd, x, y, _n in merges:
        s = s.replace(f" {x} {y} ", f" {x}{y} ")
    return len(s.split())


CORPUS = [
    (1, "low low low low low"),
    (2, "lower lower"),
    (3, "newest newest newest newest newest newest"),
    (4, "widest widest widest"),
    (5, "aaa aaa"),  # overlap case: 'a a a' merges left-to-right
]


def _wc(rows):
    wc: dict[str, int] = {}
    for _id, t in rows:
        for w in t.lower().split():
            wc[w] = wc.get(w, 0) + 1
    return wc


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_merges_match_reference(docs):
    got = bpe_train(docs, num_merges=8)
    assert got == ref_train(_wc(CORPUS), 8)
    # the overlap word contributed: every round's pair count is positive
    assert all(n > 0 for _r, _x, _y, n in got)


def test_tie_break_is_lexicographic(spark):
    # word 'ba' x1: pairs (b,a) and (a,</w>) both n=1 -> (a,</w>) wins
    d = spark.createDataFrame([(1, "ba")], "doc_id long, text string")
    got = bpe_train(d, num_merges=1)
    assert got == [(1, "a", "</w>", 1)]


def test_early_stop_when_fully_merged(spark):
    # single word 'ab': (a,b) then (ab,</w>) then nothing left
    d = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    got = bpe_train(d, num_merges=10)
    assert [(x, y) for _r, x, y, _n in got] == [("a", "b"), ("ab", "</w>")]


def test_encode_count_matches_reference(docs):
    merges = bpe_train(docs, num_merges=6)
    out = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", bpe_token_count(F.col("text"), merges).alias("n")
        ).collect()
    }
    for did, text in CORPUS:
        assert out[did] == ref_encode_count(text, merges), (did, text)
    # sanity: merging strictly shrinks the frequent words' token count
    assert out[3] < ref_encode_count(CORPUS[2][1], [])


def test_word_counts_is_take_ordered(docs):
    plan = word_counts(docs, v_words=10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_pruned_vocab_bounds_training(docs):
    # v_words=1 keeps only 'newest' (c=6): merges learned from it alone
    got = bpe_train(docs, num_merges=2, v_words=1)
    assert got == ref_train({"newest": 6}, 2)


def test_bpe_handles_regex_special_tokens(spark):
    """Merges apply literally: tokens with regex metacharacters ('.', '*',
    parens) train and encode without pattern interpretation."""
    rows = [(1, "a.b a.b a.b (x* (x*")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = bpe_train(d, num_merges=4)
    assert got == ref_train(_wc(rows), 4)
    merges = got
    out = d.select(bpe_token_count(F.col("text"), merges).alias("n")).collect()[0].n
    assert out == ref_encode_count(rows[0][1], merges)
