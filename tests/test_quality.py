"""Gopher-style document admission gates (operators/quality.py)."""

import pytest
from pyspark.sql import functions as F

from tilekiln_spark.operators.quality import doc_quality_flags

GOOD = "the cat and dog walked to the market for a fresh fish that morning"

DOCS = [
    (1, GOOD),  # kept
    (2, "tiny doc"),  # too_few_words
    (3, " ".join(["word"] * 200)),  # too_many_words (max=100 below)
    (4, "a a a a a b b b b b c c c c c"),  # word_length (mean len 1)
    (5, "- the first item\n- the second item\n- the third item"),  # bullet_lines
    (6, "the start of it...\nthe middle of it...\nthe end of it..."),  # ellipsis
    (7, "the same line here\nthe same line here\nthe same line here"),  # dup_lines
    # dup_ngrams: a repeated phrase, mean word length kept >= 3
    (8, "the quick brown fox jumps the quick brown fox jumps the quick brown fox jumps again yes"),
    # low_alpha_words: digit runs long enough to keep mean word length >= 3
    (9, "the 11111 22222 33333 44444 55555 66666 77777 88888 99999 00000 things that happen"),
    (10, "purple monkey dishwasher quantum banana elephant xylophone guitar"),
    # ^ few_stopwords (0 distinct stopwords)
]


@pytest.fixture(scope="module")
def flagged(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return doc_quality_flags(
        df,
        min_words=5,
        max_words=100,
        max_dup_line_frac=0.5,
        max_dup_ngram_frac=0.5,
    ).collect()


def test_each_gate_fires(flagged):
    by_id = {r.doc_id: r.drop_reason for r in flagged}
    assert by_id == {
        1: None,
        2: "too_few_words",
        3: "too_many_words",
        4: "word_length",
        5: "bullet_lines",
        6: "ellipsis_lines",
        7: "dup_lines",
        8: "dup_ngrams",
        9: "low_alpha_words",
        10: "few_stopwords",
    }


def test_keep_matches_reason(flagged):
    for r in flagged:
        assert r.keep == (r.drop_reason is None)


def test_first_match_precedence(spark):
    # doc is BOTH too short and stopword-free: the earlier gate names it
    df = spark.createDataFrame([(1, "zz qq")], "doc_id long, text string")
    r = doc_quality_flags(df, min_words=5).collect()[0]
    assert r.drop_reason == "too_few_words"


def test_defaults_keep_prose(spark):
    # ~60 tokens of VARIED prose (repeating one sentence would rightly trip
    # the duplicate-ngram gate)
    text = (
        "the quiet morning sun rose over a small town and people walked to "
        "the market for fresh bread that day while children played in the "
        "park and a gentle wind moved through the trees as shopkeepers "
        "opened their doors to greet the first customers of the day with "
        "warm smiles and good cheer for everyone around them all morning"
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = doc_quality_flags(df).collect()[0]
    assert r.keep and r.drop_reason is None


def test_map_only_plan(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = (
        doc_quality_flags(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # one map pass: no shuffle anywhere
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_c4_line_filter_gates(spark):
    """Each line gate fires independently; the page gate needs 3 kept lines
    and no banned page substring."""
    from tilekiln_spark.operators.quality import c4_line_filter

    good = "this line has plenty of words and ends well."
    docs = [
        # 3 good lines + one per failing gate -> page kept, 3/6 lines kept
        (1, "\n".join([good, good, good,
                       "short line here.",                # < 5 words
                       "no terminal punctuation on this line at all",
                       "a javascript mention sinks this entire line."])),
        # only 2 good lines -> page dropped
        (2, "\n".join([good, good])),
        # lorem ipsum anywhere kills the page even with 3 good lines
        (3, "\n".join([good, good, good, "lorem ipsum filler text right here."])),
        # curly brace (code heuristic) kills the page
        (4, "\n".join([good, good, good, "var x = { a: 1 };"])),
        (5, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in c4_line_filter(df).collect()}
    assert (out[1].n_lines, out[1].n_kept_lines, out[1].page_keep) == (6, 3, True)
    assert out[1].text_clean == "\n".join([good, good, good])
    assert (out[2].n_kept_lines, out[2].page_keep) == (2, False)
    assert out[3].n_kept_lines == 4 and not out[3].page_keep
    assert not out[4].page_keep
    assert (out[5].n_kept_lines, out[5].page_keep) == (0, False)


def test_c4_line_filter_map_only(spark):
    from tilekiln_spark.operators.quality import c4_line_filter

    df = spark.createDataFrame([(1, "a b c d e f.")], "doc_id long, text string")
    plan = c4_line_filter(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_zipf_fit_exact_power_law(spark):
    # a corpus engineered so token frequencies are EXACTLY f = 64/rank
    # for ranks 1,2,4,8,...: the log-log fit recovers slope -1
    from tilekiln_spark.functions.text import zipf_fit

    words = []
    # token t{r} appears 420/r times for ranks r = 1..7 (420 = lcm):
    # ln f = ln 420 - ln rank exactly, so OLS recovers slope -1
    for r in range(1, 8):
        words += [f"t{r:03d}"] * (420 // r)
    docs = spark.createDataFrame([(0, " ".join(words))], "doc_id long, text string")
    row = zipf_fit(docs, k=7).collect()[0]
    assert row["n_terms"] == 7
    assert abs(row["slope"] - (-1.0)) < 1e-9
    import math
    assert abs(row["intercept"] - math.log(420.0)) < 1e-9


def test_heaps_law_checkpoints_exact(spark):
    from tilekiln_spark.functions.text import heaps_law

    # 4 docs: doc i introduces exactly one NEW token and repeats 'the'
    docs = spark.createDataFrame(
        [(i, f"the w{i} the") for i in range(4)], "doc_id long, text string")
    out = {r["n_docs"]: r for r in heaps_law(docs, [1, 2, 4]).collect()}
    assert out[1]["n_tokens"] == 3 and out[1]["vocab"] == 2   # the, w0
    assert out[2]["n_tokens"] == 6 and out[2]["vocab"] == 3
    assert out[4]["n_tokens"] == 12 and out[4]["vocab"] == 5
    # beta constant across rows
    assert len({r["beta"] for r in out.values()}) == 1

    import pytest as _pytest
    with _pytest.raises(ValueError):
        heaps_law(docs, [4, 2])


def test_term_dispersion_burstiness(spark):
    from tilekiln_spark.functions.text import term_dispersion

    # 'the' in all 3 docs once (burstiness 1); 'xx' bursty in one doc
    docs = spark.createDataFrame(
        [(0, "the xx xx xx xx"), (1, "the a"), (2, "the b")],
        "doc_id long, text string")
    out = {r["token"]: r for r in term_dispersion(docs, k=10).collect()}
    assert out["the"]["cf"] == 3 and out["the"]["df"] == 3
    assert out["the"]["burstiness"] == 1.0 and out["the"]["doc_frac"] == 1.0
    assert out["xx"]["cf"] == 4 and out["xx"]["df"] == 1
    assert out["xx"]["burstiness"] == 4.0
