"""Gopher-style document admission gates — the doc-level quality funnel.

The webtext counterpart of webstats.url_filter_flags: annotate every
document with ``keep`` + a first-match ``drop_reason`` drawn from the
MassiveText/Gopher filtering rules (Rae et al. 2021, Appendix A), so a
100 TB ingest both FILTERS and ACCOUNTS (funnel rows per gate) in one
map-only pass — every gate is a pure codegen expression over the shared
dedup tokenizer; no UDF, no shuffle, no second scan.

Gate order is fixed so ``drop_reason`` is deterministic:

1. ``too_few_words`` / 2. ``too_many_words`` — token-count bounds
3. ``word_length``   — mean token length outside [min, max]
4. ``bullet_lines``  — > max_bullet fraction of lines start with a bullet
5. ``ellipsis_lines``— > max_ellipsis fraction of lines end in '...'
6. ``dup_lines``     — duplicate-line fraction above threshold
7. ``dup_ngrams``    — duplicate token-bigram fraction above threshold
8. ``low_alpha_words`` — < min_alpha_frac of tokens contain a letter
9. ``few_stopwords`` — fewer than min_stopwords DISTINCT stopwords

Defaults follow Gopher's published values where one exists; every
threshold is a kwarg because real pipelines tune them per source.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tilekiln_spark.functions.text import (
    STOPWORDS,
    bullet_line_fraction,
    dup_line_fraction,
    dup_ngram_fraction,
    ellipsis_line_fraction,
)


def _mean_token_len(toks: Column, n: Column) -> Column:
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(n > 0, total.cast("double") / n).otherwise(F.lit(0.0))


def _alpha_word_fraction(toks: Column, n: Column) -> Column:
    hits = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))


def _distinct_stopwords(toks: Column) -> Column:
    stop = F.array(*[F.lit(w) for w in STOPWORDS])
    return F.size(F.array_intersect(F.array_distinct(toks), stop))


def doc_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    max_dup_line_frac: float = 0.3,
    max_dup_ngram_frac: float = 0.2,
    min_alpha_frac: float = 0.8,
    min_stopwords: int = 2,
) -> DataFrame:
    """Annotate rows with ``keep`` + first-match ``drop_reason`` (NULL when
    kept).  Callers ``.filter("keep")``; the flags stay available for
    funnel accounting, same contract as url_filter_flags."""
    from tilekiln_spark.operators.dedup import _tokens

    t = F.col(text_col)
    # r6: tokenize ONCE into a projected column — the gate expressions
    # reference the token array ~6 times (count, mean length, alpha
    # fraction, stopword intersect), and each direct _tokens(t) reference
    # re-runs trim+lower+split per row.  Multiple references to a
    # non-cheap projected expression block CollapseProject, so the single
    # split survives optimization.  F.size(__toks) equals token_count(t)
    # for every input (both split the same trimmed text; empty -> 0).
    from tilekiln_spark.functions.text import _lines

    base = df.withColumn("__toks", _tokens(t)).withColumn("__lines", _lines(t))
    toks = F.col("__toks")
    lines = F.col("__lines")
    n = F.size(toks)
    mean_len = _mean_token_len(toks, n)
    reason = (
        F.when(n < min_words, F.lit("too_few_words"))
        .when(n > max_words, F.lit("too_many_words"))
        .when(
            (mean_len < min_mean_word_len) | (mean_len > max_mean_word_len),
            F.lit("word_length"),
        )
        .when(
            bullet_line_fraction(t, lines=lines) > max_bullet_frac,
            F.lit("bullet_lines"),
        )
        .when(
            ellipsis_line_fraction(t, lines=lines) > max_ellipsis_frac,
            F.lit("ellipsis_lines"),
        )
        .when(
            dup_line_fraction(t, lines=lines) > max_dup_line_frac,
            F.lit("dup_lines"),
        )
        .when(
            dup_ngram_fraction(t, 2, toks=toks) > max_dup_ngram_frac,
            F.lit("dup_ngrams"),
        )
        .when(_alpha_word_fraction(toks, n) < min_alpha_frac, F.lit("low_alpha_words"))
        .when(_distinct_stopwords(toks) < min_stopwords, F.lit("few_stopwords"))
    )
    return (
        base.withColumn("drop_reason", reason)
        .withColumn("keep", reason.isNull())
        .drop("__toks", "__lines")
    )


def c4_line_filter(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    min_words_per_line: int = 5,
    min_kept_lines: int = 3,
    banned_line_word: str = "javascript",
    banned_page_substrings: tuple[str, ...] = ("lorem ipsum", "{"),
) -> DataFrame:
    """C4's LINE-level cleaning pass (Raffel et al. 2020, §2.2) — the
    sub-document sibling of the Gopher doc gates: Gopher DROPS documents,
    C4 first REWRITES them line by line, then drops pages left too short.

    A line survives when it (a) ends in terminal punctuation (. ! ? "),
    (b) carries >= ``min_words_per_line`` whitespace words, and (c) does
    not mention ``banned_line_word`` (case-insensitive).  The page is then
    kept only if >= ``min_kept_lines`` lines survived and the original
    text contains none of ``banned_page_substrings`` (C4's "lorem ipsum" /
    curly-brace code heuristics).

    Returns one row per doc: ``(key, text_clean, n_lines, n_kept_lines,
    page_keep)`` — filter ``page_keep`` and write ``text_clean``.

    Scale: pure codegen expressions over split lines — map-only, no
    shuffle, no UDF; the whole pass fuses into the scan's codegen stage
    and composes with ``doc_quality_flags`` in the same stage."""
    t = F.col(text_col)
    lines = F.split(t, "\n", -1)

    def line_ok(l: Column) -> Column:
        trimmed = F.trim(l)
        return (
            trimmed.rlike('[.!?"]$')
            & (F.size(F.split(trimmed, r"\s+")) >= min_words_per_line)
            & ~F.lower(l).contains(banned_line_word)
        )

    kept = F.filter(lines, line_ok)
    page_banned = None
    for s in banned_page_substrings:
        hit = F.contains(F.lower(t), F.lit(s.lower()))
        page_banned = hit if page_banned is None else (page_banned | hit)
    page_keep = (F.size(kept) >= min_kept_lines) & ~F.coalesce(
        page_banned, F.lit(False)
    )
    return df.select(
        F.col(key_col),
        F.array_join(kept, "\n").alias("text_clean"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        page_keep.alias("page_keep"),
    )
