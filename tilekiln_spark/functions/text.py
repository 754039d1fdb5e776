"""Text-analysis functions for web-scale training-data pipelines.

All pure Column expressions (whole-stage codegen; no Python in the hot path):
token counting, language-ID heuristic, quality scoring, fingerprinting.
Each has an exact ANSI-SQL twin used by the DuckDB oracle in
__spark_entry__.py, so these are value-checked end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# --------------------------------------------------------------------------
# Token counting
# --------------------------------------------------------------------------

def token_count(text: Column | str) -> Column:
    """Whitespace tokenization; empty/blank -> 0."""
    t = F.trim(_c(text))
    return F.when(t == "", 0).otherwise(F.size(F.split(t, r"\s+")))


def bpe_ish_token_count(text: Column | str) -> Column:
    """BPE-ish sub-word proxy: count of word chunks + digit runs + non-space
    punctuation, the common pre-tokenizer regex classes."""
    t = _c(text)
    return (
        F.size(F.regexp_extract_all(t, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0)))
    )


def readability_features(text: Column | str):
    """Flesch reading-ease heuristic (words / sentences / vowel-group
    syllable proxy — the classic readability quality signal corpus filters
    bucket on).  Counts are regex-class extractions shared verbatim with
    the DuckDB twin (:func:`readability_sql`); all-expression, map-only.

    Returns (n_words, n_sentences, n_vowel_groups, flesch):
        flesch = 206.835 − 1.015·(W/max(S,1)) − 84.6·(V/max(W,1))
    """
    t = _c(text)
    w = F.size(F.regexp_extract_all(t, F.lit(r"[A-Za-z]+"), F.lit(0)))
    s = F.size(F.regexp_extract_all(t, F.lit(r"[.!?]+"), F.lit(0)))
    v = F.size(F.regexp_extract_all(F.lower(t), F.lit(r"[aeiouy]+"), F.lit(0)))
    wd, sd, vd = (c.cast("double") for c in (w, s, v))
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (wd / F.greatest(sd, F.lit(1.0)))
        - F.lit(84.6) * (vd / F.greatest(wd, F.lit(1.0)))
    )
    return w, s, v, flesch


def readability_sql(text_expr: str) -> tuple[str, str, str, str]:
    """DuckDB twin of :func:`readability_features` — identical regex
    classes and arithmetic order.  Returns (w_sql, s_sql, v_sql,
    flesch_sql)."""
    w = f"len(regexp_extract_all({text_expr}, '[A-Za-z]+'))"
    s = f"len(regexp_extract_all({text_expr}, '[.!?]+'))"
    v = f"len(regexp_extract_all(lower({text_expr}), '[aeiouy]+'))"
    # explicit DOUBLE casts: DuckDB parses bare decimal literals as DECIMAL
    flesch = (
        f"(CAST(206.835 AS DOUBLE) "
        f"- CAST(1.015 AS DOUBLE) * (CAST({w} AS DOUBLE) / greatest(CAST({s} AS DOUBLE), 1.0)) "
        f"- CAST(84.6 AS DOUBLE) * (CAST({v} AS DOUBLE) / greatest(CAST({w} AS DOUBLE), 1.0)))"
    )
    return w, s, v, flesch


# --------------------------------------------------------------------------
# Quality scoring (length / punctuation / stopword ratios)
# --------------------------------------------------------------------------

STOPWORDS = ["the", "and", "of", "to", "in", "a", "is", "that", "for", "it"]


def quality_features(text: Column | str):
    """(n_chars, n_tokens, punct_ratio, stopword_ratio, mean_token_len)."""
    t = _c(text)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[^\w\s]"), F.lit(0)))
    stop_pattern = r"(?i)\b(" + "|".join(STOPWORDS) + r")\b"
    n_stop = F.size(F.regexp_extract_all(t, F.lit(stop_pattern), F.lit(0)))
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(0.0)
    stop_ratio = F.when(n_tokens > 0, n_stop.cast("double") / n_tokens).otherwise(0.0)
    mean_tok = F.when(n_tokens > 0, n_chars.cast("double") / n_tokens).otherwise(0.0)
    return n_chars, n_tokens, punct_ratio, stop_ratio, mean_tok


def quality_score(text: Column | str) -> Column:
    """Scalar quality score in [0, 1]: rewards mid-length docs with prose-like
    stopword density and low punctuation noise."""
    n_chars, n_tokens, punct_ratio, stop_ratio, _ = quality_features(text)
    len_score = F.least(n_chars.cast("double") / 500.0, F.lit(1.0))
    stop_score = F.least(stop_ratio * 4.0, F.lit(1.0))
    punct_penalty = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio * 4.0)
    return (len_score + stop_score + punct_penalty) / 3.0


# --------------------------------------------------------------------------
# Language ID (marker-word heuristic)
# --------------------------------------------------------------------------

LANG_MARKERS = {
    "en": ["the", "and", "is", "of", "to"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "les", "est", "une"],
    "es": ["el", "los", "es", "una", "que"],
}


def lang_scores(text: Column | str) -> dict[str, Column]:
    t = _c(text)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        pat = r"(?i)\b(" + "|".join(markers) + r")\b"
        out[lang] = F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0)))
    return out


def lang_id(text: Column | str) -> Column:
    """argmax over marker-hit counts; ties broken alphabetically; no hits -> 'und'.

    Implemented as sort_array over (-score, lang) structs so the whole argmax
    stays a single codegen'd expression."""
    scores = lang_scores(text)
    pairs = F.array(
        *[
            F.struct((-c).alias("neg"), F.lit(lang).alias("lang"))
            for lang, c in sorted(scores.items())
        ]
    )
    best = F.sort_array(pairs)[0]  # min neg = max score; tie -> lang ascending
    return F.when(-best["neg"] > 0, best["lang"]).otherwise(F.lit("und"))


def lang_id_sql(text_expr: str) -> str:
    """DuckDB twin of lang_id: same counts, same alphabetical tie-break."""
    score = {
        lang: f"len(regexp_extract_all({text_expr}, '(?i)\\b({'|'.join(m)})\\b'))"
        for lang, m in sorted(LANG_MARKERS.items())
    }
    m = "greatest(" + ", ".join(score.values()) + ")"
    whens = " ".join(
        f"WHEN {score[lang]} = __m THEN '{lang}'" for lang in sorted(score)
    )
    return (
        f"(SELECT CASE WHEN __m > 0 THEN (CASE {whens} END) ELSE 'und' END "
        f"FROM (SELECT {m} AS __m))"
    )


# --------------------------------------------------------------------------
# Fingerprinting
# --------------------------------------------------------------------------

def normalize_text(text: Column | str) -> Column:
    """Lowercase + collapse whitespace — canonical form for fingerprints."""
    return F.regexp_replace(F.lower(F.trim(_c(text))), r"\s+", " ")


def fingerprint_md5(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 hex of the normalized text.
    (md5 is identical in Spark and DuckDB, so the oracle can value-check.)"""
    return F.md5(F.encode(normalize_text(text), "utf-8"))


def chunk_fingerprints(text: Column | str, chunk: int = 64) -> Column:
    """Rolling-window fingerprints: md5 per fixed-size chunk of the normalized
    text (content-defined-chunking stand-in; array<string>)."""
    t = normalize_text(text)
    n_chunks = F.ceil(F.length(t).cast("double") / chunk).cast("int")
    return F.transform(
        F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0))),
        lambda i: F.md5(F.encode(F.substring(t, i * chunk + 1, chunk), "utf-8")),
    )


# --------------------------------------------------------------------------
# Repetition signals (MassiveText/Gopher-style quality filters)
# --------------------------------------------------------------------------

def _lines(text: Column | str) -> Column:
    """Non-empty trimmed lines."""
    return F.filter(
        F.transform(F.split(_c(text), r"\n"), F.trim), lambda x: x != ""
    )


def dup_line_fraction(text: Column | str, lines: Column | None = None) -> Column:
    """Fraction of lines that are duplicates of an earlier line (0 when the
    document has <2 lines).  High values flag boilerplate/navigation pages.
    ``lines``: a pre-projected _lines(text) column (r6, shared split)."""
    ls = _lines(text) if lines is None else lines
    n = F.size(ls)
    return F.when(
        n > 1, 1.0 - F.size(F.array_distinct(ls)).cast("double") / n
    ).otherwise(F.lit(0.0))


def dup_ngram_fraction(
    text: Column | str, n: int = 2, toks: Column | None = None
) -> Column:
    """Fraction of duplicate token n-grams (MassiveText's duplicate-n-gram
    family).  Shares the tokenizer with the dedup shingles.  ``toks``: a
    pre-projected token array (r6, shared tokenization)."""
    from tilekiln_spark.operators.dedup import shingles

    sh = shingles(_c(text), n, toks=toks)
    cnt = F.size(sh)
    return F.when(
        cnt > 1, 1.0 - F.size(F.array_distinct(sh)).cast("double") / cnt
    ).otherwise(F.lit(0.0))


def bullet_line_fraction(text: Column | str, lines: Column | None = None) -> Column:
    """Fraction of lines starting with a bullet marker (-, *, or digit.)."""
    ls = _lines(text) if lines is None else lines
    n = F.size(ls)
    hits = F.size(F.filter(ls, lambda x: x.rlike(r"^(-|\*|\d+\.)\s")))
    return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))


def ellipsis_line_fraction(text: Column | str, lines: Column | None = None) -> Column:
    """Fraction of lines ending in an ellipsis (truncated snippets)."""
    ls = _lines(text) if lines is None else lines
    n = F.size(ls)
    hits = F.size(F.filter(ls, lambda x: x.rlike(r"\.\.\.$")))
    return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))


# --------------------------------------------------------------------------
# PII detection / redaction
# --------------------------------------------------------------------------
# Conservative patterns written to the COMMON subset of Java regex (Spark)
# and RE2 (DuckDB): no lookaround, no backreferences — the same pattern
# string produces byte-identical matches in both engines, which the driver
# oracle exploits by md5-comparing the redacted text.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d{7,15}\b|\b\d{3}-\d{3}-\d{4}\b",
}


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Match count per PII category (map over regexp_extract_all)."""
    t = _c(text)
    return {
        k: F.size(F.regexp_extract_all(t, F.lit(p), F.lit(0)))
        for k, p in PII_PATTERNS.items()
    }


def redact_pii(text: Column | str) -> Column:
    """Replace each PII category with a <CATEGORY> placeholder.  Order is
    fixed (email, ipv4, phone) so redaction is deterministic; scrubbing is
    a map-only projection suitable for the corpus-materialization pass."""
    t = _c(text)
    for k in ("email", "ipv4", "phone"):
        t = F.regexp_replace(t, PII_PATTERNS[k], f"<{k.upper()}>")
    return t


# --------------------------------------------------------------------------
# Corpus vocabulary (tokenizer-training primitive)
# --------------------------------------------------------------------------

def vocab_topk(df, k: int = 1000, text_col: str = "text"):
    """Top-k corpus tokens by frequency (ties broken by token string, so
    the cut is total and deterministic).

    The canonical map-reduce: explode tokens -> ONE partial-aggregated
    groupBy on the token (map-side combine collapses each scan partition's
    counts before the exchange, so shuffle volume is the distinct-token
    count per partition, not token occurrences) -> orderBy().limit(k),
    which Catalyst executes as TakeOrderedAndProject: each partition keeps
    its local top-k and the driver merges k*P candidate rows — NEVER a
    single-reducer global sort.  The rank column is windowed over the
    k-row result only."""
    from pyspark.sql import Window

    from tilekiln_spark.operators.dedup import _tokens

    t = F.explode(_tokens(F.col(text_col))).alias("token")
    counts = df.select(t).groupBy("token").agg(F.count("*").alias("n"))
    order = [F.col("n").desc(), F.col("token").asc()]
    top = counts.orderBy(*order).limit(k)
    return top.withColumn("rank", F.row_number().over(Window.orderBy(*order)))



def zipf_fit(df, k: int = 60, text_col: str = "text"):
    """Zipf-law fit over the corpus vocabulary: OLS slope/intercept of
    ln(freq) on ln(rank) for the top-k terms — the classic corpus
    diagnostic (natural language ≈ slope -1; templated/spam corpora
    deviate), run as a training-data health check.

    The heavy stage is :func:`vocab_topk` (partial-agg token counts +
    TakeOrderedAndProject — never a global sort); the fit then touches
    only k rows: ONE sort_array(collect_list(...)) into a single row and
    ONE sequential struct-accumulator fold computing Σx, Σy, Σxy, Σx² in
    rank order — bit-deterministic, and replayable in DuckDB as four
    list_reduce folds over the same rank-ordered lists.  Returns ONE row
    [n_terms, slope, intercept] un-rounded."""
    top = vocab_topk(df, k=k, text_col=text_col)
    arr = F.sort_array(
        F.collect_list(
            F.struct(
                F.col("rank"),
                F.log(F.col("rank").cast("double")).alias("x"),
                F.log(F.col("n").cast("double")).alias("y"),
            )
        )
    )
    zero = F.struct(
        F.lit(0.0).alias("sx"),
        F.lit(0.0).alias("sy"),
        F.lit(0.0).alias("sxy"),
        F.lit(0.0).alias("sxx"),
    )
    folded = top.agg(
        F.aggregate(
            arr,
            zero,
            lambda a, s: F.struct(
                (a["sx"] + s["x"]).alias("sx"),
                (a["sy"] + s["y"]).alias("sy"),
                (a["sxy"] + s["x"] * s["y"]).alias("sxy"),
                (a["sxx"] + s["x"] * s["x"]).alias("sxx"),
            ),
        ).alias("s"),
        F.count("*").alias("n_terms"),
    )
    n = F.col("n_terms").cast("double")
    sx, sy = F.col("s.sx"), F.col("s.sy")
    sxy, sxx = F.col("s.sxy"), F.col("s.sxx")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return folded.select(
        F.col("n_terms"),
        slope.alias("slope"),
        ((sy - slope * sx) / n).alias("intercept"),
    )


def heaps_law(df, checkpoints: list[int], text_col: str = "text", id_col: str = "doc_id"):
    """Heaps'-law curve + exponent over the corpus: vocabulary size V as
    a function of tokens seen N along the doc_id order, V ≈ K·N^β — the
    other classic corpus diagnostic beside :func:`zipf_fit` (β ≈ 0.5-0.7
    for natural text; templated corpora saturate early).

    No prefix re-scans: each token's FIRST-occurrence doc (one min-agg
    groupBy) and each doc's token count (map-only) give every
    checkpoint's V and N as exact-integer cuts of the same two tiny
    aggregates.  The β fit is the same rank-ordered sequential
    4-sum fold as zipf_fit (ln V on ln N), replayable with list_reduce.
    Returns one row per checkpoint [n_docs, n_tokens, vocab, beta] with
    the fitted β broadcast onto every row (un-rounded)."""
    if not checkpoints or any(
        checkpoints[i] >= checkpoints[i + 1] for i in range(len(checkpoints) - 1)
    ):
        raise ValueError(f"heaps_law: checkpoints must be increasing, got {checkpoints}")
    from tilekiln_spark.operators.dedup import _tokens

    toks = df.select(
        F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("token")
    )
    first = toks.groupBy("token").agg(F.min(id_col).alias("first_doc"))
    doc_tok = toks.groupBy(id_col).agg(F.count("*").alias("n_tok"))
    # ONE pass per tiny post-aggregate table: every checkpoint is a
    # conditional sum column (no per-checkpoint re-scan of the token
    # explode), then one bounded explode into checkpoint rows
    vstats = first.agg(
        *[
            F.sum(F.when(F.col("first_doc") < c, 1).otherwise(0)).alias(f"v{i}")
            for i, c in enumerate(checkpoints)
        ]
    )
    tstats = doc_tok.agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col(id_col) < c, F.col("n_tok"))), F.lit(0)
            ).alias(f"t{i}")
            for i, c in enumerate(checkpoints)
        ]
    )
    pts = (
        vstats.crossJoin(tstats)
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(int(c)).alias("n_docs"),
                            F.col(f"t{i}").alias("n_tokens"),
                            F.col(f"v{i}").alias("vocab"),
                        )
                        for i, c in enumerate(checkpoints)
                    ]
                )
            ).alias("e")
        )
        .select("e.n_docs", "e.n_tokens", "e.vocab")
    )
    arr = F.sort_array(
        F.collect_list(
            F.struct(
                F.col("n_docs"),
                F.log(F.col("n_tokens").cast("double")).alias("x"),
                F.log(F.col("vocab").cast("double")).alias("y"),
            )
        )
    )
    zero = F.struct(
        F.lit(0.0).alias("sx"),
        F.lit(0.0).alias("sy"),
        F.lit(0.0).alias("sxy"),
        F.lit(0.0).alias("sxx"),
    )
    fit = pts.agg(
        F.aggregate(
            arr,
            zero,
            lambda a, s: F.struct(
                (a["sx"] + s["x"]).alias("sx"),
                (a["sy"] + s["y"]).alias("sy"),
                (a["sxy"] + s["x"] * s["y"]).alias("sxy"),
                (a["sxx"] + s["x"] * s["x"]).alias("sxx"),
            ),
        ).alias("s"),
        F.count("*").alias("np"),
    )
    n = F.col("np").cast("double")
    beta = (n * F.col("s.sxy") - F.col("s.sx") * F.col("s.sy")) / (
        n * F.col("s.sxx") - F.col("s.sx") * F.col("s.sx")
    )
    return pts.crossJoin(F.broadcast(fit.select(beta.alias("beta")))).select(
        "n_docs", "n_tokens", "vocab", "beta"
    )


def term_dispersion(df, k: int = 40, text_col: str = "text", id_col: str = "doc_id"):
    """Document-frequency vs collection-frequency dispersion for the
    top-k corpus terms: cf (total occurrences), df (docs containing),
    idf-style spread df/|D|, and burstiness cf/df (Church & Gale 1995's
    burstiness signal — high for topical terms, ~1 for function words).
    Flags the template/boilerplate tokens a dedup pass should weight
    down.

    One (doc, token) partial-agg groupBy feeds BOTH counts (cf = Σ
    per-doc counts, df = row count), then the same TakeOrdered top-k cut
    as vocab_topk.  All exact integers; two divisions per row.  Returns
    [token, cf, df, doc_frac, burstiness] for the top-k by (cf desc,
    token)."""
    from tilekiln_spark.operators.dedup import _tokens

    n_docs = df.count()
    per = (
        df.select(F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count("*").alias("c"))
    )
    agg = per.groupBy("token").agg(
        F.sum("c").alias("cf"), F.count("*").alias("df")
    )
    top = agg.orderBy(F.col("cf").desc(), F.col("token").asc()).limit(k)
    return top.select(
        "token",
        "cf",
        "df",
        (F.col("df").cast("double") / F.lit(float(n_docs))).alias("doc_frac"),
        (F.col("cf").cast("double") / F.col("df").cast("double")).alias(
            "burstiness"
        ),
    )


def collocations(df, min_count: int = 5, text_col: str = "text"):
    """PMI + t-score collocation extraction (Church & Hanks 1990;
    Manning & Schütze ch. 5) over adjacent token bigrams:

        PMI(w1, w2) = log2( p(w1 w2) / (p(w1) p(w2)) )
                    = log2( (c12 * T * T) / (c1 * c2 * Nb) )
        t(w1, w2)   = (c12 - E) / sqrt(c12),  E = Nb * c1 * c2 / T^2

    with c(w) over the T-token unigram stream and c12 over the
    Nb-bigram stream (tokenization = operators/dedup._tokens, the
    shared lower+whitespace stream the LM and MinHash see).  Both
    statistics are ONE closed-form expression over exact integer
    counts — written identically in the DuckDB twin so the only float
    ops are the same-ordered multiply/divide/log2/sqrt — and the
    min_count floor makes the returned SET purely structural.

    Scale: two partial-agg groupBys (token, bigram) + two joins keyed
    on a single word — the vocab_topk/LM-training shape; nothing
    all-pairs, no driver data.  Returns [w1, w2, c12, pmi, t_score]
    for bigrams with c12 >= min_count."""
    from tilekiln_spark.functions.lm import _bigram_pairs
    from tilekiln_spark.operators.dedup import _tokens

    # totals ride ON the count tables as whole-frame window sums (the
    # count tables are vocab-sized, so the single-partition window
    # exchange is cheap) — no eager driver action, no second consumer
    # per aggregate, so the corpus is tokenized exactly three times
    # (bigrams once, unigrams once per join side) instead of ~10x when
    # separate total-aggregates defeat exchange reuse
    wall = Window.partitionBy()
    toks = df.select(F.explode(_tokens(F.col(text_col))).alias("w"))
    uni = toks.groupBy("w").agg(F.count("*").alias("c"))
    uni_t = uni.withColumn("tt", F.sum("c").over(wall).cast("double"))
    bi = (
        df.select(F.explode(_bigram_pairs(F.col(text_col))).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    c12 = (
        bi.groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
        .withColumn("nbt", F.sum("c12").over(wall).cast("double"))
        .where(F.col("c12") >= min_count)
    )
    j = (
        c12.join(
            uni_t.select(F.col("w").alias("w1"), F.col("c").alias("c1"), "tt"),
            "w1",
        )
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")), "w2")
    )
    T = F.col("tt")
    Nb = F.col("nbt")
    e = Nb * F.col("c1").cast("double") * F.col("c2").cast("double") / (T * T)
    pmi = F.log2(
        (F.col("c12").cast("double") * T * T)
        / (F.col("c1").cast("double") * F.col("c2").cast("double") * Nb)
    )
    return j.select(
        "w1",
        "w2",
        "c12",
        (F.round(pmi, 6) + F.lit(0.0)).alias("pmi"),
        (
            F.round(
                (F.col("c12").cast("double") - e)
                / F.sqrt(F.col("c12").cast("double")),
                6,
            )
            + F.lit(0.0)
        ).alias("t_score"),
    )


def keyness(df_a, df_b, min_count: int = 5, text_col: str = "text"):
    """Log-likelihood keyness (Dunning 1993 G², the Rayson & Garside
    corpus-comparison form): for each token with combined count >=
    ``min_count``,

        G² = 2 * [ a·ln(a·N / (NA·c)) + b·ln(b·N / (NB·c)) ]

    with a/b the token counts in corpus A/B, NA/NB the corpus token
    totals, N = NA + NB, c = a + b, and zero-count terms contributing
    0 — the statistic behind every "keywords of corpus A vs reference
    corpus B" table.  ``overused`` is the exact cross-multiplied
    direction a·NB > b·NA (no float in the sign).  G² itself is ONE
    closed-form expression over exact integer counts, written
    identically in the twin (two ln calls in fixed order), rounded at
    6 — the collocations discipline.

    Scale: one partial-agg groupBy(token) per corpus, one full-outer
    join keyed on the token, two 1-row total aggregates broadcast in —
    the vocab_topk shape twice.  Returns [token, cnt_a, cnt_b, g2,
    overused]."""
    from tilekiln_spark.operators.dedup import _tokens

    # corpus totals ride ON the count tables as whole-frame window sums
    # (the collocations lesson: a second aggregate consumer of the same
    # subtree defeats exchange reuse and re-tokenizes the corpus)
    wall = Window.partitionBy()
    ca = (
        df_a.select(F.explode(_tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("a"))
        .withColumn("na", F.sum("a").over(wall))
    )
    cb = (
        df_b.select(F.explode(_tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("b"))
        .withColumn("nb", F.sum("b").over(wall))
    )
    j = (
        ca.join(cb, "w", "full_outer")
        .select(
            "w",
            F.coalesce("a", F.lit(0)).alias("a"),
            F.coalesce("b", F.lit(0)).alias("b"),
            # full-outer rows may miss one side's total — each total is
            # constant on its side, so take the max over the frame
            F.max("na").over(wall).alias("na"),
            F.max("nb").over(wall).alias("nb"),
        )
        .where(F.col("a") + F.col("b") >= min_count)
    )
    a = F.col("a").cast("double")
    b = F.col("b").cast("double")
    n_a = F.col("na").cast("double")
    n_b = F.col("nb").cast("double")
    n = n_a + n_b
    c = a + b
    term_a = F.when(
        F.col("a") > 0, a * F.log(a * n / (n_a * c))
    ).otherwise(F.lit(0.0))
    term_b = F.when(
        F.col("b") > 0, b * F.log(b * n / (n_b * c))
    ).otherwise(F.lit(0.0))
    return j.select(
        F.col("w").alias("token"),
        F.col("a").alias("cnt_a"),
        F.col("b").alias("cnt_b"),
        (F.round(F.lit(2.0) * (term_a + term_b), 6) + F.lit(0.0)).alias("g2"),
        (F.col("a") * F.col("nb") > F.col("b") * F.col("na")).alias("overused"),
    )


def cavnar_trenkle(
    train, test, k: int = 40, min_count: int = 2,
    class_col: str = "lang", text_col: str = "text", id_col: str = "doc_id",
):
    """Cavnar & Trenkle 1994 rank-order n-gram classification (the
    textcat algorithm): each class gets a profile of its top-``k`` char
    trigrams ranked by (count desc, gram asc); a document's trigram
    ranks compare against every class profile by the OUT-OF-PLACE
    measure — sum of |rank_doc - rank_class|, with a flat ``k`` penalty
    for grams absent from the class profile — and the smallest total
    wins (class-ascending tie-break).  EVERY quantity is an exact
    integer and every rank cut a deterministic (count, gram) order, so
    the classification is bit-identical cross-engine with no float
    anywhere.

    Trigrams come from the lowercased text with word boundaries kept
    (the whitespace itself is signal — C&T's padded-token behavior).
    Grams below ``min_count`` per document are dropped before ranking
    (C&T's noise floor).

    Scale: profile training is one (class, gram) partial-agg groupBy +
    a per-class top-k window (k rows per class — broadcastable by
    construction); scoring explodes each test doc to <= k grams, joins
    the broadcast profile, and partial-aggregates per (doc, class).
    Returns [doc_id, true_class, pred_class, dist]."""
    def grams(df, keys, names):
        t = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
        # r6: materialize the normalized text ONCE per row in its own
        # projection before the per-character lambda — a lambda that
        # references the normalization expression directly re-evaluates
        # regexp_replace+lower+trim PER ELEMENT in interpreted HOF mode
        # (O(len^2) per row; measured 13.3 s -> 2.0 s on the sf0.1 gram
        # rollup).  Same trap the shingles() docstring documents.
        # spread the per-character gram kernel across cores when the
        # source layout is narrower than the session (scale-adaptive:
        # no-op above core count)
        from tilekiln_spark.operators.dedup import spread_cpu

        base = spread_cpu(df.select(*keys, t.alias("__t")))
        tc = F.col("__t")
        # guard: F.sequence(1, 0) yields a DESCENDING [1, 0] — texts
        # shorter than one trigram must produce an empty gram array
        g = F.when(
            F.length(tc) < 3, F.array().cast("array<string>")
        ).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.length(tc) - 2),
                lambda i: tc.substr(i, F.lit(3)),
            )
        )
        return base.select(*names, F.explode(g).alias("gram")).groupBy(
            *names, "gram"
        ).agg(F.count("*").alias("c"))
    prof = grams(train, [F.col(class_col).alias("cls")], ["cls"])
    wp = Window.partitionBy("cls").orderBy(F.col("c").desc(), F.col("gram").asc())
    prof_k = (
        prof.withColumn("rc", F.row_number().over(wp))
        .where(F.col("rc") <= k)
        .select("cls", "gram", "rc")
    )
    dg = grams(
        test,
        [F.col(id_col).alias("doc"), F.col(class_col).alias("truth")],
        ["doc", "truth"],
    )
    wd = Window.partitionBy("doc").orderBy(F.col("c").desc(), F.col("gram").asc())
    doc_k = (
        dg.where(F.col("c") >= min_count)
        .withColumn("rd", F.row_number().over(wd))
        .where(F.col("rd") <= k)
        .select("doc", "truth", "gram", "rd")
    )
    classes = prof_k.select("cls").distinct()
    scored = (
        doc_k.crossJoin(F.broadcast(classes))
        .join(F.broadcast(prof_k), ["cls", "gram"], "left")
        .groupBy("doc", "truth", "cls")
        .agg(
            F.sum(
                F.coalesce(F.abs(F.col("rd") - F.col("rc")), F.lit(k))
            ).alias("dist")
        )
    )
    wbest = Window.partitionBy("doc").orderBy(F.col("dist").asc(), F.col("cls").asc())
    return (
        scored.withColumn("rn", F.row_number().over(wbest))
        .where(F.col("rn") == 1)
        .select(
            F.col("doc").alias("doc_id"),
            F.col("truth").alias("true_class"),
            F.col("cls").alias("pred_class"),
            F.col("dist"),
        )
    )


def dist_compare(
    df,
    baseline: str,
    class_col: str = "lang",
    value_col: str = "n_chars",
):
    """Exact 1-D Wasserstein-1 (earth mover) + Kolmogorov-Smirnov
    distance between the ``value_col`` distribution of the
    ``baseline`` class and every other class — the classical
    distribution-drift pair (W1 = integral |F_a - F_b|; KS = sup):

        W1 = sum over support gaps of |CA*m - CB*n| * gap / (n*m)
        KS = max over support of |CA*m - CB*n| / (n*m)

    with CA/CB the integer cumulative counts and n/m the class sizes —
    the CROSS-MULTIPLIED form keeps every accumulated quantity an
    EXACT integer (|CA*m - CB*n| * gap sums in int64), so the only
    float is one final division per statistic, rounded at 6.  Empirical
    CDFs are right-continuous step functions; the last support point
    contributes nothing (both CDFs are 1 there).

    Scale: one (class, value) partial-agg groupBy, then windows
    partitioned BY CLASS PAIR over the merged support — the
    per-key-timeline exchange; support size is the distinct-value
    count, not the row count.  Returns [cls, n_base, n_cls, w1, ks]."""
    vals = df.select(F.col(class_col).alias("cls"), F.col(value_col).alias("v"))
    base = vals.where(F.col("cls") == baseline).groupBy("v").agg(
        F.count("*").alias("ca")
    )
    other = (
        vals.where(F.col("cls") != baseline)
        .groupBy("cls", "v")
        .agg(F.count("*").alias("cb"))
    )
    classes = other.select("cls").distinct()
    support = (
        base.crossJoin(F.broadcast(classes))
        .select("cls", "v", "ca", F.lit(0).alias("cb"))
        .unionByName(other.select("cls", "v", F.lit(0).alias("ca"), "cb"))
        .groupBy("cls", "v")
        .agg(F.sum("ca").alias("ca"), F.sum("cb").alias("cb"))
    )
    w = (
        Window.partitionBy("cls")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("cls")
    wlead = Window.partitionBy("cls").orderBy("v")
    cum = support.select(
        "cls",
        "v",
        F.sum("ca").over(w).alias("CA"),
        F.sum("cb").over(w).alias("CB"),
        F.sum("ca").over(wall).alias("n"),
        F.sum("cb").over(wall).alias("m"),
        F.lead("v").over(wlead).alias("nxt"),
    )
    diff = F.abs(F.col("CA") * F.col("m") - F.col("CB") * F.col("n"))
    return (
        cum.groupBy("cls")
        .agg(
            F.max("n").alias("n_base"),
            F.max("m").alias("n_cls"),
            F.sum(
                F.when(
                    F.col("nxt").isNotNull(), diff * (F.col("nxt") - F.col("v"))
                ).otherwise(F.lit(0))
            ).alias("wnum"),
            F.max(diff).alias("ksnum"),
        )
        .select(
            "cls",
            "n_base",
            "n_cls",
            (
                F.round(
                    F.col("wnum").cast("double")
                    / (F.col("n_base") * F.col("n_cls")).cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("w1"),
            (
                F.round(
                    F.col("ksnum").cast("double")
                    / (F.col("n_base") * F.col("n_cls")).cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("ks"),
        )
    )


def contingency_chi2(df, a_col: str, b_col: str):
    """Pearson chi-square independence test + Cramér's V for two
    categorical columns (the corpus-metadata association check — is
    language independent of source?):

        chi2 = sum over cells of (O*N - r*c)^2 / (N * r * c)
        V    = sqrt(chi2 / (N * (min(R, C) - 1)))

    in the cross-multiplied form: every numerator and denominator is
    an EXACT int64 (O <= N, so (O*N - r*c)^2 <= N^4 terms stay well in
    range at statistics-scale level counts), each cell contributes one
    exact-input division, and the cell terms fold in sorted (a, b)
    order (the Shannon discipline) so the float sum is bit-identical
    cross-engine.  ZERO cells are generated (R x C grid from the two
    margins) — they contribute r*c/N like the textbook says.

    Scale: one (a, b) partial-agg groupBy + two margin rollups joined
    back by single keys; the grid is R*C rows — level-count sized, not
    corpus sized.  Returns ONE row [n, r_levels, c_levels, dof, chi2,
    cramers_v]."""
    cells = df.groupBy(
        F.col(a_col).alias("a"), F.col(b_col).alias("b")
    ).agg(F.count("*").alias("o"))
    ra = cells.groupBy("a").agg(F.sum("o").alias("r"))
    cb = cells.groupBy("b").agg(F.sum("o").alias("c"))
    grid = (
        ra.crossJoin(cb)
        .join(cells, ["a", "b"], "left")
        .select(
            "a", "b", "r", "c", F.coalesce("o", F.lit(0)).alias("o"),
            F.sum(F.coalesce("o", F.lit(0))).over(Window.partitionBy()).alias("n"),
        )
    )
    num = F.col("o") * F.col("n") - F.col("r") * F.col("c")
    term = (num * num).cast("double") / (
        F.col("n") * F.col("r") * F.col("c")
    ).cast("double")
    agg = grid.groupBy().agg(
        F.max("n").alias("n"),
        F.count_distinct("a").alias("r_levels"),
        F.count_distinct("b").alias("c_levels"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("a", "b", term.alias("t")))),
            F.lit(0.0),
            lambda acc, s: acc + s["t"],
        ).alias("chi2"),
    )
    dof = (F.col("r_levels") - 1) * (F.col("c_levels") - 1)
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.col("r_levels").cast("long").alias("r_levels"),
        F.col("c_levels").cast("long").alias("c_levels"),
        dof.cast("long").alias("dof"),
        (F.round("chi2", 6) + F.lit(0.0)).alias("chi2"),
        (
            F.when(
                F.least("r_levels", "c_levels") >= 2,
                F.round(
                    F.sqrt(
                        F.col("chi2")
                        / (
                            F.col("n")
                            * (F.least("r_levels", "c_levels") - 1)
                        ).cast("double")
                    ),
                    6,
                )
                + F.lit(0.0),
            ).otherwise(F.lit(0.0))
        ).alias("cramers_v"),
    )


def _double_rank(order_col: str, part_cols: list[str] | None = None) -> Column:
    """2*midrank as an exact INTEGER: 2*min_rank + ties - 1 (midranks
    are only ever halves, so doubling them stays integral).  The one
    definition shared by every rank statistic in this module — the
    cross-engine contract depends on the expression being identical
    everywhere."""
    parts = list(part_cols or [])
    wr = Window.partitionBy(*parts).orderBy(order_col)
    wt = Window.partitionBy(*parts, order_col)
    return F.lit(2) * F.rank().over(wr) + F.count("*").over(wt) - 1


def _pearson_from_moments(n, sx, sy, sxy, sxx, syy) -> Column:
    """r from five integer moment sums, with the linear combinations
    n*Sxy - Sx*Sy etc. formed in DECIMAL(38,0) — exact far past int64
    (DuckDB's sums are already hugeint, so both engines agree on the
    exact integers before the one double sqrt/divide).  NULL when
    either variance term is non-positive."""
    def d(c):
        return c.cast("decimal(38,0)")

    num = (d(n) * d(sxy) - d(sx) * d(sy)).cast("double")
    vx = (d(n) * d(sxx) - d(sx) * d(sx)).cast("double")
    vy = (d(n) * d(syy) - d(sy) * d(sy)).cast("double")
    return F.when(
        (vx > 0) & (vy > 0), F.round(num / F.sqrt(vx * vy), 6) + F.lit(0.0)
    )


def mann_whitney(
    df,
    baseline: str,
    class_col: str = "lang",
    value_col: str = "n_chars",
):
    """Mann-Whitney U rank-sum test between the ``baseline`` class and
    every other class (the nonparametric companion to
    :func:`dist_compare`), exact via the DOUBLE-RANK trick: with
    midranks needed only to the half, 2*midrank = 2*min_rank + ties - 1
    is an exact INTEGER, so the rank sum 2*R1, 2*U1 = 2*R1 -
    n1*(n1+1), and the rank-biserial effect size numerator all
    stay int64 — the only float is the final halving/division.

        U1            = R1 - n1(n1+1)/2      (scipy convention: counts
                                              base > other pairs + ties/2)
        rank_biserial = 2*U1 / (n1*n2) - 1   (Cureton 1956)

    Scale: one tagged union per class pair + ONE window pass per pair
    partition (rank + tie counts) — the as-of-join exchange shape;
    nothing all-pairs.  Returns [cls, n_base, n_cls, u, rank_biserial]."""
    vals = df.select(F.col(class_col).alias("cls"), F.col(value_col).alias("v"))
    base = vals.where(F.col("cls") == baseline).select("v")
    other = vals.where(F.col("cls") != baseline)
    classes = other.select("cls").distinct()
    tagged = (
        base.crossJoin(F.broadcast(classes))
        .select("cls", "v", F.lit(1).alias("is_base"))
        .unionByName(other.select("cls", "v", F.lit(0).alias("is_base")))
    )
    ranked = tagged.select(
        "cls",
        "is_base",
        _double_rank("v", ["cls"]).alias("dr"),
    )
    agg = ranked.groupBy("cls").agg(
        F.sum("is_base").alias("n1"),
        F.sum(F.lit(1) - F.col("is_base")).alias("n2"),
        F.sum(F.when(F.col("is_base") == 1, F.col("dr")).otherwise(0)).alias(
            "r2x"
        ),
    )
    # scipy convention: U1 counts (base > other) pairs (+ half-ties);
    # 2*U1 = 2*R1 - n1*(n1+1) stays exact integer via the double-ranks
    two_u1 = F.col("r2x") - F.col("n1") * (F.col("n1") + 1)
    return agg.select(
        "cls",
        F.col("n1").cast("long").alias("n_base"),
        F.col("n2").cast("long").alias("n_cls"),
        (two_u1.cast("double") / F.lit(2.0)).alias("u"),
        (
            F.round(
                two_u1.cast("double")
                / (F.col("n1") * F.col("n2")).cast("double")
                - F.lit(1.0),
                6,
            )
            + F.lit(0.0)
        ).alias("rank_biserial"),
    )


def spearman_rho(df, x_col: str, y_col: str):
    """Spearman rank correlation between two numeric columns, exact
    via double-ranks (2*midrank is an integer, see
    :func:`mann_whitney`): Pearson over the double-ranks has all five
    moments as exact int64 sums, so the only float ops are the final
    subtract/multiply/sqrt/divide — no fold, no rounding tricks
    beyond the display round(6).  Two window passes (one per column)
    + one aggregate.  Returns ONE row [n, rho]."""
    pts = df.select(F.col(x_col).alias("x"), F.col(y_col).alias("y"))
    r = pts.select(
        _double_rank("x").alias("rx"), _double_rank("y").alias("ry")
    )
    m = r.agg(
        F.count("*").alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
    )
    rho = _pearson_from_moments(
        F.col("n"), F.col("sx"), F.col("sy"),
        F.col("sxy"), F.col("sxx"), F.col("syy"),
    )
    return m.select(F.col("n").cast("long").alias("n"), rho.alias("rho"))


def kendall_tau(df, x_col: str, y_col: str, id_col: str = "doc_id"):
    """Kendall tau-b between two numeric columns (completing the
    rank-association trio with :func:`spearman_rho`):

        tau_b = (C - D) / sqrt((n0 - n1) * (n0 - n2))

    with C/D the concordant/discordant pair counts, n0 = n(n-1)/2,
    and n1/n2 the tie-pair counts per column — ALL exact integers
    (the canonical i < j pair set comes from an id-ordered self-join),
    so the only float ops are the final sqrt and division.

    Scale: the pair join is O(n^2) — this is the STATISTICS-SIZED
    operator (sampled columns, rollup tables); at corpus scale use
    :func:`spearman_rho` (rank windows, O(n log n)) whose value
    converges to the same association signal.  Returns ONE row
    [n, concordant, discordant, tau_b]."""
    pts = df.select(
        F.col(id_col).alias("i"), F.col(x_col).alias("x"), F.col(y_col).alias("y")
    )
    p = (
        pts.alias("a")
        .join(pts.alias("b"), F.col("a.i") < F.col("b.i"))
        .select(
            (F.col("a.x") - F.col("b.x")).alias("dx"),
            (F.col("a.y") - F.col("b.y")).alias("dy"),
        )
    )
    agg = p.agg(
        F.count("*").alias("n0"),
        F.sum(
            ((F.col("dx") > 0) & (F.col("dy") > 0)
             | (F.col("dx") < 0) & (F.col("dy") < 0)).cast("long")
        ).alias("c"),
        F.sum(
            ((F.col("dx") > 0) & (F.col("dy") < 0)
             | (F.col("dx") < 0) & (F.col("dy") > 0)).cast("long")
        ).alias("d"),
        F.sum((F.col("dx") == 0).cast("long")).alias("tx"),
        F.sum((F.col("dy") == 0).cast("long")).alias("ty"),
    )
    # n recovered exactly from n0 = n(n-1)/2 — no eager count(), no
    # second consumer of the points frame (the collocations lesson)
    n = F.round((F.lit(1.0) + F.sqrt(F.lit(1.0) + 8.0 * F.col("n0"))) / 2.0)
    denom = F.sqrt(
        (F.col("n0") - F.col("tx")).cast("double")
        * (F.col("n0") - F.col("ty")).cast("double")
    )
    return agg.select(
        n.cast("long").alias("n"),
        F.col("c").cast("long").alias("concordant"),
        F.col("d").cast("long").alias("discordant"),
        (
            F.round((F.col("c") - F.col("d")).cast("double") / denom, 6)
            + F.lit(0.0)
        ).alias("tau_b"),
    )


def robust_center(df, class_col: str = "lang", value_col: str = "n_chars"):
    """Robust per-class center/spread: exact MEDIAN, MAD (median
    absolute deviation), and the |x - med| > 3*MAD outlier count — the
    robust outlier screen corpus QA uses where mean/std would chase
    the outliers themselves.

    Exactness: medians are computed by POSITION over the sorted
    multiset (lower = element (n+1)//2, upper = element n//2 + 1,
    median = their mean) — integer inputs make the median an exact
    half, deviations exact halves, and the MAD an exact quarter; every
    comparison then happens between exactly-representable doubles
    computed by the same formula in both engines, so no rounding trick
    is needed anywhere.  (DuckDB's builtin median() is deliberately
    NOT used — the explicit position formula is the cross-engine
    contract.)

    Scale: two ordered window passes per class partition + two joins
    keyed on the class — the per-key-timeline exchange twice.
    Returns [cls, n, median, mad, n_outliers]."""
    vals = df.select(F.col(class_col).alias("cls"), F.col(value_col).alias("v"))

    def median_of(frame, col):
        w = Window.partitionBy("cls").orderBy(col)
        wc = Window.partitionBy("cls")
        r = frame.select(
            "cls",
            F.col(col).alias("x"),
            F.row_number().over(w).alias("rn"),
            F.count("*").over(wc).alias("n"),
        )
        return (
            r.where(
                (F.col("rn") == F.floor((F.col("n") + 1) / 2))
                | (F.col("rn") == F.floor(F.col("n") / 2) + 1)
            )
            .groupBy("cls")
            .agg(
                (F.sum("x") / F.count("*")).alias("med"),
                F.max("n").alias("n"),
            )
        )

    med = median_of(vals, "v")
    dev = vals.join(med.select("cls", "med"), "cls").select(
        "cls", "v", F.abs(F.col("v") - F.col("med")).alias("d")
    )
    mad = median_of(dev, "d").select(
        "cls", F.col("med").alias("mad")
    )
    joined = dev.join(mad, "cls")
    return (
        joined.groupBy("cls")
        .agg(
            F.count("*").alias("n"),
            F.max("mad").alias("mad_"),
            F.sum((F.col("d") > 3 * F.col("mad")).cast("long")).alias(
                "n_outliers"
            ),
        )
        .join(med.select("cls", "med"), "cls")
        .select(
            "cls",
            F.col("n").cast("long").alias("n"),
            (F.col("med") + F.lit(0.0)).alias("median"),
            (F.col("mad_") + F.lit(0.0)).alias("mad"),
            F.col("n_outliers").cast("long").alias("n_outliers"),
        )
    )


def benford_digits(df, value_col: str = "n_chars"):
    """Benford's-law first-significant-digit screen (Newcomb 1881 /
    Benford 1938; the classic fabricated-data QA test): observed
    first-digit counts vs the log10(1 + 1/d) expectation, with the
    chi-square statistic folded in digit order.

    The first digit is EXACT string arithmetic (leading character of
    the non-negative integer value); expected probabilities and the
    per-digit chi terms are single closed-form float expressions
    written identically in the twin, folded 1..9 (the Shannon
    discipline).  Zero/negative values are excluded (no first
    significant digit).  Returns [digit, observed, expected, chi2]
    where chi2 repeats the TOTAL on every row (the statistic is one
    number; the per-digit rows carry the distribution)."""
    pos = df.select(F.col(value_col).cast("long").alias("v")).where(
        F.col("v") > 0
    )
    dig = pos.select(
        F.substring(F.col("v").cast("string"), 1, 1).cast("int").alias("digit")
    )
    counts = dig.groupBy("digit").agg(F.count("*").alias("observed"))
    digits = df.sparkSession.range(1, 10).select(
        F.col("id").cast("int").alias("digit")
    )
    full = (
        digits.join(counts, "digit", "left")
        .select(
            "digit",
            F.coalesce("observed", F.lit(0)).alias("observed"),
            F.sum(F.coalesce("observed", F.lit(0)))
            .over(Window.partitionBy())
            .alias("n"),
        )
    )
    expected = F.col("n").cast("double") * F.log10(
        F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double")
    )
    terms = full.select(
        "digit",
        "observed",
        (F.round(expected, 6) + F.lit(0.0)).alias("expected"),
        (
            (F.col("observed").cast("double") - expected)
            * (F.col("observed").cast("double") - expected)
            / expected
        ).alias("t"),
    )
    chi = terms.groupBy().agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("digit", "t"))),
            F.lit(0.0),
            lambda acc, s: acc + s["t"],
        ).alias("chi2")
    )
    return terms.crossJoin(F.broadcast(chi)).select(
        F.col("digit").cast("long").alias("digit"),
        F.col("observed").cast("long").alias("observed"),
        "expected",
        (F.round("chi2", 6) + F.lit(0.0)).alias("chi2"),
    )


def _positional_median(df, col: str):
    """Exact position-formula median of ``df[col]`` — the mean of the
    values at ranks floor((m+1)/2) and floor(m/2)+1 of the sorted
    multiset — WITHOUT a global single-reducer sort: the two-pass
    range-partition + broadcast-offset selection pattern from
    operators/packing.py.  Pass 1 range-partitions the values and
    collects P partition counts (P longs on the driver); pass 2
    row_numbers WITHIN each partition (window keyed on the partition id,
    so no SinglePartition exchange anywhere) and keeps the <=2 rows whose
    global rank = partition offset + local rank is a target rank.

    Ties: row_number among equal doubles is arbitrary, but the value at
    a multiset POSITION is unique, so the selected VALUE is
    deterministic and engine-independent.  Returns ``(median_df, m)``:
    a 1-row DataFrame ``[__med]`` and the total count.

    r6: the selection runs through operators/ranking.positional_values
    (histogram bisection — aggregate-only, no range exchange, no
    per-partition sort of the multiset; guide §2.4) instead of ranking
    every row with the two-pass rank.  The selected values are the same
    exact multiset positions, summed in the same low-then-high order, so
    the median double is bit-identical to the ranked form."""
    from tilekiln_spark.operators.ranking import positional_values

    vals, m = positional_values(
        df, col, lambda n: [(n + 1) // 2 - 1, n // 2 + 1 - 1]
    )
    spark = df.sparkSession
    if m == 0:
        med_val = None
    else:
        # mean of the two selected positions, added low + high like the
        # previous F.sum over the ascending pair (identical IEEE result)
        med_val = (vals[0] + vals[1]) / 2.0
    med = spark.createDataFrame([(med_val,)], "__med double")
    return med, m


def theil_sen(df, x_col: str, y_col: str, id_col: str = "doc_id"):
    """Theil-Sen robust slope (Theil 1950 / Sen 1968): the median of
    all pairwise slopes (y_j - y_i)/(x_j - x_i) over i < j with
    x_i != x_j, plus the median-residual intercept — the 29%-breakdown
    robust line corpus QA fits where OLS would chase outliers.

    Determinism: each slope is ONE IEEE division of exact integer
    differences (identical value both engines); the median picks by
    POSITION over the sorted multiset (ties between equal doubles
    cannot change the selected VALUE), and the intercept medians the
    residuals y - slope*x computed with the already-rounded slope so
    both engines feed identical doubles in.  Same O(n^2)
    statistics-sized caveat as :func:`kendall_tau` for the pair join —
    but both medians run through :func:`_positional_median`'s two-pass
    range-partition selection, so even the n^2/2-row slope multiset
    never funnels through a SinglePartition sort.
    Returns ONE row [n_points, n_slopes, slope, intercept]."""
    from tilekiln_spark.operators.dedup import spread_cpu

    # spread: the a x b pair generation below is a non-equi join whose
    # stream side inherits this frame's partitioning — a 1-partition
    # source would generate and aggregate all n^2/2 slopes on one core
    pts = spread_cpu(
        df.select(
            F.col(id_col).alias("i"), F.col(x_col).alias("x"), F.col(y_col).alias("y")
        ),
        "i",
    ).localCheckpoint(eager=True)
    slopes = (
        pts.alias("a")
        .join(pts.alias("b"), F.col("a.i") < F.col("b.i"))
        .where(F.col("a.x") != F.col("b.x"))
        .select(
            (
                (F.col("b.y") - F.col("a.y")).cast("double")
                / (F.col("b.x") - F.col("a.x")).cast("double")
            ).alias("s")
        )
    )
    med_s, m = _positional_median(slopes, "s")
    med_slope = med_s.select(
        (F.round(F.col("__med"), 6) + F.lit(0.0)).alias("slope"),
        F.lit(m).cast("long").alias("n_slopes"),
    )
    resid = pts.crossJoin(F.broadcast(med_slope)).select(
        (F.col("y").cast("double") - F.col("slope") * F.col("x").cast("double")).alias(
            "res"
        ),
    )
    med_r, n = _positional_median(resid, "res")
    return med_r.crossJoin(F.broadcast(med_slope)).select(
        F.lit(n).cast("long").alias("n_points"),
        F.col("n_slopes"),
        "slope",
        (F.round(F.col("__med"), 6) + F.lit(0.0)).alias("intercept"),
    )
