"""Pruned bigram language model with stupid backoff — corpus quality scoring.

The CCNet-style pretraining filter ranks documents by how surprising their
text is under a language model trained on the corpus itself (low average
log-probability = gibberish / boilerplate soup; anomalously high = repetitive
templates).  At web scale a full Kneser-Ney LM is impractical inside the
pipeline, so this module implements the scheme built FOR MapReduce-scale
corpora: **stupid backoff** (Brants et al., "Large Language Models in
Machine Translation", EMNLP 2007) over PRUNED count tables —

    S(w2 | w1) = c(w1 w2) / c(w1)          when both counts survive pruning
               = 0.4 * c(w2) / T           unigram backoff (seen w2)
               = 0.4 * 0.5 / T             half-count floor (unseen w2)

Scores are relative (stupid backoff is not a normalized probability), which
is exactly what a quality FILTER needs: rank + threshold.

Scale shape (the reason this form survives 100 TB):

- **Training** is two partial-aggregated groupBys (token, bigram) — the
  vocab_topk shape: map-side combine collapses per-partition counts before
  the exchange, then ``orderBy().limit()`` = TakeOrderedAndProject keeps a
  local top-k per partition and merges k*P rows on the driver.  Never a
  global sort.
- **Pruning is the broadcast contract**: top-K unigrams + top-M bigrams
  bound the model at K+M rows regardless of corpus size, so scoring joins
  are all ``F.broadcast`` hash joins — no shuffle of the token stream.
- **Scoring** explodes each document's adjacent-token pairs (rows derived
  from ONE input row stay in ONE partition), three broadcast lookups, then
  a groupBy(doc) whose partial aggregation collapses every document's
  bigram rows back to one row BEFORE the only shuffle.  Shuffle volume =
  documents, not tokens.

Tokenization matches the dedup/vocab operators (`operators/dedup._tokens`:
lower + trim + split on whitespace) so the LM, MinHash shingles, and the
vocabulary counter all see the same token stream.

Reference parity note: the reference engine (tilekiln) has no LM — this is
part of the training-data operator family layered on the same engine (see
SURVEY.md §2.D).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BACKOFF = 0.4  # Brants et al. 2007 fixed backoff weight
UNSEEN_COUNT = 0.5  # half-count floor for out-of-vocabulary tokens


def _bigram_pairs(text: Column) -> Column:
    """array<struct<w1,w2>> of adjacent token pairs (empty below 2 tokens).

    Built like operators/dedup.shingles: arrays_zip over two shifted slices
    evaluates the tokenizer a constant number of times per row, instead of
    once per element as an element_at lambda would in interpreted HOF mode.
    """
    from tilekiln_spark.operators.dedup import _tokens

    toks = _tokens(text)
    m = F.size(toks) - 1
    zipped = F.arrays_zip(
        F.slice(toks, 1, m).alias("w1"), F.slice(toks, 2, m).alias("w2")
    )
    return F.when(
        m < 1, F.array().cast("array<struct<w1:string,w2:string>>")
    ).otherwise(zipped)


@dataclass(frozen=True)
class BigramLM:
    """Pruned count tables + corpus size.  `uni`/`bi` are bounded at
    k_vocab/m_bigrams rows — small enough to broadcast by construction —
    and arrive as driver-local relations from train_bigram_lm (r6), so
    scoring (which references `uni` twice, for the w1 and w2 lookups)
    never re-scans the training corpus and never re-reads cached cluster
    partitions to build its broadcast sides."""

    uni: DataFrame  # token, c
    bi: DataFrame  # w1, w2, c
    total_tokens: int

    def unpersist(self) -> None:
        self.uni.unpersist()
        self.bi.unpersist()


def train_bigram_lm(
    df: DataFrame,
    text_col: str = "text",
    k_vocab: int = 50_000,
    m_bigrams: int = 200_000,
) -> BigramLM:
    """Count-and-prune training pass.

    Ties at the pruning cut are broken by token string (unigrams) and
    (w1, w2) pair (bigrams), so the kept set is total and deterministic —
    the same discipline as functions/text.vocab_topk.

    Exactly TWO corpus scans: the token-count pass (which also yields the
    corpus size T as the sum of the full counts, one scalar — no separate
    counting scan) and the bigram-count pass.  The pruned outputs are
    persisted and materialized here so downstream scoring plans reference
    K+M cached rows, never the corpus.
    """
    from tilekiln_spark.operators.dedup import _tokens

    spark = df.sparkSession
    tok = df.select(F.explode(_tokens(F.col(text_col))).alias("token"))
    counts = tok.groupBy("token").agg(F.count("*").alias("c")).persist()
    total = counts.agg(F.sum("c").alias("n")).collect()[0]["n"]
    # r6: the pruned tables are bounded at K/M rows BY CONTRACT (that is
    # what makes every scoring join a broadcast) — so the TakeOrdered rows
    # come back to the driver and re-enter the plan as local relations:
    # one job instead of materialize-count jobs per table, and scoring
    # plans build their broadcast sides from in-memory rows instead of
    # re-reading cached cluster partitions.  Row content is the identical
    # deterministic (count desc, key asc) cut.
    uni_rows = (
        counts.orderBy(F.col("c").desc(), F.col("token").asc())
        .limit(k_vocab)
        .collect()
    )
    counts.unpersist()
    uni = spark.createDataFrame(
        [(r["token"], r["c"]) for r in uni_rows], "token string, c bigint"
    )
    bg = df.select(F.explode(_bigram_pairs(F.col(text_col))).alias("bg")).select(
        F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )
    bi_rows = (
        bg.groupBy("w1", "w2")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(m_bigrams)
        .collect()
    )
    bi = spark.createDataFrame(
        [(r["w1"], r["w2"], r["c"]) for r in bi_rows],
        "w1 string, w2 string, c bigint",
    )
    return BigramLM(uni=uni, bi=bi, total_tokens=int(total or 0))


def lm_doc_scores(
    df: DataFrame,
    lm: BigramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document stupid-backoff score: (id, n_bigrams, avg_logprob).

    avg_logprob is the mean natural-log S(w2|w1) over the document's
    adjacent token pairs, rounded to 6 places (both engines sum doubles in
    their own order; the rounding absorbs last-ulp drift — house convention,
    see the text_quality oracle).  Documents with < 2 tokens have no
    bigrams and are absent from the output on both engines.
    """
    T = float(lm.total_tokens)
    pairs = df.select(
        F.col(id_col), F.explode(_bigram_pairs(F.col(text_col))).alias("bg")
    ).select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    u1 = F.broadcast(lm.uni.select(F.col("token").alias("w1"), F.col("c").alias("c1")))
    u2 = F.broadcast(lm.uni.select(F.col("token").alias("w2"), F.col("c").alias("c2")))
    b = F.broadcast(
        lm.bi.select("w1", "w2", F.col("c").alias("c12"))
    )
    scored = (
        pairs.join(b, ["w1", "w2"], "left")
        .join(u1, ["w1"], "left")
        .join(u2, ["w2"], "left")
        .withColumn(
            "lp",
            F.when(
                F.col("c12").isNotNull() & F.col("c1").isNotNull(),
                F.log(F.col("c12").cast("double") / F.col("c1")),
            )
            .when(
                F.col("c2").isNotNull(),
                F.log(F.lit(BACKOFF) * F.col("c2") / F.lit(T)),
            )
            .otherwise(F.log(F.lit(BACKOFF * UNSEEN_COUNT) / F.lit(T))),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg("lp"), 6).alias("avg_logprob"),
    )


# ---------------------------------------------------------------------------
# CCNet head/middle/tail perplexity bucketing (Wenzek et al., LREC 2020)
# ---------------------------------------------------------------------------

def ccnet_buckets(
    df: DataFrame,
    lm: BigramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str | None = None,
    cutoffs: dict[str, tuple[float, float]] | None = None,
    scores: DataFrame | None = None,
) -> DataFrame:
    """CCNet-style corpus split: per-language head / middle / tail thirds by
    LM score ("CCNet: Extracting High Quality Monolingual Datasets from Web
    Crawl Data", Wenzek et al. 2020 — their perplexity terciles, expressed
    over the stupid-backoff avg_logprob this engine's LM produces; higher
    avg_logprob = lower perplexity = head).

    Returns (id_col, lang, n_bigrams, avg_logprob, bucket).  Documents with
    fewer than 2 tokens carry no LM evidence and are absent (the
    lm_doc_scores contract).  ``lang_col`` names an existing language
    column; when None, functions/text.lang_id derives one.

    Two modes, one schema:

    - **Exact rank mode** (default, ``cutoffs=None``): within each language,
      rank docs by (avg_logprob DESC, id ASC) and split at ceil(n/3) /
      ceil(2n/3).  The rule is evaluated as pure INTEGER arithmetic
      (rn <= ceil(n/3)  <=>  3*rn <= n + 2), so there is no float-boundary
      ambiguity for the DuckDB oracle to disagree with.  Physical shape:
      one hash exchange on lang + an in-partition sort — fine until a
      single language outgrows one task (each language is one window
      partition), which a 100 TB monolingual corpus WILL do.
    - **Broadcast-cutoff mode** (``cutoffs={lang: (head_min, middle_min)}``):
      the production CCNet shape — thresholds are estimated once (on a
      sample or with approx_percentile, see :func:`ccnet_cutoffs`), then
      bucket assignment is a MAP-ONLY pass (one broadcast join against a
      #languages-row table, no sort, no per-language task).  bucket =
      head when avg_logprob >= head_min, middle when >= middle_min, else
      tail; a language with no entry in ``cutoffs`` gets a NULL bucket
      (no thresholds = no classification — the caller decides, rather
      than a silent whole-language 'tail').  This is the mode that
      survives 100 TB; the exact mode is the oracle-checkable
      small-scale twin.
    """
    if scores is None:
        scores = lm_doc_scores(df, lm, text_col, id_col)
    if lang_col is None:
        from tilekiln_spark.functions.text import lang_id

        langs = df.select(F.col(id_col), lang_id(F.col(text_col)).alias("lang"))
    else:
        langs = df.select(F.col(id_col), F.col(lang_col).alias("lang"))
    # both sides are corpus-sized narrow frames keyed by id: AQE's call
    # (shuffle join at scale, auto-broadcast at test sizes)
    scored = scores.join(langs, id_col)

    if cutoffs is not None:
        spark = df.sparkSession
        cut_rows = [(k, float(v[0]), float(v[1])) for k, v in sorted(cutoffs.items())]
        cuts = spark.createDataFrame(
            cut_rows, "lang string, head_min double, middle_min double"
        )
        # a language absent from cutoffs carries NO thresholds: its docs
        # get a NULL bucket (the caller decides), never a silent 'tail'
        # (under CCNet's head+middle keep rule that would drop the whole
        # language without a trace)
        return scored.join(F.broadcast(cuts), "lang", "left").select(
            id_col,
            "lang",
            "n_bigrams",
            "avg_logprob",
            F.when(F.col("avg_logprob") >= F.col("head_min"), F.lit("head"))
            .when(F.col("avg_logprob") >= F.col("middle_min"), F.lit("middle"))
            .when(F.col("middle_min").isNotNull(), F.lit("tail"))
            .alias("bucket"),
        )

    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(
        F.col("avg_logprob").desc(), F.col(id_col).asc()
    )
    wn = Window.partitionBy("lang")
    rn = F.row_number().over(w)
    n = F.count("*").over(wn)
    return scored.select(
        id_col,
        "lang",
        "n_bigrams",
        "avg_logprob",
        F.when(3 * rn <= n + 2, F.lit("head"))
        .when(3 * rn <= 2 * n + 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def ccnet_cutoffs(
    df: DataFrame,
    lm: BigramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str | None = None,
    accuracy: int = 10_000,
    scores: DataFrame | None = None,
) -> dict[str, tuple[float, float]]:
    """Per-language (head_min, middle_min) score thresholds for
    :func:`ccnet_buckets`'s broadcast-cutoff mode, via approx_percentile —
    a map-side-combinable quantile sketch, so the whole estimate is ONE
    partial-aggregated groupBy(lang) whose reduce side holds a bounded
    sketch per language, never the score list.  head_min = the 2/3
    quantile of avg_logprob (top third scores above it), middle_min = 1/3.

    The collect is #languages rows of two doubles — driver-safe by
    construction.  Estimated thresholds bucket borderline docs differently
    than the exact rank rule (documented recall, not correctness, drift —
    the same contract as ann IVF's seeded centroids).  ``scores``: a
    precomputed (persisted) lm_doc_scores frame — pass the SAME frame to
    :func:`ccnet_buckets` so estimate + assignment pay the scoring scan
    once, not twice."""
    if scores is None:
        scores = lm_doc_scores(df, lm, text_col, id_col)
    if lang_col is None:
        from tilekiln_spark.functions.text import lang_id

        langs = df.select(F.col(id_col), lang_id(F.col(text_col)).alias("lang"))
    else:
        langs = df.select(F.col(id_col), F.col(lang_col).alias("lang"))
    rows = (
        scores.join(langs, id_col)
        .groupBy("lang")
        .agg(
            F.percentile_approx(
                "avg_logprob", [2.0 / 3.0, 1.0 / 3.0], accuracy
            ).alias("qs")
        )
        .collect()
    )
    return {r["lang"]: (float(r["qs"][0]), float(r["qs"][1])) for r in rows}


# ---------------------------------------------------------------------------
# Trigram extension: chained stupid backoff (the web-scale n-gram shape)
# ---------------------------------------------------------------------------

def _trigram_triples(text: Column) -> Column:
    """array<struct<w1,w2,w3>> of adjacent token triples (empty below 3)."""
    from tilekiln_spark.operators.dedup import _tokens

    toks = _tokens(text)
    m = F.size(toks) - 2
    zipped = F.arrays_zip(
        F.slice(toks, 1, m).alias("w1"),
        F.slice(toks, 2, m).alias("w2"),
        F.slice(toks, 3, m).alias("w3"),
    )
    return F.when(
        m < 1, F.array().cast("array<struct<w1:string,w2:string,w3:string>>")
    ).otherwise(zipped)


@dataclass(frozen=True)
class TrigramLM:
    """BigramLM plus a pruned trigram table — the chained-backoff model:

        S(w3 | w1 w2) = c(w1w2w3) / c(w1w2)        both counts kept
                      = 0.4 * S(w3 | w2)           else (bigram level)
        S(w3 | w2)    = c(w2w3) / c(w2)            both counts kept
                      = 0.4 * c(w3) / T            else (unigram level)
                      = 0.4 * 0.5 / T              w3 unseen

    (Brants et al. 2007 — each backoff level multiplies the fixed 0.4.)"""

    base: BigramLM
    tri: DataFrame  # w1, w2, w3, c

    def unpersist(self) -> None:
        self.base.unpersist()
        self.tri.unpersist()


def train_trigram_lm(
    df: DataFrame,
    text_col: str = "text",
    k_vocab: int = 50_000,
    m_bigrams: int = 200_000,
    p_trigrams: int = 400_000,
) -> TrigramLM:
    """One more counting scan on top of train_bigram_lm: the pruned
    trigram table (TakeOrdered, ties broken by the triple) — three corpus
    scans total, model bounded at K+M+P rows."""
    base = train_bigram_lm(df, text_col, k_vocab, m_bigrams)
    tg = df.select(F.explode(_trigram_triples(F.col(text_col))).alias("t")).select(
        F.col("t.w1").alias("w1"),
        F.col("t.w2").alias("w2"),
        F.col("t.w3").alias("w3"),
    )
    tri_rows = (
        tg.groupBy("w1", "w2", "w3")
        .agg(F.count("*").alias("c"))
        .orderBy(
            F.col("c").desc(),
            F.col("w1").asc(), F.col("w2").asc(), F.col("w3").asc(),
        )
        .limit(p_trigrams)
        .collect()
    )
    tri = df.sparkSession.createDataFrame(
        [(r["w1"], r["w2"], r["w3"], r["c"]) for r in tri_rows],
        "w1 string, w2 string, w3 string, c bigint",
    )
    return TrigramLM(base=base, tri=tri)


def lm3_doc_scores(
    df: DataFrame,
    lm: TrigramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document chained stupid-backoff score over adjacent triples:
    (id, n_trigrams, avg_logprob).  Five broadcast lookups — tri(1,2,3),
    bi(1,2), bi(2,3), uni(2), uni(3) — then the one per-doc rollup, same
    shuffle shape as the bigram scorer.  Docs with < 3 tokens are absent
    (no trigram evidence) on both engines."""
    T = float(lm.base.total_tokens)
    triples = df.select(
        F.col(id_col), F.explode(_trigram_triples(F.col(text_col))).alias("t")
    ).select(
        id_col,
        F.col("t.w1").alias("w1"),
        F.col("t.w2").alias("w2"),
        F.col("t.w3").alias("w3"),
    )
    tri = F.broadcast(lm.tri.select("w1", "w2", "w3", F.col("c").alias("c123")))
    b12 = F.broadcast(
        lm.base.bi.select(
            F.col("w1"), F.col("w2"), F.col("c").alias("c12")
        )
    )
    b23 = F.broadcast(
        lm.base.bi.select(
            F.col("w1").alias("w2"), F.col("w2").alias("w3"), F.col("c").alias("c23")
        )
    )
    u2 = F.broadcast(lm.base.uni.select(F.col("token").alias("w2"), F.col("c").alias("c2")))
    u3 = F.broadcast(lm.base.uni.select(F.col("token").alias("w3"), F.col("c").alias("c3")))
    # the bigram-level score S(w3|w2), shared by both backoff paths
    s23 = (
        F.when(
            F.col("c23").isNotNull() & F.col("c2").isNotNull(),
            F.col("c23").cast("double") / F.col("c2"),
        )
        .when(F.col("c3").isNotNull(), F.lit(BACKOFF) * F.col("c3") / F.lit(T))
        .otherwise(F.lit(BACKOFF * UNSEEN_COUNT) / F.lit(T))
    )
    scored = (
        triples.join(tri, ["w1", "w2", "w3"], "left")
        .join(b12, ["w1", "w2"], "left")
        .join(b23, ["w2", "w3"], "left")
        .join(u2, ["w2"], "left")
        .join(u3, ["w3"], "left")
        .withColumn(
            "lp",
            F.when(
                F.col("c123").isNotNull() & F.col("c12").isNotNull(),
                F.log(F.col("c123").cast("double") / F.col("c12")),
            ).otherwise(F.log(F.lit(BACKOFF) * s23)),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_trigrams"),
        F.round(F.avg("lp"), 6).alias("avg_logprob"),
    )
