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
    and arrive PERSISTED + materialized from train_bigram_lm, so scoring
    (which references `uni` twice, for the w1 and w2 lookups) never
    re-scans the training corpus."""

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

    tok = df.select(F.explode(_tokens(F.col(text_col))).alias("token"))
    counts = tok.groupBy("token").agg(F.count("*").alias("c")).persist()
    total = counts.agg(F.sum("c").alias("n")).collect()[0]["n"]
    uni = (
        counts.orderBy(F.col("c").desc(), F.col("token").asc())
        .limit(k_vocab)
        .persist()
    )
    uni.count()  # materialize before dropping the full count table
    counts.unpersist()
    bg = df.select(F.explode(_bigram_pairs(F.col(text_col))).alias("bg")).select(
        F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )
    bi = (
        bg.groupBy("w1", "w2")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(m_bigrams)
        .persist()
    )
    bi.count()
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
