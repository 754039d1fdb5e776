"""Data selection via importance resampling (DSIR).

Implements the hashed-n-gram importance-weight estimator of Xie et al.
2023, "Data Selection for Language Models via Importance Resampling"
(NeurIPS): fit two bag-of-hashed-grams models — p̂ on a TARGET corpus
(the distribution you want more of) and q̂ on the RAW pool — and score
every raw document with

    log w(x) = Σ_b f_b(x) · (log p̂_b − log q̂_b)

where f is the document's hashed unigram+bigram count vector and both
models use add-one smoothing over the ``buckets``-sized hashed feature
space.  Selection is then a deterministic ORDER BY weight (or a Gumbel
top-k when sampling proportional-to-weight is wanted); compose with
``sampling.stratified_quota_sample``/``shard_assign`` downstream.

Scale shape (10^12-doc raw pool):

- feature extraction is map-only (tokenize → shifted-slice bigrams →
  md5-bucket), the same expression pattern as dedup.shingles — no UDF;
- BOTH models are groupBys bounded by ``buckets`` rows (the hashing
  trick caps the vocabulary), so the log-ratio table is always
  broadcastable — the scoring join never shuffles the corpus;
- the only corpus-sized exchange is the per-doc score rollup, keyed on
  the doc key (count + sum — full map-side combine);
- no driver collect anywhere: the model totals ride 1-row cross joins.

Engine portability: bucket = (first 8 md5 hex chars as int) mod buckets
— the same draw shard_assign uses, reproducible in any engine (DuckDB:
``CAST('0x' || substr(md5(g),1,8) AS BIGINT)``), unlike xxhash64.  The
final weight is rounded to 6 places (house convention: both engines sum
doubles in their own order; lr magnitudes keep the drift ~1e-12).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hashed_gram_buckets(text: Column, buckets: int = 8192) -> Column:
    """array<int>: hashed unigram+bigram feature buckets of a document.

    Bigrams ride the shifted-slice arrays_zip (one tokenization total —
    see dedup.shingles for why lambdas that re-reference the split
    re-evaluate it per element)."""
    t = F.trim(F.lower(text))
    toks = F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )
    n = F.size(toks)
    m = n - 1
    bi = F.when(n < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.arrays_zip(
                F.slice(toks, 1, m).alias("t0"), F.slice(toks, 2, m).alias("t1")
            ),
            lambda s: F.concat_ws(" ", s["t0"], s["t1"]),
        )
    )
    grams = F.concat(toks, bi)
    from tilekiln_spark.operators.sampling import md5_u32

    return F.transform(
        grams,
        lambda g: (md5_u32(F.encode(g, "utf-8")) % F.lit(int(buckets))).cast("int"),
    )


def _feats(df: DataFrame, text_col: str, key_col: str | None, buckets: int):
    from tilekiln_spark.operators.dedup import spread_cpu

    # spread: the hashed-gram explode is the CPU-bound kernel before the
    # bucket-keyed rollups (no-op when the layout already spans the cores)
    df = spread_cpu(df, key_col) if key_col else spread_cpu(df)
    cols = ([F.col(key_col).alias("__key")] if key_col else []) + [
        F.explode(hashed_gram_buckets(F.col(text_col), buckets)).alias("__b")
    ]
    return df.select(*cols)


def dsir_weights(
    df: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    buckets: int = 8192,
) -> DataFrame:
    """Per-document DSIR importance log-weight of every ``df`` row against
    the ``target`` corpus distribution.

    Returns one row per input doc: ``(key, n_grams, dsir_logweight)`` —
    weight 0.0 (and n_grams 0) for docs with no tokens.  Higher weight =
    more target-like; select with ``ORDER BY dsir_logweight DESC, key
    LIMIT k`` (deterministic) or add Gumbel noise keyed on the md5 draw
    for sampled selection."""
    raw = _feats(df, text_col, key_col, buckets)
    tgt = _feats(target, text_col, None, buckets)
    ct = tgt.groupBy("__b").agg(F.count("*").alias("__ct"))
    cr = raw.groupBy("__b").agg(F.count("*").alias("__cr"))
    nt = tgt.agg(F.count("*").cast("double").alias("__nt"))
    nr = raw.agg(F.count("*").cast("double").alias("__nr"))
    b = F.lit(float(buckets))
    ratio = (
        ct.join(cr, "__b", "full")
        .crossJoin(nt)
        .crossJoin(nr)
        .select(
            "__b",
            (
                F.log(
                    (F.coalesce("__ct", F.lit(0)) + 1).cast("double")
                    / (F.col("__nt") + b)
                )
                - F.log(
                    (F.coalesce("__cr", F.lit(0)) + 1).cast("double")
                    / (F.col("__nr") + b)
                )
            ).alias("__lr"),
        )
    )
    scored = (
        raw.join(F.broadcast(ratio), "__b")
        .groupBy("__key")
        .agg(
            F.count("*").alias("n_grams"),
            F.round(F.sum("__lr"), 6).alias("dsir_logweight"),
        )
    )
    keys = df.select(F.col(key_col).alias("__key")).distinct()
    return keys.join(scored, "__key", "left").select(
        F.col("__key").alias(key_col),
        F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
        F.coalesce("dsir_logweight", F.lit(0.0)).alias("dsir_logweight"),
    )


def dsir_resample(
    df: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    key_col: str = "doc_id",
    buckets: int = 8192,
    seed: int = 42,
) -> DataFrame:
    """The RESAMPLING half of DSIR: draw ``k`` documents from ``df``
    proportional to their importance weight, via the Gumbel-max trick —
    ``argmax_k (log w(x) + Gumbel(0,1))`` is an exact sample-without-
    replacement from the softmax over log-weights, and it is embarrassingly
    parallel: one perturbed key per doc, then a global top-k.

    The Gumbel noise is DETERMINISTIC — ``u = (md5('g{seed}:' || key)[:8]
    as uint32 + 0.5) / 2^32`` (strictly inside (0,1), so the double logs
    never hit infinity), ``g = -ln(-ln(u))`` — the same engine-portable
    md5 draw as sampling.shard_assign, so any engine reproduces the exact
    selection.  The perturbed key is rounded to 6 places BEFORE the order
    (house convention: cross-engine libm ulp drift), ties break by key.

    Scale: weights are the broadcast-model scoring pass of
    :func:`dsir_weights`; the top-k compiles to TakeOrderedAndProject —
    per-partition heaps of k rows each, no global sort, no shuffle of the
    corpus.  Returns (key, n_grams, dsir_logweight, gumbel_key), the k
    selected docs."""
    from tilekiln_spark.operators.sampling import md5_u32

    w = dsir_weights(df, target, text_col, key_col, buckets)
    h = md5_u32(
        F.concat(F.lit(f"g{seed}:"), F.col(key_col).cast("string"))
    ).cast("double")
    u = (h + F.lit(0.5)) / F.lit(4294967296.0)
    gk = F.round(F.col("dsir_logweight") - F.log(-F.log(u)), 6)
    return (
        w.select(key_col, "n_grams", "dsir_logweight", gk.alias("gumbel_key"))
        .orderBy(F.col("gumbel_key").desc(), F.col(key_col).asc())
        .limit(k)
    )
