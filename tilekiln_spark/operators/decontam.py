"""Benchmark decontamination: flag training docs that share n-grams with an
evaluation set.

The standard pre-training hygiene pass: any document carrying a long-enough
token n-gram that also appears in a benchmark (eval question/answer) is
flagged so it can be dropped or audited — otherwise the model trains on its
own test set.  Shape at scale: the BENCHMARK side is tiny relative to the
corpus, so its distinct shingle hashes broadcast; the corpus side is one
map-only shingle pass + explode, the broadcast semi-join marks hits
in-place, and the only shuffle is the per-doc hit count over the (rare)
matching rows.  Nothing here grows with corpus size except the scan.

Shares the tokenizer/shingle pipeline with the MinHash dedup operators, so
"n-gram" means the same thing across dedup, repetition signals, and
decontamination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tilekiln_spark.operators.dedup import shingles, spread_cpu


def contamination_hits(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    key_col: str = "doc_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_hits) for corpus docs sharing >=1 token n-gram with the
    benchmark; n_hits counts the doc's DISTINCT contaminated n-grams."""
    bench_grams = (
        benchmark.select(
            F.explode(F.array_distinct(shingles(F.col(bench_text_col), n))).alias("g")
        )
        .select(F.xxhash64("g").alias("gh"))
        .distinct()
    )
    # the corpus-side shingle pass is the CPU-bound kernel — spread it
    # across cores when the source layout is narrower than the session
    doc_grams = spread_cpu(corpus, key_col).select(
        F.col(key_col),
        F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias("g"),
    ).select(key_col, F.xxhash64("g").alias("gh"))
    return (
        doc_grams.join(F.broadcast(bench_grams), "gh", "left_semi")
        .groupBy(key_col)
        .agg(F.count("*").alias("n_hits"))
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_hits: int = 1,
    text_col: str = "text",
    key_col: str = "doc_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """Corpus with contaminated docs (>= min_hits shared n-grams) removed.

    The removal is an anti-join against the small flagged-id set — corpus
    rows never shuffle."""
    flagged = contamination_hits(
        corpus, benchmark, n, text_col, key_col, bench_text_col
    ).filter(F.col("n_hits") >= min_hits)
    return corpus.join(
        F.broadcast(flagged.select(key_col)), key_col, "left_anti"
    )


def semantic_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    bench_key: str = "bench_id",
) -> DataFrame:
    """Embedding-space contamination: (key, n_hits, hit_of, best_cos) for
    corpus docs whose embedding reaches ``threshold`` cosine against ANY
    benchmark item — catches paraphrased/translated eval leakage the exact
    n-gram pass cannot see (the FineWeb/GPT-3 appendix-style semantic
    check next to contamination_hits' lexical one).

    ``hit_of`` is the MIN matching benchmark id (deterministic audit
    pointer), ``best_cos`` the max cosine over matches rounded to 6.

    Scale shape: eval sets are tiny vs the corpus, so the benchmark
    embeddings ride a broadcast nested-loop against a map-only corpus
    scan (the brute_force_topk plan without the window): per corpus row
    it is |bench| fused-codegen cosine folds, no shuffle of corpus rows;
    the only exchange is the per-doc rollup over the (rare) >=threshold
    matches.  For benchmark sides too big to broadcast, bucket both
    sides with the IVF assign kernel first (semantic_dedup's plan) —
    same verdict columns."""
    from tilekiln_spark.operators.similarity import cosine_sim

    b = benchmark.select(
        F.col(bench_key).alias("__bid"), F.col(vec_col).alias("__bvec")
    )
    hits = (
        corpus.select(key_col, vec_col)
        .join(F.broadcast(b))
        .withColumn("__cos", cosine_sim(F.col(vec_col), F.col("__bvec")))
        .filter(F.col("__cos") >= threshold)
        .groupBy(key_col)
        .agg(
            F.count("*").alias("n_hits"),
            F.min("__bid").alias("hit_of"),
            F.round(F.max("__cos"), 6).alias("best_cos"),
        )
    )
    keys = corpus.select(key_col)
    return keys.join(hits, key_col, "left").select(
        F.col(key_col),
        F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
        "hit_of",
        F.coalesce("best_cos", F.lit(0.0)).alias("best_cos"),
    )
