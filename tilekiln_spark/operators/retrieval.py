"""Lexical retrieval: BM25 top-k over the corpus.

The keyword-search complement to the vector side (operators/similarity.py
brute-force / LSH / IVF ANN): rank documents for a term query with Okapi
BM25 using Lucene's IDF form,

    score(D, Q) = sum_t idf(t) * tf * (k1 + 1)
                              / (tf + k1 * (1 - b + b * |D| / avgdl))
    idf(t)      = ln((N - df(t) + 0.5) / (df(t) + 0.5) + 1)

Scale shape — one corpus pass, everything else bounded:

- The per-document token array is FILTERED to the query terms inside the
  row (``F.filter`` + isin, codegen) BEFORE the explode, so the explode
  emits at most |Q| terms per doc, not the document's tokens — documents
  sharing no term with the query contribute zero rows.
- One partial-aggregated groupBy (doc, term) produces term frequencies
  (doc length rides along as first(); it's constant per doc).
- df(t) reduces from the same tf frame — |Q| rows — and joins back
  broadcast.  N and avgdl are two scalars from one tiny aggregate.
- The final top-k is orderBy().limit() = TakeOrderedAndProject, ranked on
  the ROUNDED score (6 places, house float convention) with doc id as
  tie-break, so the k-boundary is deterministic and engine-independent.

Tokenization shares operators/dedup._tokens with the rest of the text
stack; query terms are matched post-lowercasing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(id, score) of the k best BM25 matches for `query_terms`."""
    from tilekiln_spark.operators.dedup import _tokens

    terms = [t.lower() for t in query_terms]
    toks = _tokens(F.col(text_col))
    stats = docs.agg(
        F.count("*").alias("n"), F.avg(F.size(toks)).alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(stats["n"]), float(stats["avgdl"] or 0.0)
    qlit = F.array(*[F.lit(t) for t in terms])
    hits = docs.select(
        F.col(id_col),
        F.size(toks).alias("dl"),
        F.explode(F.filter(toks, lambda t: F.array_contains(qlit, t))).alias("term"),
    )
    tf = hits.groupBy(id_col, "term").agg(
        F.count("*").alias("tf"), F.first("dl").alias("dl")
    )
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log((F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .withColumn(
            "s",
            idf
            * (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (1.0 - b + F.lit(b) * F.col("dl") / F.lit(avgdl))
            ),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("s"), 6).alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    c: float = 60.0,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR 2009): fuse ranked
    lists by sum of 1/(c + rank) — the standard hybrid-search combiner for
    a lexical and a vector ranking, rank-based so the two scores need no
    calibration.

    Cross-engine exactness: ranks are integers, each document appears at
    most once per list, and a sum of <=len(rankings) identical doubles is
    order-free — so the fused score is bit-identical across engines with
    no rounding crutch (rounded to 9 only as belt-and-braces).  Each input
    is a bounded top-k list, so the union + groupBy runs on k*len(rankings)
    rows, never the corpus."""
    parts = [
        r.select(F.col(id_col), (1.0 / (F.lit(c) + F.col(rank_col))).alias("w"))
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy(id_col).agg(F.round(F.sum("w"), 9).alias("rrf"))


def tfidf_keywords(
    docs: DataFrame,
    n_keywords: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-n characteristic terms per document by smoothed tf-idf
    (idf = ln((N+1)/(df+1)) + 1, the sklearn smoothing), ranked on the
    ROUNDED score with term tie-break so the cut is deterministic.

    Plan shape: one corpus explode -> partial-aggregated groupBy
    (doc, term) (rows of one doc sit in one partition, so map-side combine
    collapses them before the exchange) -> df(t) reduced from the tf frame
    and joined back WITHOUT a broadcast hint (unlike the BM25 df join,
    this table is the full distinct vocabulary — corpus-sized at web
    scale; AQE broadcasts it at test sizes and shuffle-joins on the term
    key beyond that) -> per-doc row_number window with a LITERAL limit,
    which Catalyst caps via WindowGroupLimit BEFORE the doc exchange.
    """
    from pyspark.sql import Window

    from tilekiln_spark.operators.dedup import _tokens

    n_docs = docs.count()
    tf = (
        docs.select(F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0)) + 1.0
    scored = tf.join(df_t, "term").withColumn(
        "score", F.round(F.col("tf") * idf, 6)
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= F.lit(int(n_keywords)))
        .select(id_col, "term", "score", F.col("pos").cast("int").alias("pos"))
    )


def phrase_search(
    df: DataFrame,
    phrase: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact phrase matching over positional postings — the inverted-
    index primitive BM25 can't express (term adjacency, 'slow hash
    batch' as one unit, Manning/Raghavan/Schütze IIR §2.4.2).

    Positions are 1-based token offsets in the shared dedup._tokens
    stream.  The plan is the classical positional-postings
    intersection: posexplode the token array once, keep ONLY rows whose
    term is in the phrase (the BM25 pre-explode filter trick bounds the
    explode), then one equi-join per subsequent term on
    (doc, start_pos) — term k must sit at start + k, so each join is
    keyed on the composite (doc, pos) and Catalyst plans |phrase| - 1
    hash joins whose build sides shrink monotonically (the rarest-first
    optimization is a column-stat reorder away).  Exact integers only.

    At 100 TB the postings frame is the thing you persist bucketed by
    term (the bm25 inverted index); each phrase query then touches
    |phrase| posting buckets, never the corpus.
    Returns [doc_id, n_matches, first_pos] for docs containing the
    phrase."""
    if not phrase:
        raise ValueError("phrase_search: phrase must be non-empty")
    from tilekiln_spark.operators.dedup import _tokens

    terms = [t.lower() for t in phrase]
    tok = df.select(
        F.col(id_col),
        F.posexplode(_tokens(F.col(text_col))).alias("p0", "w"),
    ).where(F.col("w").isin(terms)).select(
        id_col, (F.col("p0") + 1).alias("pos"), "w"
    )
    hits = tok.where(F.col("w") == terms[0]).select(id_col, "pos")
    for k, t in enumerate(terms[1:], start=1):
        nxt = tok.where(F.col("w") == t).select(
            id_col, (F.col("pos") - k).alias("pos")
        )
        hits = hits.join(nxt, [id_col, "pos"])
    return hits.groupBy(id_col).agg(
        F.count("*").alias("n_matches"), F.min("pos").alias("first_pos")
    )
