"""The composed training-corpus pipeline: raw web docs -> training sequences.

One call chains the engine's corpus operators in their production order —

    [quality gates ->] exact dedup -> near-dup clustering (keep canonical)
    -> benchmark decontamination -> deterministic sampling ->
    sequence packing

— and returns the corpus funnel as a single stats row, so a user can run
the whole pretraining-data pass with one function and diff the stage
counts across runs.  Every stage is one of the individually oracle-checked
operators; composing them adds NO new shuffles beyond each stage's own
(the stages communicate by doc id: narrow frames all the way down).

Scale shape: exact dedup is one hash shuffle; clustering runs over the
verified pair list only; decontamination and sampling are broadcast/map
passes over the survivors; packing range-partitions once.  The funnel
counts come from the same frames the stages already materialize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tilekiln_spark.operators.decontam import decontaminate
from tilekiln_spark.operators.dedup import dedup_clusters, exact_dedup
from tilekiln_spark.operators.packing import pack_sequences
from tilekiln_spark.operators.sampling import sample_fraction


def training_corpus_pipeline(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    ngram: int = 8,
    fraction: float = 0.5,
    seq_len: int = 4096,
    seed: int = 17,
    quality: dict | None = None,
    lm_min_logprob: float | None = None,
    lm_buckets: tuple[str, ...] | None = None,
    lm_k_vocab: int = 50_000,
    lm_m_bigrams: int = 200_000,
    probe: dict | None = None,
) -> DataFrame:
    """One stats row: n_raw, [n_admitted,] [n_lm,] n_exact, n_canonical,
    n_clean, [n_probe,] n_sampled, total_chars, n_sequences (see module
    docstring).

    ``quality`` (optional): kwargs for operators/quality.doc_quality_flags;
    when given, the Gopher admission gates run FIRST (the production order:
    quality is a map-only pass, so gating before the dedup shuffle shrinks
    every downstream stage) and the row gains n_admitted after n_raw.

    ``lm_min_logprob`` (optional): the CCNet-style perplexity filter — a
    pruned bigram LM (functions/lm.py) trains on the admitted docs and
    documents whose avg stupid-backoff logprob falls BELOW the threshold
    (most surprising = most gibberish-like under the corpus's own
    statistics) are dropped; docs too short to have bigrams pass (no
    evidence).  Fixed threshold, not a percentile, so the stage is
    deterministic and cross-engine checkable.  Adds n_lm to the row.

    ``lm_buckets`` (optional, exclusive with ``lm_min_logprob``): the
    paper-faithful CCNet selection instead of a fixed threshold — bucket
    the admitted docs into per-language head/middle/tail perplexity
    terciles (functions/lm.ccnet_buckets, language derived by lang_id) and
    keep only the named buckets, e.g. ``("head", "middle")`` (CCNet's own
    choice).  Same n_lm slot in the funnel row.

    ``probe`` (optional): the FineWeb-Edu-style learned quality filter —
    {"embeddings": frame keyed by key_col with a vec_col column,
    "label_col": 0/1 training label on that frame, "min_prob": cut,
    "weights": pre-trained list (skips training), "vec_col"/"iters"/"lr"/
    "dim" passthroughs}.  The logistic probe (operators/classifier.py)
    trains on the embeddings frame, scores map-only, and docs whose prob
    falls below min_prob drop AFTER decontamination (the production
    order: the learned filter runs last so its training never sees
    benchmark leakage downstream stages would remove).  Docs with no
    embedding row pass (no evidence — same contract as the LM stage).
    Adds n_probe to the row."""
    # Each stage frame feeds BOTH its funnel count and the next stage —
    # persist them (memory-and-disk) so the count action doesn't recompute
    # the upstream chain: at corpus scale, re-running exact dedup three
    # times to print three numbers is the difference between one pass and
    # four.  Frames are unpersisted once their consumer materialized.
    # (r6 note: a corpus spread at pipeline entry was measured and
    # REJECTED — the funnel's many small downstream stages pay more in
    # 32-task scheduling than the gate stage gains; the CPU-bound
    # operators the stages call spread themselves where it wins.)
    n_raw = docs.count()
    n_admitted: int | None = None
    gated: DataFrame | None = None
    if quality is not None:
        from tilekiln_spark.operators.quality import doc_quality_flags

        gated = (
            doc_quality_flags(docs, text_col=text_col, **quality)
            .filter("keep")
            .drop("keep", "drop_reason")
            .persist()
        )
        n_admitted = gated.count()
        docs = gated
    n_lm: int | None = None
    lmkept: DataFrame | None = None
    if lm_min_logprob is not None and lm_buckets is not None:
        raise ValueError("pass lm_min_logprob OR lm_buckets, not both")
    if lm_min_logprob is not None or lm_buckets is not None:
        from tilekiln_spark.functions.lm import (
            ccnet_buckets,
            lm_doc_scores,
            train_bigram_lm,
        )

        lm = train_bigram_lm(docs, text_col, lm_k_vocab, lm_m_bigrams)
        if lm_buckets is not None:
            # the paper's own selection rule: per-language perplexity
            # terciles (language derived by functions/text.lang_id), keep
            # the configured buckets — CCNet keeps head+middle.  Exact rank
            # mode here (cross-engine-checkable); swap in cutoffs= for the
            # map-only form at 100 TB.
            b = ccnet_buckets(docs, lm, text_col, key_col).select(
                key_col, "bucket"
            )
            keep = F.coalesce(
                F.col("bucket").isin(*lm_buckets), F.lit(True)
            )
            drop_cols = ["bucket"]
            joined = docs.join(b, key_col, "left")
        else:
            scores = lm_doc_scores(docs, lm, text_col, key_col).select(
                key_col, "avg_logprob"
            )
            keep = F.coalesce(
                F.col("avg_logprob") >= F.lit(lm_min_logprob), F.lit(True)
            )
            drop_cols = ["avg_logprob"]
            joined = docs.join(scores, key_col, "left")
        # the score/bucket frame is one narrow row per doc — corpus-sized,
        # so NO broadcast hint: the doc-keyed join is AQE's call (shuffle
        # join at scale, auto-broadcast at test sizes).  Docs with no
        # bigrams carry no evidence and pass.
        lmkept = joined.filter(keep).drop(*drop_cols).persist()
        n_lm = lmkept.count()
        lm.unpersist()
        docs = lmkept
    exact = exact_dedup(docs, text_col, key_col).persist()
    n_exact = exact.count()
    if gated is not None:
        gated.unpersist()
    if lmkept is not None:
        lmkept.unpersist()

    labels = dedup_clusters(exact, text_col, key_col, threshold, num_perm, bands)
    canon_ids = labels.filter(F.col("is_canonical") == 1).select(key_col)
    canonical = exact.join(F.broadcast(canon_ids), key_col, "left_semi").persist()
    n_canonical = canonical.count()
    exact.unpersist()

    clean = decontaminate(canonical, benchmark, n=ngram, text_col=text_col,
                          key_col=key_col).persist()
    n_clean = clean.count()
    canonical.unpersist()

    n_probe: int | None = None
    if probe is not None:
        from tilekiln_spark.operators.classifier import (
            linear_probe_scores,
            train_linear_probe,
        )

        emb = probe["embeddings"]
        vec_col = probe.get("vec_col", "embedding")
        w = probe.get("weights")
        if w is None:
            train = emb.select(
                vec_col,
                F.col(probe["label_col"]).cast("double").alias("__y"),
            )
            w = train_linear_probe(
                train, vec_col=vec_col, label_col="__y",
                dim=probe.get("dim", 64), iters=probe.get("iters", 3),
                lr=probe.get("lr", 1.0),
            )
        scores = linear_probe_scores(emb, w, vec_col=vec_col, key_col=key_col)
        kept = (
            clean.join(scores.select(key_col, "prob"), key_col, "left")
            .filter(
                F.coalesce(
                    F.col("prob") >= F.lit(float(probe["min_prob"])), F.lit(True)
                )
            )
            .drop("prob")
            .persist()
        )
        n_probe = kept.count()
        clean.unpersist()
        clean = kept

    sampled = sample_fraction(clean, fraction, key_col, seed).withColumn(
        "__chars", F.length(F.col(text_col)).cast("long")
    )
    packed = pack_sequences(sampled, seq_len, "__chars", key_col)
    agg = packed.agg(
        F.count("*").alias("n_sampled"),
        F.sum("__chars").alias("total_chars"),
        (F.max("last_seq") + 1).alias("n_sequences"),
    ).collect()[0]
    clean.unpersist()

    spark = docs.sparkSession
    vals = [n_raw, n_exact, n_canonical, n_clean,
            agg["n_sampled"], agg["total_chars"], agg["n_sequences"]]
    schema = ("n_raw long, n_exact long, n_canonical long, n_clean long, "
              "n_sampled long, total_chars long, n_sequences int")
    if n_probe is not None:
        vals.insert(4, n_probe)
        schema = schema.replace("n_sampled long,", "n_probe long, n_sampled long,")
    if n_lm is not None:
        vals.insert(1, n_lm)
        schema = schema.replace("n_raw long,", "n_raw long, n_lm long,")
    if n_admitted is not None:
        vals.insert(1, n_admitted)
        schema = schema.replace("n_raw long,", "n_raw long, n_admitted long,")
    return spark.createDataFrame([tuple(vals)], schema)
