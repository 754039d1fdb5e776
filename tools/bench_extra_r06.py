"""Round-6 extra bench cells (VERDICT r5 "Next round" #7/#10): measured
numbers for the r5 operators' scale claims, kept OUT of the frozen
bench.py per the round rules.

Cells:
  geoparse  — gazetteer_geoparse + place_cooccurrence with a 10^5-entry
              gazetteer over 1M synthetic docs (the broadcast-dim claim
              at a GeoNames-realistic dictionary size, not the 20-row
              driver fixture).
  shards    — hilbert_balanced_shards (S=1024) over the 6.4M-page
              geocoded input (the two-pass-rank claim at the BASELINE
              gen input size).
  pipeline  — the ccnet corpus pipeline over documents scaled 32x by
              union-explode (~page-count stretch; VERDICT #10's "surface
              any fixture-size assumption" probe at local[32]).

Usage: python tools/bench_extra_r06.py [cell ...]   (default: all)
Appends one JSON line per cell to BENCH/cells_extra_r06.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def build_session(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("bench_extra_r06")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "48g"))
        .getOrCreate()
    )


def cell_geoparse(spark):
    from pyspark.sql import functions as F

    from tilekiln_spark.operators.geoparse import (
        gazetteer_geoparse,
        place_cooccurrence,
    )

    n_places, n_docs = 100_000, 1_000_000
    gaz = spark.range(n_places).select(
        F.concat(F.lit("place"), F.col("id").cast("string")).alias("place"),
        (F.col("id") % 10).cast("int").alias("place_rank"),
        (F.col("id") % 180 - 90.0).alias("lat"),
        (F.col("id") % 360 - 180.0).alias("lon"),
    )
    i = F.col("id")
    # ~8 tokens/doc, ~4 of which hit the gazetteer (ids re-used mod 100k)
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(7)),
                lambda j: F.when(
                    j % 2 == 0,
                    F.concat(
                        F.lit("place"),
                        ((i * 31 + j * 977) % n_places).cast("string"),
                    ),
                ).otherwise(F.concat(F.lit("word"), j.cast("string"))),
            ),
            " ",
        ).alias("text"),
    )
    t0 = time.time()
    mentions = gazetteer_geoparse(docs, gaz)
    n_mentions = mentions.count()
    t1 = time.time()
    n_pairs = place_cooccurrence(mentions).count()
    t2 = time.time()
    return {
        "n_places": n_places,
        "n_docs": n_docs,
        "n_mentions": n_mentions,
        "geoparse_sec": round(t1 - t0, 3),
        "cooccurrence_pairs": n_pairs,
        "cooccurrence_sec": round(t2 - t1, 3),
    }


def cell_shards(spark):
    from tilekiln_spark.operators.sampling import hilbert_balanced_shards
    from tilekiln_spark.operators.tiling import pages_geo
    from tilekiln_spark.sources.pages import pages

    n = 6_400_000
    geo = pages_geo(pages(spark, n, partitions=128)).select(
        "url", "mx", "my"
    ).withColumnRenamed("url", "doc_id")
    t0 = time.time()
    sharded = hilbert_balanced_shards(geo, n_shards=1024)
    stats = sharded.groupBy("shard").count()
    agg = stats.agg(
        {"count": "min", "shard": "count"}
    ).collect()[0]
    t1 = time.time()
    return {
        "n_rows": n,
        "n_shards": int(agg["count(shard)"]),
        "min_shard_rows": int(agg["min(count)"]),
        "expected_rows_per_shard": n // 1024,
        "sec": round(t1 - t0, 3),
    }


def cell_pipeline(spark):
    """VERDICT #10 stretch probe: the ccnet funnel (same args as the
    declared corpus_pipeline_ccnet query) over documents scaled 32x with
    distinct ids and rep-salted text, so dedup keeps its fixture-like
    selectivity instead of collapsing the whole corpus."""
    from pyspark.sql import functions as F

    from tilekiln_spark.operators.pipeline import training_corpus_pipeline

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents")).select(
        "doc_id", "text"
    )
    scale = 32
    big = docs.crossJoin(
        spark.range(scale).withColumnRenamed("id", "__rep")
    ).select(
        (F.col("doc_id") + F.col("__rep") * 10_000_000).alias("doc_id"),
        F.concat(
            F.col("text"), F.lit(" rep"), F.col("__rep").cast("string")
        ).alias("text"),
    )
    n = big.count()
    bench = docs.filter(F.col("doc_id") % 97 == 0).select("text")
    t0 = time.time()
    row = training_corpus_pipeline(
        big, bench,
        quality={"min_words": 20, "max_words": 80,
                 "min_mean_word_len": 4.0, "max_dup_ngram_frac": 0.08},
        lm_min_logprob=-4.15, lm_k_vocab=30, lm_m_bigrams=120,
    ).collect()[0].asDict()
    t1 = time.time()
    return {"n_docs_in": n, "scale": scale, "sec": round(t1 - t0, 3),
            "funnel": {k: int(v) for k, v in row.items()}}


CELLS = {
    "geoparse": cell_geoparse,
    "shards": cell_shards,
    "pipeline": cell_pipeline,
}


def main():
    names = sys.argv[1:] or list(CELLS)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    out_path = "/root/repo/BENCH/cells_extra_r06.jsonl"
    for name in names:
        spark = build_session(cpus)
        spark.sparkContext.setLogLevel("ERROR")
        spark.sparkContext.setJobDescription(f"extra cell: {name}")
        try:
            res = CELLS[name](spark)
            res.update({"cell": name, "cpus": cpus, "ts": time.time()})
            print("RESULT " + json.dumps(res))
            with open(out_path, "a") as f:
                f.write(json.dumps(res) + "\n")
        finally:
            spark.stop()


if __name__ == "__main__":
    main()
