"""Gazetteer geoparsing (operators/geoparse.py)."""

from pyspark.sql import functions as F

from tilekiln_spark.operators.geoparse import (
    build_gazetteer,
    gazetteer_geoparse,
    tokens_lower,
)


def test_tokens_lower(spark):
    df = spark.createDataFrame([("Hello, WORLD!! 42 foo-bar",)], "text string")
    toks = df.select(tokens_lower(F.col("text")).alias("t")).collect()[0]["t"]
    assert toks == ["hello", "world", "foo", "bar"]


def test_geoparse_counts_and_broadcast(spark):
    docs = spark.createDataFrame(
        [
            (0, "paris paris lyon"),
            (1, "PARIS and nowhere"),
            (2, "lyon lyon lyon zz"),
        ],
        "doc_id long, text string",
    )
    gaz = build_gazetteer(docs, top_k=2, min_len=4)
    ranks = {r["place"]: r["place_rank"] for r in gaz.collect()}
    # lyon: 4 mentions, paris: 3 -> lyon rank 1
    assert ranks == {"lyon": 1, "paris": 2}
    out = gazetteer_geoparse(docs, gaz)
    rows = {(r["doc_id"], r["place"]): r["n_mentions"] for r in out.collect()}
    assert rows == {
        (0, "paris"): 2, (0, "lyon"): 1, (1, "paris"): 1, (2, "lyon"): 3,
    }
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
