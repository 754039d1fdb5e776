"""WET source: byte-exact roundtrip incl. adversarial payloads that embed
header-like lines and multi-byte UTF-8 (Content-Length is bytes)."""

import pandas as pd

from tilekiln_spark.sources.wet import build_wet_shards, parse_wet

DOCS = [
    (0, "alpha", "plain text"),
    (1, "beta", "contains\r\n\r\nWARC/1.0\r\nContent-Length: 3\r\n\r\nfake"),
    (2, "alpha", "ünïcödé — 多字节 ✓"),
    (3, "beta", ""),  # empty payload
    (4, "alpha", "trailing newlines\r\n\r\n"),
]


def _docs(spark):
    return spark.createDataFrame(
        pd.DataFrame(DOCS, columns=["doc_id", "source", "text"]),
        "doc_id long, source string, text string",
    )


def test_wet_roundtrip_byte_exact(spark):
    shards = build_wet_shards(_docs(spark), n_shards=2)
    got = {
        r.uri: r.text for r in parse_wet(shards).collect()
    }
    want = {
        f"https://{src}/doc/{did}": text for did, src, text in DOCS
    }
    assert got == want


def test_wet_shard_assignment_and_order(spark):
    shards = {r.shard_id: r.payload for r in
              build_wet_shards(_docs(spark), n_shards=2).collect()}
    assert set(shards) == {0, 1}
    # doc order inside a shard is by doc_id: doc 0 before 2 before 4
    p0 = shards[0]
    assert p0.index("/doc/0") < p0.index("/doc/2") < p0.index("/doc/4")
