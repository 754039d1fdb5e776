"""WET-style (Common Crawl) record shards: build + parse.

The web-pipeline entry point the training-data operators consume: raw
crawl text arrives as WET files — concatenated records, each a small
header block (``WARC-Target-URI``, ``Content-Length`` in BYTES) followed
by the plain-text payload.  Real pipelines must parse by Content-Length
(a payload may legally CONTAIN header-like lines, so delimiter splitting
is wrong); this module does exactly that.

- :func:`build_wet_shards` — pure JVM expressions: records are
  concatenated per shard with ONE partial-aggregated groupBy (records
  sorted by doc_id inside the shard), Content-Length from
  ``octet_length`` (UTF-8 bytes, the WET contract).  Used to synthesize
  test/bench shards from the documents table; at production scale the
  shards would arrive from object storage instead.
- :func:`parse_wet` — ``mapInPandas`` (map-only, no shuffle; one
  Python pass per SHARD, not per record): walks each payload by encoded
  byte offsets, slicing exactly Content-Length bytes per record — the
  parse is correct even when a payload embeds ``WARC/1.0`` lines.

Roundtrip invariant (driver oracle `wet_roundtrip`):
``parse_wet(build_wet_shards(docs))`` returns every (uri, text) byte-
identically — the same extract-invariant contract the pages source pins
(sources/pages.py).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

_REC_HDR = "WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: "


def doc_uri(source, doc_id) -> "F.Column":
    """Deterministic URI for a documents-table row (the table carries no
    url column; both engines derive the identical string)."""
    return F.concat(
        F.lit("https://"), source, F.lit("/doc/"), doc_id.cast("string")
    )


def build_wet_shards(
    docs: DataFrame,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """One WET-style payload string per shard (``shard_id, payload``);
    shard = doc_id % n_shards, records concatenated in doc_id order.
    Record strings are built with ``transform`` then ONE ``array_join``
    — no quadratic string fold."""
    agg = docs.groupBy(
        (F.col(id_col) % F.lit(n_shards)).alias("shard_id")
    ).agg(
        F.sort_array(
            F.collect_list(F.struct(id_col, source_col, text_col))
        ).alias("recs")
    )
    return agg.select(
        "shard_id",
        F.array_join(
            F.transform(F.col("recs"), lambda r: _record_expr(r)),
            "",
        ).alias("payload"),
    )


def _record_expr(r) -> "F.Column":
    return F.concat(
        F.lit(_REC_HDR),
        doc_uri(r["source"], r["doc_id"]),
        F.lit("\r\nContent-Length: "),
        F.octet_length(r["text"]).cast("string"),
        F.lit("\r\n\r\n"),
        r["text"],
        F.lit("\r\n\r\n"),
    )


def parse_wet(shards: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Parse WET payloads into ``(uri, text)`` rows — Content-Length byte
    slicing, NOT delimiter splitting."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            uris: list[str] = []
            texts: list[str] = []
            for p in pdf[payload_col]:
                if p is None:
                    continue
                b = p.encode("utf-8")
                i = 0
                while True:
                    j = b.find(b"\r\n\r\n", i)
                    if j < 0:
                        break
                    uri = None
                    clen = None
                    for line in b[i:j].decode("utf-8").split("\r\n"):
                        if line.startswith("WARC-Target-URI: "):
                            uri = line[len("WARC-Target-URI: "):]
                        elif line.startswith("Content-Length: "):
                            clen = int(line[len("Content-Length: "):])
                    if uri is None or clen is None:
                        raise ValueError("malformed WET record header")
                    start = j + 4
                    uris.append(uri)
                    texts.append(b[start:start + clen].decode("utf-8"))
                    i = start + clen + 4  # skip the trailing CRLFCRLF
            yield pd.DataFrame({"uri": uris, "text": texts})

    return shards.mapInPandas(gen, "uri string, text string")
