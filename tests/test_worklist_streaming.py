"""Worklist sources (A2-A4), Tileset facade, incremental/streaming regen."""

import time

import pyspark.sql.functions as F
import pytest

from tilekiln_spark.config.errors import ZoomNotDefined
from tilekiln_spark.config.model import Config
from tilekiln_spark.operators.tiling import pages_geo
from tilekiln_spark.sources.pages import layer_polygons, pages
from tilekiln_spark.sources.worklist import (
    tile_layers_from_lines,
    tilerange_df,
    tiles_from_lines,
)
from tilekiln_spark.storage.tileset import Tileset
from tilekiln_spark.storage.tilestore import TileStore
from tilekiln_spark.streaming.incremental import regenerate, stream_expiries

CFG_YAML = """
metadata: {id: v1}
vector_layers:
  water:
    fields: {water: Type of water}
    sql:
    - {minzoom: 0, maxzoom: 8, extent: 2048, file: water.b}
"""
TEMPLATES = {"water.b": "water"}


def test_tiles_from_lines(spark):
    lines = spark.createDataFrame(
        [("0/0/0",), ("1/0/0",), ("0/0/0",), ("",), ("  ",)], "value string"
    )
    got = {(r.zoom, r.x, r.y) for r in tiles_from_lines(lines).collect()}
    assert got == {(0, 0, 0), (1, 0, 0)}


def test_tile_layers_from_lines(spark):
    lines = spark.createDataFrame(
        [("0/0/0,lyr1",), ("1/0/0,lyr2",), ("0/0/0,lyr2",), ("0/0/0,lyr1",)],
        "value string",
    )
    got = {(r.zoom, r.x, r.y): list(r.layers) for r in tile_layers_from_lines(lines).collect()}
    assert got == {(0, 0, 0): ["lyr1", "lyr2"], (1, 0, 0): ["lyr2"]}


def test_tilerange_df(spark):
    df = tilerange_df(spark, 0, 2)
    rows = df.orderBy("tileid").collect()
    assert len(rows) == 21  # 1 + 4 + 16
    assert (rows[0].zoom, rows[0].x, rows[0].y) == (0, 0, 0)
    # golden Hilbert order at z1 (reference tests/test_tilerange.py:19-24)
    z1 = [(r.x, r.y) for r in rows[1:5]]
    assert z1 == [(0, 0), (0, 1), (1, 1), (1, 0)]
    # laziness: the z0-14 range plans without materializing (Range scan);
    # its row count comes from the id interval, matching the kernel
    from tilekiln_spark.tiles.core import Tilerange

    big = tilerange_df(spark, 0, 14)
    assert len(Tilerange(0, 14)) == 357913941
    assert "Range (0, 357913941" in big._jdf.queryExecution().executedPlan().toString()


@pytest.fixture
def cfg():
    return Config(CFG_YAML, TEMPLATES)


@pytest.fixture
def sources(spark):
    return {
        "pages_geo": pages_geo(pages(spark, 400)).cache(),
        "layer_polygons": layer_polygons(spark, 20).cache(),
    }


def test_tileset_facade(spark, tmp_path, cfg):
    ts = Tileset.from_config(spark, str(tmp_path), cfg, url="http://x")
    assert ts.id == "v1" and ts.layers == ["water"]
    with pytest.raises(ZoomNotDefined):
        ts.get_tile(9, 0, 0)
    loaded = Tileset.from_id(spark, str(tmp_path), "v1")
    assert loaded.minzoom == 0 and loaded.maxzoom == 8
    assert loaded.tilejson == ts.tilejson


def test_regenerate_worklist_only(spark, tmp_path, cfg, sources):
    ts = Tileset.from_config(spark, str(tmp_path), cfg)
    wl = spark.createDataFrame([(6, 44, 49), (6, 0, 0)], "zoom int, x int, y int")
    snap = regenerate(cfg, sources, ts.store, wl)
    assert snap == 1
    stored = ts.store.read()
    got = {(r.zoom, r.x, r.y) for r in stored.select("zoom", "x", "y").collect()}
    assert got == {(6, 44, 49), (6, 0, 0)}  # only expired tiles touched
    # an expired tile with no features still got a (header-only) blob
    for r in stored.collect():
        assert r.water_data is not None


def test_regenerate_preserves_unchanged_timestamp(spark, tmp_path, cfg, sources):
    ts = Tileset.from_config(spark, str(tmp_path), cfg)
    wl = spark.createDataFrame([(4, 11, 12)], "zoom int, x int, y int")
    regenerate(cfg, sources, ts.store, wl)
    gen1, d1 = ts.get_tile(4, 11, 12)
    time.sleep(1.1)
    regenerate(cfg, sources, ts.store, wl)  # same input -> same bytes
    gen2, d2 = ts.get_tile(4, 11, 12)
    assert d1 == d2
    assert gen1 == gen2  # timestamp preserved (storage.py:379-384 semantics)


def test_stream_expiries_available_now(spark, tmp_path, cfg, sources):
    ts = Tileset.from_config(spark, str(tmp_path / "store"), cfg)
    expiry_dir = tmp_path / "expiries"
    expiry_dir.mkdir()
    (expiry_dir / "batch1.txt").write_text("6/44/49\n6/0/0\n")
    q = stream_expiries(
        spark, cfg, sources, ts.store,
        str(expiry_dir), str(tmp_path / "ckpt"), available_now=True,
    )
    q.awaitTermination(120)
    stored = {(r.zoom, r.x, r.y) for r in ts.store.read().select("zoom", "x", "y").collect()}
    assert stored == {(6, 44, 49), (6, 0, 0)}
    # second run with a new expiry file only processes the new file
    (expiry_dir / "batch2.txt").write_text("5/20/20\n")
    q2 = stream_expiries(
        spark, cfg, sources, ts.store,
        str(expiry_dir), str(tmp_path / "ckpt"), available_now=True,
    )
    q2.awaitTermination(120)
    stored2 = {(r.zoom, r.x, r.y) for r in ts.store.read().select("zoom", "x", "y").collect()}
    assert stored2 == {(6, 44, 49), (6, 0, 0), (5, 20, 20)}


def test_stateful_expiry_counts_resume(spark, tmp_path):
    """applyInPandasWithState: running per-tile totals survive a query
    restart via checkpointed GroupState (SURVEY C-streaming, stateful)."""
    from tilekiln_spark.streaming.stateful import latest_expiry_counts, run_expiry_counts

    exp = tmp_path / "expiries"
    exp.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "counts")
    (exp / "b1.txt").write_text("3/1/2\n3/1/2\n4/5/5\n")
    q = run_expiry_counts(spark, str(exp), ckpt, out)
    q.awaitTermination()
    got = {
        (r.zoom, r.x, r.y): r.n_expiries
        for r in latest_expiry_counts(spark, out).collect()
    }
    assert got == {(3, 1, 2): 2, (4, 5, 5): 1}
    # second batch of expiries; new query, SAME checkpoint -> state resumes
    (exp / "b2.txt").write_text("3/1/2\n4/0/0\n")
    q2 = run_expiry_counts(spark, str(exp), ckpt, out)
    q2.awaitTermination()
    got2 = {
        (r.zoom, r.x, r.y): r.n_expiries
        for r in latest_expiry_counts(spark, out).collect()
    }
    assert got2[(3, 1, 2)] == 3  # 2 from before + 1 new, via checkpointed state
    assert got2[(4, 0, 0)] == 1
    assert got2[(4, 5, 5)] == 1  # untouched tile keeps its total


def test_stream_expiries_sees_fresh_source_data(spark, tmp_path, cfg):
    """Regression (ADVICE r2): render_zooms caches its localCheckpoint'ed
    shared join back into the sources dict it is handed; an expiry stream
    exists precisely because sources CHANGED, so each micro-batch must
    regenerate from a fresh read of the underlying data, never a prior
    batch's frozen checkpoint."""
    import pandas as pd

    pages_path = str(tmp_path / "pages.parquet")
    polys = layer_polygons(spark, 20).cache()

    def write_pages(n):
        # the "update" changes the PAGE SET (n differs), so the expired
        # tile's feature points — and with them the blob bytes — change
        from tilekiln_spark.sources.pages import pages as mkpages

        mkpages(spark, n).write.mode("overwrite").parquet(pages_path)

    write_pages(400)
    sources = {
        # FACTORY, resolved per micro-batch: a plain DataFrame pins its
        # file listing at creation, so mutating sources ride as callables
        "pages_geo": lambda s: pages_geo(s.read.format("parquet").load(pages_path)),
        "layer_polygons": polys,
    }
    ts = Tileset.from_config(spark, str(tmp_path / "store"), cfg)
    expiry_dir = tmp_path / "expiries"
    expiry_dir.mkdir()
    (expiry_dir / "b1.txt").write_text("0/0/0\n")
    q = stream_expiries(
        spark, cfg, sources, ts.store,
        str(expiry_dir), str(tmp_path / "ckpt"), available_now=True,
    )
    q.awaitTermination(120)
    _, d1 = ts.get_tile(0, 0, 0)

    # the source table changes, then the SAME tile expires again
    write_pages(900)
    (expiry_dir / "b2.txt").write_text("0/0/0\n")
    q2 = stream_expiries(
        spark, cfg, sources, ts.store,
        str(expiry_dir), str(tmp_path / "ckpt"), available_now=True,
    )
    q2.awaitTermination(120)
    _, d2 = ts.get_tile(0, 0, 0)
    # the re-render must reflect the fresh source rows (different property
    # values -> different blob bytes), not the first batch's checkpoint
    assert d1 and d2
    assert bytes(d1["water"]) != bytes(d2["water"])


def test_stream_dedup_across_batches_and_restart(spark, tmp_path):
    """stream_dedup emits each content hash once — within a batch, across
    micro-batches, and across a checkpoint restart."""
    import json

    from tilekiln_spark.streaming.incremental import stream_dedup

    src = tmp_path / "docs"
    src.mkdir()
    out = tmp_path / "out"
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string, ingest_ts timestamp"

    def write_batch(name, rows):
        with open(src / name, "w") as f:
            for doc_id, text, ts in rows:
                f.write(json.dumps(
                    {"doc_id": doc_id, "text": text, "ingest_ts": ts}) + "\n")

    def run():
        stream = spark.readStream.schema(schema).json(str(src))
        q = (
            stream_dedup(stream, "text", "ingest_ts", watermark="1 hour")
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write_batch("b1.jsonl", [
        (1, "alpha text", "2026-01-01T10:00:00"),
        (2, "beta text", "2026-01-01T10:00:01"),
        (3, "alpha text", "2026-01-01T10:00:02"),  # in-batch dup of 1
    ])
    run()
    ids = {r.doc_id for r in spark.read.schema(schema).parquet(str(out)).collect()}
    assert len(ids & {1, 3}) == 1  # exactly one copy of the dup content
    assert 2 in ids

    # restart with a new file: cross-batch dup suppressed by checkpointed state
    write_batch("b2.jsonl", [
        (4, "beta text", "2026-01-01T10:10:00"),   # dup of 2, inside watermark
        (5, "gamma text", "2026-01-01T10:10:01"),
    ])
    run()
    ids2 = {r.doc_id for r in spark.read.schema(schema).parquet(str(out)).collect()}
    assert 5 in ids2 and 4 not in ids2
    assert len(ids2) == 3  # one per distinct content


def test_stream_corpus_ingest_gates_then_dedups(spark, tmp_path):
    """stream_corpus_ingest drops gated docs statelessly and dedups the
    survivors; rejected docs never enter the dedup state."""
    import json

    from tilekiln_spark.streaming.incremental import stream_corpus_ingest

    src = tmp_path / "docs"
    src.mkdir()
    out = tmp_path / "out"
    schema = "doc_id long, text string, ingest_ts timestamp"
    prose = "the cat and dog walked to the market for a fresh fish that day"
    with open(src / "b1.jsonl", "w") as f:
        for doc_id, text, ts in [
            (1, prose, "2026-01-01T10:00:00"),
            (2, "tiny doc", "2026-01-01T10:00:01"),      # gated: too_few_words
            (3, prose, "2026-01-01T10:00:02"),            # dup of 1
        ]:
            f.write(json.dumps(
                {"doc_id": doc_id, "text": text, "ingest_ts": ts}) + "\n")
    stream = spark.readStream.schema(schema).json(str(src))
    q = (
        stream_corpus_ingest(stream, quality={"min_words": 5})
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    ids = {r.doc_id for r in spark.read.schema(schema).parquet(str(out)).collect()}
    assert 2 not in ids            # gate fired
    assert len(ids & {1, 3}) == 1  # dedup kept one copy of the prose


def test_stream_ingest_against_index(spark, tmp_path):
    """stream_ingest_against admits only docs not already in the static
    index, per micro-batch, across a checkpointed availableNow restart."""
    import json

    from tilekiln_spark.streaming.incremental import stream_ingest_against

    idx_rows = [(i, f"indexed doc {i} stable tokens a{i} b{i} c{i} d{i}")
                for i in range(12)]
    index = spark.createDataFrame(idx_rows, "doc_id long, text string")

    src = tmp_path / "docs"
    src.mkdir()
    out = tmp_path / "admitted"
    out.mkdir()
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string"

    def write_batch(name, rows):
        with open(src / name, "w") as f:
            for doc_id, text in rows:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")

    def sink(df, batch_id):
        if df.count():
            df.write.mode("append").parquet(str(out / "data"))

    def run():
        stream = spark.readStream.schema(schema).json(str(src))
        q = (
            stream_ingest_against(stream, index, sink, checkpoint=ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    write_batch("b1.jsonl", [
        (100, idx_rows[0][1]),                       # already indexed -> dropped
        (101, "fresh novel doc qq ww ee rr tt yy"),   # admitted
    ])
    run()
    got = {r.doc_id for r in spark.read.parquet(str(out / "data")).collect()}
    assert got == {101}

    write_batch("b2.jsonl", [
        (102, idx_rows[5][1]),                       # indexed -> dropped
        (103, "another novel doc uu ii oo pp aa ss"),  # admitted
    ])
    run()
    got2 = {r.doc_id for r in spark.read.parquet(str(out / "data")).collect()}
    assert got2 == {101, 103}


def test_stream_hexbin_windows_and_late_drop(spark, tmp_path):
    """stream_hexbin: append-mode windowed hex counts equal the batch
    hexbin over the on-time events; a late event behind the watermark is
    dropped; windows finalize only once the watermark passes them."""
    import json

    from tilekiln_spark.functions.geometry import hexbin_qr
    from tilekiln_spark.streaming.geo import stream_hexbin

    src = tmp_path / "events"
    src.mkdir()
    out = tmp_path / "hexout"
    ckpt = str(tmp_path / "hexckpt")
    schema = "event_id long, ts timestamp, mx double, my double"

    def write_batch(name, rows):
        with open(src / name, "w") as f:
            for eid, ts, mx, my in rows:
                f.write(json.dumps(
                    {"event_id": eid, "ts": ts, "mx": mx, "my": my}) + "\n")

    def run():
        stream = spark.readStream.schema(schema).json(str(src))
        q = (
            stream_hexbin(stream, 10.0, window_dur="1 hour",
                          watermark="30 minutes")
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    # hour-1 events in two hex cells
    b1 = [
        (1, "2026-01-01T10:05:00", 1.0, 1.0),
        (2, "2026-01-01T10:15:00", 1.5, 1.2),
        (3, "2026-01-01T10:25:00", 40.0, 40.0),
    ]
    write_batch("b1.jsonl", b1)
    run()
    # watermark hasn't passed the 10:00 window end yet -> nothing finalized
    got = spark.read.schema(
        "win_start timestamp, q long, r long, n_events long"
    ).parquet(str(out))
    assert got.count() == 0

    # batch 2 advances event time far past 11:00 + watermark: the hour-1
    # window finalizes and emits exactly the on-time counts
    write_batch("b2.jsonl", [(4, "2026-01-01T13:00:00", 1.0, 1.0)])
    run()

    def finalized():
        rows = spark.read.schema(
            "win_start timestamp, q long, r long, n_events long"
        ).parquet(str(out)).collect()
        return {(str(r.win_start), r.q, r.r): r.n_events for r in rows}

    bdf = spark.createDataFrame(
        [(e, t, x, y) for e, t, x, y in b1],
        "event_id long, ts string, mx double, my double",
    )
    qc, rc = hexbin_qr(F.col("mx"), F.col("my"), 10.0)
    want = {
        ("2026-01-01 10:00:00", r.q, r.r): r.n
        for r in bdf.select(qc.alias("q"), rc.alias("r"))
        .groupBy("q", "r").agg(F.count("*").alias("n")).collect()
    }
    assert finalized() == want and sum(want.values()) == 3

    # batch 3: an hour-1 event arriving BEHIND the watermark (now ~12:30)
    # is dropped — the finalized window is never re-emitted or changed
    write_batch("b3.jsonl", [
        (5, "2026-01-01T10:06:00", 1.0, 1.0),   # late -> dropped
        (6, "2026-01-01T13:05:00", 40.0, 40.0),  # on-time, window still open
    ])
    run()
    assert finalized() == want


def test_stream_geofence_transitions_and_resume(spark, tmp_path):
    """stream_geofence: enter/exit emitted exactly on flips (per-batch
    (ts, event_id) replay order), concave fence containment via the
    shared raycast, and checkpoint resume — a user already inside does
    NOT re-enter after restart; the next outside event exits once."""
    import json

    from tilekiln_spark.streaming.geo import stream_geofence

    src = tmp_path / "gf_events"
    src.mkdir()
    out = tmp_path / "gf_out"
    ckpt = str(tmp_path / "gf_ckpt")
    schema = "event_id long, user_id long, ts timestamp, mx double, my double"

    # fence 0: unit-ish square; fence 1: concave L whose notch is OUTSIDE
    fences = spark.createDataFrame(
        [
            (0, [0.0, 4.0, 4.0, 0.0], [0.0, 0.0, 4.0, 4.0]),
            (1, [10.0, 14.0, 14.0, 12.0, 12.0, 10.0],
                [0.0, 0.0, 2.0, 2.0, 4.0, 4.0]),
        ],
        "fence_id long, ring_xs array<double>, ring_ys array<double>",
    )

    def write_batch(name, rows):
        with open(src / name, "w") as f:
            for eid, uid, ts, mx, my in rows:
                f.write(json.dumps(
                    {"event_id": eid, "user_id": uid, "ts": ts,
                     "mx": mx, "my": my}) + "\n")

    def run():
        stream = spark.readStream.schema(schema).json(str(src))
        q = (
            stream_geofence(stream, fences)
            .writeStream.outputMode("update")
            .foreachBatch(
                lambda df, _bid: df.write.mode("append").parquet(str(out))
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    def got():
        rows = spark.read.schema(
            "user_id long, fence_id long, ts timestamp, transition string"
        ).parquet(str(out)).collect()
        return sorted(
            (r.user_id, r.fence_id, str(r.ts), r.transition) for r in rows
        )

    # batch 1: user 1 walks outside -> in -> (stays in); user 2 sits in the
    # L's concave NOTCH (13, 3) = outside, then its solid arm (11, 3) = in
    write_batch("b1.jsonl", [
        (1, 1, "2026-01-01T00:00:00", -1.0, -1.0),
        (2, 1, "2026-01-01T00:10:00", 2.0, 2.0),
        (3, 1, "2026-01-01T00:20:00", 3.0, 1.0),
        (4, 2, "2026-01-01T00:05:00", 13.0, 3.0),
        (5, 2, "2026-01-01T00:15:00", 11.0, 3.0),
    ])
    run()
    assert got() == [
        (1, 0, "2026-01-01 00:10:00", "enter"),
        (2, 1, "2026-01-01 00:15:00", "enter"),
    ]

    # batch 2 AFTER RESTART: user 1 exits fence 0 (exactly once — the
    # inside flag came from the checkpoint); user 2 moves to the notch
    # (outside) -> exit; user 1 also dips into fence 1's arm -> enter
    write_batch("b2.jsonl", [
        (6, 1, "2026-01-01T01:00:00", 9.0, 9.0),
        (7, 1, "2026-01-01T01:10:00", 11.0, 1.0),
        (8, 2, "2026-01-01T01:05:00", 13.0, 3.0),
    ])
    run()
    assert got() == [
        (1, 0, "2026-01-01 00:10:00", "enter"),
        (1, 0, "2026-01-01 01:00:00", "exit"),
        (1, 1, "2026-01-01 01:10:00", "enter"),
        (2, 1, "2026-01-01 00:15:00", "enter"),
        (2, 1, "2026-01-01 01:05:00", "exit"),
    ]


def test_cusum_stream_parity_and_resume(spark, tmp_path):
    """Streaming CUSUM: gap buckets drain state (not output), alarms
    fire at the same (bucket, s) the batch operator computes on the
    observed buckets, and a restarted query resumes S from the
    checkpointed GroupState."""
    import json

    from pyspark.sql import functions as F

    from tilekiln_spark.operators.events import cusum_alarms
    from tilekiln_spark.streaming.stateful import cusum_stream

    src = tmp_path / "events"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    schema = "event_type string, ts double"

    def run():
        stream = spark.readStream.schema(schema).json(str(src))
        q = (
            cusum_stream(stream, k=3, h=8)
            .writeStream.foreachBatch(
                lambda df, _id: df.write.mode("append").parquet(out)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    rows1 = [("a", 7.0)] * 5 + [("a", 2 * 3600 + 7.0)] * 12
    (src / "b1.json").write_text(
        "\n".join(json.dumps({"event_type": k, "ts": t}) for k, t in rows1)
    )
    run()
    got = {
        r.bucket: (r.cnt, r.s, r.alarm)
        for r in spark.read.parquet(out).collect()
    }
    # hour 1 is a GAP: state drains (2 - 3 -> 0) but no row is emitted
    assert got == {0: (5, 2, False), 2: (12, 9, True)}

    # resume: one more hour of light traffic decays S from the checkpoint
    (src / "b2.json").write_text(json.dumps({"event_type": "a", "ts": 3 * 3600 + 7.0}))
    run()
    got2 = {
        r.bucket: (r.cnt, r.s, r.alarm)
        for r in spark.read.parquet(out).collect()
    }
    assert got2[3] == (1, 7, False)

    # batch parity on the observed buckets
    batch = spark.createDataFrame(
        rows1 + [("a", 3 * 3600 + 7.0)], schema
    ).select("event_type", F.col("ts").cast("timestamp").alias("ts"))
    exp = {
        r.bucket: (r.cnt, r.s, r.alarm)
        for r in cusum_alarms(batch, k=3, h=8).collect()
        if r.bucket in got2
    }
    assert exp == got2
