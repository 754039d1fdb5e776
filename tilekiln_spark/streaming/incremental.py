"""Incremental tile regeneration — the reference's "minutely updates" shape.

The reference achieves updates by re-running generate over an expiry list
piped to stdin (reference README.md:9, scripts/generate.py:63): an
incremental-batch pattern, not true streaming.  This module keeps that shape
and makes it runnable both ways:

- ``regenerate(worklist)``   — one incremental batch: render ONLY the expired
  tiles (worklist semi-join pushes the tile filter into the per-layer plans)
  and MERGE the result into the TileStore (timestamp-preservation semantics:
  unchanged tiles keep their `generated`).
- ``stream_expiries(dir)``   — Structured Streaming over a directory of
  expiry-list files ('z/x/y' lines); each micro-batch calls ``regenerate``
  via foreachBatch.  Run with trigger=availableNow for the reference's
  batch-catchup behavior, or continuously for minutely pipelines.

Resumability: each regenerate commit is a TileStore snapshot with lineage
rows; the streaming query adds its own checkpointLocation, so a restart
replays only unprocessed expiry files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tilekiln_spark.config.model import Config
from tilekiln_spark.operators.tiling import render_zooms
from tilekiln_spark.sources.worklist import tiles_from_lines
from tilekiln_spark.storage.tilestore import TileStore


def blank_fill(
    config: Config, tiles: DataFrame, worklist: DataFrame, zooms: list[int]
) -> DataFrame:
    """Outer-join rendered tiles onto the worklist and fill layers that
    rendered zero features with header-only MVT blobs (ST_AsMVT's >=1-row
    contract, reference kiln.py:40-43): a worklist tile whose layer now
    renders empty must still overwrite the stale old blob."""
    from pyspark.sql import functions as F

    from tilekiln_spark.operators.mvt import empty_layer

    wl = worklist.select("zoom", "x", "y")
    merged = wl.join(tiles, ["zoom", "x", "y"], "left_outer")
    fills = []
    layer_names = {c[: -len("_data")] for c in tiles.columns if c.endswith("_data")}
    for name in sorted(layer_names):
        blanks = {
            z: empty_layer(name, d.extent)
            for z in sorted(zooms)
            if (d := config.layers[name].definition_for(z)) is not None
        }
        blank_map = F.create_map(
            *[x for z, b in blanks.items() for x in (F.lit(z), F.lit(b))]
        )
        defined = F.element_at(blank_map, F.col("zoom")).isNotNull()
        fills.append(
            F.when(defined, F.coalesce(F.col(f"{name}_generated"), F.current_timestamp()))
            .alias(f"{name}_generated")
        )
        fills.append(
            F.coalesce(F.col(f"{name}_data"), F.element_at(blank_map, F.col("zoom")))
            .alias(f"{name}_data")
        )
        if f"{name}_nfeat" in tiles.columns:
            fills.append(
                F.when(defined, F.coalesce(F.col(f"{name}_nfeat"), F.lit(0)))
                .alias(f"{name}_nfeat")
            )
    return merged.select("zoom", "x", "y", *fills)


def regenerate(
    config: Config,
    sources: dict,
    store: TileStore,
    worklist: DataFrame,
) -> int | None:
    """Render the worklist's tiles and upsert. Returns the new snapshot id,
    or None when the worklist was empty (no commit, like the reference's
    zero-tile short-circuit)."""
    zooms = [r.zoom for r in worklist.select("zoom").distinct().collect()]
    if not zooms:
        return None
    tiles = render_zooms(config, sorted(zooms), sources, worklist=worklist)
    if tiles is None:
        return None
    # worklist tiles with no features still need a row (the expiry says the
    # old content is stale)
    return store.save_tiles(blank_fill(config, tiles, worklist, sorted(zooms)))


def stream_expiries(
    spark: SparkSession,
    config: Config,
    sources: dict,
    store: TileStore,
    expiry_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """readStream(text expiry lists) -> foreachBatch(regenerate).

    Returns the started StreamingQuery; caller awaits termination."""
    lines = spark.readStream.format("text").load(expiry_dir)

    def process(batch_df: DataFrame, batch_id: int):
        wl = tiles_from_lines(batch_df)
        # Per-batch COPY with the '_'-prefixed cache keys stripped:
        # render_zooms caches its localCheckpoint'ed shared join back into
        # the dict it is handed, and an expiry stream exists precisely
        # because the underlying sources changed — reusing the first batch's
        # frozen checkpoint would re-render expired tiles from stale data.
        # The dropped checkpoints' blocks are reclaimed by Spark's
        # ContextCleaner once the previous batch's frames are unreachable.
        #
        # Callable source values are FACTORIES resolved fresh per batch:
        # a plain file-source DataFrame pins its file listing at creation,
        # so a mutating table must be passed as `lambda spark: spark.read...`
        # (an Iceberg/catalog table read resolves a new snapshot the same
        # way).  Non-callable values pass through for immutable sources.
        batch_sources = {
            k: (v(spark) if callable(v) else v)
            for k, v in sources.items()
            if not (isinstance(k, str) and k.startswith("_"))
        }
        regenerate(config, batch_sources, store, wl)

    writer = lines.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_dedup(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ingest_ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """First-seen-only streaming exact dedup on the content hash.

    Incremental corpus ingestion (the streaming face of exact_dedup): each
    micro-batch emits only documents whose md5(text) has not been seen
    before, across batches and restarts — the dedup state lives in the
    checkpoint.  ``dropDuplicatesWithinWatermark`` bounds that state: a
    hash is remembered until the watermark passes its event time + the
    delay, so state grows with the distinct-hash arrival rate inside the
    watermark horizon, not with the full corpus history (the scale-honest
    choice; an unbounded ``dropDuplicates`` would OOM a year-long ingest).
    Late duplicates beyond the horizon are a documented recall trade-off —
    the batch `dedup_clusters` pass downstream catches them.

    State is partitioned by the 16-byte hash — uniform key space, no skew."""
    h = F.md5(F.encode(F.col(text_col), "utf-8"))
    return (
        docs.withColumn("__h", h)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__h"])
        .drop("__h")
    )


def stream_corpus_ingest(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ingest_ts",
    watermark: str = "10 minutes",
    quality: dict | None = None,
) -> DataFrame:
    """Streaming corpus admission: Gopher quality gates -> first-seen exact
    dedup, the incremental face of training_corpus_pipeline's first stages.

    The gates are stateless codegen expressions (same operator the batch
    pipeline uses — operators/quality.doc_quality_flags), so they add ZERO
    streaming state; gating BEFORE the dedup keeps rejected documents out
    of the watermark-bounded hash state entirely, the same
    shrink-before-the-stateful-op ordering the batch pipeline uses.
    Near-dup clustering and decontamination stay batch passes downstream
    (they need corpus-wide joins); this stream feeds their input
    incrementally.
    """
    out = docs
    if quality is not None:
        from tilekiln_spark.operators.quality import doc_quality_flags

        out = (
            doc_quality_flags(out, text_col=text_col, **quality)
            .filter("keep")
            .drop("keep", "drop_reason")
        )
    return stream_dedup(out, text_col, ts_col, watermark)


def stream_ingest_against(
    docs: DataFrame,
    index_docs: DataFrame,
    sink,
    text_col: str = "text",
    key_col: str = "doc_id",
    threshold: float = 0.8,
    quality: dict | None = None,
    checkpoint: str | None = None,
    num_perm: int = 32,
    bands: int = 8,
    k: int = 3,
):
    """Streaming incremental ingestion against an EXISTING corpus index:
    per micro-batch, (optional) Gopher gates -> dedup_against(batch, index)
    -> only the admitted (not-already-indexed) docs reach ``sink(df,
    batch_id)``.  Returns the DataStreamWriter; start with
    ``.trigger(availableNow=True).start()`` for catch-up runs.

    Spark shape: dedup_against needs per-batch joins/aggregations that
    append-mode streaming cannot express declaratively, so the batch
    operator runs inside foreachBatch (the house pattern —
    stream_expiries does the same for tile regeneration).  The INDEX
    side's corpus-sized banding pass runs ONCE here and persists; every
    micro-batch pays only its own (tiny) banding plus the bucket join
    against the cached band table.  That cache is deliberately tied to
    the SparkSession, not the stream (a restarted query reuses it):
    REUSE one writer across drains rather than re-calling this per drain,
    and `spark.catalog.clearCache()` (or restarting the session) releases
    it when the ingest loop is done.  New-vs-new dups across batches are
    NOT suppressed (dedup_against's contract — increments stay
    order-independent); compose upstream with stream_dedup for
    first-seen exact suppression.
    """
    from tilekiln_spark.operators.dedup import _banded_minhash, dedup_against

    index_banded = _banded_minhash(
        index_docs, text_col, key_col, num_perm, bands, k, 42, 100_000
    ).persist()

    def process(batch_df: DataFrame, batch_id: int) -> None:
        out = batch_df
        if quality is not None:
            from tilekiln_spark.operators.quality import doc_quality_flags

            out = (
                doc_quality_flags(out, text_col=text_col, **quality)
                .filter("keep")
                .drop("keep", "drop_reason")
            )
        verdicts = dedup_against(
            out, index_docs, text_col, key_col, threshold,
            num_perm, bands, k, index_banded=index_banded,
        )
        clean = verdicts.filter(F.col("is_dup") == 0).select(key_col)
        admitted = out.join(F.broadcast(clean), key_col, "left_semi")
        sink(admitted, batch_id)

    writer = docs.writeStream.foreachBatch(process)
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer
