"""Deterministic sampling / data-mixing operators for training pipelines.

Corpus mixing ("30% of source A, 5 docs per minority language, 10% global
holdout") must be REPRODUCIBLE — rerunning the pipeline on the same corpus
has to pick the same rows regardless of partitioning, cluster size, or
engine, or downstream training sets silently drift.  Spark's native
``df.sample``/``sampleBy`` draw from a partition-seeded RNG, so results
change with the partition layout; these operators instead derive every
decision from ``md5(seed : key)``:

- the hash is a pure projection — the fraction samplers are MAP-ONLY
  (no shuffle, no RNG state, trivially pushed past scans);
- md5 is identical in every engine, so a DuckDB/Postgres twin of the
  pipeline selects the byte-identical row set (the driver oracle checks
  exactly that);
- comparisons happen on the lowercase HEX STRING: for fixed-width strings
  lexicographic order == numeric order, so no engine-specific
  hex-to-integer conversion is ever needed.

Scale notes: ``sample_fraction``/``sample_by`` are narrow (filter only).
``stratified_quota_sample`` ranks within strata — expressed as a literal
``row_number() <= n`` filter so Catalyst's WindowGroupLimit prunes each map
partition to its local top-n BEFORE the stratum shuffle: a whale stratum
ships n rows per input partition, not its full membership.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 64-bit decision space: 16 hex chars of the md5.
_WIDTH = 16


def sample_hash(key: Column, seed: int = 42) -> Column:
    """Deterministic per-row draw: first 16 hex chars of md5("s<seed>:<key>").

    Lowercase hex; fixed width, so string order is uniform-draw order.
    NULL keys all share one draw (concat_ws skips nulls): they are kept or
    dropped TOGETHER per (seed, fraction) — key your rows before sampling
    if null-key rows should draw independently."""
    return F.substring(
        F.md5(F.concat_ws(":", F.lit(f"s{seed}"), key.cast("string"))), 1, _WIDTH
    )


def md5_u32(key: Column) -> Column:
    """First 8 md5 hex chars of ``key`` as a uint32-valued long — THE
    engine-portable integer draw (DuckDB twin:
    ``CAST('0x' || substr(md5(k), 1, 8) AS BIGINT)``).  Callers compose
    their own prefix/seed into ``key`` and their own transform on top
    (mod-buckets, /2^32 uniform, ...); the hex-to-int step lives here so
    the cross-engine contract has ONE implementation."""
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")


def _threshold_hex(fraction: float) -> str:
    f = min(max(float(fraction), 0.0), 1.0)
    if f >= 1.0:
        return "g"  # 'g' sorts after every lowercase hex string: keep all
    return format(int(f * (1 << 64)), "016x")


def sample_fraction(
    df: DataFrame, fraction: float, key_col: str = "doc_id", seed: int = 42
) -> DataFrame:
    """Keep ~fraction of rows, decided per-key by hash — map-only, no shuffle,
    stable under repartitioning, and reproducible across engines."""
    if fraction >= 1.0:
        return df
    return df.filter(sample_hash(F.col(key_col), seed) < F.lit(_threshold_hex(fraction)))


def sample_by(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    key_col: str = "doc_id",
    default: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum fraction mixing (deterministic sampleBy).

    ``fractions`` maps stratum value -> keep fraction; unlisted strata keep
    ``default``.  Small dicts compile to one CASE expression (map-only);
    past 64 strata the thresholds become a broadcast dim joined on the
    stratum column instead — a 10k-source mixing config would otherwise
    produce a 10k-branch CASE that bloats codegen, while the broadcast
    hash join stays narrow and shuffle-free."""
    if len(fractions) > 64:
        spark = df.sparkSession
        dim = spark.createDataFrame(
            [(val, _threshold_hex(frac)) for val, frac in sorted(fractions.items())],
            f"{strata_col} string, __thresh string",
        )
        return (
            df.join(F.broadcast(dim), strata_col, "left")
            .filter(
                sample_hash(F.col(key_col), seed)
                < F.coalesce(F.col("__thresh"), F.lit(_threshold_hex(default)))
            )
            .drop("__thresh")
        )
    thresh = F.lit(_threshold_hex(default))
    for val, frac in sorted(fractions.items()):
        thresh = F.when(F.col(strata_col) == F.lit(val), F.lit(_threshold_hex(frac))).otherwise(
            thresh
        )
    return df.filter(sample_hash(F.col(key_col), seed) < thresh)


def stratified_quota_sample(
    df: DataFrame,
    strata_col: str,
    quota: int,
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """EXACTLY min(quota, |stratum|) rows per stratum, picked by hash order
    (ties broken by key, so the choice is total and deterministic).

    The literal ``row_number() <= quota`` lets Catalyst's WindowGroupLimit
    do a per-partition partial top-n before the stratum exchange."""
    w = Window.partitionBy(strata_col).orderBy(
        sample_hash(F.col(key_col), seed).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.lit(int(quota)))
        .drop("__rn")
    )


def cluster_safe_split(
    clusters: DataFrame,
    holdout_fraction: float = 0.1,
    cluster_col: str = "cluster_id",
    seed: int = 42,
) -> DataFrame:
    """Leakage-free train/holdout split: the draw hashes the CLUSTER id,
    so every member of a near-duplicate family lands on the same side.

    Random per-row splits on web corpora put a document in train while its
    near-duplicate sits in eval — the dedup literature's "test-set
    contamination by duplication" failure.  Feeding ``dedup_clusters``
    output (or any frame carrying a cluster label) through this instead
    guarantees the split respects duplicate families.  Adds a ``split``
    column ('train' | 'holdout'); the decision is the same engine-portable
    ``md5(seed:cluster)`` hex draw the samplers use, so the expected
    holdout share is ``holdout_fraction`` OF CLUSTERS (by design — a
    100-member boilerplate family is one draw, not 100).

    Scale: map-only projection; no shuffle beyond whatever produced the
    cluster labels."""
    draw = sample_hash(F.col(cluster_col), seed)
    return clusters.withColumn(
        "split",
        F.when(
            draw < F.lit(_threshold_hex(holdout_fraction)), F.lit("holdout")
        ).otherwise(F.lit("train")),
    )


def shard_assign(
    df: DataFrame,
    n_shards: int,
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic training-output sharding: add ``shard`` (int in
    [0, n_shards)) and ``sort_key`` (the row's 16-hex md5 draw) columns.

    The assignment is the same engine-portable md5 draw the samplers use
    (first 8 hex chars parsed as an integer, mod n_shards), so shard
    membership is independent of partition layout, cluster size, and
    engine — a re-run of the pipeline lands every document in the same
    shard, and a DuckDB/Postgres twin reproduces the split exactly.
    ``sort_key`` gives the within-shard global shuffle order GPT-style
    loaders want (hash order = a deterministic permutation of the corpus).

    Scale shape: both columns are map-only expressions.  The intended
    writer is ``.repartition("shard").write.partitionBy("shard")`` —
    ONE exchange keyed by shard, each output file internally sortable by
    ``sortWithinPartitions("sort_key")`` at no extra shuffle.  Expected
    imbalance is binomial: ~sqrt(N/n_shards) docs at one-sigma, negligible
    at corpus scale.
    """
    h = sample_hash(F.col(key_col), seed)
    shard = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % F.lit(int(n_shards))
    ).cast("int")
    return df.withColumn("shard", shard).withColumn("sort_key", h)


def hilbert_balanced_shards(
    df: DataFrame,
    n_shards: int,
    zoom: int = 6,
    mx_col: str = "mx",
    my_col: str = "my",
    key_col: str = "doc_id",
) -> DataFrame:
    """LOCALITY-PRESERVING balanced output shards: each shard gets a
    contiguous range of the Hilbert space-filling curve with an equal
    row count — geographically adjacent pages land in the same shard
    (tile-local training batches, co-located region reads) while shard
    sizes stay exactly balanced, the two properties hash sharding
    (:func:`shard_assign`) cannot combine.

    shard = floor(rank * S / N) over rows ordered by (tileid, key),
    where tileid is the PMTiles Hilbert id of the row's z``zoom`` tile —
    the EXACT positional split (every shard has floor/ceil(N/S) rows, a
    determinism contract a quantile approximation cannot give).

    Scale shape: the global rank is the shared two-pass range-partition +
    broadcast-offset pattern (operators/ranking.py two_pass_global_rank):
    ONE range exchange on (tileid, key), per-partition row_number windows
    (no SinglePartition anywhere), P partition counts on the driver.

    Returns df + ``tileid`` and ``shard`` columns."""
    from tilekiln_spark.functions.tileids import tile_x, tile_y, tileid
    from tilekiln_spark.operators.ranking import two_pass_global_rank

    z = F.lit(int(zoom))
    withtid = df.withColumn(
        "tileid",
        tileid(
            z.cast("long"),
            tile_x(z, F.col(mx_col)).cast("long"),
            tile_y(z, F.col(my_col)).cast("long"),
        ),
    )
    ranked, total = two_pass_global_rank(withtid, ["tileid", key_col])
    return ranked.withColumn(
        "shard",
        F.floor(
            F.col("__rank") * int(n_shards) / F.lit(max(total, 1))
        ).cast("int"),
    ).drop("__rank")


def temperature_mix(
    df: DataFrame,
    strata_col: str = "source",
    alpha: float = 0.5,
    target_fraction: float = 0.5,
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Temperature-based source mixing (the multilingual/GPT-3 alpha-
    sampling rule): stratum s is sampled with probability proportional to
    c_s**alpha, so alpha < 1 UPsamples rare sources relative to their raw
    share while the total stays ~target_fraction of the corpus.  Per-
    stratum keep fraction:

        frac_s = min(1, round(target * p_s / c_s, 9)),
        p_s    = c_s**alpha / sum_t c_t**alpha,  target = target_fraction * N

    and membership is the same engine-portable md5 draw as sample_by.

    Determinism notes: the per-stratum counts are ONE tiny aggregate
    collected to the driver (#sources rows — bounded like the LM's pruned
    tables); alpha == 0.5 uses math.sqrt, which IEEE requires to be
    correctly rounded, so a DuckDB/Postgres twin reproduces p_s exactly
    (other alphas go through libm pow — last-ulp portability is not
    guaranteed, hence the round(9) on the fraction).  The row filter
    itself is map-only; only the count aggregate shuffles.
    """
    import math

    counts = {
        r[strata_col]: r["n"]
        for r in df.groupBy(strata_col).agg(F.count("*").alias("n")).collect()
    }
    if not counts:
        return df
    total = sum(counts.values())
    target = target_fraction * total
    w = {
        s: (math.sqrt(c) if alpha == 0.5 else float(c) ** alpha)
        for s, c in counts.items()
    }
    wsum = sum(w[s] for s in sorted(w, key=str))  # fixed summation order
    fracs = {
        s: round(min(1.0, target * (w[s] / wsum) / counts[s]), 9) for s in counts
    }
    return sample_by(df, strata_col, fracs, default=0.0, key_col=key_col, seed=seed)


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str = "doc_id",
    seed: int = 42,
    mode: str = "overwrite",
) -> DataFrame:
    """Materialize the sharded training corpus: shard_assign + the writer
    its contract describes — ONE exchange keyed by shard
    (``repartition("shard")``), rows inside each shard physically ordered
    by the md5 draw (``sortWithinPartitions("sort_key")`` — a sort within
    the already-shuffled partition, no extra exchange), written
    ``partitionBy("shard")`` so a loader reads shard k as one pruned
    directory scan in global-shuffle order.

    Returns the per-shard manifest (shard, n_docs) — the frame a loader
    checks against the directory listing.  Determinism: membership AND
    within-shard order derive only from md5(seed:key), so a re-run (any
    cluster size, any engine) reproduces byte-identical shard contents."""
    assigned = shard_assign(df, n_shards, key_col, seed)
    (
        # sort by (shard, sort_key): the partitionBy writer re-sorts any
        # task whose rows are not already ordered by the partition columns
        # — and that re-sort is by shard ALONE, which would discard the
        # sort_key order.  Leading with shard makes the incoming order a
        # refinement the writer keeps.
        assigned.repartition("shard")
        .sortWithinPartitions("shard", "sort_key")
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )
    spark = df.sparkSession
    manifest = (
        spark.read.parquet(path)
        .groupBy("shard")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("shard")
    )
    return manifest
