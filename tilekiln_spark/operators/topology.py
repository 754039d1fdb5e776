"""ST_LineMerge: sew contiguous segments into maximal linestrings.

The reference's PostGIS playbook runs ``ST_LineMerge`` when assembling
renderable boundary/waterway lines from segment soup (osm2pgsql emits admin
boundaries and rivers as per-way fragments; the reference executes arbitrary
template SQL over such tables — /root/reference/tilekiln/definition.py:42-77).
Semantics (PostGIS): two segments merge through a node iff EXACTLY two line
ends meet there (node degree == 2); junctions (degree >= 3) stop the merge;
direction is ignored (the merge reorients as needed); a chain that closes on
itself through all-degree-2 nodes becomes a ring.

Distributed shape (no driver-side geometry, no per-row Python):

1. endpoint incidences — one ``explode`` per segment (map-only);
2. node degrees — ONE groupBy on the exact endpoint key (for real data,
   snap first: ``snap_grid_dissolve`` is the repo's quantizer);
   degree-2 nodes emit their single through-pair straight out of the
   aggregate (``collect_list`` of exactly 2 seg_ids — no self-join);
3. components — the proven large-star/small-star contraction
   (operators/dedup.py connected_components, O(log^2 n) rounds), so a
   10k-fragment coastline chain converges in ~log rounds, not
   diameter rounds — the scale-safe choice at web scale;
4. per-line rollup — one partial-agg groupBy over (line_id): segment
   count, length sum, and ring detection as free_ends == 0 where a free
   end is an incidence at a node whose GLOBAL degree != 2.

Everything is key-partitioned; the only iteration is the component
contraction whose per-round work is the (tiny) through-pair list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def merge_lines(segments: DataFrame) -> DataFrame:
    """ST_LineMerge over a segment table ``(seg_id, x1, y1, x2, y2)``.

    Returns one row per maximal merged line:
    ``line_id`` (MIN seg_id in the chain — deterministic canonical label),
    ``n_segs``, ``merged_len`` (sum of member segment lengths), and
    ``is_ring`` (the chain closes: every touched node has degree 2).

    Endpoints are matched EXACTLY (float64 equality) — quantize upstream
    for measured data.  Multi-vertex input lines reduce to this case by
    keying their two end vertices; interior vertices never participate.
    """
    from tilekiln_spark.operators.dedup import connected_components

    seg = segments.select(
        "seg_id",
        "x1", "y1", "x2", "y2",
        F.sqrt(
            (F.col("x2") - F.col("x1")) * (F.col("x2") - F.col("x1"))
            + (F.col("y2") - F.col("y1")) * (F.col("y2") - F.col("y1"))
        ).alias("seg_len"),
    )

    ends = seg.select(
        "seg_id",
        F.explode(
            F.array(
                F.struct(F.col("x1").alias("nx"), F.col("y1").alias("ny")),
                F.struct(F.col("x2").alias("nx"), F.col("y2").alias("ny")),
            )
        ).alias("node"),
    ).select("seg_id", F.col("node.nx").alias("nx"), F.col("node.ny").alias("ny"))

    # node degree AND the degree-2 through-pair from ONE aggregate
    nodes = ends.groupBy("nx", "ny").agg(
        F.count("*").alias("degree"),
        F.sort_array(F.collect_list("seg_id")).alias("segs"),
    )
    pairs = (
        nodes.filter(
            (F.col("degree") == 2) & (F.col("segs")[0] != F.col("segs")[1])
        )
        .select(
            F.col("segs")[0].alias("key_a"), F.col("segs")[1].alias("key_b")
        )
    )

    labels = connected_components(pairs)  # (node, component) over seg ids
    lbl = seg.join(
        labels.withColumnRenamed("node", "seg_id"), "seg_id", "left"
    ).withColumn("line_id", F.coalesce("component", "seg_id"))

    free = (
        ends.join(nodes.select("nx", "ny", "degree"), ["nx", "ny"])
        .filter(F.col("degree") != 2)
        .groupBy("seg_id")
        .agg(F.count("*").alias("free_ends"))
    )

    return (
        lbl.join(free, "seg_id", "left")
        .groupBy("line_id")
        .agg(
            F.count("*").alias("n_segs"),
            F.sum("seg_len").alias("merged_len"),
            # a straight single segment can only "close" by being
            # zero-length — never a ring
            (
                (F.sum(F.coalesce("free_ends", F.lit(0))) == 0)
                & (F.count("*") > 1)
            ).alias("is_ring"),
        )
    )
