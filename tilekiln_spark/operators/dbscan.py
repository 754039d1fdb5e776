"""ST_ClusterDBSCAN (PostGIS window-function parity, re-expressed as a
distributed pipeline — the reference's templates may call any PostGIS
function over feature tables, reference tilekiln/definition.py:42-77).

Semantics (DBSCAN, Ester et al. 1996 / PostGIS ST_ClusterDBSCAN):

- core point: >= ``min_pts`` points (self included) within ``eps``
- clusters: connected components of the core-core eps-graph
- border point: non-core within eps of >= 1 core -> joins a neighboring
  core's cluster (PostGIS picks an arbitrary one; here it is the MIN
  neighboring component id — deterministic, partition-independent)
- noise: everything else (cluster_id NULL)

Spark-first shape, every stage distributed:

1. neighbor pairs from the standard eps-grid self-join — each point
   computes ONE cell (`floor(coord/eps)`); one side explodes its 3x3 cell
   neighborhood so every eps-pair meets in exactly one equi-join cell, the
   exact residual `dist² <= eps²` decides membership (no sqrt, identical
   float decision in the DuckDB twin).
2. degrees from one partial-agg groupBy; the eps-graph never materializes
   beyond the bounded candidate join.
3. components via the large-star/small-star contraction
   (operators/dedup.py connected_components — O(log² n) rounds, node-keyed
   shuffles only).
4. border assignment = one min-aggregate over the (non-core, core
   neighbor) pairs.

At 100 TB: the grid join is the same PBSM shape as the PIP join (cell
size tunes candidates-per-cell; AQE handles dense-cell skew), degrees and
border mins partial-aggregate map-side, and the component loop's shuffle
width is the CORE-core edge list, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _label_clusters(pts, pairs, min_pts: int, key_col: str):
    """Shared DBSCAN labeling tail (spatial and space-time variants):
    degree rollup -> core flags -> core-core connected components
    (large/small-star) -> deterministic min-id border attach.
    ``pts`` needs a ``pid`` column; ``pairs`` is the symmetric
    candidate-pair list (a_id, b_id)."""
    deg = pairs.groupBy("a_id").agg(F.count("*").alias("n_nbrs"))
    labeled = pts.join(deg, pts.pid == deg.a_id, "left").select(
        "pid", (F.coalesce(F.col("n_nbrs"), F.lit(0)) + 1 >= min_pts).alias("is_core")
    ).localCheckpoint(eager=True)
    core = labeled.where("is_core").select(F.col("pid").alias("core_id"))

    # core-core edges -> components (min-id labels); singleton cores keep
    # their own id via the coalesce below
    from tilekiln_spark.operators.dedup import connected_components

    cedges = (
        pairs.join(core, pairs.a_id == core.core_id).drop("core_id")
        .join(core, pairs.b_id == F.col("core_id")).drop("core_id")
    )
    comp = connected_components(cedges, "a_id", "b_id")

    core_lbl = (
        core.join(comp, core.core_id == comp.node, "left")
        .select(
            F.col("core_id").alias("pid"),
            F.coalesce(F.col("component"), F.col("core_id")).alias("cluster_id"),
        )
    )

    # border: non-core -> MIN neighboring core component (deterministic)
    border_lbl = (
        pairs.join(labeled.where(~F.col("is_core")).select("pid"),
                   pairs.a_id == F.col("pid"))
        .join(core_lbl.select(F.col("pid").alias("b_pid"),
                              F.col("cluster_id").alias("b_cluster")),
              F.col("b_id") == F.col("b_pid"))
        .groupBy("a_id")
        .agg(F.min("b_cluster").alias("cluster_id"))
        .select(F.col("a_id").alias("pid"), "cluster_id")
    )

    lbl = core_lbl.unionByName(border_lbl)
    return (
        labeled.join(lbl, "pid", "left")
        .select(
            F.col("pid").alias(key_col),
            "is_core",
            "cluster_id",
        )
    )


def dbscan(
    points: DataFrame,
    eps: float,
    min_pts: int,
    key_col: str = "doc_id",
    x_col: str = "mx",
    y_col: str = "my",
) -> DataFrame:
    """Label every input point: [key_col, is_core, cluster_id] —
    cluster_id is the MIN CORE key of the cluster (borders never lower the
    label — they can belong to several clusters' eps-halos, so only core
    ids are stable canonical representatives); NULL for noise."""
    e = float(eps)
    pts = points.select(
        F.col(key_col).alias("pid"),
        F.col(x_col).cast("double").alias("px"),
        F.col(y_col).cast("double").alias("py"),
        F.floor(F.col(x_col) / F.lit(e)).cast("long").alias("cx"),
        F.floor(F.col(y_col) / F.lit(e)).cast("long").alias("cy"),
    )
    offs = F.array(
        *[
            F.struct(
                (F.col("cx") + F.lit(dx)).alias("jx"),
                (F.col("cy") + F.lit(dy)).alias("jy"),
            )
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    a = pts.select(
        F.col("pid").alias("a_id"),
        F.col("px").alias("ax"),
        F.col("py").alias("ay"),
        F.explode(offs).alias("c"),
    ).select("a_id", "ax", "ay", F.col("c.jx").alias("cx"), F.col("c.jy").alias("cy"))
    b = pts.select(
        F.col("pid").alias("b_id"),
        F.col("px").alias("bx"),
        F.col("py").alias("by"),
        "cx",
        "cy",
    )
    dx = F.col("ax") - F.col("bx")
    dy = F.col("ay") - F.col("by")
    # pairs feeds three consumers (degrees, core edges, border attach) and
    # labeled three more — materialize once, or the 9x-exploded candidate
    # join re-executes per consumer
    pairs = (
        a.join(b, ["cx", "cy"])
        .where((F.col("a_id") != F.col("b_id")) & (dx * dx + dy * dy <= F.lit(e * e)))
        .select("a_id", "b_id")
        .localCheckpoint(eager=True)
    )
    return _label_clusters(pts, pairs, min_pts, key_col)


def st_dbscan(
    points: DataFrame,
    eps: float,
    eps_t: float,
    min_pts: int,
    key_col: str = "pid",
    x_col: str = "mx",
    y_col: str = "my",
    t_col: str = "t",
) -> DataFrame:
    """ST-DBSCAN (Birant & Kut 2007): DBSCAN whose neighborhood is the
    spatio-temporal CYLINDER — spatial distance <= eps AND |dt| <=
    eps_t — so bursts at the same place but different times separate,
    and co-temporal activity at different places separates, which plain
    :func:`dbscan` cannot express.  Same scale shape as the spatial
    operator with the grid lifted to 3D: candidate pairs come from a
    (cell_x, cell_y, cell_t) equi-join after a 27-offset explode (the
    PBSM trick with time bucketed at eps_t), never an all-pairs
    product; cores/components/border-attach are identical (large/small-
    star contraction, deterministic min-core labels).

    Returns [key_col, is_core, cluster_id] — cluster_id NULL for
    noise."""
    e = float(eps)
    et = float(eps_t)
    pts = points.select(
        F.col(key_col).alias("pid"),
        F.col(x_col).cast("double").alias("px"),
        F.col(y_col).cast("double").alias("py"),
        F.col(t_col).cast("double").alias("pt"),
        F.floor(F.col(x_col) / F.lit(e)).cast("long").alias("cx"),
        F.floor(F.col(y_col) / F.lit(e)).cast("long").alias("cy"),
        F.floor(F.col(t_col) / F.lit(et)).cast("long").alias("ct"),
    )
    offs = F.array(
        *[
            F.struct(
                (F.col("cx") + F.lit(dx)).alias("jx"),
                (F.col("cy") + F.lit(dy)).alias("jy"),
                (F.col("ct") + F.lit(dt)).alias("jt"),
            )
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            for dt in (-1, 0, 1)
        ]
    )
    a = pts.select(
        F.col("pid").alias("a_id"),
        F.col("px").alias("ax"),
        F.col("py").alias("ay"),
        F.col("pt").alias("at"),
        F.explode(offs).alias("c"),
    ).select(
        "a_id", "ax", "ay", "at",
        F.col("c.jx").alias("cx"), F.col("c.jy").alias("cy"),
        F.col("c.jt").alias("ct"),
    )
    b = pts.select(
        F.col("pid").alias("b_id"),
        F.col("px").alias("bx"),
        F.col("py").alias("by"),
        F.col("pt").alias("bt"),
        "cx", "cy", "ct",
    )
    dx = F.col("ax") - F.col("bx")
    dy = F.col("ay") - F.col("by")
    dt = F.abs(F.col("at") - F.col("bt"))
    pairs = (
        a.join(b, ["cx", "cy", "ct"])
        .where(
            (F.col("a_id") != F.col("b_id"))
            & (dx * dx + dy * dy <= F.lit(e * e))
            & (dt <= F.lit(et))
        )
        # no distinct needed: each neighbor lives in exactly ONE 3D cell,
        # so exactly one of a's 27 offsets reaches it (same argument as
        # the 9-offset spatial join above)
        .select("a_id", "b_id")
        .localCheckpoint(eager=True)
    )
    return _label_clusters(pts, pairs, min_pts, key_col)
