"""Event-stream operators: sessionization, as-of join, and interval join
over web-log-shaped tables.

Session assignment (split a user's event stream wherever the gap between
consecutive events exceeds a timeout) is the standard first step of web-log
feature extraction.  ``sessionize`` uses Spark's native
``F.session_window`` — the SAME aggregate works unchanged in a Structured
Streaming query (with a watermark), where state merges windows per key as
late events arrive; in batch it compiles to one partial-aggregated groupBy
on (key, merged-window), so the only shuffle is keyed by user and the
map-side combine collapses each scan partition's events first.

Scale: state/shuffle is keyed by user_id — uniform unless one synthetic
user dominates; a bot whale-key is exactly what AQE skew-split handles.
The session END reported here is ``max(ts)`` (last event), not Spark's
internal window end (last event + gap): the gap-extension is an
implementation detail of window merging, while last-activity is the value
downstream features want and the one every engine agrees on.

``asof_join`` and ``interval_join`` are the two temporal-join shapes the
DataFrame API lacks as primitives (pandas ``merge_asof`` / kdb ``aj`` and
``wj`` are the public models).  Both are expressed as compositions of
built-in operators — one keyed shuffle each, no per-key Python loop, no
cross join — so Catalyst/AQE still own the physical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """One row per (key, session): session_start = first event ts,
    session_end = last event ts, n_events, sum_value.

    Works identically as a streaming aggregation: add
    ``.withWatermark(ts_col, horizon)`` upstream and the same plan merges
    session state across micro-batches."""
    sw = F.session_window(F.col(ts_col), gap)
    return (
        events.groupBy(F.col(key_col), sw.alias("w"))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(key_col, "session_start", "session_end", "n_events", "sum_value")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
    tiebreak_col: str | None = None,
    suffix: str = "_asof",
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: every left row gains the ``value_cols`` of the right row
    with the same keys that is, per ``direction`` (pandas ``merge_asof``
    semantics, ``allow_exact_matches=True``; kdb+ ``aj``):

    - ``'backward'`` — the most recent right row with ``right.ts <= left.ts``;
    - ``'forward'`` — the earliest right row with ``right.ts >= left.ts``;
    - ``'nearest'`` — whichever of those two is closer in time (ties go
      backward, pandas' rule).

    Unmatched left rows keep nulls.  Matched columns come back as
    ``<col><suffix>`` plus ``ts<suffix>`` (the matched right timestamp),
    and ALL of them come from the same right row — a null value field on
    the matched row stays null, it is never spliced from an older row.
    Chaining calls requires a distinct ``suffix`` per call (a collision
    with an existing left column raises).
    When several right rows share the matching timestamp, the one with the
    LARGEST ``tiebreak_col`` wins (required — an as-of join without a total
    order on the right side is nondeterministic).  ``tolerance`` (an
    INTERVAL string, e.g. ``'10 minutes'``) nulls out matches farther than
    that from ``left.ts``, like pandas' ``tolerance=``.

    Physical shape — the point of doing it this way instead of a range
    join: tag the two inputs, ``unionByName`` them, and run ONE window pass
    per key ordered by (ts, side, tiebreak) taking
    ``last(value, ignorenulls=True)`` over the preceding frame.  That is a
    single hash exchange on the keys plus an in-partition sort — the same
    cost as the sort-merge join Spark would run anyway — with no
    point-in-interval blowup and no driver participation.  Right rows sort
    BEFORE left rows at equal ts, so exact-timestamp matches are included.
    ``'forward'`` is the mirror image (ts descending); ``'nearest'``
    evaluates both passes over the SAME hash partitioning (one exchange,
    two in-partition sorts) and picks per row.  Skewed keys are ordinary
    shuffle skew (AQE's problem, not ours)."""
    value_cols = list(value_cols or [])
    if tiebreak_col is None:
        raise ValueError("asof_join requires tiebreak_col for determinism")
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction: {direction!r}")
    matched = [f"{c}{suffix}" for c in value_cols]
    mts = f"{ts_col}{suffix}"
    # chaining guard: output/internal names landing on existing left
    # columns would be silently merged by unionByName
    clash = ({mts, *matched, "_ts", "_side", "_rtb", "_m"}) & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join output/internal columns already on left: {sorted(clash)}"
            " — pass a different suffix="
        )

    # the match travels as ONE struct so every output field comes from the
    # SAME right row (per-column ignorenulls fills would splice a null
    # value field from an older right row); tiebreak keeps its native type
    # (casting to double would collapse >2^53 ids and null out strings)
    rsel = right.select(
        *key_cols,
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(tiebreak_col).alias("_rtb"),
        F.struct(
            F.col(ts_col).alias("mts"),
            *[F.col(c).alias(f"v{i}") for i, c in enumerate(value_cols)],
        ).alias("_m"),
    )
    lsel = left.select(
        *left.columns, F.col(ts_col).alias("_ts"), F.lit(1).alias("_side")
    )
    u = lsel.unionByName(rsel, allowMissingColumns=True)

    # nulls-first on _rtb is Spark's ASC default; the DuckDB twin must pin
    # NULLS FIRST explicitly (its ASC default is nulls-last)
    def _fill(descending: bool):
        w = (
            Window.partitionBy(*key_cols)
            .orderBy(
                F.col("_ts").desc() if descending else F.col("_ts").asc(),
                F.col("_side").asc(),
                F.col("_rtb").asc(),
            )
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last("_m", ignorenulls=True).over(w)

    def _emit(m, keep):
        fields = [F.col(ts_col + "___m").getField("mts")] + [
            F.col(ts_col + "___m").getField(f"v{i}") for i in range(len(value_cols))
        ]
        return [
            F.when(keep, fld).alias(name)
            for fld, name in zip(fields, [mts] + matched)
        ]

    tol = F.expr(f"INTERVAL {tolerance}") if tolerance is not None else None

    if direction in ("backward", "forward"):
        fwd = direction == "forward"
        filled = u.select("*", _fill(fwd).alias(ts_col + "___m"))
        out = filled.where(F.col("_side") == 1)
        m = F.col(ts_col + "___m")
        keep = m.isNotNull()
        if tol is not None:
            keep = keep & (
                m.getField("mts") <= F.col("_ts") + tol
                if fwd
                else m.getField("mts") >= F.col("_ts") - tol
            )
        return out.select(*left.columns, *_emit(m, keep))

    # nearest: both passes share the hash partitioning; pick per row
    filled = u.select(
        "*", _fill(False).alias("_bm"), _fill(True).alias("_fm")
    )
    out = filled.where(F.col("_side") == 1)
    bm, fm = F.col("_bm"), F.col("_fm")
    bvalid = bm.isNotNull()
    fvalid = fm.isNotNull()
    if tol is not None:
        bvalid = bvalid & (bm.getField("mts") >= F.col("_ts") - tol)
        fvalid = fvalid & (fm.getField("mts") <= F.col("_ts") + tol)
    pick_b = bvalid & (
        ~fvalid
        | (
            (F.col("_ts") - bm.getField("mts"))
            <= (fm.getField("mts") - F.col("_ts"))
        )
    )
    names = [mts] + matched
    fields = ["mts"] + [f"v{i}" for i in range(len(value_cols))]
    return out.select(
        *left.columns,
        *[
            F.when(pick_b, bm.getField(f))
            .when(fvalid, fm.getField(f))
            .alias(n)
            for f, n in zip(fields, names)
        ],
    )


_UNIT_SECONDS = {
    "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
}


def _interval_seconds(spec: str) -> int:
    """'10 minutes' -> 600.  Resolved driver-side (Spark can't extract
    epoch seconds from an ANSI interval literal)."""
    try:
        n, unit = spec.strip().split()
        secs = int(n) * _UNIT_SECONDS[unit.lower()]
    except (ValueError, KeyError):
        raise ValueError(
            f"bucket must be '<n> <unit>' with unit one of "
            f"{sorted(set(_UNIT_SECONDS))}: {spec!r}"
        ) from None
    if secs <= 0:
        raise ValueError(f"bucket must be a positive interval: {spec!r}")
    return secs


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    key_cols: list[str] | None = None,
    bucket: str = "10 minutes",
) -> DataFrame:
    """Inner range join: every (point, interval) pair with equal keys and
    ``start <= point.ts < end`` (half-open, the web-log convention).  The
    result carries all point columns plus all interval columns (callers
    disambiguate names upfront).

    Physical shape — the cartesian-free pattern for range predicates on a
    distributed engine: quantize time into fixed ``bucket``s, EXPLODE each
    interval to the buckets it covers (``sequence`` — built-in, no UDF),
    equi-join on (keys, bucket), then apply the exact range residual.  A
    point owns exactly ONE bucket, so no match is duplicated and no dedup
    pass is needed.  Join fan-out is |intervals| x ceil(len/bucket) — pick
    ``bucket`` near the typical interval length so each interval explodes
    to ~2 rows.  The equi-join is an ordinary shuffle join Catalyst/AQE
    plan freely (broadcast when the exploded intervals are small), versus
    the O(|points| x |intervals|) BroadcastNestedLoopJoin Spark emits for a
    raw BETWEEN predicate.  Truncation to whole seconds is monotone, so
    bucket coverage never misses a microsecond-precision match (the exact
    residual keeps only true pairs)."""
    key_cols = list(key_cols or [])
    width = _interval_seconds(bucket)
    p = points.withColumn(
        "_bk", F.expr(f"unix_timestamp({ts_col}) div {width}")
    )
    i = intervals.withColumn(
        "_bk",
        F.explode(
            F.expr(
                f"sequence(unix_timestamp({start_col}) div {width},"
                f" unix_timestamp({end_col}) div {width})"
            )
        ),
    )
    joined = p.join(i, key_cols + ["_bk"]).where(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return joined.drop("_bk")


def trajectory_stops(
    points: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    x_col: str = "mx",
    y_col: str = "my",
    eps: float = 50.0,
    min_pts: int = 3,
) -> DataFrame:
    """Stay-point (stop) detection over ordered tracks — the
    moving-object companion to :func:`sessionize` (which segments by
    TIME gaps; this segments by SPACE jumps): consecutive points whose
    step distance stays within ``eps`` form one candidate stop; a stop
    is reported when it accumulates ``min_pts`` points.

    Shape (all window functions over ONE (user, ts) exchange — no UDF,
    no extra shuffle): lag the position, flag steps with
    ``dist > eps`` (or the first row), and the running SUM of flags is
    the segment id — the same cumulative-flag trick the time
    sessionizer uses; then one partial-agg groupBy per (user, segment)
    emits n_pts, dwell seconds, and the segment centroid via the
    doc_id-ordered fold (deterministic cross-engine, the
    user_trajectories pattern).

    Returns ``(user, seg_id, n_pts, dwell_s, cx, cy)`` for segments
    with at least ``min_pts`` points."""
    u, ts = F.col(user_col), F.col(ts_col)
    w = Window.partitionBy(user_col).orderBy(ts_col)
    px = F.lag(x_col).over(w)
    py = F.lag(y_col).over(w)
    dx = F.col(x_col) - px
    dy = F.col(y_col) - py
    jump = F.when(
        px.isNull() | (F.sqrt(dx * dx + dy * dy) > F.lit(float(eps))), 1
    ).otherwise(0)
    seg = points.withColumn(
        "seg_id",
        F.sum(jump).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    ordered = F.sort_array(
        F.collect_list(F.struct(ts_col, x_col, y_col))
    )
    agg = seg.groupBy(user_col, "seg_id").agg(ordered.alias("o"))
    n = F.size("o")
    csum = lambda field: F.aggregate(  # noqa: E731 - tight local fold
        F.col("o"), F.lit(0.0), lambda a, s: a + s[field]
    )
    return agg.select(
        u,
        "seg_id",
        n.alias("n_pts"),
        (
            F.element_at(F.col("o"), -1)[ts_col].cast("long")
            - F.element_at(F.col("o"), 1)[ts_col].cast("long")
        ).alias("dwell_s"),
        (csum(x_col) / n).alias("cx"),
        (csum(y_col) / n).alias("cy"),
    ).filter(F.col("n_pts") >= int(min_pts))


def mann_kendall_cells(
    ev: DataFrame,
    cell: float,
    period_seconds: int = 86400,
    x_col: str = "mx",
    y_col: str = "my",
    ts_col: str = "ts",
) -> DataFrame:
    """Mann-Kendall trend per grid cell over event-count time series — the
    statistic under ArcGIS "Emerging Hot Spot Analysis" (space-time cube +
    per-cell MK trend):

        S = Σ_{i<j} sign(x_j − x_i)

    over the cell's per-period counts, periods DENSIFIED over the global
    [pmin, pmax] range (an empty period is a 0 count — skipping it would
    bias S toward whatever happened to be recorded).  The variance uses
    the standard tie correction

        Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)] / 18

    and the continuity-corrected z = (S∓1)/sqrt(Var) (0 when S = 0 or the
    series is all-tied).  Every sum is an exact small integer, so
    distributed aggregation order is immaterial; sqrt is the only
    rounding-sensitive step (twin-mirrored).

    Plan: ONE groupBy to (cell, period) counts, a bounded dense explode
    (period count = time range / period_seconds, a compile-time-ish
    constant), ONE self-equi-join on the cell key for the i<j pairs, and
    two partial-aggregated groupBys (S; tie groups).  At 100 TB the pair
    join is per-cell T² with T bounded (e.g. 30 days), all shuffles on
    the cell key.  Returns [cx, cy, n_events, s_stat, mk_z, trend]."""
    if cell <= 0 or period_seconds <= 0:
        raise ValueError("mann_kendall_cells requires positive cell/period")
    src = ev.select(
        F.floor(F.col(x_col) / F.lit(float(cell))).cast("long").alias("cx"),
        F.floor(F.col(y_col) / F.lit(float(cell))).cast("long").alias("cy"),
        # NTZ timestamps reject a direct double cast; hop through
        # session-TZ timestamp (pinned UTC) so epoch seconds keep their
        # microsecond fraction and match DuckDB's epoch()
        F.floor(
            F.col(ts_col).cast("timestamp").cast("double")
            / F.lit(float(period_seconds))
        ).cast("long").alias("p"),
    )
    counts = src.groupBy("cx", "cy", "p").agg(
        F.count("*").cast("double").alias("x")
    )
    rng = counts.agg(F.min("p").alias("pmin"), F.max("p").alias("pmax"))
    cells_ = counts.select("cx", "cy").distinct()
    dense = (
        cells_.crossJoin(F.broadcast(rng))
        .withColumn("p", F.explode(F.sequence(F.col("pmin"), F.col("pmax"))))
        .select("cx", "cy", "p")
        .join(counts, ["cx", "cy", "p"], "left")
        .withColumn("x", F.coalesce(F.col("x"), F.lit(0.0)))
    )
    a = dense.select("cx", "cy", F.col("p").alias("p1"), F.col("x").alias("x1"))
    b = dense.select("cx", "cy", F.col("p").alias("p2"), F.col("x").alias("x2"))
    pairs = a.join(b, ["cx", "cy"]).where(F.col("p1") < F.col("p2"))
    s = pairs.groupBy("cx", "cy").agg(
        F.sum(F.signum(F.col("x2") - F.col("x1")).cast("long")).alias("s_stat"),
        (F.max("p2") - F.min("p1") + 1).alias("n_periods"),
    )
    ties = (
        dense.groupBy("cx", "cy", "x")
        .agg(F.count("*").cast("double").alias("t"))
        .groupBy("cx", "cy")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1.0) * (2.0 * F.col("t") + 5.0)
            ).alias("tie_term")
        )
    )
    nev = src.groupBy("cx", "cy").agg(F.count("*").alias("n_events"))
    out = s.join(ties, ["cx", "cy"]).join(nev, ["cx", "cy"])
    n = F.col("n_periods").cast("double")
    var = (n * (n - 1.0) * (2.0 * n + 5.0) - F.col("tie_term")) / 18.0
    sd = F.col("s_stat").cast("double")
    z = (
        F.when(F.col("s_stat") > 0, (sd - 1.0) / F.sqrt(F.nullif(var, F.lit(0.0))))
        .when(F.col("s_stat") < 0, (sd + 1.0) / F.sqrt(F.nullif(var, F.lit(0.0))))
        .otherwise(F.lit(0.0))
    )
    trend = (
        F.when(F.col("s_stat") > 0, F.lit("increasing"))
        .when(F.col("s_stat") < 0, F.lit("decreasing"))
        .otherwise(F.lit("none"))
    )
    return out.select(
        "cx", "cy", "n_events", "s_stat",
        (F.round(z, 6) + F.lit(0.0)).alias("mk_z"),
        trend.alias("trend"),
    )


def trajectory_cpa(
    ev: DataFrame,
    bucket_seconds: float = 86400.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    x_col: str = "mx",
    y_col: str = "my",
) -> DataFrame:
    """PostGIS ``ST_ClosestPointOfApproach`` / ``ST_DistanceCPA`` between
    every pair of user trajectories: positions linearly interpolated in
    TIME along each user's ordered samples, and the closest approach
    minimized exactly — within one segment pair the squared separation is
    a convex quadratic |D0 + V·tau|^2 over the time overlap, so its
    minimum is the clamped parabola vertex

        tau* = clamp(-(D0 . V) / |V|^2, 0, overlap),   V parallel -> tau 0

    evaluated in closed form (no sampling).  The pair join is NOT a cross
    join: segments explode to the ``bucket_seconds`` time buckets they
    span and equi-join on the bucket key — a segment pair sharing several
    buckets yields duplicate candidates, which the final min() absorbs,
    so no dedup shuffle is needed.  That bucketed-interval-join shape is
    the 100 TB contract: shuffles key on (bucket), the quadratic solve is
    pure codegen, and the per-pair argmin is ONE partial-aggregated
    groupBy on a (dist2, t) struct (tiebreak mirrored in the twin).

    Zero-duration segments are dropped (no velocity); users with disjoint
    time ranges simply emit no row.  Returns
    ``[u1, u2, cpa_dist (same units as x/y), t_cpa (epoch seconds)]``."""
    t = F.col(ts_col).cast("timestamp").cast("double")
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    seg = (
        ev.select(
            F.col(user_col).alias("u"),
            t.alias("t1"),
            F.col(x_col).alias("x1"),
            F.col(y_col).alias("y1"),
            F.lead(t).over(w).alias("t2"),
            F.lead(x_col).over(w).alias("x2"),
            F.lead(y_col).over(w).alias("y2"),
        )
        .where(F.col("t2").isNotNull() & (F.col("t2") > F.col("t1")))
    )
    wsec = float(bucket_seconds)
    segb = seg.withColumn(
        "bk",
        F.explode(
            F.sequence(
                F.floor(F.col("t1") / wsec).cast("long"),
                F.floor(F.col("t2") / wsec).cast("long"),
            )
        ),
    )
    a, b = segb.alias("a"), segb.alias("b")
    j = a.join(
        b,
        (F.col("a.bk") == F.col("b.bk"))
        & (F.col("a.u") < F.col("b.u"))
        & (F.col("a.t1") <= F.col("b.t2"))
        & (F.col("b.t1") <= F.col("a.t2")),
    )
    s = F.greatest(F.col("a.t1"), F.col("b.t1"))
    e = F.least(F.col("a.t2"), F.col("b.t2"))
    vax = (F.col("a.x2") - F.col("a.x1")) / (F.col("a.t2") - F.col("a.t1"))
    vay = (F.col("a.y2") - F.col("a.y1")) / (F.col("a.t2") - F.col("a.t1"))
    vbx = (F.col("b.x2") - F.col("b.x1")) / (F.col("b.t2") - F.col("b.t1"))
    vby = (F.col("b.y2") - F.col("b.y1")) / (F.col("b.t2") - F.col("b.t1"))
    d0x = (F.col("a.x1") + vax * (s - F.col("a.t1"))) - (
        F.col("b.x1") + vbx * (s - F.col("b.t1"))
    )
    d0y = (F.col("a.y1") + vay * (s - F.col("a.t1"))) - (
        F.col("b.y1") + vby * (s - F.col("b.t1"))
    )
    vx = vax - vbx
    vy = vay - vby
    v2 = vx * vx + vy * vy
    tau = F.when(v2 > 0.0, -(d0x * vx + d0y * vy) / v2).otherwise(F.lit(0.0))
    tauc = F.greatest(F.lit(0.0), F.least(tau, e - s))
    ddx = d0x + vx * tauc
    ddy = d0y + vy * tauc
    cand = j.select(
        F.col("a.u").alias("u1"),
        F.col("b.u").alias("u2"),
        (ddx * ddx + ddy * ddy).alias("dist2"),
        (s + tauc).alias("t_at"),
    )
    best = cand.groupBy("u1", "u2").agg(
        F.min(F.struct(F.col("dist2"), F.col("t_at"))).alias("m")
    )
    return best.select(
        "u1",
        "u2",
        F.sqrt(F.col("m.dist2")).alias("cpa_dist"),
        F.col("m.t_at").alias("t_cpa"),
    )


def od_flows(
    points: DataFrame,
    zoom: int = 4,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    x_col: str = "mx",
    y_col: str = "my",
) -> DataFrame:
    """Origin–destination flow matrix over trajectories — the classic
    movement-analytics rollup (flowmap / OD-cube): each user's track
    contributes one trip from its FIRST to its LAST sample (by
    ``(ts, order_col)``), both endpoints assigned to zoom-``zoom``
    tile zones, flows aggregated per (origin zone, destination zone).

    Shape: ONE groupBy(user) with struct min/max aggregates picks the
    endpoints (no sort, no window — min/max over (ts, order, x, y)
    structs is the distributed argmin/argmax), then zone assignment is
    pure codegen (:func:`~tilekiln_spark.functions.tileids.tile_x`) and
    the flow rollup is ONE partial-aggregated groupBy on the zone-pair
    key.  Two shuffles total, both on compact keys; no driver collect.

    Displacement stats per flow use min/max (order-independent exact
    float comparisons — cross-engine safe where a distributed avg is
    not).  Returns ``[o_x, o_y, d_x, d_y, n_users, min_km, max_km]``
    with km rounded to 6."""
    from tilekiln_spark.functions.tileids import tile_x, tile_y

    ends = points.groupBy(user_col).agg(
        F.min(F.struct(ts_col, order_col, x_col, y_col)).alias("o"),
        F.max(F.struct(ts_col, order_col, x_col, y_col)).alias("d"),
    )
    z = F.lit(int(zoom))
    ddx = F.col(f"d.{x_col}") - F.col(f"o.{x_col}")
    ddy = F.col(f"d.{y_col}") - F.col(f"o.{y_col}")
    per = ends.select(
        tile_x(z, F.col(f"o.{x_col}")).alias("o_x"),
        tile_y(z, F.col(f"o.{y_col}")).alias("o_y"),
        tile_x(z, F.col(f"d.{x_col}")).alias("d_x"),
        tile_y(z, F.col(f"d.{y_col}")).alias("d_y"),
        (F.sqrt(ddx * ddx + ddy * ddy) / F.lit(1000.0)).alias("km"),
    )
    return per.groupBy("o_x", "o_y", "d_x", "d_y").agg(
        F.count("*").alias("n_users"),
        (F.round(F.min("km"), 6) + F.lit(0.0)).alias("min_km"),
        (F.round(F.max("km"), 6) + F.lit(0.0)).alias("max_km"),
    )


def knox_test(
    ev: DataFrame,
    delta: float,
    tau_seconds: float,
    id_col: str = "event_id",
    ts_col: str = "ts",
    x_col: str = "mx",
    y_col: str = "my",
) -> DataFrame:
    """Knox space-time interaction test (Knox 1964; the epidemiology /
    crime-analysis statistic for "do events cluster in space AND time
    beyond what either margin explains"): over all ordered event pairs,

        n_space = #{d_ij <= delta},   n_time = #{|t_i - t_j| <= tau},
        n_both  = #{both},            ratio = n_both·n_pairs / (n_space·n_time)

    (ratio > 1 = space-time interaction; the classical expected count
    under independent margins is n_space·n_time / n_pairs).

    Neither margin is a cross join:

    - the SPACE margin (and n_both, cut from the same pass) is one self
      :func:`~tilekiln_spark.operators.spatial_join.dwithin_join` at
      ``delta`` — the bounded 3x3 cell-neighborhood equi-join;
    - the TIME margin buckets t by ``tau`` and joins each event's bucket
      to the other side's {b-1, b, b+1} explode (the trajectory_cpa
      interval shape): |Δt| <= tau implies adjacent buckets, and exactly
      one exploded copy matches, so the count is exact with a 3x
      bounded explode.

    Every count is an exact integer (squared-distance boundary test,
    epoch-second differences); the ratio is one scalar division.
    Returns ONE row ``[n_events, n_pairs, n_space, n_time, n_both,
    knox_ratio]`` (ratio NULL when a margin is empty)."""
    from tilekiln_spark.operators.spatial_join import dwithin_join

    t = F.col(ts_col).cast("timestamp").cast("double")
    pts = ev.select(F.col(id_col), t.alias("_t"), F.col(x_col), F.col(y_col))
    seeds = ev.select(
        F.col(id_col).alias("_sid"),
        t.alias("_st"),
        F.col(x_col).alias("_sx"),
        F.col(y_col).alias("_sy"),
    )
    spairs = dwithin_join(
        pts, seeds, radius=float(delta),
        mx=x_col, my=y_col, seed_mx="_sx", seed_my="_sy",
        broadcast_seeds=False,
    ).where(F.col(id_col) != F.col("_sid"))
    sagg = spairs.agg(
        F.count("*").alias("n_space"),
        F.coalesce(
            F.sum(
                (F.abs(F.col("_t") - F.col("_st")) <= F.lit(float(tau_seconds)))
                .cast("long")
            ),
            F.lit(0).cast("long"),
        ).alias("n_both"),
    )

    b = F.floor(F.col("_t") / F.lit(float(tau_seconds))).cast("long")
    left = pts.select(F.col(id_col), "_t", b.alias("_b"))
    right = seeds.select(
        "_sid", "_st",
        F.explode(
            F.array(
                F.floor(F.col("_st") / F.lit(float(tau_seconds))).cast("long") - 1,
                F.floor(F.col("_st") / F.lit(float(tau_seconds))).cast("long"),
                F.floor(F.col("_st") / F.lit(float(tau_seconds))).cast("long") + 1,
            )
        ).alias("_b"),
    )
    tagg = (
        left.join(right, "_b")
        .where(
            (F.col(id_col) != F.col("_sid"))
            & (F.abs(F.col("_t") - F.col("_st")) <= F.lit(float(tau_seconds)))
        )
        .agg(F.count("*").alias("n_time"))
    )

    mom = ev.agg(F.count("*").alias("n_events"))
    out = (
        mom.crossJoin(F.broadcast(sagg))
        .crossJoin(F.broadcast(tagg))
        .select(
            "n_events",
            (F.col("n_events") * (F.col("n_events") - 1)).alias("n_pairs"),
            "n_space",
            "n_time",
            "n_both",
        )
    )
    ratio = (
        F.col("n_both").cast("double") * F.col("n_pairs").cast("double")
    ) / F.nullif(
        F.col("n_space").cast("double") * F.col("n_time").cast("double"),
        F.lit(0.0),
    )
    return out.withColumn("knox_ratio", ratio)


def cusum_alarms(
    df: DataFrame,
    key_col: str = "event_type",
    t_col: str = "ts",
    k: int = 3,
    h: int = 8,
    bucket_s: int = 3600,
) -> DataFrame:
    """One-sided CUSUM change detection (Page 1954) over per-key event
    streams, bucketed at ``bucket_s``:

        S_0 = 0;  S_t = max(0, S_{t-1} + (count_t - k));  alarm: S_t >= h

    k is the integer allowance (drift tolerated per bucket), h the
    decision threshold.  The recurrence LOOKS sequential but is exactly
    the running-minimum identity

        S_t = P_t - min(0, min_{j<=t} P_j),   P = prefix sum of (count - k)

    so the whole statistic is TWO ordered window aggregates per key —
    no fold, no recursion, and because counts and k are integers every
    value is an EXACT integer: zero float anywhere, the first
    sequential-looking operator in the repo that needed neither a
    sorted fold nor rounding.  Empty buckets matter (they drain S at
    rate k), so the key×bucket grid is completed from one tiny global
    bounds aggregate broadcast against the distinct keys — gap buckets
    are generated, not read.

    Scale: one partial-agg groupBy(key, bucket) over the event stream,
    then windows partitioned BY KEY — each key's timeline sorts
    independently (the sessionize exchange); the grid explode is
    #keys × #buckets, tiny relative to events.
    Returns [key, bucket, cnt, s, alarm]."""
    b = F.floor(F.unix_timestamp(F.col(t_col)) / F.lit(bucket_s)).cast("long")
    counts = df.select(F.col(key_col).alias("key"), b.alias("bucket")).groupBy(
        "key", "bucket"
    ).agg(F.count("*").alias("cnt"))
    bounds = counts.agg(
        F.min("bucket").alias("b0"), F.max("bucket").alias("b1")
    )
    grid = (
        counts.select("key")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select("key", F.explode(F.sequence("b0", "b1")).alias("bucket"))
    )
    full = grid.join(counts, ["key", "bucket"], "left").select(
        "key", "bucket", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    w = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = full.withColumn("p", F.sum(F.col("cnt") - F.lit(k)).over(w))
    s = p.withColumn(
        "s", F.col("p") - F.least(F.lit(0).cast("long"), F.min("p").over(w))
    )
    return s.select(
        "key", "bucket", "cnt", "s", (F.col("s") >= h).alias("alarm")
    )


def burst_states(
    df: DataFrame,
    key_col: str = "event_type",
    t_col: str = "ts",
    big: int = 1 << 50,
) -> DataFrame:
    """Two-state burst detection over per-key event streams — the
    Kleinberg 2002 automaton with its costs INTEGERIZED (the chamfer
    2-3 / EDR discipline: the exponential-family emission cost is
    exactly linear in the gap, alpha_j * x - ln(alpha_j); this keeps
    the linear structure and replaces the transcendental offsets with
    the stream's integer base gap):

        gap units:  microseconds, x_i = t_{i+1} - t_i   (exact ints)
        base gap:   g0 = (t_last - t_first) div m        (m = #gaps)
        cost in q0: x                       (slope 1, offset 0)
        cost in q1: 2*x - g0                (burst rate 2x; boundary at
                                             x = g0 — shorter gaps favor
                                             the burst state)
        transition: q0 -> q1 costs 2*g0;  q1 -> q0 free

    Viterbi over the 2-state chain is ONE forward fold per stream
    (struct accumulator (c0, c1, backpointers), all-integer, ties
    resolved q0-first into q0 and q1-first into q1) and ONE backward
    fold over the reversed backpointers — both JVM higher-order
    functions over the per-key sorted gap array (the user_trajectories
    assembly), zero Python, zero float.  A twin replays the identical
    recurrence as a step-indexed recursive CTE.

    Scale: per-key arrays bound the fold (a stream lives in one task —
    the per-key-timeline shape every sessionize op shares); streams
    too long for one array chunk into windows with boundary overlap,
    the standard stream-segmentation move.
    Returns [key, idx, gap_us, burst] — idx is the 1-based gap index;
    streams with < 2 events emit nothing."""
    # parquet timestamps arrive as TIMESTAMP_NTZ; the cast binds them to
    # the session zone (pin UTC) so unix_micros matches DuckDB epoch_us
    t_us = F.unix_micros(F.col(t_col).cast("timestamp"))
    seq = (
        df.select(F.col(key_col).alias("key"), t_us.alias("t"))
        .groupBy("key")
        .agg(F.sort_array(F.collect_list("t")).alias("ts"))
        .where(F.size("ts") >= 2)
    )
    n = F.size(F.col("ts"))
    m = n - 1
    xs = F.zip_with(
        F.slice(F.col("ts"), 2, m),
        F.slice(F.col("ts"), 1, m),
        lambda a, b: a - b,
    )
    g0 = F.floor(
        (F.element_at(F.col("ts"), -1) - F.element_at(F.col("ts"), 1)) / m
    ).cast("long")
    prepped = seq.select("key", xs.alias("xs"), g0.alias("g0"))
    acc0 = F.struct(
        F.lit(0).cast("long").alias("c0"),
        F.lit(big).cast("long").alias("c1"),
        F.array().cast("array<struct<p0:boolean,p1:boolean>>").alias("bps"),
    )
    fwd = F.aggregate(
        F.col("xs"),
        acc0,
        lambda acc, x: F.struct(
            (F.least(acc["c0"], acc["c1"]) + x).alias("c0"),
            (
                F.least(acc["c0"] + 2 * F.col("g0"), acc["c1"])
                + 2 * x
                - F.col("g0")
            ).alias("c1"),
            F.concat(
                acc["bps"],
                F.array(
                    F.struct(
                        (acc["c0"] <= acc["c1"]).alias("p0"),
                        (acc["c0"] + 2 * F.col("g0") < acc["c1"]).alias("p1"),
                    )
                ),
            ).alias("bps"),
        ),
    )
    withf = prepped.select("key", "xs", "g0", fwd.alias("f"))
    end_state = F.when(
        F.col("f.c0") <= F.col("f.c1"), F.lit(0)
    ).otherwise(F.lit(1))
    back = F.aggregate(
        F.reverse(F.col("f.bps")),
        F.struct(
            end_state.alias("cur"),
            F.array().cast("array<int>").alias("seq"),
        ),
        lambda acc, bp: F.struct(
            F.when(
                acc["cur"] == 1,
                F.when(bp["p1"], F.lit(0)).otherwise(F.lit(1)),
            )
            .otherwise(F.when(bp["p0"], F.lit(0)).otherwise(F.lit(1)))
            .alias("cur"),
            F.concat(acc["seq"], F.array(acc["cur"])).alias("seq"),
        ),
        lambda acc: F.reverse(acc["seq"]),
    )
    states = withf.select("key", "xs", back.alias("st"))
    return states.select(
        "key",
        F.posexplode(F.arrays_zip(F.col("xs"), F.col("st"))).alias("i", "z"),
    ).select(
        "key",
        (F.col("i") + 1).alias("idx"),
        F.col("z.xs").alias("gap_us"),
        (F.col("z.st") == 1).alias("burst"),
    )


def series_acf(
    df: DataFrame,
    lags: list[int],
    key_col: str = "event_type",
    t_col: str = "ts",
    bucket_s: int = 3600,
) -> DataFrame:
    """Autocorrelation function of per-key event-count series at the
    given lags (Box-Jenkins seasonality screening: a daily cycle shows
    up as a peak at lag 24 h):

        r_k = (n*Sxy - Sx*Sy)
              / sqrt((n*Sxx - Sx^2) * (n*Syy - Sy^2))

    over the (x_t, x_{t+k}) pairs of the gap-completed bucket series —
    the same generated grid as :func:`cusum_alarms`, because missing
    buckets are zeros, not holes.  Every moment is a sum of int64
    products (counts), so the five S-terms are EXACT integers and the
    only float ops are the final subtract/multiply/sqrt/divide —
    deterministic cross-engine with no fold.  Lag pairs come from a
    bucket self-join keyed on (key, bucket + k) — identical shape in
    the SQL twin (window lead() needs a constant offset; the join form
    parameterizes k as data).  Degenerate series (zero variance on
    either side) return NULL r.

    Returns [key, lag, n_pairs, r]."""
    b = F.floor(F.unix_timestamp(F.col(t_col).cast("timestamp")) / F.lit(bucket_s)).cast("long")
    counts = df.select(F.col(key_col).alias("key"), b.alias("bucket")).groupBy(
        "key", "bucket"
    ).agg(F.count("*").alias("cnt"))
    bounds = counts.agg(F.min("bucket").alias("b0"), F.max("bucket").alias("b1"))
    grid = (
        counts.select("key")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select("key", F.explode(F.sequence("b0", "b1")).alias("bucket"))
        .join(counts, ["key", "bucket"], "left")
        .select("key", "bucket", F.coalesce("cnt", F.lit(0)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    ldf = grid.sparkSession.createDataFrame(
        [(int(k),) for k in sorted(set(lags))], "lag long"
    )
    pairs = (
        grid.crossJoin(F.broadcast(ldf))
        .alias("x")
        .join(
            grid.select(
                F.col("key"), F.col("bucket").alias("b2"), F.col("cnt").alias("y")
            ).alias("yy"),
            (F.col("x.key") == F.col("yy.key"))
            & (F.col("b2") == F.col("bucket") + F.col("lag")),
        )
        .select(F.col("x.key").alias("key"), "lag", F.col("cnt").alias("x"), "y")
    )
    m = pairs.groupBy("key", "lag").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    from tilekiln_spark.functions.text import _pearson_from_moments

    r = _pearson_from_moments(
        F.col("n"), F.col("sx"), F.col("sy"),
        F.col("sxy"), F.col("sxx"), F.col("syy"),
    )
    return m.select("key", "lag", F.col("n").alias("n_pairs"), r.alias("r"))


def retention_matrix(
    df: DataFrame,
    key_col: str = "user_id",
    t_col: str = "ts",
    bucket_s: int = 86400,
) -> DataFrame:
    """Cohort retention triangle (classic product analytics): users
    cohort by their FIRST active day; cell (cohort_day, offset) counts
    cohort members active exactly offset days after their first day.

        rate = n_active / n_cohort     (offset 0 row is the cohort size)

    Every count is exact (distinct users per (day, user) activity,
    first day via one min-aggregate); the single division is the only
    float.  Shape: one (user, day) distinct rollup, one min groupBy
    per user (both keyed by user), one join back on the user, one
    partial-agg count per (cohort_day, offset) — shuffle keys are the
    user id then the small cohort key; nothing all-pairs.
    Returns [cohort_day, offset, n_cohort, n_active, rate]."""
    day = F.floor(
        F.unix_timestamp(F.col(t_col).cast("timestamp")) / F.lit(bucket_s)
    ).cast("long")
    act = df.select(F.col(key_col).alias("u"), day.alias("d")).distinct()
    first = act.groupBy("u").agg(F.min("d").alias("d0"))
    cohort = first.groupBy("d0").agg(F.count("*").alias("n_cohort"))
    cells = (
        act.join(first, "u")
        .groupBy(F.col("d0").alias("cohort_day"), (F.col("d") - F.col("d0")).alias("offset"))
        .agg(F.count("*").alias("n_active"))
    )
    return (
        cells.join(
            cohort.select(F.col("d0").alias("cohort_day"), "n_cohort"),
            "cohort_day",
        )
        .select(
            "cohort_day",
            "offset",
            "n_cohort",
            "n_active",
            (
                F.round(
                    F.col("n_active").cast("double")
                    / F.col("n_cohort").cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("rate"),
        )
    )


def funnel_steps(
    df: DataFrame,
    steps: list[str],
    key_col: str = "user_id",
    type_col: str = "event_type",
    t_col: str = "ts",
) -> DataFrame:
    """Ordered-step funnel conversion (the classic product query): a
    user converts through step k when their EARLIEST occurrence of
    each step 1..k is in non-decreasing time order — earliest-first
    semantics, the deterministic convention (ties count as ordered,
    matching "same-timestamp batch" event loggers).

    One pivot-style conditional-min aggregate per user (single
    user-keyed shuffle, min() partial-aggregates map-side), then a
    pure CASE cascade counts the deepest ordered step — exact
    integers; the conversion rates divide by the step-1 population.
    Returns [step_idx, step, n_users, rate] for k = 1..len(steps)."""
    if not steps:
        raise ValueError("funnel_steps: steps must be non-empty")
    mins = df.groupBy(F.col(key_col).alias("u")).agg(
        *[
            F.min(
                F.when(F.col(type_col) == s, F.col(t_col))
            ).alias(f"t{i}")
            for i, s in enumerate(steps)
        ]
    )
    reached = F.when(F.col("t0").isNull(), F.lit(0))
    cond = F.col("t0").isNotNull()
    for i in range(1, len(steps)):
        cond = cond & F.col(f"t{i}").isNotNull()
        for j in range(i):
            cond = cond & (F.col(f"t{j}") <= F.col(f"t{i}"))
        reached = reached.when(~cond, F.lit(i))
    depth = reached.otherwise(F.lit(len(steps)))
    per_user = mins.select(depth.alias("depth"))
    counts = per_user.groupBy().agg(
        *[
            F.sum((F.col("depth") >= k).cast("long")).alias(f"n{k}")
            for k in range(1, len(steps) + 1)
        ]
    )
    rows = None
    for k, s in enumerate(steps, start=1):
        row = counts.select(
            F.lit(k).alias("step_idx"),
            F.lit(s).alias("step"),
            F.col(f"n{k}").alias("n_users"),
            (
                F.round(
                    F.col(f"n{k}").cast("double")
                    / F.greatest(F.col("n1"), F.lit(1)).cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("rate"),
        )
        rows = row if rows is None else rows.unionAll(row)
    return rows


def markov_transitions(
    df: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
    t_col: str = "ts",
    id_col: str = "event_id",
    iterations: int = 12,
) -> DataFrame:
    """First-order Markov model of per-user event sequences (the
    clickstream transition analysis of classic web analytics): adjacent
    (state -> next) pairs via ONE lead() window ordered by
    (ts, event_id) — the id tie-break makes same-timestamp batches
    deterministic — then exact transition counts, row-normalized
    probabilities, and the STATIONARY distribution by ``iterations``
    power rounds from uniform (states with no outgoing transitions
    hold their mass — the absorbing convention).

    Floats: p = n/row_total is one exact-input division; each power
    round folds x_i * p_ij per target state in SORTED source order
    (the Shannon discipline — the state space is the distinct type
    set, so folds are tiny), and the twin unrolls the identical
    rounds.  Scale: the window pass is the sessionize exchange; the
    chain solve runs on the STATE-COUNT-sized matrix, not the events.
    Returns [from_type, to_type, n, p, stationary_from]."""
    w = Window.partitionBy(key_col).orderBy(F.col(t_col), F.col(id_col))
    pairs = (
        df.select(
            F.col(key_col),
            F.col(type_col).alias("a"),
            F.lead(type_col).over(w).alias("b"),
        )
        .where(F.col("b").isNotNull())
        .groupBy("a", "b")
        .agg(F.count("*").alias("n"))
    )
    totals = pairs.groupBy("a").agg(F.sum("n").alias("tot"))
    probs = pairs.join(totals, "a").select(
        "a",
        "b",
        "n",
        (F.col("n").cast("double") / F.col("tot").cast("double")).alias("p"),
    ).localCheckpoint(eager=True)
    states = (
        probs.select(F.col("a").alias("s"))
        .unionAll(probs.select(F.col("b").alias("s")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_states = states.count()
    x = states.select("s", F.lit(1.0 / n_states).alias("x")).localCheckpoint(
        eager=True
    )
    for _ in range(iterations):
        moved = (
            x.join(probs, x["s"] == probs["a"])
            .groupBy(F.col("b").alias("s2"))
            .agg(
                F.aggregate(
                    F.sort_array(
                        F.collect_list(F.struct(F.col("a"), (F.col("x") * F.col("p")).alias("m")))
                    ),
                    F.lit(0.0),
                    lambda acc, t: acc + t["m"],
                ).alias("inflow")
            )
        )
        # absorbing states (no outgoing row in probs) keep their mass
        held = x.join(probs.select("a").distinct(), x["s"] == F.col("a"), "left_anti")
        x = (
            states.join(
                moved.select(F.col("s2").alias("s"), "inflow"), "s", "left"
            )
            .join(held.select(F.col("s").alias("hs"), F.col("x").alias("hx")),
                  F.col("s") == F.col("hs"), "left")
            .select(
                "s",
                (
                    F.coalesce("inflow", F.lit(0.0))
                    + F.coalesce("hx", F.lit(0.0))
                ).alias("x"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        probs.join(x.select(F.col("s").alias("a"), F.col("x").alias("st")), "a")
        .select(
            F.col("a").alias("from_type"),
            F.col("b").alias("to_type"),
            F.col("n"),
            (F.round("p", 6) + F.lit(0.0)).alias("p"),
            (F.round("st", 6) + F.lit(0.0)).alias("stationary_from"),
        )
    )


def regularity_flags(
    df: DataFrame,
    key_col: str = "user_id",
    t_col: str = "ts",
    cv_threshold_pct: int = 25,
    min_gaps: int = 5,
) -> DataFrame:
    """Inter-event regularity screen (the classic bot/crawler signal:
    machines fire on timers, humans are bursty — Poisson gaps have
    CV ~ 1, cron-like traffic CV ~ 0):

        CV^2 = (n * Sdd - Sd^2) / Sd^2       (population, over the
                                              microsecond gap series)
        is_regular  iff  CV < threshold

    The FLAG is decided exactly: CV < c/100 iff 100^2 * (n*Sdd - Sd^2)
    < c^2 * Sd^2, all formed in DECIMAL(38,0) (microsecond gap squares
    overflow int64 — the spearman lesson), so the boundary can never
    disagree cross-engine; the reported cv itself is one sqrt/divide
    rounded at 6.  Gaps come from one lag() window per user (ts order;
    ties contribute zero-gaps, which count toward regularity — repeated
    identical timestamps ARE machine-like).

    Returns [key, n_gaps, mean_gap_s, cv, is_regular] for keys with at
    least ``min_gaps`` gaps."""
    us = F.unix_micros(F.col(t_col).cast("timestamp"))
    gaps = (
        df.select(F.col(key_col).alias("key"), us.alias("t"))
        .select("key", (F.col("t") - F.lag("t").over(
            Window.partitionBy("key").orderBy("t")
        )).alias("d"))
        .where(F.col("d").isNotNull())
    )
    m = gaps.groupBy("key").agg(
        F.count("*").alias("n"),
        F.sum("d").alias("sd"),
        F.sum(F.col("d").cast("decimal(38,0)") * F.col("d").cast("decimal(38,0)")).alias("sdd"),
    ).where(F.col("n") >= min_gaps)

    def dec(c):
        return c.cast("decimal(38,0)")

    var_num = dec(F.col("n")) * F.col("sdd") - dec(F.col("sd")) * dec(F.col("sd"))
    c = int(cv_threshold_pct)
    flag = (F.lit(10000).cast("decimal(38,0)") * var_num) < (
        F.lit(c * c).cast("decimal(38,0)") * dec(F.col("sd")) * dec(F.col("sd"))
    )
    cv = F.sqrt(var_num.cast("double")) / F.col("sd").cast("double")
    return m.select(
        "key",
        F.col("n").cast("long").alias("n_gaps"),
        (
            F.round(
                F.col("sd").cast("double")
                / (F.col("n").cast("double") * F.lit(1e6)),
                6,
            )
            + F.lit(0.0)
        ).alias("mean_gap_s"),
        (F.round(cv, 6) + F.lit(0.0)).alias("cv"),
        flag.alias("is_regular"),
    )
