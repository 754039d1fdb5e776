"""Distributed spatial join: points x polygons, and kNN point->centroid.

The reference's only join is the bbox-overlap predicate ``way && {{bbox}}``
executed per-tile as a PostGIS GiST index scan (reference sample/*.jinja2,
SURVEY B2).  Distributed re-design:

- **grid equi-join** (default, the scale path): polygons explode to the set of
  grid cells their bbox covers at ``grid_zoom``; points compute their single
  cell; join is a plain hash equi-join on (gx, gy) that Catalyst can shuffle-
  partition — followed by exact bbox + point-in-polygon refinement (the
  filter+refine pattern).  A point lies in exactly one cell, so no dedup pass
  is needed.  Skew from dense cells is handled by AQE skew-join plus an
  optional salt on the point side.
- **broadcast join**: polygons broadcast, range-predicate join
  (BroadcastNestedLoopJoin) + PIP refine.  Right side must be small; this is
  the R-tree-free equivalent of "broadcast R-tree then refine" — the bbox
  prefilter plays the R-tree's role, expressed declaratively so it stays
  JVM-side instead of inside a pandas UDF.

PIP is a convex-polygon half-plane test over the ring arrays using built-in
higher-order functions (F.forall) — whole-stage codegen, no UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tilekiln_spark.functions.tileids import tile_length_col, tile_x, tile_y
from tilekiln_spark.tiles.core import HALF_WORLD


def pip_convex(mx: Column, my: Column, ring_xs: Column, ring_ys: Column) -> Column:
    """Point-in-convex-polygon: all edge cross products share a sign.

    cross_i = (v_{i+1} - v_i) x (p - v_i); boundary counts as inside."""
    n = F.size(ring_xs)
    idx = F.sequence(F.lit(0), n - 1)

    def cross(i: Column) -> Column:
        j = F.pmod(i + 1, n)
        x1 = F.element_at(ring_xs, i + 1)
        y1 = F.element_at(ring_ys, i + 1)
        x2 = F.element_at(ring_xs, j + 1)
        y2 = F.element_at(ring_ys, j + 1)
        return (x2 - x1) * (my - y1) - (y2 - y1) * (mx - x1)

    return F.forall(idx, lambda i: cross(i) >= 0) | F.forall(idx, lambda i: cross(i) <= 0)


def pip_raycast(mx: Column, my: Column, ring_xs: Column, ring_ys: Column) -> Column:
    """Point-in-polygon for ARBITRARY (concave included) simple rings:
    even-odd ray cast, still a built-in higher-order fold (no UDF).

    Crossing i flips parity when edge (i, i+1) straddles the horizontal ray
    (yi > y) != (yj > y) and the intersection lies right of the point.  The
    division is guarded by the straddle condition (CaseWhen short-circuit),
    so ANSI mode never sees a divide-by-zero.  Real planet_osm_polygon
    geometries are overwhelmingly concave — ``refine="raycast_auto"`` (the
    ``points_in_polygons`` default) selects this expression form for
    low-vertex rings and the closure kernel above ~256 vertices."""
    n = F.size(ring_xs)
    idx = F.sequence(F.lit(0), n - 1)

    def flip(acc: Column, i: Column) -> Column:
        j = F.pmod(i + 1, n)
        xi = F.element_at(ring_xs, i + 1)
        yi = F.element_at(ring_ys, i + 1)
        xj = F.element_at(ring_xs, j + 1)
        yj = F.element_at(ring_ys, j + 1)
        straddles = (yi > my) != (yj > my)
        crossing = F.when(
            straddles, mx < xi + (my - yi) * (xj - xi) / (yj - yi)
        ).otherwise(F.lit(False))
        return F.when(crossing, ~acc).otherwise(acc)

    return F.aggregate(idx, F.lit(False), flip)


def make_pip_raycast_udf():
    """Arrow-batched even-odd ray cast for HIGH-COMPLEXITY rings.

    ``pip_raycast`` (the expression form) is JVM-side but *interpreted* —
    HOF lambdas don't enter whole-stage codegen, so at real-basemap ring
    complexity (10^3-10^4 vertices) the per-edge interpreted eval on every
    joined row becomes the refine cost (VERDICT r2 #6).  This kernel
    groups the Arrow batch by polygon key (each candidate pair carries its
    polygon's ring — identical within a key), evaluates one
    (points x edges) numpy crossing matrix per polygon, and XORs parity.

    Semantics identical to pip_raycast: crossing when the edge straddles
    the horizontal ray AND the intersection lies strictly right of the
    point; same float formula, so the decision matches the expression form
    bit-for-bit.  Signature: (key, mx, my, ring_xs, ring_ys) -> boolean."""
    from pyspark.sql.types import BooleanType

    @F.pandas_udf(BooleanType())
    def pip(key: pd.Series, mx: pd.Series, my: pd.Series,
            ring_xs: pd.Series, ring_ys: pd.Series) -> pd.Series:
        n = len(key)
        out = np.zeros(n, dtype=bool)
        if n == 0:
            return pd.Series(out)
        kv = key.to_numpy()
        mxv = mx.to_numpy(dtype=np.float64)
        myv = my.to_numpy(dtype=np.float64)
        codes, uniques = pd.factorize(pd.Series(kv))
        for u in range(len(uniques)):
            rows = np.flatnonzero(codes == u)
            xs = np.asarray(ring_xs.iloc[rows[0]], dtype=np.float64)
            ys = np.asarray(ring_ys.iloc[rows[0]], dtype=np.float64)
            xj = np.roll(xs, -1)
            yj = np.roll(ys, -1)
            px = mxv[rows][:, None]
            py = myv[rows][:, None]
            straddle = (ys[None, :] > py) != (yj[None, :] > py)
            with np.errstate(divide="ignore", invalid="ignore"):
                xint = xs[None, :] + (py - ys[None, :]) * (xj - xs)[None, :] / (yj - ys)[None, :]
            crossing = straddle & (px < xint)
            out[rows] = (crossing.sum(axis=1) & 1).astype(bool)
        return pd.Series(out)

    return pip


def make_pip_raycast_closure_udf(rings: dict):
    """Ray-cast refine with the rings CLOSED OVER instead of joined in.

    At real ring complexity the dominant refine cost is not the arithmetic
    but materializing the 10^3-10^4-vertex ring arrays into every joined
    candidate row (measured: a 2k-vertex ring is ~32 KB copied per pair —
    ~10 GB through the join at 334k pairs, and the same again over Arrow
    for a UDF that takes ring columns).  The polygon set is the broadcast
    dim, so its rings ride to executors once in the UDF closure (the IVF
    centroid pattern) and the join carries only the 8-byte polygon key.

    ``rings``: {key: (xs_array, ys_array)}.  Signature: (key, mx, my) ->
    boolean; same even-odd crossing rule as pip_raycast, bit-identical."""
    from pyspark.sql.types import BooleanType

    prepared = {
        k: (np.asarray(xs, dtype=np.float64), np.asarray(ys, dtype=np.float64))
        for k, (xs, ys) in rings.items()
    }

    @F.pandas_udf(BooleanType())
    def pip(key: pd.Series, mx: pd.Series, my: pd.Series) -> pd.Series:
        n = len(key)
        out = np.zeros(n, dtype=bool)
        if n == 0:
            return pd.Series(out)
        mxv = mx.to_numpy(dtype=np.float64)
        myv = my.to_numpy(dtype=np.float64)
        codes, uniques = pd.factorize(key)
        for u, k in enumerate(uniques):
            rows = np.flatnonzero(codes == u)
            xs, ys = prepared[k]
            xj = np.roll(xs, -1)
            yj = np.roll(ys, -1)
            px = mxv[rows][:, None]
            py = myv[rows][:, None]
            straddle = (ys[None, :] > py) != (yj[None, :] > py)
            with np.errstate(divide="ignore", invalid="ignore"):
                xint = xs[None, :] + (py - ys[None, :]) * (xj - xs)[None, :] / (yj - ys)[None, :]
            crossing = straddle & (px < xint)
            out[rows] = (crossing.sum(axis=1) & 1).astype(bool)
        return pd.Series(out)

    return pip


def _bbox_overlap(mx: Column, my: Column) -> Column:
    return (
        (mx >= F.col("xmin")) & (mx <= F.col("xmax"))
        & (my >= F.col("ymin")) & (my <= F.col("ymax"))
    )


def explode_poly_cells(polys: DataFrame, grid_zoom: int) -> DataFrame:
    """Add (gx, gy) rows for every grid cell a polygon's bbox covers.

    Column-expression explode — the polygon side is usually the small one, but
    this also works distributed for large polygon sets."""
    z = F.lit(grid_zoom)
    gx0 = tile_x(z, F.col("xmin"))
    gx1 = tile_x(z, F.col("xmax"))
    gy0 = tile_y(z, F.col("ymax"))  # y grows downward in tile space
    gy1 = tile_y(z, F.col("ymin"))
    return (
        polys.withColumn("gx", F.explode(F.sequence(gx0, gx1)))
        .withColumn("gy", F.explode(F.sequence(gy0, gy1)))
    )


def points_in_polygons(
    points: DataFrame,
    polys: DataFrame,
    how: str = "grid",
    grid_zoom: int = 6,
    broadcast_polys: bool = True,
    mx: str = "mx",
    my: str = "my",
    refine: str = "raycast_auto",
    bcast_budget_bytes: int = 64 << 20,
) -> DataFrame:
    """Inner join: each point row x each polygon containing it.

    points must carry web-mercator columns ``mx, my``; polys must carry
    ``xmin, ymin, xmax, ymax, ring_xs, ring_ys`` (+ any property columns,
    all preserved in the output).  refine options:

    - "raycast_auto"  THE DEFAULT — concave-safe on every path.  One tiny
                      agg over the broadcast dim picks the physical form:
                      raycast_bcast when max ring size >= 256 AND the
                      total ring payload fits ``bcast_budget_bytes``
                      (default 64 MB — the driver-collect + task-closure
                      budget); raycast_udf when rings are big but the
                      payload is over budget (rings join in, still
                      Arrow-batched, no driver materialization); else the
                      raycast expression form (no Arrow round-trip).
    - "convex"        half-plane HOF test, boundary-inclusive — exact ONLY
                      for convex rings; opt-in fast path
    - "raycast"       even-odd HOF fold, concave-safe; right choice for
                      LOW vertex counts (no Arrow round-trip)
    - "raycast_bcast" even-odd Arrow kernel with rings in the UDF closure;
                      the measured winner at real-basemap complexity
                      (2k-vertex rings x 500k points, local[16]: 4.2 s vs
                      17.0 s HOF vs 24.8 s ring-carrying UDF — identical
                      rows; the join carries only the polygon key).
                      Output rows omit ring_xs/ring_ys.  Budget-guarded:
                      if the ring payload exceeds ``bcast_budget_bytes``
                      it falls back to raycast_udf (a million-polygon
                      layer must not OOM the driver or bloat closures).
    - "raycast_udf"   Arrow kernel with ring columns joined in — kept as
                      the measured counter-example; slower than the HOF
                      because every candidate row materializes the ring
    """
    pmx, pmy = F.col(mx), F.col(my)
    if refine in ("raycast_auto", "raycast_bcast"):
        # ONE tiny agg over the broadcast dim sizes the ring payload:
        # 16 bytes/vertex (two float64 arrays) + ~64 B/row dict overhead
        mx_verts, sum_verts, n_polys = polys.agg(
            F.max(F.size("ring_xs")), F.sum(F.size("ring_xs")), F.count(F.lit(1))
        ).collect()[0]
        payload = 16 * (sum_verts or 0) + 64 * (n_polys or 0)
        fits = payload <= bcast_budget_bytes
        if refine == "raycast_auto":
            if (mx_verts or 0) < 256:
                refine = "raycast"
            else:
                refine = "raycast_bcast" if fits else "raycast_udf"
        elif not fits:
            # explicit raycast_bcast over budget: same rows, bounded memory
            refine = "raycast_udf"
    if refine == "raycast_bcast":
        # high-complexity rings: join WITHOUT the ring columns (see
        # make_pip_raycast_closure_udf — copying 10^3+-vertex arrays into
        # every candidate row dominates the refine), rings ride in the UDF
        # closure.  Output rows omit ring_xs/ring_ys.  The collect is
        # budget-guarded above (<= bcast_budget_bytes of ring payload).
        rings = {
            r["polygon_id"]: (r["ring_xs"], r["ring_ys"])
            for r in polys.select("polygon_id", "ring_xs", "ring_ys").collect()
        }
        polys = polys.drop("ring_xs", "ring_ys")
    if how == "broadcast":
        right = F.broadcast(polys) if broadcast_polys else polys
        joined = points.join(right, _bbox_overlap(pmx, pmy), "inner")
    elif how == "grid":
        cells = explode_poly_cells(polys, grid_zoom)
        right = F.broadcast(cells) if broadcast_polys else cells
        z = F.lit(grid_zoom)
        left = points.withColumn("gx", tile_x(z, pmx)).withColumn("gy", tile_y(z, pmy))
        joined = (
            left.join(right, ["gx", "gy"], "inner")
            .filter(_bbox_overlap(pmx, pmy))
            .drop("gx", "gy")
        )
    else:
        raise ValueError(f"unknown join strategy: {how}")
    if refine == "raycast_bcast":
        return joined.filter(
            make_pip_raycast_closure_udf(rings)(F.col("polygon_id"), pmx, pmy)
        )
    if refine == "raycast_udf":
        # Arrow-batched kernel for high-vertex-count rings; requires a
        # unique polygon key column to group identical rings in the batch
        pipc = make_pip_raycast_udf()(
            F.col("polygon_id"), pmx, pmy, F.col("ring_xs"), F.col("ring_ys")
        )
        return joined.filter(pipc)
    pip = pip_convex if refine == "convex" else pip_raycast
    return joined.filter(pip(pmx, pmy, F.col("ring_xs"), F.col("ring_ys")))


def knn_assign(
    points: DataFrame,
    centroids: DataFrame,
    k: int = 1,
    point_key: str = "url",
    search_zoom: int = 5,
    mx: str = "mx",
    my: str = "my",
) -> DataFrame:
    """Assign each point to its k nearest centroids (SURVEY §2.C kNN).

    centroids: DataFrame with (cx, cy) web-mercator columns + identity cols.
    Cell-restricted: candidates limited to centroids within the point's 3x3
    grid-cell neighborhood at ``search_zoom`` (centroids explode to their
    neighborhood, points compute one cell — equi-join, then a row_number
    window ranks by squared distance).  Centroids are broadcast (small side);
    the window partitions by point key, so no global sort.

    No point is ever dropped: points whose neighborhood holds fewer than k
    centroids fall back to a brute-force pass against the broadcast centroid
    set (the 'nearest never drops a point' contract).  The cell restriction
    is exact when centroid spacing <= one cell at search_zoom; the fallback
    also restores exactness for sparse centroid sets, where the nearest
    centroid can sit outside the 3x3 ring entirely."""
    z = F.lit(search_zoom)
    n_minus1 = F.call_function("shiftleft", F.lit(1).cast("long"), z.cast("int")) - 1
    cgx = tile_x(z, F.col("cx"))
    cgy = tile_y(z, F.col("cy"))
    cands = (
        centroids.withColumn(
            "gx", F.explode(F.sequence(F.greatest(cgx - 1, F.lit(0)), F.least(cgx + 1, n_minus1.cast("int"))))
        ).withColumn(
            "gy", F.explode(F.sequence(F.greatest(cgy - 1, F.lit(0)), F.least(cgy + 1, n_minus1.cast("int"))))
        )
    )
    pmx, pmy = F.col(mx), F.col(my)
    point_cols = points.columns
    left = points.withColumn("gx", tile_x(z, pmx)).withColumn("gy", tile_y(z, pmy))
    joined = left.join(F.broadcast(cands), ["gx", "gy"], "left").drop("gx", "gy")
    # per-point candidate count: points with < k neighborhood candidates take
    # the brute-force fallback (typically a tiny minority — sparse regions)
    ncand = F.count(F.col("cx")).over(Window.partitionBy(point_key))
    joined = joined.withColumn("__ncand", ncand)
    enough = joined.filter((F.col("__ncand") >= k) & F.col("cx").isNotNull()).drop("__ncand")
    short = (
        joined.filter(F.col("__ncand") < k)
        .select(*point_cols)
        .dropDuplicates([point_key])
    )
    fallback = short.join(F.broadcast(centroids))
    both = enough.unionByName(fallback, allowMissingColumns=True)
    d2 = (pmx - F.col("cx")) ** 2 + (pmy - F.col("cy")) ** 2
    w = Window.partitionBy(point_key).orderBy(F.col("knn_d2").asc(), F.col("cx").asc(), F.col("cy").asc())
    return (
        both.withColumn("knn_d2", d2)
        .withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= k)
    )


def salt_points(points: DataFrame, buckets: int = 16, mx: str = "mx", my: str = "my") -> DataFrame:
    """Add a deterministic salt column for repartitioning dense spatial
    clusters: repartition(zoom, cell, salt) spreads a hot cell over
    ``buckets`` reducers (north_rule: salted prefixes for dense web regions)."""
    return points.withColumn(
        "salt", F.pmod(F.xxhash64(F.col(mx), F.col(my)), F.lit(buckets)).cast("int")
    )


def dwithin_join(
    points: DataFrame,
    seeds: DataFrame,
    radius: float,
    mx: str = "mx",
    my: str = "my",
    seed_mx: str = "cx",
    seed_my: str = "cy",
    grid_zoom: int | None = None,
    broadcast_seeds: bool = True,
) -> DataFrame:
    """Distance-band join: every (point, seed) pair with planar Euclidean
    distance <= ``radius`` mercator meters — PostGIS ``ST_DWithin(way, seed,
    radius)`` semantics on a projected SRS (the reference's templates run
    arbitrary PostGIS predicates, reference tilekiln/definition.py:42-77;
    proximity layers are the canonical non-bbox one).

    Distributed shape (same filter+refine discipline as the PIP join):

    - ``grid_zoom`` is derived so one grid cell side >= radius; then any
      point within ``radius`` of a seed lies in the seed's 3x3 cell
      neighborhood — the explode is BOUNDED at 9 cells per seed, and the
      candidate join is a plain hash/broadcast equi-join on (gx, gy).
      No cross join at any scale.
    - the exact residual compares SQUARED distance against radius^2 —
      multiply/add only (IEEE exactly-rounded, so the boundary decision is
      bit-identical across engines and no sqrt runs before the filter).
    - seeds broadcast by default (the dimension side); pass
      ``broadcast_seeds=False`` for large seed sets — the equi-join then
      shuffles on the cell key and AQE handles dense-cell skew.

    Returns all point columns + the seed's identity columns + ``dist``
    (exact Euclidean distance, un-rounded; callers round for display).
    """
    if grid_zoom is None:
        # largest zoom whose cell side still covers the radius
        world = 2.0 * HALF_WORLD
        grid_zoom = max(0, min(15, int(np.floor(np.log2(world / radius)))))
    z = F.lit(grid_zoom)
    n_minus1 = F.call_function("shiftleft", F.lit(1).cast("long"), z.cast("int")) - 1
    sgx = tile_x(z, F.col(seed_mx))
    sgy = tile_y(z, F.col(seed_my))
    cands = (
        seeds.withColumn(
            "gx",
            F.explode(F.sequence(F.greatest(sgx - 1, F.lit(0)), F.least(sgx + 1, n_minus1.cast("int")))),
        ).withColumn(
            "gy",
            F.explode(F.sequence(F.greatest(sgy - 1, F.lit(0)), F.least(sgy + 1, n_minus1.cast("int")))),
        )
    )
    if broadcast_seeds:
        cands = F.broadcast(cands)
    pmx, pmy = F.col(mx), F.col(my)
    left = points.withColumn("gx", tile_x(z, pmx)).withColumn("gy", tile_y(z, pmy))
    d2 = (pmx - F.col(seed_mx)) * (pmx - F.col(seed_mx)) + (pmy - F.col(seed_my)) * (pmy - F.col(seed_my))
    return (
        left.join(cands, ["gx", "gy"], "inner")
        .where(d2 <= F.lit(float(radius) * float(radius)))
        .withColumn("dist", F.sqrt(d2))
        .drop("gx", "gy")
    )


def dwithin_geography_join(
    points: DataFrame,
    seeds: DataFrame,
    radius_m: float,
    lat: str = "lat",
    lon: str = "lon",
    seed_lat: str = "slat",
    seed_lon: str = "slon",
    polar_lat: float = 88.0,
    broadcast_seeds: bool = True,
) -> DataFrame:
    """Geography distance-band join: every (point, seed) pair whose
    GREAT-CIRCLE distance is <= ``radius_m`` meters — PostGIS
    ``ST_DWithin(geography, geography, r)`` semantics on the mean sphere
    (functions/geodesic.py; the reference's templates run arbitrary PostGIS
    SQL, reference tilekiln/definition.py:42-77).

    Distributed shape (filter + refine, like the planar ``dwithin_join``,
    but the grid lives in lat/lon degrees because mercator distances
    inflate by sec(lat) and a single mercator radius would be wrong):

    - square degree grid with cell side = radius in LATITUDE degrees; a
      matching point is always within one lat row of the seed, so the seed
      explodes rows r-1..r+1.
    - longitude shrinks by cos(lat), so the seed widens its column window
      to ``k = ceil(sec(band_max_lat))`` cells per side — BOUNDED because
      bands touching ``polar_lat`` route to a single polar-cap bucket
      instead (sentinel column -1 on both sides; sec() never exceeds
      sec(polar_lat) ~ 29).  Columns wrap modulo the column count, so the
      +-180 seam joins correctly.
    - exact residual: haversine(point, seed) <= radius_m.  Trig, not
      multiply-add, so the boundary is NOT bit-stable across engines —
      callers pick radii off any pair distance (the same discipline as
      cosine ranking cuts).

    Seeds broadcast by default (dimension side).  Returns all point
    columns + seed identity columns + ``dist_m``."""
    from tilekiln_spark.functions.geodesic import METERS_PER_DEG, haversine_m

    r_deg = float(radius_m) / METERS_PER_DEG
    cell = r_deg
    ncols = max(int(np.ceil(360.0 / cell)), 1)
    nrows = max(int(np.ceil(180.0 / cell)), 1)

    def row_of(latc: Column) -> Column:
        return F.least(
            F.greatest(F.floor((latc + F.lit(90.0)) / F.lit(cell)).cast("int"), F.lit(0)),
            F.lit(nrows - 1),
        )

    def col_of(lonc: Column) -> Column:
        return F.pmod(F.floor((lonc + F.lit(180.0)) / F.lit(cell)).cast("int"), F.lit(ncols))

    plat, plon = F.col(lat), F.col(lon)
    p_polar = F.abs(plat) >= F.lit(polar_lat)
    left = points.withColumn("grow", row_of(plat)).withColumn(
        "gcol", F.when(p_polar, F.lit(-1)).otherwise(col_of(plon))
    )

    slat_c, slon_c = F.col(seed_lat), F.col(seed_lon)
    srow = row_of(slat_c)
    # lat span of the 3-row neighborhood; its max |lat| bounds sec(lat) for
    # every candidate point (clamped at polar_lat — beyond that the polar
    # bucket takes over)
    lat_lo = (srow - 1).cast("double") * F.lit(cell) - F.lit(90.0)
    lat_hi = (srow + 2).cast("double") * F.lit(cell) - F.lit(90.0)
    maxabs = F.least(F.greatest(F.abs(lat_lo), F.abs(lat_hi)), F.lit(polar_lat))
    # exact lon-window inversion of the haversine lower bound
    #   d >= 2R asin( sqrt(cos(lat1) cos(lat2)) * sin(|dlon|/2) ):
    # within the bands cos(lat) >= cos(maxabs), so d <= r implies
    #   |dlon| <= 2 asin( min(1, sin(r/2R) / cos(maxabs)) ).
    # (A flat-earth sec(lat) window under-covers near the poles — the asin
    # inflation is unbounded as its argument approaches 1.)
    from tilekiln_spark.functions.geodesic import EARTH_RADIUS_M

    sin_half = float(np.sin(radius_m / (2.0 * EARTH_RADIUS_M)))
    ratio = F.least(F.lit(sin_half) / F.cos(F.radians(maxabs)), F.lit(1.0))
    w_deg = F.degrees(F.lit(2.0) * F.asin(ratio))
    k = (F.ceil(w_deg / F.lit(cell)) + 1).cast("int")
    scol = col_of(slon_c)
    rows_exp = F.explode(
        F.sequence(F.greatest(srow - 1, F.lit(0)), F.least(srow + 1, F.lit(nrows - 1)))
    )
    # a window wider than the circle degrades to ALL columns (sequence 0..
    # ncols-1 stays duplicate-free after pmod, where a folded scol+-k window
    # would emit duplicate candidate rows and double join pairs)
    kcap = (ncols - 1) // 2
    col_seq = F.when(
        k > F.lit(kcap), F.sequence(F.lit(0), F.lit(ncols - 1))
    ).otherwise(F.sequence(scol - k, scol + k))
    cands = (
        seeds.withColumn("grow", rows_exp)
        .withColumn("gcol", F.explode(col_seq))
        .withColumn("gcol", F.pmod(F.col("gcol"), F.lit(ncols)))
    )
    s_polar = (F.abs(slat_c) + F.lit(r_deg)) >= F.lit(polar_lat)
    polar_cands = (
        seeds.where(s_polar)
        .withColumn("grow", rows_exp)
        .withColumn("gcol", F.lit(-1))
    )
    cands = cands.unionByName(polar_cands)
    if broadcast_seeds:
        cands = F.broadcast(cands)
    d = haversine_m(plat, plon, slat_c, slon_c)
    return (
        left.join(cands, ["grow", "gcol"], "inner")
        .where(d <= F.lit(float(radius_m)))
        .withColumn("dist_m", d)
        .drop("grow", "gcol")
    )


def _rings_intersect_np(ax, ay, bx, by) -> bool:
    """Exact simple-ring ST_Intersects test (PostGIS semantics: boundaries
    touching counts).  True iff any vertex of one ring lies inside the
    other (even-odd raycast — covers full containment) or any edge pair
    crosses/touches (covers partial overlap with no contained vertex, e.g.
    a plus-sign cross).  All multiply/subtract/compare in the same order as
    the generated SQL twin (functions/geometry.py rings_intersect_sql), so
    the decision is bit-identical across engines; the raycast division only
    runs where the straddle condition holds (never zero there)."""

    def any_vertex_in(px, py, rx, ry):
        x1, y1 = rx, ry
        x2, y2 = np.roll(rx, -1), np.roll(ry, -1)
        PX, PY = px[:, None], py[:, None]
        straddle = (y1[None] > PY) != (y2[None] > PY)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x1[None] + (PY - y1[None]) * (x2[None] - x1[None]) / (y2[None] - y1[None])
        crossings = (straddle & (PX < xint)).sum(axis=1)
        return bool((crossings % 2 == 1).any())

    if any_vertex_in(ax, ay, bx, by) or any_vertex_in(bx, by, ax, ay):
        return True
    p1x, p1y = ax[:, None], ay[:, None]
    p2x, p2y = np.roll(ax, -1)[:, None], np.roll(ay, -1)[:, None]
    q1x, q1y = bx[None, :], by[None, :]
    q2x, q2y = np.roll(bx, -1)[None, :], np.roll(by, -1)[None, :]

    def orient(ox, oy, dx_, dy_, px_, py_):
        return (dx_ - ox) * (py_ - oy) - (dy_ - oy) * (px_ - ox)

    o1 = orient(p1x, p1y, p2x, p2y, q1x, q1y)
    o2 = orient(p1x, p1y, p2x, p2y, q2x, q2y)
    o3 = orient(q1x, q1y, q2x, q2y, p1x, p1y)
    o4 = orient(q1x, q1y, q2x, q2y, p2x, p2y)
    proper = (((o1 > 0) & (o2 < 0)) | ((o1 < 0) & (o2 > 0))) & (
        ((o3 > 0) & (o4 < 0)) | ((o3 < 0) & (o4 > 0))
    )
    if proper.any():
        return True

    def onseg(ox, oy, dx_, dy_, px_, py_, o):
        return (
            (o == 0)
            & (px_ >= np.minimum(ox, dx_))
            & (px_ <= np.maximum(ox, dx_))
            & (py_ >= np.minimum(oy, dy_))
            & (py_ <= np.maximum(oy, dy_))
        )

    touch = (
        onseg(p1x, p1y, p2x, p2y, q1x, q1y, o1)
        | onseg(p1x, p1y, p2x, p2y, q2x, q2y, o2)
        | onseg(q1x, q1y, q2x, q2y, p1x, p1y, o3)
        | onseg(q1x, q1y, q2x, q2y, p2x, p2y, o4)
    )
    return bool(touch.any())


def make_rings_intersect_udf():
    """Arrow-batched boolean kernel over candidate (ring A, ring B) pairs."""

    @F.pandas_udf("boolean")
    def ri(axs: pd.Series, ays: pd.Series, bxs: pd.Series, bys: pd.Series) -> pd.Series:
        out = np.zeros(len(axs), dtype=bool)
        for i in range(len(axs)):
            out[i] = _rings_intersect_np(
                np.asarray(axs.iloc[i], dtype=np.float64),
                np.asarray(ays.iloc[i], dtype=np.float64),
                np.asarray(bxs.iloc[i], dtype=np.float64),
                np.asarray(bys.iloc[i], dtype=np.float64),
            )
        return pd.Series(out)

    return ri


def polygons_intersect_join(
    polys_a: DataFrame,
    polys_b: DataFrame,
    grid_zoom: int = 4,
    broadcast_b: bool = True,
    max_cells_per_poly: int = 64,
) -> DataFrame:
    """Polygon x polygon ST_Intersects join (PostGIS ``ST_Intersects(a.way,
    b.way)`` — the reference's templates run arbitrary PostGIS joins,
    reference tilekiln/definition.py:42-77).

    Both frames carry ``polygon_id, xmin, ymin, xmax, ymax, ring_xs,
    ring_ys``; side B's columns come back ``b_``-prefixed.

    Distributed shape (PBSM — partition-based spatial merge):

    - both sides explode to the grid cells their bbox covers; the candidate
      join is a hash/broadcast equi-join on (gx, gy) — no cross join.
    - duplicate candidates (bboxes sharing several cells) are killed by the
      REPORTING-CELL rule, computed per joined row with no extra shuffle:
      a pair counts only in the cell containing the top-left corner of the
      two bboxes' intersection.
    - WHALE polygons (bbox covering more than ``max_cells_per_poly`` cells
      — continents, oceans) never enter the explode: they route to
      broadcast bbox-overlap side joins (whales are FEW by nature; a
      continent exploding to 10^5 cells is the classic PBSM blowup).  The
      three paths — small x small on the grid, whale-A x all-B, small-A x
      whale-B — partition the pair space, so no cross-path dedup is needed.
    - exact refine: the Arrow-batched ring-pair kernel (vertex containment
      either way + edge crossing/touching)."""
    candidates = _pbsm_candidates(
        polys_a, polys_b, grid_zoom, broadcast_b, max_cells_per_poly
    )
    hit = make_rings_intersect_udf()(
        F.col("ring_xs"), F.col("ring_ys"), F.col("b_ring_xs"), F.col("b_ring_ys")
    )
    return candidates.filter(hit)


def _pbsm_candidates(
    polys_a: DataFrame,
    polys_b: DataFrame,
    grid_zoom: int,
    broadcast_b: bool,
    max_cells_per_poly: int,
) -> DataFrame:
    """THE candidate-pair stage shared by the polygon and polyline
    intersect joins: grid explode + (gx, gy) equi-join + reporting-cell
    dedup + whale bbox-overlap routing.  Emits every bbox-overlapping
    (A row, B row) pair exactly once, B columns ``b_``-prefixed; the
    caller applies its exact-geometry refine."""
    b = polys_b
    for c in b.columns:
        b = b.withColumnRenamed(c, f"b_{c}")

    def ncells(pre: str) -> Column:
        z = F.lit(grid_zoom)
        return (
            (tile_x(z, F.col(f"{pre}xmax")) - tile_x(z, F.col(f"{pre}xmin")) + 1).cast("long")
            * (tile_y(z, F.col(f"{pre}ymin")) - tile_y(z, F.col(f"{pre}ymax")) + 1).cast("long")
        )

    a_small = polys_a.filter(ncells("") <= max_cells_per_poly)
    a_whale = polys_a.filter(ncells("") > max_cells_per_poly)
    b_small = b.filter(ncells("b_") <= max_cells_per_poly)
    b_whale = b.filter(ncells("b_") > max_cells_per_poly)

    a_cells = explode_poly_cells(a_small, grid_zoom)
    b_cells = explode_poly_cells(
        b_small.withColumnRenamed("b_xmin", "xmin")
        .withColumnRenamed("b_xmax", "xmax")
        .withColumnRenamed("b_ymin", "ymin")
        .withColumnRenamed("b_ymax", "ymax"),
        grid_zoom,
    ).withColumnsRenamed({"xmin": "b_xmin", "xmax": "b_xmax", "ymin": "b_ymin", "ymax": "b_ymax"})
    if broadcast_b:
        b_cells = F.broadcast(b_cells)
    z = F.lit(grid_zoom)
    overlap = (
        (F.col("xmin") <= F.col("b_xmax"))
        & (F.col("b_xmin") <= F.col("xmax"))
        & (F.col("ymin") <= F.col("b_ymax"))
        & (F.col("b_ymin") <= F.col("ymax"))
    )
    report = (F.col("gx") == tile_x(z, F.greatest("xmin", "b_xmin"))) & (
        F.col("gy") == tile_y(z, F.least("ymax", "b_ymax"))
    )
    pairs = (
        a_cells.join(b_cells, ["gx", "gy"], "inner")
        .filter(overlap & report)
        .drop("gx", "gy")
    )
    # whale paths: bbox-overlap joins with the FEW whale rows broadcast as
    # the build side (the other side streams at full scale)
    pairs = pairs.unionByName(b.join(F.broadcast(a_whale), overlap, "inner"))
    pairs = pairs.unionByName(a_small.join(F.broadcast(b_whale), overlap, "inner"))
    return pairs


def knn_geography_assign(
    points: DataFrame,
    seeds: DataFrame,
    k: int = 1,
    point_key: str = "doc_id",
    lat: str = "lat",
    lon: str = "lon",
    seed_lat: str = "slat",
    seed_lon: str = "slon",
) -> DataFrame:
    """k nearest seeds per point by GREAT-CIRCLE distance (geography kNN —
    PostGIS `ORDER BY way::geography <-> seed LIMIT k` semantics).

    Broadcast-dim shape: seeds are the small side by contract (facility /
    centroid sets); candidates = the full broadcast set, ranked per point by
    a row_number window — no global sort, one shuffle on the point key.
    For seed sets too large to broadcast, prune with
    ``dwithin_geography_join`` at a radius bound first and fall back per
    unmatched point (the planar ``knn_assign`` pattern).

    The window orders by haversine ROUNDED to 1e-6 m with a deterministic
    seed tiebreak — cross-engine libm can disagree in the last ulp, and
    ranking must not hinge on it (house convention: round before ORDER BY).
    Returns point columns + seed columns + ``dist_m`` (un-rounded) +
    ``knn_rank``."""
    from tilekiln_spark.functions.geodesic import haversine_m

    d = haversine_m(F.col(lat), F.col(lon), F.col(seed_lat), F.col(seed_lon))
    w = Window.partitionBy(point_key).orderBy(
        F.round(F.col("dist_m"), 6).asc(), F.col(seed_lat).asc(), F.col(seed_lon).asc()
    )
    return (
        points.join(F.broadcast(seeds))
        .withColumn("dist_m", d)
        .withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= k)
    )


def _ring_is_simple_np(xs, ys) -> bool:
    """ST_IsSimple for a closed ring stored without the repeated closing
    vertex: no two NON-ADJACENT edges may cross or touch, and no adjacent
    edge pair may double back on itself (a collinear spike).  Same
    orientation/on-segment arithmetic as _rings_intersect_np, so the
    generated SQL twin (functions/geometry.py ring_is_simple_sql) decides
    bit-identically."""
    n = len(xs)
    if n < 3:
        return False
    p1x, p1y = xs[:, None], ys[:, None]
    p2x, p2y = np.roll(xs, -1)[:, None], np.roll(ys, -1)[:, None]
    q1x, q1y = xs[None, :], ys[None, :]
    q2x, q2y = np.roll(xs, -1)[None, :], np.roll(ys, -1)[None, :]

    def orient(ox, oy, dx_, dy_, px_, py_):
        return (dx_ - ox) * (py_ - oy) - (dy_ - oy) * (px_ - ox)

    o1 = orient(p1x, p1y, p2x, p2y, q1x, q1y)
    o2 = orient(p1x, p1y, p2x, p2y, q2x, q2y)
    o3 = orient(q1x, q1y, q2x, q2y, p1x, p1y)
    o4 = orient(q1x, q1y, q2x, q2y, p2x, p2y)
    proper = (((o1 > 0) & (o2 < 0)) | ((o1 < 0) & (o2 > 0))) & (
        ((o3 > 0) & (o4 < 0)) | ((o3 < 0) & (o4 > 0))
    )

    def onseg(ox, oy, dx_, dy_, px_, py_, o):
        return (
            (o == 0)
            & (px_ >= np.minimum(ox, dx_))
            & (px_ <= np.maximum(ox, dx_))
            & (py_ >= np.minimum(oy, dy_))
            & (py_ <= np.maximum(oy, dy_))
        )

    touch = (
        onseg(p1x, p1y, p2x, p2y, q1x, q1y, o1)
        | onseg(p1x, p1y, p2x, p2y, q2x, q2y, o2)
        | onseg(q1x, q1y, q2x, q2y, p1x, p1y, o3)
        | onseg(q1x, q1y, q2x, q2y, p2x, p2y, o4)
    )
    i = np.arange(n)[:, None]
    j = np.arange(n)[None, :]
    nonadj = (j > i + 1) & ~((i == 0) & (j == n - 1))
    if bool(((proper | touch) & nonadj).any()):
        return False
    # adjacent spike: edge i+1 doubles back along edge i (collinear AND the
    # next vertex heads back toward the previous one past the shared point)
    ax, ay = xs, ys
    bx, by = np.roll(xs, -1), np.roll(ys, -1)
    cx, cy = np.roll(xs, -2), np.roll(ys, -2)
    turn = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    dot = (ax - bx) * (cx - bx) + (ay - by) * (cy - by)
    return not bool(((turn == 0) & (dot > 0)).any())


def make_ring_is_simple_udf():
    """Arrow-batched ST_IsSimple over ring array columns."""

    @F.pandas_udf("boolean")
    def simple(xs: pd.Series, ys: pd.Series) -> pd.Series:
        out = np.zeros(len(xs), dtype=bool)
        for i in range(len(xs)):
            if xs.iloc[i] is None or ys.iloc[i] is None:
                out[i] = False
                continue
            out[i] = _ring_is_simple_np(
                np.asarray(xs.iloc[i], dtype=np.float64),
                np.asarray(ys.iloc[i], dtype=np.float64),
            )
        return pd.Series(out)

    return simple


def _chains_intersect_np(ax, ay, bx, by) -> bool:
    """Exact OPEN-polyline ST_Intersects test: true iff any edge pair
    (consecutive-vertex segments, no wrap edge) properly crosses or
    touches (an endpoint on the other segment — PostGIS counts boundary
    contact).  Same orient/onseg arithmetic order as
    :func:`_rings_intersect_np`, so the generated SQL twin
    (functions/geometry.py chains_intersect_sql) decides bit-identically.
    No containment half: a line cannot contain another's interior."""
    if len(ax) < 2 or len(bx) < 2:
        return False
    p1x, p1y = ax[:-1, None], ay[:-1, None]
    p2x, p2y = ax[1:, None], ay[1:, None]
    q1x, q1y = bx[None, :-1], by[None, :-1]
    q2x, q2y = bx[None, 1:], by[None, 1:]

    def orient(ox, oy, dx_, dy_, px_, py_):
        return (dx_ - ox) * (py_ - oy) - (dy_ - oy) * (px_ - ox)

    o1 = orient(p1x, p1y, p2x, p2y, q1x, q1y)
    o2 = orient(p1x, p1y, p2x, p2y, q2x, q2y)
    o3 = orient(q1x, q1y, q2x, q2y, p1x, p1y)
    o4 = orient(q1x, q1y, q2x, q2y, p2x, p2y)
    proper = (((o1 > 0) & (o2 < 0)) | ((o1 < 0) & (o2 > 0))) & (
        ((o3 > 0) & (o4 < 0)) | ((o3 < 0) & (o4 > 0))
    )
    if proper.any():
        return True

    def onseg(ox, oy, dx_, dy_, px_, py_, o):
        return (
            (o == 0)
            & (px_ >= np.minimum(ox, dx_))
            & (px_ <= np.maximum(ox, dx_))
            & (py_ >= np.minimum(oy, dy_))
            & (py_ <= np.maximum(oy, dy_))
        )

    touch = (
        onseg(p1x, p1y, p2x, p2y, q1x, q1y, o1)
        | onseg(p1x, p1y, p2x, p2y, q2x, q2y, o2)
        | onseg(q1x, q1y, q2x, q2y, p1x, p1y, o3)
        | onseg(q1x, q1y, q2x, q2y, p2x, p2y, o4)
    )
    return bool(touch.any())


def make_chains_intersect_udf():
    """Arrow-batched boolean kernel over candidate (chain A, chain B) pairs."""

    @F.pandas_udf("boolean")
    def ci(axs: pd.Series, ays: pd.Series, bxs: pd.Series, bys: pd.Series) -> pd.Series:
        out = np.zeros(len(axs), dtype=bool)
        for i in range(len(axs)):
            out[i] = _chains_intersect_np(
                np.asarray(axs.iloc[i], dtype=np.float64),
                np.asarray(ays.iloc[i], dtype=np.float64),
                np.asarray(bxs.iloc[i], dtype=np.float64),
                np.asarray(bys.iloc[i], dtype=np.float64),
            )
        return pd.Series(out)

    return ci


def lines_intersect_join(
    lines_a: DataFrame,
    lines_b: DataFrame,
    grid_zoom: int = 4,
    broadcast_b: bool = True,
    max_cells_per_poly: int = 64,
) -> DataFrame:
    """Polyline x polyline ST_Intersects/ST_Crosses-class join (PostGIS
    ``ST_Intersects(a.way, b.way)`` over line tables — road/rail/river
    crossings; the reference's templates run arbitrary PostGIS joins,
    reference tilekiln/definition.py:42-77).

    Same frames and distributed shape as :func:`polygons_intersect_join`
    (PBSM cell explode, reporting-cell dedup, whale routing — the vertex
    chains ride the same ``polygon_id/ring_xs/ring_ys`` columns with the
    chain bbox precomputed), but the exact refine is the OPEN-chain
    edge-pair kernel: no wrap edge, no containment raycast."""
    candidates = _pbsm_candidates(
        lines_a, lines_b, grid_zoom, broadcast_b, max_cells_per_poly
    )
    hit = make_chains_intersect_udf()(
        F.col("ring_xs"), F.col("ring_ys"), F.col("b_ring_xs"), F.col("b_ring_ys")
    )
    return candidates.filter(hit)


def polygon_tile_cover(polys: DataFrame, zoom: int) -> DataFrame:
    """EXACT tile cover of each polygon: the z-``zoom`` cells whose
    RECTANGLE intersects the ring — not merely its bbox (PostGIS
    ``ST_SquareGrid(...) JOIN ON ST_Intersects`` / tile-cover listing; a
    concave polygon's bbox cover includes cells its interior never
    touches).  Shape: the bbox cell explode prunes candidates, then the
    cell rectangle rides as a literal 4-vertex ring through the SAME
    Arrow ring-pair intersect kernel the polygon joins use — covers
    cell-inside-polygon, polygon-inside-cell, and boundary-crossing cases
    in one test.  Returns [polygon_id, gx, gy].

    At 100 TB: explode factor = bbox cells (tunable via zoom), refine is
    map-only, output partitions naturally by (gx, gy)."""
    from tilekiln_spark.tiles.core import HALF_WORLD

    length = 2.0 * HALF_WORLD / (1 << zoom)
    # candidate explode with a ONE-CELL margin beyond the bbox cover: a
    # ring lying exactly ON a cell boundary TOUCHES the neighbor cell
    # (ST_Intersects counts boundary contact) but floor() assigns the
    # boundary to the far cell — the margin admits those neighbors and the
    # exact refine keeps only true intersections
    z = F.lit(zoom)
    nmax = F.lit((1 << zoom) - 1)
    gx0 = F.greatest(F.lit(0), tile_x(z, F.col("xmin")) - 1)
    gx1 = F.least(nmax, tile_x(z, F.col("xmax")) + 1)
    gy0 = F.greatest(F.lit(0), tile_y(z, F.col("ymax")) - 1)
    gy1 = F.least(nmax, tile_y(z, F.col("ymin")) + 1)
    cells = polys.withColumn("gx", F.explode(F.sequence(gx0, gx1))).withColumn(
        "gy", F.explode(F.sequence(gy0, gy1))
    )
    x0 = F.lit(-HALF_WORLD) + F.col("gx").cast("double") * F.lit(length)
    y1 = F.lit(HALF_WORLD) - F.col("gy").cast("double") * F.lit(length)
    x1 = x0 + F.lit(length)
    y0 = y1 - F.lit(length)
    rect_xs = F.array(x0, x1, x1, x0)
    rect_ys = F.array(y0, y0, y1, y1)
    hit = make_rings_intersect_udf()(
        F.col("ring_xs"), F.col("ring_ys"), rect_xs, rect_ys
    )
    return cells.filter(hit).select("polygon_id", "gx", "gy")


def generate_points(
    polys: DataFrame,
    n: int,
    candidates_per_point: int = 16,
    seed: int = 1,
) -> DataFrame:
    """Deterministic ``ST_GeneratePoints(polygon, n)``: up to ``n`` points
    inside each polygon by rejection sampling over its bbox — with a
    REPLAYABLE generator instead of engine randomness, so a SQL twin can
    re-derive every coordinate (PostGIS's seeded variant has the same
    goal; the training-data use is synthetic spatial sampling).

    Generator: candidate k of polygon p hashes (p·K + k)·2654435761 mod
    2³², then one multiplicative LCG step (·48271 mod 2³¹⁻¹ style modulus
    2³¹) for the second coordinate — all arithmetic stays on integers
    < 2⁵³ represented in float64 (mod spelled v − floor(v/m)·m), so both
    engines fold the identical doubles.  Candidates explode map-only
    (K = ``candidates_per_point``·n per polygon, a compile-time constant),
    the even-odd raycast keeps interior hits, and a row_number over the
    candidate index takes the FIRST ``n`` accepted — deterministic and
    engine-order-independent.  Polygons too thin for the budget yield
    fewer points (documented; raise ``candidates_per_point``).

    Returns [polygon_id, pt_seq, px, py]."""
    K = candidates_per_point * n
    two32, two31 = 4294967296.0, 2147483648.0
    pid = F.col("polygon_id").cast("double")
    k = F.explode(F.sequence(F.lit(1), F.lit(K))).alias("k")
    cand = polys.select(
        "polygon_id", "xmin", "ymin", "xmax", "ymax", "ring_xs", "ring_ys", k
    )
    base = (pid * F.lit(float(K)) + F.col("k").cast("double") + F.lit(float(seed))) * F.lit(
        2654435761.0
    )
    h1 = base - F.floor(base / F.lit(two32)) * F.lit(two32)
    step = h1 * F.lit(48271.0)
    h2 = step - F.floor(step / F.lit(two31)) * F.lit(two31)
    u = h1 / F.lit(two32)
    v = h2 / F.lit(two31)
    px = F.col("xmin") + u * (F.col("xmax") - F.col("xmin"))
    py = F.col("ymin") + v * (F.col("ymax") - F.col("ymin"))
    hits = (
        cand.withColumn("px", px)
        .withColumn("py", py)
        .filter(pip_raycast(F.col("px"), F.col("py"), F.col("ring_xs"), F.col("ring_ys")))
    )
    w = Window.partitionBy("polygon_id").orderBy("k")
    return (
        hits.withColumn("pt_seq", F.row_number().over(w))
        .filter(F.col("pt_seq") <= n)
        .select("polygon_id", "pt_seq", "px", "py")
    )


def _chain_in_ring_np(lx, ly, rx, ry) -> bool:
    """Exact ``ST_ContainsProperly(polygon, line)`` test over a candidate
    (open chain, simple exterior ring) pair: the chain lies entirely in the
    ring's INTERIOR.  Decision: (1) no chain edge crosses OR touches any
    ring edge (boundary contact excludes — the strict/proper variant, a
    deterministic contract where PostGIS's ST_Contains admits boundary
    touches); (2) given a boundary-free chain, the whole chain lies in one
    component of the plane, so ONE even-odd raycast on the first vertex
    decides.  Same multiply/subtract/compare order as the generated SQL
    twin (functions/geometry.py chain_in_ring_sql) — bit-identical
    decisions across engines."""
    if len(lx) < 2 or len(rx) < 3:
        return False
    p1x, p1y = lx[:-1, None], ly[:-1, None]
    p2x, p2y = lx[1:, None], ly[1:, None]
    q1x, q1y = rx[None, :], ry[None, :]
    q2x, q2y = np.roll(rx, -1)[None, :], np.roll(ry, -1)[None, :]

    def orient(ox, oy, dx_, dy_, px_, py_):
        return (dx_ - ox) * (py_ - oy) - (dy_ - oy) * (px_ - ox)

    o1 = orient(p1x, p1y, p2x, p2y, q1x, q1y)
    o2 = orient(p1x, p1y, p2x, p2y, q2x, q2y)
    o3 = orient(q1x, q1y, q2x, q2y, p1x, p1y)
    o4 = orient(q1x, q1y, q2x, q2y, p2x, p2y)
    proper = (((o1 > 0) & (o2 < 0)) | ((o1 < 0) & (o2 > 0))) & (
        ((o3 > 0) & (o4 < 0)) | ((o3 < 0) & (o4 > 0))
    )
    if proper.any():
        return False

    def onseg(ox, oy, dx_, dy_, px_, py_, o):
        return (
            (o == 0)
            & (px_ >= np.minimum(ox, dx_))
            & (px_ <= np.maximum(ox, dx_))
            & (py_ >= np.minimum(oy, dy_))
            & (py_ <= np.maximum(oy, dy_))
        )

    touch = (
        onseg(p1x, p1y, p2x, p2y, q1x, q1y, o1)
        | onseg(p1x, p1y, p2x, p2y, q2x, q2y, o2)
        | onseg(q1x, q1y, q2x, q2y, p1x, p1y, o3)
        | onseg(q1x, q1y, q2x, q2y, p2x, p2y, o4)
    )
    if touch.any():
        return False
    # boundary-free: one raycast on vertex 0 decides containment
    x1, y1 = rx, ry
    x2, y2 = np.roll(rx, -1), np.roll(ry, -1)
    straddle = (y1 > ly[0]) != (y2 > ly[0])
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1 + (ly[0] - y1) * (x2 - x1) / (y2 - y1)
    return bool(((straddle & (lx[0] < xint)).sum() % 2) == 1)


def make_chain_in_ring_udf():
    """Arrow-batched boolean kernel over candidate (chain, ring) pairs."""

    @F.pandas_udf("boolean")
    def cr(lxs: pd.Series, lys: pd.Series, rxs: pd.Series, rys: pd.Series) -> pd.Series:
        out = np.zeros(len(lxs), dtype=bool)
        for i in range(len(lxs)):
            lx, ly, rx, ry = lxs.iloc[i], lys.iloc[i], rxs.iloc[i], rys.iloc[i]
            if lx is None or ly is None or rx is None or ry is None:
                continue  # stays False — matches the SQL twin's NULL guard
            out[i] = _chain_in_ring_np(
                np.asarray(lx, dtype=np.float64),
                np.asarray(ly, dtype=np.float64),
                np.asarray(rx, dtype=np.float64),
                np.asarray(ry, dtype=np.float64),
            )
        return pd.Series(out)

    return cr


def lines_in_polygons_join(
    lines: DataFrame,
    polys: DataFrame,
    grid_zoom: int = 4,
    broadcast_polys: bool = True,
    max_cells_per_poly: int = 64,
) -> DataFrame:
    """Polyline-within-polygon join — the "roads inside each admin area"
    overlay (PostGIS ``ST_Contains(p.way, l.way)`` class, here the strict
    ST_ContainsProperly variant: boundary contact excludes; the reference's
    templates run arbitrary PostGIS joins, reference
    tilekiln/definition.py:42-77).

    Lines ride the shared chain layout (``polygon_id/ring_xs/ring_ys`` +
    precomputed bbox); polygons come back ``b_``-prefixed.  Distributed
    shape: the SAME PBSM candidate stage as the intersect joins (grid
    explode, (gx, gy) equi-join, reporting-cell dedup, whale bbox-overlap
    routing — containment implies bbox overlap, so candidates are
    complete); exact refine is the Arrow chain-in-ring kernel (edge-pair
    boundary test + ONE raycast, since a boundary-free chain cannot change
    sides)."""
    candidates = _pbsm_candidates(
        lines, polys, grid_zoom, broadcast_polys, max_cells_per_poly
    )
    hit = make_chain_in_ring_udf()(
        F.col("ring_xs"), F.col("ring_ys"), F.col("b_ring_xs"), F.col("b_ring_ys")
    )
    return candidates.filter(hit)


def _chain_ring_clip_len_np(lx, ly, rx, ry) -> float:
    """Exact ``ST_Length(ST_Intersection(line, polygon))`` over a candidate
    (open chain, simple exterior ring) pair — the classic overlay measure
    ("km of road inside each admin area").  Per chain edge: collect the
    parameters t of every proper segment intersection with a ring edge,
    cut [0, 1] at those ts, classify each sub-interval by an even-odd
    raycast on its midpoint, and sum inside-interval lengths.  All
    divisions/compares in the same form and order as the generated SQL
    twin (functions/geometry.py chain_ring_clip_len_sql) — the interval
    cuts and inside decisions are bit-identical across engines (the final
    float sum is rounded by callers).  Contract caveat (documented, fixture
    avoids it): chain spans COLLINEAR with a ring edge register no cut
    (d == 0) and classify by their midpoint like any other span."""
    if len(lx) < 2 or len(rx) < 3:
        return 0.0
    rx2, ry2 = np.roll(rx, -1), np.roll(ry, -1)
    fx, fy = rx2 - rx, ry2 - ry
    total = 0.0
    for i in range(len(lx) - 1):
        p1x, p1y = lx[i], ly[i]
        ex, ey = lx[i + 1] - p1x, ly[i + 1] - p1y
        wx, wy = rx - p1x, ry - p1y
        d = ex * fy - ey * fx
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (wx * fy - wy * fx) / d
            u = (wx * ey - wy * ex) / d
        ok = (d != 0) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
        ts = np.sort(np.concatenate([[0.0, 1.0], t[ok]]))
        el = np.sqrt(ex * ex + ey * ey)
        for k in range(len(ts) - 1):
            a, b = ts[k], ts[k + 1]
            if b <= a:
                continue
            mid = (a + b) / 2
            mx_, my_ = p1x + mid * ex, p1y + mid * ey
            straddle = (ry > my_) != (ry2 > my_)
            with np.errstate(divide="ignore", invalid="ignore"):
                xint = rx + (my_ - ry) * fx / fy
            if int((straddle & (mx_ < xint)).sum()) % 2 == 1:
                total += (b - a) * el
    return total


def _ring_ring_clip_area_np(ax, ay, bx, by) -> float:
    """Exact ``ST_Area(ST_Intersection(polygon, polygon))`` over a
    candidate (simple ring, simple ring) pair — the areal-interpolation /
    zonal-overlay workhorse.  Green's theorem: the boundary of A∩B is made
    of A-edge pieces inside B plus B-edge pieces inside A, and the line
    integral (1/2)∮(x dy − y dx) is ADDITIVE over unordered pieces — so no
    overlay topology is needed.  Per edge of each ring (both normalized to
    CCW by their signed area first): cut [0,1] at the intersection
    parameters with the OTHER ring's edges, classify each sub-interval by
    its midpoint — weight 1 when it raycasts inside, 0 outside, and **1/2
    when it lies exactly ON the other ring's boundary** (shared-border
    spans, ubiquitous in axis-aligned admin data: both rings traverse the
    shared span once in the same CCW direction, so ½ + ½ counts it exactly
    once — the measure-correct convention) — and accumulate
    weight·(x_a·y_b − y_a·x_b).  Containment with no boundary contact
    degenerates correctly (full shoelace of the inner ring + 0), disjoint
    pairs to 0, identical rings to their own area.  Same forms/order as
    the generated SQL twin (functions/geometry.py ring_ring_clip_area_sql)
    — cuts, on-boundary tests, inside decisions, and orientation
    normalization are bit-identical."""
    if len(ax) < 3 or len(bx) < 3:
        return 0.0

    def ccw(xs, ys):
        x2, y2 = np.roll(xs, -1), np.roll(ys, -1)
        sa = float(np.sum(xs * y2 - x2 * ys))
        if sa < 0:
            return xs[::-1].copy(), ys[::-1].copy()
        return xs, ys

    ax, ay = ccw(ax, ay)
    bx, by = ccw(bx, by)

    def side(px_, py_, rx, ry) -> float:
        """Σ over px_'s edges of the inside-piece line integral vs (rx, ry)."""
        rx2, ry2 = np.roll(rx, -1), np.roll(ry, -1)
        fx, fy = rx2 - rx, ry2 - ry
        acc = 0.0
        n = len(px_)
        for i in range(n):
            p1x, p1y = px_[i], py_[i]
            ex = px_[(i + 1) % n] - p1x
            ey = py_[(i + 1) % n] - p1y
            wx, wy = rx - p1x, ry - p1y
            d = ex * fy - ey * fx
            with np.errstate(divide="ignore", invalid="ignore"):
                t = (wx * fy - wy * fx) / d
                u = (wx * ey - wy * ex) / d
            ok = (d != 0) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
            ts = np.sort(np.concatenate([[0.0, 1.0], t[ok]]))
            for k in range(len(ts) - 1):
                a, b = ts[k], ts[k + 1]
                if b <= a:
                    continue
                mid = (a + b) / 2
                mx_, my_ = p1x + mid * ex, p1y + mid * ey
                onb = (
                    (rx2 - rx) * (my_ - ry) - (ry2 - ry) * (mx_ - rx) == 0
                ) & (
                    (mx_ >= np.minimum(rx, rx2))
                    & (mx_ <= np.maximum(rx, rx2))
                    & (my_ >= np.minimum(ry, ry2))
                    & (my_ <= np.maximum(ry, ry2))
                )
                if onb.any():
                    w = 0.5
                else:
                    straddle = (ry > my_) != (ry2 > my_)
                    with np.errstate(divide="ignore", invalid="ignore"):
                        xint = rx + (my_ - ry) * fx / fy
                    w = (
                        1.0
                        if int((straddle & (mx_ < xint)).sum()) % 2 == 1
                        else 0.0
                    )
                if w:
                    xa, ya = p1x + a * ex, p1y + a * ey
                    xb, yb = p1x + b * ex, p1y + b * ey
                    acc += w * (xa * yb - ya * xb)
        return acc

    return 0.5 * (side(ax, ay, bx, by) + side(bx, by, ax, ay))


def make_ring_ring_clip_area_udf():
    """Arrow-batched double kernel over candidate (ring, ring) pairs."""

    @F.pandas_udf("double")
    def ca(axs: pd.Series, ays: pd.Series, bxs: pd.Series, bys: pd.Series) -> pd.Series:
        out = np.zeros(len(axs), dtype=np.float64)
        for i in range(len(axs)):
            ax, ay, bx, by = axs.iloc[i], ays.iloc[i], bxs.iloc[i], bys.iloc[i]
            if ax is None or ay is None or bx is None or by is None:
                continue  # stays 0.0 — matches the SQL twin's NULL guard
            out[i] = _ring_ring_clip_area_np(
                np.asarray(ax, dtype=np.float64),
                np.asarray(ay, dtype=np.float64),
                np.asarray(bx, dtype=np.float64),
                np.asarray(by, dtype=np.float64),
            )
        return pd.Series(out)

    return ca


def polygons_clip_area_join(
    polys_a: DataFrame,
    polys_b: DataFrame,
    grid_zoom: int = 4,
    broadcast_b: bool = True,
    max_cells_per_poly: int = 64,
) -> DataFrame:
    """Polygon x polygon intersection-AREA overlay join: each surviving
    pair carries ``inter_area`` — the exact area of the two interiors'
    intersection (PostGIS ``ST_Area(ST_Intersection(a.way, b.way))``, the
    areal-interpolation primitive; the reference's templates run arbitrary
    PostGIS overlays, reference tilekiln/definition.py:42-77).  Pairs with
    zero intersection area are dropped.

    Distributed shape: the SAME shared PBSM candidate stage (positive
    overlap implies bbox overlap); the refine is one Arrow kernel at
    O(|A_ring| x |B_ring|) per candidate — the exact-overlay asymptotics."""
    candidates = _pbsm_candidates(
        polys_a, polys_b, grid_zoom, broadcast_b, max_cells_per_poly
    )
    area = make_ring_ring_clip_area_udf()(
        F.col("ring_xs"), F.col("ring_ys"), F.col("b_ring_xs"), F.col("b_ring_ys")
    )
    return candidates.withColumn("inter_area", area).filter(
        F.col("inter_area") > 0
    )


def make_chain_ring_clip_len_udf():
    """Arrow-batched double kernel over candidate (chain, ring) pairs."""

    @F.pandas_udf("double")
    def cl(lxs: pd.Series, lys: pd.Series, rxs: pd.Series, rys: pd.Series) -> pd.Series:
        out = np.zeros(len(lxs), dtype=np.float64)
        for i in range(len(lxs)):
            lx, ly, rx, ry = lxs.iloc[i], lys.iloc[i], rxs.iloc[i], rys.iloc[i]
            if lx is None or ly is None or rx is None or ry is None:
                continue  # stays 0.0 — matches the SQL twin's NULL guard
            out[i] = _chain_ring_clip_len_np(
                np.asarray(lx, dtype=np.float64),
                np.asarray(ly, dtype=np.float64),
                np.asarray(rx, dtype=np.float64),
                np.asarray(ry, dtype=np.float64),
            )
        return pd.Series(out)

    return cl


def lines_clip_length_join(
    lines: DataFrame,
    polys: DataFrame,
    grid_zoom: int = 4,
    broadcast_polys: bool = True,
    max_cells_per_poly: int = 64,
) -> DataFrame:
    """Polyline x polygon clipped-length overlay join: each surviving
    (line, polygon) pair carries ``inside_len`` — the exact length of the
    line's intersection with the polygon interior (PostGIS
    ``ST_Length(ST_Intersection(l.way, p.way))``; the reference's templates
    run arbitrary PostGIS overlays, reference tilekiln/definition.py:42-77).
    Pairs with zero inside length are dropped.

    Distributed shape: the SAME shared PBSM candidate stage (any positive
    overlap implies bbox overlap); the refine is one Arrow kernel whose
    cost is O(|chain| x |ring|) per candidate — the asymptotics any engine
    pays for the exact overlay."""
    candidates = _pbsm_candidates(
        lines, polys, grid_zoom, broadcast_polys, max_cells_per_poly
    )
    ln = make_chain_ring_clip_len_udf()(
        F.col("ring_xs"), F.col("ring_ys"), F.col("b_ring_xs"), F.col("b_ring_ys")
    )
    return candidates.withColumn("inside_len", ln).filter(F.col("inside_len") > 0)


# classification thresholds, Python-hoisted so both engines fold the
# IDENTICAL float64 constants: inter_area / ring areas are bit-identical
# cross-engine, so every comparison below decides the same way on both —
# the tolerance only absorbs the clip kernel's own accumulation-order ulps
# against the shoelace fold (e.g. a fully-contained ring whose clip
# integral sums pieces in a different order than the area fold).
RELATE_TOL_HI = 1.0 - 1.0e-9
RELATE_TOL_LO = 1.0e-9


def polygons_relate_join(
    polys_a: DataFrame,
    polys_b: DataFrame,
    grid_zoom: int = 4,
    broadcast_b: bool = True,
    max_cells_per_poly: int = 64,
) -> DataFrame:
    """Named-predicate spatial-relate join (PostGIS ST_Equals /
    ST_Contains / ST_Within / ST_Overlaps / ST_Touches for polygon
    pairs; the reference's templates run arbitrary PostGIS predicates,
    reference tilekiln/definition.py:42-77): every ST_Intersects pair
    (disjoint pairs are implicitly absent — the scalable contract) is
    labeled by composing two proven kernels, with NO new geometry code:

    - ``touches``  — intersects but interior overlap ~ 0
    - ``equals``   — inter_area ~ area(A) ~ area(B)
    - ``contains`` — inter_area ~ area(B)   (A covers B)
    - ``within``   — inter_area ~ area(A)   (B covers A)
    - ``overlaps`` — everything else (positive partial interior overlap)

    Distributed shape: the SAME shared PBSM candidate stage; the refine
    is the ring-pair ST_Intersects kernel + the Green's-integral clip
    kernel per candidate, then pure column arithmetic — no extra
    shuffle.  Emits candidates + ``inter_area`` + ``relation``."""
    from tilekiln_spark.functions.geometry import ring_area

    candidates = _pbsm_candidates(
        polys_a, polys_b, grid_zoom, broadcast_b, max_cells_per_poly
    )
    hit = make_rings_intersect_udf()(
        F.col("ring_xs"), F.col("ring_ys"), F.col("b_ring_xs"), F.col("b_ring_ys")
    )
    inter = make_ring_ring_clip_area_udf()(
        F.col("ring_xs"), F.col("ring_ys"), F.col("b_ring_xs"), F.col("b_ring_ys")
    )
    cand = candidates.filter(hit).withColumn("inter_area", inter)
    ia = F.col("inter_area")
    area_a = ring_area(F.col("ring_xs"), F.col("ring_ys"))
    area_b = ring_area(F.col("b_ring_xs"), F.col("b_ring_ys"))
    hi, lo = F.lit(RELATE_TOL_HI), F.lit(RELATE_TOL_LO)
    rel = (
        F.when(ia < lo * F.least(area_a, area_b), F.lit("touches"))
        .when((ia >= hi * area_a) & (ia >= hi * area_b), F.lit("equals"))
        .when(ia >= hi * area_b, F.lit("contains"))
        .when(ia >= hi * area_a, F.lit("within"))
        .otherwise(F.lit("overlaps"))
    )
    return cand.withColumn("relation", rel)


def polygons_cluster_intersecting(
    polys: DataFrame,
    grid_zoom: int = 4,
    broadcast_b: bool = True,
    max_cells_per_poly: int = 64,
) -> DataFrame:
    """PostGIS ``ST_ClusterIntersecting``: partition a polygon set into
    groups of TRANSITIVELY intersecting polygons (A meets B, B meets C =>
    one cluster, even when A misses C) — the dissolve-prep / admin-region
    grouping primitive.

    Pure composition of proven stages, no new geometry code:

    - self ST_Intersects join (``polygons_intersect_join`` — the shared
      PBSM candidate stage + the Arrow ring-pair kernel), keeping each
      unordered pair once (``polygon_id < b_polygon_id``);
    - the large-star/small-star component contraction
      (operators/dedup.py connected_components — O(log^2 n) rounds, so a
      chain of thousands of touching parcels never pays diameter rounds);
    - singletons (no intersecting partner) label themselves via the
      coalesce-to-self left join.

    Returns the input frame's ids with ``cluster_id`` = MIN polygon_id in
    the cluster (deterministic canonical label) and ``n_members``.
    ``broadcast_b=False`` keeps the self-join's exploded B side off the
    executors' memory for large polygon tables (the same switch the
    sibling joins expose)."""
    from tilekiln_spark.operators.dedup import connected_components

    pairs = (
        polygons_intersect_join(
            polys, polys, grid_zoom, broadcast_b=broadcast_b,
            max_cells_per_poly=max_cells_per_poly,
        )
        .filter(F.col("polygon_id") < F.col("b_polygon_id"))
        .select(
            F.col("polygon_id").alias("key_a"),
            F.col("b_polygon_id").alias("key_b"),
        )
    )
    labels = connected_components(pairs)
    lbl = (
        polys.select("polygon_id")
        .join(labels.withColumnRenamed("node", "polygon_id"), "polygon_id", "left")
        .withColumn("cluster_id", F.coalesce("component", "polygon_id"))
    )
    sizes = lbl.groupBy("cluster_id").agg(F.count("*").alias("n_members"))
    return lbl.select("polygon_id", "cluster_id").join(sizes, "cluster_id")


def hausdorff_distance(
    points: DataFrame,
    group_col: str,
    x_col: str = "mx",
    y_col: str = "my",
    id_col: str = "doc_id",
) -> DataFrame:
    """PostGIS ``ST_HausdorffDistance`` between point groups (tracks,
    footprint samples): the classic shape-similarity metric
    ``max(directed(A->B), directed(B->A))`` where
    ``directed(A->B) = max over a of min over b of dist(a, b)``.

    Distributed shape: ONE group-pair cross product of points (the
    candidate stage; for planet-scale groups pre-prune with the PBSM
    grid — only cells near A's points can host A's nearest B point),
    then two partial-aggregated groupBys: min over B per (pair, a
    point), max over the pair.  All comparisons happen on EXACT squared
    distances (sums/products of raw float64 coordinates — no sqrt
    inside an aggregate), so both engines pick the identical extremes;
    one sqrt per output row in the projection.

    Returns ``(g_a, g_b, hausdorff)`` for each unordered pair
    (``g_a < g_b``)."""
    a = points.select(
        F.col(group_col).alias("g_a"),
        F.col(id_col).alias("a_id"),
        F.col(x_col).alias("ax"),
        F.col(y_col).alias("ay"),
    )
    b = points.select(
        F.col(group_col).alias("g_b"),
        F.col(x_col).alias("bx"),
        F.col(y_col).alias("by"),
    )
    d2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    directed = (
        a.join(b, F.col("g_a") != F.col("g_b"))
        .groupBy("g_a", "g_b", "a_id")
        .agg(F.min(d2).alias("nn2"))
        .groupBy("g_a", "g_b")
        .agg(F.max("nn2").alias("dir2"))
    )
    fwd = directed.filter(F.col("g_a") < F.col("g_b"))
    rev = directed.filter(F.col("g_a") > F.col("g_b")).select(
        F.col("g_b").alias("g_a"), F.col("g_a").alias("g_b"),
        F.col("dir2").alias("rev2"),
    )
    return fwd.join(rev, ["g_a", "g_b"]).select(
        "g_a", "g_b",
        F.sqrt(F.greatest("dir2", "rev2")).alias("hausdorff"),
    )


def ripleys_k(
    pts: DataFrame,
    radii: list[float],
    id_col: str = "doc_id",
    x_col: str = "mx",
    y_col: str = "my",
    broadcast_seeds: bool = False,
) -> DataFrame:
    """Ripley's K function (the point-pattern clustering statistic; R
    spatstat ``Kest`` with the ``"none"`` edge correction, documented —
    edge-corrected variants divide per-pair weights in the same plan):

        K(r) = A / n² · Σ_i Σ_{j≠i} 1[d_ij ≤ r]

    with A the bbox area of the pattern.  K(r) ≈ πr² for complete
    spatial randomness; above = clustered at that scale, below =
    dispersed.  Also returns Besag's variance-stabilized
    L(r) = sqrt(K/π) (CSR ⇒ L(r) = r).

    Distributed shape: the pair counting is ONE self
    :func:`dwithin_join` at max(radii) — the bounded 3x3
    cell-neighborhood equi-join, never a cross join — followed by ONE
    global aggregate summing a per-radius indicator column batch
    (every radius is cut from the same pair pass; the squared-distance
    boundary test is multiply/add-exact, so counts are exact integers
    and cross-engine identical).  The bbox/n moments are a second tiny
    aggregate; the K/L assembly is per-row scalar math.  Seeds shuffle
    by default (the self-join side is not small); pass
    ``broadcast_seeds=True`` only for small patterns.

    Returns one row per radius: ``[r, n_pairs, k_est, l_est]`` — all
    units those of x/y.  Self-pairs are excluded by ``id_col``;
    coincident distinct points count (d = 0 ≤ r), per the statistic."""
    if not radii:
        raise ValueError("ripleys_k requires at least one radius")
    radii = sorted(float(r) for r in radii)
    if radii[0] <= 0:
        raise ValueError("ripleys_k radii must be positive")
    seeds = pts.select(
        F.col(id_col).alias("_sid"),
        F.col(x_col).alias("_sx"),
        F.col(y_col).alias("_sy"),
    )
    pairs = dwithin_join(
        pts.select(F.col(id_col), F.col(x_col), F.col(y_col)),
        seeds,
        radius=radii[-1],
        mx=x_col,
        my=y_col,
        seed_mx="_sx",
        seed_my="_sy",
        broadcast_seeds=broadcast_seeds,
    ).where(F.col(id_col) != F.col("_sid"))
    # recompute the SQUARED distance from the coordinates for the
    # per-radius boundary test: dist is a sqrt round-trip, d2 is exact
    # multiply/add — the same boundary discipline dwithin_join itself uses
    d2 = (F.col(x_col) - F.col("_sx")) * (F.col(x_col) - F.col("_sx")) + (
        F.col(y_col) - F.col("_sy")
    ) * (F.col(y_col) - F.col("_sy"))
    cnts = pairs.agg(
        *[
            F.coalesce(
                F.sum((d2 <= F.lit(r * r)).cast("long")),
                F.lit(0).cast("long"),
            ).alias(f"_c{i}")
            for i, r in enumerate(radii)
        ]
    )
    mom = pts.agg(
        F.count("*").cast("double").alias("_n"),
        (
            (F.max(x_col) - F.min(x_col)) * (F.max(y_col) - F.min(y_col))
        ).alias("_area"),
    )
    spark = pts.sparkSession
    rdf = spark.createDataFrame(
        [(i, r) for i, r in enumerate(radii)], "i int, r double"
    )
    wide = cnts.crossJoin(F.broadcast(mom))
    stacked = rdf.crossJoin(F.broadcast(wide))
    cnt = None
    for i in range(len(radii)):
        c = F.when(F.col("i") == i, F.col(f"_c{i}"))
        cnt = c if cnt is None else F.coalesce(cnt, c)
    k = F.col("_area") * cnt.cast("double") / (F.col("_n") * F.col("_n"))
    return stacked.select(
        F.col("r"),
        cnt.alias("n_pairs"),
        k.alias("k_est"),
        F.sqrt(k / F.lit(3.141592653589793)).alias("l_est"),
    )


def cross_k(
    pts_a: DataFrame,
    pts_b: DataFrame,
    radii: list[float],
    id_col: str = "doc_id",
    x_col: str = "mx",
    y_col: str = "my",
    broadcast_seeds: bool = False,
) -> DataFrame:
    """Bivariate (cross-type) Ripley's K — spatstat ``Kcross``, edge
    correction "none" like :func:`ripleys_k`: does pattern A cluster
    AROUND pattern B beyond random labeling?

        K_AB(r) = Area / (n_A · n_B) · Σ_{i∈A} Σ_{j∈B} 1[d_ij ≤ r]

    with Area the bbox of the COMBINED pattern (the shared study
    region).  CSR ⇒ K_AB(r) ≈ πr²; above = attraction between the
    types, below = repulsion.  L_AB = sqrt(K_AB/π) reported alongside.

    Same distributed discipline as the univariate statistic: ONE
    :func:`dwithin_join` of A against B at max(radii) (bounded 3x3
    cell-neighborhood equi-join), every radius cut from that single
    pair pass with the exact SQUARED-distance boundary test (counts are
    exact integers), moments from one tiny aggregate over the union.
    A and B need no id disjointness — a shared point is a genuine
    zero-distance cross pair.  Returns ``[r, n_pairs, k_est, l_est]``."""
    if not radii:
        raise ValueError("cross_k requires at least one radius")
    radii = sorted(float(r) for r in radii)
    if radii[0] <= 0:
        raise ValueError("cross_k radii must be positive")
    seeds = pts_b.select(
        F.col(id_col).alias("_sid"),
        F.col(x_col).alias("_sx"),
        F.col(y_col).alias("_sy"),
    )
    pairs = dwithin_join(
        pts_a.select(F.col(id_col), F.col(x_col), F.col(y_col)),
        seeds,
        radius=radii[-1],
        mx=x_col,
        my=y_col,
        seed_mx="_sx",
        seed_my="_sy",
        broadcast_seeds=broadcast_seeds,
    )
    d2 = (F.col(x_col) - F.col("_sx")) * (F.col(x_col) - F.col("_sx")) + (
        F.col(y_col) - F.col("_sy")
    ) * (F.col(y_col) - F.col("_sy"))
    cnts = pairs.agg(
        *[
            F.coalesce(
                F.sum((d2 <= F.lit(r * r)).cast("long")),
                F.lit(0).cast("long"),
            ).alias(f"_c{i}")
            for i, r in enumerate(radii)
        ]
    )
    both = pts_a.select(x_col, y_col).unionAll(pts_b.select(x_col, y_col))
    na = pts_a.agg(F.count("*").cast("double").alias("_na"))
    nb = pts_b.agg(F.count("*").cast("double").alias("_nb"))
    mom = both.agg(
        (
            (F.max(x_col) - F.min(x_col)) * (F.max(y_col) - F.min(y_col))
        ).alias("_area")
    )
    spark = pts_a.sparkSession
    rdf = spark.createDataFrame(
        [(i, r) for i, r in enumerate(radii)], "i int, r double"
    )
    wide = (
        cnts.crossJoin(F.broadcast(mom))
        .crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
    )
    stacked = rdf.crossJoin(F.broadcast(wide))
    cnt = None
    for i in range(len(radii)):
        c = F.when(F.col("i") == i, F.col(f"_c{i}"))
        cnt = c if cnt is None else F.coalesce(cnt, c)
    k = F.col("_area") * cnt.cast("double") / (F.col("_na") * F.col("_nb"))
    return stacked.select(
        F.col("r"),
        cnt.alias("n_pairs"),
        k.alias("k_est"),
        F.sqrt(k / F.lit(3.141592653589793)).alias("l_est"),
    )


def nearest_neighbors(
    points: DataFrame,
    radius: float,
    key: str = "doc_id",
    mx: str = "mx",
    my: str = "my",
) -> DataFrame:
    """Exact all-points nearest-neighbor join over ONE point set — the
    primitive under the Clark-Evans R index, the colocation quotient, and
    every NN-distance point-pattern statistic (spatstat ``nndist`` /
    PostGIS ``<->`` lateral-kNN at k=1).

    Two-stage, exact regardless of ``radius``:

    1. a self ``dwithin_join`` at ``radius`` (bounded 3x3 cell-neighborhood
       equi-join — no cross join) proposes candidates; the per-point argmin
       RECOMPUTES squared distance from coordinates (the ripleys_k sqrt-
       round-trip rule) and tie-breaks on the neighbor key, so the winner
       is bit-deterministic cross-engine.
    2. points with NO neighbor inside ``radius`` (the sparse tail; an
       anti-join finds them) fall back to a brute-force pass against the
       full point set — bounded by |tail| x N.  At scale the tail is the
       isolated-outlier fringe; a production variant would double the
       radius per round instead, same exactness argument.

    Returns [<key>, nn_id, nn_d2] — nn_d2 the EXACT squared distance
    (multiply/add only; callers sqrt for display)."""
    import numpy as _np  # noqa: F401  (parity with module convention)

    right = points.select(
        F.col(key).alias("nn_id"), F.col(mx).alias("cx"), F.col(my).alias("cy")
    )
    cand = dwithin_join(
        points.select(key, mx, my), right, radius, mx=mx, my=my,
        broadcast_seeds=False,
    ).where(F.col(key) != F.col("nn_id"))
    d2 = (F.col(mx) - F.col("cx")) * (F.col(mx) - F.col("cx")) + (
        F.col(my) - F.col("cy")
    ) * (F.col(my) - F.col("cy"))
    best = (
        cand.withColumn("d2", d2)
        .groupBy(key)
        .agg(F.min(F.struct(F.col("d2"), F.col("nn_id"))).alias("w"))
        .select(key, F.col("w.nn_id").alias("nn_id"), F.col("w.d2").alias("nn_d2"))
    )
    missing = points.select(key, mx, my).join(best.select(key), key, "anti")
    fallback = (
        missing.crossJoin(right)
        .where(F.col(key) != F.col("nn_id"))
        .withColumn("d2", d2)
        .groupBy(key)
        .agg(F.min(F.struct(F.col("d2"), F.col("nn_id"))).alias("w"))
        .select(key, F.col("w.nn_id").alias("nn_id"), F.col("w.d2").alias("nn_d2"))
    )
    return best.unionByName(fallback)


def clark_evans(
    points: DataFrame,
    radius: float,
    key: str = "doc_id",
    mx: str = "mx",
    my: str = "my",
) -> DataFrame:
    """Clark-Evans nearest-neighbor index (Clark & Evans 1954; spatstat
    ``clarkevans.test``, no edge correction): R = observed mean NN
    distance / expected under CSR on the bounding-box study area, with
    the normal z statistic

        D_exp = 1 / (2 sqrt(n / A)),   SE = 0.26136 / sqrt(n^2 / A),
        z = (D_obs - D_exp) / SE.

    R < 1 clustered, R > 1 dispersed.  NN distances come from the exact
    two-stage ``nearest_neighbors`` join; the mean folds the SORTED
    distance list (sort_array + aggregate — the ordered-fold pattern the
    Shannon entropy uses) so distributed sum order is immaterial.  The
    bbox moments are exact min/max selections.  Returns ONE row
    [n_points, area, mean_nn, d_exp, r_index, z_score] un-rounded
    (callers round for display).  At scale: the NN join dominates;
    the final fold is one single-group aggregate over n doubles — fine
    for statistics-sized samples, and the un-ordered F.sum is the drop-in
    at corpus scale where 1e-13 relative drift is immaterial."""
    nn = nearest_neighbors(points, radius, key=key, mx=mx, my=my)
    bbox = points.agg(
        F.count("*").alias("n"),
        F.min(mx).alias("x0"),
        F.max(mx).alias("x1"),
        F.min(my).alias("y0"),
        F.max(my).alias("y1"),
    )
    folded = nn.agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.sqrt(F.col("nn_d2")))),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("sum_nn")
    )
    j = folded.crossJoin(bbox)
    n = F.col("n").cast("double")
    area = (F.col("x1") - F.col("x0")) * (F.col("y1") - F.col("y0"))
    mean_nn = F.col("sum_nn") / n
    d_exp = 1.0 / (2.0 * F.sqrt(n / area))
    se = 0.26136 / F.sqrt(n * n / area)
    return j.select(
        F.col("n").alias("n_points"),
        area.alias("area"),
        mean_nn.alias("mean_nn"),
        d_exp.alias("d_exp"),
        (mean_nn / d_exp).alias("r_index"),
        ((mean_nn - d_exp) / se).alias("z_score"),
    )


def colocation_quotient(
    points: DataFrame,
    radius: float,
    category: str = "lang",
    key: str = "doc_id",
    mx: str = "mx",
    my: str = "my",
) -> DataFrame:
    """Colocation quotient matrix (Leslie & Kronenfeld 2011, k=1 form):
    for every ordered category pair (a, b),

        CLQ_{a->b} = (C_{a->b} / N_a) / (N_b' / (N - 1)),

    where C_{a->b} counts a-points whose nearest neighbor is a b-point
    and N_b' = N_b - [a = b] (a point cannot be its own neighbor).
    CLQ > 1: a is attracted to b beyond global mixing.

    Built entirely on the exact ``nearest_neighbors`` join + two tiny
    joins tagging each end with its category; every count is an exact
    integer, so the one float per row is a single division.  Pairs with
    zero observed colocation are emitted too (the zero C matrix rows) so
    the output is the full |cats|^2 grid.  Returns
    [cat_a, cat_b, n_a, n_b, nn_pairs, clq]."""
    nn = nearest_neighbors(points, radius, key=key, mx=mx, my=my)
    cats = points.select(F.col(key), F.col(category))
    tagged = (
        nn.join(cats.select(F.col(key), F.col(category).alias("cat_a")), key)
        .join(
            cats.select(
                F.col(key).alias("nn_id"), F.col(category).alias("cat_b")
            ),
            "nn_id",
        )
    )
    c = tagged.groupBy("cat_a", "cat_b").agg(F.count("*").alias("nn_pairs"))
    sizes = cats.groupBy(category).agg(F.count("*").alias("n_cat"))
    total = points.count()
    grid = (
        sizes.select(F.col(category).alias("cat_a"), F.col("n_cat").alias("n_a"))
        .crossJoin(
            sizes.select(F.col(category).alias("cat_b"), F.col("n_cat").alias("n_b"))
        )
        .join(c, ["cat_a", "cat_b"], "left")
        .select(
            "cat_a",
            "cat_b",
            "n_a",
            "n_b",
            F.coalesce("nn_pairs", F.lit(0)).alias("nn_pairs"),
        )
    )
    nb_eff = F.col("n_b") - F.when(F.col("cat_a") == F.col("cat_b"), 1).otherwise(0)
    clq = (
        F.col("nn_pairs").cast("double") / F.col("n_a").cast("double")
    ) / (nb_eff.cast("double") / F.lit(float(total - 1)))
    return grid.withColumn("clq", clq)


def g_function(
    points: DataFrame,
    radius: float,
    rs: list[float],
    key: str = "doc_id",
    mx: str = "mx",
    my: str = "my",
) -> DataFrame:
    """Nearest-neighbor distance distribution function G(r) (spatstat
    ``Gest``, raw/uncorrected): the empirical CDF of NN distances at the
    requested radii — the third leg of the point-pattern triad beside
    Ripley's K (pair counts) and Clark-Evans (mean NN).

    ONE exact ``nearest_neighbors`` pass; every radius is a cut of the
    same result by comparing nn_d2 <= r^2 — EXACT squared-distance
    boundary decisions (the ripleys_k rule), so counts are exact
    integers and G is one division each.  Returns [r, n_le, g_hat]
    ordered by r."""
    nn = nearest_neighbors(points, radius, key=key, mx=mx, my=my)
    n = points.count()
    cuts = [
        F.sum(
            F.when(F.col("nn_d2") <= F.lit(float(r) * float(r)), 1).otherwise(0)
        ).alias(f"c{i}")
        for i, r in enumerate(rs)
    ]
    row = nn.agg(*cuts)
    pairs = F.array(
        *[
            F.struct(
                F.lit(float(r)).alias("r"),
                F.col(f"c{i}").alias("n_le"),
            )
            for i, r in enumerate(rs)
        ]
    )
    return (
        row.select(F.explode(pairs).alias("e"))
        .select(
            F.col("e.r").alias("r"),
            F.col("e.n_le").alias("n_le"),
            (F.col("e.n_le").cast("double") / F.lit(float(n))).alias("g_hat"),
        )
        .orderBy("r")
    )


def moran_correlogram(
    points: DataFrame,
    value_col: str,
    radii: list[float],
    key: str = "doc_id",
    mx: str = "mx",
    my: str = "my",
) -> DataFrame:
    """Moran's I correlogram over distance bands (the PySAL/spdep
    ``correlogram`` shape): global Moran's I with BINARY weights
    w_ij = 1 iff r_{b-1} < d(i,j) <= r_b, one value per band — how far
    does spatial autocorrelation reach?

    Exactness: with integer values x, every distributed sum is an EXACT
    integer by expanding the centered cross-products into raw moments
    (the raster morans_i rule):

        Σ z_i z_j = Σ x_i x_j − x̄ Σ(x_i + x_j) + x̄² S0
        Σ z_i²    = Σ x² − n x̄²

    so each band's I is a closed-form expression over seven exact
    integers + x̄ — no order-dependent float accumulation anywhere.

    Distributed shape: ONE self dwithin_join at max(radii) (bounded 3x3
    cell-neighborhood equi-join — never a cross join), band assignment
    recomputes the SQUARED distance from coordinates (the ripleys_k
    sqrt-round-trip rule), one partial-agg groupBy on the band, one
    1-row global moment aggregate broadcast back.  Returns
    [band, r_lo, r_hi, s0_pairs, moran_i] ordered by band."""
    if not radii or any(
        radii[i] >= radii[i + 1] for i in range(len(radii) - 1)
    ) or radii[0] <= 0:
        raise ValueError(f"moran_correlogram: radii must be increasing positive, got {radii}")
    pts = points.select(key, mx, my, value_col)
    right = pts.select(
        F.col(key).alias("nn_id"),
        F.col(mx).alias("cx"),
        F.col(my).alias("cy"),
        F.col(value_col).alias("xv_j"),
    )
    pairs = dwithin_join(
        pts, right, radii[-1], mx=mx, my=my, broadcast_seeds=False
    ).where(F.col(key) != F.col("nn_id"))
    d2 = (F.col(mx) - F.col("cx")) * (F.col(mx) - F.col("cx")) + (
        F.col(my) - F.col("cy")
    ) * (F.col(my) - F.col("cy"))
    band = None
    for i, r in enumerate(radii):
        cond = d2 <= F.lit(float(r) * float(r))
        band = F.when(cond, F.lit(i)) if band is None else band.when(cond, F.lit(i))
    # nested when: FIRST matching radius wins = the smallest enclosing band
    banded = pairs.withColumn("band", band)
    xi = F.col(value_col).cast("long")
    xj = F.col("xv_j").cast("long")
    per_band = banded.groupBy("band").agg(
        F.count("*").alias("s0"),
        F.sum(xi * xj).alias("sxx"),
        F.sum(xi + xj).alias("sxpx"),
    )
    g = pts.agg(
        F.count("*").alias("n"),
        F.sum(F.col(value_col).cast("long")).alias("sx"),
        F.sum(F.col(value_col).cast("long") * F.col(value_col).cast("long")).alias(
            "sx2"
        ),
    )
    j = per_band.crossJoin(F.broadcast(g))
    n = F.col("n").cast("double")
    xbar = F.col("sx").cast("double") / n
    num = (
        F.col("sxx").cast("double")
        - xbar * F.col("sxpx").cast("double")
        + xbar * xbar * F.col("s0").cast("double")
    )
    den = F.col("sx2").cast("double") - n * xbar * xbar
    moran = (n / F.col("s0").cast("double")) * (num / den)
    lows = [0.0] + [float(r) for r in radii[:-1]]
    lo = None
    for i, v in enumerate(lows):
        c = F.col("band") == i
        lo = F.when(c, F.lit(v)) if lo is None else lo.when(c, F.lit(v))
    hi = None
    for i, r in enumerate(radii):
        c = F.col("band") == i
        hi = F.when(c, F.lit(float(r))) if hi is None else hi.when(c, F.lit(float(r)))
    return (
        j.select(
            F.col("band"),
            lo.alias("r_lo"),
            hi.alias("r_hi"),
            F.col("s0").alias("s0_pairs"),
            moran.alias("moran_i"),
        )
        .orderBy("band")
    )
