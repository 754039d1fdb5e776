"""PIP refine at real ring complexity (VERDICT r2 #6): interpreted-HOF
pip_raycast vs Arrow-batched make_pip_raycast_udf.

Fixture: N_POLYS star-shaped (concave) rings of RING_VERTS vertices spread
over the world, N_POINTS points — the planet_osm_polygon shape where rings
carry 10^3-10^4 vertices.  Both paths run the same grid join; only the
refine differs.  Prints one JSON line per variant.

Usage: python tools/bench_pip.py [n_points] [ring_verts] [n_polys]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main():
    n_points = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    ring_verts = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    n_polys = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))

    from pyspark.sql import SparkSession, functions as F

    from tilekiln_spark.operators.spatial_join import points_in_polygons
    from tilekiln_spark.sources.pages import pages
    from tilekiln_spark.operators.tiling import pages_geo
    from tilekiln_spark.tiles.core import HALF_WORLD

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("bench_pip")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.default_rng(7)
    rows = []
    for pid in range(n_polys):
        ang = np.sort(rng.uniform(0, 2 * np.pi, ring_verts))
        rad = rng.uniform(0.3, 1.0, ring_verts) * 10 ** rng.uniform(5.5, 6.6)
        cx = rng.uniform(-HALF_WORLD * 0.9, HALF_WORLD * 0.9)
        cy = rng.uniform(-HALF_WORLD * 0.8, HALF_WORLD * 0.8)
        xs = cx + rad * np.cos(ang)
        ys = cy + rad * np.sin(ang)
        rows.append(
            (pid, float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max()),
             xs.tolist(), ys.tolist())
        )
    polys = spark.createDataFrame(
        rows,
        "polygon_id long, xmin double, ymin double, xmax double, ymax double, "
        "ring_xs array<double>, ring_ys array<double>",
    )
    pts = pages_geo(pages(spark, n_points)).select("mx", "my").persist()
    pts.count()

    out = {"n_points": n_points, "ring_verts": ring_verts, "n_polys": n_polys, "cpus": cpus}
    for refine in ("raycast", "raycast_udf", "raycast_bcast"):
        t0 = time.time()
        n = points_in_polygons(pts, polys, how="grid", grid_zoom=4, refine=refine).count()
        dt = time.time() - t0
        out[refine + "_sec"] = round(dt, 3)
        out[refine + "_rows"] = n
    out["speedup_bcast"] = round(out["raycast_sec"] / out["raycast_bcast_sec"], 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
