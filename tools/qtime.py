"""Single-query timing + plan harness (round 6 optimization work).

Usage:
    python tools/qtime.py QUERY [QUERY ...] [--reps N] [--plan OUT.txt]
           [--sf DIR]

Times each named driver-contract query with the noop sink methodology is NOT
used here because the bench contract times `.count()` — we reproduce the
bench's own timing (build + count) so numbers are comparable, and optionally
dump .explain("formatted") for the plan files under plans/r06/.

Flagship pseudo-queries: "tiles_z0_8", "spatial_join", "pages_geocode"
reproduce bench.py's flagship cells.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def build_session(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("qtime")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "48g"))
        .getOrCreate()
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--plan", default=None, help="dir to write <name>.txt plans")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    def flagship(name):
        from pyspark.sql import functions as F

        from tilekiln_spark.config.model import Config
        from tilekiln_spark.operators.spatial_join import points_in_polygons
        from tilekiln_spark.operators.tiling import pages_geo, render_zooms
        from tilekiln_spark.sources.pages import layer_polygons, pages

        pages_n = int(os.environ.get("SPARK_GRAFT_PAGES_N", "200000"))
        cfg = Config(entrymod.CFG_YAML, entrymod.TEMPLATES)
        geo = pages_geo(pages(spark, pages_n)).persist()
        polys = layer_polygons(spark, 120).persist()
        geo.count()
        sources = {"pages_geo": geo, "layer_polygons": polys}
        if name == "tiles_z0_8":
            return lambda: render_zooms(cfg, list(range(0, 9)), dict(sources)).count()
        if name == "spatial_join":
            return lambda: points_in_polygons(geo, polys, how="grid", grid_zoom=6).count()
        raise KeyError(name)

    for name in args.names:
        if name in ("tiles_z0_8", "spatial_join"):
            fn = flagship(name)
            times = []
            for i in range(args.reps):
                spark.sparkContext.setJobDescription(f"{name} rep{i}")
                t0 = time.time()
                n = fn()
                times.append(round(time.time() - t0, 3))
            print(f"{name}: {times}  (rows={n})", flush=True)
            continue
        f = qs[name]
        times = []
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            t0 = time.time()
            df = f(spark, args.sf)
            n = df.count()
            times.append(round(time.time() - t0, 3))
        if args.plan:
            os.makedirs(args.plan, exist_ok=True)
            df = f(spark, args.sf)
            with open(os.path.join(args.plan, f"{name}.txt"), "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        print(f"{name}: {times}  (rows={n})", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
