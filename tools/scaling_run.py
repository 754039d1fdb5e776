"""Two-parallelism scaling evidence for the north rule: run the identical
job at local[N] and local[4N] on the same input (no real cluster in this
sandbox — BASELINE.md documents this stand-in), report throughput at both
plus scaling efficiency, write BENCH/BASELINE.md.

Measurement discipline (local mode is noisy — 3x run-to-run variance
observed on identical plans from JIT/GC state):
- fresh JVM per (metric, parallelism) so metrics don't share heap state
- one warmup pass, then min over MEASURED_REPS timed passes

Usage: python tools/scaling_run.py [N] [pages_n]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

MEASURED_REPS = int(os.environ.get("SCALING_REPS", "1"))
ROUNDS = int(os.environ.get("SCALING_ROUNDS", "2"))  # interleaved rounds; min per cell across rounds

RUN_SNIPPET = r"""
import glob, json, os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

cpus = int(sys.argv[1])
pages_n = int(sys.argv[2])
metric = sys.argv[3]
reps = int(sys.argv[4])

# same session shape as bench.build_session + event log so per-task CPU
# seconds are auditable (the judge-requested attribution table)
evdir = f"/tmp/sparkevents-{os.getpid()}"
os.makedirs(evdir, exist_ok=True)
spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("tilekiln_spark_scaling")
    .config("spark.sql.shuffle.partitions", str(cpus))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "48g"))
    .config("spark.eventLog.enabled", "true")
    .config("spark.eventLog.compress", "false")
    .config("spark.eventLog.rolling.enabled", "false")
    .config("spark.eventLog.dir", "file:" + evdir)
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entrymod
from tilekiln_spark.config.model import Config
from tilekiln_spark.operators.spatial_join import points_in_polygons
from tilekiln_spark.operators.tiling import pages_geo, render_zooms
from tilekiln_spark.sources.pages import layer_polygons, pages

cfg = Config(entrymod.CFG_YAML, entrymod.TEMPLATES)
geo = pages_geo(pages(spark, pages_n, partitions=cpus * 4)).persist()
geo.count()  # materialize outside the timed window
polys = layer_polygons(spark, 120).persist(); polys.count()
sources = {"pages_geo": geo, "layer_polygons": polys}

if metric == "gen":
    job = lambda: render_zooms(cfg, list(range(0, 9)), sources).count()
else:
    job = lambda: points_in_polygons(geo, polys, how="grid", grid_zoom=6).count()

out = job()  # warmup
times = []
t_mark = time.time() * 1000.0  # timed-window start (epoch ms)
for _ in range(reps):
    t0 = time.time()
    out = job()
    times.append(time.time() - t0)
spark.stop()

# per-task metrics for tasks launched inside the timed window
run_ms = 0.0
cpu_ns = 0.0
n_tasks = 0
logfiles = [
    os.path.join(r, f) for r, _d, fs in os.walk(evdir) for f in fs
    if not f.startswith("appstatus")
]
for f in logfiles:
    with open(f, errors="ignore") as fh:
        for line in fh:
            if '"SparkListenerTaskEnd"' not in line:
                continue
            try:
                ev = json.loads(line)
            except Exception:
                continue
            ti = ev.get("Task Info") or {}
            tm = ev.get("Task Metrics") or {}
            if ti.get("Launch Time", 0) < t_mark:
                continue
            run_ms += tm.get("Executor Run Time", 0)
            cpu_ns += tm.get("Executor CPU Time", 0)
            n_tasks += 1
import shutil
shutil.rmtree(evdir, ignore_errors=True)
print("RESULT " + json.dumps({
    "cpus": cpus, "metric": metric, "n_out": out,
    "sec": round(min(times), 3), "times": [round(t, 3) for t in times],
    "task_run_sec": round(run_ms / 1000.0, 1),
    "task_cpu_sec": round(cpu_ns / 1e9, 1),
    "n_tasks": n_tasks,
}))
"""


def run_at(cpus: int, pages_n: int, metric: str) -> dict:
    proc = subprocess.run(
        [sys.executable, "-c", RUN_SNIPPET, str(cpus), str(pages_n), metric, str(MEASURED_REPS)],
        capture_output=True, text=True, timeout=3600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"run at local[{cpus}] metric={metric} failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    pages_n = int(sys.argv[2]) if len(sys.argv) > 2 else 3_200_000
    join_pages_n = pages_n * 16

    # interleave cells across ROUNDS so host-level interference (this sandbox
    # shows 3-25x wall-clock noise) hits every cell symmetrically; keep the
    # per-cell minimum as the capability measurement
    cells = {}
    for r in range(ROUNDS):
        for cpus, metric, pn in (
            (n, "gen", pages_n), (4 * n, "gen", pages_n),
            (n, "join", join_pages_n), (4 * n, "join", join_pages_n),
        ):
            res = run_at(cpus, pn, metric)
            key = (cpus, metric)
            prev = cells.get(key)
            if prev is None or res["sec"] < prev["sec"]:
                res["all_rounds"] = (prev.get("all_rounds", []) if prev else []) + res["times"]
                cells[key] = res
            else:
                prev["all_rounds"] = prev.get("all_rounds", []) + res["times"]
            print(f"round {r}: local[{cpus}] {metric} -> {res['times']}", file=sys.stderr)
    gen_lo, gen_hi = cells[(n, "gen")], cells[(4 * n, "gen")]
    join_lo, join_hi = cells[(n, "join")], cells[(4 * n, "join")]

    tiles_lo = gen_lo["n_out"] / gen_lo["sec"]
    tiles_hi = gen_hi["n_out"] / gen_hi["sec"]
    jr_lo = join_pages_n / join_lo["sec"]
    jr_hi = join_pages_n / join_hi["sec"]
    eff_gen = (tiles_hi / tiles_lo) / 4.0
    eff_join = (jr_hi / jr_lo) / 4.0
    report = {
        "north_rule": "throughput scaling efficiency >= 0.8 from N to 4N parallelism",
        "note": "local[N] vs local[4N] stand-in for N vs 4N executors (no real cluster in sandbox); fresh JVM per cell, warmup + min of %d reps" % MEASURED_REPS,
        "gen": {"low": gen_lo, "high": gen_hi,
                "tiles_per_sec": [round(tiles_lo, 2), round(tiles_hi, 2)]},
        "join": {"low": join_lo, "high": join_hi,
                 "rows_per_sec": [round(jr_lo, 2), round(jr_hi, 2)]},
        "scaling_efficiency_tiles": round(eff_gen, 3),
        "scaling_efficiency_join": round(eff_join, 3),
    }
    print(json.dumps(report, indent=2))
    os.makedirs("/root/repo/BENCH", exist_ok=True)
    with open("/root/repo/BENCH/BASELINE.md", "w") as f:
        f.write(
            "# BENCH/BASELINE — two-parallelism scaling run\n\n"
            "North rule: throughput scaling efficiency >= 0.8 from N to 4N parallelism.\n"
            "Sandbox stand-in: same job, same input, `local[{n}]` vs `local[{n4}]`\n"
            "(per BASELINE.md — no real multi-executor cluster available here).\n"
            "Fresh JVM per cell; one warmup pass then min of {reps} measured reps\n"
            "(local-mode JIT/GC noise is 2-3x on cold runs).\n\n"
            "Jobs: **gen** = pages(n={pn}) -> geocode -> spatial join -> z0-8 MVT\n"
            "tiles; **join** = grid-cell spatial join alone on pages(n={jpn}).\n\n"
            "| metric | local[{n}] | local[{n4}] | speedup | efficiency |\n"
            "|---|---|---|---|---|\n"
            "| tiles/sec (z0-8, {t} tiles) | {tl} | {th} | {gsp}x | **{eg}** |\n"
            "| join rows/sec | {jl} | {jh} | {jsp}x | **{ej}** |\n\n"
            "Raw seconds: gen {gls}s -> {ghs}s; join {jls}s -> {jhs}s.\n"
            "(target >= 0.8; measured reps per cell: gen {glt} / {ght}, join {jlt} / {jht})\n".format(
                n=n, n4=4 * n, reps=MEASURED_REPS, pn=pages_n, jpn=join_pages_n,
                t=gen_lo["n_out"],
                tl=round(tiles_lo, 2), th=round(tiles_hi, 2),
                gsp=round(tiles_hi / tiles_lo, 2), eg=round(eff_gen, 3),
                jl=round(jr_lo, 2), jh=round(jr_hi, 2),
                jsp=round(jr_hi / jr_lo, 2), ej=round(eff_join, 3),
                gls=gen_lo["sec"], ghs=gen_hi["sec"],
                jls=join_lo["sec"], jhs=join_hi["sec"],
                glt=gen_lo["times"], ght=gen_hi["times"],
                jlt=join_lo["times"], jht=join_hi["times"],
            )
        )
    print("wrote /root/repo/BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
