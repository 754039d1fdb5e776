"""Memory-bandwidth scaling probe for the gen 8->32 north-rule attribution
(VERDICT r5 "Next round" #1 alternative done-condition: show the sandbox,
not the plan, is the binding constraint).

This sandbox is ONE socket (lscpu: 1 socket, 1 NUMA node, 32 physical
cores, 1 thread/core).  local[8] -> local[32] therefore quadruples
compute threads while aggregate DRAM bandwidth stays FIXED — unlike the
cluster scaling the north rule models, where 4x executors bring 4x
sockets and 4x memory channels.  If a stage is partially bandwidth-bound,
its wall-clock scaling efficiency on this box is capped at

    eff_cap(P->4P) = BW(4P) / BW(P) / 4

measured directly here with a STREAM-like triad over arrays far larger
than LLC, P concurrent worker processes, aggregate GB/s reported.

Usage: python tools/membw_probe.py [sizes_mb] [reps]
Appends a JSON line to BENCH/membw_probe.jsonl.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time


ARR_MB = 512          # per-worker array size; 3 arrays/worker, >> 48 MB LLC
REPS = 5              # triad sweeps per worker per measurement


def _worker(barrier, out_q, arr_mb: int, reps: int):
    import numpy as np

    n = arr_mb * 1024 * 1024 // 8
    a = np.ones(n)
    b = np.full(n, 2.0)
    c = np.zeros(n)
    # touch everything before the barrier so page faults don't count
    c[:] = a
    barrier.wait()
    t0 = time.time()
    for _ in range(reps):
        # triad: c = a + 2*b  -> 3 arrays streamed (2 read + 1 write)
        np.add(a, b, out=c)
        np.add(c, b, out=c)
    dt = time.time() - t0
    bytes_moved = reps * 2 * 3 * n * 8  # 2 kernels x (2 read + 1 write)
    out_q.put((dt, bytes_moved))


def measure(p: int, arr_mb: int = ARR_MB, reps: int = REPS) -> dict:
    barrier = mp.Barrier(p)
    q = mp.Queue()
    procs = [
        mp.Process(target=_worker, args=(barrier, q, arr_mb, reps))
        for _ in range(p)
    ]
    for pr in procs:
        pr.start()
    res = [q.get() for _ in procs]
    for pr in procs:
        pr.join()
    # aggregate rate over the slowest worker's window (everyone started
    # together at the barrier; the job is done when the last one is)
    wall = max(dt for dt, _ in res)
    total = sum(nb for _, nb in res)
    return {"p": p, "wall_s": round(wall, 3),
            "agg_gb_s": round(total / wall / 1e9, 2)}


def main():
    import sys

    arr_mb = int(sys.argv[1]) if len(sys.argv) > 1 else ARR_MB
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else REPS
    out = {"arr_mb": arr_mb, "reps": reps, "cells": []}
    for p in (1, 8, 32, 8, 32, 8, 32):   # interleaved, best-of-3 per P
        out["cells"].append(measure(p, arr_mb, reps))
        print(out["cells"][-1], flush=True)
    best = {}
    for c in out["cells"]:
        if c["p"] not in best or c["agg_gb_s"] > best[c["p"]]:
            best[c["p"]] = c["agg_gb_s"]
    out["best_gb_s"] = best
    if 8 in best and 32 in best:
        out["eff_cap_8_32"] = round(best[32] / best[8] / 4.0, 3)
    out["ts"] = time.time()
    print(json.dumps({k: v for k, v in out.items() if k != "cells"}))
    with open("/root/repo/BENCH/membw_probe.jsonl", "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
