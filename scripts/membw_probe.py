"""Direct DRAM-bandwidth probe: STREAM-style numpy triad at two thread
counts, to close the 8->32 scaling file with a measurement instead of
an inference.

The pipeline's 8->32 scaling efficiency plateaus at 0.70-0.74 even on
provably-quiet windows and even as input size quadruples (BENCH/
scaling_threads_8to32_n8000000.json), which points at shared
single-socket memory bandwidth, not fixed overhead. This probe measures
that ceiling directly: T independent processes each run the STREAM
triad kernel c = a + s*b over arrays far larger than LLC, and we report
aggregate bandwidth at T=8 vs T=32. If per-core bandwidth collapses by
about the same ratio as the pipeline's efficiency, the DRAM-ceiling
claim is a measurement, not a story.

Every figure is stamped with external-tenant cores via loadmeter
(host /proc/stat busy minus this process tree's CPU), same as
bench.py and scaling_bench.py.

Usage: python scripts/membw_probe.py [threads ...]   (default: 8 32)
Prints one JSON line per thread count plus a final summary line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from batch_geocode_spark import loadmeter

N_ELEMS = 8 * 1024 * 1024  # 64 MiB per float64 array; 3 arrays/worker
DURATION_S = 4.0
# STREAM convention: triad moves 3 arrays per pass (read a, read b,
# write c). Write-allocate traffic would add a 4th; we keep the
# conservative STREAM count so the absolute GB/s is comparable to
# published STREAM numbers. The 8-vs-32 RATIO is unaffected either way.
BYTES_PER_PASS = 3 * 8 * N_ELEMS


def _worker(barrier, out_q) -> None:
    import numpy as np

    a = np.random.default_rng(0).random(N_ELEMS)
    b = np.random.default_rng(1).random(N_ELEMS)
    c = np.empty_like(a)
    # one warm pass to fault pages before the timed window
    np.add(a, b, out=c)
    barrier.wait()
    # each worker times its own window from barrier release — releases
    # are near-simultaneous, and a deadline fixed before the barrier
    # would shrink (or zero) the window if 32-way init ran long
    deadline = time.monotonic() + DURATION_S
    passes = 0
    while time.monotonic() < deadline:
        # triad: c = a + 1.000001 * b  (two reads + one write per elem)
        np.multiply(b, 1.000001, out=c)
        np.add(c, a, out=c)
        passes += 1
    # multiply+add touches b,c then c,a,c -> count both kernel passes
    out_q.put(passes * 2)


def run_level(threads: int) -> dict:
    ctx = mp.get_context("fork")
    barrier = ctx.Barrier(threads + 1)
    out_q = ctx.Queue()
    procs = [
        ctx.Process(target=_worker, args=(barrier, out_q))
        for _ in range(threads)
    ]
    for p in procs:
        p.start()
    barrier.wait()  # all workers initialized; windows start now
    host0, tree0 = loadmeter.host_busy_s(), loadmeter.tree_cpu_s()
    t0 = time.monotonic()
    total_passes = sum(out_q.get() for _ in procs)
    wall = time.monotonic() - t0
    # read tree CPU BEFORE reaping (round-5 attribution lesson: reaped-
    # to-init children vanish from the tree walk; join() after reading)
    tree1, host1 = loadmeter.tree_cpu_s(), loadmeter.host_busy_s()
    for p in procs:
        p.join()
    ext_cores = max(0.0, (host1 - host0) - (tree1 - tree0)) / wall
    gbps = total_passes * BYTES_PER_PASS / wall / 1e9
    return {
        "threads": threads,
        "wall_s": round(wall, 3),
        "triad_gb_per_s": round(gbps, 2),
        "ext_cores": round(ext_cores, 2),
    }


def main() -> None:
    levels = [int(v) for v in sys.argv[1:]] or [8, 32]
    results = [run_level(t) for t in levels]
    for r in results:
        print(json.dumps(r))
    if len(results) >= 2:
        lo, hi = results[0], results[-1]
        ratio = hi["triad_gb_per_s"] / lo["triad_gb_per_s"]
        scale = hi["threads"] / lo["threads"]
        print(
            json.dumps(
                {
                    "pair": f"{lo['threads']}->{hi['threads']}",
                    "bw_ratio": round(ratio, 3),
                    "bw_scaling_efficiency": round(ratio / scale, 3),
                    "ext_cores": [lo["ext_cores"], hi["ext_cores"]],
                }
            )
        )


if __name__ == "__main__":
    main()
