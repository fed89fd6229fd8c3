"""Spark-free DRAM-bandwidth probe for the 8->32 scaling plateau.

``BENCH_SCALING.md`` reports near-ideal scaling from local[2] to
local[8] (0.836) but only 0.413 from local[8] to local[32], and claims
the drop is shared-DRAM saturation on a single box — a cap that
distinct executor *hosts* in a real N->4N cluster would not share.
This probe proves that claim without any Spark in the loop.

Each worker process owns a private R-MAT-skewed edge shard and runs
the exact memory-access pattern of one PageRank superstep in pure
numpy: a random gather ``rank[src] * w`` followed by a ``bincount``
scatter onto ``dst``. There is no sharing, no locks, no JVM, no
shuffle — the only contended resource is the memory system. Workers
run for a fixed wall window behind a common start barrier; aggregate
throughput = sum of per-worker edge-traversals / window.

If aggregate throughput at 32 workers lands near the 8-worker figure
instead of 4x it, the machine's DRAM is the ceiling and the engine's
own 8->32 efficiency is bounded by the same wall. Output: one JSON
line (also appended to ``bench_logs/bandwidth_probe.json``).

Usage: python tools/bandwidth_probe.py [edges_per_worker] [seconds]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

EDGES_PER_WORKER = 10_000_000
WINDOW_SEC = 10.0
PARALLELISMS = (1, 2, 8, 32)


def _worker(rank_id: int, n_edges: int, window: float, start_evt, out_q) -> None:
    rng = np.random.default_rng(1234 + rank_id)
    n = max(2, n_edges // 8)
    # Zipf-ish dst skew mirrors the transcript graph's hot vertices;
    # src uniform. Private arrays per process — zero sharing.
    src = rng.integers(0, n, n_edges, dtype=np.int64)
    dst = (
        np.minimum(
            rng.zipf(1.3, n_edges).astype(np.int64) - 1, n - 1
        )
        if hasattr(rng, "zipf")
        else rng.integers(0, n, n_edges, dtype=np.int64)
    )
    w = rng.random(n_edges)
    rank = np.full(n, 1.0 / n)
    # warm the pages before the timed window
    np.bincount(dst, weights=rank[src] * w, minlength=n)
    start_evt.wait()
    t0 = time.perf_counter()
    iters = 0
    while time.perf_counter() - t0 < window:
        contrib = np.bincount(dst, weights=rank[src] * w, minlength=n)
        rank = 0.15 / n + 0.85 * contrib
        iters += 1
    elapsed = time.perf_counter() - t0
    out_q.put((rank_id, iters, elapsed))


def run_at(p: int, n_edges: int, window: float) -> dict:
    ctx = mp.get_context("spawn")
    start = ctx.Event()
    q = ctx.Queue()
    procs = [
        ctx.Process(target=_worker, args=(i, n_edges, window, start, q))
        for i in range(p)
    ]
    for pr in procs:
        pr.start()
    # give every worker time to build its shard, then release together
    time.sleep(2 + n_edges / 4_000_000)
    start.set()
    results = [q.get() for _ in range(p)]
    for pr in procs:
        pr.join()
    total_traversals = sum(it * n_edges for _, it, _ in results)
    max_elapsed = max(el for _, _, el in results)
    return {
        "workers": p,
        "edges_per_worker": n_edges,
        "window_sec": round(max_elapsed, 3),
        "supersteps_total": sum(it for _, it, _ in results),
        "aggregate_edges_per_sec": round(total_traversals / max_elapsed, 1),
    }


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else EDGES_PER_WORKER
    window = float(sys.argv[2]) if len(sys.argv) > 2 else WINDOW_SEC
    rows = [run_at(p, n_edges, window) for p in PARALLELISMS]
    by_p = {r["workers"]: r["aggregate_edges_per_sec"] for r in rows}
    out = {
        "probe": "private-shard gather+bincount (PageRank superstep access pattern), no Spark",
        "rows": rows,
        "speedup_2_to_8": round(by_p[8] / by_p[2], 3) if 2 in by_p else None,
        "speedup_8_to_32": round(by_p[32] / by_p[8], 3),
        "efficiency_8_to_32": round(by_p[32] / by_p[8] / 4.0, 3),
    }
    line = json.dumps(out)
    print(line)
    os.makedirs("bench_logs", exist_ok=True)
    with open("bench_logs/bandwidth_probe.json", "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
