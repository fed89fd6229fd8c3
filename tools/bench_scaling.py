"""Scaling-efficiency evidence: the same PageRank job at two parallelism
levels (local[8] vs local[32]) on the identical pre-materialized input.

BASELINE.json's two-cluster-size criterion (N vs 4N executors,
efficiency ≥ 0.8) cannot use a real cluster in this sandbox; per the
driver instructions we evidence it with thread-level parallelism: one
JVM per run (fresh subprocess), fixed shuffle partitions (64) so both
runs execute *identical* work, only the core count differs.

Writes BENCH_SCALING.md and prints one JSON line.

Usage: python tools/bench_scaling.py [n_convs] [iters]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EDGES = "/tmp/scaling_edges.parquet"

RUN_ONE = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from webgraph_algo_rs_spark.session import get_spark
from webgraph_algo_rs_spark.operators import pagerank

cores = int(sys.argv[1]); iters = int(sys.argv[2])
spark = get_spark(app_name=f"scal{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=64)
edges = spark.read.parquet({edges!r})
n_edges = edges.count()
# warmup: one superstep to JIT/fill caches
pagerank(edges, tol=0.0, max_iter=1)
t0 = time.time()
stats = {{}}
pagerank(edges, tol=0.0, max_iter=iters, stats=stats).count()
wall = time.time() - t0
print(json.dumps({{"cores": cores, "wall_sec": wall, "n_edges": n_edges,
                  "iters": stats["iterations"],
                  "edges_per_sec_per_superstep": n_edges * stats["iterations"] / wall}}))
spark.stop()
"""


def ensure_input(n_convs: int) -> None:
    if os.path.exists(EDGES):
        return
    gen = f"""
import sys; sys.path.insert(0, {REPO!r})
from webgraph_algo_rs_spark.session import get_spark
from webgraph_algo_rs_spark.sources.transcripts import gen_transcripts
from webgraph_algo_rs_spark.extraction import extract_edges
spark = get_spark(app_name="gen", master="local[32]")
extract_edges(gen_transcripts(spark, {n_convs}, seed=42)).repartition(64) \\
    .write.mode("overwrite").parquet({EDGES!r})
spark.stop()
"""
    subprocess.run([sys.executable, "-c", gen], check=True)


def run(cores: int, iters: int) -> dict:
    script = RUN_ONE.format(repo=REPO, edges=EDGES)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cores), str(iters)],
        check=True,
        capture_output=True,
        text=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    ensure_input(n_convs)
    r8 = run(8, iters)
    r32 = run(32, iters)
    speedup = r8["wall_sec"] / r32["wall_sec"]
    eff = speedup / 4.0
    result = {
        "n_edges": r8["n_edges"],
        "supersteps": iters,
        "local8": r8,
        "local32": r32,
        "speedup_8_to_32": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(result))
    with open(os.path.join(REPO, "BENCH_SCALING.md"), "w") as f:
        f.write(
            f"""# BENCH_SCALING — N vs 4N parallelism (PageRank supersteps)

Same job, same input ({r8['n_edges']:,} weighted edges from the
synthetic transcript pipeline, seed 42), fixed 64 shuffle partitions,
{iters} supersteps, fresh JVM per run. Parallelism is the only variable
— the sandbox stand-in for N vs 4N executor clusters per the driver
instructions.

| parallelism | wall sec | edges/sec/superstep |
|---|---|---|
| local[8]  (N)  | {r8['wall_sec']:.2f} | {r8['edges_per_sec_per_superstep']:,.0f} |
| local[32] (4N) | {r32['wall_sec']:.2f} | {r32['edges_per_sec_per_superstep']:,.0f} |

**Speedup 8→32: {speedup:.2f}× — scaling efficiency {eff:.3f}**
(target ≥ 0.8).
"""
        )


if __name__ == "__main__":
    main()
