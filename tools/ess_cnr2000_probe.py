"""Round-4 probe: directed ExactSumSweep (RadiusDiameter level) on
cnr-2000 with progress logging — the committed evidence for closing the
round-3 plateau (VERDICT r3 §next №1). Run:

    WGA_PROGRESS=1 python tools/ess_cnr2000_probe.py | tee bench_logs/ess_cnr2000_r4.log
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("WGA_PROGRESS", "1")

from webgraph_algo_rs_spark.session import get_spark
from webgraph_algo_rs_spark.sources.bvgraph import read_bv_edges
from webgraph_algo_rs_spark.operators import radius_diameter_directed

CNR = "/root/reference/tests/graphs/cnr-2000"

spark = get_spark(app_name="ess-cnr2000", master="local[32]")
spark.sparkContext.setLogLevel("ERROR")
edges = read_bv_edges(spark, CNR).localCheckpoint(eager=True)
print("edges", edges.count(), flush=True)
t0 = time.time()
stats: dict = {}
row = radius_diameter_directed(edges, stats=stats).first()
print("RESULT", row, flush=True)
print("stats", stats, "wall", round(time.time() - t0, 1), flush=True)
spark.stop()
