"""Deployment-path test: the engine must run under
``spark-submit --py-files <zip>`` with the library resolved from the
archive, not the checkout (north rule: ships via spark-submit
--py-files on multi-executor clusters)."""

from __future__ import annotations

import json
import subprocess
import sys


def test_spark_submit_pyfiles_roundtrip():
    proc = subprocess.run(
        [sys.executable, "/root/repo/tools/submit_demo.py", "/root/testdata/sf0.001"],
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = next(
        l for l in proc.stdout.splitlines() if l.startswith("WGA_SUBMIT_RESULT ")
    )
    res = json.loads(line.split(" ", 1)[1])
    assert res["n_vertices"] > 0
    assert res["pagerank_residual"] < 1e-6
    assert abs(res["rank_sum"] - 1.0) < 1e-9
