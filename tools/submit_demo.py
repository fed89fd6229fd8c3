"""Package the engine as a ``--py-files`` zip and run it under
``spark-submit`` — the deployment path the north rule names. On a real
cluster the same two commands ship the engine to every executor; here
``--master local[N]`` stands in (no cluster manager in the sandbox).

Usage: python tools/submit_demo.py [sf_dir] [master]
Prints the job's one-line JSON result and exits non-zero on failure.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "webgraph_algo_rs_spark"


def build_zip(path: str = "/tmp/wga_pyfiles.zip") -> str:
    """Zip the library package exactly as a deploy pipeline would."""
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg_root = os.path.join(REPO, PKG)
        for root, _dirs, files in os.walk(pkg_root):
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    return path


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    master = sys.argv[2] if len(sys.argv) > 2 else "local[4]"
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(shutil.which("pyspark") or ""), "spark-submit"
    )
    zip_path = build_zip()
    proc = subprocess.run(
        [
            spark_submit,
            "--master", master,
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "submit_job.py"),
            sf_dir,
        ],
        capture_output=True,
        text=True,
        # the job script must resolve the engine from the zip, never from
        # the repo checkout — strip it from the child's import path
        cwd="/tmp",
        timeout=900,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("WGA_SUBMIT_RESULT "):
            print(line)
            return 0
    sys.stderr.write(proc.stdout[-2000:] + "\n" + proc.stderr[-4000:] + "\n")
    return 1


if __name__ == "__main__":
    sys.exit(main())
