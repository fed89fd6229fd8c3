"""Job script for ``spark-submit --py-files`` deployment (north rule:
"ships via spark-submit --py-files on multi-executor clusters").

Run via :mod:`tools.submit_demo`, which zips the library and submits:

    spark-submit --master local[4] --py-files /tmp/wga_pyfiles.zip \
        tools/submit_job.py /root/testdata/sf0.001

The script imports the engine *only* from the ``--py-files`` archive
(the repo dir is not on ``sys.path`` here — that is the point), runs the
flagship per-vertex summary, and prints one JSON line.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    # inherit master/conf from spark-submit; set only what the engine needs
    spark = (
        SparkSession.builder.appName("wga-submit-demo")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    from webgraph_algo_rs_spark.operators import connected_components, pagerank
    from webgraph_algo_rs_spark.sources.tables import events_user_edges

    edges = events_user_edges(spark, sf_dir).localCheckpoint(eager=True)
    stats: dict = {}
    pr = pagerank(edges, tol=1e-6, max_iter=100, stats=stats)
    cc = connected_components(edges)
    out = {
        "n_vertices": cc.count(),
        "n_components": cc.select("component").distinct().count(),
        "pagerank_iterations": stats["iterations"],
        "pagerank_residual": stats["residual"],
        "rank_sum": float(pr.agg({"rank": "sum"}).first()[0]),
    }
    print("WGA_SUBMIT_RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
