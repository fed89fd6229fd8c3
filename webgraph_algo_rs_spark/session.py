"""SparkSession construction with scale-oriented defaults.

The reference tunes its runtime via rustc/LTO flags
(``/root/reference/Cargo.toml:39-43``); our analog is Spark conf:
AQE (runtime re-planning, skew-join splitting), Arrow for the
pandas-UDF kernels, and shuffle-partition sizing.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "webgraph-algo-rs-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` in this sandbox;
    on a real cluster callers pass a YARN/K8s master or ship via
    ``spark-submit --py-files`` and the builder inherits the submit conf.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] → N; local[*]/cluster → leave a sane default.
        try:
            shuffle_partitions = int(master.split("[")[1].rstrip("]*") or 32)
        except (IndexError, ValueError):
            shuffle_partitions = 32

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Keep Spark's default 10MB broadcast threshold. A larger one
        # lets Catalyst broadcast a mid-size *edge table* inside the
        # iterative superstep joins — a driver-serial HashedRelation
        # build every iteration that destroys scaling (measured: 4.6M
        # edges broadcast per superstep ≈ flat wall-clock from 2→32
        # cores). Genuinely small dims are broadcast explicitly.
        # Shuffled-hash beats sort-merge for the state⋈messages joins
        # (state is pre-aggregated, no ordering to exploit).
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
