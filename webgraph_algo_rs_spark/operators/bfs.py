"""Level-synchronous multi-source BFS — the Spark form of the reference's
traversal primitives (T1–T3).

The reference's sequential BFS marks distance by level separators in the
queue (``/root/reference/src/algo/visits/breadth_first/seq.rs:89-219``)
and the parallel variants claim vertices with an atomic bit swap
(``par_fair.rs:178``). Here the frontier is a DataFrame; the "claim" is
a ``left_anti`` join against the visited set; distance is the driver's
loop counter. All sources advance in one superstep — the reference
needs one filtered BFS *per component pivot*
(``exact_sum_sweep/computer.rs:758-809``); we seed the frontier with all
``(source, tag)`` pairs at once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph_algo_rs_spark.plans.superstep import SRC, DST, materialize


def bfs_distances(
    edges: DataFrame,
    sources: list[int] | DataFrame,
    max_depth: int = 10_000,
) -> DataFrame:
    """Distances from each source: ``(source:bigint, vertex:bigint, distance:bigint)``.

    Unreached vertices are absent (the reference's ``Unknown``-only event
    stream — ``breadth_first/mod.rs:23-68``).
    """
    spark = edges.sparkSession
    e = edges.select(SRC, DST).distinct()
    if isinstance(sources, list):
        sources = spark.createDataFrame(
            [(int(s),) for s in sources], "source bigint"
        )
    frontier = materialize(
        sources.select("source", F.col("source").alias("vertex"))
    )
    # The visited set carries the distance, so it doubles as the result
    # accumulator: it is materialized every level anyway (the claim
    # anti-join needs it), which keeps the final plan O(1) deep instead
    # of one union child per level — a 10^4-diameter chain would
    # otherwise blow up Catalyst analysis before any data moves.
    visited = materialize(frontier.withColumn("distance", F.lit(0).cast("long")))
    for depth in range(1, max_depth + 1):
        nxt = (
            frontier.join(e, frontier.vertex == e[SRC])
            .select("source", F.col(DST).alias("vertex"))
            .distinct()
            .join(visited, ["source", "vertex"], "left_anti")
        )
        frontier = materialize(nxt)
        if frontier.isEmpty():
            break
        visited = materialize(
            visited.unionByName(
                frontier.withColumn("distance", F.lit(depth).cast("long"))
            )
        )
    return visited
