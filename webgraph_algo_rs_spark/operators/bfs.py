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

from itertools import count

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph_algo_rs_spark.plans.superstep import SRC, DST, materialize


def bfs_distances(
    edges: DataFrame,
    sources: list[int] | DataFrame,
    max_depth: int | None = None,
    predecessors: bool = False,
    vertex_filter: DataFrame | None = None,
    local_mode: bool | None = None,
) -> DataFrame:
    """Distances from each source:
    ``(source:bigint, vertex:bigint, distance:bigint[, pred:bigint])``.

    Unreached vertices are absent (the reference's ``Unknown``-only event
    stream — ``breadth_first/mod.rs:23-68``).

    ``max_depth=None`` (default) runs until every frontier empties —
    always terminates (each level claims ≥1 new vertex, so ≤ |V|
    levels). An int caps the flood at that many levels; distances beyond
    it are absent, so a cap silently truncates long floods — never pass
    one from an algorithm whose correctness needs full eccentricities
    (ExactSumSweep learned this the hard way: a 10⁴ default here would
    mis-certify the diameter of a 20k-vertex path graph).

    ``predecessors=True`` adds ``pred`` — the *minimum* predecessor that
    discovered the vertex (``NULL`` for sources). The reference's
    ``ParFairPred`` events carry the pred that won the atomic claim
    (``par_fair.rs:88-98,178``); our deterministic replacement for that
    race is the min aggregate.

    ``vertex_filter`` is the reference's node-filter contract
    (``visits/mod.rs:81-89``), applied at discovery time, sources
    included: either a ``(vertex)`` set restricting every flood, or
    ``(source, vertex)`` pairs allowing a different filter per flood —
    the latter is how SCC's same-color backward sweep reuses this
    function.

    ``local_mode``: ``True`` forces the partition-local CSR kernel
    (``plans/local_csr.bfs_local`` — every flood level-synchronous
    inside one ``mapInPandas`` task, one Spark job per call instead of
    one barrier per BFS level), ``False`` forbids it, ``None``
    auto-picks it under ``wga.localKernelMaxEdges`` edges. The probe
    counts at most threshold+1 raw edge rows (a conservative upper
    bound on the distinct count), so dispatch never scans a huge table.
    """
    spark = edges.sparkSession
    if isinstance(sources, list):
        sources = spark.createDataFrame(
            [(int(s),) for s in sources], "source bigint"
        )
    if local_mode is not False:
        from webgraph_algo_rs_spark.plans.local_csr import (
            LOCAL_BFS_MAX_SOURCES_CONF,
            LOCAL_BFS_MAX_SOURCES_DEFAULT,
            bfs_local,
            local_kernel_threshold,
            probe_edge_count,
        )

        thr = local_kernel_threshold(spark)
        eligible = local_mode or (
            thr > 0 and probe_edge_count(edges.select(SRC, DST), thr) <= thr
        )
        if eligible and not local_mode:
            # unfiltered (or globally filtered) floods emit up to
            # |sources|·|reached| rows from the ONE kernel task — cap the
            # source count so a mass flood (the ESS endgame seeds every
            # open vertex) keeps the partitioned distributed path. A
            # per-source filter bounds output by the filter's row count,
            # so the per-SCC flood pattern stays local at any SCC count.
            if vertex_filter is None or "source" not in vertex_filter.columns:
                try:
                    src_cap = int(
                        spark.conf.get(
                            LOCAL_BFS_MAX_SOURCES_CONF,
                            str(LOCAL_BFS_MAX_SOURCES_DEFAULT),
                        )
                    )
                except (TypeError, ValueError):
                    src_cap = LOCAL_BFS_MAX_SOURCES_DEFAULT
                eligible = (
                    probe_edge_count(sources.select("source"), src_cap) <= src_cap
                )
        if eligible:
            return bfs_local(
                edges.select(SRC, DST), sources, max_depth, predecessors, vertex_filter
            )
    e = edges.select(SRC, DST).distinct()
    seeds = sources.select("source", F.col("source").alias("vertex"))
    fcols = None
    if vertex_filter is not None:
        fcols = (
            ["source", "vertex"]
            if "source" in vertex_filter.columns
            else ["vertex"]
        )
        seeds = seeds.join(vertex_filter, fcols, "left_semi")
    frontier = materialize(seeds)
    pred_cols = (
        [F.lit(None).cast("bigint").alias("pred")] if predecessors else []
    )
    # The visited set carries the distance, so it doubles as the result
    # accumulator: it is materialized every level anyway (the claim
    # anti-join needs it), which keeps the final plan O(1) deep instead
    # of one union child per level — a 10^4-diameter chain would
    # otherwise blow up Catalyst analysis before any data moves.
    visited = materialize(
        frontier.select(
            "source", "vertex", F.lit(0).cast("long").alias("distance"), *pred_cols
        )
    )
    depths = count(1) if max_depth is None else range(1, max_depth + 1)
    for depth in depths:
        disc = frontier.join(e, frontier["vertex"] == e[SRC]).select(
            "source", e[DST].alias("vertex"), frontier["vertex"].alias("pv")
        )
        # min-predecessor claim (one row per discovered vertex) — same
        # shuffle as the old distinct(), but deterministic pred for free
        nxt = disc.groupBy("source", "vertex").agg(F.min("pv").alias("pred"))
        if vertex_filter is not None:
            nxt = nxt.join(vertex_filter, fcols, "left_semi")
        frontier = materialize(nxt.join(visited, ["source", "vertex"], "left_anti"))
        if frontier.isEmpty():
            break
        visited = materialize(
            visited.unionByName(
                frontier.select(
                    "source",
                    "vertex",
                    F.lit(depth).cast("long").alias("distance"),
                    *(["pred"] if predecessors else []),
                )
            )
        )
    return visited
