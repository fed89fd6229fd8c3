"""Strongly connected components + SCC-DAG condensation (SURVEY §2.3
O1/O2/O16).

The reference computes SCCs with sequential DFS — Tarjan
(`/root/reference/src/algo/sccs/tarjan.rs:9-116`) and Kosaraju
(`/root/reference/src/algo/sccs/kosaraju.rs:17-56`) — which has no
scalable superstep analog (SURVEY §7 hard part №4). We re-express the
*semantics* (the exact SCC partition) with the parallel
coloring / forward-backward family (Orzan; Slota et al.), built purely
from DataFrame supersteps:

1. **Trim**: vertices with no in-arc or no out-arc among the remaining
   graph are singleton SCCs — peel them iteratively (the analog of
   Tarjan's cheap exits).
2. **Color**: propagate ``min`` vertex id forward to fixpoint — every
   vertex gets the smallest id that reaches it; color sets are unions
   of SCCs, and each color root ``r`` (``color(r) == r``) is the
   minimum id of its own SCC.
3. **Backward sweep**: multi-source BFS from *all* roots at once over
   reversed arcs, restricted to same-color vertices — exactly the
   per-component filtered visit of the reference
   (`src/algo/exact_sum_sweep/computer.rs:758-809`, filter ``:789``).
   The vertices reached form ``SCC(r)``; emit them with
   ``component = r`` (= min member id, the same canonical labeling as
   ``tests/oracles.tarjan_oracle``).
4. Remove finished SCCs, repeat. Every phase is a data-parallel
   superstep; rounds scale with the SCC-DAG's chain structure, not n.

``scc_condensation`` mirrors ``SccGraph``
(`src/algo/exact_sum_sweep/scc_graph.rs:109-221`): one row per DAG
edge, keeping the concrete bridge arc maximizing
``indeg(start) + outdeg(end)`` (the reference's
``outdeg_T(start) + outdeg(end)``), ties broken by min arc for
determinism.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph_algo_rs_spark.plans.superstep import (
    SRC,
    DST,
    UnionAccumulator,
    graph_vertices,
    materialize,
)


def _restrict(arcs: DataFrame, verts: DataFrame) -> DataFrame:
    """Arcs with both endpoints in ``verts`` (vertex column ``vertex``)."""
    s = verts.select(F.col("vertex").alias(SRC))
    d = verts.select(F.col("vertex").alias(DST))
    return arcs.join(s, SRC, "left_semi").join(d, DST, "left_semi")


def strongly_connected_components(
    edges: DataFrame,
    max_rounds: int = 1000,
    stats: dict | None = None,
) -> DataFrame:
    """Returns ``(vertex:bigint, component:bigint)``; ``component`` is
    the min vertex id of the SCC (Tarjan-oracle-canonical)."""
    spark = edges.sparkSession
    arcs = materialize(
        edges.select(SRC, DST).filter(F.col(SRC) != F.col(DST)).distinct()
    )
    remaining_v = materialize(graph_vertices(edges))
    remaining_e = arcs
    # bounded-depth result plan over many trim/peel rounds (VERDICT r1:
    # one union child per round blows up Catalyst on deep graphs)
    done = UnionAccumulator()
    t_start = time.time()
    rounds = 0

    for rounds in range(1, max_rounds + 1):
        # ---- 1. trim singleton SCCs iteratively
        while True:
            has_out = remaining_e.select(F.col(SRC).alias("vertex")).distinct()
            has_in = remaining_e.select(F.col(DST).alias("vertex")).distinct()
            core = has_out.join(has_in, "vertex")  # needs both to be cyclic
            trivial = materialize(remaining_v.join(core, "vertex", "left_anti"))
            if trivial.isEmpty():
                break
            done.add(
                trivial.select("vertex", F.col("vertex").alias("component"))
            )
            remaining_v = materialize(remaining_v.join(trivial, "vertex", "left_anti"))
            remaining_e = materialize(_restrict(remaining_e, remaining_v))
        if remaining_v.isEmpty():
            break

        # ---- 2. forward min-id coloring to fixpoint (delta frontier)
        color = materialize(
            remaining_v.select(
                "vertex", F.col("vertex").alias("color"), F.lit(True).alias("changed")
            )
        )
        while True:
            frontier = color.filter("changed")
            msgs = (
                frontier.join(remaining_e, frontier.vertex == remaining_e[SRC])
                .groupBy(DST)
                .agg(F.min("color").alias("nc"))
            )
            color = materialize(
                color.join(msgs, color.vertex == msgs[DST], "left")
                .select(
                    "vertex",
                    F.least("color", F.coalesce("nc", "color")).alias("color"),
                    (F.coalesce("nc", "color") < F.col("color")).alias("changed"),
                )
            )
            if color.filter("changed").isEmpty():
                break

        # ---- 3. backward multi-source BFS from roots, same-color only —
        # the filtered-visit contract (visits/mod.rs:81-89) reused via
        # bfs_distances: flood tag = color root, per-flood filter =
        # "vertex has this color" (a vertex joins only its own color's
        # flood, so the floods are disjoint)
        from webgraph_algo_rs_spark.operators.bfs import bfs_distances

        colored = color.select("vertex", "color")
        transpose = remaining_e.select(
            F.col(DST).alias(SRC), F.col(SRC).alias(DST)
        )
        roots = colored.filter(F.col("vertex") == F.col("color")).select(
            F.col("vertex").alias("source")
        )
        flood = bfs_distances(
            transpose,
            roots,
            vertex_filter=colored.select(F.col("color").alias("source"), "vertex"),
        )
        visited = materialize(
            flood.select("vertex", F.col("source").alias("component"))
        )

        done.add(visited)
        remaining_v = materialize(
            remaining_v.join(visited, "vertex", "left_anti")
        )
        remaining_e = materialize(_restrict(remaining_e, remaining_v))
        if remaining_v.isEmpty():
            break

    if stats is not None:
        stats.update(rounds=rounds, wall_sec=time.time() - t_start)
    out = done.result()
    if out is None:
        return spark.createDataFrame([], "vertex bigint, component bigint")
    return out


def radial_vertices(
    edges: DataFrame, components: DataFrame | None = None
) -> DataFrame:
    """Vertices that can reach the largest SCC: ``(vertex, is_radial)``.

    Mirrors ``compute_radial_vertices``
    (`/root/reference/src/algo/exact_sum_sweep/computer.rs:488-534`):
    one backward BFS (BFS over reversed arcs) from a representative of
    the largest SCC (ties: min component id, reference uses argmax scan
    order; representative = min member id for determinism).
    """
    from webgraph_algo_rs_spark.operators.bfs import bfs_distances

    comps = components if components is not None else strongly_connected_components(edges)
    largest = (
        comps.groupBy("component")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.max_by(
                "component", F.struct(F.col("n"), (-F.col("component")).alias("t"))
            ).alias("c")
        )
        .first()["c"]
    )
    rep = (
        comps.filter(F.col("component") == F.lit(largest))
        .agg(F.min("vertex"))
        .first()[0]
    )
    if rep is None:  # empty graph: no SCCs, no radial set
        return edges.sparkSession.createDataFrame(
            [], "vertex bigint, is_radial boolean"
        )
    transpose = edges.select(
        F.col(DST).alias(SRC), F.col(SRC).alias(DST), "weight"
    )
    reached = bfs_distances(transpose, [int(rep)]).select("vertex")
    verts = graph_vertices(edges)
    return verts.join(
        reached.withColumn("is_radial", F.lit(True)), "vertex", "left"
    ).select("vertex", F.coalesce("is_radial", F.lit(False)).alias("is_radial"))


def scc_condensation(edges: DataFrame, components: DataFrame) -> DataFrame:
    """SCC-DAG: ``(c_src, c_dst, n_arcs, bridge_src, bridge_dst)``.

    Per DAG edge keeps the bridge arc maximizing
    ``indeg(bridge_src) + outdeg(bridge_dst)`` — the reference's
    ``find_edges_through_scc`` choice
    (`scc_graph.rs:139-221`: transpose-outdegree of the start plus
    outdegree of the end) — ties by min ``(src, dst)``.
    """
    arcs = edges.select(SRC, DST).distinct()
    outdeg = arcs.groupBy(SRC).agg(F.count(F.lit(1)).alias("outdeg"))
    indeg = arcs.groupBy(DST).agg(F.count(F.lit(1)).alias("indeg"))
    labeled = (
        arcs.join(
            components.select(
                F.col("vertex").alias(SRC), F.col("component").alias("c_src")
            ),
            SRC,
        )
        .join(
            components.select(
                F.col("vertex").alias(DST), F.col("component").alias("c_dst")
            ),
            DST,
        )
        .filter(F.col("c_src") != F.col("c_dst"))
        .join(indeg.select(F.col(DST).alias(SRC), "indeg"), SRC, "left")
        .join(outdeg.select(F.col(SRC).alias(DST), "outdeg"), DST, "left")
        .select(
            "c_src",
            "c_dst",
            SRC,
            DST,
            (
                F.coalesce("indeg", F.lit(0)) + F.coalesce("outdeg", F.lit(0))
            ).alias("score"),
        )
    )
    return labeled.groupBy("c_src", "c_dst").agg(
        F.count(F.lit(1)).alias("n_arcs"),
        F.max_by(
            F.struct(F.col(SRC).alias("s"), F.col(DST).alias("d")),
            F.struct(F.col("score"), (-F.col(SRC)).alias("ns"), (-F.col(DST)).alias("nd")),
        ).alias("bridge"),
    ).select(
        "c_src",
        "c_dst",
        "n_arcs",
        F.col("bridge.s").alias("bridge_src"),
        F.col("bridge.d").alias("bridge_dst"),
    )
