"""Exact eccentricities / radius / diameter via SumSweep-style bound
tightening (SURVEY §2.3 O14/O15/O17/O18, undirected semantics).

The reference's ExactSumSweep
(`/root/reference/src/algo/exact_sum_sweep/computer.rs:307-417`) keeps
per-vertex lower/upper eccentricity bounds, repeatedly runs a BFS from
an adaptively chosen pivot, and stops when no vertex's bounds are open.
Undirected variant (`output_level.rs:290-451`,
`tests/test_undir_sum_sweep.rs`). Our re-expression keeps the exact
semantics with two Spark-first changes:

* **one multi-source BFS per round, all components at once** — the
  reference runs a *filtered* per-SCC visit per thread
  (`computer.rs:758-809`); we seed every component's pivot into a
  single frontier tagged with the pivot id; an undirected BFS never
  leaves its component, so no filter column is needed;
* **pivot selection per component** is a single
  ``groupBy(component).agg(max_by(...))`` — the reference's
  ``find_best_pivot`` scan (`computer.rs:424-479`);
* bound updates are pure column ops: after a BFS from pivot *p* with
  eccentricity ``ecc_p``, every reached vertex gets
  ``low = greatest(low, d)``, ``high = least(high, d + ecc_p)``
  (the textbook SumSweep bounds the reference tightens in
  `computer.rs:566-713,818-936`).

Rounds alternate the selection rule between "largest open upper bound"
(tightens the diameter side) and "smallest open lower bound" (radius
side) — a two-rule simplification of the reference's five-way
utility-driven chooser (`computer.rs:340-414`): same fixpoint, fewer
moving parts; termination is identical (no open vertex).

Semantics on disconnected graphs: eccentricity within each connected
component; ``diameter = max``, ``radius = min`` over all vertices.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph_algo_rs_spark.operators.components import connected_components
from webgraph_algo_rs_spark.plans.superstep import (
    SRC,
    DST,
    materialize,
    symmetrize,
)

_INF = (1 << 62)


def _tagged_bfs(sym: DataFrame, seeds: DataFrame) -> DataFrame:
    """BFS from every seed at once over symmetric arcs ``sym``, each
    flood tagged by its seed (the reference's per-thread pivot visits,
    `computer.rs:758-809`, collapsed into one superstep sequence).

    ``seeds``: ``(vertex, pivot)`` with ``vertex == pivot``. Returns
    ``(vertex, pivot, dist)`` for every (vertex, pivot-flood) pair
    reached. State is |pivots|/component × component size — bounded by
    the per-round pivot budget, not the graph.
    """
    dist = materialize(seeds.select("vertex", "pivot", F.lit(0).cast("long").alias("dist")))
    frontier = dist
    d = 0
    while True:
        d += 1
        nxt = (
            frontier.join(sym, frontier.vertex == sym[SRC])
            .select(F.col(DST).alias("vertex"), "pivot")
            .distinct()
        )
        new = materialize(
            nxt.join(dist, ["vertex", "pivot"], "left_anti")
            .withColumn("dist", F.lit(d).cast("long"))
        )
        if new.isEmpty():
            return dist
        # materialize the growing union each level: the anti-join above
        # re-scans `dist` every level, so a lazy diameter-deep union
        # chain would be re-executed per level AND blow up Catalyst
        # analysis on 10^4-diameter graphs
        dist = materialize(dist.unionByName(new))
        frontier = new


def eccentricities(
    edges: DataFrame,
    max_rounds: int = 10_000,
    pivots_per_rule: int = 4,
    stats: dict | None = None,
) -> DataFrame:
    """Exact per-vertex undirected eccentricities:
    ``(vertex, component, ecc)`` (reference output level ``All``).

    Per round, each component contributes up to ``2·pivots_per_rule``
    pivots — the top open vertices under the diameter rule (largest
    upper bound) and radius rule (smallest lower bound) — all flooded in
    one tagged multi-source BFS. Batching pivots trades a slightly
    larger BFS state for far fewer rounds (each superstep loop has fixed
    driver latency, the per-round killer on high-round graphs).
    """
    from pyspark.sql import Window

    sym = materialize(symmetrize(edges).select(SRC, DST))
    comps = connected_components(edges)
    state = materialize(
        comps.select(
            "vertex",
            "component",
            F.lit(0).cast("long").alias("low"),
            F.lit(_INF).cast("long").alias("high"),
        )
    )
    rounds = 0
    n_bfs = 0
    t0 = time.time()
    w_dia = Window.partitionBy("component").orderBy(
        F.desc("high"), F.asc("vertex")
    )
    w_rad = Window.partitionBy("component").orderBy(
        F.asc("low"), F.asc("vertex")
    )
    for rounds in range(1, max_rounds + 1):
        open_v = state.filter(F.col("low") < F.col("high"))
        if open_v.isEmpty():
            break
        pivots = (
            open_v.withColumn("rd", F.row_number().over(w_dia))
            .withColumn("rr", F.row_number().over(w_rad))
            .filter(
                (F.col("rd") <= pivots_per_rule) | (F.col("rr") <= pivots_per_rule)
            )
            .select("vertex", F.col("vertex").alias("pivot"))
        )
        dist = _tagged_bfs(sym, pivots)
        n_bfs += 1
        ecc_p = dist.groupBy("pivot").agg(F.max("dist").alias("ecc_p"))
        # fold all pivots' evidence per vertex before touching state:
        # ecc(v) ≥ d(p,v), ecc(v) ≥ ecc(p) − d(p,v) (triangle inequality,
        # closing p itself at d=0); ecc(v) ≤ d(p,v) + ecc(p)
        upd = (
            dist.join(ecc_p, "pivot")
            .groupBy("vertex")
            .agg(
                F.max(
                    F.greatest(F.col("dist"), F.col("ecc_p") - F.col("dist"))
                ).alias("lo"),
                F.min(F.col("dist") + F.col("ecc_p")).alias("hi"),
            )
        )
        state = materialize(
            state.join(upd, "vertex", "left")
            .select(
                "vertex",
                "component",
                F.greatest("low", F.coalesce("lo", F.lit(0))).alias("low"),
                F.least("high", F.coalesce("hi", F.lit(_INF))).alias("high"),
            )
        )
    if stats is not None:
        stats.update(rounds=rounds, bfs_runs=n_bfs, wall_sec=time.time() - t0)
    return state.select("vertex", "component", F.col("low").alias("ecc"))


def radius_diameter(edges: DataFrame, stats: dict | None = None) -> DataFrame:
    """One-row ``(radius, diameter, radius_vertex, diameter_vertex)``
    (reference output level ``RadiusDiameter``,
    `output_level.rs:247-287`; ties broken by min vertex id)."""
    ecc = eccentricities(edges, stats=stats)
    return ecc.agg(
        F.min("ecc").alias("radius"),
        F.max("ecc").alias("diameter"),
        F.min_by("vertex", F.struct(F.col("ecc"), F.col("vertex"))).alias(
            "radius_vertex"
        ),
        F.max_by(
            "vertex", F.struct(F.col("ecc"), (-F.col("vertex")).alias("t"))
        ).alias("diameter_vertex"),
    )
