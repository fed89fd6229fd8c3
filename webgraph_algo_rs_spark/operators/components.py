"""Connected components via hash-min label exchange (north rule №3).

Semantics match the reference's symmetric-graph CC
(``/root/reference/src/algo/sccs/symm_seq.rs:9-44``,
``symm_par.rs:21-69``): components of the symmetrized graph. Labels
start as the vertex id; every superstep each vertex takes the min of its
own and its neighbors' labels; fixpoint when nothing changes. The
emitted ``component`` is the min vertex id in the component — a
canonical, engine-independent id the DuckDB recursive-CTE oracle
reproduces exactly.

Delta frontier (systolic analog,
``/root/reference/src/algo/hyperball/hyperball_impl.rs:784-799``): only
vertices whose label changed last round scatter. Correct for min
propagation: an unchanged neighbor's message is identical to one already
absorbed via ``least(old_label, …)``.

``renumber_by_size`` mirrors ``sort_by_size``
(``/root/reference/src/algo/sccs/mod.rs:68-80``): components renumbered
``0..C-1`` by decreasing size, ties by min original id.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from webgraph_algo_rs_spark.checkpoint import CheckpointManager
from webgraph_algo_rs_spark.plans.superstep import (
    SRC,
    DST,
    bucketize,
    graph_vertices,
    materialize,
    symmetrize,
)


def connected_components(
    edges: DataFrame,
    max_iter: int = 10_000,
    checkpoint: CheckpointManager | None = None,
    stats: dict | None = None,
    bucketize_edges: bool = False,
) -> DataFrame:
    """Returns ``(vertex:bigint, component:bigint)`` on the symmetrized graph.

    ``bucketize_edges``: big-graph path — persist the symmetrized arcs
    bucketed on ``src`` once so each superstep shuffles only labels.
    """
    spark = edges.sparkSession
    sym_plan = symmetrize(edges).select(SRC, DST)
    drop_bucketed = None
    if bucketize_edges:
        sym, drop_bucketed = bucketize(sym_plan, SRC, table_name="wga_cc_edges")
    else:
        sym = materialize(sym_plan)

    history: list[dict] = []
    start_iter = 0
    state = None
    if checkpoint is not None:
        resumed = checkpoint.latest(spark)
        if resumed is not None:
            df, snap = resumed
            state = materialize(df.select("vertex", "label", "changed"))
            start_iter = snap.iteration + 1
            history = list(snap.history)
    if state is None:
        state = materialize(
            graph_vertices(sym).select(
                "vertex", F.col("vertex").alias("label"), F.lit(True).alias("changed")
            )
        )

    changed = 1
    it = start_iter
    for it in range(start_iter, max_iter):
        t0 = time.time()
        frontier = state.filter("changed")  # delta frontier: systolic scatter
        msgs = (
            frontier.join(sym, frontier.vertex == sym[SRC])
            .groupBy(DST)
            .agg(F.min("label").alias("nl"))
        )
        stepped = materialize(
            state.join(msgs, state.vertex == msgs[DST], "left")
            .select(
                "vertex",
                F.least("label", F.coalesce("nl", "label")).alias("label"),
                (F.coalesce("nl", "label") < F.col("label")).alias("changed"),
            )
        )
        changed = stepped.filter("changed").count()
        state = stepped
        metrics = {
            "algo": "cc",
            "iteration": it,
            "changed": changed,
            "wall_ms": int((time.time() - t0) * 1000),
        }
        history.append(metrics)
        if checkpoint is not None and checkpoint.should_save(it):
            checkpoint.save(state, it, metrics, history)
        if changed == 0:
            break

    if stats is not None:
        stats.update(iterations=it + 1 - start_iter, changed=changed)
    if drop_bucketed is not None:
        # state is materialized every superstep, so the result's lineage
        # no longer scans the scratch table — safe to drop it here
        drop_bucketed()
    return state.select("vertex", F.col("label").alias("component"))


def renumber_by_size(components: DataFrame) -> DataFrame:
    """``(vertex, component)`` → ``(vertex, component)`` with dense ids
    ``0..C-1`` ordered by decreasing component size (ties: min old id).

    At scale the number of *components* is far smaller than vertices, so
    the ranking window runs on the aggregated histogram, not the
    vertices; the join back is broadcast-able.
    """
    sizes = components.groupBy("component").count()
    w = Window.orderBy(F.desc("count"), F.asc("component"))
    mapping = sizes.select(
        "component", (F.row_number().over(w) - 1).cast("long").alias("new_component")
    )
    return (
        components.join(F.broadcast(mapping), "component")
        .select("vertex", F.col("new_component").alias("component"))
    )


def component_sizes(components: DataFrame) -> DataFrame:
    """Histogram of component sizes (``/root/reference/src/algo/sccs/mod.rs:55-61``)."""
    return components.groupBy("component").agg(F.count(F.lit(1)).alias("size"))
