"""Synchronous weighted label propagation (north rule №4).

Each superstep every vertex adopts the label with the maximum incoming
weight sum among its (symmetrized) neighbors, ties broken by the *min*
label; stops at fixpoint or ``max_iter`` (synchronous LPA can oscillate
on bipartite structure, hence the iteration cap — the reference's
analogous cap is HyperBall's relative-increment stop,
``/root/reference/src/algo/hyperball/hyperball_impl.rs:565-570``).

The tally is a two-stage aggregation — ``groupBy(dst, label).sum(w)``
then ``groupBy(dst).max_by(label, (w, -label))`` — both with map-side
partial aggregation, so a hot vertex's fan-in is pre-combined per map
partition before the shuffle.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph_algo_rs_spark.checkpoint import CheckpointManager
from webgraph_algo_rs_spark.plans.superstep import (
    SRC,
    DST,
    W,
    bucketize,
    graph_vertices,
    materialize,
    symmetrize,
)


def label_propagation(
    edges: DataFrame,
    max_iter: int = 20,
    checkpoint: CheckpointManager | None = None,
    stats: dict | None = None,
    bucketize_edges: bool = False,
) -> DataFrame:
    """Returns ``(vertex:bigint, label:bigint)``.

    ``bucketize_edges``: big-graph path — persist the symmetrized arcs
    bucketed on ``src`` once so each superstep shuffles only labels.
    """
    spark = edges.sparkSession
    drop_bucketed = None
    if bucketize_edges:
        sym, drop_bucketed = bucketize(
            symmetrize(edges), SRC, table_name="wga_lpa_edges"
        )
    else:
        sym = materialize(symmetrize(edges))

    history: list[dict] = []
    start_iter = 0
    state = None
    if checkpoint is not None:
        resumed = checkpoint.latest(spark)
        if resumed is not None:
            df, snap = resumed
            state = materialize(df.select("vertex", "label"))
            start_iter = snap.iteration + 1
            history = list(snap.history)
    if state is None:
        state = materialize(
            graph_vertices(sym).select("vertex", F.col("vertex").alias("label"))
        )

    changed = -1
    it = start_iter
    for it in range(start_iter, max_iter):
        t0 = time.time()
        tally = (
            state.join(sym, state.vertex == sym[SRC])
            .groupBy(DST, "label")
            .agg(F.sum(W).alias("wsum"))
        )
        best = tally.groupBy(DST).agg(
            F.max_by("label", F.struct(F.col("wsum"), (-F.col("label")).alias("neg"))).alias(
                "new_label"
            )
        )
        stepped = materialize(
            state.join(best, state.vertex == best[DST], "left")
            .select(
                "vertex",
                F.coalesce("new_label", "label").alias("label"),
                (F.coalesce("new_label", "label") != F.col("label")).alias("changed"),
            )
        )
        changed = stepped.filter("changed").count()
        state = stepped.select("vertex", "label")
        metrics = {
            "algo": "lpa",
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
        # `stepped` was materialized, so the result no longer reads the
        # scratch table; drop it to avoid leaking an edge copy per run
        drop_bucketed()
    return state
