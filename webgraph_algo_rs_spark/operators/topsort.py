"""Topological layering + acyclicity via iterative Kahn peel (SURVEY O5).

The reference's ``top_sort``/``acyclicity`` are DFS-postorder based
(``/root/reference/src/algo/top_sort.rs:10-37``,
``/root/reference/src/algo/acyclicity.rs:9-30``) — inherently
sequential. The parallel re-expression: repeatedly peel the zero
in-degree vertex set (one layer per superstep). The graph is acyclic
iff the peel consumes every vertex; a round that removes nothing while
vertices remain proves a cycle (the ``Revisit{on_stack}`` break analog).

A Kahn *layering* is a valid topological order when read layer by layer
(within a layer, order by vertex id for determinism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph_algo_rs_spark.plans.superstep import (
    SRC,
    DST,
    UnionAccumulator,
    graph_vertices,
    materialize,
)


def kahn_layers(edges: DataFrame, max_iter: int = 10_000) -> DataFrame:
    """``(vertex:bigint, layer:bigint)`` for the acyclic part of the graph.

    Vertices on (or only reachable through) cycles get no row.
    """
    remaining_edges = materialize(edges.select(SRC, DST).distinct())
    remaining_vertices = materialize(graph_vertices(remaining_edges))
    # bounded-depth result plan on 10^4-layer graphs (see UnionAccumulator)
    layers = UnionAccumulator()
    for layer in range(max_iter):
        with_in = remaining_edges.select(F.col(DST).alias("vertex")).distinct()
        zero_in = materialize(remaining_vertices.join(with_in, "vertex", "left_anti"))
        if zero_in.isEmpty():
            break  # leftovers are cyclic
        layers.add(zero_in.withColumn("layer", F.lit(layer).cast("long")))
        remaining_vertices = materialize(
            remaining_vertices.join(zero_in, "vertex", "left_anti")
        )
        remaining_edges = materialize(
            remaining_edges.join(
                zero_in.select(F.col("vertex").alias(SRC)), SRC, "left_anti"
            )
        )
        if remaining_vertices.isEmpty():
            break
    res = layers.result()
    if res is None:
        return edges.sparkSession.createDataFrame([], "vertex bigint, layer bigint")
    return res


def is_acyclic(edges: DataFrame) -> bool:
    """True iff the directed graph has no cycle (self-loops are cycles)."""
    n = graph_vertices(edges.select(SRC, DST)).count()
    return kahn_layers(edges).count() == n
