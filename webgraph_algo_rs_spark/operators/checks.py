"""Graph-structure verification predicates (SURVEY §2.5 A8).

The reference verifies in parallel that a graph is symmetric and that a
second graph is the transpose of the first
(`/root/reference/src/utils/mod.rs:77-111,117-136`) before running
algorithms that require it. Spark re-expression: set difference of arc
tables (anti-join), which Catalyst executes as a shuffled or broadcast
hash join — no per-element loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph_algo_rs_spark.plans.superstep import SRC, DST


def _arcs(edges: DataFrame) -> DataFrame:
    return edges.select(SRC, DST).distinct()


def _transpose(edges: DataFrame) -> DataFrame:
    return edges.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))


def is_symmetric(edges: DataFrame) -> bool:
    """True iff for every arc (u, v) the arc (v, u) exists
    (`utils/mod.rs:77-111`)."""
    a = _arcs(edges)
    return a.exceptAll(_transpose(a)).isEmpty()


def is_transpose_of(edges: DataFrame, transposed: DataFrame) -> bool:
    """True iff ``transposed``'s arc set is exactly the reverse of
    ``edges``'s (`utils/mod.rs:117-136`)."""
    a, t = _arcs(edges), _arcs(transposed)
    rev = _transpose(a)
    return rev.exceptAll(t).isEmpty() and t.exceptAll(rev).isEmpty()
