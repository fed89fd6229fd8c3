import pytest

from webgraph_algo_rs_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g", "spark.sql.warehouse.dir": "/tmp/spark-wh"},
    )
    yield s
    s.stop()


def edge_df(spark, arcs, weights=None):
    """Arc list [(u,v),...] → edge DataFrame (unit weights by default)."""
    if weights is None:
        weights = [1.0] * len(arcs)
    rows = [(int(u), int(v), float(w)) for (u, v), w in zip(arcs, weights)]
    return spark.createDataFrame(
        rows, "src_vertex bigint, dst_vertex bigint, weight double"
    )


# Canonical micro-graphs lifted from the reference's tests (FIXTURES.md §3)
DIAMOND = [(0, 1), (1, 2), (2, 0), (1, 3)]
NINE = [
    (0, 0), (1, 0), (1, 2), (2, 1), (2, 3), (2, 4), (2, 5),
    (3, 4), (4, 3), (5, 5), (5, 6), (5, 7), (5, 8), (6, 7), (8, 7),
]
CYCLE4 = [(0, 1), (1, 2), (2, 3), (3, 0)]
COMPLETE5 = [(i, j) for i in range(5) for j in range(5) if i != j]
TREE7 = [(0, 1), (0, 2), (1, 3), (1, 4), (2, 5), (2, 6)]
DAG4 = [(0, 1), (0, 2), (2, 3), (1, 3)]


def er_graph(n, p, seed):
    """Seeded Erdős–Rényi arc list (reference: tests/test_sccs.rs:225-227)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    m = rng.random((n, n)) < p
    np.fill_diagonal(m, False)
    return [(int(i), int(j)) for i, j in zip(*np.nonzero(m))]
