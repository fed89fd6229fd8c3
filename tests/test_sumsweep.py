"""SumSweep eccentricity tests — the reference's hand-made fixtures
(`/root/reference/tests/test_undir_sum_sweep.rs:14-89`,
`tests/test_exact_sum_sweep.rs:16-150`: path / star / lozenge cases)
plus random cross-checks vs the brute-force all-BFS oracle."""

from __future__ import annotations

import pytest

from tests.conftest import CYCLE4, edge_df, er_graph
from tests.oracles import eccentricity_oracle

from webgraph_algo_rs_spark.operators.sumsweep import eccentricities, radius_diameter

PATH5 = [(0, 1), (1, 2), (2, 3), (3, 4)]
STAR6 = [(0, i) for i in range(1, 6)]
LOZENGE = [(0, 1), (0, 2), (1, 3), (2, 3)]


def ecc_map(spark, arcs):
    return {
        r.vertex: r.ecc for r in eccentricities(edge_df(spark, arcs)).collect()
    }


def test_path_eccentricities(spark):
    assert ecc_map(spark, PATH5) == {0: 4, 1: 3, 2: 2, 3: 3, 4: 4}


def test_star_radius_diameter(spark):
    row = radius_diameter(edge_df(spark, STAR6)).first()
    assert (row.radius, row.diameter) == (1, 2)
    assert row.radius_vertex == 0  # center
    assert row.diameter_vertex == 1  # min-id leaf


def test_lozenge_and_cycle(spark):
    assert set(ecc_map(spark, LOZENGE).values()) == {2}
    assert set(ecc_map(spark, CYCLE4).values()) == {2}


def test_disconnected_components(spark):
    arcs = PATH5 + [(10, 11), (11, 12)]  # path of 5 + path of 3
    got = ecc_map(spark, arcs)
    assert got[10] == 2 and got[11] == 1 and got[12] == 2
    row = radius_diameter(edge_df(spark, arcs)).first()
    assert (row.radius, row.diameter) == (1, 4)
    assert row.radius_vertex == 11


@pytest.mark.parametrize("n,p,seed", [(20, 0.1, 5), (30, 0.08, 9)])
def test_random_cross_check(spark, n, p, seed):
    arcs = er_graph(n, p, seed)
    if not arcs:
        pytest.skip("empty graph")
    stats: dict = {}
    got = {
        r.vertex: r.ecc
        for r in eccentricities(edge_df(spark, arcs), stats=stats).collect()
    }
    want = eccentricity_oracle([(u, v, 1.0) for u, v in arcs])
    assert got == want
    # bound tightening must beat one-BFS-per-vertex
    assert stats["bfs_runs"] < len(want)
