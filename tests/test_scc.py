"""SCC tests mirroring the reference's suite (`tests/test_sccs.rs`):
hand-made fixtures with exact expected components, cross-algorithm
agreement on Erdős–Rényi graphs vs the Tarjan oracle, and condensation
properties (the SCC-DAG must be acyclic and keep max-score bridges)."""

from __future__ import annotations

import pytest

from tests.conftest import (
    COMPLETE5,
    CYCLE4,
    DIAMOND,
    NINE,
    TREE7,
    edge_df,
    er_graph,
)
from tests.oracles import tarjan_oracle

from webgraph_algo_rs_spark.operators.components import renumber_by_size
from webgraph_algo_rs_spark.operators.scc import (
    scc_condensation,
    strongly_connected_components,
)
from webgraph_algo_rs_spark.operators.topsort import is_acyclic


def scc_map(spark, arcs):
    df = strongly_connected_components(edge_df(spark, arcs))
    return {r.vertex: r.component for r in df.collect()}


@pytest.mark.parametrize(
    "arcs",
    [DIAMOND, NINE, CYCLE4, COMPLETE5, TREE7],
    ids=["diamond", "nine", "cycle4", "complete5", "tree7"],
)
def test_scc_fixtures_match_tarjan(spark, arcs):
    got = scc_map(spark, arcs)
    want = tarjan_oracle([(u, v, 1.0) for u, v in arcs])
    assert got == want


def test_scc_diamond_sizes(spark):
    """Reference doctest: diamond graph has SCC sizes [3, 1]
    (`/root/reference/src/algo/sccs/mod.rs:12-21`)."""
    comp = scc_map(spark, DIAMOND)
    sizes = sorted(
        [sum(1 for c in comp.values() if c == cid) for cid in set(comp.values())],
        reverse=True,
    )
    assert sizes == [3, 1]


def test_scc_cycle_single_component(spark):
    assert set(scc_map(spark, CYCLE4).values()) == {0}


def test_scc_tree_all_singletons(spark):
    comp = scc_map(spark, TREE7)
    assert len(set(comp.values())) == 7  # tests/test_sccs.rs:185-197


@pytest.mark.parametrize("n,p,seed", [(20, 0.08, 3), (30, 0.05, 7), (25, 0.15, 11)])
def test_scc_random_cross_check(spark, n, p, seed):
    """Cross-algorithm agreement on ER graphs (tests/test_sccs.rs:222-239)."""
    arcs = er_graph(n, p, seed)
    got = scc_map(spark, arcs)
    want = tarjan_oracle([(u, v, 1.0) for u, v in arcs])
    assert got == want


def test_scc_renumber_by_size(spark):
    df = strongly_connected_components(edge_df(spark, DIAMOND))
    ren = {r.vertex: r.component for r in renumber_by_size(df).collect()}
    # biggest SCC {0,1,2} → id 0; singleton {3} → id 1
    assert ren == {0: 0, 1: 0, 2: 0, 3: 1}


def test_scc_condensation_nine(spark):
    edges = edge_df(spark, NINE)
    comps = strongly_connected_components(edges)
    dag = scc_condensation(edges, comps)
    rows = dag.collect()
    # DAG of the condensation must be acyclic
    dag_edges = dag.selectExpr(
        "c_src as src_vertex", "c_dst as dst_vertex", "cast(1.0 as double) as weight"
    )
    assert is_acyclic(dag_edges)
    # every bridge arc must be a real arc crossing its component pair
    comp = {r.vertex: r.component for r in comps.collect()}
    arcs = set(NINE)
    for r in rows:
        assert (r.bridge_src, r.bridge_dst) in arcs
        assert comp[r.bridge_src] == r.c_src
        assert comp[r.bridge_dst] == r.c_dst
        assert r.c_src != r.c_dst


def test_radial_vertices_nine(spark):
    """Radial = can reach the largest SCC (computer.rs:488-534). For the
    NINE fixture compute the expectation by brute force."""
    from collections import defaultdict

    from webgraph_algo_rs_spark.operators.scc import radial_vertices

    want_comp = tarjan_oracle([(u, v, 1.0) for u, v in NINE])
    sizes = defaultdict(int)
    for c in want_comp.values():
        sizes[c] += 1
    largest = max(sizes, key=lambda c: (sizes[c], -c))
    members = {v for v, c in want_comp.items() if c == largest}
    # brute-force reachability to any member
    adj = defaultdict(list)
    for u, v in NINE:
        adj[u].append(v)

    def reaches(s):
        seen, stack = {s}, [s]
        while stack:
            x = stack.pop()
            if x in members:
                return True
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        return False

    verts = {u for u, v in NINE} | {v for u, v in NINE}
    want = {v: reaches(v) for v in verts}
    got = {r.vertex: r.is_radial for r in radial_vertices(edge_df(spark, NINE)).collect()}
    assert got == want
