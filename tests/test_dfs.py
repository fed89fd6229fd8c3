"""Sequential DFS (SURVEY §2 T4) vs a pure-Python reference
implementation of `depth_first/seq.rs:319-382` — ascending successor
order, global pre/post timestamps, visit_all over ascending ids."""

from __future__ import annotations

import pytest

from tests.conftest import CYCLE4, DAG4, DIAMOND, NINE, TREE7, edge_df, er_graph
from webgraph_algo_rs_spark.operators import dfs_forest, is_acyclic, kahn_layers


def dfs_oracle(arcs, sources=None):
    """Iterative stack DFS matching the reference's event order."""
    adj: dict[int, list[int]] = {}
    verts = set()
    for u, v in arcs:
        adj.setdefault(u, []).append(v)
        verts.update((u, v))
    for u in adj:
        adj[u] = sorted(adj[u])
    if sources is not None:
        verts.update(sources)
    roots = sorted(verts) if sources is None else list(sources)
    visited, out = set(), {}
    pre_c = post_c = 0
    for r in roots:
        if r in visited:
            continue
        visited.add(r)
        out[r] = {"root": r, "parent": None, "depth": 0, "pre": pre_c}
        pre_c += 1
        stack = [(r, iter(adj.get(r, [])))]
        while stack:
            v, it = stack[-1]
            pushed = False
            for w in it:
                if w not in visited:
                    visited.add(w)
                    out[w] = {
                        "root": r,
                        "parent": v,
                        "depth": len(stack),
                        "pre": pre_c,
                    }
                    pre_c += 1
                    stack.append((w, iter(adj.get(w, []))))
                    pushed = True
                    break
            if not pushed:
                out[v]["post"] = post_c
                post_c += 1
                stack.pop()
    return out


GRAPH_CASES = {
    "nine": NINE,
    "diamond": DIAMOND,
    "cycle4": CYCLE4,
    "tree7": TREE7,
    "dag4": DAG4,
    "er": er_graph(40, 0.08, seed=11),
}


@pytest.mark.parametrize("name", sorted(GRAPH_CASES))
def test_dfs_matches_oracle(spark, name):
    arcs = GRAPH_CASES[name]
    df = edge_df(spark, arcs)
    got = {
        r.vertex: {
            "root": r.root,
            "parent": r.parent,
            "depth": r.depth,
            "pre": r.pre,
            "post": r.post,
        }
        for r in dfs_forest(df).collect()
    }
    assert got == dfs_oracle(arcs), name


def test_dfs_explicit_sources_and_properties(spark):
    df = edge_df(spark, NINE)
    # subtree visit: only vertices reachable from the listed roots, in
    # the listed order
    got = {
        r.vertex: dict(parent=r.parent, pre=r.pre, post=r.post, root=r.root)
        for r in dfs_forest(df, sources=[5, 1]).collect()
    }
    want = dfs_oracle(NINE, sources=[5, 1])
    assert got == {
        v: dict(
            parent=w["parent"], pre=w["pre"], post=w["post"], root=w["root"]
        )
        for v, w in want.items()
    }

    # nesting property on the full forest: a child's [pre, post] interval
    # sits strictly inside its parent's
    rows = dfs_forest(df).collect()
    by_v = {r.vertex: r for r in rows}
    arcs = set(NINE)
    for r in rows:
        if r.parent is not None:
            assert (r.parent, r.vertex) in arcs
            p = by_v[r.parent]
            assert p.pre < r.pre and r.post < p.post
            assert r.depth == p.depth + 1

    # reverse postorder of a DAG is a topological order (the reference's
    # top_sort is exactly this, top_sort.rs:10-37) — cross-check vs Kahn
    dag = edge_df(spark, DAG4)
    rows = dfs_forest(dag).collect()
    post = {r.vertex: r.post for r in rows}
    assert is_acyclic(dag)
    for u, v in DAG4:
        assert post[u] > post[v], (u, v)
    layers = {r.vertex: r.layer for r in kahn_layers(dag).collect()}
    assert set(post) == set(layers)


def test_dfs_degenerate_and_guard(spark):
    # empty edge table with explicit sources: every source is a
    # singleton tree
    empty = edge_df(spark, [])
    rows = dfs_forest(empty, sources=[3, 1]).collect()
    assert {(r.vertex, r.pre, r.post, r.parent) for r in rows} == {
        (3, 0, 0, None),
        (1, 1, 1, None),
    }
    # self-loop only
    rows = dfs_forest(edge_df(spark, [(2, 2)])).collect()
    assert [(r.vertex, r.pre, r.post) for r in rows] == [(2, 0, 0)]
    # no distributed form, by contract
    with pytest.raises(ValueError, match="no distributed form"):
        dfs_forest(edge_df(spark, NINE), local_mode=False)
    # size guard: threshold 0 disables the local path entirely → raise
    from webgraph_algo_rs_spark.plans.local_csr import (
        LOCAL_KERNEL_MAX_EDGES_CONF,
    )

    spark.conf.set(LOCAL_KERNEL_MAX_EDGES_CONF, "0")
    try:
        with pytest.raises(ValueError, match="single-node"):
            dfs_forest(edge_df(spark, NINE))
    finally:
        spark.conf.unset(LOCAL_KERNEL_MAX_EDGES_CONF)
