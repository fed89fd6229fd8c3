"""Brute-force / numpy oracles — the reference's test strategy level 1
(naive reimplementation oracle, ``/root/reference/tests/test_bfv.rs:13-48``)
re-created for PageRank / CC / LPA / triangles / BFS.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np


def _vertex_index(edges):
    verts = sorted({u for u, v, _ in edges} | {v for u, v, _ in edges})
    return verts, {v: i for i, v in enumerate(verts)}


def pagerank_oracle(edges, damping=0.85, tol=1e-6, max_iter=200):
    """edges: [(src, dst, w)] → {vertex: rank}; identical semantics to
    operators.pagerank (same init, dangling redistribution, stop rule)."""
    verts, idx = _vertex_index(edges)
    n = len(verts)
    out_w = np.zeros(n)
    for u, v, w in edges:
        out_w[idx[u]] += w
    dangling = out_w == 0
    r = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        contrib = np.zeros(n)
        for u, v, w in edges:
            contrib[idx[v]] += r[idx[u]] * w / out_w[idx[u]]
        dm = r[dangling].sum()
        r_new = (1 - damping) / n + damping * (contrib + dm / n)
        residual = np.abs(r_new - r).sum()
        r = r_new
        if residual < tol:
            break
    return {v: float(r[idx[v]]) for v in verts}


def cc_oracle(edges):
    """Union-find CC on the symmetrized graph; component = min vertex id."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    verts = {u for u, v, _ in edges} | {v for u, v, _ in edges}
    for v in verts:
        find(v)
    for u, v, _ in edges:
        union(u, v)
    return {v: find(v) for v in verts}


def lpa_oracle(edges, max_iter=20):
    """Synchronous weighted LPA, ties → min label; same semantics as
    operators.label_propagation (symmetrized weights, no self-vote)."""
    sym = defaultdict(float)
    for u, v, w in edges:
        sym[(u, v)] += w
        sym[(v, u)] += w
    verts = sorted({u for u, v, _ in edges} | {v for u, v, _ in edges})
    nbrs = defaultdict(list)
    for (u, v), w in sym.items():
        nbrs[v].append((u, w))  # messages flow src→dst
    labels = {v: v for v in verts}
    for _ in range(max_iter):
        new = {}
        changed = 0
        for v in verts:
            if not nbrs[v]:
                new[v] = labels[v]
                continue
            tally = defaultdict(float)
            for u, w in nbrs[v]:
                tally[labels[u]] += w
            best = max(tally.items(), key=lambda kv: (kv[1], -kv[0]))[0]
            new[v] = best
            changed += best != labels[v]
        labels = new
        if changed == 0:
            break
    return labels


def triangles_oracle(edges):
    """{vertex: triangle_count}, plus global count, by set intersection."""
    adj = defaultdict(set)
    for u, v, _ in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    verts = {u for u, v, _ in edges} | {v for u, v, _ in edges}
    per = {v: 0 for v in verts}
    total = 0
    vs = sorted(verts)
    for i, a in enumerate(vs):
        for b in adj[a]:
            if b <= a:
                continue
            for c in adj[a] & adj[b]:
                if c <= b:
                    continue
                total += 1
                per[a] += 1
                per[b] += 1
                per[c] += 1
    return per, total


def all_pairs_oracle(edges):
    """{(u, v): d} exact directed distances by BFS from every vertex."""
    verts = {u for u, v, _ in edges} | {v for u, v, _ in edges}
    out = {}
    for s in verts:
        for v, d in bfs_oracle(edges, s).items():
            out[(s, v)] = d
    return out


def hyperball_oracle(edges):
    """Exact per-vertex ball/centrality values (what HyperBall estimates):
    {vertex: (reachable, sum_d, harmonic)} over directed distances."""
    verts = {u for u, v, _ in edges} | {v for u, v, _ in edges}
    ap = all_pairs_oracle(edges)
    res = {}
    for v in verts:
        ds = [d for (s, t), d in ap.items() if s == v and d > 0]
        res[v] = (
            float(len(ds) + 1),  # ball includes v itself
            float(sum(ds)),
            float(sum(1.0 / d for d in ds)),
        )
    return res


def tarjan_oracle(edges):
    """Iterative Tarjan SCC → {vertex: component_id} with component id =
    min vertex id in the SCC (canonical, engine-independent). Oracle-only
    reimplementation of `/root/reference/src/algo/sccs/tarjan.rs:9-116`."""
    adj = defaultdict(list)
    verts = set()
    for u, v, _ in edges:
        adj[u].append(v)
        verts.add(u)
        verts.add(v)
    index = {}
    low = {}
    on_stack = set()
    stack = []
    comp = {}
    counter = [0]

    def strongconnect(root):
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recursed = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recursed = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if recursed:
                continue
            work.pop()
            if work:
                low[work[-1][0]] = min(low[work[-1][0]], low[v])
            if low[v] == index[v]:
                scc = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    scc.append(w)
                    if w == v:
                        break
                cid = min(scc)
                for w in scc:
                    comp[w] = cid

    for v in sorted(verts):
        if v not in index:
            strongconnect(v)
    return comp


def eccentricity_oracle(edges):
    """Undirected eccentricities on the symmetrized graph:
    {vertex: ecc} (unreachable pairs ignored, per-component)."""
    sym = []
    for u, v, w in edges:
        sym.append((u, v, w))
        sym.append((v, u, w))
    verts = {u for u, v, _ in sym} | {v for u, v, _ in sym}
    out = {}
    for s in verts:
        dist = bfs_oracle(sym, s)
        out[s] = max(dist.values())
    return out


def bfs_oracle(edges, source):
    """{vertex: distance} by textbook BFS (reference correct_dists,
    tests/test_bfv.rs:13-48)."""
    adj = defaultdict(list)
    for u, v, _ in edges:
        adj[u].append(v)
    dist = {source: 0}
    frontier = [source]
    d = 0
    while frontier:
        d += 1
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = d
                    nxt.append(v)
        frontier = nxt
    return dist
