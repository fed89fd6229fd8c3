"""Sequential depth-first visit (SURVEY §2 T4) — the reference's
``SeqPred`` DFS (`/root/reference/src/algo/visits/depth_first/seq.rs:121-514`,
recurse loop `:319-382`) re-expressed as a *local-kernel-only* operator.

DFS is the one traversal with no scalable data-parallel form: the visit
order at every step depends on the entire visited-set history, which is
why SURVEY §7 excluded it and re-expressed its consumers (Tarjan →
trim+coloring SCC, top-sort → Kahn peel, acyclicity → peel emptiness).
Those re-expressions remain the scale path. What the engine was still
missing is the *visit itself* — pre/post timestamps and the DFS forest,
which users of the reference consume directly. That is genuinely
per-partition imperative logic, exactly what the size-dispatched
local-CSR strategy (`plans/local_csr.py`) exists for: the whole visit
runs inside ONE ``mapInPandas`` task over the edge list, like the
reference runs it on one core. Graphs beyond ``wga.localKernelMaxEdges``
raise rather than pretend to scale (the distributed consumers above are
the answer there).

Semantics mirrored from the reference:

* successors are enumerated in ascending id order (BV adjacency order);
* ``visit_all`` (``sources=None``) starts a new tree at every
  still-unvisited vertex in ascending id order (`seq.rs` visit_all);
* ``pre``/``post`` are global counters across the whole forest (Tarjan's
  timestamps); ``depth`` is the visit-path length from the root;
* with explicit ``sources``, trees are rooted in the given order and
  only reached vertices appear (the interrupted-visit contract).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from webgraph_algo_rs_spark.plans.superstep import SRC, DST, materialize


def dfs_forest(
    edges: DataFrame,
    sources: list[int] | None = None,
    local_mode: bool | None = None,
) -> DataFrame:
    """Depth-first forest: ``(vertex, root, parent, depth, pre, post)``.

    ``parent`` is NULL for roots. ``sources=None`` visits every vertex
    (ascending); an explicit list roots trees in list order and returns
    only reached vertices. ``local_mode=True`` skips the size probe;
    ``False`` raises (there is deliberately no distributed DFS — see
    module docstring).
    """
    if local_mode is False:
        raise ValueError(
            "dfs_forest has no distributed form (inherently sequential, "
            "SURVEY §7); use the re-expressed consumers (scc/topsort/"
            "components) at scale, or local_mode=True/None for graphs "
            "under wga.localKernelMaxEdges"
        )
    from webgraph_algo_rs_spark.plans.local_csr import (
        local_kernel_threshold,
        probe_edge_count,
    )

    spark = edges.sparkSession
    if local_mode is not True:
        thr = local_kernel_threshold(spark)
        if thr <= 0 or probe_edge_count(edges.select(SRC, DST), thr) > thr:
            raise ValueError(
                "graph exceeds wga.localKernelMaxEdges "
                f"({thr}); sequential DFS is single-node by nature — "
                "raise the threshold (or pass local_mode=True) only if "
                "one executor can hold the edge list"
            )
    src_list = None if sources is None else [int(s) for s in sources]
    schema = (
        "vertex bigint, root bigint, parent bigint, depth bigint,"
        " pre bigint, post bigint"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = [b for b in batches if len(b)]
        if not parts:
            if src_list:
                # edgeless graph: every listed source is its own tree
                yield _forest_of_isolates(src_list)
            return
        pdf = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
        e_src = pdf[SRC].to_numpy(np.int64)
        e_dst = pdf[DST].to_numpy(np.int64)
        dom = [e_src, e_dst]
        if src_list:
            dom.append(np.asarray(src_list, dtype=np.int64))
        verts = np.unique(np.concatenate(dom))
        nv = len(verts)
        src_i = np.searchsorted(verts, e_src)
        dst_i = np.searchsorted(verts, e_dst)
        # CSR with successors ascending (np.unique-based ids are
        # order-isomorphic to the original ids, so ascending index ≡
        # ascending id — the reference's adjacency order)
        order = np.lexsort((dst_i, src_i))
        indices = dst_i[order]
        indptr = np.zeros(nv + 1, dtype=np.int64)
        np.cumsum(np.bincount(src_i, minlength=nv), out=indptr[1:])

        roots = (
            range(nv)
            if src_list is None
            else list(np.searchsorted(verts, np.asarray(src_list, dtype=np.int64)))
        )
        visited = np.zeros(nv, dtype=bool)
        pre = np.full(nv, -1, dtype=np.int64)
        post = np.full(nv, -1, dtype=np.int64)
        parent = np.full(nv, -1, dtype=np.int64)
        depth = np.zeros(nv, dtype=np.int64)
        root_of = np.full(nv, -1, dtype=np.int64)
        pre_c = 0
        post_c = 0
        ind = indices  # local alias for the hot loop
        for r in roots:
            if visited[r]:
                continue
            visited[r] = True
            pre[r] = pre_c
            pre_c += 1
            root_of[r] = r
            depth[r] = 0
            stack_v = [r]
            stack_p = [int(indptr[r])]
            while stack_v:
                v = stack_v[-1]
                p = stack_p[-1]
                end = indptr[v + 1]
                pushed = False
                while p < end:
                    w = int(ind[p])
                    p += 1
                    if not visited[w]:
                        stack_p[-1] = p
                        visited[w] = True
                        pre[w] = pre_c
                        pre_c += 1
                        parent[w] = v
                        root_of[w] = root_of[v]
                        depth[w] = len(stack_v)
                        stack_v.append(w)
                        stack_p.append(int(indptr[w]))
                        pushed = True
                        break
                if not pushed:
                    post[v] = post_c
                    post_c += 1
                    stack_v.pop()
                    stack_p.pop()
        reached = visited
        pr = parent[reached]
        out = pd.DataFrame(
            {
                "vertex": verts[reached],
                "root": verts[root_of[reached]],
                "depth": depth[reached],
                "pre": pre[reached],
                "post": post[reached],
            }
        )
        pc = pd.array(verts[np.maximum(pr, 0)], dtype="Int64")
        pc[pr < 0] = pd.NA
        out["parent"] = pc
        yield out[["vertex", "root", "parent", "depth", "pre", "post"]]

    return materialize(
        edges.select(SRC, DST).coalesce(1).mapInPandas(gen, schema=schema)
    )


def _forest_of_isolates(src_list: list[int]) -> pd.DataFrame:
    seen: list[int] = []
    have = set()
    for s in src_list:
        if s not in have:
            have.add(s)
            seen.append(s)
    n = len(seen)
    out = pd.DataFrame(
        {
            "vertex": np.asarray(seen, dtype=np.int64),
            "root": np.asarray(seen, dtype=np.int64),
            "depth": np.zeros(n, dtype=np.int64),
            "pre": np.arange(n, dtype=np.int64),
            "post": np.arange(n, dtype=np.int64),
        }
    )
    out["parent"] = pd.array([pd.NA] * n, dtype="Int64")
    return out[["vertex", "root", "parent", "depth", "pre", "post"]]
