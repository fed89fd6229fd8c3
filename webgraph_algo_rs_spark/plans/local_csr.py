"""Partition-local CSR kernels for small graphs / subgraphs.

The north star prescribes "iterative PageRank … as DataFrame joins plus
vectorized Arrow/pandas UDFs over partition-local CSR blocks — never
per-row Python". The distributed superstep paths (``operators/*.py``)
are the DataFrame-join half; this module is the CSR half: when a graph
(or an extracted subgraph) fits one executor's memory, the whole
iterative algorithm runs inside ONE ``mapInPandas`` task over the edge
list — numpy ``bincount`` / ``minimum.at`` gather-scatter per
superstep, zero shuffles, zero per-superstep driver barriers.

This mirrors the classic engine dichotomy (broadcast-hash vs
shuffle-hash join): the *logical* operator is identical, the planner
picks the physical strategy by size. The threshold is deliberately
conservative (default 2M edges ≈ tens of MB of int64 arrays — far
below executor memory) so that anything near cluster scale takes the
distributed path; at 100 TB the local path is only ever reached by
per-component / per-SCC sub-problems, where it converts thousands of
driver-coordinated supersteps into one task.

Value parity with the distributed paths:

* CC / LPA are exact — min-label exchange and weight-majority votes
  are integer/comparison arithmetic with no ordering sensitivity
  (integer-weight tallies accumulate in int64, matching Spark's
  ``sum(long)`` exactness).
* PageRank agrees to ~1e-15 relative: the same double-precision
  formula evaluated in a different summation order (numpy ``bincount``
  vs Catalyst hash-aggregate) — far inside the driver gate's 9-sig-fig
  rounding and the test suite's 1e-12 tolerances.

Reference analog: the whole reference engine is this local mode
(single-node arrays, `/root/reference/src/algo/*`); our contribution is
choosing it *per subgraph* under a distributed planner.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from webgraph_algo_rs_spark.plans.superstep import SRC, DST, W, materialize

LOCAL_KERNEL_MAX_EDGES_CONF = "wga.localKernelMaxEdges"
LOCAL_KERNEL_MAX_EDGES_DEFAULT = 2_000_000


def local_kernel_threshold(spark) -> int:
    """Max edge count eligible for the local-CSR path (session conf
    ``wga.localKernelMaxEdges``; set 0 to disable auto-dispatch)."""
    try:
        return int(
            spark.conf.get(LOCAL_KERNEL_MAX_EDGES_CONF, str(LOCAL_KERNEL_MAX_EDGES_DEFAULT))
        )
    except (TypeError, ValueError):
        return LOCAL_KERNEL_MAX_EDGES_DEFAULT


def probe_edge_count(edges: DataFrame, threshold: int) -> int:
    """Edge count capped at ``threshold + 1``: deciding "is this graph
    local-kernel small?" must never cost a full pass over a 100 TB edge
    table, so the probe scans only until ``threshold + 1`` rows exist
    (``limit`` short-circuits the scan). Returns the true count when it
    is ≤ threshold, else some value > threshold."""
    return edges.limit(threshold + 1).count()


def run_local_kernel(
    edges: DataFrame,
    schema: str,
    kernel: Callable[[pd.DataFrame], pd.DataFrame],
    with_weight: bool = True,
) -> DataFrame:
    """Run ``kernel`` over the FULL edge table inside one executor task.

    ``coalesce(1)`` merges partitions without a shuffle; ``mapInPandas``
    streams them Arrow-batched into a single python worker, which
    accumulates and runs the vectorized kernel once. The result is
    eagerly materialized (one Spark job) so callers can harvest
    stats columns with a free ``first()``.
    """
    cols = [SRC, DST] + ([W] if with_weight else [])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = list(batches)
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
        if len(pdf) == 0:
            return
        yield kernel(pdf)

    return materialize(edges.select(*cols).coalesce(1).mapInPandas(gen, schema=schema))


def _vertex_index(src: np.ndarray, dst: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """``(vertices_sorted, src_idx, dst_idx)`` — dense 0..nv-1 ids."""
    verts = np.unique(np.concatenate([src, dst]))
    return verts, np.searchsorted(verts, src), np.searchsorted(verts, dst)


def pagerank_kernel(
    damping: float, tol: float, max_iter: int
) -> Callable[[pd.DataFrame], pd.DataFrame]:
    """CSR PageRank: the exact formula of ``operators/pagerank.py``
    (teleport + d·(contrib + dangling_mass/n), L1-residual stop) with
    ``bincount`` as the scatter/gather-combine."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        src = pdf[SRC].to_numpy(np.int64)
        dst = pdf[DST].to_numpy(np.int64)
        w = pdf[W].to_numpy(np.float64)
        verts, src_i, dst_i = _vertex_index(src, dst)
        nv = len(verts)
        out_w = np.bincount(src_i, weights=w, minlength=nv)
        nw = w / out_w[src_i]
        dangling = out_w == 0.0
        n = float(nv)
        rank = np.full(nv, 1.0 / n)
        residual, iters = float("inf"), 0
        for it in range(max_iter):
            dm = float(rank[dangling].sum())
            contrib = np.bincount(dst_i, weights=rank[src_i] * nw, minlength=nv)
            new = (1.0 - damping) / n + damping * (contrib + dm / n)
            residual = float(np.abs(new - rank).sum())
            rank = new
            iters = it + 1
            if residual < tol:
                break
        return pd.DataFrame(
            {
                "vertex": verts,
                "rank": rank,
                "iterations": np.int32(iters),
                "residual": np.float64(residual),
            }
        )

    return kernel


def cc_kernel(max_iter: int) -> Callable[[pd.DataFrame], pd.DataFrame]:
    """CSR hash-min connected components on the symmetrized edge list
    (exact: integer min exchange, same fixpoint count as the
    distributed loop — the final zero-change superstep is counted)."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        src = pdf[SRC].to_numpy(np.int64)
        dst = pdf[DST].to_numpy(np.int64)
        verts, src_i, dst_i = _vertex_index(src, dst)
        s = np.concatenate([src_i, dst_i])
        d = np.concatenate([dst_i, src_i])
        labels = verts.copy()
        iters, changed = 0, -1
        for it in range(max_iter):
            new = labels.copy()
            np.minimum.at(new, d, labels[s])
            changed = int((new < labels).sum())
            labels = new
            iters = it + 1
            if changed == 0:
                break
        return pd.DataFrame(
            {
                "vertex": verts,
                "component": labels,
                "iterations": np.int32(iters),
                "changed": np.int64(changed),
            }
        )

    return kernel


def lpa_kernel(max_iter: int) -> Callable[[pd.DataFrame], pd.DataFrame]:
    """CSR synchronous weight-majority label propagation (min-label
    tie-break) on the symmetrized edge list. Integer weights tally in
    int64 — bit-exact vs Spark's ``sum(long)``; float weights tally in
    float64 like Catalyst's double sum."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        src = pdf[SRC].to_numpy(np.int64)
        dst = pdf[DST].to_numpy(np.int64)
        w_raw = pdf[W].to_numpy()
        exact = np.issubdtype(w_raw.dtype, np.integer)
        w1 = w_raw.astype(np.int64 if exact else np.float64)
        verts, src_i, dst_i = _vertex_index(src, dst)
        nv = np.int64(len(verts))
        s = np.concatenate([src_i, dst_i])
        d = np.concatenate([dst_i, src_i])
        w = np.concatenate([w1, w1])
        labels = np.arange(nv, dtype=np.int64)  # dense label = vertex index
        iters, changed = 0, -1
        for it in range(max_iter):
            # per-(dst, label) weight tally: one flat key, one bincount
            keys = d * nv + labels[s]
            uk, inv = np.unique(keys, return_inverse=True)
            sums = np.zeros(len(uk), dtype=w.dtype)
            np.add.at(sums, inv, w)
            kd, kl = uk // nv, uk % nv
            # per-dst argmax by (weight desc, label asc): lexsort is
            # stable and keyed last-to-first, so order within each dst
            # is exactly the majority rule's preference order
            order = np.lexsort((kl, -sums, kd))
            kd_sorted = kd[order]
            first = np.unique(kd_sorted, return_index=True)[1]
            new = labels.copy()
            new[kd_sorted[first]] = kl[order][first]
            changed = int((new != labels).sum())
            labels = new
            iters = it + 1
            if changed == 0:
                break
        return pd.DataFrame(
            {
                "vertex": verts,
                "label": verts[labels],
                "iterations": np.int32(iters),
                "changed": np.int64(changed),
            }
        )

    return kernel
