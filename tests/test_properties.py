"""Property-based tests (hypothesis) — the reference's random-graph
test strategy, generalized.

The reference property-tests SCC equivalence on seeded Erdős–Rényi
digraphs (`/root/reference/tests/test_sccs.rs:225-227`: Tarjan ==
Kosaraju over random inputs). These tests push that idea through
hypothesis: minimized counterexample search over *arbitrary* small
digraphs and item sets, driving the pure-numpy layers — the HLL
counter logic (K1–K3) and the partition-local CSR kernels that the
size-dispatched planner runs inside one ``mapInPandas`` task — against
the brute-force oracles of ``tests/oracles.py``, plus a thin
Spark-backed strip for the sequential DFS visit (T4).

Everything is derandomized (fixed hypothesis seed) so CI is
reproducible; the numpy-level suites run hundreds of examples in
seconds because no Spark session is involved.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tests.conftest import edge_df
from tests.oracles import (
    cc_oracle,
    lpa_oracle,
    pagerank_oracle,
    triangles_oracle,
)
from webgraph_algo_rs_spark.functions.hll import HllParams
from webgraph_algo_rs_spark.plans.local_csr import (
    cc_kernel,
    lpa_kernel,
    pagerank_kernel,
    triangles_kernel,
)
from webgraph_algo_rs_spark.plans.superstep import DST, SRC, W

# ---------------------------------------------------------------------------
# strategies

# small digraphs: ids 0..12, duplicates and self-loops allowed — the
# operators must tolerate both (self-loops count for PageRank mass and
# are ignored by triangles/DFS exactly as the oracles do)
ARCS = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)),
    min_size=1,
    max_size=48,
)

# integer weights keep the LPA majority tally bit-exact in both engines
WEIGHTED = ARCS.flatmap(
    lambda arcs: st.tuples(
        st.just(arcs),
        st.lists(
            st.integers(1, 4), min_size=len(arcs), max_size=len(arcs)
        ),
    )
)

ITEMS = st.sets(st.integers(0, 1 << 40), max_size=128)


def _pdf(arcs, weights=None):
    """Arc list → the pandas batch a local kernel receives."""
    w = weights if weights is not None else [1.0] * len(arcs)
    return pd.DataFrame(
        {
            SRC: np.array([a for a, _ in arcs], dtype=np.int64),
            DST: np.array([b for _, b in arcs], dtype=np.int64),
            W: np.asarray(w, dtype=np.float64),
        }
    )


def _edges3(arcs, weights=None):
    w = weights if weights is not None else [1.0] * len(arcs)
    return [(a, b, float(x)) for (a, b), x in zip(arcs, w)]


# ---------------------------------------------------------------------------
# HLL counter logic (K1–K3): algebraic laws the sketches rely on


@settings(max_examples=120, deadline=None, derandomize=True)
@given(a=ITEMS, b=ITEMS, log2m=st.sampled_from([4, 6, 8]))
def test_hll_merge_is_union(a, b, log2m):
    """merge(regs(A), regs(B)) == regs(A ∪ B) register-for-register —
    the law HyperBall's whole superstep algebra stands on
    (`hyper_log_log_logic.rs:461-568`); also commutativity and
    idempotence of the register-wise max."""
    p = HllParams(log2m=log2m)

    def regs_of(items):
        r = p.empty(1)
        arr = np.fromiter(sorted(items), dtype=np.int64, count=len(items))
        p.add_multi(r, np.zeros(len(arr), dtype=np.int64), arr)
        return r

    ra, rb, rab = regs_of(a), regs_of(b), regs_of(a | b)
    assert np.array_equal(HllParams.merge(ra, rb), rab)
    assert np.array_equal(HllParams.merge(ra, rb), HllParams.merge(rb, ra))
    assert np.array_equal(HllParams.merge(ra, ra), ra)


@settings(max_examples=120, deadline=None, derandomize=True)
@given(items=ITEMS, log2m=st.sampled_from([4, 8]))
def test_hll_add_idempotent_and_estimate_floor(items, log2m):
    """Re-adding already-seen elements never moves a register, and the
    empty counter estimates exactly 0 (linear-counting branch,
    `hyper_log_log_logic.rs:173-176`)."""
    p = HllParams(log2m=log2m)
    regs = p.empty(1)
    arr = np.fromiter(sorted(items), dtype=np.int64, count=len(items))
    rows = np.zeros(len(arr), dtype=np.int64)
    p.add_multi(regs, rows, arr)
    snap = regs.copy()
    p.add_multi(regs, rows, arr)  # second pass: no register can move
    assert np.array_equal(regs, snap)
    assert p.estimate(p.empty(1))[0] == 0.0
    if len(items):
        assert p.estimate(regs)[0] > 0.0


# ---------------------------------------------------------------------------
# local-CSR kernels vs brute-force oracles (the planner's "one task"
# physical strategy must be value-equal to the distributed plans, which
# these same oracles already gate)


@settings(max_examples=80, deadline=None, derandomize=True)
@given(arcs=ARCS)
def test_cc_kernel_matches_union_find(arcs):
    out = cc_kernel(max_iter=100)(_pdf(arcs))
    want = cc_oracle(_edges3(arcs))
    got = dict(zip(out["vertex"], out["component"]))
    assert got == want
    assert int(out["changed"].iloc[0]) == 0  # reached the fixpoint


@settings(max_examples=60, deadline=None, derandomize=True)
@given(aw=WEIGHTED)
def test_pagerank_kernel_matches_power_iteration(aw):
    arcs, weights = aw
    out = pagerank_kernel(damping=0.85, tol=1e-6, max_iter=200)(
        _pdf(arcs, weights)
    )
    want = pagerank_oracle(_edges3(arcs, weights))
    got = dict(zip(out["vertex"], out["rank"]))
    assert set(got) == set(want)
    for v, r in want.items():
        assert got[v] == pytest.approx(r, rel=1e-9, abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    assert float(out["residual"].iloc[0]) < 1e-6


@settings(max_examples=60, deadline=None, derandomize=True)
@given(aw=WEIGHTED)
def test_lpa_kernel_matches_majority_vote(aw):
    arcs, weights = aw
    out = lpa_kernel(max_iter=20)(_pdf(arcs, weights))
    want = lpa_oracle(_edges3(arcs, weights))
    got = dict(zip(out["vertex"], out["label"]))
    assert got == want


@settings(max_examples=80, deadline=None, derandomize=True)
@given(arcs=ARCS)
def test_triangles_kernel_matches_set_intersection(arcs):
    out = triangles_kernel()(_pdf(arcs))
    per, total = triangles_oracle(_edges3(arcs))
    got = dict(zip(out["vertex"], out["n_triangles"]))
    assert got == per
    assert sum(got.values()) == 3 * total


# ---------------------------------------------------------------------------
# sequential DFS (T4) — Spark-backed strip, few examples: the visit
# must equal the reference event order (ascending successors, global
# pre/post clocks) on arbitrary digraphs, not just the fixture shapes


@settings(max_examples=10, deadline=None, derandomize=True)
@given(arcs=st.lists(st.tuples(st.integers(0, 10), st.integers(0, 10)), min_size=1, max_size=30))
def test_dfs_forest_matches_oracle_property(spark, arcs):
    from tests.test_dfs import dfs_oracle
    from webgraph_algo_rs_spark.operators import dfs_forest

    want = dfs_oracle(arcs)
    rows = dfs_forest(edge_df(spark, arcs)).collect()
    assert len(rows) == len(want)
    for r in rows:
        w = want[r["vertex"]]
        assert r["root"] == w["root"]
        assert r["parent"] == w["parent"]
        assert r["depth"] == w["depth"]
        assert r["pre"] == w["pre"]
        assert r["post"] == w["post"]


@settings(max_examples=8, deadline=None, derandomize=True)
@given(
    arcs=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=1,
        max_size=26,
    )
)
def test_directed_ess_matches_brute_force_property(spark, arcs):
    """Directed ExactSumSweep (the repo's subtlest control loop —
    sweep pivot rules, AllCC condensation DP, endgame flood) must equal
    the brute-force forward/backward eccentricity oracle on ARBITRARY
    small digraphs, not just the seeded-ER grid — the hypothesis
    generalization of the reference's cross-algorithm agreement level
    (`tests/test_sccs.rs:222-266`). Derandomized + minimized."""
    from tests.test_sumsweep import directed_ecc_oracle
    from webgraph_algo_rs_spark.operators.sumsweep import directed_eccentricities

    clean = [(a, b) for a, b in arcs if a != b]
    if not clean:
        return
    got = {
        r.vertex: (r.ecc_f, r.ecc_b)
        for r in directed_eccentricities(edge_df(spark, clean)).collect()
    }
    want = directed_ecc_oracle(clean)
    want = {v: e for v, e in want.items() if v in got}
    assert got == want
