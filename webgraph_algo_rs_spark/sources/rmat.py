"""Deterministic R-MAT (Graph500-style) web-skewed graph generator.

The reference benches its algorithms on two web crawls: cnr-2000
(325,557 nodes / 3,216,152 arcs) and in-2004 (1,382,908 nodes /
16,917,053 arcs — ``/root/reference/tests/graphs/in-2004.properties``,
``benches/single_benches/params.rs:3``). The in-2004 ``.graph`` blob is
stripped from this snapshot, so the 5x-cnr scale tier is anchored with a
synthetic stand-in of the same class instead: an R-MAT graph (Chakrabarti,
Zhan, Faloutsos, SDM 2004; the Graph500 generator) with the canonical
web-graph quadrant probabilities, which reproduces the heavy-tailed
in/out-degree skew and tight core that make web crawls hard for
gather-scatter engines.

Generation is fully vectorized numpy (no per-edge Python), chunked so peak
memory stays bounded, and deterministic for a given ``(scale, n_edges,
seed)`` regardless of chunk size: the counter-based ``Philox`` stream is
``advance``d to ``chunk_start * scale`` draws, so edge *i* always consumes
words ``[i*scale, (i+1)*scale)`` of the same stream no matter how the
draws are batched. (This is also exactly how a distributed generator
would shard the stream across executors.)
"""

from __future__ import annotations

import numpy as np

# Graph500 / Chakrabarti et al. canonical skew.
A, B, C = 0.57, 0.19, 0.19  # d = 0.05


def rmat_edge_arrays(
    scale: int,
    n_edges: int,
    seed: int = 42,
    *,
    chunk: int = 1_000_000,
) -> tuple[np.ndarray, np.ndarray]:
    """Distinct, self-loop-free directed arcs of an R-MAT graph.

    Vertex ids live in ``[0, 2**scale)``. Draws ``n_edges`` raw samples in
    chunks, then dedupes; because R-MAT concentrates mass at low ids, the
    distinct count comes out below ``n_edges`` — callers wanting an exact
    arc count should oversample (see :func:`rmat_like_in2004`). Returns
    ``(src, dst)`` int64 arrays sorted by ``(src, dst)``.
    """
    n_draws = int(n_edges)
    keys: list[np.ndarray] = []
    shift = np.int64(scale)
    # Philox.advance() steps 128-bit counter blocks = 4 uint64 words, so
    # non-final chunks are multiples of 4 edges: done*scale words is then
    # always a whole number of blocks.
    chunk = max(4, chunk - chunk % 4)
    done = 0
    while done < n_draws:
        m = min(chunk, n_draws - done)
        bg = np.random.Philox(np.random.SeedSequence([seed]))
        bg.advance(done * scale // 4)  # words i*scale..(i+1)*scale = edge i
        rng = np.random.Generator(bg)
        # one contiguous window per edge: (m, scale) doubles
        r = rng.random(m * scale).reshape(m, scale)
        src = np.zeros(m, dtype=np.int64)
        dst = np.zeros(m, dtype=np.int64)
        for level in range(scale):
            rl = r[:, level]
            # quadrant: [0,A)->(0,0)  [A,A+B)->(0,1)  [A+B,A+B+C)->(1,0)  else (1,1)
            src_bit = rl >= (A + B)
            dst_bit = ((rl >= A) & (rl < A + B)) | (rl >= A + B + C)
            src = (src << 1) | src_bit
            dst = (dst << 1) | dst_bit
        k = (src << shift) | dst
        keys.append(k[src != dst])
        done += m
    key = np.unique(np.concatenate(keys))
    mask = np.int64((1 << scale) - 1)
    return key >> shift, key & mask


def rmat_like_in2004(
    seed: int = 42,
    *,
    scale: int = 21,
    target_arcs: int = 16_917_053,
) -> tuple[np.ndarray, np.ndarray]:
    """An in-2004-class graph: 2**21 id space, exactly 16,917,053 arcs.

    Oversamples (R-MAT at this density collides heavily on the hot core),
    then keeps the first ``target_arcs`` arcs in ``(src, dst)`` order —
    a deterministic prefix of the deduped arc set.
    """
    oversample = int(target_arcs * 1.35)
    src, dst = rmat_edge_arrays(scale, oversample, seed)
    grow = 2
    while len(src) < target_arcs:
        src, dst = rmat_edge_arrays(scale, oversample * grow, seed)
        grow *= 2
    return src[:target_arcs], dst[:target_arcs]


def rmat_edges(spark, scale: int, n_edges: int, seed: int = 42):
    """R-MAT arcs as the engine's ``(src_vertex, dst_vertex, weight)`` table."""
    import pandas as pd

    src, dst = rmat_edge_arrays(scale, n_edges, seed)
    pdf = pd.DataFrame(
        {"src_vertex": src, "dst_vertex": dst, "weight": np.ones(len(src))}
    )
    return spark.createDataFrame(pdf)
