"""BV-format (WebGraph) graph reader — decodes Boldi–Vigna compressed
graphs (``basename.graph`` + ``basename.properties``) into an edge
DataFrame.

The reference consumes these via the ``webgraph`` crate
(``/root/reference/src/main.rs:34,38,49``); we implement the *public*
BVGraph version-0 sequential decode so the engine can be validated
against the reference's own test graphs and anchors (cnr-2000:
325,557 nodes / 3,216,152 arcs / 100,977 SCCs —
``/root/reference/tests/graphs/cnr-2000.properties``,
``/root/reference/tests/test_sccs.rs:215-216``).

Sequential decode per node (default compression flags — outdegrees /
blocks / intervals in γ, references in unary, residuals in ζ_k):

1. outdegree ``d`` (γ); if 0, done;
2. reference ``r`` (unary): if > 0, copy successors of node ``x − r``
   filtered by the block list (γ block count; alternating copy/skip
   lengths, first as-is, rest −1, implicit tail block);
3. intervals (if ``min_interval_length`` > 0): γ count, first left
   extreme as nat2int(γ) offset from ``x``, lengths −min_interval_length
   in γ, subsequent gaps −1 in γ;
4. residuals: first as nat2int(ζ_k) offset from ``x``, then gaps −1 in
   ζ_k.

This is a *test/validation* source: the decode is driver-side (the
format is inherently sequential — each list can reference a previous
one); production ingestion is the Parquet/Iceberg edge table.
"""

from __future__ import annotations

import numpy as np


def read_properties(basename: str) -> dict[str, str]:
    props: dict[str, str] = {}
    with open(f"{basename}.properties") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            k, v = line.split("=", 1)
            props[k] = v
    return props


class _BitReader:
    """MSB-first bit reader with O(log n) unary via a set-bit index."""

    def __init__(self, data: bytes):
        self.data = data + b"\x00" * 16  # slack for 64-bit peeks
        bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.ones = np.flatnonzero(bits)
        self.pos = 0

    def read_bits(self, k: int) -> int:
        if k == 0:
            return 0
        byte = self.pos >> 3
        off = self.pos & 7
        window = int.from_bytes(self.data[byte : byte + 16], "big")
        self.pos += k
        return (window >> (128 - off - k)) & ((1 << k) - 1)

    def read_unary(self) -> int:
        i = np.searchsorted(self.ones, self.pos)
        one = int(self.ones[i])
        n = one - self.pos
        self.pos = one + 1
        return n

    def read_gamma(self) -> int:
        h = self.read_unary()
        return ((1 << h) | self.read_bits(h)) - 1

    def read_zeta(self, k: int) -> int:
        h = self.read_unary()
        left = 1 << (h * k + k - 1)
        m = self.read_bits(h * k + k - 1)
        if m < (left >> (k - 1)):
            return m + (left >> (k - 1)) - 1
        return (m << 1 | self.read_bits(1)) - 1


def _nat2int(x: int) -> int:
    return x >> 1 if (x & 1) == 0 else -((x + 1) >> 1)


def decode_bv(basename: str) -> list[np.ndarray]:
    """Decode all successor lists; returns ``adj[x]`` as a sorted int64
    array per node."""
    props = read_properties(basename)
    n = int(props["nodes"])
    window_size = int(props.get("windowsize", 7))
    min_interval = int(props.get("minintervallength", 4))
    zeta_k = int(props.get("zetak", 3))
    # accept flags that merely spell out the defaults we decode
    supported = {
        "",
        "OUTDEGREES_GAMMA",
        "BLOCKS_GAMMA",
        "INTERVALS_GAMMA",
        "REFERENCES_UNARY",
        "RESIDUALS_ZETA",
    }
    flags = {
        f.strip() for f in props.get("compressionflags", "").split("|") if f.strip()
    }
    if not flags <= supported:
        raise NotImplementedError(
            f"unsupported compression flags: {flags - supported}"
        )

    with open(f"{basename}.graph", "rb") as f:
        r = _BitReader(f.read())

    adj: list[np.ndarray] = []
    for x in range(n):
        d = r.read_gamma()
        if d == 0:
            adj.append(np.empty(0, dtype=np.int64))
            continue
        parts: list[np.ndarray] = []
        copied = 0
        if window_size > 0:
            ref = r.read_unary()
            if ref > 0:
                ref_list = adj[x - ref]
                block_count = r.read_gamma()
                blocks = [
                    r.read_gamma() + (0 if i == 0 else 1)
                    for i in range(block_count)
                ]
                mask = np.zeros(len(ref_list), dtype=bool)
                at = 0
                for i, b in enumerate(blocks):
                    if i % 2 == 0:
                        mask[at : at + b] = True
                    at += b
                if block_count % 2 == 0:
                    mask[at:] = True  # implicit tail block is a copy block
                take = ref_list[mask]
                copied = len(take)
                if copied:
                    parts.append(take)
        extra = d - copied
        if extra > 0 and min_interval != 0:
            interval_count = r.read_gamma()
            prev = 0
            for i in range(interval_count):
                if i == 0:
                    left = x + _nat2int(r.read_gamma())
                else:
                    left = prev + r.read_gamma() + 1
                length = r.read_gamma() + min_interval
                parts.append(np.arange(left, left + length, dtype=np.int64))
                prev = left + length
                extra -= length
        if extra > 0:
            res = np.empty(extra, dtype=np.int64)
            prev = 0
            for i in range(extra):
                if i == 0:
                    prev = x + _nat2int(r.read_zeta(zeta_k))
                else:
                    prev = prev + r.read_zeta(zeta_k) + 1
                res[i] = prev
            parts.append(res)
        succ = np.sort(np.concatenate(parts)) if parts else np.empty(0, dtype=np.int64)
        if len(succ) != d:
            raise ValueError(f"node {x}: decoded {len(succ)} of {d} successors")
        adj.append(succ)
    return adj


def bv_edge_arrays(basename: str) -> tuple[np.ndarray, np.ndarray]:
    """All arcs as two parallel int64 arrays ``(src, dst)``."""
    adj = decode_bv(basename)
    degs = np.fromiter((len(a) for a in adj), dtype=np.int64, count=len(adj))
    src = np.repeat(np.arange(len(adj), dtype=np.int64), degs)
    dst = np.concatenate([a for a in adj if len(a)]) if degs.sum() else np.empty(0, np.int64)
    return src, dst


def read_bv_edges(spark, basename: str):
    """BV graph → edge DataFrame ``(src_vertex, dst_vertex, weight=1.0)``."""
    import pandas as pd

    src, dst = bv_edge_arrays(basename)
    pdf = pd.DataFrame(
        {"src_vertex": src, "dst_vertex": dst, "weight": np.ones(len(src))}
    )
    return spark.createDataFrame(pdf)
