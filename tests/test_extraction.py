"""Transcript→edge extraction vs a pandas oracle + the per-turn text
equality invariant (input_hint contract)."""

from collections import Counter

import pandas as pd

from webgraph_algo_rs_spark.extraction import (
    build_vertices,
    dense_ids,
    extract_edges,
)
from webgraph_algo_rs_spark.sources.transcripts import gen_transcripts


def _oracle_edges(pdf: pd.DataFrame) -> Counter:
    """Pandas re-derivation of reply + tool edges on natural keys."""
    edges = Counter()
    for conv_id, grp in pdf.groupby("conv_id"):
        grp = grp.sort_values("turn_idx")
        keys = [f"{conv_id}/{r}" for r in grp["role"]]
        for prev, cur in zip(keys, keys[1:]):
            edges[(prev, cur)] += 1
        for k, tool in zip(keys, grp["tool"]):
            if tool is not None and not pd.isna(tool):
                edges[(k, f"tool/{tool}")] += 1
    return edges


def test_generator_deterministic_and_valid(spark):
    t1 = gen_transcripts(spark, 30, seed=42).toPandas()
    t2 = gen_transcripts(spark, 30, seed=42, partitions=7).toPandas()
    key = ["conv_id", "turn_idx"]
    a = t1.sort_values(key).reset_index(drop=True)
    b = t2.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # (conv_id, turn_idx) unique; ts monotone within conversation
    assert not a.duplicated(key).any()
    for _, g in a.groupby("conv_id"):
        g = g.sort_values("turn_idx")
        assert g["ts"].is_monotonic_increasing
        assert list(g["turn_idx"]) == list(range(len(g)))


def test_edges_match_pandas_oracle(spark):
    t = gen_transcripts(spark, 40, seed=42)
    pdf = t.toPandas()
    want = _oracle_edges(pdf)

    vertices = build_vertices(t)
    vmap = {r["key"]: r["vertex_id"] for r in vertices.collect()}
    got = {
        (r["src_vertex"], r["dst_vertex"]): r["weight"]
        for r in extract_edges(t, vertices).collect()
    }
    want_ids = {(vmap[s], vmap[d]): float(c) for (s, d), c in want.items()}
    assert got == want_ids


def test_dense_vertex_ids(spark):
    t = gen_transcripts(spark, 25, seed=42)
    v = build_vertices(t).toPandas()
    n = len(v)
    assert sorted(v["vertex_id"]) == list(range(n))  # dense 0..V-1
    assert v["key"].is_unique
    # deterministic: ids ordered by key
    assert list(v.sort_values("key")["vertex_id"]) == list(range(n))


def test_text_equality_invariant(spark):
    """Per-turn text equality under stable (conv_id, turn_idx) ordering
    survives the extraction pipeline (BASELINE.json input_hint)."""
    t = gen_transcripts(spark, 20, seed=42)
    before = t.orderBy("conv_id", "turn_idx").select("conv_id", "turn_idx", "text").collect()
    extract_edges(t).count()  # run the pipeline end to end
    after = t.orderBy("conv_id", "turn_idx").select("conv_id", "turn_idx", "text").collect()
    assert before == after
    assert all(
        r["text"] == f"{r['conv_id']}:{r['turn_idx']}:{r['text'].split(':')[2]}"
        for r in after
    )


def test_dense_ids_utility(spark):
    df = spark.createDataFrame([("c",), ("a",), ("b",), ("a",)], "k string")
    got = {r["k"]: r["id"] for r in dense_ids(df, "k").collect()}
    assert got == {"a": 0, "b": 1, "c": 2}
