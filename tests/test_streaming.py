"""Incremental (Structured Streaming) transcript→edge extraction:
the streamed edge deltas, re-aggregated, must equal batch extraction."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import Window
from pyspark.sql import functions as F

from webgraph_algo_rs_spark.extraction import extract_edges
from webgraph_algo_rs_spark.sources.transcripts import gen_transcripts
from webgraph_algo_rs_spark.streaming.transcripts_stream import (
    incremental_edges,
    stream_transcripts,
)


def test_incremental_matches_batch(spark):
    tmp = tempfile.mkdtemp(prefix="wga_stream_")
    try:
        in_dir, out_dir, ckpt = f"{tmp}/in", f"{tmp}/out", f"{tmp}/ckpt"
        # two "arriving" file drops of transcripts
        t1 = gen_transcripts(spark, 30, seed=42)
        t2 = gen_transcripts(spark, 50, seed=42).filter(
            F.col("conv_id") >= "conv-000000030"
        )
        t1.write.mode("append").parquet(in_dir)
        t2.write.mode("append").parquet(in_dir)
        full = spark.read.parquet(in_dir)

        q = incremental_edges(stream_transcripts(spark, in_dir), full, out_dir, ckpt)
        q.awaitTermination(120)

        got = (
            spark.read.parquet(out_dir)
            # later batches recompute touched conversations: keep the
            # latest weight per edge (idempotent merge semantics)
            .withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("src_vertex", "dst_vertex").orderBy(
                        F.desc("batch_id")
                    )
                ),
            )
            .filter("rn = 1")
            .select("src_vertex", "dst_vertex", "weight")
        )
        want = extract_edges(full)
        g = {(r.src_vertex, r.dst_vertex): r.weight for r in got.collect()}
        w = {(r.src_vertex, r.dst_vertex): r.weight for r in want.collect()}
        assert g == w
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_late_arriving_conversations_extend_dictionary(spark):
    """ADVICE r1: conversations whose participants/tools first appear in
    data arriving *after* stream start must not be silently dropped by
    the dictionary inner-join. Compare at the key level (incremental ids
    are append-only, so they legitimately differ from a batch renumber)."""
    tmp = tempfile.mkdtemp(prefix="wga_stream_late_")
    try:
        in_dir, out_dir, ckpt = f"{tmp}/in", f"{tmp}/out", f"{tmp}/ckpt"
        dict_dir = f"{tmp}/dict"
        early = gen_transcripts(spark, 20, seed=42)
        late = gen_transcripts(spark, 40, seed=42).filter(
            F.col("conv_id") >= "conv-000000020"
        )
        early.write.mode("append").parquet(in_dir)
        # snapshot of what existed at "stream start"
        full_at_start = spark.read.parquet(in_dir).localCheckpoint(eager=True)
        late.write.mode("append").parquet(in_dir)

        q = incremental_edges(
            stream_transcripts(spark, in_dir), full_at_start, out_dir, ckpt,
            dict_path=dict_dir,
        )
        q.awaitTermination(120)

        vdict = spark.read.parquet(dict_dir).select("key", "vertex_id")
        got_keys = {
            (r.src_key, r.dst_key): r.weight
            for r in (
                spark.read.parquet(out_dir)
                .withColumn(
                    "rn",
                    F.row_number().over(
                        Window.partitionBy("src_vertex", "dst_vertex").orderBy(
                            F.desc("batch_id")
                        )
                    ),
                )
                .filter("rn = 1")
                .join(vdict.withColumnRenamed("vertex_id", "src_vertex")
                      .withColumnRenamed("key", "src_key"), "src_vertex")
                .join(vdict.withColumnRenamed("vertex_id", "dst_vertex")
                      .withColumnRenamed("key", "dst_key"), "dst_vertex")
                .collect()
            )
        }
        from webgraph_algo_rs_spark.extraction import build_vertices
        all_t = gen_transcripts(spark, 40, seed=42)
        bdict = build_vertices(all_t).select("key", "vertex_id")
        want_keys = {
            (r.src_key, r.dst_key): r.weight
            for r in (
                extract_edges(all_t)
                .join(bdict.withColumnRenamed("vertex_id", "src_vertex")
                      .withColumnRenamed("key", "src_key"), "src_vertex")
                .join(bdict.withColumnRenamed("vertex_id", "dst_vertex")
                      .withColumnRenamed("key", "dst_key"), "dst_vertex")
                .collect()
            )
        }
        assert got_keys == want_keys
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
