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
