"""Incremental (Structured Streaming) transcript→edge extraction:
the streamed edge deltas, re-aggregated, must equal batch extraction."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import Window
from pyspark.sql import functions as F

from webgraph_algo_rs_spark.extraction import extract_edges
from webgraph_algo_rs_spark.sources.transcripts import gen_transcripts
from webgraph_algo_rs_spark.streaming.transcripts_stream import (
    conversation_sessions,
    windowed_turn_stats,
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


def test_restart_preserves_vertex_ids(spark):
    """ADVICE r2: on restart from a stream checkpoint, committed batches
    do not replay, so keys first numbered in them exist only in the
    persisted dictionary. The restarted query must seed from
    ``dict_path`` — the phase-2 ``full_transcripts`` here deliberately
    omits phase-1 conversations, so any id that survives can only have
    come from the read-back, not a re-derivation."""
    tmp = tempfile.mkdtemp(prefix="wga_stream_restart_")
    try:
        in_dir, out_dir, ckpt = f"{tmp}/in", f"{tmp}/out", f"{tmp}/ckpt"
        dict_dir = f"{tmp}/dict"
        early = gen_transcripts(spark, 20, seed=42)
        late = gen_transcripts(spark, 40, seed=42).filter(
            F.col("conv_id") >= "conv-000000020"
        )

        early.write.mode("append").parquet(in_dir)
        q1 = incremental_edges(
            stream_transcripts(spark, in_dir), early, out_dir, ckpt,
            dict_path=dict_dir,
        )
        q1.awaitTermination(120)
        phase1 = {
            r.key: r.vertex_id for r in spark.read.parquet(dict_dir).collect()
        }
        assert phase1  # sanity: phase 1 assigned ids

        late.write.mode("append").parquet(in_dir)
        # restart: same checkpoint, but the "current table snapshot" no
        # longer contains the early conversations (e.g. they were
        # compacted/retained elsewhere) — the dictionary must carry them
        q2 = incremental_edges(
            stream_transcripts(spark, in_dir), late, out_dir, ckpt,
            dict_path=dict_dir,
        )
        q2.awaitTermination(120)
        phase2 = {
            r.key: r.vertex_id for r in spark.read.parquet(dict_dir).collect()
        }
        # every phase-1 id is stable across the restart
        assert {k: phase2.get(k) for k in phase1} == phase1
        # new keys extend past the old max, never recycling ids
        new_ids = [v for k, v in phase2.items() if k not in phase1]
        assert new_ids and min(new_ids) > max(phase1.values())
        # ids remain dense and unique after the restart
        assert sorted(phase2.values()) == list(range(len(phase2)))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_corrupt_dictionary_raises_not_silently_rederives(spark):
    """ADVICE r3: an EXISTING-but-unreadable dictionary must raise, not
    silently fall back to re-deriving ids (which re-assigns committed
    batches' keys fresh ids — the exact corruption the persisted
    dictionary prevents). Absence still means a clean first run."""
    import pytest

    tmp = tempfile.mkdtemp(prefix="wga_stream_corrupt_")
    try:
        in_dir, out_dir, ckpt = f"{tmp}/in", f"{tmp}/out", f"{tmp}/ckpt"
        dict_dir = f"{tmp}/dict"
        tr = gen_transcripts(spark, 10, seed=7)
        tr.write.mode("append").parquet(in_dir)
        # dict path exists but holds garbage (a crashed overwrite)
        os.makedirs(dict_dir)
        with open(f"{dict_dir}/part-00000.parquet", "w") as f:
            f.write("not parquet")
        with pytest.raises(Exception):
            q = incremental_edges(
                stream_transcripts(spark, in_dir), tr, out_dir, ckpt,
                dict_path=dict_dir,
            )
            q.awaitTermination(60)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_crash_between_renames_restores_backup_dictionary(spark):
    """`_hadoop_replace` parks the live dictionary at ``.__old`` before
    the new copy lands; a crash in that window leaves the primary
    missing but the backup intact. Restart must restore the backup and
    keep phase-1 ids stable — NOT treat the missing primary as a clean
    first run (the silent re-derivation ADVICE r3/r4 guards against)."""
    tmp = tempfile.mkdtemp(prefix="wga_stream_crashwin_")
    try:
        in_dir, out_dir, ckpt = f"{tmp}/in", f"{tmp}/out", f"{tmp}/ckpt"
        dict_dir = f"{tmp}/dict"
        early = gen_transcripts(spark, 20, seed=42)
        late = gen_transcripts(spark, 40, seed=42).filter(
            F.col("conv_id") >= "conv-000000020"
        )
        early.write.mode("append").parquet(in_dir)
        q1 = incremental_edges(
            stream_transcripts(spark, in_dir), early, out_dir, ckpt,
            dict_path=dict_dir,
        )
        q1.awaitTermination(120)
        phase1 = {
            r.key: r.vertex_id for r in spark.read.parquet(dict_dir).collect()
        }
        assert phase1

        # simulate the crash window: old dict renamed aside, new one
        # never arrived
        os.rename(dict_dir, dict_dir + ".__old")

        late.write.mode("append").parquet(in_dir)
        q2 = incremental_edges(
            stream_transcripts(spark, in_dir), late, out_dir, ckpt,
            dict_path=dict_dir,
        )
        q2.awaitTermination(120)
        phase2 = {
            r.key: r.vertex_id for r in spark.read.parquet(dict_dir).collect()
        }
        assert {k: phase2.get(k) for k in phase1} == phase1
        assert not os.path.exists(dict_dir + ".__old")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_windowed_turn_stats_matches_batch_and_drops_late(spark):
    """Watermarked tumbling windows: finalized windows must equal the
    batch windowed aggregation over the on-time rows, and a row arriving
    later than the watermark must be dropped, not double-counted."""
    import datetime as dt

    tmp = tempfile.mkdtemp(prefix="wga_stream_win_")
    try:
        in_dir, out_dir, ckpt = f"{tmp}/in", f"{tmp}/out", f"{tmp}/ckpt"
        base = gen_transcripts(spark, 25, seed=42)
        base.write.mode("append").parquet(in_dir)
        q = windowed_turn_stats(
            stream_transcripts(spark, in_dir), out_dir, ckpt,
            window="1 hour", watermark="2 hours",
        )
        q.awaitTermination(120)

        # second drop: one VERY late row (years before the watermark,
        # which now sits at max(base.ts) - 2h) plus a far-future sentinel
        # that pushes the watermark past every base window
        far = dt.datetime(2030, 1, 1, tzinfo=dt.timezone.utc)
        late = dt.datetime(2020, 1, 1, tzinfo=dt.timezone.utc)
        extra = spark.createDataFrame(
            [("conv-late", 0, "user", "late row", None, late),
             ("conv-sentinel", 0, "user", "sentinel", None, far)],
            "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
        )
        extra.write.mode("append").parquet(in_dir)
        q2 = windowed_turn_stats(
            stream_transcripts(spark, in_dir), out_dir, ckpt,
            window="1 hour", watermark="2 hours",
        )
        q2.awaitTermination(120)

        got = {
            (r.window_start, r.role): (r.n_turns, r.n_tool_calls)
            for r in spark.read.parquet(out_dir)
            .filter(F.col("window_start") < dt.datetime(2029, 1, 1))
            .collect()
        }
        want = {
            (r.window_start, r.role): (r.n_turns, r.n_tool_calls)
            for r in base.groupBy(F.window("ts", "1 hour").alias("w"), "role")
            .agg(F.count(F.lit(1)).alias("n_turns"),
                 F.count("tool").alias("n_tool_calls"))
            .select(F.col("w.start").alias("window_start"), "role",
                    "n_turns", "n_tool_calls")
            .collect()
        }
        assert got == want  # late 2020 row dropped; every base window flushed once
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_conversation_sessions_stateful(spark):
    """applyInPandasWithState sessionizer: state carries across
    microbatches (same conversation in both drops), and the latest
    summary per conversation equals the batch groupBy oracle."""
    tmp = tempfile.mkdtemp(prefix="wga_stream_sess_")
    try:
        in_dir, out_dir, ckpt = f"{tmp}/in", f"{tmp}/out", f"{tmp}/ckpt"
        # drop 1: the even turns of every conversation; drop 2: the odd
        # ones — forces a real cross-batch state merge for every conv
        full = gen_transcripts(spark, 40, seed=42).localCheckpoint(eager=True)
        half1 = full.filter(F.col("turn_idx") % 2 == 0)
        half2 = full.filter(F.col("turn_idx") % 2 == 1)
        half1.write.mode("append").parquet(in_dir)
        q1 = conversation_sessions(stream_transcripts(spark, in_dir), out_dir, ckpt)
        q1.awaitTermination(120)
        half2.write.mode("append").parquet(in_dir)
        q2 = conversation_sessions(stream_transcripts(spark, in_dir), out_dir, ckpt)
        q2.awaitTermination(120)

        rows = spark.read.parquet(out_dir)
        latest = {
            r.conv_id: (r.n_turns, r.n_tool_calls, r.first_ts, r.last_ts)
            for r in rows.withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("conv_id").orderBy(F.desc("n_turns"))
                ),
            ).filter("rn = 1").collect()
        }
        want = {
            r.conv_id: (r.n_turns, r.n_tool_calls, r.first_ts, r.last_ts)
            for r in full.groupBy("conv_id").agg(
                F.count(F.lit(1)).alias("n_turns"),
                F.count("tool").alias("n_tool_calls"),
                F.min("ts").alias("first_ts"),
                F.max("ts").alias("last_ts"),
            ).collect()
        }
        assert latest == want
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
