"""Incremental edge extraction over a transcript stream.

``readStream`` on the transcript table (files/Kafka/Iceberg CDC) →
per-microbatch edge deltas appended to the edge table via
``foreachBatch``. Reply edges need the *previous* turn, which may sit in
an older microbatch; rather than a stateful stream join, each batch
re-derives edges for exactly the conversations it touches (transcripts
are partition-pruned on ``conv_id``) and merges the recomputed weights —
idempotent under replays, no unbounded state store.

Watermarking: ``ts`` is monotone within a conversation (input_hint), so
a per-conv watermark bounds how long a conversation stays "hot".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from webgraph_algo_rs_spark.extraction import extract_edges
from webgraph_algo_rs_spark.sources.transcripts import TRANSCRIPT_SCHEMA


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` via the session's Hadoop conf —
    works for local paths, HDFS, and object-store schemes alike."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def _hadoop_exists(spark: SparkSession, path: str) -> bool:
    fs, jpath = _hadoop_fs(spark, path)
    return bool(fs.exists(jpath))


def _hadoop_replace(spark: SparkSession, src: str, dst: str) -> None:
    """Move ``src`` over ``dst`` crash-safely. The live ``dst`` is never
    deleted before the new copy is in place: it is renamed aside to
    ``dst.__old`` first, so at every instant the primary or the backup
    exists (restart seeding checks both). Hadoop's ``FileSystem.rename``
    reports failure by returning false rather than throwing — every
    result is checked, and a failed final rename restores the backup
    before raising (ADVICE r3 follow-up: a swallowed rename failure here
    would surface as silent vertex-id re-derivation on the next run)."""
    fs, jsrc = _hadoop_fs(spark, src)
    _, jdst = _hadoop_fs(spark, dst)
    _, jold = _hadoop_fs(spark, dst.rstrip("/") + ".__old")
    if fs.exists(jold):
        fs.delete(jold, True)
    had_dst = bool(fs.exists(jdst))
    if had_dst and not fs.rename(jdst, jold):
        raise IOError(f"rename {dst} -> {dst}.__old failed")
    if not fs.rename(jsrc, jdst):
        if had_dst:
            fs.rename(jold, jdst)  # put the live copy back
        raise IOError(f"rename {src} -> {dst} failed")
    if had_dst:
        fs.delete(jold, True)


def stream_transcripts(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of transcript rows (Parquet drops into ``path``)."""
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(path)
    )


def incremental_edges(
    transcripts_stream: DataFrame,
    full_transcripts: DataFrame,
    out_path: str,
    checkpoint_path: str,
    dict_path: str | None = None,
):
    """writeStream with per-batch recompute of touched conversations.

    Returns the StreamingQuery; callers ``awaitTermination`` or stop.

    The vertex dictionary is **append-only across batches**: it is
    seeded from ``full_transcripts``, and every batch assigns keys it
    sees for the first time dense ids past the current max (the
    production design: a persistent dictionary table). A snapshot-once
    dictionary silently *dropped* edges whose participant/tool first
    appeared in data arriving after stream start, because
    ``extract_edges``'s dictionary join is inner (ADVICE r1). When
    ``dict_path`` is given, the current dictionary is persisted after
    each batch so consumers can resolve ids → keys — and read back on
    restart: committed batches do NOT replay from the stream checkpoint,
    so ids they assigned exist only in the persisted dictionary. Seeding
    from ``full_transcripts`` alone would re-assign those keys fresh,
    different ids, breaking the append-only id-stability guarantee.
    """
    from webgraph_algo_rs_spark.extraction import build_vertices, dense_ids

    spark = full_transcripts.sparkSession
    seeded = None
    if dict_path is not None and not _hadoop_exists(spark, dict_path):
        # a crash between _hadoop_replace's two renames leaves the
        # previous dictionary parked at the backup path — restore it
        # instead of falling through to silent id re-derivation
        bak = dict_path.rstrip("/") + ".__old"
        if _hadoop_exists(spark, bak):
            fs, jbak = _hadoop_fs(spark, bak)
            _, jdst = _hadoop_fs(spark, dict_path)
            if not fs.rename(jbak, jdst):
                raise IOError(f"restore {bak} -> {dict_path} failed")
    if dict_path is not None and _hadoop_exists(spark, dict_path):
        # the dictionary exists → it MUST be readable. A bare fallback
        # here would silently re-derive ids from full_transcripts while
        # the stream checkpoint skips committed batches — exactly the
        # id-stability corruption the persisted dictionary prevents
        # (ADVICE r3) — so any read error other than absence propagates.
        seeded = (
            spark.read.parquet(dict_path)
            .select("kind", "key", "vertex_id")
            .localCheckpoint(eager=True)
        )
    if seeded is None:
        seeded = build_vertices(full_transcripts).localCheckpoint(eager=True)
    start_max = seeded.agg(F.max("vertex_id")).first()[0]
    state = {"vertices": seeded, "next_id": (start_max if start_max is not None else -1) + 1}

    def process(batch: DataFrame, batch_id: int) -> None:
        batch_pinned = batch.localCheckpoint(eager=True)
        touched = batch_pinned.select("conv_id").distinct()
        # the batch rows themselves are unioned in: late-arriving
        # conversations may be absent from the stream-start snapshot
        scoped = (
            full_transcripts.join(F.broadcast(touched), "conv_id", "left_semi")
            .unionByName(batch_pinned)
            .dropDuplicates(["conv_id", "turn_idx"])
        )
        keys = build_vertices(scoped).select("kind", "key")
        new_keys = keys.join(state["vertices"].select("key"), "key", "left_anti")
        added = dense_ids(new_keys.select("key"), "key", "vertex_id")
        if not added.isEmpty():
            added = new_keys.join(added, "key").select(
                "kind",
                "key",
                (F.col("vertex_id") + F.lit(state["next_id"])).alias("vertex_id"),
            )
            state["vertices"] = state["vertices"].unionByName(added).localCheckpoint(
                eager=True
            )
            state["next_id"] = (
                int(state["vertices"].agg(F.max("vertex_id")).first()[0]) + 1
            )
        edges = extract_edges(scoped, vertices=state["vertices"])
        (
            edges.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(out_path)
        )
        if dict_path is not None:
            # crash-safe persist: a plain mode('overwrite') deletes the
            # old dictionary before the new one is fully written, so a
            # mid-write crash leaves dict_path unreadable (ADVICE r3).
            # Write to a sibling temp dir, then delete+rename — the
            # rename is atomic on HDFS/posix; on object stores it is
            # still strictly safer than in-place overwrite because the
            # unreadable window shrinks to the rename.
            tmp = dict_path.rstrip("/") + "._tmp"
            state["vertices"].write.mode("overwrite").parquet(tmp)
            _hadoop_replace(full_transcripts.sparkSession, tmp, dict_path)

    return (
        transcripts_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


WINDOW_STATS_COLS = (
    "window_start timestamp, window_end timestamp, role string, "
    "n_turns bigint, n_tool_calls bigint, n_convs_approx bigint"
)


def windowed_turn_stats(
    transcripts_stream: DataFrame,
    out_path: str,
    checkpoint_path: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """Watermarked tumbling-window turn statistics — the late-data-aware
    rollup a transcript firehose needs (turn volume / tool-call volume /
    approx distinct conversations per window and role).

    ``withWatermark(ts, watermark)`` bounds both state and lateness:
    rows later than the watermark are dropped, windows are finalized and
    *appended* exactly once when the watermark passes their end, so the
    parquet sink never sees a window twice (exactly-once per window, no
    idempotent-merge dance). State is O(open windows × roles) — bounded
    regardless of input scale — and the only shuffle is the windowed
    groupBy itself, with partial aggregation before the exchange.

    Returns the StreamingQuery. NOTE (append-mode semantics): a window
    is emitted only once the watermark passes it, so in a finite test
    feed the trailing windows flush only after a later-timestamped row
    (or an empty batch past the watermark) arrives.
    """
    agg = (
        transcripts_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "role")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.count("tool").alias("n_tool_calls"),  # count() skips NULLs
            F.approx_count_distinct("conv_id").alias("n_convs_approx"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "role",
            "n_turns",
            "n_tool_calls",
            "n_convs_approx",
        )
    )
    return (
        agg.writeStream.format("parquet")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_path)
        .start(out_path)
    )


SESSION_OUTPUT_SCHEMA = (
    "conv_id string, n_turns bigint, n_tool_calls bigint, "
    "first_ts timestamp, last_ts timestamp"
)
# state keeps timestamps as int64 epoch-nanoseconds: the state encoder
# round-trips longs exactly, with no tz/unit ambiguity
SESSION_STATE_SCHEMA = "n_turns long, n_tool long, first_ns long, last_ns long"


def conversation_sessions(
    transcripts_stream: DataFrame,
    out_path: str,
    checkpoint_path: str,
):
    """Custom stateful operator via ``applyInPandasWithState``: running
    per-conversation session stats (turn count, tool-call count,
    first/last timestamp) maintained in the keyed state store.

    Each microbatch updates the state of exactly the conversations it
    touches and appends their refreshed summary row — downstream readers
    take the latest row per ``conv_id`` (monotone ``n_turns`` makes
    "latest" well-defined without a batch id). State is O(active
    conversations) and the only shuffle is the implicit hash partition
    on the group key; within a batch each group's rows arrive as Arrow
    chunks, so the kernel is vectorized pandas, never per-row Python
    over the whole feed.

    Returns the StreamingQuery.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        if state.exists:
            n_turns, n_tool, first_ns, last_ns = state.get
        else:
            n_turns, n_tool, first_ns, last_ns = 0, 0, None, None
        for pdf in pdfs:
            n_turns += len(pdf)
            n_tool += int(pdf["tool"].notna().sum())
            ts_ns = pd.to_datetime(pdf["ts"]).astype("int64")
            lo, hi = int(ts_ns.min()), int(ts_ns.max())
            first_ns = lo if first_ns is None else min(first_ns, lo)
            last_ns = hi if last_ns is None else max(last_ns, hi)
        state.update((n_turns, n_tool, first_ns, last_ns))
        yield pd.DataFrame(
            {
                "conv_id": [key[0]],
                "n_turns": pd.array([n_turns], dtype="int64"),
                "n_tool_calls": pd.array([n_tool], dtype="int64"),
                "first_ts": [pd.Timestamp(first_ns)],
                "last_ts": [pd.Timestamp(last_ns)],
            }
        )

    out = transcripts_stream.groupBy("conv_id").applyInPandasWithState(
        update,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        out.writeStream.format("parquet")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_path)
        .start(out_path)
    )
