"""Transcript → edge-table extraction (north-rule input pipeline).

Produces the engine's fundamental abstraction — an edge DataFrame
``(src_vertex:bigint, dst_vertex:bigint, weight:double)`` — from the
transcript table, mirroring how the reference consumes a
``RandomAccessGraph`` with dense ``usize`` node ids
(``/root/reference/src/algo/visits/breadth_first/seq.rs:92-95``).

Edge rules (FIXTURES.md §2):
* **reply edge**: within each ``conv_id`` under stable
  ``(conv_id, turn_idx)`` ordering, turn *t−1*'s author-vertex → turn
  *t*'s author-vertex (window ``lag`` — no global sort, partitioned by
  conversation so it scales to 10^12 turns);
* **tool-invocation edge**: turn's author-vertex → tool-vertex when
  ``tool IS NOT NULL``;
* weights = multiplicity after ``groupBy(src,dst)`` aggregation.

Vertex dictionary: ``(kind, key) → dense bigint id``. Dense assignment
uses the scalable two-pass *zipWithIndex* pattern (per-partition counts
→ offsets), never a single-partition global window.

The per-turn **text equality invariant** (input_hint): extraction never
mutates the transcript rows; ``tests/test_extraction.py`` checks texts
survive byte-identical under stable ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dense_ids(df: DataFrame, key_col: str, id_col: str = "id") -> DataFrame:
    """Assign dense contiguous ids ``0..n-1`` to distinct keys, ordered by key.

    Scalable zipWithIndex: range-repartition + sort by key, count rows per
    partition, broadcast cumulative offsets, add partition-local row
    number. No global single-task window.
    """
    spark = df.sparkSession
    keys = df.select(key_col).distinct()
    n_part = max(keys.sparkSession.sparkContext.defaultParallelism, 1)
    keys = keys.repartitionByRange(n_part, key_col).sortWithinPartitions(key_col)
    keys = keys.withColumn("_pid", F.spark_partition_id())
    keys = keys.localCheckpoint(eager=True)  # pin partitioning for both passes
    counts = dict(
        keys.groupBy("_pid").count().collect()
    )  # ≤ one small row per partition — driver-safe at any scale
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offsets_df = F.broadcast(
        spark.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _offset long"
        )
    )
    w = Window.partitionBy("_pid").orderBy(key_col)
    return (
        keys.withColumn("_rn", F.row_number().over(w) - F.lit(1))
        .join(offsets_df, "_pid")
        .select(key_col, (F.col("_offset") + F.col("_rn")).alias(id_col))
    )


def author_vertex_key(conv_id=None, role=None):
    """A turn's author-vertex natural key: the (conversation, role) pair."""
    conv_id = F.col("conv_id") if conv_id is None else conv_id
    role = F.col("role") if role is None else role
    return F.concat_ws("/", conv_id, role)


def build_vertices(transcripts: DataFrame) -> DataFrame:
    """Vertex dictionary ``(kind, key, vertex_id)`` with dense long ids."""
    participants = transcripts.select(
        F.lit("participant").alias("kind"), author_vertex_key().alias("key")
    )
    tools = (
        transcripts.filter(F.col("tool").isNotNull())
        .select(F.lit("tool").alias("kind"), F.concat_ws("/", F.lit("tool"), "tool").alias("key"))
    )
    all_keys = participants.unionByName(tools).distinct()
    ids = dense_ids(all_keys.select("key"), "key", "vertex_id")
    return all_keys.join(ids, "key").select("kind", "key", "vertex_id")


def raw_edges(transcripts: DataFrame) -> DataFrame:
    """Un-aggregated natural-key edges ``(src_key, dst_key)``."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    authored = transcripts.select(
        "conv_id", "turn_idx", "tool", author_vertex_key().alias("author_key")
    )
    reply = (
        authored.withColumn("prev_key", F.lag("author_key").over(w))
        .filter(F.col("prev_key").isNotNull())
        .select(F.col("prev_key").alias("src_key"), F.col("author_key").alias("dst_key"))
    )
    tool_edges = authored.filter(F.col("tool").isNotNull()).select(
        F.col("author_key").alias("src_key"),
        F.concat_ws("/", F.lit("tool"), "tool").alias("dst_key"),
    )
    return reply.unionByName(tool_edges)


def extract_edges(transcripts: DataFrame, vertices: DataFrame | None = None) -> DataFrame:
    """Full pipeline: transcripts → ``(src_vertex, dst_vertex, weight)``.

    Aggregates key-pairs *before* mapping to ids (map-side combine on the
    smaller distinct key space), then joins the vertex dictionary twice.
    The dictionary join broadcasts when small; at 10^12-turn scale it is
    a shuffle hash join on the dictionary's dense key — both sides
    pre-aggregated, no skew beyond what AQE's skew-join splits.
    """
    if vertices is None:
        vertices = build_vertices(transcripts)
    agg = raw_edges(transcripts).groupBy("src_key", "dst_key").agg(
        F.count(F.lit(1)).cast("double").alias("weight")
    )
    v = vertices.select("key", "vertex_id")
    return (
        agg.join(v.withColumnRenamed("vertex_id", "src_vertex"), agg.src_key == v.key)
        .drop("key")
        .join(
            v.withColumnRenamed("vertex_id", "dst_vertex").withColumnRenamed("key", "k2"),
            F.col("dst_key") == F.col("k2"),
        )
        .select("src_vertex", "dst_vertex", "weight")
    )
