"""Deterministic synthetic multi-turn transcript source.

Input-table shape mandated by BASELINE.json ``input_hint``:
``(conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp)``.

The reference's synthetic-source analog is its Erdős–Rényi generator
used for property tests (``/root/reference/tests/test_sccs.rs:225-227``);
ours generates the *transcript* table the north rule starts from, with
Zipf-distributed conversation lengths and tool usage so hot vertices
(ubiquitous tools) exist for skew testing.

Generation is distributed (``spark.range`` → ``mapInPandas``) and
deterministic regardless of partitioning: every conversation derives its
own RNG from ``SeedSequence([seed, conv_id])``.
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)

_BASE_TS = datetime(2024, 1, 1, tzinfo=timezone.utc)

# Small closed vocabularies; tool popularity is Zipf → hot dst vertices.
_TOOLS = [f"tool_{i:03d}" for i in range(64)]
_WORDS = [
    "graph", "vertex", "edge", "rank", "label", "merge", "scan", "join",
    "frontier", "sketch", "batch", "shuffle", "salt", "delta", "sweep", "ball",
]


def _conv_frame(conv_id: int, seed: int, max_turns: int) -> pd.DataFrame:
    rng = np.random.default_rng(np.random.SeedSequence([seed, int(conv_id)]))
    # Zipf(1.5) lengths, clamped: most convs short, a heavy tail of long ones.
    n_turns = int(min(2 + rng.zipf(1.5), max_turns))
    turn_idx = np.arange(n_turns, dtype=np.int32)
    roles = np.where(turn_idx % 2 == 0, "user", "assistant")
    # assistant turns invoke a Zipf-popular tool with prob 0.45
    tool_draw = rng.random(n_turns)
    tool_rank = np.minimum(rng.zipf(1.3, n_turns) - 1, len(_TOOLS) - 1)
    tools = np.where(
        (roles == "assistant") & (tool_draw < 0.45),
        np.array(_TOOLS, dtype=object)[tool_rank],
        None,
    )
    words = rng.integers(0, len(_WORDS), n_turns)
    cid = f"conv-{conv_id:09d}"
    text = [f"{cid}:{t}:{_WORDS[w]}" for t, w in zip(turn_idx, words)]
    # ts monotone non-decreasing within a conversation (input_hint contract)
    ts = pd.Timestamp(_BASE_TS) + pd.to_timedelta(
        int(conv_id) * 300 + turn_idx * 7, unit="s"
    )
    return pd.DataFrame(
        {
            "conv_id": cid,
            "turn_idx": turn_idx,
            "role": roles,
            "text": text,
            "tool": tools,
            "ts": ts,
        }
    )


def sql_transcripts(spark: SparkSession, n_convs: int) -> DataFrame:
    """Deterministic transcripts from *pure integer arithmetic* — no RNG.

    Same ``input_hint`` schema as :func:`gen_transcripts`, but every
    column is a closed-form expression over ``(conv_id, turn_idx)``, so
    an external SQL engine (the DuckDB oracle gate) can regenerate the
    identical table formula-for-formula. Used by the driver-contract
    queries that need a cross-engine-verifiable transcript source;
    the Zipf-skewed ``gen_transcripts`` remains the benchmark/skew input.
    """
    convs = spark.range(0, n_convs).select(
        F.col("id").alias("cid"),
        (F.lit(2) + (F.col("id") * 7919) % 29).cast("int").alias("n_turns"),
    )
    t = convs.select(
        "cid", F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx")
    )
    role = F.when(F.col("turn_idx") % 2 == 0, "user").otherwise("assistant")
    has_tool = (F.col("turn_idx") % 2 == 1) & (
        (F.col("cid") * 31 + F.col("turn_idx") * 17) % 10 < 4
    )
    return t.select(
        F.format_string("conv-%09d", "cid").alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        F.format_string(
            "conv-%09d:%d:w%d", "cid", "turn_idx", (F.col("cid") + F.col("turn_idx")) % 16
        ).alias("text"),
        F.when(
            has_tool,
            F.format_string(
                "tool_%03d", (F.col("cid") * 13 + F.col("turn_idx") * 7) % 64
            ),
        ).alias("tool"),
        F.timestamp_seconds(
            F.lit(1704067200) + F.col("cid") * 300 + F.col("turn_idx") * 7
        ).alias("ts"),
    )


def sql_transcripts_duckdb(n_convs: int) -> str:
    """DuckDB CTE fragment producing the exact table of
    :func:`sql_transcripts` (columns conv_id, turn_idx, role, tool)."""
    return f"""
conv AS (SELECT i AS cid, 2 + (i * 7919) % 29 AS n FROM range(0, {n_convs}) r(i)),
turns AS (SELECT cid, unnest(generate_series(0, n - 1)) AS turn_idx FROM conv),
transcripts_sql AS (
  SELECT printf('conv-%09d', cid) AS conv_id,
         turn_idx,
         CASE WHEN turn_idx % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         CASE WHEN turn_idx % 2 = 1 AND (cid * 31 + turn_idx * 17) % 10 < 4
              THEN printf('tool_%03d', (cid * 13 + turn_idx * 7) % 64) END AS tool
  FROM turns
)"""


def gen_transcripts(
    spark: SparkSession,
    n_convs: int,
    seed: int = 42,
    max_turns: int = 256,
    partitions: int | None = None,
) -> DataFrame:
    """Generate ``n_convs`` conversations as a transcript DataFrame."""
    partitions = partitions or max(1, min(n_convs // 256, 512)) or 1

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = [_conv_frame(c, seed, max_turns) for c in pdf["id"]]
            if frames:
                yield pd.concat(frames, ignore_index=True)

    ids = spark.range(0, n_convs, numPartitions=partitions)
    return ids.mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)
